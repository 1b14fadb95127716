"""DuckDB baseline for the bench gate (BASELINE.md §measured).

Runs every ``oracle_sql()`` entry against the parquet tables at
``$SPARK_GRAFT_SF_DIR`` (default sf0.1) with ``SET threads TO 32``,
median of 3 per query, and reports BOTH result paths:

- ``fetchall`` — row-at-a-time Python tuples (what round 1/2 measured);
- ``df``      — Arrow-backed ``.df()``, the columnar analog of the
  engine bench's ``toPandas`` (ADVICE r2: both engines must pay an
  analogous result-path cost for the ratio to be meaningful).

Prints one JSON line: ``{"total_fetchall": s, "total_df": s,
"queries": {name: {"fetchall": s, "df": s}}, "sf": ...}``.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def run(
    sf_dir: str | None = None,
    runs: int | None = None,
    only: list[str] | None = None,
) -> dict:
    """Measure every oracle on DuckDB and return the payload dict —
    importable, so bench.py can embed the same-session baseline pair in
    its own JSON line (ADVICE r4: ratios must not depend on hand-copied
    BASELINE.md tables)."""
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = runs or RUNS
    if only is None:
        only = [
            p for p in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if p
        ]
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    oracles = entry_mod.oracle_sql()
    timings: dict[str, dict[str, float]] = {}
    for name in sorted(oracles):
        if only and not any(name.startswith(p) for p in only):
            continue
        sql = oracles[name]
        per_path: dict[str, float] = {}
        for path in ("fetchall", "df"):
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                cur = con.execute(sql)
                if path == "fetchall":
                    cur.fetchall()
                else:
                    cur.df()
                samples.append(time.perf_counter() - t0)
            per_path[path] = round(statistics.median(samples), 4)
        timings[name] = per_path

    con.close()
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "total_fetchall": round(sum(v["fetchall"] for v in timings.values()), 4),
        "total_df": round(sum(v["df"] for v in timings.values()), 4),
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "runs": runs,
    }


def main() -> None:
    print(json.dumps(run()))


if __name__ == "__main__":
    main()
