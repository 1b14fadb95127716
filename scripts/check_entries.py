"""Spot-check named corpus entries against their DuckDB oracles at sf0.01.

Usage: python scripts/check_entries.py c50_stats_moments l29_quality_select
(no args → every entry). Same hash as driver_sim; prints per-entry result.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.driver_sim import SF_DIR, TABLES, value_hash  # noqa: E402


def main() -> None:
    from pyspark.sql import SparkSession

    from gcpde_spark.queries import CORPUS

    names = sys.argv[1:] or list(CORPUS)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    n_fail = 0
    for name in names:
        spec = CORPUS[name]
        try:
            df = spec.build(spark, SF_DIR)
            cols = [f.name for f in df.schema.fields]
            rows = [tuple(r) for r in df.collect()]
            if spec.oracle is None:
                print(f"ok   {name} ({len(rows)} rows, no oracle)")
                continue
            orows = con.execute(spec.oracle).fetchall()
            ocols = [d[0] for d in con.description]
            ok = (
                len(rows) == len(orows)
                and sorted(cols) == sorted(ocols)
                and value_hash(cols, rows) == value_hash(ocols, orows)
            )
            if ok:
                print(f"ok   {name} ({len(rows)} rows, hash match)")
            else:
                n_fail += 1
                print(
                    f"FAIL {name}: spark={len(rows)} duck={len(orows)} "
                    f"cols {sorted(cols)} vs {sorted(ocols)}"
                )
                for a, b in list(zip(sorted(rows), sorted(orows)))[:5]:
                    if a != b:
                        print("  spark:", a, "\n  duck :", b)
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"ERROR {name}: {str(e)[:400]}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
