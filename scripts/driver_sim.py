"""Driver simulation — the t2 gate, run locally before committing.

Replicates what the round driver does with ``__spark_entry__.py``:

1. ``entry(spark)`` on a BARE session (no gcpde_spark session confs).
2. Every ``queries()`` entry at sf0.01, compared against its
   ``oracle_sql()`` via DuckDB: row count + sorted column names +
   order-insensitive value hash.  Keys without an oracle get a
   rows-only check.  Stateful queries (c28, c29) run twice to check
   idempotence.

Exit 0 iff every oracle-backed query hash-matches and every
oracle-less query returns rows without error.
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import json
import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()
STATEFUL = {"c28_ctas_scanback", "c29_merge_upsert", "c44_jsonl_roundtrip"}


def _canon(v):
    if v is None:
        return "\x00"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            v = 0.0  # collapse -0.0
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    from pyspark.sql import SparkSession

    import __spark_entry__ as ent

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )

    # --- entry() smoke ---
    edf = ent.entry(spark)
    erows = edf.collect()
    print(f"entry(): {len(erows)} rows, schema={[f.name for f in edf.schema.fields]}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = ent.queries()
    oracles = ent.oracle_sql()
    results, n_fail = {}, 0
    for name, fn in qs.items():
        try:
            runs = 2 if name in STATEFUL else 1
            for _ in range(runs):
                df = fn(spark, SF_DIR)
                cols = [f.name for f in df.schema.fields]
                rows = [tuple(r) for r in df.collect()]
            if name in oracles:
                orows = con.execute(oracles[name]).fetchall()
                ocols = [d[0] for d in con.description]
                ok_rows = len(rows) == len(orows)
                ok_cols = sorted(cols) == sorted(ocols)
                ok_hash = value_hash(cols, rows) == value_hash(ocols, orows)
                ok = ok_rows and ok_cols and ok_hash
                results[name] = {
                    "rows_match": ok_rows,
                    "cols_match": ok_cols,
                    "hash_match": ok_hash,
                }
                if not ok:
                    n_fail += 1
                    detail = ""
                    if not ok_rows:
                        detail = f" spark={len(rows)} duck={len(orows)}"
                    if not ok_cols:
                        detail += f" cols spark={sorted(cols)} duck={sorted(ocols)}"
                    print(f"FAIL {name}: {results[name]}{detail}")
                else:
                    print(f"ok   {name} ({len(rows)} rows, hash match)")
            else:
                results[name] = {"rows_only": True, "rows": len(rows)}
                print(f"ok   {name} ({len(rows)} rows, no oracle)")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            results[name] = {"error": str(e)[:300]}
            print(f"ERROR {name}: {str(e)[:300]}")

    print(json.dumps({"total": len(qs), "fail": n_fail}))
    # Persist the full matrix: the round driver records only its first-50
    # window, so this file is the committed evidence that the past-window
    # entries (l17+, c48, x09) hash-match their oracles too.
    Path(__file__).resolve().parent.parent.joinpath(
        "CORRECTNESS_SELF.json"
    ).write_text(json.dumps(results, indent=1) + "\n")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
