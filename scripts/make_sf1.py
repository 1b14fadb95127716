"""Generate a 10x-scaled replica of /root/testdata/sf0.1 for the sf1
bench data point (BASELINE.md "floor amortizes" claim).

NOT test data — correctness is gated on the driver's sf0.01 tables.
This exists purely to time the same corpus at 10x the rows, so the
construction is a 10-way union of sf0.1 with key offsets chosen so
every foreign key keeps referencing the matching replica:

- region/nation: copied once (fixed-cardinality dims, like TPC-H).
- customer/supplier/part/orders/lineitem: replica i offsets every
  entity key by i * ceil(max_key+1); *_nationkey/*_regionkey stay.
- events: event_id offset; ts/user_id/event_type kept (user_id is a
  free attribute, not a key into another table).
- documents/embeddings: doc_id/vec_id offset, payloads kept. Replicated
  text means every doc gains 10 exact copies — fine for timing, wrong
  for any correctness conclusion (dedup cardinalities change).

Writes /root/repo/benchdata/sf1/*.parquet (git-ignored). ~10 s, DuckDB.

Round 6: generalized — ``python scripts/make_sf1.py [copies] [name]``
(default ``10 sf1``; e.g. ``30 sf3`` builds the sf3 replica behind the
BASELINE.md cold-ratio amortization curve).
"""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
_NAME = sys.argv[2] if len(sys.argv) > 2 else "sf1"
DST = Path(__file__).resolve().parent.parent / "benchdata" / _NAME

KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["region", "nation"]


def main() -> None:
    DST.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    for t in COPY_ONCE:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT parquet)"
        )

    # one offset unit per referenced entity, shared by every referencing
    # column so joins land in the same replica
    offsets: dict[str, int] = {}
    for t, keys in KEYED.items():
        entity = keys[0]
        mx = con.execute(
            f"SELECT max({entity}) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        offsets[entity] = int(math.ceil(mx + 1))
    # referencing columns reuse the referenced entity's unit
    unit_of = {
        "c_custkey": offsets["c_custkey"],
        "s_suppkey": offsets["s_suppkey"],
        "p_partkey": offsets["p_partkey"],
        "o_orderkey": offsets["o_orderkey"],
        "o_custkey": offsets["c_custkey"],
        "l_orderkey": offsets["o_orderkey"],
        "l_partkey": offsets["p_partkey"],
        "l_suppkey": offsets["s_suppkey"],
        "event_id": offsets["event_id"],
        "doc_id": offsets["doc_id"],
        "vec_id": offsets["vec_id"],
    }

    for t, keys in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        selects = []
        for i in range(COPIES):
            proj = ", ".join(
                f"({c} + {i * unit_of[c]}) AS {c}" if c in keys else c for c in cols
            )
            selects.append(
                f"SELECT {proj} FROM read_parquet('{SRC}/{t}.parquet')"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{DST}/{t}.parquet' "
            f"(FORMAT parquet, ROW_GROUP_SIZE 122880)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"wrote {DST}")


if __name__ == "__main__":
    main()
