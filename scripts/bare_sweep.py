"""Bare-driver scale sweep: run named corpus entries at an sf dir on a
DEFAULT-memory session (no gcpde_spark session confs, no 24 GB driver)
and report per-entry wall time or the failure.

This is the hazard check that caught round 4's shingle-broadcast OOM:
an entry that silently depends on the bench session's big driver heap
fails here. Usage:

    python scripts/bare_sweep.py [sf_dir] [entry ...]

Defaults: sf_dir=/root/repo/benchdata/sf1, entries = all oracle-backed.
Parallelism local[16] like the recorded round-4 sweep.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import SparkSession

    from gcpde_spark.queries import CORPUS

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/repo/benchdata/sf1"
    names = args[1:] or [n for n, s in CORPUS.items() if s.oracle is not None]
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("bare_sweep")
        .getOrCreate()
    )
    failures = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            n = CORPUS[name].build(spark, sf_dir).count()
            print(f"ok   {name}: {n} rows in {time.perf_counter() - t0:.1f}s")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"FAIL {name}: {str(e)[:200]}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
