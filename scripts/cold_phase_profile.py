"""Per-entry cold-time decomposition: where does a corpus entry's cold
sample go — build() (probe jobs/persists), Catalyst analysis,
optimization+physical planning, first execution (codegen + JIT + run),
or steady-state execution?

The sf0.1 warm series (BENCH_SELF.json) shows steady-state execution is
20-40 ms for nearly every entry, so the cold medians are dominated by
per-plan driver cost + dispatch floor. This script attributes that cost
phase by phase so optimization targets the right layer (guide §1:
measure first).

Usage: python scripts/cold_phase_profile.py [entry,entry,...] [sf_dir] [runs]
Defaults: 15 slowest entries from BENCH_SELF.json, /root/testdata/sf0.1, 3.
Output: one JSON line per entry + a total line.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.path.isdir("/dev/shm"):
    os.environ.setdefault("GCPDE_SPARK_WAREHOUSE", "/dev/shm/gcpde_spark_phase_wh")

from gcpde_spark.queries import CORPUS  # noqa: E402
from gcpde_spark.session import build_session  # noqa: E402

ENTRIES = [e for e in (sys.argv[1].split(",") if len(sys.argv) > 1 else []) if e]
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
RUNS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def main() -> None:
    if not ENTRIES:
        bench = json.load(open(Path(__file__).parent.parent / "BENCH_SELF.json"))
        names = sorted(bench["queries"], key=lambda k: -bench["queries"][k])[:15]
    else:
        names = ENTRIES

    input_bytes = sum(p.stat().st_size for p in Path(SF_DIR).glob("*.parquet"))
    confs = {
        "spark.ui.enabled": "false",
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "4" if input_bytes < (64 << 20) else "16",
        "spark.sql.files.maxPartitionBytes": str(8 << 20),
    }
    if os.path.isdir("/dev/shm"):
        confs["spark.local.dir"] = "/dev/shm/gcpde_spark_phase"
    spark = build_session(app_name="gcpde_spark_phase", extra_confs=confs)

    # session warm-up parity with bench.py
    CORPUS["c06_three_way_join_agg"].build(spark, SF_DIR).toPandas()
    try:
        import pandas as pd
        from pyspark.sql.functions import col, pandas_udf

        def _mul(v: pd.Series) -> pd.Series:
            return v * 1.0

        _warm = pandas_udf(_mul, "double")
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)
        spark.range(cpus, numPartitions=cpus).select(
            _warm(col("id").cast("double"))
        ).collect()
    except Exception as e:  # noqa: BLE001
        print(f"warn: prefork failed: {e}", file=sys.stderr)

    totals = {"build": 0.0, "analyze": 0.0, "plan": 0.0, "exec1": 0.0, "exec2": 0.0}
    for name in names:
        spec = CORPUS[name]
        rows = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = spec.build(spark, SF_DIR)
            t1 = time.perf_counter()
            df.schema  # force analysis
            t2 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()  # optimize + plan
            t3 = time.perf_counter()
            df.toPandas()  # codegen + first execution + result path
            t4 = time.perf_counter()
            df.toPandas()  # steady-state execution
            t5 = time.perf_counter()
            rows.append((t1 - t0, t2 - t1, t3 - t2, t4 - t3, t5 - t4))
            gc.collect()
        med = [round(statistics.median(c), 4) for c in zip(*rows)]
        rec = dict(zip(("build", "analyze", "plan", "exec1", "exec2"), med))
        for k, v in rec.items():
            totals[k] += v
        rec["entry"] = name
        print(json.dumps(rec, separators=(",", ":")), flush=True)
    totals = {k: round(v, 3) for k, v in totals.items()}
    totals["entry"] = "_TOTAL"
    print(json.dumps(totals, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
