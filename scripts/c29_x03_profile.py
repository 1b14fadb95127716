"""c29 write-path decomposition + x03 ordering plan evidence at sf10
(VERDICT r10 #4 and #6).

c29_merge_upsert (9.0 s in the r10 sf10 bench) was attributed to "sink
I/O" without a profile. The entry is a pure DataFrame merge (anti-join
+ union + declared ORDER BY) whose bench-timed action is ``toPandas``
— there is no table sink. This decomposes the cold cost into:

  plan_build   — CORPUS build call (Catalyst analysis only)
  noop_nosort  — merge WITHOUT the declared orderBy, noop sink
  noop_full    — full entry, noop sink (adds the range exchange + sort)
  topandas     — full entry, toPandas (adds the Arrow driver collect,
                 ~15 M rows x (bigint, double) at sf10 — the same
                 result-materialization the DuckDB .df() side pays)

and dumps the executed plan so the join strategy (SMJ vs runtime
broadcast anti-join) is part of the artifact.

x03_minhash_neardup: VERDICT #6 asked whether the final
``orderBy(id_a, id_b)``'s range-partitioner sampling pass re-executes
pair GENERATION past the persist. This runs the entry cold, dumps the
executed (AQE-final) plan, and reports whether the sort's child is an
InMemoryTableScan (sampling fills + reads the cache — generation runs
once) or the raw generation subtree (it runs twice).

Usage: python scripts/c29_x03_profile.py [sf_dir] [runs]
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
    os.environ.setdefault(
        "GCPDE_SPARK_WAREHOUSE", "/dev/shm/gcpde_spark_profile_wh"
    )

from pyspark.sql import functions as F

from gcpde_spark.catalog import load_table
from gcpde_spark.session import build_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf10"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def _c29_merged(spark, sf):
    """The entry's frame WITHOUT the declared orderBy (decomposition
    probe, not a candidate — the oracle needs the ORDER BY)."""
    from gcpde_spark.tables import merge_dataframes

    o = load_table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    updates = o.where(F.col("o_orderkey") % 100 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000
    )
    max_key = o.agg(F.max("o_orderkey").alias("_mk"))
    inserts = (
        spark.range(1, 11)
        .crossJoin(F.broadcast(max_key))
        .select(
            (F.col("_mk") + F.col("id")).alias("o_orderkey"),
            (F.col("id").cast("double") * 1000).alias("o_totalprice"),
        )
    )
    delta = updates.unionByName(inserts)
    return merge_dataframes(o, delta, ["o_orderkey"])


def _formatted(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    confs = {
        "spark.sql.files.maxPartitionBytes": str(32 << 20),
        "spark.sql.autoBroadcastJoinThreshold": str(64 << 20),
    }
    if os.path.isdir("/dev/shm"):
        confs["spark.local.dir"] = "/dev/shm/gcpde_spark_profile"
    spark = build_session(app_name="gcpde_c29_x03_profile", extra_confs=confs)
    load_table(spark, SF_DIR, "nation").count()
    from gcpde_spark.queries import CORPUS

    # ---------------- c29 decomposition ----------------
    def plan_build():
        t0 = time.perf_counter()
        df = CORPUS["c29_merge_upsert"].build(spark, SF_DIR)
        return time.perf_counter() - t0, df

    variants = {}

    def _timed(name, fn):
        vals = []
        for r in range(RUNS):
            spark.sparkContext._jvm.System.gc()
            gc.collect()
            spark.sparkContext.setJobDescription(f"c29 {name} r{r}")
            t0 = time.perf_counter()
            fn()
            vals.append(time.perf_counter() - t0)
        variants[name] = {
            "median_sec": round(statistics.median(vals), 3),
            "all": [round(v, 3) for v in vals],
        }
        print(json.dumps({"c29": name, **variants[name]}), flush=True)

    _timed("plan_build", lambda: CORPUS["c29_merge_upsert"].build(spark, SF_DIR))
    _timed(
        "noop_nosort",
        lambda: _c29_merged(spark, SF_DIR)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    _timed(
        "noop_full",
        lambda: CORPUS["c29_merge_upsert"]
        .build(spark, SF_DIR)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    _timed(
        "topandas",
        lambda: CORPUS["c29_merge_upsert"].build(spark, SF_DIR).toPandas(),
    )

    # executed plan of the full entry (after one run, AQE-final)
    df = CORPUS["c29_merge_upsert"].build(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    plan = _formatted(spark, df)
    Path("/root/repo/plans/r11/c29_merge_upsert_profile.txt").write_text(plan)
    joins = [
        ln.strip()
        for ln in plan.splitlines()
        if "Join" in ln and ln.strip().startswith(("+", "*", ":", "|"))
    ]
    print(json.dumps({"c29_plan_joins": joins[:8]}), flush=True)

    # ---------------- x03 ordering evidence ----------------
    # cold-shaped: clear the shared pair cache first
    from gcpde_spark.queries import llm_corpus

    per_session = llm_corpus._MINHASH_PAIRS.get(spark)
    if per_session:
        for v in per_session.values():
            try:
                v.unpersist()
            except Exception:  # noqa: BLE001
                pass
        per_session.clear()
    spark.catalog.clearCache()

    def _jobs() -> int:
        return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()

    x03 = CORPUS["x03_minhash_neardup"].build(spark, SF_DIR)
    j0 = _jobs()
    t0 = time.perf_counter()
    x03.write.format("noop").mode("overwrite").save()
    cold = time.perf_counter() - t0
    j1 = _jobs()
    plan = _formatted(spark, x03)
    Path("/root/repo/plans/r11/x03_ordering_executed.txt").write_text(plan)
    # find what feeds the range exchange
    lines = plan.splitlines()
    range_idx = [i for i, ln in enumerate(lines) if "rangepartitioning" in ln]
    cache_fed = any("InMemoryTableScan" in ln or "InMemoryRelation" in ln for ln in lines)
    print(
        json.dumps(
            {
                "x03_cold_noop_sec": round(cold, 3),
                "x03_jobs": j1 - j0,
                "x03_plan_has_inmemory": cache_fed,
                "x03_range_exchange_lines": [
                    lines[i].strip() for i in range_idx[:3]
                ],
            }
        ),
        flush=True,
    )
    print(json.dumps({"summary": variants, "sf_dir": SF_DIR, "runs": RUNS}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
