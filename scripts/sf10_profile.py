"""A/B profile of the top sf10 relational-subset entries (VERDICT r9 #2b).

Times the shipped plan of c06/c08/c09/c55/c58 against candidate rewrites
at /root/repo/benchdata/sf10 under the exact bench.py GB-tier session
profile (AQE on, 32 MB splits, 64 MB broadcast threshold, tmpfs shuffle,
per-entry GC drain). Median of N fully-materialized (Arrow toPandas)
runs per variant, interleaved variant order per round so host drift hits
every variant equally.

Usage: python scripts/sf10_profile.py [sf_dir] [runs] [only_prefix,...]
Output: one JSON line per (entry, variant) + a summary JSON line.
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
from gcpde_spark.queries.corpus import cents
from gcpde_spark.session import build_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf10"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
ONLY = [p for p in (sys.argv[3].split(",") if len(sys.argv) > 3 else []) if p]


# ----------------------------------------------------------------- c06
def c06_shipped(spark, sf):
    from gcpde_spark.queries.corpus import c06

    return c06(spark, sf)


def c06_preagg_orderkey(spark, sf):
    """Pre-aggregate lineitem revenue by l_orderkey BEFORE the fact-fact
    join: partial agg shrinks the shuffled lineitem side ~4x (rows per
    order), the orders join probes 1 row per order, and the final
    n_name agg is tiny. Exactness: per-order e4 sums are bounded by
    7 lineitems x ~1e10 e4 units, far under BIGINT; the final merge
    keeps the hierarchical DECIMAL step."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    n = load_table(spark, sf, "nation")
    rev_e4 = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    per_order = li.groupBy("l_orderkey").agg(F.sum(rev_e4).alias("_oe4"))
    joined = (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    partials = joined.groupBy(
        "n_name", F.spark_partition_id().alias("_pid")
    ).agg(F.sum("_oe4").alias("_ps"))
    return (
        partials.groupBy("n_name")
        .agg(F.sum(F.col("_ps").cast("decimal(38,0)")).alias("_s"))
        .select(
            "n_name", (F.col("_s").cast("double") / F.lit(10000.0)).alias("rev")
        )
        .orderBy(F.desc("rev"), "n_name")
    )


# ------------------------------------------------------------- c08/c09
def c08_shipped(spark, sf):
    from gcpde_spark.queries.corpus import c08

    return c08(spark, sf)


def c08_distinct_probe(spark, sf):
    """Dedup the build side to distinct qualifying custkeys before the
    semi join: map-side partial dedup shrinks the shuffled build ~10x,
    and AQE sees an ~8 B/row build it can flip to broadcast at runtime
    (the 100 TB-safe form: no forced hint, SMJ stays if it's big)."""
    c = load_table(spark, sf, "customer")
    keys = (
        load_table(spark, sf, "orders")
        .where(F.col("o_totalprice") > 100000)
        .select("o_custkey")
        .distinct()
    )
    return (
        c.join(keys, c.c_custkey == keys.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


def c09_shipped(spark, sf):
    from gcpde_spark.queries.corpus import c09

    return c09(spark, sf)


def c09_distinct_probe(spark, sf):
    c = load_table(spark, sf, "customer")
    keys = load_table(spark, sf, "orders").select("o_custkey").distinct()
    return (
        c.join(keys, c.c_custkey == keys.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


# ----------------------------------------------------------------- c55
def c55_shipped(spark, sf):
    from gcpde_spark.queries.ext_corpus import c55

    return c55(spark, sf)


def c55_scalars_below_sort(spark, sf):
    """Sort AFTER the three scalars: the token array never rides the
    range exchange — only (doc_id, first3, n_long, total_chars) does.
    Tokenize-once is preserved WITHOUT the sort barrier because
    CollapseProject refuses to inline a non-cheap alias referenced more
    than once (Spark 3.3+); verified by plan inspection below."""
    from gcpde_spark.llm.text import tokens

    docs = load_table(spark, sf, "documents")
    toks = F.col("_toks")
    return (
        docs.select("doc_id", tokens("text").alias("_toks"))
        .select(
            "doc_id",
            F.array_join(
                F.transform(F.slice(toks, 1, 3), lambda t: F.upper(t)), "-"
            ).alias("first3"),
            F.size(F.filter(toks, lambda t: F.length(t) > 4))
            .cast("bigint")
            .alias("n_long"),
            F.coalesce(
                F.aggregate(
                    toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("total_chars"),
        )
        .orderBy("doc_id")
    )


# ----------------------------------------------------------------- c58
def c58_shipped(spark, sf):
    from gcpde_spark.queries.ext_corpus import c58

    return c58(spark, sf)


def c58_no_final_sort(spark, sf):
    """Decomposition probe, NOT a candidate (the oracle needs the
    ORDER BY): isolates the final range-exchange + sort cost."""
    e = load_table(spark, sf, "events")
    return e.selectExpr(
        "event_id",
        "user_id",
        "ts",
        "CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts"
        " RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW)"
        " AS BIGINT) AS n_24h",
        "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER"
        " (PARTITION BY user_id ORDER BY ts"
        " RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW)"
        " AS DOUBLE) / 100.0 AS sv_24h",
    )


def c58_scan_sort_only(spark, sf):
    """Decomposition probe: scan + the window's exchange+sort shape
    (same partitioning + ordering), no window evaluation."""
    e = load_table(spark, sf, "events")
    return e.repartition(F.col("user_id")).sortWithinPartitions("user_id", "ts")


VARIANTS = {
    "c06": [("shipped", c06_shipped), ("preagg_orderkey", c06_preagg_orderkey)],
    "c08": [("shipped", c08_shipped), ("distinct_probe", c08_distinct_probe)],
    "c09": [("shipped", c09_shipped), ("distinct_probe", c09_distinct_probe)],
    "c55": [("shipped", c55_shipped), ("scalars_below_sort", c55_scalars_below_sort)],
    "c58": [
        ("shipped", c58_shipped),
        ("no_final_sort", c58_no_final_sort),
        ("scan_sort_only", c58_scan_sort_only),
    ],
}


def main() -> None:
    input_bytes = sum(p.stat().st_size for p in Path(SF_DIR).glob("*.parquet"))
    confs = {
        "spark.sql.files.maxPartitionBytes": str(32 << 20),
        "spark.sql.autoBroadcastJoinThreshold": str(64 << 20),
    }
    if os.path.isdir("/dev/shm"):
        confs["spark.local.dir"] = "/dev/shm/gcpde_spark_profile"
    spark = build_session(app_name="gcpde_spark_sf10_profile", extra_confs=confs)
    # session warm-up (same rationale as bench.py)
    load_table(spark, SF_DIR, "nation").count()

    entries = {
        k: v
        for k, v in VARIANTS.items()
        if not ONLY or any(k.startswith(p) for p in ONLY)
    }
    samples: dict[tuple[str, str], list[float]] = {
        (e, n): [] for e, vs in entries.items() for n, _ in vs
    }
    rowcounts: dict[tuple[str, str], int] = {}
    for r in range(RUNS):
        for entry, variants in entries.items():
            for name, fn in variants:
                spark.sparkContext._jvm.System.gc()
                gc.collect()
                t0 = time.perf_counter()
                pdf = fn(spark, SF_DIR).toPandas()
                dt = time.perf_counter() - t0
                samples[(entry, name)].append(dt)
                rowcounts[(entry, name)] = len(pdf)
                print(
                    json.dumps(
                        {
                            "entry": entry,
                            "variant": name,
                            "run": r,
                            "sec": round(dt, 3),
                            "rows": len(pdf),
                        }
                    ),
                    flush=True,
                )
    summary = {
        f"{e}/{n}": {
            "median_sec": round(statistics.median(v), 3),
            "all": [round(x, 3) for x in v],
            "rows": rowcounts[(e, n)],
        }
        for (e, n), v in samples.items()
    }
    print(json.dumps({"summary": summary, "sf_dir": SF_DIR, "runs": RUNS}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
