"""Decompose per-query COLD cost into its phases, and A/B optimizer confs.

The bench's cold median (3 rebuilt runs) pays, per run:
  build  — DataFrame construction (PySpark eagerly ANALYZES after every
           transformation, so this is Catalyst analysis, paid on a tree
           that grows as the query builds up)
  exec   — optimize + physical planning + codegen-source generation
           (Janino compile amortizes across runs via the codegen cache)
           + job scheduling + execution
A warm run on the SAME prepared DataFrame pays only scheduling+execution.
This script measures each phase for the slowest cold entries so
optimization effort goes where the time actually is, and A/Bs runtime
SQLConf knobs that trade optimizer work for plan quality
(constraint propagation being the classic one for self-join-shaped
plans: its cost is superlinear in duplicated subtree size while its
benefit — inferred IsNotNull/equality pushdown — is execution-side and
already sub-ms at bench SF).

Usage: python scripts/cold_decomp.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gcpde_spark.queries import CORPUS
from gcpde_spark.session import build_session

DEFAULT = [
    "l32_bm25_topk",
    "l33_profile_neighbors",
    "l14_curation_pipeline",
    "l13_winnowing",
    "c57_recursive_cte",
    "x05_lsh_topk",
    "l17_decontaminate",
    "l29_quality_select",
    "l05_ngram_jaccard",
    "x08_dedup_clusters",
    "x07_ivf_topk",
    "x04_simhash_neardup",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    confs = {
        "spark.ui.enabled": "false",
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "16",
        "spark.sql.files.maxPartitionBytes": str(8 << 20),
    }
    spark = build_session(app_name="cold_decomp", extra_confs=confs)
    CORPUS["c06_three_way_join_agg"].build(spark, sf).toPandas()

    print(f"{'query':28s} {'build':>7s} {'first':>7s} {'warm':>7s} {'rebuilt':>8s}")
    rebuilt: dict[str, float] = {}
    for name in names:
        spec = CORPUS[name]
        t0 = time.perf_counter()
        df = spec.build(spark, sf)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.toPandas()
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.toPandas()
        t_warm = time.perf_counter() - t0
        # the bench-cold path after Janino has warmed: rebuild + run
        t0 = time.perf_counter()
        spec.build(spark, sf).toPandas()
        t_re = time.perf_counter() - t0
        rebuilt[name] = t_re
        print(
            f"{name:28s} {t_build:7.3f} {t_first:7.3f} {t_warm:7.3f} {t_re:8.3f}"
        )

    # A/B: constraint propagation (runtime SQLConf). Interleave per query
    # so JVM drift cancels; 2 samples each arm.
    print("\nA/B spark.sql.constraintPropagation.enabled (rebuilt-run secs)")
    print(f"{'query':28s} {'on':>7s} {'off':>7s} {'delta':>7s}")
    t_on_total = t_off_total = 0.0
    for name in names:
        spec = CORPUS[name]
        samples: dict[str, list[float]] = {"true": [], "false": []}
        for _ in range(2):
            for arm in ("true", "false"):
                spark.conf.set("spark.sql.constraintPropagation.enabled", arm)
                t0 = time.perf_counter()
                spec.build(spark, sf).toPandas()
                samples[arm].append(time.perf_counter() - t0)
        on = min(samples["true"])
        off = min(samples["false"])
        t_on_total += on
        t_off_total += off
        print(f"{name:28s} {on:7.3f} {off:7.3f} {on - off:7.3f}")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "true")
    print(f"{'TOTAL':28s} {t_on_total:7.3f} {t_off_total:7.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
