"""Interleaved cross-arm A/B for the r10 driver-vs-builder divergence
(VERDICT r10 #2): x05_lsh_topk, x07_ivf_topk, l33_profile_neighbors
regressed 45-81% in the r10 driver window with PROVABLY zero code
change in their paths (similarity.py byte-identical r9→r10, entries
untouched), while the builder's same-code pair read flat. This harness
decides which measurement was wrong.

Design (round-7 bench discipline: paired arms, swap arms across
processes, medians):

- runner mode (``--run <repo_root>``): a fresh process pins sys.path to
  one checkout, builds the exact sf0.1 bench session profile
  (AQE off / 4 shuffle partitions / 8 MB splits / tmpfs local dir +
  warehouse / worker prefork — the profile the driver's numbers came
  from), times the three entries with bench.py's protocol (median of 3
  ``toPandas`` rebuilds, GC drain between entries) plus an inline no-op
  floor probe, and prints one JSON line.
- driver mode (default): alternates runner subprocesses between the r9
  checkout and HEAD, ABBA order so slow host drift cancels across arms,
  and prints per-(arm, entry) medians over all iterations.

Usage:
  python scripts/divergence_ab.py [r9_worktree] [iterations]
  python scripts/divergence_ab.py --run <repo_root>   (internal)

NOTE: deliberately NO ``from __future__ import annotations`` — the
worker-prefork pandas_udf infers its eval type from the hints, and
stringified hints fail infer_eval_type (same constraint as bench.py).
"""

import json
import os
import statistics
import subprocess
import sys
import time

ENTRIES = ["l33_profile_neighbors", "x05_lsh_topk", "x07_ivf_topk"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 3


def runner(repo: str) -> None:
    sys.path.insert(0, repo)
    if os.path.isdir("/dev/shm"):
        os.environ.setdefault(
            "GCPDE_SPARK_WAREHOUSE", "/dev/shm/gcpde_spark_divab_wh"
        )
    import gc

    from gcpde_spark.queries import CORPUS
    from gcpde_spark.session import build_session

    confs = {
        "spark.ui.enabled": "false",
        # the sf0.1 bench tier profile (bench.py sub-GB branch)
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "4",
        "spark.sql.files.maxPartitionBytes": str(8 << 20),
    }
    if os.path.isdir("/dev/shm"):
        confs["spark.local.dir"] = "/dev/shm/gcpde_spark_divab"
    spark = build_session(app_name="gcpde_divergence_ab", extra_confs=confs)

    # bench.py's session warm-up: flagship query + python-worker prefork
    CORPUS["c06_three_way_join_agg"].build(spark, SF_DIR).toPandas()
    import pandas as pd
    from pyspark.sql.functions import col, pandas_udf

    def _mul(v: pd.Series) -> pd.Series:
        return v * 1.0

    _warm = pandas_udf(_mul, "double")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)
    spark.range(cpus, numPartitions=cpus).select(
        _warm(col("id").cast("double"))
    ).collect()

    def floor() -> float:
        t0 = time.perf_counter()
        spark.range(1).count()
        return time.perf_counter() - t0

    out: dict = {"repo": repo, "floors": [round(floor(), 4) for _ in range(3)]}
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in ENTRIES:
        vals = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            CORPUS[name].build(spark, SF_DIR).toPandas()
            vals.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(vals), 4)
        samples[name] = [round(v, 4) for v in vals]
        gc.collect()
        spark._jvm.System.gc()
        out["floors"].append(round(floor(), 4))
    out["queries"] = timings
    out["samples"] = samples
    spark.stop()
    print("DIVAB " + json.dumps(out), flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        runner(sys.argv[2])
        return
    r9 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r9tree"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    head = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arms = {"r9": r9, "head": head}
    results: dict[str, list[dict]] = {"r9": [], "head": []}
    # ABBA ordering: iteration i runs (r9, head) on even i, (head, r9)
    # on odd, so slow monotone host drift hits both arms symmetrically
    for i in range(iters):
        order = ["r9", "head"] if i % 2 == 0 else ["head", "r9"]
        for arm in order:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run", arms[arm]],
                capture_output=True,
                text=True,
                cwd="/tmp",
            )
            line = next(
                (l for l in p.stdout.splitlines() if l.startswith("DIVAB ")), None
            )
            if line is None:
                print(json.dumps({"arm": arm, "iter": i, "error": p.stderr[-500:]}))
                continue
            rec = json.loads(line[6:])
            rec["iter"] = i
            results[arm].append(rec)
            print(
                json.dumps(
                    {
                        "arm": arm,
                        "iter": i,
                        "queries": rec["queries"],
                        "floors": rec["floors"],
                    }
                ),
                flush=True,
            )
    summary = {}
    for arm, recs in results.items():
        for e in ENTRIES:
            vals = [r["queries"][e] for r in recs if e in r.get("queries", {})]
            if vals:
                summary[f"{e}/{arm}"] = {
                    "median": round(statistics.median(vals), 4),
                    "all": vals,
                }
    print(json.dumps({"summary": summary, "sf_dir": SF_DIR, "iters": iters}))


if __name__ == "__main__":
    main()
