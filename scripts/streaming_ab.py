"""Stateful streaming A/B at the GB tier (VERDICT r10 #7).

The five streaming entries (c60 tumbling, c67 sliding, c68 enrich,
c69 dedup, c70 sessions) carry reasoned dispositions but had no
at-scale measurement: `_drain_stream` pins the state-partition count
to 4 (measured right at sf0.1, where 16 stores were pure setup
overhead) and checkpoints to tmpfs. At sf10 the events stream is 10 M
rows / 211 MB — enough rows that 4 state stores might serialize real
aggregation work.

This times each entry end-to-end (build + drain + batch tail +
toPandas, the bench-timed action) with state_partitions ∈ {4, 16, 32},
interleaved median-of-N, and records the state-store facts from the
query's progress events (micro-batch count, trigger durations, state
rows / memory per operator) so the disposition is measured, not
reasoned. Result parity across partition counts is hash-checked per
entry (complete-mode aggregation results are partition-independent;
the check proves it on this data).

Usage: python scripts/streaming_ab.py [sf_dir] [runs]
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
        "GCPDE_SPARK_WAREHOUSE", "/dev/shm/gcpde_spark_streamab_wh"
    )

from pyspark.sql import functions as F

from gcpde_spark.catalog import load_table
from gcpde_spark.session import build_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf10"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

ENTRIES = [
    "c60_streaming_tumbling",
    "c67_streaming_sliding",
    "c68_streaming_enrich",
    "c69_streaming_dedup",
    "c70_streaming_sessions",
]
PARTITIONS = [4, 16, 32]

_LAST_PROGRESS: list[dict] = []


def _install_drain(state_partitions: int) -> None:
    """Patch ext_corpus._drain_stream with the same body but a chosen
    state-partition count + progress capture."""
    import shutil
    import uuid as _uuid

    from gcpde_spark.queries import ext_corpus

    def drain(spark, agg, name, _sp=state_partitions):
        global _LAST_PROGRESS
        for q in spark.streams.active:
            if q.name == name:
                q.stop()
                q.awaitTermination()
        ckpt = (
            Path("/dev/shm") / "gcpde_spark_ckpt" / f"{name}-{_uuid.uuid4().hex[:12]}"
            if Path("/dev/shm").is_dir()
            else None
        )
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(_sp))
        try:
            w = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .trigger(availableNow=True)
            )
            if ckpt is not None:
                w = w.option("checkpointLocation", str(ckpt))
            q = w.start()
            q.awaitTermination()
            _LAST_PROGRESS = [json.loads(p.json) for p in q.recentProgress]
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
            if ckpt is not None:
                shutil.rmtree(ckpt, ignore_errors=True)
        return spark.table(name)

    ext_corpus._drain_stream = drain


def _row_hash(df) -> dict:
    cols = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null")).alias(c)
        for c in df.columns
    ]
    h = F.xxhash64(F.concat_ws("\x01", *cols))
    row = (
        df.select(h.alias("_h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_h").cast("decimal(38,0)")).alias("s"),
        )
        .first()
    )
    return {"n": int(row["n"]), "s": str(row["s"])}


def _progress_facts() -> dict:
    batches = len(_LAST_PROGRESS)
    trig_ms = sum(p.get("durationMs", {}).get("triggerExecution", 0) for p in _LAST_PROGRESS)
    state = []
    if _LAST_PROGRESS:
        for op in _LAST_PROGRESS[-1].get("stateOperators", []):
            state.append(
                {
                    "op": op.get("operatorName"),
                    "rows": op.get("numRowsTotal"),
                    "mem_mb": round(op.get("memoryUsedBytes", 0) / 1e6, 1),
                    "commit_ms": op.get("allUpdatesTimeMs", 0)
                    + op.get("commitTimeMs", 0),
                }
            )
    return {"batches": batches, "trigger_ms": trig_ms, "state": state}


def main() -> None:
    confs = {
        "spark.sql.files.maxPartitionBytes": str(32 << 20),
        "spark.sql.autoBroadcastJoinThreshold": str(64 << 20),
    }
    if os.path.isdir("/dev/shm"):
        confs["spark.local.dir"] = "/dev/shm/gcpde_spark_streamab"
    spark = build_session(app_name="gcpde_streaming_ab", extra_confs=confs)
    load_table(spark, SF_DIR, "nation").count()
    from gcpde_spark.queries import CORPUS

    # streaming-engine warm-up (same as bench.py: classload outside samples)
    _install_drain(1)
    CORPUS["c60_streaming_tumbling"].build(spark, SF_DIR).count()

    # parity across partition counts (complete-mode results must match)
    for entry in ENTRIES:
        hashes = {}
        for sp in PARTITIONS:
            _install_drain(sp)
            hashes[sp] = _row_hash(CORPUS[entry].build(spark, SF_DIR))
        ok = len({json.dumps(h, sort_keys=True) for h in hashes.values()}) == 1
        print(json.dumps({"entry": entry, "parity": ok, "hash": hashes[PARTITIONS[0]]}), flush=True)
        if not ok:
            spark.stop()
            sys.exit(1)

    samples: dict[tuple[str, int], list[float]] = {}
    facts: dict[tuple[str, int], dict] = {}
    for r in range(RUNS):
        for entry in ENTRIES:
            for sp in PARTITIONS:
                _install_drain(sp)
                spark.sparkContext._jvm.System.gc()
                gc.collect()
                spark.sparkContext.setJobDescription(f"{entry} sp={sp} r{r}")
                t0 = time.perf_counter()
                CORPUS[entry].build(spark, SF_DIR).toPandas()
                dt = time.perf_counter() - t0
                samples.setdefault((entry, sp), []).append(dt)
                facts[(entry, sp)] = _progress_facts()
                print(
                    json.dumps(
                        {
                            "entry": entry,
                            "state_partitions": sp,
                            "run": r,
                            "sec": round(dt, 3),
                            **facts[(entry, sp)],
                        }
                    ),
                    flush=True,
                )
    summary = {
        f"{e}/sp{sp}": {
            "median_sec": round(statistics.median(v), 3),
            "all": [round(x, 3) for x in v],
            **facts[(e, sp)],
        }
        for (e, sp), v in samples.items()
    }
    print(json.dumps({"summary": summary, "sf_dir": SF_DIR, "runs": RUNS}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
