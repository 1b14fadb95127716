"""Benchmark harness: runs the corpus at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line with per-query medians.

Protocol (BASELINE.md §measured): warm session, median of 3 runs per query,
wall-clock seconds. Each run executes the full plan and fully materializes
the result on the driver via the Arrow path (``toPandas``) — the columnar
analog of the DuckDB baseline's ``fetchall`` (row-at-a-time ``collect``
would add pure Python deserialization cost that neither engine's natural
result path pays).
"""

import gc
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Managed-table warehouse on tmpfs for the bench process (import-time:
# tables.py reads the env when first imported). The stateful entries
# (c28/c29/c44) write real tables, and at sf10 the root-disk default
# added ~3.3 s to c29's 4.2 s tmpfs median while the DuckDB side of the
# pair merges inside an in-memory database. An explicit caller override
# (e.g. driver_sim's /tmp warehouse) is respected, as is a host without
# a /dev/shm tmpfs (falls back to the library's /tmp default).
# The bench owns the default tmpfs warehouse dir, so it is recreated
# fresh each run (ADVICE r9): stateful entries write real managed
# tables, and stale tables from prior or crashed runs would both skew
# stateful-entry timings and accumulate in RAM across repeated runs.
# An explicit caller override is respected verbatim — and left alone.
if os.path.isdir("/dev/shm") and "GCPDE_SPARK_WAREHOUSE" not in os.environ:
    import shutil

    _BENCH_WH = "/dev/shm/gcpde_spark_bench_wh"
    shutil.rmtree(_BENCH_WH, ignore_errors=True)
    os.environ["GCPDE_SPARK_WAREHOUSE"] = _BENCH_WH

from gcpde_spark.queries import CORPUS
from gcpde_spark.session import build_session

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
# optional comma-separated name-prefix filter, e.g. "c" for the
# relational subset or "l,x" for the LLM family (used for the sf1
# floor-amortization data point in BASELINE.md)
ONLY = [p for p in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if p]
# Quiet-box no-op job floor reference: the SUSTAINED inline median on a
# quiet host (BASELINE.md: 0.044–0.048 s across rounds 3–5 mid-round
# runs; round-9 quiet-window runs read 0.061–0.065 inline med with one
# 0.028 end-of-run best — single best probes undershoot the sustained
# figure and are not the reference). A floor above 2× this marks the
# host degraded for the duration of the run and sets floor_degraded
# below. Kept stable across rounds so the flag means the same thing in
# every committed artifact.
QUIET_FLOOR_S = 0.048


def _input_bytes(sf_dir: str) -> int:
    return sum(p.stat().st_size for p in Path(sf_dir).glob("*.parquet"))


_GC_EVERY = 8
_gc_tick = 0


def _drain_session_garbage(spark) -> None:
    """Long-session hygiene, run BETWEEN timed blocks: ContextCleaner can
    only release finished queries' broadcast/cache blocks after a JVM GC
    proves them unreachable, and Spark's own periodic GC defaults to 30
    MINUTES — longer than this whole run. Over ~740 query builds the
    un-collected broadcasts accumulate into storage-memory eviction
    churn that inflated LATE entries 3-9x (x05 11.1 s in one full run vs
    1.2-1.5 s isolated, the whole tail of the alphabet drifting with
    it). A timer conf (`spark.cleaner.periodicGC.interval=1min`) fixed
    the tail but fired full-GC pauses INSIDE timed samples — the
    pre-warmed flagship query suddenly measured 2.2 s. So: Python cycle
    collection every entry (DataFrame graphs are cyclic; py4j handles
    detach only after collection), and an explicit JVM GC every
    ``_GC_EVERY`` entries, both strictly in the untimed gaps. A
    production driver that outlives many queries wants the timer conf;
    a benchmark wants the pauses placed deterministically."""
    global _gc_tick
    gc.collect()
    _gc_tick += 1
    if _gc_tick % _GC_EVERY == 0:
        spark._jvm.System.gc()


def _prefork_python_workers(spark) -> None:
    """Fork the reusable Python-worker pool once, before any timed sample.

    One task per core, each running a trivial Arrow-batched pandas_udf:
    with ``spark.python.worker.reuse=true`` (default) the forked workers
    park in the per-executor pool and every later Arrow stage (x05/x06/
    x07/x09's matmul UDFs) checks one out instead of forking+importing
    pandas per worker inside its first timed run.
    """
    import pandas as pd
    from pyspark.sql.functions import col, pandas_udf

    # typed-hint form (not a bare lambda): the hint-inference path is the
    # one pandas_udf keeps long-term; the lambda/no-hint path is deprecated
    # and warns every run (ADVICE r7). Works here because this module does
    # NOT use `from __future__ import annotations` — stringified hints
    # would hide the locally-imported `pd` from the inference resolver.
    def _mul(v: pd.Series) -> pd.Series:
        return v * 1.0

    _warm = pandas_udf(_mul, "double")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)
    spark.range(cpus, numPartitions=cpus).select(
        _warm(col("id").cast("double"))
    ).collect()


def _warm_streaming_engine(spark) -> None:
    """Load the Structured Streaming classes once, before any timed sample.

    A 1-row availableNow rate-source drain into a memory sink brings up
    MicroBatchExecution, the offset/commit log, the state-store provider
    class, and the listener-bus threads — JVM classload the session pays
    exactly once, which otherwise lands inside the first streaming
    entry's (c60's) cold sample.
    """
    from pyspark.sql import functions as F

    # Sentinel restore (ADVICE r7): if the key was never explicitly set,
    # unset afterwards instead of pinning the session default as explicit.
    _UNSET = object()
    try:
        old = spark.conf.get("spark.sql.shuffle.partitions", None)
    except Exception:
        old = None
    if old is None:
        old = _UNSET
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        q = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "1")
            .load()
            .groupBy((F.col("value") % 2).alias("k"))
            .count()
            .writeStream.format("memory")
            .queryName("_bench_stream_warm")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if old is _UNSET:
            spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        spark.catalog.dropTempView("_bench_stream_warm")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    confs = {"spark.ui.enabled": "false"}
    input_bytes = _input_bytes(sf_dir)
    if input_bytes < 2 << 30:
        # Static planning profile for sub-GB inputs: AQE materializes one
        # JOB per query stage to re-plan on runtime stats, and a bare
        # no-op job costs ~80 ms on this VM — for KB-to-MB shuffles that
        # per-stage latency exceeds any plan improvement AQE can deliver
        # (measured round 4: 10-query relational subset 4.6 s -> 3.5 s,
        # 5-query LLM subset 6.5 s -> 4.7 s). The production default
        # (gcpde_spark.session.build_session) keeps AQE on: at 100 TB the
        # re-planning amortizes into multi-second stages and its
        # coalescing/skew splitting is what right-sizes tasks.
        confs["spark.sql.adaptive.enabled"] = "false"
        # Reduce partitions tier on input size (round-8 A/B, this box,
        # median-of-3 rebuilds, one arm per process):
        #   sf0.1 (~17 MB): 4 beats 16 by 9-12% (c 12.66 -> 12.29 s, l/x
        #   27.71 -> 24.28 s; x05 2.31 -> 1.10 s) — at KB-to-MB shuffle
        #   sizes a reduce stage's wall time is task scheduling, not work.
        #   1-2 partitions over-serialize real reduce-side CPU (l33's
        #   sparse dot-product: 2.4 s @16 -> 7.7 s @1).
        #   sf1 (~230 MB): 16 beats 4 by 3-4% (c 15.59 vs 16.18 s, l/x
        #   59.65 vs 61.54 s) — per-task work is big enough to amortize
        #   scheduling and wants the parallelism back.
        # Scan-side parallelism is unaffected either way
        # (maxPartitionBytes below keeps 32-way map stages); production
        # sessions keep AQE, which derives exactly this from runtime stats.
        confs["spark.sql.shuffle.partitions"] = (
            "4" if input_bytes < (64 << 20) else "16"
        )
        # Split small parquet files finely enough that map-side CPU work
        # (regex projections, hashing) parallelizes: at the default 128 MB
        # a 25 MB documents file scans as ONE task and a 15-regex-pass
        # projection pins to one core (measured 13 s at sf1; ~1.6 s
        # split). At production scale files exceed the default split size
        # and this knob is moot — it only right-sizes the benchmark box.
        confs["spark.sql.files.maxPartitionBytes"] = str(8 << 20)
    else:
        # GB-scale tier (sf10+, round 9): AQE stays ON — this is the
        # production profile's regime and its re-planning is part of
        # what's being timed — but two defaults sized for a multi-node
        # cluster starve a 32-core single box and are right-sized here,
        # with the same logic as the 8 MB split note above:
        #   - maxPartitionBytes 128 MB scans the single 1.8 GB sf10
        #     lineitem file as ~15 tasks, idling half the cores (c01
        #     5.3 -> 2.0 s, c03 6.2 -> 1.8 s median-of-3 at 32 MB). On a
        #     cluster, inputs exceed the split size by orders of
        #     magnitude and every core is fed regardless.
        #   - autoBroadcastJoinThreshold 10 MB exists to bound ONE COPY
        #     PER EXECUTOR on many-executor clusters; in one 24 GB JVM a
        #     dimension broadcast is a single in-process copy, and the
        #     10 MB default forces sf10's 25 MB customer dim into the
        #     sort-merge path (c06 ~15 -> ~10 s median with 64 MB).
        confs["spark.sql.files.maxPartitionBytes"] = str(32 << 20)
        confs["spark.sql.autoBroadcastJoinThreshold"] = str(64 << 20)
        # GB-scale entries churn the old gen in a handful of queries: the
        # first sf10 run read c06 at 32-45 s (entry 6 — BEFORE the first
        # every-8th JVM GC drain) vs 5.6 s through an isolated bench of
        # the same code. Drain the JVM every entry here; the explicit GC
        # runs in the untimed gap (~0.2-1 s each).
        global _GC_EVERY
        _GC_EVERY = 1
    # Shuffle/spill to tmpfs at every tier: /tmp on this box is the
    # root disk, so GB-scale shuffle writes would time the disk, not the
    # engine — DuckDB's side of the pair never leaves RAM at these SFs.
    # Production clusters put spark.local.dir on local SSDs; /dev/shm is
    # this box's analog (126 GiB free vs a few GB of peak shuffle).
    # Spark removes its subdirectory on normal shutdown. Guarded: hosts
    # without a /dev/shm tmpfs keep Spark's default local dir.
    if os.path.isdir("/dev/shm"):
        confs["spark.local.dir"] = "/dev/shm/gcpde_spark_bench"
    spark = build_session(app_name="gcpde_spark_bench", extra_confs=confs)

    # Session warm-up (protocol: warm SESSION, cold PLANS — BASELINE.md
    # §measured). Three one-time session costs are paid here, outside any
    # timed sample, because a production session pays each exactly once
    # and the per-query cold series is meant to measure per-PLAN cost
    # (Catalyst + codegen + dispatch), not process bring-up:
    #   1. JVM/JIT + parquet file index: the flagship query.
    #   2. The Python-worker pool: `spark.python.worker.reuse` (default
    #      true) keeps forked workers alive across queries, so the first
    #      Arrow-UDF stage of the session eats the fork+import of one
    #      worker per core (~2-4 s at 32 cores) that every later stage
    #      reuses — a one-row pandas_udf job registers the pool
    #      (VERDICT r6 #1: "pre-register reused Python workers").
    #   3. The streaming machinery: the first streaming query loads the
    #      MicroBatchExecution/state-store classes and starts the
    #      listener bus threads; a 1-row availableNow drain into a
    #      memory sink pays that classload once.
    # The DuckDB side needs no analog: its per-query medians are taken
    # over `runs` repeats in one process, so one-time process costs are
    # already outside its medians too.
    selected = [
        (name, spec)
        for name, spec in sorted(CORPUS.items())
        if not ONLY or any(name.startswith(p) for p in ONLY)
    ]
    sel_names = {name for name, _ in selected}

    CORPUS["c06_three_way_join_agg"].build(spark, sf_dir).toPandas()
    # Optional warm-ups are gated on the selection (ADVICE r7): a
    # relational-only smoke (SPARK_GRAFT_BENCH_ONLY=c0,c1,...) has no
    # Arrow-UDF or streaming entry, so paying their bring-up would be
    # pure waste — and a warm-up failure must degrade the run (the first
    # relevant entry eats the bring-up inside its cold sample), never
    # abort it.
    _ARROW_ENTRIES = ("x", "l")  # similarity/text Arrow stages live here
    _STREAM_ENTRIES = ("c60", "c67", "c68", "c69", "c70")
    try:
        if any(n.startswith(_ARROW_ENTRIES) for n in sel_names):
            _prefork_python_workers(spark)
    except Exception as e:  # noqa: BLE001 — warm-up is best-effort
        print(f"warn: python-worker prefork failed: {e}", file=sys.stderr)
    try:
        if any(n.startswith(_STREAM_ENTRIES) for n in sel_names):
            _warm_streaming_engine(spark)
    except Exception as e:  # noqa: BLE001 — warm-up is best-effort
        print(f"warn: streaming warm-up failed: {e}", file=sys.stderr)

    # Cold pass first, warm pass after: interleaving the warm series more
    # than doubles the JVM work done before later queries' cold runs, and
    # the accumulated heap/GC state inflated cold medians ~30-40% vs
    # isolated runs (measured round 4).
    #
    # Inline floor probes: the end-of-run no-op floor can read quiet
    # while a noisy patch inflated the MIDDLE of the cold pass (round 7
    # observed a pair with floor 0.086 s whose relational subtotal ran
    # 50% over the same-session rerun). One bare job after every
    # _GC_EVERY-th entry — in the untimed gap, ~1 s total — makes the
    # whole pass's host state part of the artifact: median and p90 of
    # the inline probes are reported, and either of them (or the
    # pre/post probes) past 2× the quiet reference marks the run
    # degraded.
    inline_floor: list[float] = []

    def _probe_floor(n: int = 1) -> None:
        for _ in range(n):
            t0 = time.perf_counter()
            spark.range(1).count()
            inline_floor.append(time.perf_counter() - t0)

    _probe_floor(3)  # pre-pass state
    timings: dict[str, float] = {}
    # Per-entry FIRST cold sample (round 11, VERDICT r10 #4): a few
    # entries share a session-scoped stage cache (x03/x08's persisted
    # MinHash pair list, x07/x09's trained IVF quantizer — see
    # queries/llm_corpus.py), so their median-of-3 reports the
    # cached-stage time from run 2 on. Recording run 1 for EVERY entry
    # makes the uncached number part of the artifact without changing
    # what the median measures (the medians stay comparable to every
    # prior round's). Additions-only; stdout is unchanged.
    run1: dict[str, float] = {}
    # Per-entry Spark-job counts (last cold sample): with the measured
    # no-op floor this makes the scheduler-dispatch share of every cold
    # median exactly auditable from the artifact — jobs × floor is a
    # hard lower bound on the entry's cold time that no plan change can
    # cross (BASELINE.md round-8 cold anatomy).
    jobs: dict[str, int] = {}

    def _next_job_id() -> int:
        try:
            return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        except Exception:  # noqa: BLE001 — diagnostics only
            return -1

    for i, (name, spec) in enumerate(selected):
        samples = []
        for _ in range(RUNS):
            j0 = _next_job_id()
            t0 = time.perf_counter()
            spec.build(spark, sf_dir).toPandas()
            samples.append(time.perf_counter() - t0)
        j1 = _next_job_id()
        if j0 >= 0 and j1 >= j0:
            jobs[name] = j1 - j0
        timings[name] = round(statistics.median(samples), 4)
        run1[name] = round(samples[0], 4)
        _drain_session_garbage(spark)
        if (i + 1) % _GC_EVERY == 0:
            _probe_floor()

    # warm series: re-execute the SAME prepared DataFrame — isolates
    # execution throughput from the one-time per-plan cost (Catalyst
    # + codegen + AQE stage planning), which is fixed per query shape
    # and amortizes to zero over repeated production runs. Stateful
    # entries mutate tables, so a re-run is not idempotent-timed —
    # skip them in the warm series.
    warm: dict[str, float] = {}
    for name, spec in selected:
        if name in ("c28_ctas_scanback", "c29_merge_upsert", "c44_jsonl_roundtrip"):
            continue
        prepared = spec.build(spark, sf_dir)
        prepared.toPandas()
        wsamples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            prepared.toPandas()
            wsamples.append(time.perf_counter() - t0)
        warm[name] = round(statistics.median(wsamples), 4)
        _drain_session_garbage(spark)

    # No-op job floor: the cost of ONE bare Spark job round-trip on this
    # VM right now. At sf0.1 the DuckDB median per query (~0.02 s) is
    # BELOW this floor, so per-query cold ratios measure JVM latency,
    # not plans — recording the floor with every bench makes that
    # decomposition auditable from the artifact alone (VERDICT r4).
    floor_samples = []
    for _ in range(max(RUNS, 3)):
        t0 = time.perf_counter()
        spark.range(1).count()
        floor_samples.append(time.perf_counter() - t0)
    noop_floor = round(statistics.median(floor_samples), 4)
    inline_sorted = sorted(inline_floor)
    inline_med = round(statistics.median(inline_sorted), 4)
    inline_p90 = round(
        inline_sorted[min(len(inline_sorted) - 1, int(0.9 * len(inline_sorted)))], 4
    )
    # Degraded-host self-flag (VERDICT r5 item 5): when the floor runs
    # past 2× the best committed quiet-box floor, this artifact's cold
    # totals carry host noise (~2.5 jobs/query × floor delta) and must
    # not be read as a code regression — the r5 driver box measured a
    # 0.17 s floor, 3.5× the quiet 0.048 s, which alone explains ~30 s
    # of corpus total. The flag makes the caveat part of the artifact.
    # Round 7: the inline probes extend the flag to MID-RUN noise the
    # end-of-run probe missed; p90 catches turbulent patches whose
    # median stays quiet.
    floor_degraded = (
        noop_floor > 2 * QUIET_FLOOR_S
        or inline_med > 2 * QUIET_FLOOR_S
        or inline_p90 > 3 * QUIET_FLOOR_S
    )

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "corpus_total_median_s",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_run1": run1,
        # entries whose runs 2+ reuse a session-scoped shared stage
        # (disclosed in queries/llm_corpus.py docstrings); read their
        # medians together with queries_run1
        "cached_stage_entries": [
            n
            for n in (
                "x03_minhash_neardup",
                "x07_ivf_topk",
                "x08_dedup_clusters",
                "x09_kmeans_clusters",
            )
            if n in timings
        ],
        "queries_jobs": jobs,
        "jobs_total": sum(jobs.values()),
        "queries_warm": warm,
        "warm_total": round(sum(warm.values()), 4),
        "noop_floor_s": noop_floor,
        "noop_floor_inline_med_s": inline_med,
        "noop_floor_inline_p90_s": inline_p90,
        "floor_degraded": floor_degraded,
        "quiet_floor_ref_s": QUIET_FLOOR_S,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "runs": RUNS,
        "cpus": int(cpus),
    }
    # Full payload (cold + warm series, 4-decimal) goes to a COMMITTED
    # file: the driver records only a bounded (~2 KB) TAIL of stdout —
    # round 3 lost most of a pretty-printed map to that cap (ADVICE
    # r03), and by 105 corpus entries even a compact full-queries line
    # exceeds it. Stdout therefore stays ONE short line — totals, the
    # per-prefix subset split, and the 10 slowest queries — and the
    # whole series lives in BENCH_SELF.json, committed like
    # CORRECTNESS_SELF.json so the evidence survives regardless of the
    # stdout cap.
    spark.stop()

    # Same-session DuckDB pair (ADVICE/VERDICT r4 item 6): run the
    # baseline in-process AFTER spark.stop() (idle box — the condition
    # BASELINE.md's hand runs used) so every BENCH_r{N}.json carries its
    # own denominator and ratios never depend on cross-day VM drift.
    # Disable with SPARK_GRAFT_BENCH_NO_DUCKDB=1 (e.g. for quick smokes).
    duck = None
    if not os.environ.get("SPARK_GRAFT_BENCH_NO_DUCKDB"):
        sys.path.insert(0, str(Path(__file__).resolve().parent / "scripts"))
        try:
            import duckdb_baseline

            duck = duckdb_baseline.run(sf_dir, runs=RUNS, only=ONLY)
        except Exception as e:  # noqa: BLE001 — the engine series must
            # still be reported even if the baseline half fails
            duck = {"error": str(e)[:200]}
    if duck is not None:
        payload["duckdb"] = duck

    out_name = os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_SELF.json")
    Path(__file__).resolve().parent.joinpath(out_name).write_text(
        json.dumps(payload) + "\n"
    )
    subsets: dict[str, float] = {}
    for k, v in timings.items():
        subsets[k[0]] = round(subsets.get(k[0], 0.0) + v, 3)
    compact = {
        "metric": payload["metric"],
        "value": total,
        "unit": "sec",
        "queries": dict(
            sorted(
                ((k, round(v, 3)) for k, v in timings.items()),
                key=lambda kv: -kv[1],
            )[:10]
        ),
        "n_queries": len(timings),
        "subset_totals": subsets,
        "warm_total": payload["warm_total"],
        "noop_floor_s": noop_floor,
        "noop_floor_inline_med_s": inline_med,
        "noop_floor_inline_p90_s": inline_p90,
        "floor_degraded": floor_degraded,
        "quiet_floor_ref_s": QUIET_FLOOR_S,
        "sf": payload["sf"],
        "runs": RUNS,
        "cpus": int(cpus),
        "full": out_name,
    }
    if duck is not None and "total_df" in duck:
        compact["duckdb_total_df"] = duck["total_df"]
        # cold/warm totals over the ORACLE-BACKED subset only, so the
        # ratio numerator and denominator cover the same queries
        oracle_cold = sum(v for k, v in timings.items() if k in duck["queries"])
        warm_keys = [k for k in warm if k in duck["queries"]]
        oracle_warm = sum(warm[k] for k in warm_keys)
        if duck["total_df"]:
            compact["ratio_cold"] = round(oracle_cold / duck["total_df"], 3)
            dwarm = sum(
                duck["queries"][k]["df"] for k in warm_keys
            )
            if dwarm:
                compact["ratio_warm"] = round(oracle_warm / dwarm, 3)
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
