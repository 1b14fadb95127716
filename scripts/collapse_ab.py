"""A/B + parity harness for the round-10 duplicate-collapse routes.

Times every declared entry that routes through the distinct-text
collapse (text projections l02/l12/l03/l04, Jaccard verification
l05/l17, LSH x03/x04, clustering x08) with the collapse forced OFF
(the round-9 direct path) vs the shipped auto route, on a
duplicate-heavy corpus (benchdata/sf10, 100x replicas) under the exact
bench.py GB-tier session profile. Interleaved variant order per round,
median of N, noop-sink timing (guide 1.4) so the A/B measures the
computation, not the Arrow collect.

Before timing, each entry's two routes are hash-compared row-order-
independently (count + sum/bit_xor of xxhash64 over the stringified
row) — the at-scale parity proof on real data, complementing the sf0.01
driver_sim hash gate where the corpus is replica-free and the collapse
never fires.

Usage: python scripts/collapse_ab.py [sf_dir] [runs] [only_prefix,...]
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
        "GCPDE_SPARK_WAREHOUSE", "/dev/shm/gcpde_spark_collapse_wh"
    )

from pyspark.sql import functions as F

from gcpde_spark.catalog import load_table
from gcpde_spark.queries import CORPUS
from gcpde_spark.queries import llm_corpus
from gcpde_spark.llm import text as text_mod
from gcpde_spark.session import build_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf10"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
ONLY = [p for p in (sys.argv[3].split(",") if len(sys.argv) > 3 else []) if p]

ENTRIES = [
    "l02_text_stats",
    "l12_token_count",
    "l03_lang_id",
    "l04_fingerprint",
    "l05_ngram_jaccard",
    "l17_decontaminate",
    "x03_minhash_neardup",
    "x04_simhash_neardup",
    "x08_dedup_clusters",
    # wave 2: winnowing, html strip, unigram LM, top-ngrams, corpus card
    "l13_winnowing",
    "l21_html_strip",
    "l22_unigram_logprob",
    "l27_top_ngrams",
    "l28_corpus_report",
    # wave 2b: composed pipeline, tf-idf, fertility
    "l14_curation_pipeline",
    "l15_tfidf",
    "l36_tokenizer_fertility",
    # wave 3: exact-dedup accounting/survivors. l25/l26 (chunking) were
    # A/B'd and REJECTED: the chunk_text fan-out join costs more than
    # re-tokenizing replicas in place (l25 2.31 s direct vs 5.96 s
    # collapsed, l26 a wash — artifact lines in
    # BENCH_SELF_SF10_COLLAPSE_AB.jsonl), so chunk_documents never
    # auto-routes and its global-ratio toggle here would be a no-op.
    "l01_exact_dedup",
    "l18_dedup_keep",
    # wave 4: bloom build over distinct reps, BM25 rep aggregation,
    # snapshot-diff fingerprints, vocab novelty rep explode
    "l31_bloom_incremental",
    "l32_bm25_topk",
    "l38_snapshot_diff",
    "l39_vocab_novelty",
    # wave 5: quotient-graph CC (x08 re-A/B'd after the contraction),
    # prefix-fingerprint histogram
    "l37_dup_cluster_sizes",
    # wave 6: no code change — l29 composes unigram_logprob, whose
    # wave-2 route auto-fires on the scan-shaped docs input; measured
    # here so the checklist row carries its own number
    "l29_quality_select",
]


def _reset(spark) -> None:
    """Drop every cross-entry cache so each variant run is cold-shaped:
    the shared x03/x08 pair cache and all persisted intermediates."""
    per_session = llm_corpus._MINHASH_PAIRS.get(spark)
    if per_session:
        for df in per_session.values():
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001
                pass
        per_session.clear()
    spark.catalog.clearCache()


def _row_hash(df) -> dict:
    """Row-order-independent content hash: stringify every column with
    NULL sentinels, xxhash64 the concatenation, fold with sum + bit_xor
    + count. Collision-safe enough for a parity check (64-bit, two
    independent folds)."""
    cols = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null")).alias(c)
        for c in df.columns
    ]
    h = F.xxhash64(F.concat_ws("\x01", *[c for c in cols]))
    row = df.select(h.alias("_h")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_h").cast("decimal(38,0)")).alias("s"),
        F.bit_xor("_h").alias("x"),
    ).first()
    return {"n": int(row["n"]), "s": str(row["s"]), "x": int(row["x"]) if row["x"] is not None else None}


def main() -> None:
    confs = {
        "spark.sql.files.maxPartitionBytes": str(32 << 20),
        "spark.sql.autoBroadcastJoinThreshold": str(64 << 20),
    }
    if os.path.isdir("/dev/shm"):
        confs["spark.local.dir"] = "/dev/shm/gcpde_spark_collapse"
    spark = build_session(app_name="gcpde_spark_collapse_ab", extra_confs=confs)
    load_table(spark, SF_DIR, "nation").count()

    entries = [e for e in ENTRIES if not ONLY or any(e.startswith(p) for p in ONLY)]
    ratio0 = text_mod.DUP_COLLAPSE_RATIO
    variants = [("direct", float("inf")), ("collapse", ratio0)]

    # parity first: both routes must produce identical row sets
    parity_fail = []
    for entry in entries:
        hashes = {}
        for name, ratio in variants:
            text_mod.DUP_COLLAPSE_RATIO = ratio
            _reset(spark)
            spark.sparkContext.setJobDescription(f"parity {entry} {name}")
            hashes[name] = _row_hash(CORPUS[entry].build(spark, SF_DIR))
        ok = hashes["direct"] == hashes["collapse"]
        if not ok:
            parity_fail.append(entry)
        print(json.dumps({"entry": entry, "parity": ok, **{
            f"{k}_hash": v for k, v in hashes.items()}}), flush=True)
    text_mod.DUP_COLLAPSE_RATIO = ratio0
    if parity_fail:
        print(json.dumps({"parity_failures": parity_fail}), flush=True)
        spark.stop()
        sys.exit(1)

    samples: dict[tuple[str, str], list[float]] = {
        (e, n): [] for e in entries for n, _ in variants
    }
    for r in range(RUNS):
        for entry in entries:
            for name, ratio in variants:
                text_mod.DUP_COLLAPSE_RATIO = ratio
                _reset(spark)
                spark.sparkContext._jvm.System.gc()
                gc.collect()
                spark.sparkContext.setJobDescription(f"{entry} {name} r{r}")
                t0 = time.perf_counter()
                (
                    CORPUS[entry]
                    .build(spark, SF_DIR)
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                dt = time.perf_counter() - t0
                samples[(entry, name)].append(dt)
                print(
                    json.dumps(
                        {"entry": entry, "variant": name, "run": r,
                         "sec": round(dt, 3)}
                    ),
                    flush=True,
                )
    text_mod.DUP_COLLAPSE_RATIO = ratio0
    summary = {
        f"{e}/{n}": {
            "median_sec": round(statistics.median(v), 3),
            "all": [round(x, 3) for x in v],
        }
        for (e, n), v in samples.items()
    }
    print(json.dumps({"summary": summary, "sf_dir": SF_DIR, "runs": RUNS}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
