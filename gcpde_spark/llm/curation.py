"""Corpus-curation operators beyond dedup: benchmark decontamination,
deterministic sampling, token-budget packing, survivor policies
(SURVEY.md §2B-16; no reference counterpart — 100 TB extension layer).

Every operator here is a pure DataFrame transform with no driver-side
loops: candidate generation is always an equi-join or a window over an
explicit key, so the plans scale with input size, not pair count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

_NUMERIC_TYPES = (NumericType,)

from gcpde_spark.llm.dedup import _exploded_shingles
from gcpde_spark.llm.text import (
    auto_collapse,
    collapse_reps,
    normalize_text,
    round4,
)


def _nullsafe_broadcast_join(
    left: DataFrame, right: DataFrame, strata_cols: "list[str]"
) -> DataFrame:
    """Broadcast-join ``right`` (one row per stratum — dimension-sized
    BY CONSTRUCTION; a shuffle join keyed on strata would re-create the
    very skew the threshold routes exist to avoid) onto ``left``,
    NULL-SAFE on the strata keys: the exact routes' windows treat a
    NULL stratum as a group, so an equi-join silently losing those rows
    would diverge from them. Drops the right-side key columns."""
    cond = None
    for c in strata_cols:
        e = left[c].eqNullSafe(right[c])
        cond = e if cond is None else cond & e
    out = left.join(F.broadcast(right), cond)
    for c in strata_cols:
        out = out.drop(right[c])
    return out


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    n: int = 8,
    min_shared: int = 1,
    dedup_collapse: bool | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag training docs that share ≥
    ``min_shared`` distinct word-``n``-grams with any benchmark item
    (the standard n-gram-overlap test-set leakage check).

    Returns ``docs`` + ``n_shared_ngrams: bigint`` (distinct shingles
    shared with the union of the benchmark) + ``contaminated: boolean``.
    Filter ``~contaminated`` to scrub.

    Scale: both sides shingle via the linear explode path (one window
    per side, no O(len²) HOF); the overlap is an equi-join on the
    64-bit shingle hash. The benchmark side is distinct-hashed first —
    typically a few thousand items, so AQE broadcasts it and the join
    adds NO shuffle to the doc side; with a huge benchmark it degrades
    to a sort-merge join that is still linear in shingle count. The
    per-doc count is a hash aggregate on the join output (already tiny:
    only colliding shingles survive the join). The doc side dedupes
    (_vid, hash) BEFORE the join: the alternative (join raw occurrences
    first, then ``countDistinct`` per doc) was measured 2× SLOWER at
    the 2.4 GB bench point (31.0 → 61.1 s) — a join-first plan only
    pays off when the benchmark overlap is sparse, and ``countDistinct``
    re-shuffles the surviving occurrences twice (partial dedup on
    (_vid, _h), then the per-doc count), while the pre-join distinct is
    one bounded full-corpus exchange whose cost never depends on how
    contaminated the corpus turns out to be.
    """
    # ROUND 10, measured duplicate-collapse route (auto by
    # text_dup_ratio ≥ 3×): n_shared_ngrams is a pure function of the
    # text, so on an exact-duplicate-heavy corpus the shingle explosion
    # + overlap join — the dominant stages — run once per DISTINCT text
    # and the per-text verdict joins back to every member id by md5
    # fingerprint (skinny join; NULL-text rows keep a NULL fp, miss the
    # left join and stay n_shared=0, exactly the direct path's
    # no-shingle behavior). A replica-free corpus keeps the direct
    # shape: the rep aggregate would add a full-text exchange for
    # nothing.
    if dedup_collapse is None:
        dedup_collapse = auto_collapse(docs, text_col)
    sh_src = (
        collapse_reps(docs, id_col, text_col).persist() if dedup_collapse else docs
    )
    doc_sh = (
        _exploded_shingles(sh_src, id_col, text_col, n)
        .select("_vid", F.xxhash64("_s").alias("_h"))
        .distinct()
    )
    bench_sh = (
        _exploded_shingles(benchmark, bench_id_col, bench_text_col, n, fanout=False)
        .select(F.xxhash64("_s").alias("_h"))
        .distinct()
    )
    shared = (
        doc_sh.join(bench_sh, "_h")
        .groupBy("_vid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_ngrams"))
    )
    if dedup_collapse:
        shared_by_fp = shared.join(
            sh_src.select("_fp", F.col(id_col).alias("_vid")), "_vid"
        ).select("_fp", "n_shared_ngrams")
        out = (
            docs.withColumn("_fp", F.md5(F.col(text_col)))
            .join(shared_by_fp, "_fp", "left")
            .drop("_fp")
        )
    else:
        out = docs.join(
            shared, docs[id_col] == shared["_vid"], "left"
        ).drop("_vid")
    return out.withColumn(
        "n_shared_ngrams", F.coalesce(F.col("n_shared_ngrams"), F.lit(0).cast("bigint"))
    ).withColumn("contaminated", F.col("n_shared_ngrams") >= min_shared)


def _release_routing_cache(
    out: DataFrame,
    routed_input: DataFrame,
    release: bool,
    latch_partitions: "int | None" = None,
) -> DataFrame:
    """Finalize an auto-routed selection when the caller asked for a
    bounded cache (``unpersist_after=True``, VERDICT r7 #5): persist
    and materialize the (smaller) selection so it no longer needs the
    routing persist, then release the routing persist immediately.
    The returned DataFrame reads its own LRU-evictable cache — the
    caller unpersists it when done.

    ``latch_partitions`` additionally pins the result plan's exchanges
    to a measurement-derived shuffle-partition count
    (operators.latch_plan — see profile_neighbors' reduce-stage
    sizing). Ordering matters on the release path: CacheManager plans
    the cached BUILD plan eagerly at persist() registration, so the
    persist itself must happen inside the pinned-partition window —
    persist-then-latch would memoize an InMemoryRelation whose build
    exchanges keep the session sizing, and the eager count() below
    would execute the reduce under-parallelized (ADVICE r8).

    SPARK-VERSION ASSUMPTION (ADVICE r9): the eager count() runs
    OUTSIDE the pinned window, so the latch holds only because
    CacheManager plans the InMemoryRelation's build plan eagerly at
    persist()/executedPlan() time (true in Spark 3.x–4.x). A Spark that
    deferred cache-build planning to first execution would silently
    drop the latch; tests/test_llm.py::
    test_unpersist_after_latch_reaches_cached_build_plan inspects the
    cached build plan's exchanges and is the pinned regression guard
    for exactly that assumption."""
    persisted = False
    try:
        if not release:
            if latch_partitions is not None:
                from gcpde_spark.operators import latch_plan

                latch_plan(out, latch_partitions)
            return out
        if latch_partitions is not None:
            from gcpde_spark.operators import _pinned_shuffle_partitions

            with _pinned_shuffle_partitions(out.sparkSession, latch_partitions):
                out = out.persist()
                persisted = True
                out._jdf.queryExecution().executedPlan()
        else:
            out = out.persist()
            persisted = True
        out.count()
    except Exception:
        # a failure here means the caller never gets a usable result:
        # release the routing persist (and, on the eager path, the
        # half-built result cache) instead of leaking them
        if persisted:
            out.unpersist(blocking=False)
        routed_input.unpersist(blocking=False)
        raise
    routed_input.unpersist(blocking=False)
    return out


def sample_stratified(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    seed: int = 42,
    id_col: str = "doc_id",
    method: str = "auto",
    stratum_bound: int = 10_000_000,
    unpersist_after: bool = False,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum
    is smaller), deterministic for a given seed.

    A seeded ``xxhash64(id, seed)`` orders each stratum pseudo-randomly
    and the first ``n`` are kept — equivalent to a reservoir sample but
    distributed, exactly sized (``df.sample`` is only *expected*
    fraction), and reproducible across runs/cluster sizes.

    ``method="exact"``: one rank window on the strata key. Hazard: a
    skewed giant stratum is one SORT partition.

    ``method="threshold"``: skew-safe — the order key is a uniform
    64-bit hash, so the ``n``-th smallest hash in a stratum of ``N``
    sits at ≈ ``2⁶⁴·n/N`` above the minimum; two closed-form cutoffs
    with a ``6·√n`` binomial margin split rows into definitely-kept /
    boundary-band / dropped, only the band (≈ ``12·√n`` rows per
    stratum) is exactly ranked, and a per-stratum validation aggregate
    proves ``kept ≤ n ≤ kept + band`` — any violation falls back to
    the exact route, so the selected set is identical to it
    unconditionally.

    ``method="auto"`` (default) measures the largest stratum with one
    keyed count and takes the threshold route past ``stratum_bound``
    rows (the same measured routing as :func:`select_top_fraction`).

    ``unpersist_after=True``: materialize the sample eagerly and
    release the auto route's hidden persist of the input immediately —
    see :func:`select_top_fraction` for the full contract.
    """
    if method not in ("auto", "exact", "threshold"):
        raise ValueError(
            f"unknown method {method!r}; use auto|exact|threshold"
        )
    auto_persisted = False
    if method == "auto":
        # shared-materialization persist, same rationale and caller-
        # owned lifetime as select_top_fraction's auto route
        df.persist()
        auto_persisted = True
        try:
            biggest = (
                df.groupBy(*strata_cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .agg(F.max("_n"))
                .first()[0]
            )
        except Exception:
            df.unpersist(blocking=False)
            raise
        method = "threshold" if (biggest or 0) > stratum_bound else "exact"
    release = auto_persisted and unpersist_after
    if method == "threshold":
        out = _sample_stratified_threshold(
            df, strata_cols, n_per_stratum, seed, id_col
        )
        if out is not None:
            return _release_routing_cache(out, df, release)
    w = Window.partitionBy(*strata_cols).orderBy(
        F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col)
    )
    out = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )
    return _release_routing_cache(out, df, release)


def _sample_stratified_threshold(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    seed: int,
    id_col: str,
) -> "DataFrame | None":
    """Closed-form-cutoff route for :func:`sample_stratified`; returns
    ``None`` when the validation cannot prove the hash-cutoff split
    selects exactly the ``n`` smallest hashes per stratum."""
    cols = df.columns
    h = F.xxhash64(F.col(id_col), F.lit(seed))
    margin = 6.0 * (n_per_stratum ** 0.5) + 16.0
    lo64, span = -9.223372036854776e18, 1.8446744073709552e19
    stats = df.groupBy(*strata_cols).agg(
        F.count(F.lit(1)).alias("_n")
    ).select(
        *strata_cols,
        F.least(F.lit(n_per_stratum).cast("bigint"), F.col("_n"))
        .alias("_cut"),
        # the n-th smallest of N uniform 64-bit hashes ≈ the
        # (n/N)-quantile of the hash space; double rounding error at
        # this magnitude (~2 KB of hash space) is absorbed by the margin
        (F.lit(lo64) + F.lit(span)
         * F.least(
             F.lit(1.0),
             (F.lit(float(n_per_stratum) + margin)) / F.col("_n"),
         )).alias("_thi"),
        (F.lit(lo64) + F.lit(span)
         * F.greatest(
             F.lit(0.0),
             (F.lit(float(n_per_stratum) - margin)) / F.col("_n"),
         )).alias("_tlo"),
    )

    joined = _nullsafe_broadcast_join(df, stats, strata_cols).withColumn("_h", h)
    is_kept = F.col("_h").cast("double") < F.col("_tlo")
    is_band = ~is_kept & (F.col("_h").cast("double") <= F.col("_thi"))
    counts = joined.groupBy(*strata_cols).agg(
        F.sum(is_kept.cast("bigint")).alias("_nk"),
        F.sum(is_band.cast("bigint")).alias("_nb"),
        F.max("_cut").alias("_cut"),
    )
    bad = counts.where(
        (F.col("_nk") > F.col("_cut"))
        | (F.col("_nk") + F.col("_nb") < F.col("_cut"))
    ).limit(1)
    if bad.count() > 0:
        return None
    kept = joined.where(is_kept).select(*cols)
    band_quota = counts.select(
        *strata_cols, (F.col("_cut") - F.col("_nk")).alias("_q")
    )
    bw = Window.partitionBy(*strata_cols).orderBy(
        F.col("_h"), F.col(id_col)
    )
    band_sel = (
        _nullsafe_broadcast_join(
            joined.where(is_band), band_quota, strata_cols
        )
        .withColumn("_brn", F.row_number().over(bw))
        .where(F.col("_brn") <= F.col("_q"))
        .select(*cols)
    )
    return kept.unionByName(band_sel)


def pack_token_budget(
    df: DataFrame,
    token_col: str = "n_tokens",
    budget: int = 1_000_000,
    n_buckets: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign documents to training shards of ≤ ``budget`` tokens
    (docs larger than the budget get a singleton shard).

    Output adds ``shard_id: string`` (``"<bucket>-<seq>"``).

    Scale: a single global running sum would serialize on one
    partition, so docs first scatter to ``n_buckets`` hash buckets
    (deterministic on id) and the running sum packs within each bucket
    — ``n_buckets``-way parallel, one shuffle. The trade is bounded:
    at most ``n_buckets`` partially-filled trailing shards versus one
    for the serial greedy pack, which is noise at 100 TB (raise
    ``n_buckets`` with cluster size; each bucket only needs to hold its
    running sum, not its docs, in memory).
    """
    bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    w = Window.partitionBy("_bucket").orderBy(F.col(id_col))
    cum = F.sum(F.col(token_col)).over(w) - F.col(token_col)
    seq = F.floor(cum / F.lit(budget)).cast("bigint")
    return (
        df.withColumn("_bucket", bucket)
        .withColumn(
            "shard_id",
            F.concat_ws("-", F.col("_bucket").cast("string"), seq.cast("string")),
        )
        .drop("_bucket")
    )


def exact_dedup_keep(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: str = "min_id",
    quality_col: str | None = None,
    dedup_collapse: bool | None = None,
) -> DataFrame:
    """Exact dedup on normalized text with an explicit survivor policy:

    - ``"min_id"``     — smallest id wins (stable, the l01 default)
    - ``"longest"``    — longest raw text wins (ties → smallest id)
    - ``"max_quality"``— highest ``quality_col`` wins (ties → smallest id)

    One md5-keyed window shuffle, like l01; the policy only changes the
    window ordering, not the plan shape.
    """
    order = {
        "min_id": [F.col(id_col).asc()],
        "longest": [F.length(F.col(text_col)).desc(), F.col(id_col).asc()],
        "max_quality": [
            F.col(quality_col or "quality_score").desc(),
            F.col(id_col).asc(),
        ],
    }
    if keep not in order:
        raise ValueError(f"keep must be one of {sorted(order)}, got {keep!r}")
    # Duplicate collapse (measured auto route) for the policies that are
    # pure functions of (text, id): within a raw-text group every text
    # (hence its length) is equal, so the group's best candidate under
    # (len desc, id asc) or (id asc) is its MIN id — the representative.
    # Running the normalized window over representatives therefore picks
    # the same survivor ids; one semi-join restores the full rows.
    # max_quality ranks on a non-text column and keeps the direct path.
    if keep in ("min_id", "longest"):
        if dedup_collapse is None:
            dedup_collapse = auto_collapse(df, text_col)
        if dedup_collapse:
            reps = collapse_reps(df, id_col, text_col)
            w = Window.partitionBy(F.md5(normalize_text(text_col))).orderBy(
                *order[keep]
            )
            winners = (
                reps.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .select(id_col)
            )
            return df.join(winners, id_col, "left_semi")
    w = Window.partitionBy(F.md5(normalize_text(text_col))).orderBy(*order[keep])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def sample_mixture(
    df: DataFrame,
    stratum_col: str,
    counts: dict[str, int],
    seed: int = 42,
    id_col: str = "doc_id",
    default: int = 0,
) -> DataFrame:
    """Domain-mixture resampling: keep exactly ``counts[stratum]`` rows
    per stratum (fewer if the stratum is smaller; strata absent from
    ``counts`` keep ``default`` rows) — the deterministic way to hit a
    target domain mix (e.g. 40% web / 30% code / 30% books) when
    building a training blend.

    Same seeded-xxhash64 rank window as :func:`sample_stratified`
    (reproducible across runs and cluster sizes); the per-stratum target
    arrives via a broadcastable literal CASE expression, so the plan is
    one window shuffle regardless of how many strata are configured.
    """
    if any(n < 0 for n in counts.values()):
        raise ValueError("counts must be non-negative")
    target = F.lit(default)
    for stratum, n in sorted(counts.items()):
        target = F.when(F.col(stratum_col) == stratum, F.lit(n)).otherwise(target)
    w = Window.partitionBy(stratum_col).orderBy(
        F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= target)
        .drop("_rn")
    )


def pack_chunk_sequences(
    chunks: DataFrame,
    id_col: str = "doc_id",
    chunk_id_col: str = "chunk_id",
    token_col: str = "n_chunk_tokens",
    chunks_per_seq: int = 8,
    n_buckets: int = 64,
) -> DataFrame:
    """Pack fixed-size document chunks into training sequences of
    exactly ``chunks_per_seq`` slots (e.g. 8×512-token chunks → one
    4096-token sequence) — the step between :func:`chunk_documents`
    and the trainer's data loader.

    Token-aligned packing (uniform chunk slots, the common practice for
    pretraining shards) keeps assignment a pure rank expression: chunks
    order by ``(doc, chunk)`` within a hash bucket and sequence ``k``
    takes ranks ``[k·chunks_per_seq, (k+1)·chunks_per_seq)`` — exact,
    deterministic, no overflow, and expressible as one window (true
    variable-size bin packing is a prefix-dependent recursion no window
    can state). The final sequence per bucket may be partial — pad at
    load time.

    Adds ``seq_id: string`` (``"<bucket>-<k>"``) and ``seq_slot:
    bigint``. Same ``n_buckets`` parallelism trade as
    :func:`pack_token_budget`.
    """
    if chunks_per_seq < 1:
        raise ValueError("chunks_per_seq must be >= 1")
    bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    w = Window.partitionBy("_bucket").orderBy(F.col(id_col), F.col(chunk_id_col))
    rn = F.row_number().over(w) - 1
    return (
        chunks.withColumn("_bucket", bucket)
        .withColumn("_rn", rn)
        .select(
            "*",
            F.concat_ws(
                "-",
                F.col("_bucket").cast("string"),
                F.floor(F.col("_rn") / chunks_per_seq).cast("string"),
            ).alias("seq_id"),
            (F.col("_rn") % chunks_per_seq).cast("bigint").alias("seq_slot"),
        )
        .drop("_bucket", "_rn")
    )


def corpus_report(
    df: DataFrame,
    strata_cols: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The "corpus card" summary per stratum (default ``source, lang``):
    document count, token volume, mean quality score, and exact-dup
    rate — the per-release accounting table a dataset card publishes.

    Returns ``(strata..., n_docs, total_tokens, mean_quality,
    n_distinct_texts, dup_rate)``.

    Numerics: ``quality_score`` is a 4-decimal value, so its per-doc
    integer scaling (``ROUND(q*10000)``) is exact and the mean is an
    exact-integer sum divided once — order-independent across engines
    and partitionings (same rule as the money/log-prob paths).
    Scale: one stats projection + one aggregation keyed by the strata;
    dup detection is count(distinct md5) inside the same agg — no extra
    shuffle beyond the groupBy.
    """
    from gcpde_spark.llm.text import (
        _stats_exprs,
        _with_text_cols,
        normalize_text,
        tokens,
    )

    strata = strata_cols if strata_cols is not None else ["source", "lang"]
    # project to just the needed columns first: the input may already
    # carry stats columns from an earlier with_text_stats pass, and
    # re-adding them would make every reference ambiguous
    keep = list(dict.fromkeys([*strata, id_col, text_col]))
    # stats AND the dup fingerprint go through ONE _with_text_cols call:
    # on a duplicate-heavy corpus (measured auto route) the whole
    # regex-heavy projection — including md5(normalize) — evaluates once
    # per distinct text; a separate withColumn would leave the
    # normalize+md5 pass running per replica row.
    norm = normalize_text(text_col)
    enriched = _with_text_cols(
        df.select(*keep),
        text_col,
        {**_stats_exprs(norm, tokens(text_col)), "_dupfp": F.md5(norm)},
    )
    q_scaled = F.round(F.col("quality_score") * 10000).cast("bigint")
    return (
        enriched.groupBy(*strata)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            round4(
                F.sum(q_scaled).cast("double") / 10000.0 / F.count(F.lit(1))
            ).alias("mean_quality"),
            F.countDistinct("_dupfp").cast("bigint").alias("n_distinct_texts"),
            round4(
                1.0
                - F.countDistinct("_dupfp").cast("double") / F.count(F.lit(1))
            ).alias("dup_rate"),
        )
    )


def sample_hash_fraction(
    df: DataFrame,
    fraction: float,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic Bernoulli sampling by id hash — the NO-SHUFFLE
    scale path for approximate-fraction sampling: keep a row iff
    ``pmod(xxhash64(id, seed), 2^20) < fraction·2^20``. A pure
    map-side filter (contrast :func:`sample_stratified`'s exact-size
    rank window, which sorts every stratum).

    Membership is a function of the id alone, so it is reproducible
    across runs and cluster sizes AND stable under corpus growth: a
    document's verdict never changes as other documents come and go —
    the property train/validation splits require (``df.sample`` gives
    neither). Sample size is binomial around ``fraction·N``.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    scale = 1 << 20
    return df.where(
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(scale))
        < int(fraction * scale)
    )


def select_top_fraction(
    df: DataFrame,
    score_col: str,
    frac: float,
    strata_cols: list[str],
    id_col: str = "doc_id",
    method: str = "auto",
    stratum_bound: int = 10_000_000,
    quantile_accuracy: int = 10_000,
    unpersist_after: bool = False,
) -> DataFrame:
    """Keep the top ``frac`` of each stratum by ``score_col`` — the
    quality-gate step of a curation pipeline (e.g. a perplexity filter:
    score with :func:`gcpde_spark.llm.text.unigram_logprob`, keep the
    best half of every source).

    Deterministic: descending score with NULLS LAST, tie-broken on
    ``id_col``, and the cut is ``rank ≤ ceil(frac · stratum_size)`` so
    every stratum keeps at least one row when non-empty. Both routes
    below select EXACTLY this set.

    ``method="exact"``: one rank window on the strata key — the rank
    and count windows share the same partition spec, so Catalyst
    evaluates both in one Window node over ONE exchange; the shuffle
    carries only the projected frame, so at 100 TB project to
    (id, strata, score) first and join survivors back by id if the
    full rows are needed (what l29 does). Its hazard: a skewed giant
    stratum is one SORT partition — one crawl source holding 60% of a
    100 TB corpus becomes a single-task sort of tens of TB.

    ``method="threshold"``: the skew-safe route — no stratum-sized
    sort anywhere. Per stratum, two ``percentile_approx`` cutoffs at
    ``1-frac ± 4/quantile_accuracy`` (a hash aggregate) split rows
    into definitely-kept (score above the upper cutoff), definitely
    -dropped (below the lower), and a boundary band whose width is
    bounded by the approx-quantile rank-error guarantee (~8·n/accuracy
    rows plus ties at the cutoff values); only the band is exactly
    ranked, so the sort partition is band-sized, not stratum-sized.
    The per-stratum cutoff/count tables are broadcast (one row per
    stratum — dimension-sized). A per-stratum validation aggregate
    then PROVES the split consistent (kept ≤ cut ≤ kept + band for
    every stratum); any violation — approx-guarantee edge, NULL-heavy
    stratum where the cut reaches past the non-null scores, non-binary
    frac rounding — falls back to the exact route, so results are
    identical to it unconditionally. Requires a numeric score column.

    ``method="auto"`` (default) measures the largest stratum with one
    cheap keyed count (the same measured-routing pattern as
    ``profile_neighbors``) and takes the threshold route when it
    exceeds ``stratum_bound`` rows (or the exact route when the score
    column is non-numeric).

    ``unpersist_after=True`` (VERDICT r7 #5, for long-lived sessions
    making many auto-routed calls): trade the lazy-result contract for
    a bounded cache — the selection is materialized eagerly (persisted
    + counted), the auto route's hidden persist of the (bigger) input
    is released immediately, and the returned DataFrame reads its own
    (smaller, LRU-evictable) cache; unpersist it when done. Default
    False preserves the documented lazy contract. No-op when a forced
    ``method`` skipped the hidden persist.
    """
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0,1], got {frac}")
    if method not in ("auto", "exact", "threshold"):
        raise ValueError(
            f"unknown method {method!r}; use auto|exact|threshold"
        )
    auto_persisted = False
    if method == "auto":
        numeric = isinstance(
            df.schema[score_col].dataType, _NUMERIC_TYPES
        )
        if not numeric:
            method = "exact"
        else:
            # The measurement job must materialize df anyway — often a
            # composed scoring pipeline (l29: the full unigram-LM
            # chain), which the selection pass would otherwise compute
            # a second time. Persist it (MEMORY_AND_DISK, LRU-
            # evictable) so routing and selection share one
            # materialization — the same caller-owned cache lifetime as
            # profile_neighbors' routing persist (similarity.py):
            # the result is lazy and keeps reading the cache, so
            # callers that want the storage back force a method (no
            # hidden persist) or clearCache(). Routing errors release.
            # Scale: what gets cached is the SELECTION INPUT, which the
            # docstring above already tells 100 TB callers to pass as
            # the (id, strata, score) projection (join survivors back
            # by id) — O(N·3 narrow cols), not the corpus frame.
            df.persist()
            auto_persisted = True
            try:
                biggest = (
                    df.groupBy(*strata_cols)
                    .agg(F.count(F.lit(1)).alias("_n"))
                    .agg(F.max("_n"))
                    .first()[0]
                )
            except Exception:
                df.unpersist(blocking=False)
                raise
            method = (
                "threshold"
                if (biggest or 0) > stratum_bound
                else "exact"
            )
    release = auto_persisted and unpersist_after
    if method == "threshold" and frac < 1.0:
        out = _select_top_fraction_threshold(
            df, score_col, frac, strata_cols, id_col, quantile_accuracy
        )
        if out is not None:
            return _release_routing_cache(out, df, release)
        # validation failed — fall through to the exact route
    w = Window.partitionBy(*strata_cols)
    rank = F.row_number().over(
        w.orderBy(F.col(score_col).desc_nulls_last(), F.col(id_col))
    )
    cut = F.ceil(F.count(F.lit(1)).over(w) * F.lit(frac)).cast("bigint")
    out = (
        df.withColumn("_rn", rank)
        .withColumn("_cut", cut)
        .where(F.col("_rn") <= F.col("_cut"))
        .drop("_rn", "_cut")
    )
    return _release_routing_cache(out, df, release)


def _select_top_fraction_threshold(
    df: DataFrame,
    score_col: str,
    frac: float,
    strata_cols: list[str],
    id_col: str,
    accuracy: int,
) -> "DataFrame | None":
    """Two-pass threshold route for :func:`select_top_fraction`; returns
    ``None`` when the per-stratum validation cannot prove the split
    selects exactly the rank-cut set (caller falls back to exact)."""
    cols = df.columns
    delta = 4.0 / accuracy
    qhi = min(1.0, 1.0 - frac + delta)
    qlo = max(0.0, 1.0 - frac - delta)
    stats = df.groupBy(*strata_cols).agg(
        F.ceil(F.count(F.lit(1)) * F.lit(frac)).cast("bigint").alias("_cut"),
        F.percentile_approx(score_col, qhi, accuracy).alias("_thi"),
        F.percentile_approx(score_col, qlo, accuracy).alias("_tlo"),
    )
    joined = _nullsafe_broadcast_join(df, stats, strata_cols)
    is_kept = F.col(score_col) > F.col("_thi")
    is_band = F.col(score_col).isNotNull() & ~is_kept & (
        F.col(score_col) >= F.col("_tlo")
    )
    counts = joined.groupBy(*strata_cols).agg(
        F.sum(is_kept.cast("bigint")).alias("_nk"),
        F.sum(is_band.cast("bigint")).alias("_nb"),
        F.max("_cut").alias("_cut"),
        F.count(F.lit(1)).alias("_n"),
    )
    # a band past ~4× the approx-quantile rank guarantee (8·n/accuracy)
    # means heavy TIES at the cutoff (e.g. quantized perplexity buckets)
    # pulled a stratum-sized mass into the band — the band row_number
    # below would then BE the giant single-task sort this route exists
    # to avoid, so treat it as a validation failure (results identical
    # via the exact fallback). The 4096 floor keeps small strata off the
    # fallback for incidental ties. The hash-ordered sample_stratified
    # route has no such hazard (64-bit hashes don't tie).
    band_bound = F.greatest(
        F.lit(4096).cast("bigint"),
        (F.col("_n") * F.lit(32.0 / accuracy)).cast("bigint"),
    )
    bad = counts.where(
        (F.col("_nk") > F.col("_cut"))
        | (F.col("_nk") + F.col("_nb") < F.col("_cut"))
        | (F.col("_nb") > band_bound)
    ).limit(1)
    if bad.count() > 0:
        return None
    kept = joined.where(is_kept).select(*cols)
    band_quota = counts.select(
        *strata_cols, (F.col("_cut") - F.col("_nk")).alias("_q")
    )
    bw = Window.partitionBy(*strata_cols).orderBy(
        F.col(score_col).desc_nulls_last(), F.col(id_col)
    )
    band_sel = (
        _nullsafe_broadcast_join(
            joined.where(is_band), band_quota, strata_cols
        )
        .withColumn("_brn", F.row_number().over(bw))
        .where(F.col("_brn") <= F.col("_q"))
        .select(*cols)
    )
    return kept.unionByName(band_sel)


def split_train_val(
    df: DataFrame,
    val_fraction: float = 0.01,
    seed: int = 42,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic, growth-stable ``(train, val)`` split: the val set
    is the :func:`sample_hash_fraction` bucket and train is its exact
    complement (same hash expression, complementary predicate — no row
    is in both, none is lost, and a doc never migrates between splits
    as the corpus grows)."""
    if not 0.0 <= val_fraction <= 1.0:
        raise ValueError(f"val_fraction must be in [0,1], got {val_fraction}")
    scale = 1 << 20
    h = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(scale))
    cut = int(val_fraction * scale)
    return df.where(h >= cut), df.where(h < cut)
