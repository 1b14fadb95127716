"""Embedding similarity search: brute-force cosine top-k (baseline) and
random-hyperplane LSH (scale path) (SURVEY.md §2B-16).

Numeric contract: cosine is computed as a sequential left fold in DOUBLE
(``aggregate(zip_with(a, b, (x,y) -> x*y), 0.0d, +)``) — float32 inputs
cast to double are exact and the fold order is identical to DuckDB's
``list_reduce``, so scores are bit-identical cross-engine (verified:
0 mismatches over 1500 pairs) and can be hash-matched after the
round4 (= round(x*10000)/10000) canonicalization.

Scale design: brute-force is O(N·Q) and exists as the correctness
baseline and for Q ≪ N with a broadcast query side (no shuffle of the
big side — one pass over N per batch of queries). The LSH path buckets
vectors by hyperplane sign bits so each query only scans its probed
buckets: candidate generation is an equi-join on bucket id, never
all-pairs; recall is tuned by ``n_planes`` (fewer planes → bigger
buckets → higher recall, more compute) and multi-probing.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd  # noqa: F401 — resolves pandas_udf type hints
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gcpde_spark.llm.text import round4, spread


def _dvec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Sequential double fold — keep in sync with the DuckDB oracle form
    ``list_reduce(list_transform(list_zip(a,b), p -> p[1]*p[2]), +)``."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k of every query against the embedding table.

    The query side is broadcast, so the big side streams through one
    codegen'd projection + a per-query top-k (window over rounded score).
    Returns ``(qid, vec_id, score, rank)``; score is ROUND(cos, 4) and
    ranking is (score DESC, vec_id) so results are totally ordered and
    cross-engine stable.
    """
    # norms are computed ONCE per vector/query (not per pair): the per-pair
    # work drops from three interpreted 64-element folds to one, and the
    # resulting double is bit-identical to the per-pair form (same fold,
    # same operands).
    e = spread(embeddings).select(
        F.col(id_col).alias("vec_id"), _dvec(vec_col).alias("_v")
    ).withColumn("_norm", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
    q = queries.select(
        F.col(query_id_col).alias("qid"), _dvec(query_vec_col).alias("_qv")
    ).withColumn("_qnorm", F.sqrt(_dot(F.col("_qv"), F.col("_qv"))))
    scored = e.crossJoin(F.broadcast(q)).select(
        "qid",
        "vec_id",
        (
            round4(
                _dot(F.col("_v"), F.col("_qv")) / (F.col("_norm") * F.col("_qnorm"))
            )
            + F.lit(0.0)
        ).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (fixed seed → same buckets on
    every run / executor)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _matmul_assign(vec_col: str | Column, matrix: list[list[float]], reduce_fn) -> Column:
    """Vectorized ``row_vector @ matrix.T`` → int64 column via an
    Arrow-batched pandas UDF.

    This is the sanctioned UDF case: the per-row alternative is
    ``n_matrix_rows`` interpreted HOF folds (lambdas never enter
    whole-stage codegen), measured ~100× slower than one numpy matmul
    over an Arrow batch. The matrix ships in the closure (broadcast once
    per executor); work is map-side, no shuffle.
    """
    from pyspark.sql.functions import pandas_udf

    M = np.asarray(matrix, dtype=np.float64)

    @pandas_udf("long")
    def _assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        return pd.Series(reduce_fn(X @ M.T).astype("int64"))

    return _assign(F.col(vec_col) if isinstance(vec_col, str) else vec_col)


def with_lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 13,
    out_col: str = "bucket",
) -> DataFrame:
    """Add the random-hyperplane LSH bucket id (sign bit per plane).

    One map-side pass: the sign bits come from a single numpy matmul per
    Arrow batch (see :func:`_matmul_assign`). E[bucket size] =
    N / 2^n_planes — choose ``n_planes`` so buckets fit comfortably in a
    task (e.g. 2^16 buckets over 10^10 vectors → ~150 k vectors/bucket).
    """
    planes = _hyperplanes(dim, n_planes, seed)
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    return df.withColumn(
        out_col, _matmul_assign(vec_col, planes, lambda S: (S > 0) @ weights)
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 13,
    multiprobe: bool = True,
    hash_vec_col: str | None = None,
    query_hash_vec_col: str | None = None,
) -> DataFrame:
    """Approximate cosine top-k: rank only candidates that share a bucket
    with the query (multi-probe: plus every bucket at Hamming distance 1,
    which lifts recall sharply for near-boundary vectors at ~n_planes×
    the probe fan-out — still a tiny fraction of N).

    ``hash_vec_col``/``query_hash_vec_col`` optionally hash a DIFFERENT
    column than the one scored (scores always come from ``vec_col``):
    all-positive vector families (count profiles, tf vectors) lie in one
    orthant, which origin-crossing hyperplanes split poorly — hashing a
    per-vector mean-centered copy spreads them across orthants while
    scaled copies keep identical centered directions (same bucket).

    Same output shape/ordering contract as :func:`brute_force_topk`;
    recall vs brute force is property-tested (tests/test_llm.py).
    """
    e_base = spread(embeddings).select(
        F.col(id_col).alias("vec_id"),
        _dvec(vec_col).alias("_v"),
        *([_dvec(hash_vec_col).alias("_hv")] if hash_vec_col else []),
    )
    e = with_lsh_buckets(
        e_base, "_hv" if hash_vec_col else "_v", dim, n_planes, seed,
    ).withColumn("_norm", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
    q_base = queries.select(
        F.col(query_id_col).alias("qid"),
        _dvec(query_vec_col).alias("_qv"),
        *([_dvec(query_hash_vec_col).alias("_qhv")] if query_hash_vec_col else []),
    )
    q = with_lsh_buckets(
        q_base, "_qhv" if query_hash_vec_col else "_qv", dim, n_planes, seed,
    ).withColumn("_qnorm", F.sqrt(_dot(F.col("_qv"), F.col("_qv"))))
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i)).cast("bigint")
                for i in range(n_planes)
            ],
        )
        q = q.select("qid", "_qv", "_qnorm", F.explode(probes).alias("bucket"))
    candidates = e.join(q, on="bucket").select(
        "qid",
        "vec_id",
        (
            round4(
                _dot(F.col("_v"), F.col("_qv")) / (F.col("_norm") * F.col("_qnorm"))
            )
            + F.lit(0.0)
        ).alias("score"),
    ).dropDuplicates(["qid", "vec_id"])
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        candidates.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    train_rows: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
    iters: int = 5,
) -> list[list[float]]:
    """Train the IVF coarse quantizer: spherical k-means on a
    deterministic sample, on the driver.

    Scale design: the trainer never sees the full table — ``train_rows``
    (ORDER BY id LIMIT n, so the sample is reproducible) is a few MB
    regardless of table size; FAISS trains IVF the same way (sample →
    driver/GPU k-means → broadcast centroids). Centroids are L2-normalized
    so nearest-by-cosine reduces to argmax dot product.
    """
    rows = (
        embeddings.select(F.col(id_col).alias("_id"), _dvec(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(train_rows)
        .collect()
    )
    X = np.asarray([r["_v"] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                C[j] = m / max(np.linalg.norm(m), 1e-12)
    return C.tolist()


def _cell_structs(vec_name: str, centroids: list[list[float]]) -> Column:
    """Array of ``(-dot(v, c_j), j)`` structs — lexicographic min = nearest
    centroid by cosine (ties break to the lowest cell id, deterministic).

    One parsed expr string: the Column-object form was n_centroids × dim
    ``F.lit`` py4j round-trips (~1 s of driver latency per build at
    16×64 — measured round 4); the literals are embedded via
    ``CAST('repr' AS DOUBLE)``, which round-trips the exact double and
    constant-folds before execution.
    """
    parts = []
    for j, c in enumerate(centroids):
        arr = ",".join(f"cast('{float(x)!r}' as double)" for x in c)
        dot = (
            f"aggregate(zip_with({vec_name}, array({arr}), (x, y) -> x * y), "
            "cast(0.0 as double), (acc, x) -> acc + x)"
        )
        parts.append(f"named_struct('d', -({dot}), 'c', {j})")
    return F.expr("array(" + ",".join(parts) + ")")


def with_ivf_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Add the IVF cell id (nearest centroid by cosine) — one map-side
    numpy matmul per Arrow batch, no shuffle. argmax of the dot product
    equals argmax cosine because centroids are L2-normalized and |v| is
    constant across candidates; numpy's argmax breaks ties to the lowest
    cell id, matching the lexicographic struct-min of the probe path."""
    return df.withColumn(
        out_col, _matmul_assign(vec_col, centroids, lambda S: S.argmax(axis=1))
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
    n_centroids: int = 16,
    nprobe: int = 4,
    train_rows: int = 2048,
    seed: int = 13,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate cosine top-k via IVF-Flat: partition vectors into
    ``n_centroids`` Voronoi cells around k-means centroids, score each
    query only against its ``nprobe`` nearest cells.

    The scale complement to :func:`lsh_topk`: candidate generation is an
    equi-join on cell id (shuffle keyed by cell, never all-pairs), and the
    candidate fraction is ~``nprobe / n_centroids`` of N per query —
    tunable recall/cost, property-tested vs brute force
    (tests/test_llm.py). At 100 TB: centroids train on a driver-sized
    sample and broadcast; cell assignment is map-side; pre-partitioning
    the table by cell (bucketBy) would make repeated searches shuffle-free.
    Same output shape/ordering contract as :func:`brute_force_topk`.
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_centroids, train_rows, id_col, vec_col, seed
        )
    e = with_ivf_cells(
        spread(embeddings).select(F.col(id_col).alias("vec_id"), _dvec(vec_col).alias("_v")),
        centroids,
        "_v",
        "cell",
    ).withColumn("_norm", F.sqrt(_dot(F.col("_v"), F.col("_v"))))
    q = queries.select(
        F.col(query_id_col).alias("qid"), _dvec(query_vec_col).alias("_qv")
    ).withColumn("_qnorm", F.sqrt(_dot(F.col("_qv"), F.col("_qv"))))
    # nprobe nearest cells per query: sort the (-dot, cell) structs and
    # take the first nprobe — array_sort is lexicographic, same order the
    # assignment uses.
    probes = F.transform(
        F.slice(F.array_sort(_cell_structs("_qv", centroids)), 1, nprobe),
        lambda s: s["c"],
    )
    q = q.select("qid", "_qv", "_qnorm", F.explode(probes).alias("cell"))
    candidates = (
        e.join(F.broadcast(q), on="cell")
        .select(
            "qid",
            "vec_id",
            (
                round4(
                    _dot(F.col("_v"), F.col("_qv")) / (F.col("_norm") * F.col("_qnorm"))
                )
                + F.lit(0.0)
            ).alias("score"),
        )
        .dropDuplicates(["qid", "vec_id"])
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        candidates.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q_embedding",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Scalar int8 quantization: per-vector ``scale = max|x| / 127``,
    ``q = round(x / scale)`` — 4× smaller than float32 on disk/shuffle,
    the standard storage form for 100 TB embedding tables (cosine on
    dequantized vectors stays within ~1e-3 of exact; property-tested).

    Arrow-batched pandas UDF (one numpy pass per batch); output is
    ``array<tinyint>`` + a float scale column, a lossless-to-reverse
    pair for :func:`dequantize_embeddings`.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<q: array<tinyint>, s: float>")
    def _quant(vs: pd.Series) -> pd.DataFrame:
        qs, ss = [], []
        for v in vs:
            x = np.asarray(v, dtype=np.float64)
            scale = float(np.max(np.abs(x)) / 127.0) if len(x) else 1.0
            scale = scale or 1.0  # all-zero vector
            qs.append(np.round(x / scale).astype(np.int8))
            ss.append(np.float32(scale))
        return pd.DataFrame({"q": qs, "s": ss})

    q = _quant(F.col(vec_col))
    return df.withColumn(out_col, q["q"]).withColumn(scale_col, q["s"])


def dequantize_embeddings(
    df: DataFrame,
    q_col: str = "q_embedding",
    scale_col: str = "q_scale",
    out_col: str = "embedding",
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: ``x ≈ q * scale`` — a
    codegen'd ``transform`` (no Python), so dequantization fuses into
    whatever projection consumes the vectors."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(q_col),
            lambda x: (x.cast("double") * F.col(scale_col)).cast("float"),
        ),
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 13,
    max_bucket_size: int = 1024,
    method: str = "auto",
    pair_budget: int = 1_000_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucketed candidate
    generation, exact cosine on candidates, keep ``score ≥ threshold``.
    Returns ``(id_a, id_b, score)`` with ``id_a < id_b``.

    Scale contract: a bucket with m members scores m(m-1)/2 pairs, so
    pair volume is Σ m_i² — quadratic in the largest bucket, NOT in N.
    ``max_bucket_size`` drops buckets above the cap whole (zero-vector /
    constant-embedding cohorts that no hyperplane can split); size
    ``n_planes`` so E[bucket] = N / 2^n_planes stays well under the cap
    — at 100 TB (~1e9 vectors) use n_planes ≥ 24.

    Two routes (round 8), picked by the measured pair volume when
    ``method="auto"`` (one cheap count; estimate N²/2^n_planes vs
    ``pair_budget`` — the same measured-routing pattern as
    :func:`profile_neighbors`):

    - ``"join"`` (small pair volume): explode per-bucket candidate
      pairs, re-join the vectors, score in codegen'd column
      expressions. Cheapest when Σ m_i² is small — no extra Python
      stage (~0.4 s of fixed Arrow grouped-map cost at bench scale).
    - ``"gram"`` (large pair volume): one shuffle of the vectors keyed
      by bucket, then each bucket's Arrow group computes the whole
      gram matrix with one BLAS matmul and emits the over-threshold
      upper triangle. Vectors cross the wire ONCE (N rows), not once
      per candidate pair — the join route ships ~Σ m_i² vector copies
      through two joins and evaluates every dot product in interpreted
      higher-order-function lambdas (CodegenFallback), which dominated
      past the budget (x06 at sf1, ~56M est. pairs: 5.6-18.9 s join vs
      ~1.6 s gram, byte-identical output). Peak per-task memory is the
      largest kept bucket's gram matrix: ``max_bucket_size²`` doubles
      (8 MB at the 1024 default).

    Score arithmetic: the join route uses the sequential-fold oracle
    form (:func:`cosine`); the gram route numpy's pairwise summation.
    This operator is approximate/oracle-less by construction; both
    forms are deterministic and differ at most in the last ulp before
    the 4-decimal round (byte-identical on the 90k-pair sf1 check).
    Residual routing caveat (ADVICE r8): the gram route emulates
    Spark's HALF_UP on the raw binary double while ``F.round`` rounds
    the shortest-decimal repr (BigDecimal.valueOf), so a cosine whose
    ×10000 product lands a last ulp from an exact .5 boundary can round
    differently per route — under ``method="auto"`` such borderline
    pairs' membership can therefore flip with ``pair_budget``/N. Pin
    ``method`` when bit-stable output across scales matters.
    """
    if method not in ("auto", "join", "gram"):
        raise ValueError(f"unknown method {method!r}; use auto|join|gram")
    import pandas as pd

    base = spread(embeddings).select(
        F.col(id_col).alias("_id"), _dvec(vec_col).alias("_v")
    )
    id_type = base.schema["_id"].dataType.simpleString()
    if method == "auto":
        n = base.count()
        method = "join" if (n * n) >> n_planes <= pair_budget else "gram"
    b = with_lsh_buckets(base, "_v", dim, n_planes, seed)

    if method == "join":
        from gcpde_spark.llm.dedup import _bucket_pairs

        # persist: bucket assignment (a pandas-UDF matmul over every
        # vector) is consumed by candidate generation and two vector
        # re-joins; caching runs it once, LRU eviction reclaims it
        b = b.withColumn("_norm", F.sqrt(_dot(F.col("_v"), F.col("_v")))).persist()
        pairs = _bucket_pairs(
            b.select("bucket", "_id"), ["bucket"], max_bucket_size=max_bucket_size
        )
        x = b.select(
            F.col("_id").alias("id_a"),
            F.col("_v").alias("_va"),
            F.col("_norm").alias("_na"),
        )
        y = b.select(
            F.col("_id").alias("id_b"),
            F.col("_v").alias("_vb"),
            F.col("_norm").alias("_nb"),
        )
        return (
            pairs.join(x, "id_a")
            .join(y, "id_b")
            .select(
                "id_a",
                "id_b",
                (
                    round4(
                        _dot(F.col("_va"), F.col("_vb"))
                        / (F.col("_na") * F.col("_nb"))
                    )
                    + F.lit(0.0)
                ).alias("score"),
            )
            .where(F.col("score") >= threshold)
        )

    def _score_bucket(pdf: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame({"id_a": [], "id_b": [], "score": []})
        m = len(pdf)
        if m < 2 or m > max_bucket_size:
            return empty
        vecs = np.stack(pdf["_v"].to_numpy())  # m × dim
        norms = np.sqrt((vecs * vecs).sum(axis=1))
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = (vecs @ vecs.T) / np.outer(norms, norms)
        iu = np.triu_indices(m, 1)
        raw = sims[iu] * 10000.0
        # HALF_UP (away from zero) on exact .5 ties, matching Spark's
        # F.round in the join route — np.round is half-even and would
        # flip membership on integer-grid cosines landing exactly on a
        # .00005 boundary (route parity is a documented contract)
        s = np.sign(raw) * np.floor(np.abs(raw) + 0.5) / 10000.0 + 0.0
        keep = s >= threshold  # NaN (zero-norm rows) compares False
        ids = pdf["_id"].to_numpy()
        ia, ib = ids[iu[0][keep]], ids[iu[1][keep]]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "score": s[keep]})

    return b.groupBy("bucket").applyInPandas(
        _score_bucket, f"id_a {id_type}, id_b {id_type}, score double"
    )


def profile_pair_bound(profiles: DataFrame, cat_col: str) -> int:
    """Σ_cat freq(cat)² — the exact-path candidate-pair upper bound for
    :func:`profile_neighbors` (``profiles`` is the (key, cat, _n) table).
    One keyed count + a scalar aggregate; collected as a single number.
    """
    row = (
        profiles.groupBy(cat_col)
        .agg(F.count(F.lit(1)).alias("_f"))
        .agg(F.sum(F.col("_f") * F.col("_f")).alias("_p"))
        .collect()
    )
    return int(row[0][0] or 0)


def profile_neighbors(
    df: DataFrame,
    key_col: str,
    cat_col: str,
    top_k: int = 1,
    method: str = "auto",
    candidate_budget: int = 50_000_000,
    n_planes: int = 16,
    seed: int = 13,
    max_categories: int = 4096,
    unpersist_after: bool = False,
    pairs_per_partition: int = 750_000,
    finish: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """Behavioral nearest neighbors: build each key's categorical
    activity profile (count vector over ``cat_col``) and return its
    ``top_k`` most cosine-similar other keys — "users who behave like
    this user", the interaction-profile analog of document similarity
    (cf. the distributed similarity-search literature, e.g. EDBT'19
    streaming time-series search; pattern only).

    Numerics (exact path): counts are exact BIGINTs, so dot products
    and squared norms are exact; the one double expression (dot/√·/√·)
    is identical IEEE ops on both engines, then quantized to
    micro-units so ranking compares exact integers with a key
    tie-break — fully deterministic (the corpus entry l33 hash-matches
    a DuckDB oracle).

    Scale — and the honest cost model: the exact path's candidate
    pairs come from an equi-join on the category, so its cost is
    Σ_cat freq(cat)² where freq(cat) = #keys active in that category.
    With a BOUNDED category vocabulary (event types: ~5 values) nearly
    every key has every category, freq(cat) ≈ N, and the join is
    ~N²/|cats| — all-pairs in disguise. The exact path is therefore
    only safe when activity is sparse (freq(cat) ≪ N per category).
    ``method="auto"`` (default) measures Σ freq(cat)² with one cheap
    keyed count (scalar collect) and routes to the LSH path when it
    exceeds ``candidate_budget``: profiles are densified into a
    |cats|-dim count vector and self-searched with
    :func:`lsh_topk` (bucketed candidates, never all-pairs) —
    approximate, seed-deterministic. ``method="exact"`` /
    ``method="lsh"`` force a route. Vocabularies wider than
    ``max_categories`` raise — use :func:`lsh_topk` over a
    hashed-feature vector for unbounded profiles.

    Caching: ``method="auto"`` persists the profile aggregate
    (MEMORY_AND_DISK, LRU-evictable) so the routing bound and the
    routed query share one raw-event shuffle; the lazy result keeps
    reading it, so the cache lifetime is caller-owned after return
    (released automatically on routing errors). Force a route to avoid
    the hidden persist entirely — or pass ``unpersist_after=True``
    (VERDICT r7 #5, long-lived sessions) to trade the lazy contract for
    a bounded cache: the top-k result (neighbor-table-sized, far
    smaller than the profile aggregate) is materialized+persisted
    eagerly and the routing persist is released before returning; see
    curation.select_top_fraction for the shared contract.

    Reduce-stage sizing (measured latch, the recursive_expand pattern in
    the opposite direction): the auto route already measures the
    candidate-pair bound, so when ``bound / pairs_per_partition``
    exceeds the session's shuffle-partition setting the exact route's
    plan is latched (operators.latch_plan) to the derived count (capped
    at the cluster's default parallelism) — a session tuned for
    KB-scale shuffles would otherwise serialize this operator's
    CPU-heavy dot-product reduce into too few tasks (measured at bench
    SF: 2.4 s at 16 reducers vs 3.1 s at 4 for an 11M-pair bound). The
    latch only ever RAISES the count; ``finish`` (e.g. a final sort)
    is applied before latching so the caller's whole query keeps the
    sizing.
    """
    from pyspark.sql import Window

    p = df.groupBy(key_col, cat_col).agg(F.count(F.lit(1)).alias("_n"))
    if method not in ("auto", "exact", "lsh"):
        raise ValueError(f"unknown method {method!r}; use auto|exact|lsh")
    if method == "auto":
        # The bound job must materialize p anyway (the only shuffle over
        # the raw events); persist it so the routed query reads the
        # (keys × categories)-sized aggregate instead of re-scanning the
        # input. Sized like a profile table, not the fact table.
        #
        # Cache lifetime is CALLER-OWNED past this call: the result is
        # lazy and both routes read p again when the caller finally
        # materializes it, so unpersisting here would turn the cache
        # into two recomputes of the raw-event shuffle. The cache is
        # MEMORY_AND_DISK (LRU-evictable, never OOMs the executors);
        # callers that materialize the result and want the storage back
        # immediately use method="exact"/"lsh" (no hidden persist) or
        # spark.catalog.clearCache(). Routing errors do release it.
        p.persist()
        try:
            pair_bound = profile_pair_bound(p, cat_col)
        except Exception:
            p.unpersist(blocking=False)
            raise
        method = "lsh" if pair_bound > candidate_budget else "exact"
        auto_persisted = True
    else:
        pair_bound = None
        auto_persisted = False
    from gcpde_spark.llm.curation import _release_routing_cache

    release = auto_persisted and unpersist_after
    if method == "lsh":
        try:
            out = _profile_neighbors_lsh(
                p, key_col, cat_col, top_k, n_planes, seed, max_categories
            )
        except Exception:
            if auto_persisted:
                p.unpersist(blocking=False)
            raise
        if finish is not None:
            out = finish(out)
        return _release_routing_cache(out, p, release)
    latch_parts = None
    if method == "exact" and pair_bound is not None:
        session_parts = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        derived = -(-pair_bound // pairs_per_partition)  # ceil
        cap = df.sparkSession.sparkContext.defaultParallelism
        if derived > session_parts and min(cap, derived) > session_parts:
            latch_parts = min(cap, derived)
    nrm = p.groupBy(key_col).agg(F.sum(F.col("_n") * F.col("_n")).alias("_s2"))
    a = p.select(
        F.col(key_col).alias("_ka"), F.col(cat_col).alias("_c"), F.col("_n").alias("_na")
    )
    b = p.select(
        F.col(key_col).alias("_kb"), F.col(cat_col).alias("_c"), F.col("_n").alias("_nb")
    )
    dots = (
        a.join(b, "_c")
        .where(F.col("_ka") != F.col("_kb"))
        .groupBy("_ka", "_kb")
        .agg(F.sum(F.col("_na") * F.col("_nb")).alias("_dot"))
    )
    na = nrm.select(F.col(key_col).alias("_ka"), F.col("_s2").alias("_s2a"))
    nb = nrm.select(F.col(key_col).alias("_kb"), F.col("_s2").alias("_s2b"))
    sims = (
        dots.join(na, "_ka")
        .join(nb, "_kb")
        .select(
            "_ka",
            "_kb",
            F.round(
                F.col("_dot").cast("double")
                / F.sqrt(F.col("_s2a").cast("double"))
                / F.sqrt(F.col("_s2b").cast("double"))
                * 1000000
            )
            .cast("bigint")
            .alias("_sim_micro"),
        )
    )
    w = Window.partitionBy("_ka").orderBy(
        F.col("_sim_micro").desc(), F.col("_kb")
    )
    out = (
        sims.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_k)
        .select(
            F.col("_ka").alias(key_col),
            F.col("_kb").alias("neighbor"),
            F.col("_rn").cast("bigint").alias("rank"),
            (F.round(F.col("_sim_micro").cast("double") / 1000000 * 10000) / 10000)
            .alias("sim"),
        )
    )
    if finish is not None:
        out = finish(out)
    return _release_routing_cache(out, p, release, latch_partitions=latch_parts)


def _profile_neighbors_lsh(
    p: DataFrame,
    key_col: str,
    cat_col: str,
    top_k: int,
    n_planes: int,
    seed: int,
    max_categories: int,
) -> DataFrame:
    """Bucketed route for :func:`profile_neighbors`: densify each key's
    (category → count) profile into a |cats|-dim vector and self-search
    with :func:`lsh_topk`.

    Candidate pairs are bounded by Σ_bucket size(bucket)² — sub-quadratic
    whenever the hyperplane buckets split the population (property-tested
    on the degenerate 10k-keys × 3-categories case the exact path cannot
    survive). The category vocabulary is collected once (bounded by
    ``max_categories`` — a driver-side list the size of an enum, the same
    sanctioned pattern as the IVF training sample).
    """
    from pyspark.sql import Window

    cats = [
        r[0]
        for r in p.select(cat_col)
        .distinct()
        .orderBy(cat_col)
        .limit(max_categories + 1)
        .collect()
    ]
    if len(cats) > max_categories:
        raise ValueError(
            f"profile vocabulary exceeds max_categories={max_categories}; "
            "use lsh_topk over a hashed-feature vector for unbounded profiles"
        )
    dim = len(cats)
    idx = F.create_map(
        *[x for i, c in enumerate(cats) for x in (F.lit(c), F.lit(i))]
    )
    vecs = (
        p.withColumn("_idx", idx[F.col(cat_col)])
        .groupBy(key_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_idx"), F.col("_n")))
            ).alias("_m")
        )
        .select(
            key_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0)).cast(
                    "double"
                ),
            ).alias("_vec"),
        )
    )
    # hash a per-vector mean-centered copy: count profiles are all-
    # positive (one orthant — origin hyperplanes split them poorly);
    # centering spreads directions while scaled twins stay bucket-equal.
    # Scoring below still uses the RAW profile (exact cosine).
    mean = F.aggregate(
        F.col("_vec"), F.lit(0.0), lambda a, b: a + b
    ) / F.lit(float(dim))
    vecs = vecs.withColumn(
        "_hvec", F.transform(F.col("_vec"), lambda x: x - mean)
    )
    hits = lsh_topk(
        vecs,
        vecs.select(
            F.col(key_col).alias("_qk"),
            F.col("_vec").alias("_qv"),
            F.col("_hvec").alias("_qhv"),
        ),
        k=top_k + 1,
        id_col=key_col,
        vec_col="_vec",
        query_id_col="_qk",
        query_vec_col="_qv",
        dim=dim,
        n_planes=n_planes,
        seed=seed,
        multiprobe=True,
        hash_vec_col="_hvec",
        query_hash_vec_col="_qhv",
    ).where(F.col("qid") != F.col("vec_id"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        hits.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_k)
        .select(
            F.col("qid").alias(key_col),
            F.col("vec_id").alias("neighbor"),
            F.col("_rn").cast("bigint").alias("rank"),
            F.col("score").alias("sim"),
        )
    )
