"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard
(SURVEY.md §2B-16; no reference counterpart — 100 TB extension layer).

Scale design, common to every operator here:

- **Never all-pairs.** Candidate generation is banded/bucketed: documents
  are exploded to skinny ``(id, band_idx, band_hash)`` rows and candidate
  pairs come from an equi-join on the band key — the only shuffle is on
  band hashes, and the join input is a few dozen bytes per row.
- **Signatures are computed map-side** with built-in higher-order
  functions (``transform``/``aggregate``/``xxhash64``): one codegen'd
  pass over the token array per document, no Python, no shuffle.
- **Verification re-joins by id** to fetch shingle sets only for the
  (rare) candidate pairs, instead of carrying arrays through the LSH
  join — at 1000-executor scale the band join stays skinny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gcpde_spark.llm.text import normalize_text, round4, tokens

# Universal-hash family (a*x + b) mod P with P = 2^31 - 1 (Mersenne
# prime) over inputs folded into [0, P). Two constraints pin this choice:
# (1) a, b, x < 2^31 keeps the product under 2^62 — no long overflow,
#     which Spark's default ANSI mode raises on instead of wrapping;
# (2) P must be SMALLER than the typical product so the mod wraps many
#     times — with a larger modulus (e.g. 2^61-1) the map is piecewise
#     monotonic in x, min-wise independence collapses, and measured
#     signature agreement lands far below true Jaccard.
_P = (1 << 31) - 1


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Keep one row (smallest ``id_col``) per distinct normalized text.

    hash-groupBy dedup: md5 of the normalized text is the grouping key, a
    window ``row_number`` keeps the survivor. One shuffle on the 128-bit
    hash — uniformly distributed, so no skew regardless of document skew.
    """
    w = Window.partitionBy("_fp").orderBy(id_col)
    return (
        df.withColumn("_fp", F.md5(normalize_text(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Dedup *accounting*: one row per distinct normalized text with the
    surviving id and the copy count — the audit view of :func:`exact_dedup`."""
    return (
        df.groupBy(F.md5(normalize_text(text_col)).alias("fp"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# shingles + MinHash
# ---------------------------------------------------------------------------


def with_shingles(
    df: DataFrame, text_col: str = "text", n: int = 3, out_col: str = "shingles"
) -> DataFrame:
    """Add the distinct word-``n``-gram set of the normalized text.

    Documents shorter than ``n`` tokens contribute their whole token
    sequence as a single shingle so they still participate.
    """
    toks = tokens(text_col)
    ngrams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return df.withColumn(out_col, F.array_distinct(ngrams))


def _minhash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the permutation hash family."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _P) | 1, rng.randrange(0, _P))
        for _ in range(num_hashes)
    ]


def with_minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 128,
    shingle_size: int = 3,
    seed: int = 42,
    out_col: str = "minhash",
) -> DataFrame:
    """Add a ``num_hashes``-long MinHash signature of the shingle set.

    shingle → xxhash64 base hash once, then the classic permutation
    family ``min((a*x + b) mod P)`` per signature slot — a single nested
    ``transform`` over a literal parameter array, all JVM-side.
    """
    params = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in _minhash_params(num_hashes, seed)
        ]
    )
    shingled = with_shingles(df, text_col, n=shingle_size, out_col="_sh")
    # base hash folded into [0, P) (see the _P note above)
    base = F.transform(
        F.col("_sh"), lambda s: F.pmod(F.xxhash64(s), F.lit(_P))
    )
    sig = F.transform(
        params,
        lambda p: F.array_min(
            F.transform(base, lambda x: F.pmod(p.a * x + p.b, F.lit(_P)))
        ),
    )
    return shingled.withColumn(out_col, sig).drop("_sh")


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 16,
    shingle_size: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by banded MinHash-LSH, verified exactly.

    1. signature (map-side) → ``bands`` band keys per doc (rows/band =
       num_hashes/bands; with the 128/16 default the LSH S-curve crosses
       ~50% capture at Jaccard ≈ (1/16)^(1/8) ≈ 0.71).
    2. skinny self-join on ``(band_idx, band_hash)`` → candidate id pairs
       (``id_a < id_b``, distinct). NEVER all-pairs.
    3. re-join shingle sets by id and keep pairs with exact Jaccard ≥
       ``threshold`` — no false positives survive; recall is the LSH
       capture probability (property-tested in tests/test_llm.py).

    Returns ``(id_a, id_b, jaccard)``.
    """
    rows_per_band = num_hashes // bands
    sig = with_minhash_signature(
        df.select(F.col(id_col).alias("_id"), text_col),
        text_col,
        num_hashes=num_hashes,
        shingle_size=shingle_size,
        seed=seed,
    )
    band_keys = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.hash(F.slice(F.col("minhash"), b * rows_per_band + 1, rows_per_band)),
    )
    skinny = sig.select("_id", F.posexplode(band_keys).alias("band_idx", "band_hash"))
    a, b = skinny.alias("a"), skinny.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    return _verify_jaccard(df, candidates, id_col, text_col, shingle_size, threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact word-``n``-gram Jaccard for given candidate ``(id_a, id_b)``
    pairs — the verification primitive, also usable standalone when the
    candidate set comes from elsewhere (same source, same URL, …)."""
    return _verify_jaccard(df, pairs, id_col, text_col, n, threshold=None)


def _verify_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    threshold: float | None,
) -> DataFrame:
    sh = with_shingles(df, text_col, n=n).select(
        F.col(id_col).alias("_vid"), F.col("shingles")
    )
    out = (
        pairs.join(sh.alias("sa"), F.col("id_a") == F.col("sa._vid"))
        .join(sh.alias("sb"), F.col("id_b") == F.col("sb._vid"))
        .select(
            "id_a",
            "id_b",
            round4(
                F.size(F.array_intersect("sa.shingles", "sb.shingles")).cast("double")
                / F.size(F.array_union("sa.shingles", "sb.shingles"))
            ).alias("jaccard"),
        )
    )
    if threshold is not None:
        out = out.where(F.col("jaccard") >= threshold)
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def with_simhash(
    df: DataFrame, text_col: str = "text", out_col: str = "simhash"
) -> DataFrame:
    """Add a 64-bit SimHash of the token multiset.

    Classic Charikar construction: each token votes ±1 on every bit of
    its xxhash64; bit *b* of the result is 1 iff the vote sum is ≥ 0.
    Implemented as one nested ``aggregate`` expression — 64 bit-folds over
    the token array per row, entirely map-side (no explode, no shuffle,
    no Python).
    """
    # shiftleft (not acc*2): the bit-63 step would overflow a long, which
    # ANSI mode turns into an error; shifts wrap by definition.
    sim = F.expr(
        """
        aggregate(
          sequence(63, 0, -1),
          CAST(0 AS BIGINT),
          (acc, b) -> shiftleft(acc, 1) + IF(
            aggregate(
              transform(split(trim(regexp_replace(lower({t}), '\\\\s+', ' ')), ' '),
                        tk -> xxhash64(tk)),
              0,
              (a, h) -> a + IF((shiftright(h, b) & 1) = 1, 1, -1)
            ) >= 0, 1, 0)
        )
        """.format(t=text_col)
    )
    return df.withColumn(out_col, sim)


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash: candidates share at least one of
    four 16-bit chunks (any pair within Hamming distance 3 of a 64-bit
    hash must agree on ≥1 chunk — pigeonhole), verified with
    ``bit_count(a XOR b) ≤ max_hamming``. Returns (id_a, id_b, hamming).
    """
    sim = with_simhash(df.select(F.col(id_col).alias("_id"), text_col), text_col)
    # SQL-expr lambda: the Python F.shiftright only takes a literal int
    # for the shift amount, the SQL builtin takes a column.
    chunks = F.expr(
        "transform(sequence(0, 3), c -> shiftright(simhash, c * 16) & 65535)"
    )
    skinny = sim.select(
        "_id", "simhash", F.posexplode(chunks).alias("chunk_idx", "chunk")
    )
    a, b = skinny.alias("a"), skinny.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
