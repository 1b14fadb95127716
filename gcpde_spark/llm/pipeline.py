"""The composed corpus-curation pipeline: what a training-data job
actually runs — dedup, quality gate, language gate, token accounting —
as ONE declarative DataFrame so Catalyst fuses the projections and the
whole thing costs a single shuffle (the dedup window).

No reference counterpart (SURVEY.md §2B-16); this is the integration of
the individual operators in :mod:`gcpde_spark.llm`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gcpde_spark.llm.text import (
    normalize_text,
    with_language_id,
    with_text_stats,
    with_token_counts,
)


def curate_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    min_quality: float = 0.5,
    keep_langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Standard curation: exact-dedup (keep smallest id per normalized
    text), drop short/low-quality docs, keep target languages; output
    carries the quality/token accounting columns downstream jobs need.

    Single-shuffle plan: the dedup window is the only exchange the
    pipeline itself requires — the stats, language-ID and token-count
    projections are all map-side and Catalyst collapses them into the
    surrounding stages (verified: at sf0.01 the executed plan shows one
    hash exchange for the window, plus only the small-input fanout
    repartition from ``spread`` — a no-op at scale). Filters run BEFORE
    the heavy language projection (cheap gates first), and everything is
    expressed on columns so predicate pushdown applies when ``df`` is a
    raw scan.
    """
    # normalize ONCE and feed the normalized column to every downstream
    # operator: normalization is idempotent (lower/trim/collapse), and
    # regex projections are too opaque for Catalyst's common-subexpression
    # elimination to dedup across operators — this single materialized
    # column replaces ~6 re-normalizations per row (neutral at small SF
    # where the stopword HOF filters dominate; real at 100 TB)
    norm_col = "_norm_text"
    df = df.withColumn(norm_col, normalize_text(text_col))
    w = Window.partitionBy(F.md5(F.col(norm_col))).orderBy(id_col)
    deduped = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    scored = with_text_stats(deduped, norm_col)
    gated = scored.where(
        (F.col("n_tokens") >= min_tokens) & (F.col("quality_score") >= min_quality)
    )
    lang = with_language_id(gated, norm_col).where(
        F.col("lang_pred").isin(list(keep_langs))
    )
    return with_token_counts(lang, norm_col).select(
        id_col,
        "lang_pred",
        "n_tokens",
        "n_tokens_bpe",
        "avg_token_len",
        "punct_ratio",
        "stopword_ratio",
        "quality_score",
    )
