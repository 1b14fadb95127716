"""LLM-data-pipeline operators — the 100 TB extension layer (SURVEY.md §2B-16).

No reference counterpart (the reference is an ETL client); these are the
operations a large-scale training-data pipeline needs, expressed as
DataFrame → DataFrame transforms so they scale with partitioning:

- :mod:`gcpde_spark.llm.text`       — normalization, token stats, quality
  scoring, language-ID heuristic, document fingerprinting.
- :mod:`gcpde_spark.llm.dedup`      — exact dedup, MinHash-LSH banded
  near-dup, SimHash, n-gram Jaccard verification.
- :mod:`gcpde_spark.llm.similarity` — embedding cosine top-k (brute-force
  baseline; random-hyperplane LSH and IVF-Flat scale paths), embedding
  near-dup.
- :mod:`gcpde_spark.llm.multimodal` — binary media columns: binaryFile
  source, Arrow-batched decode / feature-extraction plumbing (decode
  itself stubbed — media libs are not in this image).
- :mod:`gcpde_spark.llm.web`        — RFC-3986 canonical URL form and
  URL-keyed crawl dedup (tracking-param aliases, re-crawls).
- :mod:`gcpde_spark.llm.classify`   — hashed-n-gram linear classifier
  inference (the fastText-style quality-filter stage) as a broadcast
  join + exact-integer dot product.

Design rules: no Python row UDFs anywhere (hot paths are built-in column
expressions compiled by Catalyst; where a matrix product genuinely beats
expression trees — LSH/IVF assignment — it runs as one numpy matmul per
Arrow batch in a vectorized pandas UDF), no ``collect()`` inside any
operator except the IVF trainer's bounded driver-side sample, no
all-pairs joins (candidate generation is always banded / bucketed).
"""

from gcpde_spark.llm.classify import (
    classifier_weights,
    hashed_classifier_score,
)
from gcpde_spark.llm.curation import (
    corpus_report,
    decontaminate,
    exact_dedup_keep,
    pack_chunk_sequences,
    pack_token_budget,
    sample_hash_fraction,
    sample_mixture,
    sample_stratified,
    select_top_fraction,
    split_train_val,
)
from gcpde_spark.llm.dedup import (
    bloom_dedup_new,
    bloom_filter_table,
    connected_components,
    dedup_clusters,
    dedup_paragraphs,
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    with_minhash_signature,
    with_simhash,
)
from gcpde_spark.llm.similarity import (
    brute_force_topk,
    dequantize_embeddings,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_topk,
    profile_neighbors,
    profile_pair_bound,
    quantize_embeddings,
    train_ivf_centroids,
    with_ivf_cells,
    with_lsh_buckets,
)
from gcpde_spark.llm.text import (
    bm25_topk,
    chunk_documents,
    normalize_text,
    repetition_stats,
    strip_boilerplate,
    strip_html,
    top_ngrams,
    unigram_logprob,
    with_clean_text,
    with_fingerprint,
    with_language_id,
    with_redacted_pii,
    with_text_stats,
)
from gcpde_spark.llm.web import (
    canonical_url,
    dedup_by_url,
    with_canonical_url,
)

__all__ = [
    "canonical_url",
    "classifier_weights",
    "dedup_by_url",
    "hashed_classifier_score",
    "with_canonical_url",
    "connected_components",
    "corpus_report",
    "decontaminate",
    "bloom_dedup_new",
    "bloom_filter_table",
    "dedup_clusters",
    "dedup_paragraphs",
    "exact_dedup",
    "exact_dedup_keep",
    "pack_chunk_sequences",
    "pack_token_budget",
    "sample_hash_fraction",
    "sample_mixture",
    "sample_stratified",
    "select_top_fraction",
    "split_train_val",
    "minhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "profile_neighbors",
    "profile_pair_bound",
    "simhash_near_dup_pairs",
    "with_minhash_signature",
    "with_simhash",
    "brute_force_topk",
    "dequantize_embeddings",
    "embedding_near_dup_pairs",
    "ivf_topk",
    "quantize_embeddings",
    "lsh_topk",
    "train_ivf_centroids",
    "with_ivf_cells",
    "with_lsh_buckets",
    "chunk_documents",
    "normalize_text",
    "repetition_stats",
    "strip_boilerplate",
    "strip_html",
    "top_ngrams",
    "unigram_logprob",
    "bm25_topk",
    "with_clean_text",
    "with_fingerprint",
    "with_language_id",
    "with_redacted_pii",
    "with_text_stats",
]
