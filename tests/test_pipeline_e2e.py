"""The README's end-to-end training-data pipeline, executed against the
test corpus — every public operator composed in sequence. Exists
because running it the first time surfaced two real composition bugs
(a missing export; corpus_report breaking on pre-enriched input)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcpde_spark import llm
from gcpde_spark.catalog import load_table
from gcpde_spark.plans import assert_scales
from tests.conftest import SF_SMALL


def test_readme_pipeline_composes_end_to_end(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    n_raw = docs.count()
    benchmarks = docs.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )

    docs = llm.with_clean_text(docs)
    docs = llm.with_redacted_pii(docs, text_col="clean_text")
    docs = llm.with_text_stats(docs, text_col="clean_text")
    scored = llm.unigram_logprob(docs, text_col="clean_text")
    docs = llm.exact_dedup_keep(docs, text_col="clean_text", keep="max_quality")
    paras = llm.dedup_paragraphs(docs, text_col="clean_text")
    docs = docs.drop("clean_text").join(
        paras.withColumnRenamed("text_deduped", "clean_text"), "doc_id"
    )
    clusters = llm.dedup_clusters(
        docs, "doc_id", text_col="clean_text", keep="max_quality"
    )
    docs = docs.join(clusters, "doc_id").where("keep")
    docs = llm.decontaminate(docs, benchmarks, text_col="clean_text")
    docs = docs.where("NOT contaminated")
    docs = llm.sample_mixture(docs, "source", {"src0": 10, "src1": 5}, default=3)
    train, val = llm.split_train_val(docs, val_fraction=0.1)
    chunks = llm.chunk_documents(
        train, text_col="clean_text", chunk_tokens=512, overlap=64
    )
    packed = llm.pack_chunk_sequences(chunks, chunks_per_seq=8)
    report = llm.corpus_report(train, strata_cols=["source"], text_col="clean_text")

    n_train, n_val = train.count(), val.count()
    assert 0 < n_train + n_val < n_raw  # every gate removed something
    assert scored.count() == n_raw  # scoring is a projection, not a filter
    assert packed.count() == chunks.count()  # packing loses no chunks
    assert report.count() > 0
    # the loader-facing output scales: no row-Python, no unkeyed joins
    assert_scales(packed, allow_arrow_udfs=True)
