"""Declared query corpus (SURVEY.md §2C + §2B-16) and its DuckDB oracle SQL."""

from gcpde_spark.queries.corpus import CORPUS, QuerySpec
from gcpde_spark.queries import llm_corpus as _llm_corpus  # noqa: F401 — registers L01–L15

__all__ = ["CORPUS", "QuerySpec"]
