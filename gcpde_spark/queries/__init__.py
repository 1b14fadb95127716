"""Declared query corpus (SURVEY.md §2C) and its DuckDB oracle SQL."""

from gcpde_spark.queries.corpus import CORPUS, QuerySpec

__all__ = ["CORPUS", "QuerySpec"]
