"""Declared query corpus (SURVEY.md §2C + §2B-16) and its DuckDB oracle SQL."""

from gcpde_spark.queries.corpus import CORPUS, QuerySpec
from gcpde_spark.queries import llm_corpus as _llm_corpus  # noqa: F401 — registers L01–L15
from gcpde_spark.queries import ext_corpus as _ext_corpus  # noqa: F401 — registers c50–c54, l29 (LAST: keeps the driver's 50-entry window stable)

__all__ = ["CORPUS", "QuerySpec"]
