"""The records (list[dict]) ↔ DataFrame boundary.

The reference is row-oriented end-to-end (``ListJsonType = list[dict]``,
gcpde/types.py:7). The engine preserves that contract *only at the API
edge* — internally everything is columnar (SURVEY.md §1.3).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql.types import StructType

from gcpde_spark.schema import infer_schema


def rows_to_records(rows: list[Row]) -> list[dict[str, Any]]:
    """Collected Rows → list[dict] (recursive, so RECORD columns are dicts)."""
    return [r.asDict(recursive=True) for r in rows]


def records_to_dataframe(
    spark: SparkSession,
    records: list[dict[str, Any]],
    schema: StructType | None = None,
) -> DataFrame:
    """records → DataFrame with the reference's inference semantics.

    With no explicit schema, uses :func:`gcpde_spark.schema.infer_schema`
    (conflict-raising, field-unioning — gcpde/bq.py:302-318) rather than
    Spark's widening inference.
    """
    if schema is None:
        schema = infer_schema(records)
    return spark.createDataFrame(records, schema=schema)
