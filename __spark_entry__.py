"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL for each hash-matched query.

All real logic lives in the ``gcpde_spark`` package; this module only
adapts it to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

try:
    # installed package (pip install -e ., pyproject.toml)
    from gcpde_spark.queries import CORPUS
except ImportError:  # bare checkout: the driver runs this file in place
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from gcpde_spark.queries import CORPUS


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (C06 — multi-join + aggregate revenue by nation)."""
    return CORPUS["c06_three_way_join_agg"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # The driver verifies the FIRST 50 entries in insertion order. Emit every
    # oracle-backed entry first (50 of them — each gets a full hash check),
    # then the oracle-less approximate x-entries (rows-only check), so no
    # hash-verifiable operator falls outside the window.
    ordered = sorted(CORPUS.items(), key=lambda kv: kv[1].oracle is None)
    return {name: spec.build for name, spec in ordered}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in CORPUS.items() if spec.oracle is not None
    }
