"""Engine — the user-facing facade (SURVEY.md §7 architecture).

One object wrapping a SparkSession, exposing the reference's three pillars
plus the relational surface:

- ``engine.sql(q)`` / ``engine.select(q)`` / ``engine.run_command(q)`` —
  SQL-passthrough parity (Q1–Q3), served by Catalyst.
- ``engine.query_paginated`` / ``engine.select_paginated`` — stateless
  paged results (Q4).
- ``engine.tables`` — table lifecycle / DML (B1–B14).
- ``engine.datasets`` — partitioned JSONL datasets (S1–S8).
- ``engine.sheets`` — worksheet-style small-table I/O (H1–H5).
- ``engine.register_udf`` / ``engine.register_pandas_udf`` — user code
  callable from SQL (§2B-12).

The streaming layer (:mod:`gcpde_spark.streaming`), the time-series
operators (:mod:`gcpde_spark.operators` — as-of join, interval join) and
the LLM-pipeline operators (:mod:`gcpde_spark.llm`) are DataFrame-level
modules used directly with ``engine.spark`` / any DataFrame.

Every record-returning verb has a ``*_df`` sibling that stays distributed.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from gcpde_spark.tables import FIVE_MINUTES, TableStore


class Engine:
    def __init__(self, spark: SparkSession, warehouse_dir: str | None = None):
        self.spark = spark
        self.tables = TableStore(spark, warehouse_dir=warehouse_dir)
        # Lazily constructed (they need a base path / backend):
        self._datasets_cache: dict[str, Any] = {}

    # -- relational surface (Q1–Q3, Q5) -------------------------------------

    def sql(self, query: str, timeout: float = FIVE_MINUTES) -> list[dict[str, Any]]:
        """Run SQL and materialize records (≙ bq.query, gcpde/bq.py:149-163)."""
        return self.tables.query(query, timeout=timeout)

    def select(self, query: str, timeout: float = 10) -> list[dict[str, Any]]:
        """Interactive variant with a 10 s default timeout (gcpde/bq.py:680)."""
        return self.tables.select(query, timeout=timeout)

    def run_command(self, command: str, timeout: float = FIVE_MINUTES) -> None:
        self.tables.run_command(command, timeout=timeout)

    def sql_df(self, query: str) -> DataFrame:
        """The scale path: plan, don't collect."""
        return self.spark.sql(query)

    def query_paginated(
        self, query: str, page_size: int, page_token: str | None = None
    ):
        """Paged query with a stateless continuation token (Q4)."""
        return self.tables.query_paginated(query, page_size, page_token)

    def select_paginated(
        self, query: str, page_size: int, page_token: str | None = None
    ):
        return self.tables.select_paginated(query, page_size, page_token)

    def register_udf(self, name: str, fn, return_type=None) -> None:
        """Register a Python UDF usable from ``engine.sql`` (SURVEY §2B-12).

        UDFs are the slow path — row-at-a-time Python. Prefer built-in
        functions; for vectorized user code use ``register_pandas_udf``.
        """
        self.spark.udf.register(name, fn, return_type)

    def register_pandas_udf(self, name: str, fn, return_type) -> None:
        """Register an Arrow-vectorized pandas UDF usable from ``engine.sql``.

        ``fn`` takes/returns pandas Series batches — ~10-100× faster than a
        row-at-a-time UDF because data crosses the JVM↔Python boundary as
        Arrow record batches.
        """
        from pyspark.sql.functions import pandas_udf

        self.spark.udf.register(name, pandas_udf(fn, return_type))

    def datasets(self, base_path: str):
        """Dataset store rooted at ``base_path`` (local dir, hdfs://, gs://)."""
        from gcpde_spark.datasets import DatasetStore

        if base_path not in self._datasets_cache:
            self._datasets_cache[base_path] = DatasetStore(self.spark, base_path)
        return self._datasets_cache[base_path]

    def sheets(self, backend=None):
        """Sheet store over a backend (default: in-memory fake)."""
        from gcpde_spark.sheets import InMemorySheetBackend, SheetStore

        return SheetStore(self.spark, backend or InMemorySheetBackend())

    def txn(self, path: str):
        """Open the transactional table at ``path`` (snapshot reads,
        file-pruned MERGE/DELETE/UPDATE, time travel, change feed —
        :class:`gcpde_spark.txn.TxnTable`)."""
        from gcpde_spark.txn import TxnTable

        return TxnTable(self.spark, path)

    def materialized_view(self, base, path: str):
        """Open the materialized aggregate view at ``path`` over
        transactional table ``base`` (incremental group-scoped refresh
        from the precise change feed —
        :class:`gcpde_spark.views.MaterializedAggView`; build a new one
        with ``MaterializedAggView.create``)."""
        from gcpde_spark.views import MaterializedAggView

        return MaterializedAggView(self.spark, base, path)

    def use_txn_backend(self, root: str, **kwargs):
        """Route ``engine.tables.upsert_table_df`` through the
        transactional backend rooted at ``root`` (file-pruned MERGE +
        atomic catalog publication instead of the parquet rewrite
        paths — the production default at scale). Returns the attached
        :class:`gcpde_spark.txn.TxnMergeBackend` for history / time
        travel / vacuum access via ``backend.table``."""
        from gcpde_spark.txn import TxnMergeBackend

        backend = TxnMergeBackend(root, **kwargs)
        self.tables.merge_backend = backend
        return backend
