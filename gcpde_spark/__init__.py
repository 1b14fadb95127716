"""gcpde_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ETL library (wandercom/gcpde).

Architecture (SURVEY.md §7): a thin :class:`Engine` facade over a
``SparkSession``, mirroring the reference's three modules —

- :mod:`gcpde_spark.datasets`  — hive-partitioned JSONL datasets on any
  Hadoop-compatible FS (reference: ``gcpde/gcs.py``),
- :mod:`gcpde_spark.tables`    — table lifecycle / DML / query execution
  (reference: ``gcpde/bq.py``),
- :mod:`gcpde_spark.sheets`    — small all-string worksheet I/O
  (reference: ``gcpde/sheets.py``),

plus the relational surface served directly by Catalyst
(:meth:`Engine.sql` et al.), a streaming layer, and large-scale
LLM-data-pipeline operators (:mod:`gcpde_spark.llm`).

The API keeps the reference's records-in/records-out contract
(``list[dict]``) at the boundary, but every verb also has a ``*_df``
variant returning a DataFrame so nothing forces a collect at scale.
"""

from gcpde_spark.engine import Engine
from gcpde_spark.errors import (
    EngineException,
    SchemaInferenceConflict,
    SchemaMismatchException,
)
from gcpde_spark.commit_backend import (
    CommitBackend,
    ConditionalPutBackend,
    PosixLinkBackend,
    SimulatedObjectStore,
)
from gcpde_spark.session import build_session
from gcpde_spark.tables import MergeIntoBackend
from gcpde_spark.cdf_source import register_cdf_source
from gcpde_spark.txn_source import register_txn_source
from gcpde_spark.txn import TxnMergeBackend, TxnTable, sync_table
from gcpde_spark.views import MaterializedAggView, refresh_view_stream

__all__ = [
    "CommitBackend",
    "ConditionalPutBackend",
    "Engine",
    "EngineException",
    "MaterializedAggView",
    "register_cdf_source",
    "register_txn_source",
    "MergeIntoBackend",
    "PosixLinkBackend",
    "SchemaInferenceConflict",
    "SchemaMismatchException",
    "SimulatedObjectStore",
    "TxnMergeBackend",
    "TxnTable",
    "build_session",
    "refresh_view_stream",
    "sync_table",
]

__version__ = "0.10.0"
