"""Engine exceptions, mirroring the reference's error surface.

Reference: ``BigQueryClientException`` (gcpde/bq.py:24-28) and
``BigQuerySchemaMismatchException`` (gcpde/bq.py:241-260) carry the
source/target schemas for diagnostics; we do the same with StructTypes.
"""

from __future__ import annotations

from pyspark.sql.types import StructType


class EngineException(Exception):
    """Base class for engine errors (≙ BigQueryClientException, gcpde/bq.py:24)."""


class SchemaInferenceConflict(EngineException):
    """Raised when records carry irreconcilable types for one field.

    The reference *errors out* on type conflicts instead of widening
    (gcpde/bq.py:311-314; test tests/unit/test_bq.py:353-359). Spark's
    native inference widens, so :func:`gcpde_spark.schema.infer_schema`
    adds an explicit conflict check and raises this.
    """


class SchemaMismatchException(EngineException):
    """Structural source/target schema mismatch before an upsert MERGE.

    ≙ BigQuerySchemaMismatchException (gcpde/bq.py:241-260): carries both
    schemas so callers can diff them.
    """

    def __init__(self, message: str, source_schema: StructType, target_schema: StructType):
        super().__init__(message)
        self.source_schema = source_schema
        self.target_schema = target_schema

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        return (
            f"{super().__str__()}\n source: {self.source_schema.simpleString()}"
            f"\n target: {self.target_schema.simpleString()}"
        )


class ConcurrentCommitError(Exception):
    """Another writer published this version first — re-read the table
    and re-apply the merge (optimistic concurrency). Raised by every
    :mod:`gcpde_spark.commit_backend` arbitration, POSIX and
    object-store alike."""


class TableNotFoundError(EngineException):
    """Target table does not exist (≙ google NotFound at gcpde/bq.py:62-65)."""


class TableAlreadyExistsError(EngineException):
    """Create on an existing table (≙ google Conflict at gcpde/bq.py:321-329)."""
