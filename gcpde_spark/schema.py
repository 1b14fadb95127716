"""Schema utilities: inference from records and BQ-JSON-repr translation.

Reference semantics being mirrored (SURVEY.md §1.2):

- ``_create_schema_from_records`` (gcpde/bq.py:302-318) infers a schema
  from a record sample with ``keep_nulls=True`` (always-null fields are
  kept), ``quoted_values_are_strings=True`` ("1" stays STRING), and
  ``preserve_input_sort_order=True`` (field order = first-seen order).
  Irreconcilable type conflicts **raise** (gcpde/bq.py:311-314;
  test tests/unit/test_bq.py:353-359) instead of widening — Spark's native
  inference widens, hence this explicit implementation.
- Nested dicts become RECORDs whose fields union across records
  (golden test tests/unit/test_bq.py:211-249).
- int→float upgrades are reconcilable (the underlying
  bigquery-schema-generator widens INTEGER to FLOAT); everything else
  (bool vs str, int vs str, scalar vs struct, …) conflicts.
- ``get_schema_from_json`` (gcpde/bq.py:263-273) translates the BigQuery
  JSON schema representation; here it maps onto StructType
  (NULLABLE/REQUIRED → nullable flag, REPEATED → ArrayType,
  RECORD → nested StructType).
"""

from __future__ import annotations

import datetime as dt
from typing import Any

from pyspark.sql import types as T

from gcpde_spark.errors import SchemaInferenceConflict

# ---------------------------------------------------------------------------
# inference
# ---------------------------------------------------------------------------

# Internal tags for the inference lattice.
_BOOL, _INT, _FLOAT, _STR, _TS, _DATE = "bool", "int", "float", "str", "ts", "date"

_SCALAR_TYPES = {
    _BOOL: T.BooleanType(),
    _INT: T.LongType(),
    _FLOAT: T.DoubleType(),
    _STR: T.StringType(),
    _TS: T.TimestampType(),
    _DATE: T.DateType(),
}


def _tag(value: Any) -> str:
    if isinstance(value, bool):
        return _BOOL
    if isinstance(value, int):
        return _INT
    if isinstance(value, float):
        return _FLOAT
    if isinstance(value, str):
        return _STR
    if isinstance(value, dt.datetime):
        return _TS
    if isinstance(value, dt.date):
        return _DATE
    raise SchemaInferenceConflict(f"unsupported value type {type(value).__name__}")


class _FieldState:
    """Accumulated evidence about one field across the record sample."""

    __slots__ = ("scalar", "struct", "array", "seen")

    def __init__(self) -> None:
        self.scalar: str | None = None
        self.struct: dict[str, _FieldState] | None = None
        self.array: _FieldState | None = None
        self.seen = False

    def observe(self, value: Any, path: str) -> None:
        self.seen = True
        if value is None:
            return
        if isinstance(value, dict):
            if self.scalar or self.array:
                raise SchemaInferenceConflict(f"{path}: record vs non-record conflict")
            if self.struct is None:
                self.struct = {}
            for k, v in value.items():
                self.struct.setdefault(k, _FieldState()).observe(v, f"{path}.{k}")
            return
        if isinstance(value, (list, tuple)):
            if self.scalar or self.struct:
                raise SchemaInferenceConflict(f"{path}: array vs non-array conflict")
            if self.array is None:
                self.array = _FieldState()
            for v in value:
                self.array.observe(v, f"{path}[]")
            return
        tag = _tag(value)
        if self.struct or self.array:
            raise SchemaInferenceConflict(f"{path}: scalar vs nested conflict")
        if self.scalar is None:
            self.scalar = tag
        elif self.scalar != tag:
            # the single reconcilable upgrade: INTEGER + FLOAT → FLOAT
            if {self.scalar, tag} == {_INT, _FLOAT}:
                self.scalar = _FLOAT
            else:
                raise SchemaInferenceConflict(
                    f"{path}: conflicting types {self.scalar} vs {tag}"
                )

    def to_type(self) -> T.DataType:
        if self.struct is not None:
            return T.StructType(
                [T.StructField(k, st.to_type(), True) for k, st in self.struct.items()]
            )
        if self.array is not None:
            return T.ArrayType(self.array.to_type(), containsNull=True)
        if self.scalar is not None:
            return _SCALAR_TYPES[self.scalar]
        # keep_nulls=True parity: an always-null field survives as STRING
        return T.StringType()


def infer_schema(records: list[dict[str, Any]]) -> T.StructType:
    """Infer a StructType from a record sample, reference-style.

    Field order is first-seen order (``preserve_input_sort_order=True``,
    gcpde/bq.py:307); all fields NULLABLE; conflicts raise
    :class:`SchemaInferenceConflict`.
    """
    root: dict[str, _FieldState] = {}
    for rec in records:
        if not isinstance(rec, dict):
            raise SchemaInferenceConflict("records must be dicts")
        for k, v in rec.items():
            root.setdefault(k, _FieldState()).observe(v, k)
    return T.StructType([T.StructField(k, st.to_type(), True) for k, st in root.items()])


# ---------------------------------------------------------------------------
# BigQuery JSON schema repr ↔ StructType (B8, gcpde/bq.py:263-273)
# ---------------------------------------------------------------------------

_BQ_TO_SPARK: dict[str, T.DataType] = {
    "STRING": T.StringType(),
    "BYTES": T.BinaryType(),
    "INTEGER": T.LongType(),
    "INT64": T.LongType(),
    "FLOAT": T.DoubleType(),
    "FLOAT64": T.DoubleType(),
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "TIMESTAMP": T.TimestampType(),
    "DATE": T.DateType(),
    "NUMERIC": T.DecimalType(38, 9),
    "BIGNUMERIC": T.DecimalType(38, 18),
    "JSON": T.StringType(),
}

# Keys are DataType.simpleString() names (LongType → "bigint", etc.).
_SPARK_TO_BQ: dict[str, str] = {
    "string": "STRING",
    "binary": "BYTES",
    "bigint": "INTEGER",
    "int": "INTEGER",
    "smallint": "INTEGER",
    "tinyint": "INTEGER",
    "double": "FLOAT",
    "float": "FLOAT",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "date": "DATE",
}


def schema_from_bq_json(fields: list[dict[str, Any]]) -> T.StructType:
    """BigQuery JSON schema repr → StructType (≙ get_schema_from_json)."""
    out: list[T.StructField] = []
    for f in fields:
        ftype = f["type"].upper()
        mode = f.get("mode", "NULLABLE").upper()
        if ftype == "RECORD":
            base: T.DataType = schema_from_bq_json(f.get("fields", []))
        else:
            base = _BQ_TO_SPARK[ftype]
        if mode == "REPEATED":
            base = T.ArrayType(base, containsNull=True)
        out.append(T.StructField(f["name"], base, nullable=(mode != "REQUIRED")))
    return T.StructType(out)


def schema_to_bq_json(schema: T.StructType) -> list[dict[str, Any]]:
    """StructType → BigQuery JSON schema repr (round-trips schema_from_bq_json)."""
    out: list[dict[str, Any]] = []
    for f in schema.fields:
        dtype = f.dataType
        mode = "NULLABLE" if f.nullable else "REQUIRED"
        if isinstance(dtype, T.ArrayType):
            mode = "REPEATED"
            dtype = dtype.elementType
        entry: dict[str, Any] = {"name": f.name, "mode": mode}
        if isinstance(dtype, T.StructType):
            entry["type"] = "RECORD"
            entry["fields"] = schema_to_bq_json(dtype)
        elif isinstance(dtype, T.DecimalType):
            entry["type"] = "NUMERIC"
        else:
            entry["type"] = _SPARK_TO_BQ[dtype.simpleString()]
        out.append(entry)
    return out
