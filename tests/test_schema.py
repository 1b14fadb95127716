"""Schema inference + BQ-JSON-repr translation — ports the reference's
inference goldens (tests/unit/test_bq.py:207-272,353-359,580-597)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from gcpde_spark.errors import SchemaInferenceConflict
from gcpde_spark.schema import infer_schema, schema_from_bq_json, schema_to_bq_json


def test_nested_record_fields_union_across_records():
    """Golden ≙ tests/unit/test_bq.py:211-249: dict values become RECORDs
    whose fields union across the sample, all NULLABLE."""
    records = [
        {"json_col": {"col1": 1}},
        {"json_col": {"col2": True}},
        {"json_col": {"col3": "abc"}},
    ]
    schema = infer_schema(records)
    assert schema == T.StructType(
        [
            T.StructField(
                "json_col",
                T.StructType(
                    [
                        T.StructField("col1", T.LongType(), True),
                        T.StructField("col2", T.BooleanType(), True),
                        T.StructField("col3", T.StringType(), True),
                    ]
                ),
                True,
            )
        ]
    )


def test_conflicting_types_raise_not_widen():
    """≙ gcpde/bq.py:311-314, tests/unit/test_bq.py:353-359 — the engine
    must NOT widen bool vs str to string like native Spark inference."""
    with pytest.raises(SchemaInferenceConflict):
        infer_schema([{"v": True}, {"v": "TRUE"}])
    with pytest.raises(SchemaInferenceConflict):
        infer_schema([{"v": 1}, {"v": "1"}])
    with pytest.raises(SchemaInferenceConflict):
        infer_schema([{"v": 1}, {"v": {"nested": 1}}])
    with pytest.raises(SchemaInferenceConflict):
        infer_schema([{"v": [1]}, {"v": 2}])


def test_quoted_values_stay_strings():
    """≙ quoted_values_are_strings=True (gcpde/bq.py:306)."""
    schema = infer_schema([{"v": "1"}, {"v": "2"}])
    assert schema["v"].dataType == T.StringType()


def test_keep_nulls_always_null_field_survives():
    """≙ keep_nulls=True (gcpde/bq.py:305): an all-null field is kept."""
    schema = infer_schema([{"a": 1, "b": None}, {"a": 2, "b": None}])
    assert [f.name for f in schema.fields] == ["a", "b"]
    assert schema["b"].dataType == T.StringType()


def test_int_float_upgrade_is_reconcilable():
    schema = infer_schema([{"v": 1}, {"v": 2.5}])
    assert schema["v"].dataType == T.DoubleType()


def test_field_order_is_first_seen():
    """≙ preserve_input_sort_order=True (gcpde/bq.py:307)."""
    schema = infer_schema([{"b": 1}, {"a": 2, "b": 3}, {"c": 4}])
    assert [f.name for f in schema.fields] == ["b", "a", "c"]


def test_array_inference():
    schema = infer_schema([{"tags": ["x", "y"]}, {"tags": []}])
    assert schema["tags"].dataType == T.ArrayType(T.StringType(), True)


# -- B8: BQ JSON schema repr ↔ StructType -------------------------------------


def test_bq_json_roundtrip_modes():
    """≙ round-trip golden tests/unit/test_bq.py:580-597 — INTEGER/STRING
    with NULLABLE/REQUIRED modes."""
    bq = [
        {"name": "id", "type": "INTEGER", "mode": "REQUIRED"},
        {"name": "name", "type": "STRING", "mode": "NULLABLE"},
    ]
    schema = schema_from_bq_json(bq)
    assert schema == T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
        ]
    )
    assert schema_to_bq_json(schema) == bq


def test_bq_json_repeated_and_record():
    """REPEATED → ArrayType; RECORD → nested StructType (SURVEY §1.1)."""
    bq = [
        {"name": "tags", "type": "STRING", "mode": "REPEATED"},
        {
            "name": "meta",
            "type": "RECORD",
            "mode": "NULLABLE",
            "fields": [{"name": "k", "type": "INTEGER", "mode": "NULLABLE"}],
        },
    ]
    schema = schema_from_bq_json(bq)
    assert schema["tags"].dataType == T.ArrayType(T.StringType(), True)
    assert isinstance(schema["meta"].dataType, T.StructType)
    back = schema_to_bq_json(schema)
    assert back[0]["mode"] == "REPEATED"
    assert back[1]["type"] == "RECORD"
    assert back[1]["fields"] == [{"name": "k", "type": "INTEGER", "mode": "NULLABLE"}]


def test_inference_drives_real_dataframe(spark):
    """The inferred schema is directly usable by createDataFrame."""
    records = [{"id": 1, "meta": {"k": "x"}, "vals": [1, 2]}]
    df = spark.createDataFrame(records, schema=infer_schema(records))
    row = df.collect()[0]
    assert row.id == 1 and row.meta.k == "x" and row.vals == [1, 2]
