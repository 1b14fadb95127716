"""Loading the driver's star-schema parquet tables and registering views.

The testdata 'events' table stores TIMESTAMP(NANOS) parquet, which Spark's
reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong=true`` (set in
gcpde_spark.session) the column arrives as int64 nanoseconds and is
converted here to ``timestamp_ntz`` — a distributed column expression, not
a driver-side rewrite, so it costs one projection at scan time and scales
to any data size.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Per-session DataFrame cache: a DataFrame is an immutable logical plan,
# so reusing it across queries is free and skips the per-query
# file-listing + parquet-footer schema read (a fixed ~50-100 ms driver
# cost per table per query that dominates small-SF benchmarks and, at
# cluster scale, spares the driver re-listing object-store prefixes).
# Keyed weakly by session so a stopped session's plans are collectable.
_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table from ``{sf_dir}/{name}.parquet``."""
    try:
        per_session = _CACHE.setdefault(spark, {})
    except TypeError:  # session type not weakref-able: skip caching
        per_session = None
    if per_session is not None and (sf_dir, name) in per_session:
        return per_session[(sf_dir, name)]
    df = _load_table(spark, sf_dir, name)
    if per_session is not None:
        per_session[(sf_dir, name)] = df
    return df


def _load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Defensive for caller-provided sessions (e.g. the driver's) that
        # didn't go through gcpde_spark.session — this SQL conf is
        # runtime-settable and required to read TIMESTAMP(NANOS) parquet.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # int64 nanos → µs-precision naive timestamp (matches DuckDB's
        # TIMESTAMP_NS → TIMESTAMP truncation; values are post-epoch so
        # integer floor-division agrees with truncation).
        # 'div' is integer division — float division would lose precision
        # (ns epoch values exceed double's 53-bit mantissa).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every star-schema table as a temp view named after itself."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
