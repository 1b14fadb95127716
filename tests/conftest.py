"""Shared Spark session + DuckDB oracle fixtures.

One session-scoped local SparkSession keeps the whole suite inside a single
JVM; tests must not stop it.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from gcpde_spark.session import build_session

SF_SMALL = os.environ.get("GCPDE_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("GCPDE_ORACLE_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
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


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        app_name="gcpde_spark_tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "8g",
        },
    )
    yield spark


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with the star-schema views registered (both SFs)."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    yield con
    con.close()
