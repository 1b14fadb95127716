"""Bucketed co-located joins (§2B-5 scale path): two tables bucketed on
the join key join WITHOUT a shuffle exchange — at 100 TB this is the
difference between re-shuffling both fact tables per join and reading
co-located buckets.

The assertion is on the executed plan: no ShuffleExchange above either
scan of a bucket-aligned sort-merge join.
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def bucketed(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("bucketed_wh"))
    spark.sql("DROP DATABASE IF EXISTS bk CASCADE")
    spark.sql(f"CREATE DATABASE bk LOCATION '{wh}/bk.db'")
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .format("parquet")
        .saveAsTable("bk.b_orders")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .format("parquet")
        .saveAsTable("bk.b_lineitem")
    )
    yield
    spark.sql("DROP DATABASE IF EXISTS bk CASCADE")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    from pyspark.sql import functions as F

    # disable broadcast so the join exercises the bucket-aligned SMJ path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("bk.b_lineitem")
            .join(
                spark.table("bk.b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        rows = joined.collect()
        assert rows  # join produced data
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # no shuffle on the JOIN keys: bucket layout co-locates both
        # sides (the aggregation above the join still shuffles on its own
        # grouping key, which is expected)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "SelectedBucketsCount" in plan  # scans read bucket layout
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_unbucketed(spark, bucketed):
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    expected = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = (
        spark.table("bk.b_lineitem")
        .join(spark.table("bk.b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))
