"""t2-style correctness: every corpus query vs the DuckDB oracle at sf0.01.

Mirrors the driver's gate (SURVEY.md §5.2): row count + column names +
order-insensitive value comparison, columns sorted by name.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import pytest
from pyspark.sql import functions as F

from gcpde_spark.queries import CORPUS
from tests.conftest import SF_ORACLE


def canon_value(v):
    if isinstance(v, decimal.Decimal):
        return ("num", float(v))
    if isinstance(v, float):
        return ("num", v)
    if isinstance(v, int) and not isinstance(v, bool):
        return ("num", float(v))
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("ts", v.isoformat())
    return (type(v).__name__, v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_value(r[i]) for i in order) for r in rows)


def values_equal(a, b) -> bool:
    if a == b:
        return True
    if isinstance(a, tuple) and isinstance(b, tuple) and a[0] == b[0] == "num":
        x, y = a[1], b[1]
        if x is None or y is None:
            return x is y
        return math.isclose(x, y, rel_tol=0, abs_tol=0)  # exact — bit parity
    return False


@pytest.mark.parametrize("name", sorted(CORPUS))
def test_corpus_query(name, spark, oracle):
    spec = CORPUS[name]
    sdf = spec.build(spark, SF_ORACLE)
    srows = sdf.collect()
    scols = sdf.columns

    if spec.oracle is None:
        assert len(srows) >= 0  # rows-only check, mirroring the driver
        return

    ores = oracle.sql(spec.oracle)
    ocols = [c for c in ores.columns]
    orows = ores.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} != {len(orows)}"

    s_canon = canon_rows(scols, [tuple(r) for r in srows])
    o_canon = canon_rows(ocols, orows)
    mismatches = [
        (i, a, b)
        for i, (a, b) in enumerate(zip(s_canon, o_canon))
        if not all(values_equal(x, y) for x, y in zip(a, b))
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_approx_count_distinct_tolerance(spark, oracle):
    sdf = CORPUS["x01_approx_distinct"].build(spark, SF_ORACLE)
    approx = sdf.collect()[0][0]
    exact = oracle.sql("SELECT COUNT(DISTINCT o_custkey) FROM orders").fetchone()[0]
    assert abs(approx - exact) / exact < 0.05


def test_percentile_approx_tolerance(spark, oracle):
    sdf = CORPUS["x02_percentile_approx"].build(spark, SF_ORACLE)
    approx = sdf.collect()[0][0]
    exact = oracle.sql(
        "SELECT MEDIAN(l_quantity) FROM lineitem"
    ).fetchone()[0]
    assert abs(approx - exact) <= 1


def test_builtin_moments_match_exact_form(spark):
    """Certify Spark's builtin corr()/stddev_samp() against c50's exact
    integer-moment form: same definition, so agreement to ~1e-9 relative
    (the builtins' double accumulators merge in partition order; the
    exact form is order-independent — see ext_corpus.c50)."""
    from gcpde_spark.catalog import load_table

    li = load_table(spark, SF_ORACLE, "lineitem")
    built = (
        li.groupBy("l_returnflag")
        .agg(
            F.corr("l_quantity", "l_discount").alias("corr_b"),
            F.stddev_samp("l_discount").alias("sd_b"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    exact = {
        r["l_returnflag"]: r
        for r in CORPUS["c50_stats_moments"].build(spark, SF_ORACLE).collect()
    }
    for r in built:
        e = exact[r["l_returnflag"]]
        # c50's outputs are rounded to 6dp, so compare at that granularity
        assert math.isclose(r["corr_b"], e["corr_qty_disc"], abs_tol=1e-6)
        assert math.isclose(r["sd_b"], e["stddev_disc"], abs_tol=1e-6)


def test_hll_sketch_rollup_error_bound_and_associativity(spark):
    """The x10 sketch pipeline: per-region estimates within 5% of the
    exact distinct, and union-of-partial-sketches estimates the same
    cardinality as one direct sketch (mergeability — the property that
    makes sketches re-aggregable along any rollup path)."""
    from gcpde_spark.catalog import load_table

    rows = CORPUS["x10_hll_sketch_rollup"].build(spark, SF_ORACLE).collect()
    assert len(rows) == 5
    for r in rows:
        assert abs(r.est_distinct - r.exact_distinct) <= 0.05 * r.exact_distinct

    cust = load_table(spark, SF_ORACLE, "customer")
    merged = (
        cust.groupBy("c_nationkey")
        .agg(F.expr("hll_sketch_agg(c_custkey)").alias("sk"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
        .collect()[0]["est"]
    )
    direct = cust.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(c_custkey))").alias("est")
    ).collect()[0]["est"]
    assert abs(merged - direct) <= 0.02 * max(direct, 1)


def test_count_min_sketch_overestimates_only(spark):
    """count_min_sketch: point estimates are never BELOW the true count
    (CMS guarantee) and stay within eps·N above it."""
    df = spark.range(2000).selectExpr("id % 10 AS g")
    blob = bytes(
        df.agg(
            F.expr("count_min_sketch(g, 0.001d, 0.99d, 42)").alias("s")
        ).collect()[0]["s"]
    )
    jvm = spark._jvm
    sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(blob)
    )
    for g in range(10):
        est = sk.estimateCount(jvm.java.lang.Long(g))
        assert 200 <= est <= 200 + int(0.001 * 2000) + 1, (g, est)
