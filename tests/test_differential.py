"""Differential SQL fuzzing: randomly generated queries run as ONE
shared ANSI-SQL text on both Spark and the DuckDB oracle, results
compared bit-exactly.

The fixed corpus (tests/test_corpus.py ≙ the driver gate) proves the
96 declared queries; this file probes the space BETWEEN them — random
conjunctive predicates, grouping sets, HAVING, and a join template —
so a regression in predicate pushdown, null ordering, aggregate
typing, or join semantics that happens to miss every corpus entry
still gets caught. Columns are restricted to int/string/date and
aggregates to COUNT/SUM/MIN/MAX over ints, which both engines compute
bit-exactly — any mismatch is a real bug, never float noise.
"""

from __future__ import annotations

import datetime as dt

import pytest

from tests.conftest import SF_ORACLE
from tests.test_corpus import canon_rows, values_equal


@pytest.fixture(scope="module")
def orders_view(spark):
    spark.read.parquet(f"{SF_ORACLE}/orders.parquet").createOrReplaceTempView(
        "orders"
    )
    spark.read.parquet(
        f"{SF_ORACLE}/customer.parquet"
    ).createOrReplaceTempView("customer")
    yield
    spark.catalog.dropTempView("orders")
    spark.catalog.dropTempView("customer")


def _both(spark, oracle, sql: str):
    s_df = spark.sql(sql)
    s_cols = s_df.columns
    s_rows = [tuple(r) for r in s_df.collect()]
    rel = oracle.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"columns diverged for:\n{sql}"
    a = canon_rows(s_cols, s_rows)
    b = canon_rows(d_cols, d_rows)
    assert len(a) == len(b), f"row count {len(a)} != {len(b)} for:\n{sql}"
    for ra, rb in zip(a, b):
        assert len(ra) == len(rb) and all(
            values_equal(x, y) for x, y in zip(ra, rb)
        ), f"rows diverged for:\n{sql}\n{ra}\n{rb}"


def test_random_filter_aggregates_match_duckdb(spark, oracle, orders_view):
    from hypothesis import given, settings, strategies as st

    ops = st.sampled_from(["<", "<=", "=", ">=", ">", "<>"])
    atom = st.one_of(
        st.tuples(st.just("o_orderkey"), ops, st.integers(1, 60_000)).map(
            lambda t: f"{t[0]} {t[1]} {t[2]}"
        ),
        st.tuples(st.just("o_custkey"), ops, st.integers(1, 1_500)).map(
            lambda t: f"{t[0]} {t[1]} {t[2]}"
        ),
        st.sampled_from(["O", "F", "P"]).map(
            lambda s: f"o_orderstatus = '{s}'"
        ),
        st.lists(
            st.sampled_from(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
            ),
            min_size=1,
            max_size=3,
            unique=True,
        ).map(
            lambda xs: "o_orderpriority IN ("
            + ", ".join(f"'{x}'" for x in xs)
            + ")"
        ),
        st.tuples(
            ops, st.dates(min_value=dt.date(1992, 1, 1),
                          max_value=dt.date(1998, 12, 31))
        ).map(lambda t: f"o_orderdate {t[0]} DATE '{t[1].isoformat()}'"),
        st.tuples(st.integers(1, 50_000), st.integers(0, 10_000)).map(
            lambda t: f"o_orderkey BETWEEN {t[0]} AND {t[0] + t[1]}"
        ),
    )

    @settings(max_examples=20, deadline=None)
    @given(
        atoms=st.lists(atom, max_size=3),
        groups=st.sampled_from(
            [[], ["o_orderstatus"], ["o_orderpriority"],
             ["o_orderstatus", "o_orderpriority"]]
        ),
        having=st.one_of(st.none(), st.integers(1, 100)),
    )
    def check(atoms, groups, having):
        where = f" WHERE {' AND '.join(atoms)}" if atoms else ""
        sel = (", ".join(groups) + ", ") if groups else ""
        sql = (
            f"SELECT {sel}COUNT(*) AS n, SUM(o_orderkey) AS sk, "
            "MIN(o_custkey) AS mn, MAX(o_custkey) AS mx, "
            "COUNT(DISTINCT o_custkey) AS dc "
            f"FROM orders{where}"
        )
        if groups:
            sql += f" GROUP BY {', '.join(groups)}"
            if having is not None:
                sql += f" HAVING COUNT(*) > {having}"
        _both(spark, oracle, sql)

    check()


def test_random_join_aggregates_match_duckdb(spark, oracle, orders_view):
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        nation_lo=st.integers(0, 24),
        width=st.integers(0, 24),
        join=st.sampled_from(["JOIN", "LEFT JOIN"]),
        status=st.one_of(st.none(), st.sampled_from(["O", "F", "P"])),
    )
    def check(nation_lo, width, join, status):
        # LEFT JOIN keeps customers without orders: nulls flow into the
        # aggregate and COUNT(o_orderkey) vs COUNT(*) semantics must
        # agree across engines
        pred = f"c_nationkey BETWEEN {nation_lo} AND {nation_lo + width}"
        on = "c_custkey = o_custkey"
        if status is not None:
            if join == "JOIN":
                pred += f" AND o_orderstatus = '{status}'"
            else:
                on += f" AND o_orderstatus = '{status}'"
        sql = (
            "SELECT c_nationkey, COUNT(o_orderkey) AS n_orders, "
            "COUNT(*) AS n_rows, SUM(o_orderkey) AS sk "
            f"FROM customer {join} orders ON {on} "
            f"WHERE {pred} GROUP BY c_nationkey"
        )
        _both(spark, oracle, sql)

    check()


def test_random_window_functions_match_duckdb(spark, oracle, orders_view):
    """Window fuzzing: partitions/directions/offsets/frames drawn at
    random, ordered by the UNIQUE o_orderkey (or ranked over dates,
    where RANK's tie semantics are deterministic) so both engines are
    fully determined."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        part=st.sampled_from(["o_custkey", "o_orderstatus", "o_orderpriority"]),
        direction=st.sampled_from(["ASC", "DESC"]),
        off=st.integers(1, 3),
        frame=st.integers(0, 5),
        limit=st.integers(500, 5_000),
    )
    def check(part, direction, off, frame, limit):
        sql = (
            "SELECT o_orderkey, o_custkey, "
            f"ROW_NUMBER() OVER (PARTITION BY {part} "
            f"ORDER BY o_orderkey {direction}) AS rn, "
            f"RANK() OVER (PARTITION BY {part} ORDER BY o_orderdate) AS rk, "
            f"LAG(o_orderkey, {off}) OVER (PARTITION BY {part} "
            "ORDER BY o_orderkey) AS lg, "
            f"SUM(o_orderkey) OVER (PARTITION BY {part} ORDER BY o_orderkey "
            f"ROWS BETWEEN {frame} PRECEDING AND CURRENT ROW) AS rs "
            f"FROM orders WHERE o_orderkey <= {limit}"
        )
        _both(spark, oracle, sql)

    check()


def test_random_scalar_expressions_match_duckdb(spark, oracle, orders_view):
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        k=st.integers(1, 8),
        m=st.integers(2, 97),
        lo=st.integers(1, 50_000),
        width=st.integers(0, 2_000),
    )
    def check(k, m, lo, width):
        sql = (
            "SELECT o_orderkey, "
            f"UPPER(SUBSTR(o_orderpriority, 1, {k})) AS a, "
            "LENGTH(o_orderpriority) AS b, "
            f"o_orderkey % {m} AS c, "
            f"CASE WHEN o_orderkey % {m} = 0 THEN 'z' "
            "ELSE o_orderstatus END AS d, "
            "EXTRACT(YEAR FROM o_orderdate) AS y, "
            "o_orderstatus || '-' || o_orderpriority AS e "
            f"FROM orders WHERE o_orderkey BETWEEN {lo} AND {lo + width}"
        )
        _both(spark, oracle, sql)

    check()


def test_random_set_operations_match_duckdb(spark, oracle, orders_view):
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        op=st.sampled_from(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]),
        s1=st.sampled_from(["O", "F", "P"]),
        p=st.sampled_from(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        ),
    )
    def check(op, s1, p):
        sql = (
            f"SELECT o_custkey FROM orders WHERE o_orderstatus = '{s1}' "
            f"{op} "
            f"SELECT o_custkey FROM orders WHERE o_orderpriority = '{p}'"
        )
        _both(spark, oracle, sql)

    check()
