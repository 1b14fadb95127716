"""Data-quality checks (gcpde_spark/checks.py): single-pass report,
uniqueness, referential integrity."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcpde_spark import checks as ck


def test_run_checks_counts_planted_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A", "a@x.io"),
            (2, None, "N", "bad"),
            (3, 99.0, "Z", "c@y.io"),
            (4, -1.0, "R", None),
        ],
        "id long, v double, flag string, email string",
    )
    rep = {
        r["check"]: (r["n_violations"], r["n_rows"])
        for r in ck.run_checks(
            df,
            [
                ck.not_null("v"),
                ck.in_range("v", 0, 50),
                ck.accepted_values("flag", ["A", "N", "R"]),
                ck.matches("email", r"^[^@]+@[^@]+$"),
            ],
        ).collect()
    }
    assert rep["not_null(v)"] == (1, 4)
    assert rep["in_range(v,0,50)"] == (2, 4)      # 99.0 and -1.0; NULL exempt
    assert rep["accepted_values(flag)"] == (1, 4)  # "Z"
    assert rep["matches(email)"] == (1, 4)         # "bad"; NULL exempt


def test_run_checks_is_one_scan_one_aggregate(spark):
    df = spark.range(100).select(F.col("id").alias("v"))
    plan = (
        ck.run_checks(df, [ck.not_null("v"), ck.in_range("v", 0, 10)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # N checks share one aggregate — exactly one scan source node
    assert plan.count("Range (0, 100") == 1
    assert "BatchEvalPython" not in plan


def test_run_checks_quoted_names_and_empty_list(spark):
    """ADVICE r4: check names are data, not SQL text — a single quote in
    a custom check name must survive verbatim; an empty list raises
    instead of building an invalid map()."""
    import pytest

    df = spark.createDataFrame([(1,), (None,)], "v int")
    name = "custom 'quoted' check"
    rep = {
        r["check"]: r["n_violations"]
        for r in ck.run_checks(df, [(name, F.col("v").isNull())]).collect()
    }
    assert rep[name] == 1
    with pytest.raises(ValueError):
        ck.run_checks(df, [])


def test_unique_and_referential_violations(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, None)],
        "id long, fk long",
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    assert ck.unique_violations(child, ["id"]) == 0
    assert ck.unique_violations(child, ["fk"]) == 1  # fk=10 twice
    # fk=99 dangles; NULL fk is exempt (SQL FK semantics)
    assert ck.referential_violations(child, "fk", parent, "pk") == 1
