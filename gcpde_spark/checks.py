"""Data-quality constraint checks — the pre-training QA gate.

A check is ``(name, predicate Column)`` where the predicate is TRUE for
VIOLATING rows. ``run_checks`` evaluates every check in ONE aggregation
pass over the table (each check is a conditional count inside the same
hash-agg — no per-check scans), so the cost at 100 TB is a single
table read regardless of how many constraints are registered.

Uniqueness and referential integrity need their own shuffles (a
group-by and an anti-join respectively) and are exposed as dedicated
helpers returning violation counts; compose their outputs with the
single-pass report as needed.

No reference counterpart (gcpde validates only schema shape on insert,
gcpde/bq.py:488-520); this is the §2D extension a corpus pipeline uses
to refuse bad snapshots before they reach training.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return (f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    c = F.col(col)
    return (
        f"in_range({col},{lo},{hi})",
        c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def accepted_values(col: str, values: list) -> tuple[str, Column]:
    c = F.col(col)
    return (
        f"accepted_values({col})",
        c.isNotNull() & ~c.isin(values),
    )


def matches(col: str, pattern: str) -> tuple[str, Column]:
    c = F.col(col)
    return (
        f"matches({col})",
        c.isNotNull() & ~c.rlike(pattern),
    )


def run_checks(df: DataFrame, checks: list[tuple[str, Column]]) -> DataFrame:
    """Evaluate row-level checks in one aggregation pass. Returns
    ``(check: string, n_violations: bigint, n_rows: bigint)`` — one row
    per check, plus the table cardinality for rate computation. All
    conditional counts live in the same hash-agg buffer, so the plan is
    one scan + one (1-row) aggregate regardless of check count.
    """
    if not checks:
        raise ValueError("run_checks requires at least one check")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n_rows")] + [
        F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias(f"_c{i}")
        for i, (_, pred) in enumerate(checks)
    ]
    row = df.agg(*aggs)
    # names enter as literal Columns, never interpolated into SQL text —
    # a quote (or anything else) in a custom check name stays data
    entries = []
    for i, (name, _) in enumerate(checks):
        entries.extend([F.lit(name), F.col(f"_c{i}")])
    return row.select(
        F.explode(F.create_map(*entries)).alias("check", "n_violations"),
        F.col("_n_rows").alias("n_rows"),
    )


def unique_violations(df: DataFrame, cols: list[str]) -> int:
    """Rows beyond the first per key — 0 means the key is unique. One
    group-by shuffle on the key."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("v"))
        .collect()[0]["v"]
    )


def referential_violations(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> int:
    """Child rows whose key has no parent — 0 means the FK holds. One
    anti-join (broadcast when the parent key set is small)."""
    keys = parent.select(F.col(parent_col).alias(child_col)).distinct()
    return (
        child.where(F.col(child_col).isNotNull())
        .join(keys, child_col, "left_anti")
        .count()
    )
