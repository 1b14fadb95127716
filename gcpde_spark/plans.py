"""Plan auditing: the 100 TB readiness checks from tests/test_plan_quality.py
as a library API, so users can assert them on THEIR queries before
shipping to a cluster (SURVEY.md §2D; no reference counterpart — the
reference delegates planning to BigQuery).

Typical use::

    from gcpde_spark.plans import audit, assert_scales

    report = audit(df)           # inspect the dict
    assert_scales(df)            # raise if a scale-killer is present
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# Node markers in the executed-plan string. Python eval nodes mean
# row-at-a-time (BatchEvalPython) or Arrow-batched (ArrowEvalPython)
# Python in the hot path; Cartesian/BNLJ mean a join with no usable key.
_PYTHON_NODES = ("BatchEvalPython",)
_UNKEYED_JOINS = ("CartesianProduct", "BroadcastNestedLoopJoin")


@dataclass(frozen=True)
class PlanReport:
    """What the physical plan will actually do, distilled to the facts
    that decide whether it survives a 100× scale-up."""

    pushed_filters: bool  # any parquet scan received pushed predicates
    read_schema_cols: int  # columns reaching the widest scan (pruning)
    shuffles: int  # data-moving exchanges (broadcasts excluded)
    broadcasts: int
    python_row_udfs: bool  # BatchEvalPython present
    arrow_udfs: bool  # ArrowEvalPython present (sanctioned, but flagged)
    unkeyed_joins: bool  # cartesian / broadcast-nested-loop present
    codegen_stages: int  # whole-stage codegen span count
    global_windows: int  # Window nodes with an empty partition spec
    # over a child that is not an explicit LIMIT — Spark moves ALL the
    # child's rows into ONE partition for such a window ("WARN
    # WindowExec: No Partition Defined"), the single worst scale
    # hazard a correct plan can hide
    plan: str = field(repr=False, default="")


def _count_global_windows(plan: str) -> int:
    """Count physical ``Window`` nodes with no partition spec whose
    immediate child is not a LIMIT-class node.

    The node prints its non-empty specs as top-level bracket groups:
    ``Window [exprs], [partition], [order]`` — but empty specs are
    omitted, so two groups can be either ``[exprs], [partition]`` or
    ``[exprs], [order]``. Order-spec entries always carry an ``ASC``/
    ``DESC`` direction; partition entries never do — that decides the
    two-group case. A limited child (TakeOrderedAndProject /
    GlobalLimit / CollectLimit) bounds the rows entering the single
    partition, which is the one sanctioned shape (rank-the-top-k).
    Note the optimizer constant-folds literal partition keys away, so
    ``partitionBy(lit(0))`` does NOT evade this check.
    """
    lines = plan.splitlines()
    n = 0
    for i, raw in enumerate(lines):
        stripped = raw.lstrip(" +-*:(0123456789)")
        if not stripped.startswith("Window "):
            continue
        # split the node line into top-level bracket groups
        depth = 0
        groups: list[str] = []
        start = None
        body = stripped[len("Window "):]
        for j, ch in enumerate(body):
            if ch == "[":
                if depth == 0:
                    start = j + 1
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0 and start is not None:
                    groups.append(body[start:j])
                    start = None
        if len(groups) >= 3:
            continue  # exprs + partition + order
        if len(groups) == 2 and not (
            " ASC" in groups[1] or " DESC" in groups[1]
        ):
            continue  # second group is a partition spec (no direction)
        child = lines[i + 1] if i + 1 < len(lines) else ""
        if any(
            m in child
            for m in ("TakeOrderedAndProject", "GlobalLimit", "CollectLimit")
        ):
            continue
        n += 1
    return n


def audit(df: DataFrame) -> PlanReport:
    """Distill ``df``'s executed plan into a :class:`PlanReport`.

    Reads the ADAPTIVE-final plan when AQE has executed; on an
    unexecuted AQE plan the initial plan is audited (join strategies
    may still improve at runtime — re-audit after an action for the
    final word).
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_cols = 0
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            schema_part = line.split("ReadSchema:", 1)[1]
            read_cols = max(read_cols, schema_part.count(":"))
    return PlanReport(
        pushed_filters="PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        read_schema_cols=read_cols,
        shuffles=plan.count("Exchange") - plan.count("BroadcastExchange"),
        broadcasts=plan.count("BroadcastExchange"),
        python_row_udfs=any(n in plan for n in _PYTHON_NODES),
        arrow_udfs="ArrowEvalPython" in plan,
        unkeyed_joins=any(n in plan for n in _UNKEYED_JOINS),
        # the compact plan string marks codegen spans as `*(N)` node
        # prefixes ("WholeStageCodegen" only appears in formatted mode)
        codegen_stages=len(set(re.findall(r"\*\((\d+)\)", plan))),
        global_windows=_count_global_windows(plan),
        plan=plan,
    )


def assert_scales(
    df: DataFrame,
    max_shuffles: int | None = None,
    allow_arrow_udfs: bool = True,
    allow_global_window: bool = False,
) -> PlanReport:
    """Raise ``AssertionError`` naming every scale-killer in ``df``'s
    plan: row-at-a-time Python, unkeyed joins, and (optionally) a
    shuffle budget. Returns the report when clean, so it chains:
    ``report = assert_scales(my_query)``."""
    report = audit(df)
    problems = []
    if report.python_row_udfs:
        problems.append(
            "BatchEvalPython (row-at-a-time Python) in the hot path — "
            "use built-in functions or a pandas_udf"
        )
    if report.arrow_udfs and not allow_arrow_udfs:
        problems.append("ArrowEvalPython present but allow_arrow_udfs=False")
    if report.unkeyed_joins:
        problems.append(
            "cartesian/broadcast-nested-loop join — no usable equi-key; "
            "at scale this is O(N·M)"
        )
    if report.global_windows and not allow_global_window:
        problems.append(
            f"{report.global_windows} unpartitioned Window over a "
            "non-limited child — ALL rows move to one partition; "
            "top-k first (orderBy+limit) or add a partition key. "
            "Pass allow_global_window=True only when the child's "
            "cardinality is bounded by construction"
        )
    if max_shuffles is not None and report.shuffles > max_shuffles:
        problems.append(
            f"{report.shuffles} shuffles exceeds budget {max_shuffles}"
        )
    if problems:
        raise AssertionError("plan does not scale: " + "; ".join(problems))
    return report
