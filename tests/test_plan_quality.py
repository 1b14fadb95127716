"""Plan-quality assertions (SURVEY.md §4): the scale claims made in the
corpus docstrings, checked against the actual physical plans — filters
and projections reach the parquet scan, small dims broadcast, no
row-at-a-time Python appears in any relational plan.
"""

from __future__ import annotations

from gcpde_spark.queries import CORPUS

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return (
        CORPUS[name]
        .build(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_c01_pushes_filter_and_prunes_columns(spark):
    plan = _plan(spark, "c01_scan_filter_project")
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters")[1][:200]
    # projection pruning: the scan must not read all 16 lineitem columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema
    assert "l_extendedprice" not in read_schema


def test_c06_broadcasts_every_dimension(spark):
    plan = _plan(spark, "c06_three_way_join_agg")
    # at this SF every join side under lineitem is broadcast — zero
    # shuffles below the aggregation
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_c03_aggregates_partially_map_side(spark):
    plan = _plan(spark, "c03_agg_group_having")
    assert "partial_count" in plan or "partial" in plan.lower()


def test_no_python_row_udfs_in_relational_plans(spark):
    """BatchEvalPython = row-at-a-time Python; ArrowEvalPython is the
    sanctioned vectorized path. Neither belongs in a relational plan."""
    for name in ("c01_scan_filter_project", "c06_three_way_join_agg",
                 "c15_window_rank", "c29_merge_upsert"):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_whole_stage_codegen_covers_scan_and_agg(spark):
    # codegen spans only appear in the FINAL adaptive plan — execute first
    df = CORPUS["c03_agg_group_having"].build(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # drop the pre-AQE echo
    # '*(N)' prefixes mark WholeStageCodegen stages in the final plan;
    # both the scan-side partial agg and the final agg must be inside one
    agg_lines = [ln for ln in final.splitlines() if "HashAggregate" in ln]
    assert agg_lines and all("*(" in ln for ln in agg_lines)


def test_curation_pipeline_plan_stays_compact(spark):
    """Regression guard for the round-3 compile-blowup fix: without the
    materialized-columns-below-the-window structure, CollapseProject +
    filter pushdown re-inline the normalization regex and token split at
    every use site (observed: 31 split / 46 regexp_replace copies, ~6 s
    per-build codegen for 0.08 s of execution). The optimized plan must
    keep one split and a bounded handful of regex nodes."""
    import re

    plan = _plan(spark, "l14_curation_pipeline")
    assert len(re.findall(r"split\(", plan)) <= 2, "token split re-inlined"
    assert len(re.findall(r"regexp_replace", plan)) <= 8, "normalization re-inlined"
    assert "lambdafunction" not in plan, "interpreted HOF in the hot path"


def test_money_aggregates_stay_on_long_path(spark):
    """Regression guard for the round-4 cents refactor: a money SUM that
    re-acquires a DECIMAL input falls off the compact-long aggregation
    path onto per-row BigDecimal adds (measured 5x slower). The hot
    aggregates must sum BIGINT cents; decimal may appear only in c06's
    bounded merge of per-partition partials."""
    for name in ("c03_agg_group_having", "c31_events_group", "c47_histogram"):
        plan = _plan(spark, name)
        assert "sum(cast(round(" in plan.lower() or "as bigint" in plan.lower(), name
        for line in plan.splitlines():
            low = line.lower()
            if "partial_sum" in low or "sum(" in low and "hashaggregate" in low:
                assert "decimal(28" not in low and "decimal(18,2))" not in low, (
                    name, line.strip()[:160]
                )


def test_c26_try_cast_is_guarded(spark):
    """Regression guard for the round-4 exception fix: the TRY_CAST must
    sit under the RLIKE digits guard (CaseWhen), never bare over the
    concat — a bare try_cast catches a JVM exception per malformed row
    (~25% of lineitem), 40x the scan cost."""
    plan = _plan(spark, "c26_scalar_case_cast")
    low = plan.lower()
    assert "rlike" in low or "regexp" in low
    # the guard and the cast appear in the same projection expression
    proj = [ln for ln in plan.splitlines() if "Project" in ln or "project" in ln]
    assert proj


def test_new_llm_entries_have_no_python_and_bounded_shuffles(spark):
    """Round-4 additions stay on the codegen path: no Python eval nodes,
    and shuffle counts at the algorithmic minimum (l21 is a pure
    projection — zero exchanges)."""
    for name, max_exchanges in (
        ("l17_decontaminate", 7),   # 2 shingle windows + 2 distincts +
                                    # join + agg + presentation sort
        ("l18_dedup_keep", 2),      # one md5 window
        ("l21_html_strip", 2),      # chained regexp projection; the two
                                    # exchanges are the spread() fan-out
                                    # (small-scan parallelism) and the
                                    # presentation sort
        ("l22_unigram_logprob", 8), # one tf agg + term window + scalar
                                    # total + doc agg + NULL-text join
                                    # + presentation sort
        ("l23_paragraph_dedup", 4), # first-occurrence window + reassembly
    ):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        n_ex = plan.count("Exchange") - plan.count("BroadcastExchange")
        assert n_ex <= max_exchanges, f"{name}: {n_ex} shuffles"


def test_ext_entries_stay_on_codegen_path(spark):
    """c55 is a pure in-row HOF projection (no shuffle beyond the
    presentation sort); c50/c54 are single map-side-combinable hash
    aggregates; c56's spine+fill stays within join/window exchanges; l30
    is one explode feeding one keyed aggregate. None touch Python."""
    for name, max_exchanges in (
        ("c50_stats_moments", 2),   # agg + presentation sort
        ("c54_argminmax", 2),       # agg + presentation sort
        ("c55_array_hofs", 2),      # spread fan-out + presentation sort
        ("c56_gapfill", 5),         # daily agg, span agg, join, window, sort
        ("l30_label_centroids", 2), # (label,dim) agg + presentation sort
    ):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        n_ex = plan.count("Exchange") - plan.count("BroadcastExchange")
        assert n_ex <= max_exchanges, f"{name}: {n_ex} shuffles"


def test_c50_aggregates_partially_map_side(spark):
    plan = _plan(spark, "c50_stats_moments")
    # partial_ aggregate functions below the exchange = map-side combine
    assert plan.count("partial_") >= 1


# Entries whose single-partition window is justified by a child whose
# cardinality is bounded BY CONSTRUCTION (not by the data): c66 ranks
# over the 25-row nation aggregate (one row per nation — a dimension,
# not a fact). Everything else must have zero unpartitioned windows —
# the l27 bug class (round-4 verdict finding #1). c65 left this list
# in round 5: its numbering now comes from operators.with_ordered_index
# instead of a data-sized global window.
GLOBAL_WINDOW_ALLOWLIST = {"c66_ratio_to_report"}

# Streaming entries drain a stream at build time — their batch rollup
# plans are covered by their own parity tests; skip the rebuild here.
STREAMING_ENTRIES = {
    "c60_streaming_tumbling",
    "c67_streaming_sliding",
    "c68_streaming_enrich",
    "c69_streaming_dedup",
    "c70_streaming_sessions",
}


# Entries whose cartesian / broadcast-nested-loop join is justified BY
# CONSTRUCTION (the r5 verdict's adjudicated set): c11 IS the cross-join
# entry; c12/c29/l15/l22/l29/l32/l35 cross-join a ONE-ROW scalar
# aggregate (a broadcast of a single row, not an O(N·M) pairing); l06
# is the by-design exact brute-force cosine baseline whose scale routes
# are x05/x07. Any OTHER corpus entry planning an unkeyed join fails —
# the l27/l33 lesson from round 4 is that unflagged plan classes
# regress silently.
UNKEYED_JOIN_ALLOWLIST = {
    "c11_cross_join",
    "c12_scalar_subquery",
    "c29_merge_upsert",
    "l06_embedding_topk",
    "l15_tfidf",
    "l22_unigram_logprob",
    "l29_quality_select",
    "l32_bm25_topk",
    "l35_psi_drift",
}


def test_no_corpus_entry_has_an_unkeyed_join(spark):
    """No corpus entry outside the adjudicated allowlist may plan a
    CartesianProduct or BroadcastNestedLoopJoin — with no usable
    equi-key the join is O(N·M) at exactly the scale the corpus claims
    to survive. Detection lives in plans.audit (unkeyed_joins) so user
    queries get the same check via assert_scales."""
    from gcpde_spark.plans import _UNKEYED_JOINS

    offenders = []
    for name in CORPUS:
        if name in STREAMING_ENTRIES or name in UNKEYED_JOIN_ALLOWLIST:
            continue
        plan = _plan(spark, name)
        if any(n in plan for n in _UNKEYED_JOINS):
            offenders.append(name)
    assert not offenders, f"unkeyed join in: {offenders}"


def test_planted_cross_join_fails_the_gate(spark):
    """The gate actually fires: a corpus-shaped entry that cross-joins
    two fact tables must be caught by the same detection the corpus
    sweep and plan_report use."""
    import pytest

    from gcpde_spark.plans import assert_scales

    a = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey")
    b = spark.read.parquet(f"{SF}/customer.parquet").select("c_custkey")
    with pytest.raises(AssertionError, match="cartesian|nested-loop"):
        assert_scales(a.crossJoin(b))


def test_no_corpus_entry_has_a_global_window(spark):
    """No corpus entry may plan a Window with an empty partition spec
    over a non-limited child — that moves the entire child into ONE
    partition at exactly the scale the operator exists for. Detection
    lives in plans.audit (global_windows) so user queries get the same
    check via assert_scales."""
    from gcpde_spark.plans import _count_global_windows

    offenders = {}
    for name in CORPUS:
        if name in STREAMING_ENTRIES or name in GLOBAL_WINDOW_ALLOWLIST:
            continue
        n = _count_global_windows(_plan(spark, name))
        if n:
            offenders[name] = n
    assert not offenders, f"unpartitioned WindowExec in: {offenders}"
