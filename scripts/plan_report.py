"""Corpus-wide plan audit artifact: run gcpde_spark.plans.audit on every
corpus entry and persist the per-entry PlanReport facts as
PLANS_SELF.json — committed evidence (like CORRECTNESS_SELF.json /
BENCH_SELF.json) that every shipped plan is 100 TB-clean: zero
row-at-a-time Python, zero unpartitioned windows outside the documented
25-row allowlist, filters/projections pushed to the scans, dims
broadcast.

Streaming entries drain a stream at build time, so their BATCH plans
are audited via the equivalent batch aggregation they are hash-checked
against; the streaming execution path itself is covered by
tests/test_streaming.py.

Usage: python scripts/plan_report.py  (~2 min at sf0.001)
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gcpde_spark.plans import audit
from gcpde_spark.queries import CORPUS
from gcpde_spark.session import build_session

SF = "/root/testdata/sf0.001"

# GCPDE_DUP_COLLAPSE=force audits the round-10 duplicate-collapse
# routes (threshold -> 0 so every text operator takes the collapsed
# plan even on the replica-free audit corpus) and writes
# PLANS_SELF_COLLAPSE.json — committed proof that the routed plans
# pass the same 100 TB gate as the direct ones. Default audits the
# shipped auto routes (direct at sf0.001) into PLANS_SELF.json.
FORCE_COLLAPSE = os.environ.get("GCPDE_DUP_COLLAPSE") == "force"
if FORCE_COLLAPSE:
    from gcpde_spark.llm import text as _text_mod

    _text_mod.DUP_COLLAPSE_RATIO = 0.0
OUT_NAME = "PLANS_SELF_COLLAPSE.json" if FORCE_COLLAPSE else "PLANS_SELF.json"

# Entries that drain a Structured Streaming query during build — the
# memory-sink scan they return has no batch plan to audit; their batch
# twins below carry the same aggregation logic.
STREAMING = {
    "c60_streaming_tumbling": "c32_tumbling_window",
    "c67_streaming_sliding": None,
    "c68_streaming_enrich": None,
    "c69_streaming_dedup": None,
    "c70_streaming_sessions": None,
}

# The one sanctioned unpartitioned window: c66 ranks over the 25-row
# nation aggregate (a dimension, not a fact) — see
# tests/test_plan_quality.py GLOBAL_WINDOW_ALLOWLIST.
GLOBAL_WINDOW_ALLOWLIST = {"c66_ratio_to_report"}

# Sanctioned cartesian / broadcast-nested-loop joins (the r5 verdict's
# adjudicated set; mirrored in tests/test_plan_quality.py): c11 IS the
# cross-join entry, c12/c29/l15/l22/l29/l32/l35 broadcast a ONE-ROW
# scalar aggregate, l06 is the by-design exact similarity baseline.
# Any new unkeyed join is a violation — the class regresses silently
# otherwise (the round-4 l27/l33 lesson).
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


def main() -> None:
    spark = build_session(
        app_name="gcpde_spark_plan_report",
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    out: dict[str, dict] = {}
    violations: list[str] = []
    for name, spec in sorted(CORPUS.items()):
        if name in STREAMING:
            out[name] = {"streaming": True, "batch_twin": STREAMING[name]}
            continue
        df = spec.build(spark, SF)
        r = audit(df)
        out[name] = {
            "shuffles": r.shuffles,
            "broadcasts": r.broadcasts,
            "global_windows": r.global_windows,
            "python_row_udfs": r.python_row_udfs,
            "arrow_udfs": r.arrow_udfs,
            "unkeyed_joins": r.unkeyed_joins,
            "codegen_stages": r.codegen_stages,
            "pushed_filters": r.pushed_filters,
        }
        if r.python_row_udfs:
            violations.append(f"{name}: BatchEvalPython")
        if r.global_windows and name not in GLOBAL_WINDOW_ALLOWLIST:
            violations.append(f"{name}: {r.global_windows} global window(s)")
        if r.unkeyed_joins and name not in UNKEYED_JOIN_ALLOWLIST:
            violations.append(f"{name}: unkeyed (cartesian/BNL) join")
    spark.stop()

    audited = [v for v in out.values() if "shuffles" in v]
    summary = {
        "entries": len(out),
        "audited": len(audited),
        "streaming_deferred": len(out) - len(audited),
        "total_shuffles": sum(v["shuffles"] for v in audited),
        "total_broadcasts": sum(v["broadcasts"] for v in audited),
        "entries_with_python_row_udfs": sum(
            1 for v in audited if v["python_row_udfs"]
        ),
        "entries_with_arrow_udfs": sum(1 for v in audited if v["arrow_udfs"]),
        "entries_with_global_windows": sorted(
            k for k, v in out.items() if v.get("global_windows")
        ),
        "global_window_allowlist": sorted(GLOBAL_WINDOW_ALLOWLIST),
        "entries_with_unkeyed_joins": sorted(
            k for k, v in out.items() if v.get("unkeyed_joins")
        ),
        "unkeyed_join_allowlist": sorted(UNKEYED_JOIN_ALLOWLIST),
        "violations": violations,
    }
    payload = {"summary": summary, "plans": out, "sf_dir": SF}
    if FORCE_COLLAPSE:
        payload["dup_collapse"] = "forced (threshold 0)"
    Path(__file__).resolve().parent.parent.joinpath(OUT_NAME).write_text(
        json.dumps(payload, indent=1) + "\n"
    )
    print(json.dumps(summary, indent=1))
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
