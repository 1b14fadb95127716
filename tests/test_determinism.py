"""Partition-count invariance: the corpus's exact-numerics discipline
(integer cents / power sums / micro-nat quantization) claims results
are independent of physical partitioning. Test it mechanically: build
representative entries under very different shuffle-partition settings
and require EXACTLY equal rows — any hidden double-accumulation
order-dependence breaks equality immediately.
"""

from __future__ import annotations

import pytest

from gcpde_spark.queries import CORPUS
from tests.conftest import SF_ORACLE

# One entry per numeric discipline: power sums (c50), integer cents
# (c66), micro-nat ln quantization (l35), quantized vector sums (l30),
# exact z-score rearrangement (l34), micro-unit cosine ranking (l33).
ENTRIES = [
    "c50_stats_moments",
    "c66_ratio_to_report",
    "l35_psi_drift",
    "l30_label_centroids",
    "l34_outlier_days",
    "l33_profile_neighbors",
]


@pytest.mark.parametrize("name", ENTRIES)
def test_result_invariant_under_partitioning(spark, name):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = [tuple(r) for r in CORPUS[name].build(spark, SF_ORACLE).collect()]
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = [tuple(r) for r in CORPUS[name].build(spark, SF_ORACLE).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b, f"{name}: result depends on partitioning"
