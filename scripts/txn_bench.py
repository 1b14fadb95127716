"""Measured receipt for the TxnTable scale claims (BASELINE.md §txn).

Builds a key-sorted transactional table from sf0.1 ``lineitem``
(600 k rows, 64 files), then times the operations whose cost model the
docstrings promise, reporting BOTH wall seconds and the write
amplification (files rewritten / files total) — at sf0.1 the wall
clock is job-floor-bound (the same decomposition as the main bench),
so the amplification counts are the scale-relevant numbers and the
times show the floor:

- 1-row MERGE, file-pruned (1/64 files) vs pruning disabled (65/65 —
  the cost an unpartitioned parquet merge+swap pays);
- predicate DELETE hitting one file's key range — classic rewrite AND
  deletion-vector mode (zero files rewritten), plus the read-side
  anti-join debt while vectors are outstanding and after compact;
- ``read(ranges=...)`` manifest-skipped vs full-scan-and-filter;
- ``sync_table``: incremental 2-row relay vs re-seeding the mirror;
- materialized-view refresh after a 1-row change (group-scoped,
  base-file-pruned) vs a forced full rebuild.

Plans are warmed before timing (codegen excluded — it is a one-time
cost, measured separately by the main bench). Run ALONE.
"""

from __future__ import annotations

import copy
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from gcpde_spark.session import build_session
from gcpde_spark.txn import TxnTable, _publish, sync_table
from gcpde_spark.views import MaterializedAggView

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_FILES = 64


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main() -> None:
    spark = build_session(
        app_name="txn_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_confs={"spark.ui.enabled": "false"},
    )
    root = Path(tempfile.mkdtemp(prefix="txn_bench_"))
    res: dict = {"sf_dir": SF_DIR, "n_files": N_FILES}
    try:
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
            F.monotonically_increasing_id().alias("rid"),
            F.md5(F.monotonically_increasing_id().cast("string")).alias("uid"),
            "l_orderkey",
            "l_partkey",
            "l_quantity",
            "l_shipdate",
        )
        t, tbl = timed(
            lambda: TxnTable.create(
                spark, str(root / "t"), li, key_field="rid", n_files=N_FILES
            )
        )
        res["create_s"] = round(t, 3)
        res["n_rows"] = sum(f["rows"] for f in tbl._manifest()["files"])
        lo = tbl._manifest()["files"][0]["key_min"]

        one = tbl.read().limit(1).withColumn("l_quantity", F.lit(999.0))
        one.persist().count()
        tbl.merge(one)  # plan warm-up (Janino codegen paid once)
        t, r = timed(lambda: tbl.merge(one))
        res["merge_1row_pruned_s"] = round(t, 3)
        res["merge_1row_rewritten_files"] = r["rewritten"]
        res["merge_1row_kept_files"] = r["kept"]
        # merge-on-read: the same 1-row delta with ZERO file rewrites
        tbl.merge(one, strategy="mor")  # warm the mor plans too
        t, r = timed(lambda: tbl.merge(one, strategy="mor"))
        res["merge_1row_mor_s"] = round(t, 3)
        res["merge_1row_mor_rewritten_files"] = r["rewritten"]
        res["merge_1row_mor_matched_rows"] = r["matched_rows"]
        tbl.compact(n_files=N_FILES)  # clear the vector before later receipts

        t, r = timed(
            lambda: tbl.delete(
                F.col("rid").between(lo + 1_000, lo + 1_050), mode="rewrite"
            )
        )
        res["delete_range_s"] = round(t, 3)
        res["delete_rewritten_files"] = r["rewritten"]
        res["delete_rows"] = r["deleted_rows"]

        # deletion vectors: the same-shape sparse delete rewrites ZERO
        # data files (one positions sidecar instead of a file copy) —
        # then the read-side anti-join debt while vectors are
        # outstanding, and its disappearance after compact clears them
        t, r = timed(
            lambda: tbl.delete(
                F.col("rid").between(lo + 2_000, lo + 2_050), mode="dv"
            )
        )
        res["delete_dv_s"] = round(t, 3)
        res["delete_dv_rewritten_files"] = r["rewritten"]
        res["delete_dv_rows"] = r["deleted_rows"]
        tbl.read().count()  # warm
        t, _ = timed(lambda: tbl.read().count())
        res["read_with_dv_s"] = round(t, 3)
        tbl.compact(n_files=N_FILES)
        tbl.read().count()  # warm
        t, _ = timed(lambda: tbl.read().count())
        res["read_after_compact_s"] = round(t, 3)

        rng = (lo, lo + 5_000)
        tbl.read(ranges={"rid": rng}).count()  # warm
        t, n = timed(lambda: tbl.read(ranges={"rid": rng}).count())
        res["read_skipped_s"] = round(t, 3)
        res["read_skipped_files"] = len(
            tbl.read(ranges={"rid": rng}).inputFiles()
        )
        full_scan = tbl.read().where(F.col("rid").between(*rng))
        full_scan.count()  # warm
        t, n2 = timed(lambda: full_scan.count())
        res["read_full_filter_s"] = round(t, 3)
        res["read_full_files"] = len(tbl.read().inputFiles())
        assert n == n2, (n, n2)

        # bloom point lookup: `uid` is unique per row and files are
        # key-sorted by rid, so every file's uid [min, max] spans the
        # space — range stats prune NOTHING; the per-file bloom admits
        # only the true file (+ FPR stragglers). The enable cost is the
        # one-time backfill read of the indexed column per file.
        t, _ = timed(lambda: tbl.set_bloom_cols(("uid",)))
        res["bloom_enable_backfill_s"] = round(t, 3)
        probe = tbl.read(key_range=(lo + 123, lo + 123)).collect()[0]["uid"]
        _, sc_rng, tot = tbl.read_with_receipt(ranges={"uid": (probe, probe)})
        df_eq, sc_eq, _ = tbl.read_with_receipt(eq={"uid": probe})
        df_eq.count()  # warm
        t, n = timed(lambda: tbl.read(eq={"uid": probe}).count())
        res["bloom_point_lookup_s"] = round(t, 3)
        res["bloom_point_files"] = sc_eq
        res["bloom_rangeonly_files"] = sc_rng
        res["bloom_total_files"] = tot
        assert n == 1, n
        _, sc_absent, _ = tbl.read_with_receipt(eq={"uid": "0" * 32})
        res["bloom_absent_files"] = sc_absent

        t, _ = timed(lambda: sync_table(spark, tbl, str(root / "mirror")))
        res["sync_seed_s"] = round(t, 3)
        tbl.merge(tbl.read().limit(2).withColumn("l_quantity", F.lit(1.0)))
        t, r = timed(lambda: sync_table(spark, tbl, str(root / "mirror")))
        res["sync_incremental_s"] = round(t, 3)
        res["sync_incremental_mode"] = r["mode"]

        # materialized view: incremental group-scoped refresh vs full
        # rebuild. The base uses the layout the view docstring tells
        # adopters to keep — a group-leading composite merge key, so
        # file ranges stay narrow on the group column (refresh prunes)
        # AND on the full key (merge prunes); clustering by the group
        # column alone would scatter the unique key and turn every
        # merge into a many-file rewrite
        vb = TxnTable.create(
            spark,
            str(root / "vb"),
            li,
            key_field=["l_shipdate", "rid"],
            n_files=N_FILES,
        )
        t, view = timed(
            lambda: MaterializedAggView.create(
                spark,
                vb,
                str(root / "v"),
                ["l_shipdate"],
                {"n": "count(1)", "qty": "sum(l_quantity)", "hi": "max(l_quantity)"},
            )
        )
        res["view_build_s"] = round(t, 3)
        touch = vb.read().limit(1).withColumn("l_quantity", F.lit(777.0))
        touch.persist().count()
        vb.merge(touch)
        view.refresh()  # plan warm-up cycle
        vb.merge(touch.withColumn("l_quantity", F.lit(778.0)))
        t, rec = timed(lambda: view.refresh())
        res["view_refresh_incremental_s"] = round(t, 3)
        res["view_refresh_groups"] = rec["groups_refreshed"]
        res["view_refresh_base_files_scanned"] = rec["base_files_scanned"]
        res["view_refresh_base_files_total"] = rec["base_files_total"]
        vb.merge(touch.withColumn("l_quantity", F.lit(779.0)))
        t, rec = timed(lambda: view.refresh(max_incremental_groups=0))
        res["view_refresh_full_s"] = round(t, 3)
        touch.unpersist()

        # LAST (blanked stats would poison later pruning): disable
        # pruning so every file is touched — the full-rewrite baseline
        m2 = copy.deepcopy(tbl._manifest())
        for f in m2["files"]:
            f["key_min"] = f["key_max"] = None
            f.get("stats", {}).pop("rid", None)
        m2["version"] = tbl.version() + 1
        _publish(tbl.path, m2["version"], m2)
        t, r = timed(lambda: tbl.merge(one))
        res["merge_1row_full_s"] = round(t, 3)
        res["merge_1row_full_rewritten_files"] = r["rewritten"]
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
