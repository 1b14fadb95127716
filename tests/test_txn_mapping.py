"""Column mapping (metadata-only rename/drop, format_version 2):
zero-byte renames, no-resurrection drops, pruning/bloom/DV/feed/stream
interplay, and the protocol + guard surfaces."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from gcpde_spark.txn import TxnTable, _mname


def _mk(spark, path, n=200, n_files=4, **kw):
    df = spark.range(n).select(
        F.col("id"), (F.col("id") % 7).cast("string").alias("v")
    )
    return TxnTable.create(spark, str(path), df, key_field="id", n_files=n_files, **kw)


def test_rename_is_metadata_only(spark, tmp_path):
    import pyarrow.parquet as pq

    t = _mk(spark, tmp_path / "t")
    before = {
        p: (tmp_path / "t" / p).stat().st_mtime_ns
        for p in (f["path"] for f in t._manifest()["files"])
    }
    t.rename_column("v", "val")
    m = t._manifest()
    assert m["format_version"] == 2
    assert {f["path"] for f in m["files"]} == set(before)
    for p, mt in before.items():
        assert (tmp_path / "t" / p).stat().st_mtime_ns == mt  # untouched
    # bytes on disk still carry the physical birth name
    phys = pq.read_schema(tmp_path / "t" / next(iter(before)))
    assert "v" in phys.names and "val" not in phys.names
    got = {r.id: r.val for r in t.read().collect()}
    assert got[13] == str(13 % 7) and len(got) == 200
    # time travel to the pre-rename version surfaces the old name
    assert t.read(version=0).columns == ["id", "v"]


def test_rename_key_column_keeps_pruning(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.rename_column("id", "pk")
    res = t.merge(spark.createDataFrame([(7, "X")], "pk long, v string"))
    assert res["rewritten"] == 1 and res["kept"] == 3
    assert t.read(key_range=(7, 7)).first().v == "X"


def test_drop_and_readd_never_resurrects(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.drop_column("v")
    assert t.read().columns == ["id"]
    # re-add the SAME logical name: fresh physical birth name, so the
    # old bytes (still in every data file) can never surface
    t.merge(
        spark.createDataFrame([(1, "fresh")], "id long, v string"),
        merge_schema=True,
    )
    got = {r.id: r.v for r in t.read().collect()}
    assert got[1] == "fresh" and got[2] is None
    mapping = t._manifest()["column_mapping"]
    assert mapping["v"] != "v"  # uuid-suffixed birth name


def test_rename_drop_guards(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("v", "id")
    with pytest.raises(ValueError, match="not in table schema"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="reserved"):
        t.rename_column("v", "_dv_file")
    with pytest.raises(ValueError, match="merge key"):
        t.drop_column("id")
    t.add_constraint("v_set", "v is not null")
    with pytest.raises(ValueError, match="drop_constraint first"):
        t.rename_column("v", "val")
    with pytest.raises(ValueError, match="drop_constraint first"):
        t.drop_column("v")
    t.drop_constraint("v_set")
    t.rename_column("v", "val")  # now allowed
    # constraints on the NEW name enforce through the mapping
    t.add_constraint("val_set", "val is not null")
    with pytest.raises(Exception):
        t.append(spark.createDataFrame([(999, None)], "id long, val string"))


def test_skipping_and_bloom_follow_the_rename(spark, tmp_path):
    df = spark.range(400).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("uid")
    )
    t = TxnTable.create(
        spark, str(tmp_path / "t"), df, key_field="id", n_files=4,
        bloom_cols=("uid",),
    )
    t.rename_column("uid", "doc_uid")
    assert t.bloom_cols() == ["doc_uid"]
    import hashlib

    probe = hashlib.md5(b"9").hexdigest()
    got, scanned, total = t.read_with_receipt(eq={"doc_uid": probe})
    assert scanned < total == 4
    assert [r.id for r in got.collect()] == [9]
    # range skipping on the renamed KEY still prunes at the manifest
    t.rename_column("id", "pk")
    got, scanned, total = t.read_with_receipt(ranges={"pk": (0, 50)})
    assert scanned < total
    assert got.count() == 51


def test_dv_and_mor_under_mapping(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.rename_column("v", "val")
    res = t.delete(F.col("val") == "3", mode="dv")
    assert res["rewritten"] == 0 and res["deleted_rows"] > 0
    assert t.read().where("val = '3'").count() == 0
    res = t.merge(
        spark.createDataFrame([(0, "MOR")], "id long, val string"),
        strategy="mor",
    )
    assert res["rewritten"] == 0 and res["matched_rows"] == 1
    assert t.read().where("id = 0").first().val == "MOR"
    t.compact(n_files=2)
    assert t.read().where("val = '3'").count() == 0


def test_change_feed_refuses_spanning_a_rename(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.append(spark.createDataFrame([(500, "a")], "id long, v string"))  # v1
    t.rename_column("v", "val")  # v2
    t.append(spark.createDataFrame([(501, "b")], "id long, val string"))  # v3
    with pytest.raises(ValueError, match="cannot span a column rename"):
        t.read_changes(0).collect()
    # each segment reads fine under its own names
    seg1 = t.read_changes(0, end_version=1)
    assert "v" in seg1.columns and seg1.count() == 1
    seg2 = t.read_changes(2)
    assert "val" in seg2.columns and seg2.count() == 1


def test_cdf_stream_flows_through_rename(spark, tmp_path):
    from gcpde_spark.cdf_source import register_cdf_source

    t = _mk(spark, tmp_path / "t", n=20, n_files=2)  # v0
    t.rename_column("v", "val")  # v1
    t.append(spark.createDataFrame([(900, "x")], "id long, val string"))  # v2
    register_cdf_source(spark)
    q = (
        spark.readStream.format("txn-cdf")
        .option("path", str(tmp_path / "t"))
        .option("startingVersion", 0)
        .load()
        .writeStream.format("memory")
        .queryName("map_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from map_stream").collect()
    got = {r.id: r.val for r in rows}
    # v0's files surface under the NEW logical name via physical names;
    # the rename commit itself is a logical no-op
    assert got[3] == str(3 % 7) and got[900] == "x" and len(got) == 21


def test_cdf_stream_replays_predrop_history_under_narrowed_schema(
    spark, tmp_path
):
    """A reader created AFTER a drop_column and asked to backfill from
    v0 must emit the pre-drop commits WITHOUT the dropped column (the
    narrowed schema is the table's current contract) instead of
    refusing — the old refusal permanently wedged checkpointed streams
    whose unconsumed region contained a drop (round-5 advisory). Under
    active column mapping the surplus physical column is recognized as
    since-dropped by its absence from the scan-end manifest."""
    from gcpde_spark.cdf_source import register_cdf_source

    t = _mk(spark, tmp_path / "t", n=10, n_files=1)  # v0 carries `v`
    t.drop_column("v")  # v1
    register_cdf_source(spark)
    q = (
        spark.readStream.format("txn-cdf")
        .option("path", str(tmp_path / "t"))
        .option("startingVersion", 0)
        .load()
        .writeStream.format("memory")
        .queryName("drop_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("drop_stream").collect()
    assert {r.id for r in rows} == set(range(10))
    assert "v" not in rows[0].asDict()


def test_clone_restore_and_catalog_carry_mapping(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.rename_column("v", "val")
    c = t.clone(str(tmp_path / "branch"))
    assert c.read().columns == ["id", "val"]
    assert c._manifest()["format_version"] == 2
    # restore to the pre-rename snapshot brings the OLD names back
    t.restore(0)
    assert t.read().columns == ["id", "v"]
    assert t._manifest()["format_version"] == 1  # mapping gone with it


def test_future_reader_gate_on_mapped_tables(spark, tmp_path):
    """A v1-era reader must refuse a mapped manifest — reading the
    logical schema over physical files would surface NULL columns."""
    t = _mk(spark, tmp_path / "t")
    t.rename_column("v", "val")
    m = json.loads(
        (tmp_path / "t" / "_txn_log" / _mname(1)).read_text()
    )
    assert m["format_version"] == 2 and m["column_mapping"]["val"] == "v"
