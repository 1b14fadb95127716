"""Per-file Bloom indexing on TxnTable (the Delta/Iceberg bloom-index
analog): point-lookup pruning where min/max stats can't help, config
riding the rolled commit meta through every verb, type guards, and
soundness (exact rows after pruning, NULL semantics)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gcpde_spark.txn import TxnTable


def _mk_uid_table(spark, path, n=4000, n_files=8, **kw):
    """Key-sorted files whose NON-key `uid` column (md5 of id) is
    uniformly distributed — every file's [min, max] spans the space,
    so range stats alone can never prune a uid point lookup."""
    df = spark.range(n).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("uid")
    )
    return TxnTable.create(
        spark, str(path), df, key_field="id", n_files=n_files, **kw
    )


def _uid(i: int) -> str:
    import hashlib

    return hashlib.md5(str(i).encode()).hexdigest()


def test_bloom_point_lookup_prunes_where_ranges_cannot(spark, tmp_path):
    t = _mk_uid_table(spark, tmp_path / "t", bloom_cols=("uid",))
    # range-only probe: every file overlaps, nothing prunes
    _, scanned, total = t.read_with_receipt(ranges={"uid": (_uid(7), _uid(7))})
    assert total == 8 and scanned == 8
    # bloom probe: only the true file (+ ≤1% FPR stragglers) survives
    df, scanned, total = t.read_with_receipt(eq={"uid": _uid(7)})
    assert scanned < total
    rows = df.collect()
    assert [(r.id, r.uid) for r in rows] == [(7, _uid(7))]
    # absent value: expected scan count ~ total * fpp ≈ 0.08
    df, scanned, _ = t.read_with_receipt(eq={"uid": "0" * 32})
    assert scanned <= 2
    assert df.count() == 0


def test_bloom_config_rides_every_verb(spark, tmp_path):
    t = _mk_uid_table(spark, tmp_path / "t", n=800, bloom_cols=("uid",))
    assert t.bloom_cols() == ["uid"]
    # merge: the new file gets a filter without merge knowing the feature
    delta = spark.range(800, 900).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("uid")
    )
    t.merge(delta)
    assert all("bloom" in e for e in t._manifest()["files"])
    df, scanned, total = t.read_with_receipt(eq={"uid": _uid(850)})
    assert scanned < total
    assert df.count() == 1
    # compact rewrites -> fresh filters, lookups still exact
    t.compact(n_files=4)
    df, scanned, total = t.read_with_receipt(eq={"uid": _uid(123)})
    assert scanned < total if total > 1 else scanned == total
    assert [r.id for r in df.collect()] == [123]


def test_bloom_enable_backfills_existing_files(spark, tmp_path):
    t = _mk_uid_table(spark, tmp_path / "t", n=800)
    assert t.bloom_cols() == []
    assert all("bloom" not in e for e in t._manifest()["files"])
    t.set_bloom_cols(("uid",))
    assert t.bloom_cols() == ["uid"]
    assert all((e.get("bloom") or {}).get("uid") for e in t._manifest()["files"])
    df, scanned, total = t.read_with_receipt(eq={"uid": _uid(11)})
    assert scanned < total
    assert df.count() == 1
    # disable: config off (old filters stay on old entries — immutable
    # files keep valid filters), new writes build none
    t.set_bloom_cols(())
    assert t.bloom_cols() == []
    t.append(
        spark.range(800, 810).select(
            F.col("id"), F.md5(F.col("id").cast("string")).alias("uid")
        )
    )
    new_entry = t._manifest()["files"][-1]
    assert "bloom" not in new_entry or new_entry["bloom"] == {}


def test_bloom_int_date_timestamp_tags(spark, tmp_path):
    rows = [
        (i, dt.date(2024, 1, 1 + i % 28), dt.datetime(2024, 1, 1, i % 24))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id bigint, d date, ts timestamp_ntz")
    t = TxnTable.create(
        spark,
        str(tmp_path / "t"),
        df,
        key_field="id",
        n_files=4,
        bloom_cols=("id", "d", "ts"),
    )
    got, _, _ = t.read_with_receipt(eq={"id": 42})
    assert [r.id for r in got.collect()] == [42]
    got = t.read(eq={"d": dt.date(2024, 1, 9)})
    assert got.count() == sum(1 for _, d, _ in rows if d == dt.date(2024, 1, 9))
    got = t.read(eq={"ts": dt.datetime(2024, 1, 1, 5)})
    assert got.count() == sum(
        1 for _, _, ts in rows if ts == dt.datetime(2024, 1, 1, 5)
    )


def test_bloom_guards(spark, tmp_path):
    df = spark.range(10).select(
        F.col("id"), (F.col("id") * 1.5).alias("x"), F.lit("a").alias("s")
    )
    with pytest.raises(ValueError, match="unsupported type"):
        TxnTable.create(
            spark, str(tmp_path / "t0"), df, key_field="id", bloom_cols=("x",)
        )
    t = TxnTable.create(spark, str(tmp_path / "t1"), df, key_field="id")
    with pytest.raises(ValueError, match="not in table schema"):
        t.set_bloom_cols(("nope",))
    with pytest.raises(ValueError, match="unsupported type"):
        t.set_bloom_cols(("x",))
    with pytest.raises(ValueError, match="fpp"):
        t.set_bloom_cols(("s",), fpp=0.9)
    t.set_bloom_cols(("s",))
    with pytest.raises(ValueError, match="NULL"):
        t.read(eq={"s": None})


def test_bloom_null_only_file_prunes_soundly(spark, tmp_path):
    # file 1: real tags; file 2: all-NULL tags -> empty filter, so an eq
    # probe proves absence and prunes it; NULL rows never match eq
    a = spark.range(100).select(F.col("id"), F.lit("hit").alias("tag"))
    b = spark.range(100, 200).select(
        F.col("id"), F.lit(None).cast("string").alias("tag")
    )
    t = TxnTable.create(
        spark,
        str(tmp_path / "t"),
        a.unionByName(b),
        key_field="id",
        n_files=2,
        bloom_cols=("tag",),
    )
    df, scanned, total = t.read_with_receipt(eq={"tag": "hit"})
    assert total == 2 and scanned == 1
    assert df.count() == 100
    df, scanned, _ = t.read_with_receipt(eq={"tag": "miss"})
    assert scanned == 0 and df.count() == 0


def test_bloom_reenable_backfills_new_columns(spark, tmp_path):
    """Per-column backfill: switching the indexed column set must build
    filters for the NEW columns on existing files (the first
    implementation skipped any entry that already had a bloom dict,
    so re-enables silently never indexed old files)."""
    df = spark.range(400).select(
        F.col("id"),
        F.md5(F.col("id").cast("string")).alias("a"),
        F.sha1(F.col("id").cast("string")).alias("b"),
    )
    t = TxnTable.create(
        spark, str(tmp_path / "t"), df, key_field="id", n_files=4,
        bloom_cols=("a",),
    )
    t.set_bloom_cols(("b",))  # switch columns entirely
    import hashlib

    probe = hashlib.sha1(b"7").hexdigest()
    got, scanned, total = t.read_with_receipt(eq={"b": probe})
    assert scanned < total == 4  # the re-enable indexed b on OLD files
    assert [r.id for r in got.collect()] == [7]
    # the old column's filters survive on the entries (immutable files)
    assert all(
        (e.get("bloom") or {}).get("a") and (e.get("bloom") or {}).get("b")
        for e in t._manifest()["files"]
    )


def test_eq_intersects_with_overlapping_range_requests(spark, tmp_path):
    """eq + key_range/ranges on the same column must intersect, not
    silently replace each other — the first implementation pruned by eq
    while row-filtering by the range, returning rows that satisfied
    neither request."""
    t = _mk_uid_table(spark, tmp_path / "t", n=2000, bloom_cols=("uid",))
    # eq on the KEY plus a wide key_range: intersection is the point
    df, scanned, total = t.read_with_receipt(
        eq={"id": 7}, key_range=(0, 1999)
    )
    rows = df.collect()
    assert [r.id for r in rows] == [7]
    assert scanned < total  # the point still prunes at the manifest
    # eq outside the range: empty intersection, zero rows, no error
    assert t.read(eq={"id": 7}, key_range=(100, 1999)).count() == 0
    # eq + ranges on a non-key column intersect the same way
    u = _uid(7)
    assert t.read(eq={"uid": u}, ranges={"uid": (u, u)}).count() == 1
    assert t.read(eq={"uid": u}, ranges={"uid": ("z", None)}).count() == 0
