"""Transactional copy-on-write tables (gcpde_spark/txn.py): snapshot
isolation, atomic conflict-detecting commits, file-pruned MERGE cost,
time travel, vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gcpde_spark.errors import SchemaMismatchException
from gcpde_spark.txn import (
    ConcurrentCommitError,
    TxnTable,
    TxnTableNotFound,
    _mname,
)


def _mk(spark, path, n=1000):
    df = spark.range(n).select(
        F.col("id"), (F.col("id") % 7).cast("string").alias("v")
    )
    return TxnTable.create(spark, str(path), df, key_field="id")


def test_create_read_roundtrip_and_history(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=100)
    got = {(r.id, r.v) for r in t.read().collect()}
    assert got == {(i, str(i % 7)) for i in range(100)}
    h = t.history()
    assert h[0]["version"] == 0 and h[0]["op"] == "create"
    assert h[0]["n_rows"] == 100
    with pytest.raises(TxnTableNotFound):
        TxnTable(spark, str(tmp_path / "missing"))


def test_merge_updates_inserts_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=10)
    delta = spark.createDataFrame(
        [(3, "UPDATED"), (99, "NEW")], "id long, v string"
    )
    res = t.merge(delta)
    assert res["version"] == 1
    got = {r.id: r.v for r in t.read().collect()}
    assert got[3] == "UPDATED" and got[99] == "NEW" and len(got) == 11
    assert got[4] == "4"  # untouched row intact
    # time travel: version 0 still shows the pre-merge snapshot
    old = {r.id: r.v for r in t.read(version=0).collect()}
    assert old[3] == "3" and 99 not in old and len(old) == 10


def test_merge_rewrites_only_overlapping_files(spark, tmp_path):
    """The scale contract: a 1-key delta into a key-sorted table must
    rewrite only the file(s) whose key range covers it — every other
    data file carries into the new snapshot byte-identical (same path,
    same mtime: copy-on-write, not copy-everything)."""
    df = spark.range(10_000).select(
        F.col("id"), F.col("id").cast("string").alias("v")
    )
    t = TxnTable.create(
        spark, str(tmp_path / "t"), df, key_field="id", n_files=8
    )
    m0 = t._manifest(0)
    assert len(m0["files"]) >= 4  # pruning needs multiple ranged files
    before = {
        f["path"]: os.path.getmtime(tmp_path / "t" / f["path"])
        for f in m0["files"]
    }
    res = t.merge(
        spark.createDataFrame([(5, "X")], "id long, v string")
    )
    assert res["rewritten"] == 1
    assert res["kept"] == len(m0["files"]) - 1
    m1 = t._manifest(1)
    carried = [f["path"] for f in m1["files"] if f["path"] in before]
    assert len(carried) == len(m0["files"]) - 1
    for p in carried:  # carried files untouched on disk
        assert os.path.getmtime(tmp_path / "t" / p) == before[p]
    got = {r.id: r.v for r in t.read().collect()}
    assert got[5] == "X" and got[6] == "6" and len(got) == 10_000


def test_concurrent_commit_single_winner(spark, tmp_path, monkeypatch):
    """Two writers racing to the same version: the os.link publish gives
    exactly one winner; the loser gets ConcurrentCommitError and can
    re-read + re-merge."""
    import gcpde_spark.txn as txn

    t = _mk(spark, tmp_path / "t", n=10)
    # interleave: just before OUR publish of version 1, the rival
    # publishes it first (patch the version resolver to return the
    # stale base the loser actually read)
    real_publish = txn._publish
    log = tmp_path / "t" / "_txn_log"

    def rival_wins_first(root, version, manifest):
        if version == 1 and not (log / _mname(1)).exists():
            (log / _mname(1)).write_text((log / _mname(0)).read_text())
        real_publish(root, version, manifest)

    monkeypatch.setattr(txn, "_publish", rival_wins_first)
    with pytest.raises(ConcurrentCommitError):
        t.merge(spark.createDataFrame([(2, "B")], "id long, v string"))
    # the rival's commit is intact and the loser can retry cleanly
    monkeypatch.setattr(txn, "_publish", real_publish)
    res = t.merge(spark.createDataFrame([(2, "B")], "id long, v string"))
    assert res["version"] == 2
    assert {r.v for r in t.read().collect() if r.id == 2} == {"B"}


def test_merge_with_retry_recovers_from_a_lost_race(spark, tmp_path, monkeypatch):
    """The optimistic loop: lose the commit race once, re-read the
    rival's snapshot, re-apply, win — final table contains BOTH
    writers' deltas with the retrier's rows winning on its keys."""
    import gcpde_spark.txn as txn

    t = _mk(spark, tmp_path / "t", n=10)
    log = tmp_path / "t" / "_txn_log"
    real_publish = txn._publish
    raced = {"done": False}

    def rival_once(root, version, manifest):
        if not raced["done"] and not (log / _mname(version)).exists():
            raced["done"] = True
            # rival commits id=5 -> "RIVAL" at this version first
            rival = TxnTable(spark, str(tmp_path / "t"))
            real_publish_backup = txn._publish
            txn._publish = real_publish
            try:
                rival.merge(
                    spark.createDataFrame([(5, "RIVAL")], "id long, v string")
                )
            finally:
                txn._publish = real_publish_backup
        real_publish(root, version, manifest)

    monkeypatch.setattr(txn, "_publish", rival_once)
    res = t.merge_with_retry(
        spark.createDataFrame([(1, "MINE"), (5, "MINE-5")], "id long, v string")
    )
    monkeypatch.setattr(txn, "_publish", real_publish)
    assert res["version"] == 2  # rival took 1, retry landed on 2
    got = {r.id: r.v for r in t.read().collect()}
    assert got[1] == "MINE" and got[5] == "MINE-5"  # retrier wins its keys
    assert len(got) == 10


def test_merge_schema_gate_and_empty_delta(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=10)
    bad = spark.createDataFrame([(1, 2)], "id long, other long")
    with pytest.raises(SchemaMismatchException):
        t.merge(bad)
    empty = spark.createDataFrame([], "id long, v string")
    res = t.merge(empty)
    assert res == {"version": 0, "rewritten": 0, "kept": res["kept"]}
    assert t.version() == 0  # no new version for a no-op


def test_append_is_rewrite_free_and_compact_restores_pruning(spark, tmp_path):
    """append adds files without touching existing ones (O(delta)
    always); after appends erode the key-range layout, compact rewrites
    one range-sorted snapshot so point-delta merges prune again."""
    df = spark.range(1000).select(
        F.col("id"), F.col("id").cast("string").alias("v")
    )
    t = TxnTable.create(
        spark, str(tmp_path / "t"), df, key_field="id", n_files=4
    )
    before = {f["path"] for f in t._manifest(0)["files"]}
    res = t.append(
        spark.createDataFrame([(2000, "x"), (1, "dup-key-ok")], "id long, v string")
    )
    assert res["version"] == 1 and res["added"] >= 1
    m1 = t._manifest(1)
    assert before <= {f["path"] for f in m1["files"]}  # old files carried
    assert t.read().count() == 1002  # append does NOT dedup (documented)
    # appended file spans the key space -> a point merge now touches it
    # AND the covering created file; compact restores disjoint ranges
    t.compact(n_files=4)
    res2 = t.merge(spark.createDataFrame([(500, "Y")], "id long, v string"))
    assert res2["rewritten"] == 1 and res2["kept"] == 3
    # schema gate applies to append too
    with pytest.raises(SchemaMismatchException):
        t.append(spark.createDataFrame([(1, 1)], "id long, v long"))


def test_vacuum_drops_unreferenced_files_keeps_current(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=1000)
    t.merge(spark.createDataFrame([(1, "A")], "id long, v string"))
    live = {f["path"] for f in t._manifest(1)["files"]}
    deleted = t.vacuum(keep_last=1)
    assert deleted  # the rewritten v0 file is gone
    assert set(deleted).isdisjoint(live)
    # current snapshot still reads fine; the vacuumed one does not
    assert t.read().count() == 1000
    with pytest.raises(Exception):
        t.read(version=0).count()
