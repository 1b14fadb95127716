"""The txn-cdf Structured-Streaming source (gcpde_spark/cdf_source.py):
version offsets in the checkpoint, per-added-file partitions, upsert
feed ≡ the batch change feed, loud refusal of row-removing commits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcpde_spark.cdf_source import register_cdf_source
from gcpde_spark.txn import TxnTable


def _mk(spark, path, n=20):
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("v")
    )
    return TxnTable.create(spark, str(path), df, key_field="k", n_files=2)


def _drain(spark, path, name, ckpt=None, starting=None):
    register_cdf_source(spark)
    r = spark.readStream.format("txn-cdf").option("path", str(path))
    if starting is not None:
        r = r.option("startingVersion", starting)
    w = r.load().writeStream.format("memory").queryName(name)
    if ckpt:
        w = w.option("checkpointLocation", str(ckpt))
    q = w.trigger(availableNow=True).start()
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_feed_equals_batch_change_feed(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.merge(spark.createDataFrame([(5, "X"), (99, "NEW")], "k long, v string"))
    t.append(spark.createDataFrame([(200, "a")], "k long, v string"))
    got = {
        (r.k, r.v, r._change_type, r._commit_version)
        for r in _drain(spark, tmp_path / "t", "cdf_eq", starting=0).collect()
    }
    expect = {
        (r.k, r.v, r._change_type, r._commit_version)
        for r in t.read_changes(-1, precise=False).collect()
    }
    assert got == expect and len(got) > 20


def test_checkpoint_restart_resumes_from_committed_version(spark, tmp_path):
    """The exactly-once contract: offsets are table versions in the
    query checkpoint — a restarted stream emits only commits made
    after the last drained one, never re-delivering old versions."""
    t = _mk(spark, tmp_path / "t")
    register_cdf_source(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain_to_parquet():
        q = (
            spark.readStream.format("txn-cdf")
            .option("path", str(tmp_path / "t"))
            .option("startingVersion", 0)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    first = drain_to_parquet()
    assert {r._commit_version for r in first.collect()} == {0}
    t.merge(spark.createDataFrame([(99, "NEW")], "k long, v string"))
    second = drain_to_parquet()
    vs = sorted(
        r._commit_version
        for r in second.select("_commit_version").distinct().collect()
    )
    # the restart appended ONLY version 1 — version 0 was not
    # re-delivered despite startingVersion=0, because the offset in the
    # checkpoint wins
    assert vs == [0, 1]
    n_v0 = second.where("_commit_version = 0").count()
    assert n_v0 == first.count()  # exactly one copy of version 0's rows


def test_default_start_is_latest_and_compact_skipped(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.merge(spark.createDataFrame([(99, "NEW")], "k long, v string"))
    # no startingVersion: follow-on only — the history is not replayed
    assert _drain(spark, tmp_path / "t", "cdf_latest").count() == 0
    t.compact(n_files=2)
    t.append(spark.createDataFrame([(300, "b")], "k long, v string"))
    rows = _drain(spark, tmp_path / "t", "cdf_follow", starting=2).collect()
    # compact (v2) is a logical no-op: only the append's rows surface
    assert {(r.k, r._commit_version) for r in rows} == {(300, 3)}


def test_row_removing_commit_fails_the_stream_loudly(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete(F.col("k") == 3)
    with pytest.raises(Exception, match="DELETE"):
        _drain(spark, tmp_path / "t", "cdf_del", starting=0)


def test_evolved_history_yields_nulls_for_new_columns(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=4)
    t.append(
        spark.createDataFrame([(50, "z", 7)], "k long, v string, extra long"),
        merge_schema=True,
    )
    rows = _drain(spark, tmp_path / "t", "cdf_evo", starting=0).collect()
    by_version = {}
    for r in rows:
        by_version.setdefault(r._commit_version, set()).add((r.k, r.extra))
    assert all(extra is None for _, extra in by_version[0])  # pre-evolution
    assert (50, 7) in by_version[1]


def test_streaming_table_to_table_replication(spark, tmp_path):
    """Source and sink compose into fully streaming replication:
    txn-cdf feed -> upsert_stream_to_txn_table mirror. Within one
    drained batch the sink's latest-per-key window keyed on
    _commit_version resolves multi-version keys, and the checkpoint
    makes follow-up drains incremental."""
    from gcpde_spark.streaming import upsert_stream_to_txn_table

    src = _mk(spark, tmp_path / "src")
    src.merge(spark.createDataFrame([(5, "X"), (99, "NEW")], "k long, v string"))
    register_cdf_source(spark)
    mirror_path = str(tmp_path / "mirror")
    ckpt = str(tmp_path / "ckpt")

    def relay():
        feed = (
            spark.readStream.format("txn-cdf")
            .option("path", str(tmp_path / "src"))
            .option("startingVersion", 0)
            .load()
            .drop("_change_type")
        )
        q = upsert_stream_to_txn_table(
            feed, mirror_path, "k", ckpt,
            available_now=True, ts_col="_commit_version",
        )
        q.awaitTermination(120)

    relay()
    mirror = TxnTable(spark, mirror_path)
    src_rows = {(r.k, r.v) for r in src.read().collect()}
    assert {(r.k, r.v) for r in mirror.read().collect()} == src_rows
    # follow-up commits relay incrementally under the same checkpoint
    src.merge(spark.createDataFrame([(5, "Y"), (300, "b")], "k long, v string"))
    v_before = mirror.version()
    relay()
    assert mirror.version() == v_before + 1
    assert {(r.k, r.v) for r in mirror.read().collect()} == {
        (r.k, r.v) for r in src.read().collect()
    }


def test_mid_stream_schema_evolution_refuses_instead_of_dropping(
    spark, tmp_path
):
    """A commit carrying columns the running stream's schema lacks must
    FAIL the stream (Delta's behavior), not silently emit rows without
    them — the offset would advance and the values would be lost to
    the feed forever. The error says a restart recovers losslessly."""
    t = _mk(spark, tmp_path / "t", n=4)
    register_cdf_source(spark)
    feed = (
        spark.readStream.format("txn-cdf")
        .option("path", str(tmp_path / "t"))
        .option("startingVersion", 0)
        .load()
    )  # schema captured here, BEFORE the evolution lands
    t.append(
        spark.createDataFrame([(50, "z", 7)], "k long, v string, extra long"),
        merge_schema=True,
    )
    q = (
        feed.writeStream.format("memory")
        .queryName("cdf_mid_evo")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="evolved the schema"):
        q.awaitTermination(120)
    # a RESTARTED stream (fresh schema inference) replays everything
    rows = _drain(spark, tmp_path / "t", "cdf_mid_evo2", starting=0).collect()
    assert (50, 7) in {(r.k, r.extra) for r in rows if r._commit_version == 1}


def test_vacuumed_offset_gap_fails_with_guidance(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=4)
    for i in range(3):
        t.merge(spark.createDataFrame([(90 + i, "m")], "k long, v string"))
    t.vacuum(keep_last=1)
    with pytest.raises(Exception, match="vacuumed"):
        _drain(spark, tmp_path / "t", "cdf_vac", starting=1)


def test_commits_mode_emits_one_marker_per_commit_any_op(spark, tmp_path):
    """mode=commits is the commit-log stream: every op surfaces as one
    NULL-data marker row — deletes and compacts included, no refusal,
    no data files read."""
    t = _mk(spark, tmp_path / "t", n=6)
    t.merge(spark.createDataFrame([(99, "NEW")], "k long, v string"))
    t.delete(F.col("k") == 1)
    t.compact(n_files=1)
    register_cdf_source(spark)
    q = (
        spark.readStream.format("txn-cdf")
        .option("path", str(tmp_path / "t"))
        .option("mode", "commits")
        .option("startingVersion", 0)
        .load()
        .writeStream.format("memory")
        .queryName("cdf_commits")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("cdf_commits").collect()
    assert [(r._commit_version, r._change_type) for r in sorted(rows, key=lambda r: r._commit_version)] == [
        (0, "create"), (1, "merge"), (2, "delete"), (3, "compact"),
    ]
    assert all(r.k is None and r.v is None for r in rows)


def test_refresh_view_stream_maintains_the_view_continuously(spark, tmp_path):
    """Continuous maintenance: commits made after view creation —
    including a DELETE, which the upsert feed would refuse — drain as
    triggers and leave the view ≡ a full re-aggregation."""
    from gcpde_spark.views import MaterializedAggView, refresh_view_stream

    base = _mk(spark, tmp_path / "b", n=12)
    view = MaterializedAggView.create(
        spark, base, tmp_path / "v", ["v"], {"n": "count(1)", "hi": "max(k)"}
    )
    # commits AFTER creation, BEFORE the stream starts — must not skip
    base.merge(spark.createDataFrame([(99, "9")], "k long, v string"))
    base.delete(F.col("k") == 0)
    q = refresh_view_stream(view, str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(120)

    def expect():
        return {
            (r.v, r.n, r.hi)
            for r in base.read()
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("n"), F.max("k").alias("hi"))
            .collect()
        }

    assert {tuple(r) for r in view.read().collect()} == expect()
    assert view.staleness() == (base.version(), base.version())
    # second drain under the same checkpoint picks up only new commits
    base.merge(spark.createDataFrame([(100, "0")], "k long, v string"))
    q2 = refresh_view_stream(view, str(tmp_path / "ckpt"), available_now=True)
    q2.awaitTermination(120)
    assert {tuple(r) for r in view.read().collect()} == expect()


def test_clone_create_manifest_applies_deletion_vectors(spark, tmp_path):
    """A clone's version-0 create manifest carries the source's
    deletion-vector references — streaming it from startingVersion=0
    must NOT resurrect the DV-deleted rows (the executor-side pyarrow
    read applies the sidecar positions)."""
    t = _mk(spark, tmp_path / "t")
    t.delete(F.col("k") < 5, mode="dv")
    c = t.clone(str(tmp_path / "branch"))
    assert c.read().count() == 15
    got = {
        r.k
        for r in _drain(
            spark, tmp_path / "branch", "cdf_dv", starting=0
        ).collect()
    }
    assert got == set(range(5, 20))


def test_max_commits_per_batch_caps_steady_state(spark, tmp_path):
    """Rate limiting: after a run's first planned batch, each
    micro-batch advances at most maxCommitsPerBatch versions — commits
    that pile up while the stream is live drain in bounded slices
    instead of one catch-up mega-batch. (The first batch of a run is
    deliberately uncapped: the Python DataSource API hides the
    checkpointed start from latestOffset, and any lower answer would
    WAL a backwards offset — see the module docstring.)"""
    import time

    t = _mk(spark, tmp_path / "t")  # version 0
    register_cdf_source(spark)
    batches: list[tuple[int, list[int]]] = []

    def sink(df, bid):
        vs = sorted(
            r._commit_version
            for r in df.select("_commit_version").distinct().collect()
        )
        batches.append((bid, vs))

    q = (
        spark.readStream.format("txn-cdf")
        .option("path", str(tmp_path / "t"))
        .option("startingVersion", 0)
        .option("maxCommitsPerBatch", 2)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        # wait for the run's first planned batch (the uncapped one) so
        # the appends below are guaranteed to land in LATER batches —
        # otherwise a slow stream start swallows them all into batch 0
        deadline = time.time() + 60
        while time.time() < deadline and not batches:
            time.sleep(0.5)
        assert batches, "stream never produced its first batch"
        # 6 quick appends while the stream is live -> versions 1..6
        for i in range(6):
            t.append(
                spark.range(100 + i, 101 + i).select(
                    F.col("id").alias("k"), F.lit(f"a{i}").alias("v")
                )
            )
        deadline = time.time() + 90
        while time.time() < deadline:
            seen = {v for _, vs in batches for v in vs}
            if seen >= set(range(7)):
                break
            time.sleep(1)
    finally:
        q.stop()
    seen = {v for _, vs in batches for v in vs}
    assert seen == set(range(7)), f"missing versions: {set(range(7)) - seen}"
    # every batch after the run's first planned one is capped at 2
    capped = [vs for _, vs in batches[1:] if vs]
    assert capped, "expected the appends to land after the first batch"
    assert all(len(vs) <= 2 for vs in capped), f"over-cap batch: {batches}"


def test_max_commits_per_batch_guard(spark, tmp_path):
    _mk(spark, tmp_path / "t")
    register_cdf_source(spark)
    with pytest.raises(Exception, match="maxCommitsPerBatch"):
        (
            spark.readStream.format("txn-cdf")
            .option("path", str(tmp_path / "t"))
            .option("maxCommitsPerBatch", 0)
            .load()
            .writeStream.format("memory")
            .queryName("guard_q")
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )


def test_restart_after_drop_column_recovers(spark, tmp_path):
    """The recovery path the drop-column error message promises: a
    reader created AFTER the drop (schema re-inferred, narrowed)
    replaying history that spans the drop must NOT wedge — pre-drop
    commits carry the since-dropped physical column (surplus vs the
    narrowed stream schema) and the drop commit itself is disjoint
    from the stream's columns, so both pass; rows flow without the
    dropped column. A schema ADD the stream missed still refuses
    (covered by test_live_stream_fails_on_drop_column's add sibling)."""
    t = _mk(spark, tmp_path / "t", n=4)  # v0: create with columns k, v
    t.append(spark.createDataFrame([(50, "x")], "k long, v string"))  # v1
    t.drop_column("v")  # v2: metadata-only
    t.append(spark.range(60, 61).select(F.col("id").alias("k")))  # v3
    # reader created post-drop: schema is just (k) + tag columns
    rows = _drain(spark, tmp_path / "t", "cdf_post_drop", starting=0).collect()
    assert "v" not in rows[0].asDict()
    ks = {r.k for r in rows}
    assert {0, 1, 2, 3, 50, 60} <= ks
    versions = {r._commit_version for r in rows}
    assert versions == {0, 1, 3}  # the drop commit emitted nothing


def test_live_stream_fails_on_drop_column(spark, tmp_path):
    """A drop_column landing while a stream runs must FAIL the stream:
    skipping it would make every later commit emit NULL for the dropped
    column under the stream's old schema, and a keyed downstream sink
    would upsert NULL over real values — silent data loss. (Renames
    flow through: physical addressing makes them no-ops.)"""
    from gcpde_spark.cdf_source import _CdfStreamReader

    t = _mk(spark, tmp_path / "t", n=4)
    register_cdf_source(spark)
    feed = (
        spark.readStream.format("txn-cdf")
        .option("path", str(tmp_path / "t"))
        .option("startingVersion", 0)
        .load()
    )  # schema captured with column v, BEFORE the drop
    t.drop_column("v")
    t.append(spark.range(50, 51).select(F.col("id").alias("k")))
    q = (
        feed.writeStream.format("memory")
        .queryName("cdf_drop_live")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="dropped a column"):
        q.awaitTermination(120)
