"""Incrementally-maintained materialized aggregate views
(gcpde_spark/views.py): group-scoped recompute from the precise change
feed ≡ full re-aggregation, preimage-driven group migration, vanished
groups, base-file pruning receipts, exactly-once version tracking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcpde_spark.txn import TxnTable
from gcpde_spark.views import MaterializedAggView

AGGS = {
    "n": "count(1)",
    "total": "sum(x)",
    "lo": "min(x)",
    "hi": "max(x)",
    "n_keys": "count(distinct k)",
}


def _base(spark, path, n=60):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 6).cast("string").alias("g"),
        (F.col("id") * 10).cast("long").alias("x"),
    )
    return TxnTable.create(spark, str(path), df, key_field="k")


def _expect(base, group_by=("g",)):
    return {
        tuple(r)
        for r in base.read()
        .groupBy(*group_by)
        .agg(*[F.expr(s).alias(n) for n, s in AGGS.items()])
        .collect()
    }


def _got(view):
    return {tuple(r) for r in view.read().collect()}


def test_preimage_feed_and_apply_changes_ignores_it(spark, tmp_path):
    t = _base(spark, tmp_path / "t", n=10)
    t.update({"x": F.lit(999)}, F.col("k") == 3)
    plain = t.read_changes(0, precise=True).collect()
    assert {r._change_type for r in plain} == {"update_postimage"}
    both = t.read_changes(0, precise=True, preimages=True).collect()
    by_type = {r._change_type: r for r in both}
    assert set(by_type) == {"update_preimage", "update_postimage"}
    assert by_type["update_preimage"].x == 30  # the OLD value
    assert by_type["update_postimage"].x == 999
    assert (
        by_type["update_preimage"]._commit_version
        == by_type["update_postimage"]._commit_version
    )
    with pytest.raises(ValueError):
        t.read_changes(0, preimages=True)  # precise=False
    # a preimage-carrying feed applies identically to a preimage-free one
    mirror = TxnTable.create(
        spark, str(tmp_path / "m"), t.read(version=0), key_field="k"
    )
    mirror.apply_changes(t.read_changes(0, precise=True, preimages=True))
    assert {(r.k, r.x) for r in mirror.read().collect()} == {
        (r.k, r.x) for r in t.read().collect()
    }


def test_create_matches_full_groupby_and_reopen(spark, tmp_path):
    base = _base(spark, tmp_path / "b")
    v = MaterializedAggView.create(
        spark, base, tmp_path / "v", ["g"], AGGS
    )
    assert _got(v) == _expect(base)
    # reopen from disk: spec round-trips through commit metadata
    again = MaterializedAggView(spark, base, tmp_path / "v")
    assert again.group_by == ["g"] and again.aggs == AGGS
    assert _got(again) == _expect(base)
    with pytest.raises(ValueError):
        MaterializedAggView.create(
            spark, base, tmp_path / "v2", ["g"], {"g": "count(1)"}
        )
    # reserved machinery names refuse up front instead of silently
    # being overwritten by the surrogate key / feed tags
    with pytest.raises(ValueError, match="reserved"):
        MaterializedAggView.create(
            spark, base, tmp_path / "v3", ["g"], {"_gkey": "count(1)"}
        )
    with pytest.raises(ValueError, match="reserved"):
        MaterializedAggView.create(
            spark, base, tmp_path / "v4", ["_change_type"], {"n": "count(1)"}
        )


def test_incremental_refresh_tracks_every_commit_kind(spark, tmp_path):
    """The core invariant: after ANY base mutation, one refresh makes
    the view ≡ a full re-aggregation — including non-invertible
    aggregates (min/max/count distinct), which delta folding can't
    maintain under deletes."""
    base = _base(spark, tmp_path / "b")
    view = MaterializedAggView.create(spark, base, tmp_path / "v", ["g"], AGGS)
    steps = [
        lambda: base.append(
            spark.createDataFrame([(100, "2", 5), (101, "7", 7)], "k long, g string, x long")
        ),  # new rows incl. a brand-new group "7"
        lambda: base.merge(
            spark.createDataFrame([(0, "0", 12345), (102, "3", 1)], "k long, g string, x long")
        ),  # update (x of k=0 was the max-path value) + insert
        lambda: base.delete(F.col("g") == "7"),  # the whole group vanishes
        lambda: base.update({"g": F.lit("0")}, F.col("k") == 5),  # migrates 5 from g=5 to g=0
        lambda: base.delete(F.col("k") % 6 == 1),  # deletes shrink several groups' min/max
        lambda: base.compact(),  # logical no-op commit
        lambda: base.overwrite(base.read().where(F.col("k") < 50)),
    ]
    for i, step in enumerate(steps):
        step()
        rec = view.refresh()
        assert _got(view) == _expect(base), f"diverged after step {i}"
        assert rec["base_version"] == base.version()
    # group "7" really left the view (not just zeroed)
    assert "7" not in {r.g for r in view.read().collect()}


def test_refresh_is_exactly_once_and_noop_when_fresh(spark, tmp_path):
    base = _base(spark, tmp_path / "b")
    view = MaterializedAggView.create(spark, base, tmp_path / "v", ["g"], AGGS)
    assert view.refresh()["mode"] == "noop"
    base.append(spark.createDataFrame([(200, "1", 3)], "k long, g string, x long"))
    rec = view.refresh()
    assert rec["mode"] == "incremental" and rec["groups_refreshed"] == 1
    vv = view.table.version()
    assert view.refresh()["mode"] == "noop"  # same base version: no new commit
    assert view.table.version() == vv
    assert view.staleness() == (base.version(), base.version())


def test_refresh_prunes_base_files_by_group_range(spark, tmp_path):
    """The scale receipt: with the base clustered by the group column,
    refreshing one group's change reads a strict subset of base files."""
    df = spark.range(8000).select(
        F.col("id").alias("k"),
        (F.col("id") % 80).alias("g"),
        F.col("id").alias("x"),
    )
    base = TxnTable.create(spark, str(tmp_path / "b"), df, key_field="k")
    base.compact(cluster_by=["g"], n_files=8)
    view = MaterializedAggView.create(
        spark, base, tmp_path / "v", ["g"], {"total": "sum(x)", "hi": "max(x)"}
    )
    base.merge(spark.createDataFrame([(3, 3, 10_000_000)], "k long, g long, x long"))
    rec = view.refresh()
    assert rec["mode"] == "incremental"
    assert rec["base_files_scanned"] < rec["base_files_total"]
    got = {r.g: (r.total, r.hi) for r in view.read().collect()}
    exp = {
        r.g: (r.total, r.hi)
        for r in base.read()
        .groupBy("g")
        .agg(F.sum("x").alias("total"), F.max("x").alias("hi"))
        .collect()
    }
    assert got == exp


def test_full_rebuild_route_when_most_groups_touched(spark, tmp_path):
    base = _base(spark, tmp_path / "b")
    view = MaterializedAggView.create(spark, base, tmp_path / "v", ["g"], AGGS)
    base.update({"x": F.col("x") + 1}, F.col("k") >= 0)  # every group touched
    rec = view.refresh(max_incremental_groups=2)
    assert rec["mode"] == "full"
    assert _got(view) == _expect(base)
    # the full route still records the base version exactly-once
    assert view.refresh(max_incremental_groups=2)["mode"] == "noop"


def test_view_change_feed_carries_only_refreshed_groups(spark, tmp_path):
    """Chained incrementality: the view is a TxnTable, so DOWNSTREAM
    consumers read ITS precise change feed and see one delta row per
    refreshed group — aggregate changes propagate O(changed groups)
    through a whole pipeline of views, never O(view)."""
    base = _base(spark, tmp_path / "b")
    view = MaterializedAggView.create(spark, base, tmp_path / "v", ["g"], AGGS)
    v0 = view.table.version()
    base.merge(
        spark.createDataFrame([(300, "4", 9)], "k long, g string, x long")
    )
    view.refresh()
    feed = view.table.read_changes(v0, precise=True).collect()
    assert {r.g for r in feed} == {"4"}
    assert {r._change_type for r in feed} == {"update_postimage"}
    # a vanished group propagates downstream as a delete
    base.delete(F.col("g") == "4")
    view.refresh()
    feed2 = view.table.read_changes(view.table.version() - 1, precise=True).collect()
    assert [(r.g, r._change_type) for r in feed2] == [("4", "delete")]


def test_cascaded_views_refresh_incrementally(spark, tmp_path):
    """A view's storage IS a TxnTable, so a second-level view stacks on
    it directly: base -> per-group totals -> distribution of group
    sizes. Each hop refreshes from the precise change feed of the hop
    below — O(changed groups) all the way up the cascade."""
    base = _base(spark, tmp_path / "b")
    v1 = MaterializedAggView.create(
        spark, base, tmp_path / "v1", ["g"], {"total": "sum(x)", "n": "count(1)"}
    )
    v2 = MaterializedAggView.create(
        spark, v1.table, tmp_path / "v2", ["n"], {"n_groups": "count(1)"}
    )

    def expect_v2():
        return {
            (r.n, r.n_groups)
            for r in v1.read().groupBy("n").agg(
                F.count(F.lit(1)).alias("n_groups")
            ).collect()
        }

    assert {(r.n, r.n_groups) for r in v2.read().collect()} == expect_v2()
    # one new row changes ONE group's size; both hops stay incremental
    base.merge(
        spark.createDataFrame([(700, "3", 2)], "k long, g string, x long")
    )
    rec1 = v1.refresh()
    rec2 = v2.refresh()
    assert rec1["mode"] == "incremental" and rec1["groups_refreshed"] == 1
    assert rec2["mode"] == "incremental"
    # the v1 commit feeds v2 exactly the changed size-buckets: the
    # bucket group "3" left plus the one it entered
    assert rec2["groups_refreshed"] == 2
    assert {(r.n, r.n_groups) for r in v2.read().collect()} == expect_v2()
    assert v2.refresh()["mode"] == "noop"


def test_base_vacuumed_past_refresh_lag_falls_back_to_full_rebuild(
    spark, tmp_path
):
    """Retention shorter than refresh lag: the change feed since the
    view's last refresh is unreadable, so the refresh must degrade to
    one LOUD full rebuild (sync_table's contract) — never a silent
    wrong answer, never an unhandled missing-manifest error."""
    base = _base(spark, tmp_path / "b")
    view = MaterializedAggView.create(spark, base, tmp_path / "v", ["g"], AGGS)
    for i in range(3):
        base.merge(
            spark.createDataFrame(
                [(600 + i, str(i), 8)], "k long, g string, x long"
            )
        )
    base.vacuum(keep_last=1)
    rec = view.refresh()
    assert rec["mode"] == "full_vacuumed"
    assert rec["base_version"] == base.version()
    assert _got(view) == _expect(base)
    assert view.refresh()["mode"] == "noop"


def test_concurrent_refreshers_resolve_via_lost_race(
    spark, tmp_path, monkeypatch
):
    """Two refreshers racing to the same view version: the commit
    arbitration picks one winner; the loser sees the winner already
    covers its base version and reports lost_race instead of raising.
    A rival commit that does NOT cover it re-raises."""
    import json as _json

    import gcpde_spark.txn as txn
    from gcpde_spark.txn import ConcurrentCommitError, _mname

    base = _base(spark, tmp_path / "b")
    view = MaterializedAggView.create(spark, base, tmp_path / "v", ["g"], AGGS)
    base.append(spark.createDataFrame([(500, "1", 3)], "k long, g string, x long"))
    end = base.version()

    vlog = tmp_path / "v" / "_txn_log"
    real_publish = txn._publish

    def rival_wins_first(root, version, manifest, backend=None):
        # a twin refresher lands the same refresh just before ours
        if root == (tmp_path / "v") and not (vlog / _mname(version)).exists():
            m = _json.loads((vlog / _mname(version - 1)).read_text())
            m["version"] = version
            m.setdefault("meta", {})["view_base_version"] = end
            real_publish(root, version, m)
        real_publish(root, version, manifest, backend=backend)

    monkeypatch.setattr(txn, "_publish", rival_wins_first)
    rec = view.refresh()
    assert rec["mode"] == "lost_race" and rec["base_version"] == end
    monkeypatch.setattr(txn, "_publish", real_publish)
    assert view.refresh()["mode"] == "noop"

    # rival that does NOT cover the target: stale meta -> re-raise
    base.append(spark.createDataFrame([(501, "2", 4)], "k long, g string, x long"))
    stale = end  # rival only reflects the OLD base version
    end = base.version()

    def stale_rival_wins(root, version, manifest, backend=None):
        if root == (tmp_path / "v") and not (vlog / _mname(version)).exists():
            m = _json.loads((vlog / _mname(version - 1)).read_text())
            m["version"] = version
            m.setdefault("meta", {})["view_base_version"] = stale
            real_publish(root, version, m)
        real_publish(root, version, manifest, backend=backend)

    monkeypatch.setattr(txn, "_publish", stale_rival_wins)
    with pytest.raises(ConcurrentCommitError, match="re-run"):
        view.refresh()


def test_engine_facade_opens_views(spark, tmp_path):
    from gcpde_spark import Engine, MaterializedAggView as Exported

    assert Exported is MaterializedAggView
    base = _base(spark, tmp_path / "b", n=12)
    MaterializedAggView.create(spark, base, tmp_path / "v", ["g"], {"n": "count(1)"})
    eng = Engine(spark)
    v = eng.materialized_view(base, str(tmp_path / "v"))
    assert v.aggs == {"n": "count(1)"}
    assert v.read().count() == 6


def test_null_groups_and_composite_group_keys(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, None, "a", 1), (1, "g1", "a", 2), (2, "g1", None, 3), (3, None, "a", 4)],
        "k long, g string, h string, x long",
    )
    base = TxnTable.create(spark, str(tmp_path / "b"), df, key_field="k")
    aggs = {"total": "sum(x)", "n": "count(1)"}
    view = MaterializedAggView.create(
        spark, base, tmp_path / "v", ["g", "h"], aggs
    )
    exp = lambda: {
        tuple(r)
        for r in base.read()
        .groupBy("g", "h")
        .agg(F.expr("sum(x)").alias("total"), F.expr("count(1)").alias("n"))
        .collect()
    }
    assert _got(view) == exp()
    # touch the NULL group and migrate a row INTO a null group
    base.merge(spark.createDataFrame([(0, None, "a", 100)], df.schema))
    base.update({"g": F.lit(None).cast("string")}, F.col("k") == 1)
    view.refresh()
    assert _got(view) == exp()
    # delete every row of the (None, "a") group
    base.delete(F.col("g").isNull() & (F.col("h") == "a"))
    view.refresh()
    assert _got(view) == exp()


def test_random_base_op_sequences_keep_the_view_consistent(spark, tmp_path):
    """Model-based integration fuzz across the whole stack: arbitrary
    interleavings of merge / append / delete / update / compact /
    maybe_compact on the base, with refreshes sprinkled at random
    points, always leave the view ≡ a dict-model re-aggregation —
    group migrations (updates rewrite the group column), vanished
    groups, and maintenance commits included."""
    from hypothesis import given, settings, strategies as st

    val = st.text(alphabet="abc", min_size=1, max_size=2)
    op = st.one_of(
        st.tuples(
            st.just("merge"),
            st.dictionaries(st.integers(0, 25), val, min_size=1, max_size=4),
        ),
        st.tuples(st.just("delete"), st.integers(0, 25), st.integers(0, 8)),
        st.tuples(
            st.just("update"), st.integers(0, 25), st.integers(0, 8), val
        ),
        st.tuples(st.just("compact"), st.integers(1, 3)),
        st.tuples(st.just("maybe_compact")),
    )
    counter = {"n": 0}

    @settings(max_examples=6, deadline=None)
    @given(
        ops=st.lists(st.tuples(op, st.booleans()), min_size=1, max_size=5)
    )
    def check(ops):
        counter["n"] += 1
        root = tmp_path / f"vm-{counter['n']}"
        init = {i: str(i % 4) for i in range(10)}
        model = dict(init)
        t = TxnTable.create(
            spark,
            str(root / "b"),
            spark.createDataFrame(sorted(init.items()), "id long, v string"),
            key_field="id",
            n_files=3,
        )
        view = MaterializedAggView.create(
            spark, t, root / "view", ["v"], {"n": "count(1)", "hi": "max(id)"}
        )

        def expected():
            groups = {}
            for k, v in model.items():
                c, h = groups.get(v, (0, None))
                groups[v] = (c + 1, k if h is None else max(h, k))
            return {(v, c, h) for v, (c, h) in groups.items()}

        for (o, do_refresh) in ops:
            if o[0] == "merge":
                t.merge(
                    spark.createDataFrame(
                        sorted(o[1].items()), "id long, v string"
                    )
                )
                model.update(o[1])
            elif o[0] == "delete":
                lo, w = o[1], o[2]
                t.delete(F.col("id").between(lo, lo + w))
                model = {
                    k: v for k, v in model.items() if not lo <= k <= lo + w
                }
            elif o[0] == "update":
                lo, w, nv = o[1], o[2], o[3]
                t.update({"v": F.lit(nv)}, F.col("id").between(lo, lo + w))
                model = {
                    k: (nv if lo <= k <= lo + w else v)
                    for k, v in model.items()
                }
            elif o[0] == "compact":
                t.compact(n_files=o[1])
            else:
                t.maybe_compact(target_files=3, overlap_threshold=0.5)
            if do_refresh:
                view.refresh()
                assert {tuple(r) for r in view.read().collect()} == expected()
        view.refresh()
        assert {tuple(r) for r in view.read().collect()} == expected()

    check()


def test_refresh_survives_base_rename_via_full_rebuild(spark, tmp_path):
    """A base column rename/drop is a non-additive boundary the change
    feed refuses to cross — the refresh must route to one loud full
    rebuild (correct as long as the view's own columns survive), never
    a silently stale view."""
    base = _base(spark, tmp_path / "b")
    # a spare column the view never references, added by evolution
    base.merge(
        spark.createDataFrame(
            [(100, "1", 5000, "meta")], "k long, g string, x long, note string"
        ),
        merge_schema=True,
    )
    v = MaterializedAggView.create(spark, base, tmp_path / "v", ["g"], AGGS)
    base.merge(
        spark.createDataFrame(
            [(101, "2", 7000, None)], "k long, g string, x long, note string"
        )
    )
    base.rename_column("note", "annotation")  # not a view column
    base.merge(
        spark.createDataFrame(
            [(102, "3", 9000, None)],
            "k long, g string, x long, annotation string",
        )
    )
    rec = v.refresh()
    assert rec["mode"] == "full_schema_change"
    assert _expect(base) == {
        tuple(r) for r in v.read().select("g", *AGGS).collect()
    }
    # next refresh is incremental again (segment after the rename)
    base.merge(
        spark.createDataFrame(
            [(103, "4", 1100, None)],
            "k long, g string, x long, annotation string",
        )
    )
    rec = v.refresh()
    assert rec["mode"] == "incremental"
    assert _expect(base) == {
        tuple(r) for r in v.read().select("g", *AGGS).collect()
    }
    # renaming a column the view DOES use fails the rebuild loudly with
    # the missing column spelled out — never a silently stale view
    base.rename_column("x", "amount")
    base.merge(
        spark.createDataFrame(
            [(104, "5", 1, None)],
            "k long, g string, amount long, annotation string",
        )
    )
    with pytest.raises(Exception, match="x"):
        v.refresh()
