"""Dataset layer — ports the reference's behavioral assertions
(tests/unit/test_gcs.py) to local-FS + real Spark, no mocks."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from gcpde_spark.datasets import (
    DatasetStore,
    DateTimePartitions,
    build_file_name,
    build_partition_path,
    get_latest_path_files,
)


@pytest.fixture()
def store(spark, tmp_path):
    return DatasetStore(spark, str(tmp_path))


P = DateTimePartitions(year=2022, month=1, day=1, hour=0)


def test_path_contract_exact():
    """Golden path from tests/unit/test_gcs.py:39-62 — dir unpadded, file padded."""
    assert (
        build_partition_path("ds", "1", P) + build_file_name("ds", P)
        == "ds/version=1/year=2022/month=1/day=1/ds__2022-01-01T00:00.jsonl"
    )
    p2 = DateTimePartitions(year=2022, month=12, day=9, hour=5)
    assert build_partition_path("ds", "2", p2) == "ds/version=2/year=2022/month=12/day=9/"
    assert build_file_name("ds", p2) == "ds__2022-12-09T05:00.jsonl"


def test_add_records_writes_single_jsonl(store, tmp_path):
    store.add_records_to_dataset(
        ['{"id": "1"}', '{"id": "2"}'], "ds", version="1", datetime_partition=P
    )
    f = tmp_path / "ds/version=1/year=2022/month=1/day=1/ds__2022-01-01T00:00.jsonl"
    assert f.read_text() == '{"id": "1"}\n{"id": "2"}'


def test_add_records_custom_file_name(store, tmp_path):
    """build_file_name callback ≙ gcpde/gcs.py:70-79, tests/unit/test_gcs.py:69-108."""
    store.add_records_to_dataset(
        ['{"id": "1"}'], "ds", datetime_partition=P, build_file_name_fn=lambda: "custom.jsonl"
    )
    assert (tmp_path / "ds/version=1/year=2022/month=1/day=1/custom.jsonl").exists()


def test_add_records_empty_noop(store, tmp_path):
    """Empty guard ≙ gcpde/gcs.py:189-191."""
    store.add_records_to_dataset([], "ds", datetime_partition=P)
    assert not (tmp_path / "ds").exists()


def test_latest_partition_selection_golden():
    """Golden from tests/unit/test_gcs.py:225-242."""
    paths = [
        "ds/version=1/year=2022/month=9/day=1/a.jsonl",
        "ds/version=1/year=2022/month=12/day=9/b.jsonl",
        "ds/version=1/year=2022/month=12/day=10/c.jsonl",
        "ds/version=1/year=2022/month=12/day=10/d.jsonl",
    ]
    assert get_latest_path_files(paths) == [
        "ds/version=1/year=2022/month=12/day=10/c.jsonl",
        "ds/version=1/year=2022/month=12/day=10/d.jsonl",
    ]


def test_get_dataset_roundtrip_and_latest(store):
    old = DateTimePartitions(year=2022, month=9, day=1, hour=0)
    new = DateTimePartitions(year=2022, month=12, day=10, hour=3)
    store.add_records_to_dataset(['{"id": "1"}'], "ds", datetime_partition=old)
    store.add_records_to_dataset(['{"id": "2"}', '{"id": "3"}'], "ds", datetime_partition=new)
    assert store.get_dataset("ds") == [{"id": "1"}, {"id": "2"}, {"id": "3"}]
    assert store.get_dataset("ds", latest_partition_only=True) == [
        {"id": "2"},
        {"id": "3"},
    ]


def test_get_dataset_df_distributed(store):
    old = DateTimePartitions(year=2022, month=9, day=1, hour=0)
    new = DateTimePartitions(year=2022, month=12, day=10, hour=3)
    store.add_records_to_dataset(['{"id": "1"}'], "ds", datetime_partition=old)
    store.add_records_to_dataset(['{"id": "2"}'], "ds", datetime_partition=new)
    assert store.get_dataset_df("ds").count() == 2
    df = store.get_dataset_df("ds", latest_partition_only=True)
    assert [r.id for r in df.collect()] == ["2"]


def test_get_dataset_version_isolation(store):
    store.add_records_to_dataset(['{"id": "1"}'], "ds", version="1", datetime_partition=P)
    store.add_records_to_dataset(['{"id": "9"}'], "ds", version="2", datetime_partition=P)
    assert store.get_dataset("ds", version="2") == [{"id": "9"}]


def test_list_files_time_filters(store, tmp_path):
    """updated_after/before inclusive client-side filters ≙ gcpde/gcs.py:404-417,
    tests/unit/test_gcs.py:126-178."""
    for i, day in enumerate([1, 2, 3], start=1):
        p = DateTimePartitions(year=2022, month=1, day=day, hour=0)
        store.add_records_to_dataset([f'{{"id": "{i}"}}'], "ds", datetime_partition=p)
    files = sorted(store.list_files("ds", recursive=True))
    assert len(files) == 3
    # pin distinct mtimes: 2022-01-0{1,2,3}T00:00:00Z
    for f in files:
        day = int(f.split("day=")[1].split("/")[0])
        ts = dt.datetime(2022, 1, day, tzinfo=dt.timezone.utc).timestamp()
        os.utime(tmp_path / f, (ts, ts))
    after = store.list_files(
        "ds", recursive=True, updated_after=dt.datetime(2022, 1, 2, tzinfo=dt.timezone.utc)
    )
    assert sorted(after) == files[1:]
    before = store.list_files(
        "ds", recursive=True, updated_before=dt.datetime(2022, 1, 2, tzinfo=dt.timezone.utc)
    )
    assert sorted(before) == files[:2]
    both = store.list_files(
        "ds",
        recursive=True,
        updated_after=dt.datetime(2022, 1, 2, tzinfo=dt.timezone.utc),
        updated_before=dt.datetime(2022, 1, 2, tzinfo=dt.timezone.utc),
    )
    assert sorted(both) == [files[1]]


def test_list_files_nonrecursive_lists_direct_children_only(store, tmp_path):
    store.add_records_to_dataset(['{"id": "1"}'], "ds", datetime_partition=P)
    store.upload_file("x", "ds/top.txt")
    assert store.list_files("ds") == ["ds/top.txt"]
    assert len(store.list_files("ds", recursive=True)) == 2


def test_upload_download_roundtrip(store):
    store.upload_file('{"a": 1}', "raw/file.json")
    (got,) = store.download_files(["raw/file.json"])
    assert got.file_bytes == b'{"a": 1}'
    assert got.path == "raw/file.json"


def test_copy_files_between_stores(store, spark, tmp_path_factory):
    dst = DatasetStore(spark, str(tmp_path_factory.mktemp("dst")))
    store.add_records_to_dataset(['{"id": "1"}'], "ds", datetime_partition=P)
    n = store.copy_files("ds", dst_store=dst, dst_prefix="ds")
    assert n == 1
    assert dst.get_dataset("ds") == [{"id": "1"}]


def test_add_dataframe_to_dataset_partitioned(store, spark):
    """Scale-path S2: distributed partitioned write, readable via get_dataset."""
    df = spark.createDataFrame(
        [("a", dt.datetime(2022, 1, 1, 5)), ("b", dt.datetime(2022, 1, 2, 6))],
        "id string, ts timestamp",
    )
    store.add_dataframe_to_dataset(df.select("id", "ts"), "ev", ts_column="ts")
    files = store.list_files("ev", recursive=True)
    dirs = {f.rsplit("/", 1)[0] for f in files if f.endswith(".json")}
    assert "ev/version=1/year=2022/month=1/day=1" in dirs
    assert "ev/version=1/year=2022/month=1/day=2" in dirs
    out = store.get_dataset_df("ev", latest_partition_only=True)
    recs = [json.loads(r) for r in out.toJSON().collect()]
    assert [r["id"] for r in recs] == ["b"]


def test_compact_dataset_reduces_files_preserves_records(store, spark):
    """Compaction packs a partition's small-file debris into few files,
    byte-preserving every record, and leaves healthy partitions alone."""
    for i in range(6):  # 6 tiny hourly appends -> 6 files in day=1
        pi = DateTimePartitions(year=2022, month=1, day=1, hour=i)
        store.add_records_to_dataset([f'{{"id": "{i}", "v": {i}}}'], "cds",
                                     datetime_partition=pi)
    p2 = DateTimePartitions(year=2022, month=1, day=2, hour=0)
    store.add_records_to_dataset(['{"id": "x", "v": 99}'], "cds",
                                 datetime_partition=p2)
    before = sorted(store.get_dataset("cds"), key=lambda r: r["id"])
    n_before = len(store.list_files("cds/version=1/year=2022/month=1/day=1"))
    assert n_before >= 6

    stats = store.compact_dataset("cds")
    assert stats == {"cds/version=1/year=2022/month=1/day=1": (n_before, 1)}
    n_after = len(store.list_files("cds/version=1/year=2022/month=1/day=1"))
    assert n_after == 1
    # single-file day=2 partition untouched
    assert len(store.list_files("cds/version=1/year=2022/month=1/day=2")) == 1
    after = sorted(store.get_dataset("cds"), key=lambda r: r["id"])
    assert after == before
    # distributed read path agrees too
    df = store.get_dataset_df("cds")
    assert df.count() == 7
    # idempotent: a second compaction finds nothing to do
    assert store.compact_dataset("cds") == {}


def test_get_dataset_df_since_prunes_partitions(store, spark):
    """`since` is directory-level pruning: only partitions >= the date
    are handed to the reader."""
    for day in (1, 2, 3):
        pd_ = DateTimePartitions(year=2022, month=1, day=day, hour=0)
        store.add_records_to_dataset(
            [f'{{"id": "d{day}"}}'], "inc", datetime_partition=pd_
        )
    df = store.get_dataset_df("inc", since=dt.date(2022, 1, 2))
    ids = sorted(r.id for r in df.collect())
    assert ids == ["d2", "d3"]
    # composes with latest_partition_only (latest wins)
    latest = store.get_dataset_df(
        "inc", since=dt.date(2022, 1, 1), latest_partition_only=True
    )
    assert [r.id for r in latest.collect()] == ["d3"]
    with pytest.raises(FileNotFoundError):
        store.get_dataset_df("inc", since=dt.date(2023, 1, 1))


def test_download_retries_transient_failures_with_backoff(store, monkeypatch):
    """Read I/O retries with the reference's download budget (7 attempts,
    backoff doubling from 1 s capped at 5 s) and converges; a permanent
    failure exhausts the budget and raises."""
    store.add_records_to_dataset(['{"id": "1"}'], "rds", datetime_partition=P)
    real_fs = store._fs()

    class FlakyFS:
        def __init__(self, fails):
            self.fails = fails

        def open(self, path):
            if self.fails > 0:
                self.fails -= 1
                raise IOError("transient")
            return real_fs.open(path)

        def __getattr__(self, name):
            return getattr(real_fs, name)

    sleeps: list[float] = []
    monkeypatch.setattr(store, "_sleep", sleeps.append)
    store._fs_cached = FlakyFS(fails=3)
    assert store.get_dataset("rds") == [{"id": "1"}]
    assert sleeps == [1.0, 2.0, 4.0]

    sleeps.clear()
    store._fs_cached = FlakyFS(fails=99)  # permanent
    with pytest.raises(IOError):
        store.get_dataset("rds")
    assert sleeps == [1.0, 2.0, 4.0, 5.0, 5.0, 5.0]  # 7 attempts, cap 5 s
    store._fs_cached = real_fs
