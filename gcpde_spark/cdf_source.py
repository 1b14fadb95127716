"""Structured-Streaming source for the :class:`gcpde_spark.txn.TxnTable`
change feed — follow a transactional table as a stream::

    register_cdf_source(spark)
    feed = (spark.readStream.format("txn-cdf")
            .option("path", table_path)
            .option("startingVersion", 0)   # default: latest at start
            .load())

Built on Spark 4's Python DataSource API (SPARK-44076), so the feed is
a first-class streaming relation: offsets are TABLE VERSIONS tracked in
the query checkpoint (exactly-once progress across restarts — replaying
a batch re-reads the same immutable commit files and yields identical
rows), one input partition per ADDED data file (reads scale with commit
size and parallelize across executors, never with table size), and each
executor reads its parquet file directly with pyarrow — no driver
collect, no second Spark job.

Semantics match ``TxnTable.read_changes`` default mode: an
at-least-once **upsert feed** (rows from files added by
create/append/merge/update commits, tagged ``_change_type='upsert'`` +
``_commit_version``; rewritten-but-unchanged neighbor rows included, so
consumers apply keyed upserts). Commits that can remove rows
(delete/overwrite/apply_changes/restore) cannot be expressed as upserts
and FAIL the stream — loud, like the batch API; ``compact`` commits are
logical no-ops and are skipped. Additively-evolved history is fine: old
files surface NULL for columns they predate.

No reference counterpart (≙ the Delta streaming-source construction,
re-expressed on this repo's manifest format).

Trigger note: ``Trigger.AvailableNow`` falls back to single-batch
execution for Python stream sources (Spark logs a warning) — every
pending commit drains in ONE micro-batch, which preserves all
semantics here because partitions are per-file and offsets advance to
the drained version either way.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from gcpde_spark.txn import _LOG_DIR, _mname

_UPSERT_OPS = {"create", "append", "merge", "update"}


def register_cdf_source(spark) -> None:
    """Register the ``txn-cdf`` streaming format on this session."""
    spark.dataSource.register(TxnChangeFeedDataSource)


def _read_manifest(root: Path, version: int) -> dict:
    return json.loads((root / _LOG_DIR / _mname(version)).read_text())


def _latest_version(root: Path) -> int:
    versions = [
        int(p.stem)
        for p in (root / _LOG_DIR).glob("*.json")
        if p.stem.isdigit()
    ]
    if not versions:
        raise ValueError(f"no transactional table at {root}")
    return max(versions)


class _FilePartition(InputPartition):
    def __init__(
        self, file_path: str, version: int, field_names: "list[str]"
    ):
        self.file_path = file_path
        self.version = version
        self.field_names = field_names


class TxnChangeFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "txn-cdf"

    def _root(self) -> Path:
        path = self.options.get("path")
        if not path:
            raise ValueError("txn-cdf requires .option('path', <table dir>)")
        return Path(path)

    def schema(self) -> StructType:
        root = self._root()
        m = _read_manifest(root, _latest_version(root))
        base = StructType.fromJson(json.loads(m["schema"]))
        return StructType(base.fields).add("_change_type", "string").add(
            "_commit_version", "integer"
        )

    def streamReader(self, schema: StructType) -> "_CdfStreamReader":
        start = self.options.get("startingVersion")
        return _CdfStreamReader(
            self._root(),
            schema,
            None if start is None else int(start),
        )


class _CdfStreamReader(DataSourceStreamReader):
    """Offsets are manifest versions: ``{"version": N}`` means
    everything up to and including commit N has been emitted."""

    def __init__(
        self, root: Path, schema: StructType, starting_version: "int | None"
    ):
        self.root = root
        self.schema = schema
        self.starting_version = starting_version

    def initialOffset(self) -> dict:
        if self.starting_version is not None:
            # emit commits AFTER startingVersion-1, i.e. from it on
            return {"version": self.starting_version - 1}
        return {"version": _latest_version(self.root)}

    def latestOffset(self) -> dict:
        return {"version": _latest_version(self.root)}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        names = [f.name for f in self.schema.fields[:-2]]
        out: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            m = _read_manifest(self.root, v)
            op = m["op"]
            if op == "compact":
                continue
            if op not in _UPSERT_OPS:
                raise ValueError(
                    f"version {v} is a {op.upper()} commit, which can "
                    "remove rows — an upsert stream cannot express it; "
                    "relay removals with TxnTable.read_changes("
                    "precise=True) + apply_changes instead"
                )
            prev = (
                {f["path"] for f in _read_manifest(self.root, v - 1)["files"]}
                if v > 0
                else set()
            )
            for f in m["files"]:
                if f["path"] not in prev:
                    out.append(
                        _FilePartition(
                            str(self.root / f["path"]), v, names
                        )
                    )
        return out

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        table = pq.read_table(partition.file_path)
        present = set(table.column_names)
        cols = []
        n = table.num_rows
        for name in partition.field_names:
            if name in present:
                cols.append(table.column(name).to_pylist())
            else:  # file predates an additively-evolved column
                cols.append([None] * n)
        tail_type = ["upsert"] * n
        tail_version = [partition.version] * n
        return iter(zip(*cols, tail_type, tail_version))

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint; nothing to clean
