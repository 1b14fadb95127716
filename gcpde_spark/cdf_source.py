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

``option("mode", "commits")`` switches to a **commit-log stream**: one
marker row per commit (data columns NULL, ``_change_type`` = the
commit op, ``_commit_version``), every op included and zero data files
read — the trigger/monitor feed behind
:func:`gcpde_spark.views.refresh_view_stream` and ops dashboards.

Default ``mode=upsert`` matches ``TxnTable.read_changes``: an
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

``option("maxCommitsPerBatch", N)`` rate-limits steady-state intake
(the ``maxFilesPerTrigger`` analog; commits are the offset unit, so
they are the smallest splittable intake): after a run's first planned
batch, each micro-batch advances at most N versions. The FIRST batch of
a run is deliberately uncapped — the Python DataSource API gives
``latestOffset`` neither the checkpointed start nor a limit, and an
answer below that start would WAL a backwards offset (the engine plans
batches on offset inequality) and poison the log into re-delivery;
uncapped-first is the only answer that can never regress. It is also
benign HERE: partitions are per-file, so a large catch-up batch
schedules as many small file reads, not one big buffer — the cap
exists to bound per-batch sink transactions and checkpoint granularity
once the stream is live, not to make backfill feasible (for
incremental backfill use ``TxnTable.sync_table``, which is O(deltas)
per call with its own exactly-once bookkeeping).
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

from gcpde_spark.txn import (
    TxnTableNotFound,
    _list_versions,
    _load_manifest,
    _mapping_of,
    _phys,
)

_UPSERT_OPS = {"create", "append", "merge", "update"}
_TAG_COLS = ("_change_type", "_commit_version")


def register_cdf_source(spark) -> None:
    """Register the ``txn-cdf`` streaming format on this session."""
    spark.dataSource.register(TxnChangeFeedDataSource)


def _latest_version(root: Path) -> int:
    return max(_list_versions(root))


def _manifest_or_lag_error(root: Path, version: int) -> dict:
    try:
        return _load_manifest(root, version)
    except TxnTableNotFound as exc:
        raise TxnTableNotFound(
            f"manifest for version {version} of {root} is gone (vacuumed "
            "past this stream's offset — retention shorter than consumer "
            "lag). The missing commits may include row removals, so "
            "replaying the current snapshot as upserts would be silently "
            "wrong; re-seed the consumer (e.g. sync_table full resync) "
            "and restart the stream from a retained version whose "
            "PREDECESSOR is also retained"
        ) from exc


class _FilePartition(InputPartition):
    def __init__(
        self,
        file_path: str,
        version: int,
        field_names: "list[str]",
        dv_paths: "list[str] | None" = None,
        rel_path: "str | None" = None,
        phys_names: "list[str] | None" = None,
    ):
        self.file_path = file_path
        self.version = version
        self.field_names = field_names
        # PHYSICAL parquet names aligned to field_names (column mapping,
        # format v2): physical birth names never change, so one
        # stream-start translation stays valid across every commit —
        # including metadata-only renames, which become logical no-ops
        self.phys_names = phys_names or field_names
        # deletion-vector sidecars + this file's table-relative key in
        # them: a clone's create manifest can carry vector references,
        # and emitting the physical rows would resurrect deleted ones
        self.dv_paths = dv_paths or []
        self.rel_path = rel_path


def _file_columns(partition: "_FilePartition") -> "tuple[list[list], int]":
    """Executor-side materialization of ONE data file as Python column
    lists under the partition's physical names: pyarrow read, deletion
    vectors applied (drop the sidecar-listed row positions — parquet
    row order is the position space), pre-evolution columns NULL-filled.
    Shared by the streaming feed and the ``gcpde_txn`` batch source
    (gcpde_spark/txn_source.py)."""
    import pyarrow.parquet as pq

    table = pq.read_table(partition.file_path)
    if getattr(partition, "dv_paths", None):
        dead: set[int] = set()
        for p in partition.dv_paths:
            dv = pq.read_table(p, columns=["_file", "_pos"])
            for f, pos in zip(
                dv.column("_file").to_pylist(),
                dv.column("_pos").to_pylist(),
            ):
                if f == partition.rel_path:
                    dead.add(pos)
        if dead:
            table = table.take(
                [i for i in range(table.num_rows) if i not in dead]
            )
    present = set(table.column_names)
    cols = []
    n = table.num_rows
    for name in partition.phys_names:
        if name in present:
            cols.append(table.column(name).to_pylist())
        else:  # file predates an additively-evolved column
            cols.append([None] * n)
    return cols, n


class _CommitPartition(InputPartition):
    def __init__(self, version: int, op: str, n_fields: int):
        self.version = version
        self.op = op
        self.n_fields = n_fields


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
        m = _load_manifest(root, _latest_version(root))
        base = StructType.fromJson(json.loads(m["schema"]))
        # every data column is nullable in the FEED even when the table
        # column is not: commit markers (mode=commits) carry NULL data,
        # and pre-evolution files NULL-fill later columns
        from pyspark.sql.types import StructField

        fields = [StructField(f.name, f.dataType, True) for f in base.fields]
        return StructType(fields).add("_change_type", "string").add(
            "_commit_version", "integer"
        )

    def streamReader(self, schema: StructType) -> "_CdfStreamReader":
        start = self.options.get("startingVersion")
        mode = self.options.get("mode", "upsert")
        if mode not in ("upsert", "commits"):
            raise ValueError(f"unknown txn-cdf mode {mode!r}: upsert|commits")
        max_commits = self.options.get("maxCommitsPerBatch")
        if max_commits is not None and int(max_commits) < 1:
            raise ValueError(
                f"maxCommitsPerBatch must be >= 1, got {max_commits}"
            )
        root = self._root()
        return _CdfStreamReader(
            root,
            schema,
            None if start is None else int(start),
            mode,
            None if max_commits is None else int(max_commits),
            _mapping_of(_load_manifest(root, _latest_version(root))),
        )


class _CdfStreamReader(DataSourceStreamReader):
    """Offsets are manifest versions: ``{"version": N}`` means
    everything up to and including commit N has been emitted."""

    def __init__(
        self,
        root: Path,
        schema: StructType,
        starting_version: "int | None",
        mode: str = "upsert",
        max_commits: "int | None" = None,
        mapping: "dict[str, str] | None" = None,
    ):
        self.root = root
        self.schema = schema
        self.starting_version = starting_version
        self.mode = mode
        self.max_commits = max_commits
        self.mapping = mapping or {}
        # rate-limit cursor: the newest version this reader has handed
        # to the engine as a batch end. The Python DataSource API has no
        # admission-control hook (latestOffset receives neither the
        # start offset nor a limit, and the engine probes latestOffset
        # BEFORE initialOffset even on fresh checkpoints — measured), so
        # the cap lives in reader state. A None cursor means the
        # checkpointed start is unknowable here; answering anything
        # below it would WAL a backwards offset (the engine plans on
        # offset INEQUALITY) and poison the log into re-delivery — so
        # the first planned batch of a run is always uncapped, and every
        # later one advances at most max_commits versions.
        self._cursor: "int | None" = None

    def initialOffset(self) -> dict:
        if self.starting_version is not None:
            # emit commits AFTER startingVersion-1, i.e. from it on
            return {"version": self.starting_version - 1}
        return {"version": _latest_version(self.root)}

    def latestOffset(self) -> dict:
        latest = _latest_version(self.root)
        if self.max_commits is None or self._cursor is None:
            self._cursor = latest
            return {"version": latest}
        self._cursor = min(latest, self._cursor + self.max_commits)
        return {"version": self._cursor}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        # data columns by NAME, not position: a user-supplied schema
        # may order fields differently, and slicing [-2:] off would
        # silently misalign rows against it
        names = [f.name for f in self.schema.fields if f.name not in _TAG_COLS]
        stream_phys = {_phys(self.mapping, n) for n in names}
        first = start["version"] + 1
        out: list[InputPartition] = []
        end_phys: "set[str] | None" = None  # lazily loaded, see below
        prev: set[str] = (
            {
                f["path"]
                for f in _manifest_or_lag_error(self.root, first - 1)["files"]
            }
            if first > 0 and self.mode == "upsert"
            else set()
        )
        for v in range(first, end["version"] + 1):
            m = _manifest_or_lag_error(self.root, v)
            op = m["op"]
            if self.mode == "commits":
                # commit-log stream: ONE marker row per commit, any op,
                # zero data files read — the trigger/monitor feed
                # (continuous view maintenance, ops dashboards)
                out.append(_CommitPartition(v, op, len(names)))
                continue
            cur = {f["path"] for f in m["files"]}
            if op in ("compact", "constraints", "bloom", "rename_column"):
                # logical no-ops to an upsert feed: compact changes the
                # FILE SET without changing rows; the others change only
                # metadata. A RENAME flows because this reader addresses
                # columns by their immutable PHYSICAL names — but a DROP
                # does not get the same pass (below).
                prev = cur
                continue
            if op == "drop_column":
                # only a drop the RUNNING stream still carries is fatal:
                # skipping it would make every later commit emit NULL
                # for the dropped column under the stream's old schema,
                # and a keyed downstream sink would upsert NULL over
                # real values — silent data loss. A restarted reader
                # re-infers the NARROWED schema, so on replay the
                # dropped set is disjoint from stream_phys and the
                # commit passes as a metadata no-op (like rename) —
                # i.e. the restart advertised below genuinely recovers.
                prev_mp = _manifest_or_lag_error(self.root, v - 1)
                dropped = {
                    _phys(_mapping_of(prev_mp), f["name"])
                    for f in json.loads(prev_mp["schema"])["fields"]
                } - {
                    _phys(_mapping_of(m), f["name"])
                    for f in json.loads(m["schema"])["fields"]
                }
                if dropped & stream_phys:
                    raise ValueError(
                        f"version {v} dropped a column the running "
                        "stream still carries — restart the stream to "
                        "pick up the narrowed schema (its checkpoint "
                        "offset has NOT advanced past this commit; on "
                        "restart the replay emits pre-drop commits "
                        "without the dropped column, so no rows are "
                        "lost)"
                    )
                prev = cur
                continue
            if op not in _UPSERT_OPS:
                raise ValueError(
                    f"version {v} is a {op.upper()} commit, which can "
                    "remove rows — an upsert stream cannot express it; "
                    "relay removals with TxnTable.read_changes("
                    "precise=True) + apply_changes instead"
                )
            # a commit carrying columns the stream schema lacks would
            # otherwise have them silently DROPPED forever (the offset
            # advances past the commit) — refuse loudly, like Delta
            # fails a stream on schema change; restart re-infers. The
            # comparison is over PHYSICAL names so a pure rename is no
            # change at all, while a column some later commit DROPPED
            # still refuses (conservative: backfill past a drop needs
            # an explicit read_changes/sync_table decision, not silent
            # row narrowing)
            commit_mp = _mapping_of(m)
            commit_phys = {
                _phys(commit_mp, f["name"])
                for f in json.loads(m["schema"])["fields"]
            }
            extra = commit_phys - stream_phys
            if extra:
                # surplus physical columns that a LATER commit already
                # dropped (they are gone from the scan-end manifest) are
                # tolerated: a post-drop restart replaying pre-drop
                # history under the narrowed schema must not wedge on
                # its own checkpoint, and the narrowed schema IS the
                # table's current contract — emitting those files
                # without the since-dropped column matches what a fresh
                # reader of the current table would see. Only columns
                # still LIVE at scan end are a real evolution the
                # stream missed, and refuse loudly.
                if end_phys is None:
                    end_m = _manifest_or_lag_error(
                        self.root, end["version"]
                    )
                    end_phys = {
                        _phys(_mapping_of(end_m), f["name"])
                        for f in json.loads(end_m["schema"])["fields"]
                    }
                still_live = extra & end_phys
                if still_live:
                    raise ValueError(
                        f"version {v} evolved the schema with column(s) "
                        f"{sorted(still_live)} the running stream does "
                        "not carry — restart the stream to pick up the "
                        "new schema (its checkpoint offset has NOT "
                        "advanced past this commit, so no rows are "
                        "lost)"
                    )
            phys_names = [_phys(self.mapping, n) for n in names]
            for f in m["files"]:
                if f["path"] not in prev:
                    dv = f.get("dv") or {}
                    out.append(
                        _FilePartition(
                            str(self.root / f["path"]),
                            v,
                            names,
                            dv_paths=[
                                str(self.root / p)
                                for p in dv.get("paths", [])
                            ],
                            rel_path=f["path"],
                            phys_names=phys_names,
                        )
                    )
            prev = cur
        return out

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        if isinstance(partition, _CommitPartition):
            marker = (None,) * partition.n_fields + (
                partition.op,
                partition.version,
            )
            return iter([marker])
        cols, n = _file_columns(partition)
        tail_type = ["upsert"] * n
        tail_version = [partition.version] * n
        return iter(zip(*cols, tail_type, tail_version))

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint; nothing to clean
