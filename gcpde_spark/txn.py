"""Minimal copy-on-write transactional table format — the backend the
:class:`gcpde_spark.tables.MergeIntoBackend` seam anticipates, realized
in pure Spark + stdlib (SURVEY.md §7 "take Delta and get MERGE free";
the sandbox ships no Delta/Iceberg runtime, so this implements the same
three mechanisms from scratch at their minimal useful size):

1. **Manifest-based snapshots** — a table is a directory of immutable
   parquet data files plus a ``_txn_log/`` of numbered JSON manifests;
   the highest manifest IS the table state. Readers resolve one
   manifest and only ever see that snapshot's file list, so a
   concurrent writer can never show them a half-rewritten table.
2. **Atomic, conflict-detecting commits** — a manifest is staged to a
   temp name and published with ``os.link`` (hard-link create fails
   with EEXIST if the version already exists), which is atomic on any
   POSIX filesystem: two writers racing to version N+1 get exactly one
   winner and one :class:`ConcurrentCommitError`. Object stores would
   swap this single call for a conditional PUT — that is the whole
   port surface.
3. **File-pruned MERGE (the scale point)** — each manifest entry
   carries the data file's merge-key [min, max] from its parquet
   footer. ``merge`` rewrites ONLY the files whose key range overlaps
   the incoming delta's range and re-links every other file unchanged:
   a 1-row delta into a key-sorted 100 TB table rewrites one file, not
   the table — O(delta + touched files), the cost model the
   ``upsert_table_df`` docstring promises from a transactional
   backend. (A file whose range does not overlap the delta's can not
   contain any delta key, so skipping it is sound, not approximate.)

Out of scope, stated honestly: multi-table transactions, optimistic
retry loops (a losing writer re-reads and re-merges itself), Hadoop-FS
paths (``gs://``/``s3://`` need the conditional-put commit above), and
column-level stats beyond the merge key.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from gcpde_spark.errors import SchemaMismatchException
from gcpde_spark.tables import merge_dataframes

_LOG_DIR = "_txn_log"
_DATA_DIR = "data"


class ConcurrentCommitError(Exception):
    """Another writer published this version first — re-read the table
    and re-apply the merge (optimistic concurrency)."""


class TxnTableNotFound(Exception):
    pass


def _file_key_stats(path: str, key_field: str) -> tuple[Any, Any, int]:
    """(key_min, key_max, n_rows) from the parquet footer — metadata
    only, no data read. Driver-side per file; at very large file counts
    collect stats distributedly at write time instead (noted, not
    hidden)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    kmin = kmax = None
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            if col.path_in_schema != key_field:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                return None, None, md.num_rows
            kmin = st.min if kmin is None else min(kmin, st.min)
            kmax = st.max if kmax is None else max(kmax, st.max)
    return kmin, kmax, md.num_rows


class TxnTable:
    """A transactional parquet table at ``path`` with snapshot reads,
    atomic commits, time travel, and copy-on-write file-pruned MERGE.

    ::

        t = TxnTable.create(spark, "/lake/users", df, key_field="id")
        t.merge(delta_df)              # rewrites only overlapping files
        t.read()                       # latest snapshot
        t.read(version=1)              # time travel
        t.history()                    # commit log
        t.vacuum()                     # drop unreferenced data files
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = Path(path)
        if not (self.path / _LOG_DIR).is_dir():
            raise TxnTableNotFound(f"no transactional table at {path}")

    # -- lifecycle ---------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        key_field: str,
        sort_by_key: bool = True,
        n_files: int | None = None,
        meta: dict | None = None,
    ) -> "TxnTable":
        """Initialize a table from ``df``. ``sort_by_key`` range-sorts
        the initial files by the merge key, which is what makes future
        merges prune well (narrow non-overlapping per-file key ranges);
        unsorted data still merges correctly, just rewrites more.
        ``n_files`` pins the file count (size so each file is
        ~128 MB-1 GB at scale); without it AQE may coalesce small
        tables to one file, which defeats pruning."""
        p = Path(path)
        (p / _LOG_DIR).mkdir(parents=True, exist_ok=False)
        if sort_by_key:
            out = (
                df.repartitionByRange(n_files, key_field)
                if n_files
                else df.repartitionByRange(key_field)
            )
        else:
            out = df
        files = _write_data_files(spark, p, out)
        manifest = {
            "version": 0,
            "op": "create",
            "key_field": key_field,
            "schema": df.schema.json(),
            "files": _stat_entries(p, files, key_field),
        }
        if meta:
            manifest["meta"] = meta
        _publish(p, 0, manifest)
        return cls(spark, path)

    # -- snapshot reads ----------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        m = self._manifest(version)
        files = [str(self.path / f["path"]) for f in m["files"]]
        schema = StructType.fromJson(json.loads(m["schema"]))
        if not files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*files)

    def history(self) -> list[dict]:
        """Commit log, newest first (version, op, file/row counts)."""
        out = []
        for v in sorted(self._versions(), reverse=True):
            m = self._manifest(v)
            out.append(
                {
                    "version": v,
                    "op": m["op"],
                    "n_files": len(m["files"]),
                    "n_rows": sum(f["rows"] for f in m["files"]),
                }
            )
        return out

    def version(self) -> int:
        return max(self._versions())

    # -- MERGE (the reason this class exists) ------------------------------

    def last_meta_value(self, key: str) -> Any:
        """Newest committed value of an application-metadata key (e.g.
        a streaming batch id) across the manifest log, or None."""
        for v in sorted(self._versions(), reverse=True):
            meta = self._manifest(v).get("meta") or {}
            if key in meta:
                return meta[key]
        return None

    def merge(
        self,
        source: DataFrame,
        on_duplicate_keys: str = "error",
        meta: dict | None = None,
    ) -> dict:
        """Copy-on-write MERGE: keys in both → source row wins; keys
        only in source → inserted. Only data files whose merge-key
        [min, max] overlaps the delta's range are rewritten; all other
        files carry into the new snapshot untouched. Returns
        ``{"version", "rewritten", "kept"}`` so callers can see the
        write amplification. Raises :class:`ConcurrentCommitError` if
        another writer commits first (re-read and re-merge to retry).
        """
        base_version = self.version()
        m = self._manifest(base_version)
        key = m["key_field"]
        schema = StructType.fromJson(json.loads(m["schema"]))
        _check_schema(source, schema, self.path)
        bounds = source.agg(
            F.min(key).alias("lo"), F.max(key).alias("hi")
        ).collect()[0]
        lo, hi = bounds["lo"], bounds["hi"]
        if lo is None:  # empty delta → nothing to do, no new version
            return {"version": base_version, "rewritten": 0, "kept": len(m["files"])}
        touched, kept = [], []
        for f in m["files"]:
            kmin, kmax = f["key_min"], f["key_max"]
            no_stats = kmin is None or kmax is None
            if no_stats or not (kmax < lo or kmin > hi):
                touched.append(f)
            else:
                kept.append(f)
        if touched:
            old = self.spark.read.schema(schema).parquet(
                *[str(self.path / f["path"]) for f in touched]
            )
            merged = merge_dataframes(
                old, source, [key], on_duplicate_keys=on_duplicate_keys
            )
        else:
            merged = source
        new_files = _write_data_files(self.spark, self.path, merged)
        manifest = {
            "version": base_version + 1,
            "op": "merge",
            "key_field": key,
            "schema": m["schema"],
            "files": kept + _stat_entries(self.path, new_files, key),
        }
        if meta:
            manifest["meta"] = meta
        _publish(self.path, base_version + 1, manifest)
        return {
            "version": base_version + 1,
            "rewritten": len(touched),
            "kept": len(kept),
        }

    def merge_with_retry(
        self,
        source: DataFrame,
        attempts: int = 3,
        on_duplicate_keys: str = "error",
        meta: dict | None = None,
    ) -> dict:
        """Optimistic-concurrency loop around :meth:`merge`: on
        :class:`ConcurrentCommitError` the merge re-reads the NEW
        snapshot and re-applies the delta (sound because MERGE is
        defined against whatever the current table state is — the
        loser's delta still wins per key over both the old rows and
        the rival's). Raises after ``attempts`` losses."""
        last: ConcurrentCommitError | None = None
        for _ in range(attempts):
            try:
                return self.merge(
                    source, on_duplicate_keys=on_duplicate_keys, meta=meta
                )
            except ConcurrentCommitError as exc:
                last = exc
        raise last  # type: ignore[misc]

    def append(self, df: DataFrame) -> dict:
        """Append-only commit: new files, no rewrite, no key check —
        the bulk-ingest fast path (dedup against existing keys is the
        caller's job or :meth:`merge`'s). O(delta) always."""
        base = self.version()
        m = self._manifest(base)
        schema = StructType.fromJson(json.loads(m["schema"]))
        _check_schema(df, schema, self.path)
        new_files = _write_data_files(self.spark, self.path, df)
        _publish(
            self.path,
            base + 1,
            {
                "version": base + 1,
                "op": "append",
                "key_field": m["key_field"],
                "schema": m["schema"],
                "files": m["files"] + _stat_entries(self.path, new_files, m["key_field"]),
            },
        )
        return {"version": base + 1, "added": len(new_files)}

    def compact(self, n_files: int | None = None) -> dict:
        """Rewrite the whole snapshot as ``n_files`` key-range-sorted
        files (the OPTIMIZE analog): merges and appends accumulate
        small files with overlapping key ranges, which erodes MERGE
        pruning; compaction restores narrow disjoint per-file ranges.
        Old files stay until :meth:`vacuum` (snapshot isolation)."""
        base = self.version()
        m = self._manifest(base)
        key = m["key_field"]
        df = self.read(base)
        out = (
            df.repartitionByRange(n_files, key)
            if n_files
            else df.repartitionByRange(key)
        )
        new_files = _write_data_files(self.spark, self.path, out)
        _publish(
            self.path,
            base + 1,
            {
                "version": base + 1,
                "op": "compact",
                "key_field": key,
                "schema": m["schema"],
                "files": _stat_entries(self.path, new_files, key),
            },
        )
        return {
            "version": base + 1,
            "before": len(m["files"]),
            "after": len(new_files),
        }

    # -- maintenance -------------------------------------------------------

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Delete data files referenced by NO retained manifest and
        prune the manifest log to the newest ``keep_last`` versions.
        Returns the deleted file paths. Readers of vacuumed snapshots
        fail — retention is the snapshot-isolation window, exactly as
        in Delta/Iceberg."""
        versions = sorted(self._versions())
        keep = set(versions[-keep_last:])
        live: set[str] = set()
        for v in keep:
            live.update(f["path"] for f in self._manifest(v)["files"])
        deleted = []
        data_root = self.path / _DATA_DIR
        for f in sorted(data_root.rglob("*.parquet")):
            rel = str(f.relative_to(self.path))
            if rel not in live:
                f.unlink()
                deleted.append(rel)
        for v in versions:
            if v not in keep:
                (self.path / _LOG_DIR / _mname(v)).unlink()
        return deleted

    # -- internals ---------------------------------------------------------

    def _versions(self) -> list[int]:
        vs = [
            int(p.stem)
            for p in (self.path / _LOG_DIR).glob("*.json")
            if p.stem.isdigit()
        ]
        if not vs:
            raise TxnTableNotFound(f"empty commit log at {self.path}")
        return vs

    def _manifest(self, version: int | None = None) -> dict:
        v = self.version() if version is None else version
        p = self.path / _LOG_DIR / _mname(v)
        if not p.exists():
            raise TxnTableNotFound(f"version {v} not found at {self.path}")
        return json.loads(p.read_text())


def _mname(version: int) -> str:
    return f"{version:020d}.json"


def _check_schema(df: DataFrame, schema: StructType, path: Path) -> None:
    """Structural (name, type) equality gate, nullability-insensitive —
    the same pre-MERGE contract as gcpde/bq.py:523-531."""
    if [(f.name, f.dataType) for f in df.schema.fields] != [
        (f.name, f.dataType) for f in schema.fields
    ]:
        raise SchemaMismatchException(
            f"source schema != table schema at {path}", df.schema, schema
        )


def _write_data_files(spark: SparkSession, root: Path, df: DataFrame) -> list[str]:
    """Write ``df`` as immutable parquet files under a fresh commit
    subdirectory; returns table-relative paths. Files are never moved
    or modified after this — manifests only reference them."""
    sub = f"{_DATA_DIR}/{uuid.uuid4().hex[:12]}"
    out = root / sub
    df.write.parquet(str(out))
    return [
        f"{sub}/{p.name}"
        for p in sorted(out.glob("*.parquet"))
    ]


def _stat_entries(root: Path, rel_files: list[str], key_field: str) -> list[dict]:
    entries = []
    for rel in rel_files:
        kmin, kmax, rows = _file_key_stats(str(root / rel), key_field)
        entries.append(
            {
                "path": rel,
                "rows": rows,
                "key_min": kmin,
                "key_max": kmax,
            }
        )
    return entries


def _publish(root: Path, version: int, manifest: dict) -> None:
    """Atomically publish a manifest: stage to a temp name, hard-link to
    the final name (fails with EEXIST if the version is taken), unlink
    the stage. POSIX link(2) is atomic; the manifest is either fully
    visible or absent."""
    log = root / _LOG_DIR
    stage = log / f".tmp-{uuid.uuid4().hex}.json"
    stage.write_text(json.dumps(manifest))
    final = log / _mname(version)
    try:
        os.link(stage, final)
    except FileExistsError as exc:
        raise ConcurrentCommitError(
            f"version {version} at {root} was committed by another writer; "
            "re-read the table and re-apply the merge"
        ) from exc
    finally:
        stage.unlink(missing_ok=True)
