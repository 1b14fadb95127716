"""Partitioned JSONL datasets — reference gcpde/gcs.py, Spark-native.

Operator parity map (SURVEY.md §2A):

- S1 upload_file              ≙ gcpde/gcs.py:131-159
- S2 add_records_to_dataset   ≙ gcpde/gcs.py:162-218
- S3 download_files           ≙ gcpde/gcs.py:321-339
- S4 list_files               ≙ gcpde/gcs.py:452-496
- S5 get_dataset              ≙ gcpde/gcs.py:560-597
- S6 _get_latest_path_files   ≙ gcpde/gcs.py:499-520
- S7 copy_files               ≙ gcpde/gcs.py:600-628
- S8 JSONL deserialization    ≙ gcpde/gcs.py:342-347

Path contract (kept bit-for-bit, gcpde/gcs.py:58-67,82-83,50-55):

    {dataset}/version={v}/year={y}/month={m}/day={d}/{dataset}__{YYYY-MM-DDTHH:00}.jsonl

— directory month/day are NOT zero-padded; the file-name datetime IS
zero-padded; the hour appears only in the file name.

Spark-first design: the reference's asyncio fan-out (one coroutine per
file, gcpde/gcs.py:286-296) is replaced by task parallelism —
``spark.read.json(paths)`` assigns one-or-more files per task, retries via
``spark.task.maxFailures``, and splits large JSONL files by line. The
record-level verbs (list[dict] in/out) stay driver-side exactly like the
reference; the ``*_df`` verbs are the 100 TB path.

Latest-partition pruning is **metadata-only**: partition tuples are parsed
from the file *listing* (never by scanning data), mirroring the
reference's client-side pruning (gcpde/gcs.py:499-520).
"""

from __future__ import annotations

import datetime as dt
import json
import time
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from gcpde_spark.retry import DOWNLOAD_BUDGET, UPLOAD_BUDGET, with_retries


def get_utc_now() -> dt.datetime:
    """≙ gcpde/base.py:6-8 — timezone-aware UTC now."""
    return dt.datetime.now(dt.timezone.utc)


@dataclass(frozen=True)
class DateTimePartitions:
    """Datetime partition values (≙ gcpde/gcs.py:42-55)."""

    year: int
    month: int
    day: int
    hour: int

    def __str__(self) -> str:
        # zero-padded ISO — used in FILE NAMES only
        return f"{self.year}-{self.month:02d}-{self.day:02d}T{self.hour:02d}:00"

    @classmethod
    def from_datetime(cls, ts: dt.datetime) -> "DateTimePartitions":
        return cls(year=ts.year, month=ts.month, day=ts.day, hour=ts.hour)


@dataclass(frozen=True)
class DownloadedFile:
    """≙ GCSDownloadedFile (gcpde/gcs.py:24-28)."""

    file_bytes: bytes
    path: str


def build_partition_path(dataset: str, version: str, p: DateTimePartitions) -> str:
    """Directory part of the contract — month/day NOT padded (gcpde/gcs.py:58-67)."""
    return f"{dataset}/version={version}/year={p.year}/month={p.month}/day={p.day}/"


def build_file_name(dataset: str, p: DateTimePartitions) -> str:
    """File-name part — zero-padded datetime (gcpde/gcs.py:82-83)."""
    return f"{dataset}__{p}.jsonl"


def get_latest_path_files(file_paths: list[str]) -> list[str]:
    """Keep only files in the max (version, year, month, day) partition.

    Same semantics as gcpde/gcs.py:499-520 (golden test
    tests/unit/test_gcs.py:225-242): parse every ``k=v`` path segment in
    order of appearance, take the lexicographically greatest int tuple,
    keep files whose path contains that partition.
    """
    partition_tuples = {
        tuple(
            int(seg.split("=", 1)[1]) for seg in path.split("/") if "=" in seg
        )
        for path in file_paths
    }
    latest = max(partition_tuples)
    needle = "version={}/year={}/month={}/day={}".format(*latest)
    return [p for p in file_paths if needle in p]


def deserialize_jsonl(files: list[DownloadedFile]) -> list[dict[str, Any]]:
    """bytes → records, one JSON object per line (≙ gcpde/gcs.py:342-347)."""
    out: list[dict[str, Any]] = []
    for f in files:
        out.extend(json.loads(line) for line in f.file_bytes.splitlines() if line.strip())
    return out


class DatasetStore:
    """Dataset verbs rooted at ``base_path`` (a local dir, hdfs://, gs://…).

    ``base_path`` plays the role of the reference's bucket; file paths in
    and out of this API are relative to it, like GCS object names.
    """

    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base_path = base_path.rstrip("/")

    # -- Hadoop FS plumbing (driver-side, scheme-agnostic) -------------------

    def _jpath(self, rel: str):
        # Built via java.net.URI, not Path(String): the dataset file-name
        # contract contains ':' (…T00:00.jsonl), which Path's string parser
        # misreads as a scheme separator (HADOOP-14217). URI path segments
        # allow colons.
        from urllib.parse import urlparse

        full = f"{self.base_path}/{rel}" if rel else self.base_path
        u = urlparse(full)
        jvm = self.spark._jvm
        if u.scheme:
            juri = jvm.java.net.URI(u.scheme, u.netloc or None, u.path, None, None)
        else:
            import os as _os

            juri = jvm.java.net.URI("file", None, _os.path.abspath(full), None, None)
        return jvm.org.apache.hadoop.fs.Path(juri)

    def _fs(self):
        if getattr(self, "_fs_cached", None) is not None:
            return self._fs_cached
        jvm = self.spark._jvm
        conf = self.spark._jsc.hadoopConfiguration()
        if "://" not in self.base_path or self.base_path.startswith("file:"):
            # The default local FS (a ChecksumFileSystem) writes a
            # ".{name}.crc" sidecar whose Path(parent, child) construction
            # rejects the ':' our file-name contract contains —
            # RawLocalFileSystem skips sidecars and handles colons fine.
            fs = jvm.org.apache.hadoop.fs.RawLocalFileSystem()
            fs.initialize(jvm.java.net.URI("file:///"), conf)
        else:
            fs = self._jpath("").getFileSystem(conf)
        self._fs_cached = fs
        return fs

    # Transient-failure envelope ≙ the reference's published budgets
    # (gcpde/gcs.py:221-235 download, gcpde/bq.py:367-375 upload); both
    # wrapped ops are idempotent (read; whole-file overwrite), so a
    # retried attempt converges instead of duplicating. ``_sleep`` is
    # injectable for tests.
    _sleep = staticmethod(time.sleep)

    def _retryable(self) -> tuple[type[BaseException], ...]:
        from py4j.protocol import Py4JJavaError

        return (IOError, OSError, Py4JJavaError)

    def _write_bytes(self, rel_path: str, data: bytes) -> None:
        def _once() -> None:
            fs = self._fs()
            out = fs.create(self._jpath(rel_path), True)
            try:
                out.write(data)
            finally:
                out.close()

        attempts, floor, cap = UPLOAD_BUDGET
        with_retries(
            _once, attempts, floor, cap,
            retry_on=self._retryable(), sleep=self._sleep,
        )

    def _read_bytes(self, rel_path: str) -> bytes:
        def _once() -> bytes:
            fs = self._fs()
            stream = fs.open(self._jpath(rel_path))
            try:
                ioutils = self.spark._jvm.org.apache.commons.io.IOUtils
                return bytes(ioutils.toByteArray(stream))
            finally:
                stream.close()

        attempts, floor, cap = DOWNLOAD_BUDGET
        return with_retries(
            _once, attempts, floor, cap,
            retry_on=self._retryable(), sleep=self._sleep,
        )

    def _walk(self, rel_prefix: str, recursive: bool) -> list[tuple[str, int]]:
        """List files under a prefix → [(rel_path, mtime_ms)]."""
        fs = self._fs()
        root = self._jpath(rel_prefix)
        if not fs.exists(root):
            return []
        base_uri = fs.makeQualified(self._jpath("")).toString().rstrip("/")
        out: list[tuple[str, int]] = []
        if recursive:
            it = fs.listFiles(root, True)
            while it.hasNext():
                st = it.next()
                rel = st.getPath().toString().replace(base_uri + "/", "", 1)
                out.append((rel, st.getModificationTime()))
        else:
            for st in fs.listStatus(root):
                if st.isFile():
                    rel = st.getPath().toString().replace(base_uri + "/", "", 1)
                    out.append((rel, st.getModificationTime()))
        return out

    # -- S1: upload_file ------------------------------------------------------

    def upload_file(
        self,
        content: str | bytes,
        file_name: str,
        content_type: str = "application/json",
    ) -> None:
        """Put one object (≙ gcpde/gcs.py:131-159). ``content_type`` is
        accepted for API parity; filesystems don't store it."""
        del content_type
        data = content.encode("utf-8") if isinstance(content, str) else content
        self._write_bytes(file_name, data)

    # -- S2: add_records_to_dataset --------------------------------------------

    def add_records_to_dataset(
        self,
        json_str_records: list[str],
        dataset: str,
        version: str = "1",
        datetime_partition: DateTimePartitions | None = None,
        build_file_name_fn: Callable[[], str] | None = None,
    ) -> None:
        """Join records into ONE JSONL file at the conventional path
        (≙ gcpde/gcs.py:162-218, incl. the empty guard :189-191 and the
        get_utc_now default partition :196-199)."""
        if not json_str_records:
            return  # warn-and-return parity
        p = datetime_partition or DateTimePartitions.from_datetime(get_utc_now())
        file_path = build_partition_path(dataset, version, p)
        name = build_file_name_fn() if build_file_name_fn else build_file_name(dataset, p)
        self._write_bytes(file_path + name, "\n".join(json_str_records).encode("utf-8"))

    def add_dataframe_to_dataset(
        self,
        df: DataFrame,
        dataset: str,
        version: str = "1",
        ts_column: str | None = None,
        datetime_partition: DateTimePartitions | None = None,
    ) -> None:
        """Scale path for S2: distributed partitioned JSONL append.

        Either derive (year, month, day) per-row from ``ts_column`` —
        a true streaming-style hourly/daily append — or pin a single
        partition. Spark writes unpadded ``month=1`` partition dirs, which
        matches the reference's directory contract exactly.
        """
        from pyspark.sql import functions as F

        if (ts_column is None) == (datetime_partition is None):
            raise ValueError("provide exactly one of ts_column / datetime_partition")
        base = f"{self.base_path}/{dataset}"
        if ts_column is not None:
            out = (
                df.withColumn("version", F.lit(version))
                .withColumn("year", F.year(ts_column))
                .withColumn("month", F.month(ts_column))
                .withColumn("day", F.dayofmonth(ts_column))
            )
        else:
            p = datetime_partition
            out = (
                df.withColumn("version", F.lit(version))
                .withColumn("year", F.lit(p.year))
                .withColumn("month", F.lit(p.month))
                .withColumn("day", F.lit(p.day))
            )
        out.write.mode("append").partitionBy("version", "year", "month", "day").json(base)

    def compact_dataset(
        self,
        dataset: str,
        version: str = "1",
        target_file_bytes: int = 128 << 20,
        min_files: int = 2,
    ) -> dict[str, tuple[int, int]]:
        """Compact the small-file debris of a streamed/appended dataset:
        each day partition whose JSONL files could pack into fewer
        ``target_file_bytes``-sized files is rewritten coalesced and
        swapped in via rename-aside. Returns
        ``{partition_dir: (files_before, files_after)}`` for the
        partitions actually rewritten.

        Byte-preserving by construction: files are read as TEXT lines and
        written back verbatim — no JSON schema inference, so no type
        drift, field reordering, or null-column loss can occur, and the
        rewrite is safe for data whose schema the engine has never seen.
        The work is distributed (a read + repartition + write per
        partition); the driver only lists directories and file sizes.

        At lake scale this is the maintenance job that keeps ``S5'``
        reads from degrading: a day that accumulated thousands of
        per-micro-batch files becomes a handful of right-sized ones, so
        scans open O(data / 128 MB) files instead of O(append count).
        """
        import math

        fs = self._fs()
        stats: dict[str, tuple[int, int]] = {}
        for part_dir in self._partition_dirs(dataset, version):
            jdir = self._jpath(part_dir)
            files = [
                (st.getPath(), int(st.getLen()))
                for st in fs.listStatus(jdir)
                if st.isFile() and not st.getPath().getName().startswith((".", "_"))
            ]
            if len(files) < min_files:
                continue
            total = sum(sz for _, sz in files)
            n_out = max(1, math.ceil(total / target_file_bytes))
            if n_out >= len(files):
                continue  # already at/below the target layout
            paths = [p.toString() for p, _ in files]
            staged_rel = f"{part_dir}.__compact_tmp"
            trash_rel = f"{part_dir}.__compact_old"
            (
                self.spark.read.text(paths)
                .repartition(n_out)
                .write.mode("overwrite")
                .text(f"{self.base_path}/{staged_rel}")
            )
            jstaged, jtrash = self._jpath(staged_rel), self._jpath(trash_rel)
            # drop committer markers (_SUCCESS) from the staged dir — the
            # partition layout contract has data files only
            for st in fs.listStatus(jstaged):
                if st.getPath().getName().startswith(("_", ".")):
                    fs.delete(st.getPath(), False)
            fs.delete(jtrash, True)
            if not fs.rename(jdir, jtrash):  # pragma: no cover — FS races
                fs.delete(jstaged, True)
                raise IOError(f"compact: could not move {part_dir} aside")
            if not fs.rename(jstaged, jdir):  # pragma: no cover
                fs.rename(jtrash, jdir)  # roll back
                raise IOError(f"compact: could not swap in {staged_rel}")
            fs.delete(jtrash, True)
            after = sum(
                1
                for st in fs.listStatus(jdir)
                if st.isFile() and not st.getPath().getName().startswith((".", "_"))
            )
            stats[part_dir] = (len(files), after)
        return stats

    # -- S3: download_files ------------------------------------------------------

    def download_files(self, file_paths: list[str]) -> list[DownloadedFile]:
        """Fetch raw bytes for explicit paths (≙ gcpde/gcs.py:321-339).

        Driver-side by design — byte-level parity verb. The distributed
        equivalent is ``spark.read.format("binaryFile")`` (see
        gcpde_spark.llm.multimodal) or the JSON reader in get_dataset_df.
        """
        return [DownloadedFile(self._read_bytes(p), p) for p in file_paths]

    # -- S4: list_files ------------------------------------------------------------

    def list_files(
        self,
        prefix: str = "",
        updated_after: dt.datetime | None = None,
        updated_before: dt.datetime | None = None,
        recursive: bool = False,
    ) -> list[str]:
        """List files under a prefix with inclusive mtime filters
        (≙ gcpde/gcs.py:452-496; filters client-side on metadata, :404-417;
        non-recursive ≙ delimiter='/', :389-390)."""
        entries = self._walk(prefix, recursive)

        def _ms(t: dt.datetime) -> int:
            if t.tzinfo is None:
                t = t.replace(tzinfo=dt.timezone.utc)
            return int(t.timestamp() * 1000)

        if updated_after is not None:
            lo = _ms(updated_after)
            entries = [e for e in entries if e[1] >= lo]
        if updated_before is not None:
            hi = _ms(updated_before)
            entries = [e for e in entries if e[1] <= hi]
        return [p for p, _ in entries]

    # -- S5/S6: get_dataset ------------------------------------------------------

    def _dataset_files(
        self, dataset: str, version: str, latest_partition_only: bool
    ) -> list[str]:
        files = self.list_files(f"{dataset}/version={version}", recursive=True)
        if latest_partition_only and files:
            files = get_latest_path_files(files)
        return files

    def _partition_dirs(self, dataset: str, version: str) -> list[str]:
        """Relative day-partition directories of a dataset — a directory
        walk (3 listStatus levels), never a file listing. At millions of
        files per dataset the driver touches O(days) directory entries,
        not O(files)."""
        fs = self._fs()
        root = self._jpath(f"{dataset}/version={version}")
        if not fs.exists(root):
            return []
        base_uri = fs.makeQualified(self._jpath("")).toString().rstrip("/")
        out: list[str] = []
        for ydir in fs.listStatus(root):
            if not ydir.isDirectory():
                continue
            for mdir in fs.listStatus(ydir.getPath()):
                if not mdir.isDirectory():
                    continue
                for ddir in fs.listStatus(mdir.getPath()):
                    if ddir.isDirectory():
                        out.append(
                            ddir.getPath().toString().replace(base_uri + "/", "", 1)
                        )
        return out

    def get_dataset_df(
        self,
        dataset: str,
        version: str = "1",
        latest_partition_only: bool = False,
        schema: StructType | None = None,
        since: "dt.date | None" = None,
    ) -> DataFrame:
        """Distributed dataset scan (the 100 TB path for S5).

        Partition pruning is metadata-only (≙ gcpde/gcs.py:499-520), and
        the reader receives partition DIRECTORIES, not a driver-built
        file list: the driver walks 3 directory levels to find (year,
        month, day) partitions, optionally keeps only the latest, and
        hands those paths to ``spark.read.json`` — file expansion then
        happens in Spark's distributed file index, so a dataset with
        millions of files costs the driver only its day count.

        ``since`` prunes to day partitions ≥ the given date — the
        incremental-consumption pattern (process yesterday's appends,
        backfill from a checkpoint date) at directory-listing cost; it
        composes with ``latest_partition_only`` (latest wins).
        """
        dirs = self._partition_dirs(dataset, version)
        if since is not None:

            def _day(p: str) -> dt.date:
                parts = dict(
                    seg.split("=", 1) for seg in p.split("/") if "=" in seg
                )
                return dt.date(
                    int(parts["year"]), int(parts["month"]), int(parts["day"])
                )

            dirs = [p for p in dirs if _day(p) >= since]
        if latest_partition_only and dirs:
            # reuse the same max-(version,year,month,day) tuple rule;
            # directories parse exactly like file paths
            dirs = get_latest_path_files(dirs)
        if not dirs:
            raise FileNotFoundError(
                f"no files for dataset={dataset} version={version} under {self.base_path}"
            )
        paths = [f"{self.base_path}/{p}" for p in dirs]
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(paths)

    def get_dataset(
        self,
        dataset: str,
        version: str = "1",
        latest_partition_only: bool = False,
    ) -> list[dict[str, Any]]:
        """Record-level dataset read (≙ gcpde/gcs.py:560-597).

        Parses JSONL with Python ``json`` (not the Spark reader) so records
        round-trip the reference's dict semantics exactly — heterogeneous
        rows stay heterogeneous dicts, field order preserved.
        """
        files = self._dataset_files(dataset, version, latest_partition_only)
        return deserialize_jsonl(self.download_files(files))

    # -- S7: copy_files -------------------------------------------------------------

    def copy_files(
        self,
        src_prefix: str,
        dst_store: "DatasetStore | None" = None,
        dst_prefix: str = "",
    ) -> int:
        """Copy every file under ``src_prefix`` into another store/prefix
        (≙ gcpde/gcs.py:600-628 bucket-to-bucket server-side copy).
        Returns the number of files copied."""
        dst = dst_store or self
        files = self.list_files(src_prefix, recursive=True)
        src_fs = self._fs()
        dst_fs = dst._fs()
        util = self.spark._jvm.org.apache.hadoop.fs.FileUtil
        conf = self.spark._jsc.hadoopConfiguration()
        for rel in files:
            suffix = rel[len(src_prefix):].lstrip("/") if src_prefix else rel
            target_rel = f"{dst_prefix.rstrip('/')}/{suffix}" if dst_prefix else suffix
            util.copy(
                src_fs, self._jpath(rel), dst_fs, dst._jpath(target_rel), False, True, conf
            )
        return len(files)
