r"""Minimal copy-on-write transactional table format — the backend the
:class:`gcpde_spark.tables.MergeIntoBackend` seam anticipates, realized
in pure Spark + stdlib (SURVEY.md §7 "take Delta and get MERGE free";
the sandbox ships no Delta/Iceberg runtime, so this implements the same
three mechanisms from scratch at their minimal useful size):

1. **Manifest-based snapshots** — a table is a directory of immutable
   parquet data files plus a ``_txn_log/`` of numbered JSON manifests;
   the highest manifest IS the table state. Readers resolve one
   manifest and only ever see that snapshot's file list, so a
   concurrent writer can never show them a half-rewritten table.
2. **Atomic, conflict-detecting commits** — publishing a manifest is
   ONE pluggable primitive (:mod:`gcpde_spark.commit_backend`):
   exclusive creation of the version's manifest object. The default
   :class:`PosixLinkBackend` stages to a temp name and ``os.link``\ s
   it (hard-link create fails with EEXIST if the version exists —
   atomic on any POSIX filesystem); for object stores,
   :class:`ConditionalPutBackend` issues an if-none-match conditional
   PUT and resolves ambiguous (applied-then-timed-out) outcomes by
   reading back the manifest's ``commit_id``. Either way two writers
   racing to version N+1 get exactly one winner and one
   :class:`ConcurrentCommitError`.
3. **File-pruned MERGE (the scale point)** — each manifest entry
   carries the data file's merge-key [min, max] from its parquet
   footer. ``merge`` rewrites ONLY the files whose key range overlaps
   the incoming delta's range and re-links every other file unchanged:
   a 1-row delta into a key-sorted 100 TB table rewrites one file, not
   the table — O(delta + touched files), the cost model the
   ``upsert_table_df`` docstring promises from a transactional
   backend. (A file whose range does not overlap the delta's can not
   contain any delta key, so skipping it is sound, not approximate.)

Beyond MERGE the same three mechanisms carry the rest of the
transactional verb set: predicate ``delete``/``update`` (one
pushed-down scan finds the files containing matches; only those
rewrite — and sparse deletes skip even that via **deletion vectors**,
Delta's row-level-delete design: matched ``(file, row position)``
pairs in a parquet sidecar that every read anti-joins out through the
``_read_entries`` choke point, O(matched rows) instead of O(touched
files), with ``compact``/``maybe_compact`` materializing the vectors
away), additive schema evolution (``merge_schema=True``), Z-order
``compact``, manifest-pruned ``read(key_range=...)``, a per-commit
change feed (``read_changes`` — precise mode diffs only the touched
region, O(changes) not O(table)), and :class:`TxnMergeBackend`, which
plugs the whole thing into ``TableStore.upsert_table_df`` via the
:class:`gcpde_spark.tables.MergeIntoBackend` seam.

Out of scope, stated honestly: multi-table transactions, a bundled
cloud client (``ConditionalPutBackend`` takes any two-verb
put_if_absent/get adapter — the sandbox ships no GCS/S3 SDK, so the
shipped store is the fault-injecting local simulator; ``clone``'s
zero-copy hard links and catalog snapshot links also remain
POSIX-only conveniences — on an object store they become server-side
copies), and column-level stats beyond the merge key.
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import time
import uuid
from pathlib import Path
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from gcpde_spark.commit_backend import CommitBackend, PosixLinkBackend
from gcpde_spark.errors import ConcurrentCommitError as _ConcurrentCommitError
from gcpde_spark.errors import SchemaMismatchException
from gcpde_spark.tables import MergeIntoBackend, merge_dataframes

_LOG_DIR = "_txn_log"
_DATA_DIR = "data"
# process-wide default commit arbitration; override per table via
# TxnTable(..., commit_backend=...) / create(..., commit_backend=...)
# or globally via set_commit_backend (e.g. route every table at a
# gs://-style mount through ConditionalPutBackend)
_COMMIT_BACKEND: CommitBackend = PosixLinkBackend()


def set_commit_backend(backend: CommitBackend) -> CommitBackend:
    """Swap the process-wide default :class:`CommitBackend`; returns
    the previous one (so tests/context managers can restore it)."""
    global _COMMIT_BACKEND
    prev = _COMMIT_BACKEND
    _COMMIT_BACKEND = backend
    return prev
_CONSTRAINTS_KEY = "table_constraints"
# On-disk format version (docs/txn_format.md). Readers refuse manifests
# from a NEWER format (they may encode invariants — e.g. a new
# row-invalidity mechanism — that reading blindly would violate); older
# manifests are always readable (fields only ever gain meaning).
# v1: base format. v2: column mapping (logical->physical names) — a v1
# reader handed a mapped manifest would read.schema(logical) over
# physical files and silently surface NULL columns, hence the gate.
_FORMAT_VERSION = 2
_BLOOM_KEY = "table_bloom"
# per-file-per-column bitmap cap: 128 KiB ≈ 1 Mbit holds ~150k distinct
# values at 1% FPR; above that the filter degrades (never unsound)
_BLOOM_MAX_BYTES = 128 << 10

# deletion-vector sidecar schema: table-relative data-file path + the
# 0-based parquet row position (stable: data files are immutable)
_DV_SCHEMA = StructType(
    [
        StructField("_file", StringType(), False),
        StructField("_pos", LongType(), False),
    ]
)


def _dv_of(f: dict) -> dict:
    return f.get("dv") or {}


def _logical_rows(f: dict) -> int:
    """A manifest entry's visible row count: physical parquet rows
    minus its deletion-vector positions."""
    return f["rows"] - _dv_of(f).get("rows", 0)


def _entry_id(f: dict) -> tuple:
    """Content identity of a manifest entry: the data file path PLUS
    its deletion-vector reference — a DV delete changes an entry's
    visible rows without changing its path, and the precise change
    feed diffs entries, not paths."""
    d = _dv_of(f)
    return (f["path"], tuple(d.get("paths", ())), d.get("rows", 0))


def _attach_dv(
    files: "list[dict]", counts: "dict[str, int]", dv_files: "list[str]"
) -> list[dict]:
    """Manifest entries with the new consolidated vector reference
    attached to every entry that gained positions — shared by all
    three DV write paths so the accounting cannot drift."""
    out = []
    for f in files:
        if f["path"] in counts:
            e = dict(f)
            e["dv"] = {
                "paths": dv_files,
                "rows": _dv_of(f).get("rows", 0) + counts[f["path"]],
            }
            out.append(e)
        else:
            out.append(f)
    return out


_RESERVED_COLS = ("_dv_file", "_dv_pos")


def _check_reserved(names: "Sequence[str]", path: "Path | str") -> None:
    """The lineage columns :meth:`TxnTable._read_entries` injects must
    never collide with user columns — a table carrying them would make
    every DV read and every auto/dv delete fail with an
    ambiguous-reference error, long after create succeeded."""
    bad = [n for n in names if n in _RESERVED_COLS]
    if bad:
        raise ValueError(
            f"column name(s) {bad} are reserved for deletion-vector "
            f"lineage in transactional tables ({path})"
        )


def _constraints_of(m: dict) -> "dict[str, str]":
    return (m.get("meta") or {}).get(_CONSTRAINTS_KEY) or {}


def _check_constraints(df: DataFrame, constraints: "dict[str, str]") -> None:
    """Enforce CHECK constraints on a write's rows in ONE aggregation
    pass — delegated to :func:`gcpde_spark.checks.run_checks` (one
    scan, all conditional counts in a shared hash-agg buffer) rather
    than re-implementing the same plan shape. SQL CHECK semantics: a
    row violates only when the expression is FALSE; NULL passes. Cost
    is one extra job over the rows being written — the touched region,
    never the table (the price Delta's invariants pay too)."""
    if not constraints:
        return
    from gcpde_spark.checks import run_checks

    preds = [
        (name, F.coalesce(F.expr(constraints[name]), F.lit(True)) == F.lit(False))
        for name in sorted(constraints)
    ]
    bad = {
        r["check"]: int(r["n_violations"])
        for r in run_checks(df, preds).collect()
        if r["n_violations"]
    }
    if bad:
        raise ConstraintViolation(bad, constraints)


class ConstraintViolation(Exception):
    """A write's rows violate the table's CHECK constraints. Carries
    ``violations``: {constraint name: violating-row count}."""

    def __init__(self, violations: "dict[str, int]", sqls: "dict[str, str]"):
        self.violations = violations
        detail = ", ".join(
            f"{name} ({n} rows: CHECK {sqls[name]!r})"
            for name, n in sorted(violations.items())
        )
        super().__init__(f"CHECK constraint(s) violated: {detail}")


# Commit arbitration is pluggable (gcpde_spark/commit_backend.py):
# POSIX link(2) by default, conditional-PUT for object stores. The
# error type moved to errors.py so backends can raise it without a
# circular import; re-bound here for every existing caller.
ConcurrentCommitError = _ConcurrentCommitError


class NonAdditiveBoundaryError(ValueError):
    """A change feed was asked to span a column rename/drop commit —
    commits before it emit the old names, commits after the new, and a
    union would be a frankenschema whose NULLs masquerade as changes.
    Read the segments separately or re-seed the consumer."""


class TxnTableNotFound(Exception):
    pass


_STATS_MAX_COLS = 32
_STATS_TYPES = (int, float, str, bool, datetime.date, datetime.datetime)


def _stat_repr(v: Any) -> Any:
    """Canonical JSON-safe STORAGE form of a parquet-footer stat.
    Timestamps and dates become ISO-8601 strings — lexicographic order
    on them equals chronological order (fixed-width date, '.' < any
    digit, so varying fractional precision still compares correctly),
    which is what lets string comparison prune soundly. Aware
    timestamps (instant columns: parquet isAdjustedToUTC) normalize to
    UTC-naive; naive ones (TIMESTAMP_NTZ: wall-clock semantics) store
    their wall value as-is. Everything else passes through."""
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _norm_bound(v: Any, dtype: Any) -> Any:
    """Normalize ONE query/delta bound into the same representation
    :func:`_stat_repr` stored for its column — type-aware, because the
    sound interpretation of a naive datetime depends on the column:

    - instant (TIMESTAMP) column: stats are true UTC. A naive bound is
      interpreted in the DRIVER-LOCAL zone — that is what PySpark
      itself does with naive datetimes (``collect()`` returns
      driver-local naive; ``TimestampType.toInternal`` reads naive as
      local), so merge-path bounds collected from Spark and user
      literals both land on the instant Spark's own row filter uses.
    - TIMESTAMP_NTZ column: wall-clock on both sides; pass through.
    - DATE column: a datetime bound floors to its date — widening-only
      on both ends (a lo of midnight must NOT out-sort a stats max of
      the same day, the classic off-by-equality; any sharper time part
      only over-keeps, and the residual row filter is exact anyway).
    """
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    if v is None:
        return None
    if isinstance(dtype, DateType):
        if isinstance(v, datetime.datetime):
            v = v.date()
        return v.isoformat() if isinstance(v, datetime.date) else v
    if isinstance(dtype, TimestampType) and isinstance(v, datetime.datetime):
        if v.tzinfo is None:
            v = v.astimezone()  # driver-local, per PySpark semantics
        return v.astimezone(datetime.timezone.utc).replace(tzinfo=None).isoformat()
    if isinstance(dtype, TimestampNTZType) and isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    return _stat_repr(v)


def _bloom_of(m: dict) -> dict:
    return (m.get("meta") or {}).get(_BLOOM_KEY) or {}


# ---------------------------------------------------------------------------
# column mapping (metadata-only rename/drop — format_version 2)
# ---------------------------------------------------------------------------


def _mapping_of(m: dict) -> "dict[str, str]":
    """logical column name -> PHYSICAL parquet column name. Empty =
    identity (every pre-mapping table). Becomes explicit (every column
    listed) the first time rename/drop/add-under-mapping runs, and from
    then on physical names are immutable birth names — rename changes
    only the logical key, and a column added after mapping activates
    gets a fresh uuid-suffixed physical name so it can NEVER collide
    with a dropped column's bytes still sitting in old files
    (resurrection is the failure mode; Delta's column-id construction
    solves the same thing)."""
    return m.get("column_mapping") or {}


def _phys(mapping: "dict[str, str]", name: str) -> str:
    return mapping.get(name, name)


def _physical_schema(schema: StructType, mapping: "dict[str, str]") -> StructType:
    if not mapping:
        return schema
    return StructType(
        [
            StructField(_phys(mapping, f.name), f.dataType, f.nullable)
            for f in schema.fields
        ]
    )


def _to_physical(df: DataFrame, mapping: "dict[str, str]") -> DataFrame:
    """Rename mapped logical columns to their physical names; columns
    outside the mapping (lineage/tag helpers) pass through."""
    if not mapping:
        return df
    return df.select(
        *[
            F.col(c).alias(mapping[c]) if c in mapping else F.col(c)
            for c in df.columns
        ]
    )


def _extended_mapping(
    mapping: "dict[str, str]", schema: StructType, added: "list[str]"
) -> "dict[str, str]":
    """Mapping after additive evolution. Inactive mapping stays
    inactive (physical == logical, nothing stored). Active mapping
    becomes explicit for every schema column, and each ADDED column
    gets a fresh physical birth name."""
    if not mapping:
        return mapping
    out = {f.name: _phys(mapping, f.name) for f in schema.fields if f.name not in added}
    for name in added:
        out[name] = f"{name}-{uuid.uuid4().hex[:8]}"
    return out


def _fmt_fields(mapping: "dict[str, str]") -> dict:
    """The format-carrying manifest fields every verb must copy."""
    return {"column_mapping": mapping} if mapping else {}


def _bloom_canon(v: Any, tag: str) -> bytes:
    """Type-tagged canonical bytes of a bloom-indexed value. The tag is
    derived from the DECLARED column type on both sides (write: arrow
    schema; read: table schema), so `5` in a BIGINT column hashes the
    same whether the caller passes int or the footer yields int64 —
    python-object identity never decides membership."""
    if tag == "i":
        s = f"i:{int(v)}"
    elif tag == "s":
        s = f"s:{v}"
    elif tag == "b":
        s = f"b:{bool(v)}"
    else:  # "t": dates/timestamps, already ISO via _stat_repr/_norm_bound
        s = f"t:{v}"
    return s.encode("utf-8")


def _bloom_hashes(data: bytes, m_bits: int, k: int) -> "list[int]":
    """k bit positions via double hashing over one blake2b digest."""
    import hashlib

    d = hashlib.blake2b(data, digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [(h1 + j * h2) % m_bits for j in range(k)]


def _bloom_tag(dtype: Any) -> "str | None":
    """Canonicalization tag for a Spark type, or None if the type is
    refused for bloom indexing (floats: equality is a smell and repr
    drift would be unsound; binary/nested/decimal: no stable canon)."""
    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DateType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    if isinstance(dtype, (ByteType, ShortType, IntegerType, LongType)):
        return "i"
    if isinstance(dtype, StringType):
        return "s"
    if isinstance(dtype, BooleanType):
        return "b"
    if isinstance(dtype, (DateType, TimestampType, TimestampNTZType)):
        return "t"
    return None


def _bloom_params(n: int, fpp: float) -> tuple[int, int]:
    """Optimal (m_bits, k) for n distinct values at the target false-
    positive rate, capped at `_BLOOM_MAX_BYTES` (degrades FPR, never
    soundness)."""
    import math

    n = max(n, 1)
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m = min(max(m, 64), _BLOOM_MAX_BYTES * 8)
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _bloom_build(path: str, cols: "list[str]", fpp: float) -> dict:
    """Per-column bloom filters over a data file's DISTINCT non-null
    values, from one arrow read of just those columns. Returns
    {col: {"m": bits, "k": hashes, "b64": bitmap}} — sized per file
    (files differ in cardinality), stored in the manifest entry.
    Columns absent from the file (pre-evolution files) or of refused
    types are skipped: a file without a bloom is always kept."""
    import base64

    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    present = [c for c in cols if c in pf.schema_arrow.names]
    # absent columns (pre-evolution files) record an explicit None —
    # "no filter, keep the file" to readers, and "already decided, don't
    # re-read this file on every later commit" to the backfill
    out: dict = {c: None for c in cols if c not in present}
    if not present:
        return out
    import pyarrow.compute as pc

    table = pq.read_table(path, columns=present)
    for c in present:
        import pyarrow as pa

        field = table.schema.field(c)
        t = field.type
        if pa.types.is_integer(t):
            tag = "i"
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            tag = "s"
        elif pa.types.is_boolean(t):
            tag = "b"
        elif pa.types.is_temporal(t):
            tag = "t"
        else:
            out[c] = None
            continue
        uniq = [v for v in pc.unique(table.column(c)).to_pylist() if v is not None]
        m_bits, k = _bloom_params(len(uniq), fpp)
        bits = bytearray(m_bits // 8 + (1 if m_bits % 8 else 0))
        for v in uniq:
            if tag == "t":
                v = _stat_repr(v)
            for pos in _bloom_hashes(_bloom_canon(v, tag), m_bits, k):
                bits[pos >> 3] |= 1 << (pos & 7)
        out[c] = {
            "m": m_bits,
            "k": k,
            "b64": base64.b64encode(bytes(bits)).decode("ascii"),
        }
    return out


def _bloom_maybe_contains(bloom: dict, canon: bytes) -> bool:
    import base64

    bits = base64.b64decode(bloom["b64"])
    for pos in _bloom_hashes(canon, bloom["m"], bloom["k"]):
        if not (bits[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def _prune_by_bloom(
    entries: "list[dict]",
    eq: "dict[str, Any]",
    schema: StructType,
    mapping: "dict[str, str] | None" = None,
) -> "list[dict]":
    """Point-lookup data skipping: drop entries whose bloom filter for
    an equality column PROVES the value absent. Entries without a bloom
    for the column are kept (conservative); NULL equality never reaches
    here (read() refuses it — SQL `=` never matches NULL)."""
    fields = {f.name: f.dataType for f in schema.fields}
    canons: "dict[str, bytes]" = {}
    for col, v in eq.items():
        dtype = fields.get(col)
        tag = _bloom_tag(dtype) if dtype is not None else None
        if tag is None:
            continue
        canons[_phys(mapping or {}, col)] = _bloom_canon(
            _norm_bound(v, dtype), tag
        )
    if not canons:
        return entries
    out = []
    for f in entries:
        keep = True
        for col, canon in canons.items():
            bloom = (f.get("bloom") or {}).get(col)
            if bloom is not None and not _bloom_maybe_contains(bloom, canon):
                keep = False
                break
        if keep:
            out.append(f)
    return out


def _file_stats(path: str) -> tuple[dict[str, list], int]:
    """Per-column [min, max] for every top-level primitive column (up
    to ``_STATS_MAX_COLS``, JSON-representable types only) plus the row
    count, from the parquet FOOTER — metadata only, no data read. A
    column missing min/max in ANY row group carries no stats at all
    (partial stats would make pruning unsound). Driver-side per file;
    at very large file counts collect stats distributedly at write
    time instead (noted, not hidden)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    agg: dict[str, list] = {}
    bad: set[str] = set()
    order: list[str] = []
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if "." in name or name in bad:  # nested leaves don't prune
                continue
            st = col.statistics
            if (
                st is None
                or not st.has_min_max
                or not isinstance(st.min, _STATS_TYPES)
                or not isinstance(st.max, _STATS_TYPES)
            ):
                bad.add(name)
                agg.pop(name, None)
                continue
            mn, mx = _stat_repr(st.min), _stat_repr(st.max)
            if name in agg:
                agg[name] = [min(agg[name][0], mn), max(agg[name][1], mx)]
            else:
                agg[name] = [mn, mx]
                order.append(name)
    kept = [n for n in order if n in agg][:_STATS_MAX_COLS]
    return {n: agg[n] for n in kept}, md.num_rows


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

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        commit_backend: "CommitBackend | None" = None,
    ):
        self.spark = spark
        self.path = Path(path)
        # commit arbitration for THIS table (None → the process-wide
        # default, POSIX link(2)); pass a ConditionalPutBackend for
        # tables living on an object store
        self.commit_backend = commit_backend
        log = self.path / _LOG_DIR
        # an empty log dir is NOT a table: it is the residue of a
        # create() that crashed before publishing version 0 — treating
        # it as found would wedge every later reader/writer
        if not log.is_dir() or not any(
            p.stem.isdigit() for p in log.glob("*.json")
        ):
            raise TxnTableNotFound(f"no transactional table at {path}")

    def _commit(self, version: int, manifest: dict) -> None:
        """Publish ``manifest`` as ``version`` through this table's
        commit arbitration — the single choke point every verb's
        commit goes through."""
        _publish(self.path, version, manifest, backend=self.commit_backend)

    # -- lifecycle ---------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        key_field: str | Sequence[str],
        sort_by_key: bool = True,
        n_files: int | None = None,
        meta: dict | None = None,
        constraints: "dict[str, str] | None" = None,
        bloom_cols: "Sequence[str] | None" = None,
        bloom_fpp: float = 0.01,
        commit_backend: "CommitBackend | None" = None,
    ) -> "TxnTable":
        """Initialize a table from ``df``. ``sort_by_key`` range-sorts
        the initial files by the merge key, which is what makes future
        merges prune well (narrow non-overlapping per-file key ranges);
        unsorted data still merges correctly, just rewrites more.
        ``n_files`` pins the file count (size so each file is
        ~128 MB-1 GB at scale); without it AQE may coalesce small
        tables to one file, which defeats pruning.

        ``key_field`` may be a list for composite merge keys; file
        pruning intersects EVERY key dimension's [min, max] (sound: a
        key tuple matches only if all dimensions match, so a file
        disjoint on any one dimension cannot contain it — with a
        low-cardinality leading key the later dimensions do the real
        pruning)."""
        keys = [key_field] if isinstance(key_field, str) else list(key_field)
        p = Path(path)
        log = p / _LOG_DIR
        # exist_ok: a crashed create leaves an empty log dir behind and
        # a retry must succeed; a PUBLISHED table still refuses. Two
        # racing creators both reach _publish(0) and link(2) picks one
        # winner (the loser gets ConcurrentCommitError — open the table
        # and merge instead, as TxnMergeBackend does).
        _check_reserved(df.columns, path)
        log.mkdir(parents=True, exist_ok=True)
        if any(q.stem.isdigit() for q in log.glob("*.json")):
            raise ValueError(f"transactional table already exists at {path}")
        if constraints:
            _check_constraints(df, constraints)
            meta = {**(meta or {}), _CONSTRAINTS_KEY: dict(constraints)}
        if bloom_cols:
            fields = {f.name: f.dataType for f in df.schema.fields}
            for c in bloom_cols:
                if c not in fields or _bloom_tag(fields[c]) is None:
                    raise ValueError(
                        f"bloom column {c!r} missing or of unsupported type"
                    )
            meta = {
                **(meta or {}),
                _BLOOM_KEY: {"cols": list(bloom_cols), "fpp": float(bloom_fpp)},
            }
        if sort_by_key:
            out = (
                df.repartitionByRange(n_files, *keys)
                if n_files
                else df.repartitionByRange(*keys)
            )
        else:
            out = df
        files = _write_data_files(spark, p, out, constraints)
        manifest = {
            "version": 0,
            "op": "create",
            "key_field": keys[0],
            "key_fields": keys,
            "schema": df.schema.json(),
            "files": _stat_entries(p, files, keys[0]),
        }
        if meta:
            manifest["meta"] = meta
        _publish(p, 0, manifest, backend=commit_backend)
        return cls(spark, path, commit_backend=commit_backend)

    # -- snapshot reads ----------------------------------------------------

    def read(
        self,
        version: int | None = None,
        key_range: tuple[Any, Any] | None = None,
        ranges: "dict[str, tuple[Any, Any]] | None" = None,
        eq: "dict[str, Any] | None" = None,
    ) -> DataFrame:
        """Snapshot read with data skipping. ``key_range=(lo, hi)``
        (inclusive) bounds the merge key; ``ranges={col: (lo, hi)}``
        bounds ANY stats-carrying column (``None`` = open end) — both
        prune at the MANIFEST level: files whose per-column [min, max]
        cannot intersect a requested range are never handed to the scan
        at all, so at 100 TB / millions of files the listing and footer
        reads that row-group pruning alone still pays are skipped too.
        Non-key ranges are what :meth:`compact` with ``cluster_by``
        exists to sharpen (Z-order keeps every clustered column's
        per-file range narrow). The same bounds are re-applied as row
        filters — file ranges overlap a request without every row
        matching — so results are exact, and a column without stats
        simply doesn't prune (conservative, never lossy).

        ``eq={col: value}`` is the POINT-lookup form: it prunes by
        [min, max] like a ``(v, v)`` range AND by the per-file Bloom
        filters when the table indexes the column
        (:meth:`set_bloom_cols` / ``create(bloom_cols=...)``) — a
        needle-in-100 TB id probe touches only files whose filter
        admits the value, which range stats alone can't deliver on a
        high-cardinality column whose per-file ranges all overlap.
        NULL is refused (SQL ``=`` never matches NULL; use a range
        read + ``isNull`` filter for that)."""
        return self.read_with_receipt(version, key_range, ranges, eq)[0]

    def read_with_receipt(
        self,
        version: int | None = None,
        key_range: tuple[Any, Any] | None = None,
        ranges: "dict[str, tuple[Any, Any]] | None" = None,
        eq: "dict[str, Any] | None" = None,
    ) -> "tuple[DataFrame, int, int]":
        """:meth:`read` plus the data-skipping evidence:
        ``(df, files_scanned, files_total)`` — for callers (refresh
        receipts, audits) that would otherwise re-run the manifest
        prune just to count it."""
        m = self._manifest(version)
        schema = StructType.fromJson(json.loads(m["schema"]))
        entries, all_ranges = _pruned_entries(m, schema, key_range, ranges, eq)
        mp = _mapping_of(m)
        df = self._read_entries(schema, entries, mapping=mp)
        for col, (lo, hi) in all_ranges.items():
            if lo is not None and hi is not None:
                df = df.where(F.col(col).between(lo, hi))
            elif lo is not None:
                df = df.where(F.col(col) >= lo)
            elif hi is not None:
                df = df.where(F.col(col) <= hi)
        return df, len(entries), len(m["files"])

    def _read_entries(
        self,
        schema: StructType,
        entries: "list[dict]",
        with_lineage: bool = False,
        mapping: "dict[str, str] | None" = None,
    ) -> DataFrame:
        """THE read choke point: every consumer of manifest entries —
        snapshot reads, merge/update/apply_changes' touched region,
        precise change-feed diffs, restore validation, compaction —
        reads through here, so deletion vectors apply everywhere at
        once. Entries carrying a ``dv`` reference anti-join their
        deleted ``(file, row position)`` pairs out, using the parquet
        source's ``_metadata.row_index`` lineage (positions are stable
        because data files are immutable after their write; the file
        key is TABLE-RELATIVE so vectors stay valid across clone's
        hard-linked roots). ``with_lineage=True`` keeps the
        ``_dv_file``/``_dv_pos`` columns for callers that write
        deletion vectors themselves."""
        files = [str(self.path / f["path"]) for f in entries]
        dv_paths: set[str] = set()
        dv_rows = 0
        for f in entries:
            d = _dv_of(f)
            if d:
                dv_paths.update(d["paths"])
                dv_rows += d.get("rows", 0)
        if not files:
            out_schema = StructType(
                list(schema.fields)
                + (
                    [
                        StructField("_dv_file", StringType(), True),
                        StructField("_dv_pos", LongType(), True),
                    ]
                    if with_lineage
                    else []
                )
            )
            return self.spark.createDataFrame([], out_schema)
        # files store immutable PHYSICAL birth names; read by those and
        # surface the manifest's logical names at the END — the whole
        # of metadata-only rename is one projection, applied after the
        # deletion-vector machinery (which touches only the _metadata
        # pseudo-column and the _dv_* lineage names, and would lose
        # _metadata access under an interposed projection)
        df = self.spark.read.schema(
            _physical_schema(schema, mapping or {})
        ).parquet(*files)

        def _logical(d: DataFrame) -> DataFrame:
            if not mapping:
                return d
            keep = [c for c in d.columns if c in ("_dv_file", "_dv_pos")]
            return d.select(
                *[
                    F.col(_phys(mapping, f.name)).alias(f.name)
                    for f in schema.fields
                ],
                *keep,
            )

        if not dv_paths and not with_lineage:
            return _logical(df)
        # table-relative lineage from the path SUFFIX we control:
        # _metadata.file_path is a URI (percent-encoded, symlinks NOT
        # resolved), so stripping a resolved-root prefix silently
        # breaks on table paths with encodable characters or symlinked
        # components. The last two components — data/<uuid12>/<part> —
        # are written by _write_data_files from a URI-safe charset
        # (hex + Spark part names), so the suffix needs no decoding,
        # is independent of the root, and keeps vectors valid across
        # clone's hard-linked roots and table moves
        rel = F.concat(
            F.lit(_DATA_DIR + "/"),
            F.regexp_extract(
                F.col("_metadata.file_path"), "([^/]+/[^/]+)$", 1
            ),
        )
        df = df.select(
            "*",
            rel.alias("_dv_file"),
            F.col("_metadata.row_index").alias("_dv_pos"),
        )
        if dv_paths:
            dv = (
                self.spark.read.schema(_DV_SCHEMA)
                .parquet(*sorted(str(self.path / p) for p in dv_paths))
                .select(
                    F.col("_file").alias("_dv_file"),
                    F.col("_pos").alias("_dv_pos"),
                )
            )
            # deleted-position sets are deltas, not tables: broadcast
            # the anti-join while small (~1M positions ≈ tens of MB of
            # path+long rows — safe under default driver memory),
            # shuffle past that (at which point compaction is overdue;
            # dv_rows undercounts superseded generations still present
            # in shared sidecars, so the cutoff is deliberately low)
            if dv_rows <= 1_000_000:
                dv = F.broadcast(dv)
            df = df.join(dv, ["_dv_file", "_dv_pos"], "left_anti")
        df = _logical(df)
        return df if with_lineage else df.drop("_dv_file", "_dv_pos")

    def _consolidated_positions(
        self, positions: DataFrame, dvd: "list[dict]"
    ) -> DataFrame:
        """Union new ``(file, pos)`` pairs with the PRIOR vectors of
        the entries gaining a new one — each entry references exactly
        one consolidated vector set, so readers never chain
        sidecars."""
        prior_paths = sorted(
            {p for f in dvd for p in _dv_of(f).get("paths", [])}
        )
        if prior_paths:
            positions = positions.unionByName(
                self.spark.read.schema(_DV_SCHEMA)
                .parquet(*[str(self.path / p) for p in prior_paths])
                .where(F.col("_file").isin([f["path"] for f in dvd]))
            )
        return positions

    def history(self) -> list[dict]:
        """Commit log, newest first (version, op, file/row counts)."""
        out = []
        for v in sorted(self._versions(), reverse=True):
            m = self._manifest(v)
            out.append(
                {
                    "version": v,
                    "op": m["op"],
                    "ts": m.get("ts"),
                    "n_files": len(m["files"]),
                    "n_rows": sum(_logical_rows(f) for f in m["files"]),
                }
            )
        return out

    def constraints(self) -> "dict[str, str]":
        """The table's CHECK constraints ({name: sql}), enforced on the
        rows of every write verb. Live in rolled commit metadata, so
        compact/vacuum/maintenance can never silently drop them."""
        return dict(self.last_meta_value(_CONSTRAINTS_KEY) or {})

    def bloom_cols(self) -> "list[str]":
        """Columns currently bloom-indexed (empty when disabled)."""
        return list(_bloom_of(self._manifest()).get("cols") or [])

    def set_bloom_cols(self, cols: "Sequence[str]", fpp: float = 0.01) -> dict:
        """Enable (or with ``cols=()`` disable) per-file Bloom indexing
        for point lookups — the Delta/Iceberg bloom-index analog.

        The config rides the rolled commit meta, so EVERY later write
        verb builds filters for its new files without knowing the
        feature exists (``_publish`` choke point). The enable commit
        itself backfills CURRENT files (one indexed-column read per
        file — data files are immutable, so unlike Delta no rewrite is
        needed); any entry that still lacks a filter (e.g. a column
        absent from pre-evolution files) is simply never pruned
        (conservative). Allowed types:
        integer, string, boolean, date, timestamp; floats are refused
        (repr drift would make equality pruning unsound), as are
        nested/binary/decimal columns.

        Cost model: ~1.2 bytes per distinct value per file at the
        default 1% FPR, capped at 128 KiB per (file, column) — manifest
        growth is linear in file count, same order as the min/max
        stats already stored."""
        if not 0 < fpp < 0.5:
            raise ValueError(f"fpp must be in (0, 0.5), got {fpp}")
        base = self.version()
        m = self._manifest(base)
        schema = StructType.fromJson(json.loads(m["schema"]))
        fields = {f.name: f.dataType for f in schema.fields}
        for c in cols:
            if c not in fields:
                raise ValueError(f"bloom column {c!r} not in table schema")
            if _bloom_tag(fields[c]) is None:
                raise ValueError(
                    f"bloom column {c!r} has unsupported type "
                    f"{fields[c].simpleString()} (equality canon unstable)"
                )
        cfg = {"cols": list(cols), "fpp": float(fpp)} if cols else None
        manifest = {
            "version": base + 1,
            "op": "bloom",
            "key_field": _keys(m)[0],
            "key_fields": _keys(m),
            "schema": m["schema"],
            "files": m["files"],
            "meta": _rolled_meta(m, {_BLOOM_KEY: cfg}),
            **_fmt_fields(_mapping_of(m)),
        }
        self._commit(base + 1, manifest)
        return {"version": base + 1, "bloom_cols": list(cols)}

    def _schema_change_guards(self, m: dict, name: str) -> None:
        """Shared rename/drop refusals: constraints are SQL text over
        logical names — silently keeping a constraint that references a
        vanished name would wedge every later write, so the reference
        must be dropped (or rewritten) FIRST, explicitly."""
        import re as _re

        for cname, sql in _constraints_of(m).items():
            if _re.search(rf"\b{_re.escape(name)}\b", sql):
                raise ValueError(
                    f"column {name!r} is referenced by CHECK constraint "
                    f"{cname!r} ({sql!r}) — drop_constraint first"
                )

    def rename_column(self, old: str, new: str) -> dict:
        """Metadata-only column rename (the Delta column-mapping
        construction, format_version 2): data files keep their
        immutable PHYSICAL names and the manifest's logical→physical
        mapping re-labels them at read time — zero bytes rewritten at
        any table size. Key columns may be renamed (``key_fields``
        follows); constraints referencing the column must be dropped
        first; bloom-index configs follow the rename. Readers older
        than format v2 refuse the table afterwards (they would surface
        NULL for every mapped column)."""
        base = self.version()
        m = self._manifest(base)
        schema = StructType.fromJson(json.loads(m["schema"]))
        names = [f.name for f in schema.fields]
        if old not in names:
            raise ValueError(f"column {old!r} not in table schema")
        if new in names:
            raise ValueError(f"column {new!r} already exists")
        _check_reserved([new], self.path)
        self._schema_change_guards(m, old)
        mp = _mapping_of(m)
        # activate: the mapping becomes explicit for EVERY column, so
        # physical names are pinned from here on
        full = {f.name: _phys(mp, f.name) for f in schema.fields}
        full[new] = full.pop(old)
        new_schema = StructType(
            [
                StructField(new if f.name == old else f.name, f.dataType, f.nullable)
                for f in schema.fields
            ]
        )
        keys = [new if k == old else k for k in _keys(m)]
        meta_delta: dict = {}
        cfg = _bloom_of(m)
        if cfg and old in (cfg.get("cols") or []):
            meta_delta[_BLOOM_KEY] = {
                **cfg,
                "cols": [new if c == old else c for c in cfg["cols"]],
            }
        manifest = {
            "version": base + 1,
            "op": "rename_column",
            "key_field": keys[0],
            "key_fields": keys,
            "schema": new_schema.json(),
            "files": m["files"],
            "column_mapping": full,
        }
        rolled = _rolled_meta(m, meta_delta or None)
        if rolled:
            manifest["meta"] = rolled
        self._commit(base + 1, manifest)
        return {"version": base + 1, "renamed": {old: new}}

    def drop_column(self, name: str) -> dict:
        """Metadata-only column drop (format_version 2): the column
        leaves the logical schema and the mapping; its bytes stay in
        existing files (dead until :meth:`compact` rewrites them) and
        are never read again. Re-adding the same logical name later is
        safe: columns added under an active mapping get fresh physical
        birth names, so the old bytes can never resurrect. Key columns
        cannot be dropped; constraints referencing the column must go
        first; a bloom config on it is removed."""
        base = self.version()
        m = self._manifest(base)
        schema = StructType.fromJson(json.loads(m["schema"]))
        if name not in [f.name for f in schema.fields]:
            raise ValueError(f"column {name!r} not in table schema")
        if name in _keys(m):
            raise ValueError(f"column {name!r} is a merge key — not droppable")
        self._schema_change_guards(m, name)
        mp = _mapping_of(m)
        full = {
            f.name: _phys(mp, f.name)
            for f in schema.fields
            if f.name != name
        }
        new_schema = StructType(
            [f for f in schema.fields if f.name != name]
        )
        meta_delta: dict = {}
        cfg = _bloom_of(m)
        if cfg and name in (cfg.get("cols") or []):
            cols = [c for c in cfg["cols"] if c != name]
            meta_delta[_BLOOM_KEY] = {**cfg, "cols": cols} if cols else None
        manifest = {
            "version": base + 1,
            "op": "drop_column",
            "key_field": _keys(m)[0],
            "key_fields": _keys(m),
            "schema": new_schema.json(),
            "files": m["files"],
            "column_mapping": full,
        }
        rolled = _rolled_meta(m, meta_delta or None)
        if rolled:
            manifest["meta"] = rolled
        self._commit(base + 1, manifest)
        return {"version": base + 1, "dropped": name}

    def add_constraint(self, name: str, sql: str) -> dict:
        """Add a CHECK constraint. Validates EXISTING rows first (one
        full scan — the price of the guarantee, as Delta pays) and then
        publishes a metadata-only ``constraints`` commit; all
        subsequent writes enforce it on their touched region only.
        Optimistic concurrency like every other verb: the base version
        is captured BEFORE the validation scan, so a rival commit in
        between (whose rows this scan never saw, or whose own
        constraint change this one would erase) collides at publish
        with :class:`ConcurrentCommitError` instead of being silently
        absorbed."""
        base = self.version()
        m = self._manifest(base)
        current = dict((m.get("meta") or {}).get(_CONSTRAINTS_KEY) or {})
        if name in current:
            raise ValueError(f"constraint {name!r} already exists")
        _check_constraints(self.read(version=base), {name: sql})
        return self._constraints_commit(base, m, {**current, name: sql})

    def drop_constraint(self, name: str) -> dict:
        base = self.version()
        m = self._manifest(base)
        current = dict((m.get("meta") or {}).get(_CONSTRAINTS_KEY) or {})
        if name not in current:
            raise ValueError(f"no constraint named {name!r}")
        current.pop(name)
        return self._constraints_commit(base, m, current)

    def _constraints_commit(
        self, base: int, m: dict, new_map: "dict[str, str]"
    ) -> dict:
        manifest = {
            "version": base + 1,
            "op": "constraints",
            "key_field": _keys(m)[0],
            "key_fields": _keys(m),
            "schema": m["schema"],
            "files": m["files"],
            "meta": _rolled_meta(m, {_CONSTRAINTS_KEY: new_map}),
            **_fmt_fields(_mapping_of(m)),
        }
        self._commit(base + 1, manifest)
        return {"version": base + 1, "constraints": dict(new_map)}

    def _enforce(self, df: DataFrame, m: dict) -> None:
        _check_constraints(df, _constraints_of(m))

    def version_at(self, when: "float | datetime.datetime") -> int:
        """Timestamp time travel: the newest version committed at or
        before ``when`` (epoch seconds, or a datetime — naive is
        driver-local, PySpark's own convention). Pre-timestamp legacy
        manifests fall back to their file mtime. Raises if every
        retained commit is later than ``when`` (history before the
        oldest retained version is gone — vacuum)."""
        if isinstance(when, datetime.datetime):
            when = when.timestamp()
        best = None
        for v in sorted(self._versions()):
            m = self._manifest(v)
            ts = m.get("ts")
            if ts is None:
                ts = (self.path / _LOG_DIR / _mname(v)).stat().st_mtime
            if ts <= when:
                best = v
        if best is None:
            raise TxnTableNotFound(
                f"no commit at or before {when} is retained at {self.path}"
            )
        return best

    def version(self) -> int:
        return max(self._versions())

    # -- MERGE (the reason this class exists) ------------------------------

    def last_meta_value(self, key: str) -> Any:
        """Newest committed value of an application-metadata key (e.g.
        a streaming batch id), or None. Meta rolls forward through
        every commit (see ``_rolled_meta``), so the latest manifest
        alone carries the full map and vacuum/compact can never erase
        exactly-once tracking; the backward search below only serves
        legacy pre-roll manifests."""
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
        merge_schema: bool = False,
        strategy: str = "cow",
        dv_row_fraction: float = 0.2,
    ) -> dict:
        """MERGE: keys in both → source row wins; keys only in source
        → inserted. Raises :class:`ConcurrentCommitError` if another
        writer commits first (re-read and re-merge to retry). Two
        physical strategies:

        - ``strategy="cow"`` (default, copy-on-write): only data files
          whose merge-key [min, max] overlaps the delta's range are
          rewritten; all other files carry into the new snapshot
          untouched. Returns ``{"version", "rewritten", "kept"}`` so
          callers can see the write amplification.
        - ``strategy="mor"`` (merge-on-read, the Delta DV-merge
          construction): NO touched file rewrites — the superseded old
          rows become deletion-vector positions (one key semi-join
          over the range-pruned touched region) and the source rows
          write as new files. O(delta + matched rows) instead of
          O(touched files): the right trade for sparse CDC deltas into
          wide files, paid back as the read-side anti-join until
          :meth:`compact`/:meth:`maybe_compact` clears it.
        - ``strategy="auto"``: ``mor`` when the delta's row count is at
          most ``dv_row_fraction`` of the touched files' rows (a free
          upper bound on matches — both counts are already known),
          ``cow`` otherwise.

        ``merge_schema=True`` allows ADDITIVE evolution: the source may
        carry new columns (appended to the table schema as nullable;
        rows in untouched files read as NULL there — parquet resolves
        columns by name, so old files need no rewrite). It must still
        carry every existing column at its existing type; dropping or
        retyping columns stays a hard error.
        """
        if strategy not in ("cow", "mor", "auto"):
            raise ValueError(
                f"merge strategy must be cow|mor|auto, not {strategy!r}"
            )
        base_version = self.version()
        m = self._manifest(base_version)
        keys = _keys(m)
        schema = StructType.fromJson(json.loads(m["schema"]))
        mp = _mapping_of(m)
        if merge_schema:
            before = {f.name for f in schema.fields}
            schema = _evolved_schema(source, schema, self.path)
            mp = _extended_mapping(
                mp, schema, [f.name for f in schema.fields if f.name not in before]
            )
        else:
            _check_schema(source, schema, self.path)
        bounds = source.agg(
            *_key_bound_aggs(keys), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        if bounds["n"] == 0:  # empty delta → nothing to do, no new version
            return {"version": base_version, "rewritten": 0, "kept": len(m["files"])}
        touched, kept = [], []
        if bounds["lo0"] is None:
            # every delta row's LEADING key is NULL: NULL never equals a
            # stored key, so no file can match — all rows INSERT (the
            # same outcome a null-key row gets when a non-null sibling
            # key forces the rewrite path; consistent, no silent drop)
            kept = list(m["files"])
        else:
            touched, kept = _split_by_delta_bounds(
                m["files"], keys, bounds, schema, mp
            )
        src = source.select(*[f.name for f in schema.fields])
        self._enforce(src, m)
        if touched and strategy != "cow":
            if strategy == "mor" or bounds["n"] <= dv_row_fraction * sum(
                _logical_rows(f) for f in touched
            ):
                return self._merge_via_dv(
                    m, schema, keys, src, touched, on_duplicate_keys, meta, mp
                )
        if touched:
            old = self._read_entries(schema, touched, mapping=mp)
            merged = merge_dataframes(
                old, src, keys, on_duplicate_keys=on_duplicate_keys
            )
        else:
            merged = src
        new_files = _write_data_files(
            self.spark, self.path, merged, _constraints_of(m), mapping=mp
        )
        manifest = {
            "version": base_version + 1,
            "op": "merge",
            "key_field": keys[0],
            "key_fields": keys,
            "schema": schema.json(),
            "files": kept + _stat_entries(self.path, new_files, keys[0], mp),
            **_fmt_fields(mp),
        }
        rolled = _rolled_meta(m, meta)
        if rolled:
            manifest["meta"] = rolled
        self._commit(base_version + 1, manifest)
        out = {
            "version": base_version + 1,
            "rewritten": len(touched),
            "kept": len(kept),
        }
        if strategy == "mor":
            # an explicit-mor pure-insert delta (no range-overlapping
            # files) lands here: keep the mor receipt shape so callers
            # can rely on the keys regardless of data distribution
            out["matched_rows"] = 0
            out["dv_files"] = 0
        return out

    def _merge_via_dv(
        self,
        m: dict,
        schema: StructType,
        keys: "list[str]",
        src: DataFrame,
        touched: "list[dict]",
        on_duplicate_keys: str,
        meta: dict | None,
        mp: "dict[str, str] | None" = None,
    ) -> dict:
        """MERGE as merge-on-read: old rows whose key appears in the
        source become deletion-vector positions (a key semi-join over
        the range-pruned touched files — the scan copy-on-write never
        pays, bought back many times over by not copying any file) and
        the source rows write as new files. The matched set persists
        across its two consumers (per-file counts, positions sidecar)
        so both see one materialization. The duplicate-key guard is
        the SAME plan merge_dataframes installs — built by merging
        into an empty target, so the two strategies cannot drift on
        MERGE's error semantics."""
        base = m["version"]
        mp = mp if mp is not None else _mapping_of(m)
        src_keys = src.select(*keys).distinct()
        matched = (
            self._read_entries(schema, touched, with_lineage=True, mapping=mp)
            .join(src_keys, on=keys, how="left_semi")
            .select(
                F.col("_dv_file").alias("_file"),
                F.col("_dv_pos").alias("_pos"),
            )
            .persist()
        )
        try:
            # the guarded data write goes FIRST: the common failure
            # modes (duplicate source keys, constraint violation) fire
            # inside it, before any sidecar work is spent or orphaned
            guarded = merge_dataframes(
                self.spark.createDataFrame([], schema),
                src,
                keys,
                on_duplicate_keys=on_duplicate_keys,
            )
            new_files = _write_data_files(
                self.spark, self.path, guarded, _constraints_of(m), mapping=mp
            )
            counts = {
                r["_file"]: r["n"]
                for r in matched.groupBy("_file")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            dv_files: list[str] = []
            if counts:
                dvd = [f for f in touched if f["path"] in counts]
                positions = self._consolidated_positions(matched, dvd)
                dv_files = _write_data_files(
                    self.spark, self.path, positions.coalesce(1)
                )
        finally:
            matched.unpersist()
        manifest = {
            "version": base + 1,
            "op": "merge",
            "key_field": keys[0],
            "key_fields": keys,
            "schema": schema.json(),
            "files": _attach_dv(m["files"], counts, dv_files)
            + _stat_entries(self.path, new_files, keys[0], mp),
            **_fmt_fields(mp),
        }
        rolled = _rolled_meta(m, meta)
        if rolled:
            manifest["meta"] = rolled
        self._commit(base + 1, manifest)
        return {
            "version": base + 1,
            "rewritten": 0,
            "kept": len(m["files"]),
            "matched_rows": sum(counts.values()),
            "dv_files": len(dv_files),
        }

    def merge_with_retry(
        self,
        source: DataFrame,
        attempts: int = 3,
        on_duplicate_keys: str = "error",
        meta: dict | None = None,
        merge_schema: bool = False,
        strategy: str = "cow",
        dv_row_fraction: float = 0.2,
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
                    source,
                    on_duplicate_keys=on_duplicate_keys,
                    meta=meta,
                    merge_schema=merge_schema,
                    strategy=strategy,
                    dv_row_fraction=dv_row_fraction,
                )
            except ConcurrentCommitError as exc:
                last = exc
        raise last  # type: ignore[misc]

    def append(self, df: DataFrame, merge_schema: bool = False) -> dict:
        """Append-only commit: new files, no rewrite, no key check —
        the bulk-ingest fast path (dedup against existing keys is the
        caller's job or :meth:`merge`'s). O(delta) always.
        ``merge_schema`` as in :meth:`merge` (additive only)."""
        base = self.version()
        m = self._manifest(base)
        schema = StructType.fromJson(json.loads(m["schema"]))
        mp = _mapping_of(m)
        if merge_schema:
            before = {f.name for f in schema.fields}
            schema = _evolved_schema(df, schema, self.path)
            mp = _extended_mapping(
                mp, schema, [f.name for f in schema.fields if f.name not in before]
            )
        else:
            _check_schema(df, schema, self.path)
        out = df.select(*[f.name for f in schema.fields])
        self._enforce(out, m)
        new_files = _write_data_files(
            self.spark, self.path, out, _constraints_of(m), mapping=mp
        )
        manifest = {
            "version": base + 1,
            "op": "append",
            "key_field": _keys(m)[0],
            "key_fields": _keys(m),
            "schema": schema.json(),
            "files": m["files"]
            + _stat_entries(self.path, new_files, _keys(m)[0], mp),
            **_fmt_fields(mp),
        }
        rolled = _rolled_meta(m, None)
        if rolled:
            manifest["meta"] = rolled
        self._commit(base + 1, manifest)
        return {"version": base + 1, "added": len(new_files)}

    def overwrite(
        self,
        df: DataFrame,
        meta: dict | None = None,
        n_files: int | None = None,
        merge_schema: bool = False,
        sort_by_key: bool = True,
    ) -> dict:
        """``INSERT OVERWRITE`` analog: atomically replace the whole
        snapshot with ``df`` (previous versions stay readable until
        :meth:`vacuum`). O(new data) write — the full-refresh escape
        hatch (backfills, :func:`sync_table`'s resync fallback), not
        the incremental path."""
        base = self.version()
        m = self._manifest(base)
        keys = _keys(m)
        schema = StructType.fromJson(json.loads(m["schema"]))
        mp = _mapping_of(m)
        if merge_schema:
            before = {f.name for f in schema.fields}
            schema = _evolved_schema(df, schema, self.path)
            mp = _extended_mapping(
                mp, schema, [f.name for f in schema.fields if f.name not in before]
            )
        else:
            _check_schema(df, schema, self.path)
        out = df.select(*[f.name for f in schema.fields])
        self._enforce(out, m)
        if sort_by_key:
            out = (
                out.repartitionByRange(n_files, *keys)
                if n_files
                else out.repartitionByRange(*keys)
            )
        new_files = _write_data_files(
            self.spark, self.path, out, _constraints_of(m), mapping=mp
        )
        manifest = {
            "version": base + 1,
            "op": "overwrite",
            "key_field": keys[0],
            "key_fields": keys,
            "schema": schema.json(),
            "files": _stat_entries(self.path, new_files, keys[0], mp),
            **_fmt_fields(mp),
        }
        rolled = _rolled_meta(m, meta)
        if rolled:
            manifest["meta"] = rolled
        self._commit(base + 1, manifest)
        return {"version": base + 1, "added": len(new_files)}

    # -- DELETE / UPDATE (scan-targeted copy-on-write) ---------------------

    def delete(
        self,
        predicate: "Column | str",
        meta: dict | None = None,
        mode: str = "auto",
        dv_row_fraction: float = 0.2,
    ) -> dict:
        """``DELETE WHERE predicate`` with file-level targeting, the
        Delta/Iceberg construction, in two physical strategies:

        - ``mode="rewrite"``: ONE pushed-down scan finds the files
          containing at least one matching row; only those rewrite
          without their matching rows, every other file carries into
          the new snapshot untouched. O(scan + rewritten files).
        - ``mode="dv"`` (deletion vectors, Delta's row-level-delete
          design): NO data files rewrite at all — the matching
          ``(file, row position)`` pairs are written as a small parquet
          sidecar and the touched entries gain a ``dv`` reference that
          every read anti-joins out. O(scan + matched rows): deleting
          100 rows from a 100 TB table writes ~100 positions, where a
          rewrite would copy every touched file. The read-side debt is
          one broadcast anti-join; :meth:`compact` (or
          :meth:`maybe_compact`, which watches ``dv_fraction``)
          materializes vectors away and restores vector-free files.
        - ``mode="auto"`` (default): one lineage scan counts matches
          per file, then picks vectors when matches are at most
          ``dv_row_fraction`` of the touched files' rows (the
          delete-few case vectors exist for) and a classic rewrite
          when the predicate hits wide (where rewriting is cheaper
          than carrying big vectors).

        SQL ternary semantics: rows where the predicate is NULL are
        KEPT, exactly as ``DELETE FROM t WHERE p`` keeps them."""
        if mode not in ("auto", "rewrite", "dv"):
            raise ValueError(f"delete mode must be auto|rewrite|dv, not {mode!r}")
        base = self.version()
        m = self._manifest(base)
        schema = StructType.fromJson(json.loads(m["schema"]))
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        cond = F.coalesce(pred, F.lit(False))
        if mode == "rewrite":
            touched = self._files_matching(m, schema, cond)
            counts = None
        else:
            # one scan yields targeting AND per-file match counts
            live = self._read_entries(
                schema, m["files"], with_lineage=True, mapping=_mapping_of(m)
            )
            counts = {
                r["_dv_file"]: r["n"]
                for r in live.where(cond)
                .groupBy("_dv_file")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            touched = [f for f in m["files"] if f["path"] in counts]
        if not touched:
            return {"version": base, "rewritten": 0, "deleted_rows": 0}
        if counts is not None:
            total_matched = sum(counts.values())
            use_dv = mode == "dv" or total_matched <= dv_row_fraction * sum(
                _logical_rows(f) for f in touched
            )
            if use_dv:
                return self._delete_via_dv(m, schema, cond, touched, counts, meta)
        kept = [f for f in m["files"] if f not in touched]
        mp = _mapping_of(m)
        old = self._read_entries(schema, touched, mapping=mp)
        remaining = old.where(~cond)
        new_files = _write_data_files(
            self.spark, self.path, remaining, mapping=mp
        )
        entries = _stat_entries(self.path, new_files, _keys(m)[0], mp)
        manifest = {
            "version": base + 1,
            "op": "delete",
            "key_field": _keys(m)[0],
            "key_fields": _keys(m),
            "schema": m["schema"],
            "files": kept + entries,
            **_fmt_fields(mp),
        }
        rolled = _rolled_meta(m, meta)
        if rolled:
            manifest["meta"] = rolled
        self._commit(base + 1, manifest)
        return {
            "version": base + 1,
            "rewritten": len(touched),
            "kept": len(kept),
            "deleted_rows": sum(_logical_rows(f) for f in touched)
            - sum(e["rows"] for e in entries),
        }

    def _delete_via_dv(
        self,
        m: dict,
        schema: StructType,
        cond: Column,
        touched: "list[dict]",
        counts: "dict[str, int]",
        meta: dict | None,
    ) -> dict:
        """Publish a delete as deletion-vector sidecars: re-run the
        (already-pruned) match scan to materialize positions, union in
        the touched files' PRIOR vectors (each entry references exactly
        one consolidated vector set — readers never chain sidecars),
        and commit entries whose data files are byte-identical."""
        base = m["version"]
        mp = _mapping_of(m)
        matched = (
            self._read_entries(schema, touched, with_lineage=True, mapping=mp)
            .where(cond)
            .select(
                F.col("_dv_file").alias("_file"),
                F.col("_dv_pos").alias("_pos"),
            )
        )
        matched = self._consolidated_positions(matched, touched)
        # one sidecar file per delete: positions are tiny relative to
        # data, and every read opens the anti-join side — inheriting
        # the scan's partitioning would fragment it into per-task files
        dv_files = _write_data_files(self.spark, self.path, matched.coalesce(1))
        manifest = {
            "version": base + 1,
            "op": "delete",
            "key_field": _keys(m)[0],
            "key_fields": _keys(m),
            "schema": m["schema"],
            "files": _attach_dv(m["files"], counts, dv_files),
            **_fmt_fields(mp),
        }
        rolled = _rolled_meta(m, meta)
        if rolled:
            manifest["meta"] = rolled
        self._commit(base + 1, manifest)
        return {
            "version": base + 1,
            "rewritten": 0,
            "kept": len(m["files"]),
            "deleted_rows": sum(counts.values()),
            "dv_files": len(dv_files),
        }

    def update(
        self,
        assignments: "dict[str, Column | str]",
        where: "Column | str",
        meta: dict | None = None,
        mode: str = "auto",
        dv_row_fraction: float = 0.2,
    ) -> dict:
        """``UPDATE SET col = expr, ... WHERE predicate`` with the same
        scan-targeted file strategies as :meth:`delete`. Assignment
        expressions are cast to the column's existing type (the table
        schema never drifts through an update). Merge-key columns can
        not be updated — a key change moves a row between files, which
        is MERGE's job (delete + merge expresses it exactly).

        ``mode="rewrite"`` copies every file containing a match without
        its old rows' values (O(touched files)); ``mode="dv"`` is the
        merge-on-read construction — the matched ORIGINAL rows become
        deletion-vector positions and only the POST-assignment rows
        write as a new file, O(scan + matched rows), zero touched-file
        copies; ``mode="auto"`` (default) routes by the measured match
        fraction exactly as :meth:`delete` does."""
        if mode not in ("auto", "rewrite", "dv"):
            raise ValueError(f"update mode must be auto|rewrite|dv, not {mode!r}")
        base = self.version()
        m = self._manifest(base)
        keys = _keys(m)
        schema = StructType.fromJson(json.loads(m["schema"]))
        types = {f.name: f.dataType for f in schema.fields}
        for c in assignments:
            if c in keys:
                raise ValueError(
                    f"cannot update merge-key column {c!r}: a key change "
                    "moves the row between files — delete the old key and "
                    "merge the new row instead"
                )
            if c not in types:
                raise ValueError(f"unknown column {c!r} in UPDATE SET")
        pred = F.expr(where) if isinstance(where, str) else where
        cond = F.coalesce(pred, F.lit(False))
        if mode == "rewrite":
            touched = self._files_matching(m, schema, cond)
            counts = None
        else:
            live = self._read_entries(
                schema, m["files"], with_lineage=True, mapping=_mapping_of(m)
            )
            counts = {
                r["_dv_file"]: r["n"]
                for r in live.where(cond)
                .groupBy("_dv_file")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            touched = [f for f in m["files"] if f["path"] in counts]
        if not touched:
            return {"version": base, "rewritten": 0, "updated_rows": 0}
        if counts is not None:
            total_matched = sum(counts.values())
            use_dv = mode == "dv" or total_matched <= dv_row_fraction * sum(
                _logical_rows(f) for f in touched
            )
            if use_dv:
                return self._update_via_dv(
                    m, schema, types, assignments, cond, touched, meta
                )
        kept = [f for f in m["files"] if f not in touched]
        mp = _mapping_of(m)
        old = self._read_entries(schema, touched, mapping=mp)
        # bounded by the touched region; the auto routing scan already
        # counted the matches exactly — no second job for that case
        n_updated = (
            sum(counts.values())
            if counts is not None
            else old.where(cond).count()
        )
        # SQL UPDATE semantics: the WHERE predicate and EVERY assignment
        # expression see the ORIGINAL row (SET a=b, b=a swaps). One
        # select with a pre-evaluated match flag gives exactly that —
        # chained withColumn would let later expressions (and the
        # re-used predicate) observe earlier assignments' new values
        flagged = old.withColumn("_upd_match", cond)
        out_cols = []
        for f in schema.fields:
            if f.name in assignments:
                expr = assignments[f.name]
                col = F.expr(expr) if isinstance(expr, str) else expr
                out_cols.append(
                    F.when(F.col("_upd_match"), col.cast(types[f.name]))
                    .otherwise(F.col(f.name))
                    .alias(f.name)
                )
            else:
                out_cols.append(F.col(f.name))
        upd = flagged.select(*out_cols, F.col("_upd_match"))
        # POST-assignment values of the ORIGINALLY-matched rows must
        # satisfy the constraints (no-op job unless the table has any)
        self._enforce(upd.where(F.col("_upd_match")).drop("_upd_match"), m)
        upd = upd.drop("_upd_match")
        new_files = _write_data_files(
            self.spark, self.path, upd, _constraints_of(m), mapping=mp
        )
        manifest = {
            "version": base + 1,
            "op": "update",
            "key_field": keys[0],
            "key_fields": keys,
            "schema": m["schema"],
            "files": kept + _stat_entries(self.path, new_files, keys[0], mp),
            **_fmt_fields(mp),
        }
        rolled = _rolled_meta(m, meta)
        if rolled:
            manifest["meta"] = rolled
        self._commit(base + 1, manifest)
        return {
            "version": base + 1,
            "rewritten": len(touched),
            "kept": len(kept),
            "updated_rows": n_updated,
        }

    def _update_via_dv(
        self,
        m: dict,
        schema: StructType,
        types: dict,
        assignments: "dict[str, Column | str]",
        cond: Column,
        touched: "list[dict]",
        meta: dict | None,
    ) -> dict:
        """UPDATE as merge-on-read: the matched ORIGINAL rows become
        deletion-vector positions (their files stay byte-identical) and
        only the POST-assignment rows write as new files — O(scan +
        matched rows) instead of copying every touched file. The
        matched set is persisted so the positions sidecar and the new
        rows come from ONE materialization (a non-deterministic
        predicate re-evaluating differently between the two jobs would
        otherwise drop or duplicate rows)."""
        base = m["version"]
        keys = _keys(m)
        mp = _mapping_of(m)
        matched = (
            self._read_entries(schema, touched, with_lineage=True, mapping=mp)
            .where(cond)
            .persist()
        )
        try:
            # every selected row matches, so assignments apply in ONE
            # select — simultaneous SQL semantics (SET a=b, b=a swaps)
            out_cols = []
            for f in schema.fields:
                if f.name in assignments:
                    expr = assignments[f.name]
                    col = F.expr(expr) if isinstance(expr, str) else expr
                    out_cols.append(col.cast(types[f.name]).alias(f.name))
                else:
                    out_cols.append(F.col(f.name))
            updated = matched.select(*out_cols)
            self._enforce(updated, m)
            new_files = _write_data_files(
                self.spark, self.path, updated, _constraints_of(m), mapping=mp
            )
            # manifest accounting comes from the SAME persisted set the
            # sidecar is written from — the routing scan's counts are
            # only a heuristic and may differ under a non-deterministic
            # predicate, which would desynchronize dv.rows from the
            # sidecar and skew every downstream dv_fraction consumer
            counts = {
                r["_file"]: r["n"]
                for r in matched.groupBy(
                    F.col("_dv_file").alias("_file")
                )
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            positions = matched.select(
                F.col("_dv_file").alias("_file"),
                F.col("_dv_pos").alias("_pos"),
            )
            dvd = [f for f in touched if f["path"] in counts]
            positions = self._consolidated_positions(positions, dvd)
            dv_files = _write_data_files(
                self.spark, self.path, positions.coalesce(1)
            )
        finally:
            matched.unpersist()
        manifest = {
            "version": base + 1,
            "op": "update",
            "key_field": keys[0],
            "key_fields": keys,
            "schema": m["schema"],
            "files": _attach_dv(m["files"], counts, dv_files)
            + _stat_entries(self.path, new_files, keys[0], mp),
            **_fmt_fields(mp),
        }
        rolled = _rolled_meta(m, meta)
        if rolled:
            manifest["meta"] = rolled
        self._commit(base + 1, manifest)
        return {
            "version": base + 1,
            "rewritten": 0,
            "kept": len(m["files"]),
            "updated_rows": sum(counts.values()),
            "dv_files": len(dv_files),
        }

    def _files_matching(
        self, m: dict, schema: StructType, cond: Column
    ) -> list[dict]:
        """Manifest entries for data files containing ≥1 row where
        ``cond`` is true — one distributed scan, nothing but distinct
        file names crosses to the driver (bounded by file count)."""
        if not m["files"]:
            return []
        hits = (
            self._read_entries(
                schema, m["files"], with_lineage=True, mapping=_mapping_of(m)
            )
            .where(cond)
            .select("_dv_file")
            .distinct()
            .collect()
        )
        matched = {r["_dv_file"] for r in hits}
        return [f for f in m["files"] if f["path"] in matched]

    def layout_stats(self) -> dict:
        """Manifest-only layout health (no data or footer reads): file
        count, rows, and how many files OVERLAP another on the leading
        merge key — the number that decides whether MERGE pruning still
        works. Merges and appends accumulate small files with
        overlapping ranges; once many files cover the same key region,
        every delta touches them all. Files without key stats count as
        overlapping (they can never be pruned). Composite keys are
        measured on the leading dimension only — conservative: later
        dimensions can only prune MORE than this signal suggests."""
        m = self._manifest()
        entries = m["files"]
        spans, missing = [], 0
        for f in entries:
            lo, hi = f.get("key_min"), f.get("key_max")
            if lo is None or hi is None:
                st = (f.get("stats") or {}).get(_keys(m)[0])
                lo, hi = (st if st else (None, None))
            if lo is None or hi is None:
                missing += 1
            else:
                spans.append((lo, hi))
        spans.sort()
        overlapping = 0
        prev_hi = None
        run = False  # whether the previous file is already counted
        for lo, hi in spans:
            if prev_hi is not None and lo <= prev_hi:
                overlapping += 1 if run else 2
                run = True
            else:
                run = False
            prev_hi = hi if prev_hi is None else max(prev_hi, hi)
        overlapping += missing
        n = len(entries)
        n_phys = sum(f.get("rows", 0) for f in entries)
        n_dv = sum(_dv_of(f).get("rows", 0) for f in entries)
        return {
            "version": m["version"],
            "n_files": n,
            "n_rows": n_phys - n_dv,
            "n_dv_rows": n_dv,
            # fraction of PHYSICAL rows hidden behind deletion vectors:
            # the read-side anti-join debt compact() pays off
            "dv_fraction": (n_dv / n_phys) if n_phys else 0.0,
            "n_overlapping": overlapping,
            "overlap_fraction": (overlapping / n) if n else 0.0,
            "n_stats_missing": missing,
        }

    def maybe_compact(
        self,
        target_files: int | None = None,
        overlap_threshold: float = 0.3,
        file_factor: float = 2.0,
        dv_threshold: float = 0.2,
        cluster_by: "Sequence[str] | None" = None,
        bits: int = 8,
    ) -> "dict | None":
        """The OPTIMIZE scheduling policy: compact ONLY when the layout
        has degraded enough to pay for a full rewrite — more than
        ``overlap_threshold`` of files overlap on the merge key (MERGE
        pruning eroding), the file count exceeds ``file_factor`` ×
        ``target_files`` (small-file accumulation), or more than
        ``dv_threshold`` of physical rows hide behind deletion vectors
        (every read pays their anti-join; compaction materializes them
        away). Returns the compact receipt, or None when the layout is
        healthy — call it after every K commits (or from the commit-log
        stream) and it self-regulates; the decision reads only the
        manifest. When ONLY the vector debt tripped (layout otherwise
        healthy), the cheaper :meth:`purge_vectors` runs instead of a
        full rewrite — O(vector-carrying files), not O(table)."""
        st = self.layout_stats()
        layout_degraded = st["overlap_fraction"] > overlap_threshold or (
            target_files is not None
            and st["n_files"] > file_factor * target_files
        )
        if not layout_degraded:
            if st["dv_fraction"] > dv_threshold:
                return self.purge_vectors()
            return None
        return self.compact(
            n_files=target_files, cluster_by=cluster_by, bits=bits
        )

    def purge_vectors(self) -> "dict | None":
        """Targeted vector materialization (the ``REORG TABLE … APPLY
        (PURGE)`` analog): rewrite ONLY the deletion-vector-carrying
        files without their deleted rows and carry every clean file
        into the new snapshot untouched — O(vector-carrying files),
        where :meth:`compact` is O(table). Published as a ``compact``
        commit (the row set is unchanged, so change feeds and the cdf
        stream rightly skip it). Returns None when no entry carries a
        vector."""
        base = self.version()
        m = self._manifest(base)
        schema = StructType.fromJson(json.loads(m["schema"]))
        dvd = [f for f in m["files"] if _dv_of(f)]
        if not dvd:
            return None
        clean = [f for f in m["files"] if not _dv_of(f)]
        mp = _mapping_of(m)
        new_files = _write_data_files(
            self.spark,
            self.path,
            self._read_entries(schema, dvd, mapping=mp),
            mapping=mp,
        )
        manifest = {
            "version": base + 1,
            "op": "compact",
            "key_field": _keys(m)[0],
            "key_fields": _keys(m),
            "schema": m["schema"],
            "files": clean + _stat_entries(self.path, new_files, _keys(m)[0], mp),
            **_fmt_fields(mp),
        }
        rolled = _rolled_meta(m, None)
        if rolled:
            manifest["meta"] = rolled
        self._commit(base + 1, manifest)
        return {
            "version": base + 1,
            "purged_files": len(dvd),
            "kept": len(clean),
        }

    def compact(
        self,
        n_files: int | None = None,
        cluster_by: Sequence[str] | None = None,
        bits: int = 8,
    ) -> dict:
        """Rewrite the whole snapshot as ``n_files`` key-range-sorted
        files (the OPTIMIZE analog): merges and appends accumulate
        small files with overlapping key ranges, which erodes MERGE
        pruning; compaction restores narrow disjoint per-file ranges.
        Old files stay until :meth:`vacuum` (snapshot isolation).

        ``cluster_by`` switches to Z-order layout (OPTIMIZE ZORDER —
        the same Morton-key construction as
        ``TableStore._zordered``): row-group stats narrow on every
        listed column at once, at the cost of wider per-file MERGE-key
        ranges; the right trade when reads filter on non-key columns
        more often than merges land."""
        base = self.version()
        m = self._manifest(base)
        keys = _keys(m)
        df = self.read(base)
        if cluster_by:
            from gcpde_spark.tables import TableStore

            out = TableStore._zordered(df, list(cluster_by), n_files, bits)
        else:
            out = (
                df.repartitionByRange(n_files, *keys)
                if n_files
                else df.repartitionByRange(*keys)
            )
        mp = _mapping_of(m)
        new_files = _write_data_files(self.spark, self.path, out, mapping=mp)
        manifest = {
            "version": base + 1,
            "op": "compact",
            "key_field": keys[0],
            "key_fields": keys,
            "schema": m["schema"],
            "files": _stat_entries(self.path, new_files, keys[0], mp),
            **_fmt_fields(mp),
        }
        if cluster_by:
            manifest["clustered_by"] = list(cluster_by)
        rolled = _rolled_meta(m, None)
        if rolled:
            manifest["meta"] = rolled
        self._commit(base + 1, manifest)
        return {
            "version": base + 1,
            "before": len(m["files"]),
            "after": len(new_files),
        }

    # -- change feed -------------------------------------------------------

    def read_changes(
        self,
        since_version: int,
        end_version: int | None = None,
        precise: bool = False,
        preimages: bool = False,
    ) -> DataFrame:
        """Change feed over commits ``(since_version, end_version]`` —
        the incremental-consumption primitive (downstream refresh,
        CDC fan-out, streaming-source backfill) that reads only each
        commit's NEW files, never the whole table.

        Default mode is an **at-least-once upsert feed**: rows from
        files added by create/append/merge/update commits, tagged
        ``_change_type='upsert'`` and ``_commit_version``. A merge or
        update commit's rewritten files also contain untouched
        neighbor rows, so consumers must apply the feed as keyed
        upserts (idempotent — replays converge). Commits that can
        remove rows (``delete``/``overwrite``/``apply_changes``) cannot
        be expressed as upserts and raise here; ``compact`` commits are
        logical no-ops and are skipped in both modes.

        ``precise=True`` computes the exact row-level diff per commit —
        ``insert`` / ``update_postimage`` / ``delete`` — by keyed
        comparison of each commit's ADDED files against its REMOVED
        files. Both sides are the touched region only, so the cost is
        O(changed region per commit), not O(table): this is what makes
        a change feed viable on a 100 TB table where snapshot diffing
        (l38) would scan everything. ``preimages=True`` (precise mode
        only) additionally emits ``update_preimage`` rows carrying each
        updated key's OLD values — required by consumers partitioned on
        a mutable non-key column (incremental view maintenance must
        also touch the group a row left); :meth:`apply_changes` ignores
        them, so a preimage-carrying feed stays directly applicable."""
        if preimages and not precise:
            raise ValueError("preimages=True requires precise=True")
        end = self.version() if end_version is None else end_version
        if since_version > end:
            raise ValueError(f"since_version {since_version} > end {end}")
        parts: list[DataFrame] = []
        for v in range(since_version + 1, end + 1):
            m = self._manifest(v)
            op = m["op"]
            if op in ("compact", "constraints", "bloom"):
                continue  # logical no-ops: the row set is unchanged
            if op in ("rename_column", "drop_column"):
                # rows unchanged, NAMES changed: commits before this one
                # emit the old names, commits after the new — one feed
                # spanning both would union into a frankenschema whose
                # NULLs are indistinguishable from real changes (Delta's
                # CDF refuses non-additive boundaries the same way).
                raise NonAdditiveBoundaryError(
                    f"version {v} is a {op.upper()} commit — a change "
                    "feed cannot span a column rename/drop; read the "
                    f"segments separately (…, {v - 1}] and [{v}, …) or "
                    "re-seed the consumer from a snapshot"
                )
            schema = StructType.fromJson(json.loads(m["schema"]))
            # entry identity includes the deletion-vector reference: a
            # DV delete changes a file's VISIBLE rows without changing
            # its path, so (path, dv) is what "same content" means here
            prev_ids = (
                {_entry_id(f) for f in self._manifest(v - 1)["files"]}
                if v > 0
                else set()
            )
            added = [f for f in m["files"] if _entry_id(f) not in prev_ids]
            new = self._read_entries(schema, added, mapping=_mapping_of(m))
            if not precise:
                if op in ("delete", "overwrite", "apply_changes", "restore"):
                    raise ValueError(
                        f"version {v} is a {op.upper()} commit, which can "
                        "remove rows — an upsert feed cannot express it; "
                        "use precise=True"
                    )
                parts.append(
                    new.select(
                        "*",
                        F.lit("upsert").alias("_change_type"),
                        F.lit(v).cast("int").alias("_commit_version"),
                    )
                )
                continue
            cur_ids = {_entry_id(f) for f in m["files"]}
            removed = (
                [
                    f
                    for f in self._manifest(v - 1)["files"]
                    if _entry_id(f) not in cur_ids
                ]
                if v > 0
                else []
            )
            prev_m = self._manifest(v - 1) if v > 0 else m
            old_schema = (
                StructType.fromJson(json.loads(prev_m["schema"]))
                if v > 0
                else schema
            )
            old = self._read_entries(
                old_schema, removed, mapping=_mapping_of(prev_m)
            )
            parts.append(_keyed_diff(new, old, _keys(m), v, preimages))
        if not parts:
            m = self._manifest(end)
            schema = StructType.fromJson(json.loads(m["schema"]))
            empty = self.spark.createDataFrame([], schema)
            return empty.select(
                "*",
                F.lit("upsert").alias("_change_type"),
                F.lit(0).cast("int").alias("_commit_version"),
            ).limit(0)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    def apply_changes(
        self,
        changes: DataFrame,
        meta: dict | None = None,
        merge_schema: bool = False,
    ) -> dict:
        """Apply a PRECISE change feed (the :meth:`read_changes`
        ``precise=True`` schema: table columns + ``_change_type`` +
        ``_commit_version``) in ONE atomic commit: per key the
        highest-version change wins (a feed spanning many commits may
        update then delete the same key — order matters), winners of
        type insert/update_postimage merge in, winners of type delete
        anti-join out. File targeting is the same every-key-dimension
        range prune as :meth:`merge`, so cost is O(changes + touched
        files).
        This is the write half of the CDC relay — :func:`sync_table`
        pairs it with :meth:`read_changes` for exactly-once
        incremental replication. ``merge_schema`` allows the feed to
        carry additively-evolved columns (as in :meth:`merge`).
        ``update_preimage`` rows (a ``preimages=True`` feed) are
        dropped up front: the preimage shares its key AND commit
        version with the postimage, so letting it into the
        latest-per-key window would make the winner arbitrary."""
        changes = changes.where(F.col("_change_type") != "update_preimage")
        base = self.version()
        m = self._manifest(base)
        keys = _keys(m)
        schema = StructType.fromJson(json.loads(m["schema"]))
        mp = _mapping_of(m)
        if merge_schema:
            before = {f.name for f in schema.fields}
            schema = _evolved_schema(
                changes.drop("_change_type", "_commit_version"),
                schema,
                self.path,
            )
            mp = _extended_mapping(
                mp, schema, [f.name for f in schema.fields if f.name not in before]
            )
        w = Window.partitionBy(*keys).orderBy(F.desc("_commit_version"))
        latest = (
            changes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        latest.persist()
        try:
            bounds = latest.agg(
                *_key_bound_aggs(keys), F.count(F.lit(1)).alias("n")
            ).collect()[0]
            if bounds["n"] == 0:
                if meta is None:
                    return {
                        "version": base,
                        "rewritten": 0,
                        "kept": len(m["files"]),
                    }
                # empty feed but metadata to record (sync bookkeeping):
                # publish a data-free commit carrying the same files
                self._commit(
                    base + 1,
                    {
                        "version": base + 1,
                        "op": "apply_changes",
                        "key_field": keys[0],
                        "key_fields": keys,
                        "schema": schema.json(),
                        "files": m["files"],
                        "meta": _rolled_meta(m, meta),
                        **_fmt_fields(mp),
                    },
                )
                return {
                    "version": base + 1,
                    "rewritten": 0,
                    "kept": len(m["files"]),
                }
            ups = latest.where(F.col("_change_type") != "delete").select(
                *[f.name for f in schema.fields]
            )
            self._enforce(ups, m)
            dels = latest.where(F.col("_change_type") == "delete").select(*keys)
            touched, kept = [], []
            if bounds["lo0"] is None:  # all-NULL keys: nothing matches
                kept = list(m["files"])
            else:
                touched, kept = _split_by_delta_bounds(
                    m["files"], keys, bounds, schema, mp
                )
            if touched:
                old = self._read_entries(schema, touched, mapping=mp)
                surviving = old.join(dels, on=keys, how="left_anti")
                merged = merge_dataframes(surviving, ups, keys)
            else:
                merged = ups
            new_files = _write_data_files(
                self.spark, self.path, merged, _constraints_of(m), mapping=mp
            )
            manifest = {
                "version": base + 1,
                "op": "apply_changes",
                "key_field": keys[0],
                "key_fields": keys,
                "schema": schema.json(),
                "files": kept + _stat_entries(self.path, new_files, keys[0], mp),
                **_fmt_fields(mp),
            }
            rolled = _rolled_meta(m, meta)
            if rolled:
                manifest["meta"] = rolled
            self._commit(base + 1, manifest)
            return {
                "version": base + 1,
                "rewritten": len(touched),
                "kept": len(kept),
            }
        finally:
            latest.unpersist()

    def restore(self, version: int, meta: dict | None = None) -> dict:
        """``RESTORE TABLE ... TO VERSION`` analog: publish a NEW
        commit whose file list is snapshot ``version``'s — metadata
        only, no data moves (the old files never left; manifests are
        the table). History stays intact: the bad commits remain
        readable via time travel until :meth:`vacuum`, and the restore
        itself is one more auditable commit. Raises
        :class:`TxnTableNotFound` if ``version`` was vacuumed. The
        restored SNAPSHOT is validated against the surviving CHECK
        constraints (they roll from the current base and stay active;
        reinstating pre-constraint rows unvalidated would put the table
        in silent violation of its own contract) — one scan of the
        restored files, and a violation refuses the restore."""
        base = self.version()
        m = self._manifest(version)
        cur = self._manifest(base)
        constraints = (cur.get("meta") or {}).get(_CONSTRAINTS_KEY) or {}
        if constraints:
            schema = StructType.fromJson(json.loads(m["schema"]))
            _check_constraints(
                self._read_entries(
                    schema, m["files"], mapping=_mapping_of(m)
                ),
                constraints,
            )
        manifest = {
            "version": base + 1,
            "op": "restore",
            "key_field": _keys(m)[0],
            "key_fields": _keys(m),
            "schema": m["schema"],
            "files": m["files"],
            "restored_from": version,
            # the mapping travels WITH the schema it names (restoring a
            # pre-rename snapshot restores its logical names too)
            **_fmt_fields(_mapping_of(m)),
        }
        # meta rolls from the CURRENT base, not the restored snapshot:
        # a restore rewinds data, never exactly-once batch tracking
        # (or a replayed stream batch would re-apply after a rollback)
        rolled = _rolled_meta(cur, meta)
        if rolled:
            manifest["meta"] = rolled
        self._commit(base + 1, manifest)
        return {"version": base + 1, "restored_from": version}

    # -- maintenance -------------------------------------------------------

    def clone(self, dest: str, version: int | None = None) -> "TxnTable":
        """Zero-copy branch (shallow CLONE): hard-link the snapshot's
        data files into a NEW independent table whose history starts at
        version 0. No data is read or copied — O(file count) metadata,
        the same ``link(2)`` mechanism as catalog publication. Safe
        because the format is copy-on-write: neither table ever
        modifies a shared file in place, they diverge by writing new
        files, and a ``vacuum`` on either side only unlinks its own
        NAME — the shared inode survives for the other. The clone's
        create commit records its lineage in ``meta`` (and drops any
        exactly-once stream/sync tracking inherited from the source,
        which would otherwise suppress re-delivery into the branch)."""
        m = self._manifest(version)
        dp = Path(dest)
        log = dp / _LOG_DIR
        log.mkdir(parents=True, exist_ok=True)
        if any(q.stem.isdigit() for q in log.glob("*.json")):
            raise ValueError(f"transactional table already exists at {dest}")
        for f in m["files"]:
            for rel in [f["path"], *_dv_of(f).get("paths", [])]:
                target = dp / rel
                target.parent.mkdir(parents=True, exist_ok=True)
                if not target.exists():
                    os.link(self.path / rel, target)
        manifest = {
            "version": 0,
            "op": "create",
            "key_field": m["key_field"],
            "key_fields": _keys(m),
            "schema": m["schema"],
            "files": m["files"],
            **_fmt_fields(_mapping_of(m)),
            "meta": {
                "cloned_from": str(self.path),
                "cloned_version": m["version"],
                # constraints are TABLE semantics and follow the branch;
                # stream/sync batch tracking does not (see docstring)
                **(
                    {_CONSTRAINTS_KEY: (m.get("meta") or {})[_CONSTRAINTS_KEY]}
                    if _CONSTRAINTS_KEY in (m.get("meta") or {})
                    else {}
                ),
            },
        }
        _publish(dp, 0, manifest, backend=self.commit_backend)
        return TxnTable(self.spark, dest, commit_backend=self.commit_backend)

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
            for f in self._manifest(v)["files"]:
                live.add(f["path"])
                live.update(_dv_of(f).get("paths", []))
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
        return _list_versions(self.path)

    def _manifest(self, version: int | None = None) -> dict:
        v = self.version() if version is None else version
        return _load_manifest(self.path, v)


def sync_table(
    spark: SparkSession,
    src: TxnTable,
    dst_path: str,
    meta_key: str = "cdc_src_version",
    attempts: int = 3,
) -> dict:
    """EXACTLY-once incremental replication: bring the table at
    ``dst_path`` up to ``src``'s current snapshot by applying only the
    PRECISE change feed since the last synced source version (recorded
    in the destination's commit metadata — the same transactional
    batch-id tracking as the streaming CDC sink). Each call is one
    atomic destination commit; replays and concurrent syncs are
    detected by the recorded version and skipped. Cost per call is
    O(changes since last sync + touched destination files) — the
    incremental-materialized-view primitive: a 100 TB mirror follows a
    busy source for the price of its deltas, never a table rewrite.

    First call (no destination yet) seeds a full copy. If the source
    was vacuumed past the last synced version (retention shorter than
    sync lag), the feed is unreadable and the sync falls back to one
    full :meth:`TxnTable.overwrite` resync — loud in the returned
    ``mode``, never silent. Additive source schema evolution flows
    through incrementally; non-additive drift raises."""
    cur = src.version()
    try:
        dst = TxnTable(spark, dst_path)
    except TxnTableNotFound:
        m = src._manifest(cur)
        TxnTable.create(
            spark,
            dst_path,
            src.read(cur),
            key_field=_keys(m),
            meta={meta_key: cur},
        )
        return {"mode": "full", "synced_to": cur}
    last_err: ConcurrentCommitError | None = None
    for _ in range(attempts):
        last = dst.last_meta_value(meta_key)
        if last is None:
            raise ValueError(
                f"{dst_path} carries no {meta_key!r} commit metadata — "
                "it was not created by sync_table for this source"
            )
        if last >= cur:
            return {"mode": "noop", "synced_to": last}
        try:
            changes = src.read_changes(last, end_version=cur, precise=True)
        except TxnTableNotFound:
            try:
                dst.overwrite(
                    src.read(cur), meta={meta_key: cur}, merge_schema=True
                )
                return {"mode": "full", "synced_to": cur}
            except ConcurrentCommitError as exc:
                last_err = exc
                continue
        try:
            res = dst.apply_changes(
                changes, meta={meta_key: cur}, merge_schema=True
            )
            return {"mode": "incremental", "synced_to": cur, **res}
        except ConcurrentCommitError as exc:
            last_err = exc
            continue
    raise last_err  # type: ignore[misc]


class TxnMergeBackend(MergeIntoBackend):
    """The :class:`gcpde_spark.tables.MergeIntoBackend` seam REALIZED
    with :class:`TxnTable` — attach it and ``TableStore.
    upsert_table_df`` gets O(delta + rewritten files) transactional
    MERGE instead of the parquet full-swap::

        store.merge_backend = TxnMergeBackend("/lake/txn")
        store.upsert_table_df("ds", "t", delta, "id")   # file-pruned
        store.query("SELECT * FROM ds.t")               # sees the commit

    Catalog publication: after each commit the backend builds a
    hardlink snapshot directory (one ``link(2)`` per live data file —
    metadata-only, O(file count), no data copied) and points the
    catalog's external parquet table at it. Readers of the PREVIOUS
    snapshot directory keep working while it exists
    (``keep_snapshots`` retention); hardlinks keep inodes alive even
    after :meth:`TxnTable.vacuum` unlinks the data path. On object
    stores this directory becomes a manifest/symlink listing (the
    Delta "symlink format manifest" trick for external readers) —
    same shape, same cost.
    """

    def __init__(
        self,
        root: str,
        attempts: int = 3,
        keep_snapshots: int = 2,
        vacuum_keep: int | None = None,
    ):
        """``vacuum_keep`` (versions to retain) enables auto-vacuum
        after each publish — the retention policy a steady-state
        ingest needs so storage tracks the live table, not its
        history. Catalog readers stay safe regardless: the published
        hardlink snapshots keep their inodes alive after the data
        paths are unlinked."""
        self.root = Path(root)
        self.attempts = attempts
        self.keep_snapshots = max(1, keep_snapshots)
        self.vacuum_keep = vacuum_keep

    def merge_into(
        self,
        spark: SparkSession,
        dataset: str,
        table: str,
        source: DataFrame,
        key_fields: list[str],
    ) -> None:
        path = self.root / dataset / table
        try:
            t = TxnTable(spark, str(path))
        except TxnTableNotFound:
            try:
                t = TxnTable.create(
                    spark, str(path), source, key_field=list(key_fields)
                )
            except ConcurrentCommitError:
                # a racing creator published version 0 first — the
                # table now exists, so this delta merges instead
                t = TxnTable(spark, str(path))
                t.merge_with_retry(source, attempts=self.attempts)
        else:
            t.merge_with_retry(source, attempts=self.attempts)
        self._publish_catalog(spark, t, dataset, table)
        if self.vacuum_keep is not None:
            t.vacuum(keep_last=self.vacuum_keep)

    def table(self, spark: SparkSession, dataset: str, table: str) -> TxnTable:
        """The underlying TxnTable (history, time travel, vacuum)."""
        return TxnTable(spark, str(self.root / dataset / table))

    def _publish_catalog(
        self, spark: SparkSession, t: TxnTable, dataset: str, table: str
    ) -> None:
        v = t.version()
        m = t._manifest(v)
        snap = t.path / f"_snapshot-v{v:020d}"
        if not snap.exists():
            tmp = t.path / f".snap-tmp-{uuid.uuid4().hex}"
            tmp.mkdir()
            mp = _mapping_of(m)
            # an external-table reader resolves columns by the file's
            # own names and cannot anti-join sidecars: under an active
            # column mapping EVERY file materializes through the logical
            # rename (zero-copy publication is an identity-mapping
            # perk), and vector-carrying files always materialize
            dvd = (
                list(m["files"])
                if mp
                else [f for f in m["files"] if _dv_of(f)]
            )
            if not mp:
                for i, f in enumerate(m["files"]):
                    if not _dv_of(f):
                        os.link(
                            t.path / f["path"], tmp / f"part-{i:05d}.parquet"
                        )
            if dvd:
                # Spark's part names never collide with the 5-digit
                # links above
                schema = StructType.fromJson(json.loads(m["schema"]))
                t._read_entries(schema, dvd, mapping=mp).write.mode(
                    "append"
                ).parquet(str(tmp))
            try:
                os.rename(tmp, snap)
            except OSError:
                shutil.rmtree(tmp)  # a racing publisher built the same
                # snapshot of the same immutable manifest — reuse it
        qual = f"`{dataset}`.`{table}`"
        name = f"{dataset}.{table}"
        loc = snap.resolve().as_uri()
        spark.sql(f"CREATE DATABASE IF NOT EXISTS `{dataset}`")
        schema = StructType.fromJson(json.loads(m["schema"]))
        same_schema = spark.catalog.tableExists(name) and [
            (f.name, f.dataType) for f in spark.table(qual).schema.fields
        ] == [(f.name, f.dataType) for f in schema.fields]
        if same_schema:
            spark.sql(f"ALTER TABLE {qual} SET LOCATION '{loc}'")
            spark.catalog.refreshTable(name)
        else:
            # first publish, or the schema evolved: recreate the
            # EXTERNAL table (metadata only; no data touched)
            spark.sql(f"DROP TABLE IF EXISTS {qual}")
            spark.sql(f"CREATE TABLE {qual} USING PARQUET LOCATION '{loc}'")
        for d in sorted(t.path.glob("_snapshot-v*"))[: -self.keep_snapshots]:
            shutil.rmtree(d)


def _key_bound_aggs(keys: list[str]) -> list[Column]:
    """min/max aggregate columns for every merge-key dimension
    (aliased lo0/hi0, lo1/hi1, ...)."""
    out: list[Column] = []
    for i, k in enumerate(keys):
        out.append(F.min(k).alias(f"lo{i}"))
        out.append(F.max(k).alias(f"hi{i}"))
    return out


def _split_by_delta_bounds(
    files: list[dict],
    keys: list[str],
    bounds,
    schema: StructType | None = None,
    mapping: "dict[str, str] | None" = None,
) -> tuple[list[dict], list[dict]]:
    """(touched, kept): files that could vs. cannot contain a delta key
    tuple. A tuple matches only if EVERY dimension matches, so a file
    disjoint from the delta's range on ANY key dimension is safely
    kept — at two+ key columns this prunes strictly better than the
    leading key alone (a low-cardinality leading key leaves the later
    dimensions to do the real pruning). The disjointness test itself is
    :func:`_prune_by_ranges` — ONE authoritative predicate shared with
    ``read(ranges=)``, conservative on missing stats and legacy
    manifests."""
    ranges = {
        k: (bounds[f"lo{i}"], bounds[f"hi{i}"])
        for i, k in enumerate(keys)
        if bounds[f"lo{i}"] is not None
    }
    touched = _prune_by_ranges(files, ranges, keys[0], schema, mapping)
    touched_paths = {f["path"] for f in touched}
    kept = [f for f in files if f["path"] not in touched_paths]
    return touched, kept


def _rolled_meta(base_manifest: dict, meta: "dict | None") -> "dict | None":
    """Application metadata is TABLE state, not commit trivia: every
    commit carries the previous manifest's meta forward, overlaid with
    its own. This is what makes ``last_meta_value`` vacuum-safe — the
    newest manifest alone holds the full map, so pruning history (or a
    meta-less compact/maintenance commit in between) can never erase
    exactly-once batch-id tracking (the Delta txn-appId construction).
    """
    rolled = dict(base_manifest.get("meta") or {})
    if meta:
        rolled.update(meta)
    return rolled or None


def _keys(m: dict) -> list[str]:
    """Merge-key list from a manifest (legacy manifests carry only the
    single ``key_field``)."""
    return m.get("key_fields") or [m["key_field"]]


def _evolved_schema(
    df: DataFrame, schema: StructType, path: Path
) -> StructType:
    """Additive-evolution gate: every existing column must be present
    at its existing type; columns only in ``df`` append as nullable."""
    tnames = {f.name: f for f in schema.fields}
    snames = {f.name: f for f in df.schema.fields}
    missing = [n for n in tnames if n not in snames]
    retyped = [
        n
        for n, f in tnames.items()
        if n in snames and snames[n].dataType != f.dataType
    ]
    if missing or retyped:
        raise SchemaMismatchException(
            f"additive schema evolution at {path} requires every existing "
            f"column at its existing type (missing: {missing}, "
            f"retyped: {retyped})",
            df.schema,
            schema,
        )
    new = [
        StructField(f.name, f.dataType, True)
        for f in df.schema.fields
        if f.name not in tnames
    ]
    _check_reserved([f.name for f in new], path)
    return StructType(list(schema.fields) + new)


def _keyed_diff(
    new: DataFrame,
    old: DataFrame,
    keys: list[str],
    version: int,
    preimages: bool = False,
) -> DataFrame:
    """Exact change rows between one commit's added files (``new``) and
    its removed files (``old``): full outer join on the merge key over
    the touched region only. Rows present on both sides with identical
    content are rewritten-but-unchanged neighbors and are dropped.
    ``preimages`` additionally emits an ``update_preimage`` row (the
    OLD values) for every ``update_postimage`` — what a consumer needs
    when a changed non-key column drives its own partitioning (e.g.
    incremental view maintenance must touch the group a row LEFT, not
    just the one it entered). Columns the old schema lacks (or that
    only the old schema had, after a restore) surface as NULL: the feed
    schema is always the commit's NEW schema."""
    non_keys_old = [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"_old_{c}") for c in non_keys_old],
        F.lit(1).alias("_in_old"),
    )
    n = new.select("*", F.lit(1).alias("_in_new"))
    j = n.join(o, on=keys, how="full")
    shared = [c for c in non_keys_old if c in new.columns]
    same = F.lit(True)
    for c in shared:
        same = same & F.col(c).eqNullSafe(F.col(f"_old_{c}"))
    for c in new.columns:
        if c not in keys and f"_old_{c}" not in o.columns:
            # column added by schema evolution: the old side is
            # implicitly NULL, so a non-null new value IS a change even
            # when every shared column matched
            same = same & F.col(c).isNull()
    for c in non_keys_old:
        if c not in new.columns:
            # column present only on the old side (a restore to a
            # pre-evolution schema): losing a non-null value is a change
            same = same & F.col(f"_old_{c}").isNull()
    j = j.withColumn(
        "_change_type",
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(~same, F.lit("update_postimage")),
    ).where(F.col("_change_type").isNotNull())
    out_cols = []
    for c in new.columns:
        if c not in keys and f"_old_{c}" in j.columns:
            # deletes carry the old row's values (new side is all-null)
            out_cols.append(
                F.when(
                    F.col("_change_type") == "delete", F.col(f"_old_{c}")
                )
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            out_cols.append(F.col(c).alias(c))
    out = j.select(
        *out_cols,
        "_change_type",
        F.lit(version).cast("int").alias("_commit_version"),
    )
    if not preimages:
        return out
    pre_cols = []
    for f in new.schema.fields:
        if f.name in keys:
            pre_cols.append(F.col(f.name).alias(f.name))
        elif f"_old_{f.name}" in j.columns:
            pre_cols.append(F.col(f"_old_{f.name}").alias(f.name))
        else:  # column added by evolution: no old value existed
            pre_cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    pre = j.where(F.col("_change_type") == "update_postimage").select(
        *pre_cols,
        F.lit("update_preimage").alias("_change_type"),
        F.lit(version).cast("int").alias("_commit_version"),
    )
    return out.unionByName(pre)


def _mname(version: int) -> str:
    return f"{version:020d}.json"


def _list_versions(root: Path) -> list[int]:
    """Manifest versions present at ``root`` (vacuum may have pruned a
    prefix). Raises :class:`TxnTableNotFound` on an empty log — the one
    error type every consumer (batch reads, sync, the streaming
    source) keys its fallback behavior on."""
    vs = [
        int(p.stem)
        for p in (root / _LOG_DIR).glob("*.json")
        if p.stem.isdigit()
    ]
    if not vs:
        raise TxnTableNotFound(f"empty commit log at {root}")
    return vs


def _load_manifest(root: Path, version: int) -> dict:
    p = root / _LOG_DIR / _mname(version)
    if not p.exists():
        raise TxnTableNotFound(f"version {version} not found at {root}")
    m = json.loads(p.read_text())
    fv = m.get("format_version", 1)
    if fv > _FORMAT_VERSION:
        # a future writer may record invariants this reader cannot see
        # (e.g. a new row-invalidity mechanism like deletion vectors) —
        # reading anyway could silently return wrong rows. Delta calls
        # this the protocol version gate; refuse loudly instead.
        raise ValueError(
            f"manifest {p} has format_version {fv}, newer than this "
            f"reader's {_FORMAT_VERSION} — upgrade the library; "
            "docs/txn_format.md documents the format evolution contract"
        )
    return m


def _check_schema(df: DataFrame, schema: StructType, path: Path) -> None:
    """Structural (name, type) equality gate, nullability-insensitive —
    the same pre-MERGE contract as gcpde/bq.py:523-531."""
    if [(f.name, f.dataType) for f in df.schema.fields] != [
        (f.name, f.dataType) for f in schema.fields
    ]:
        raise SchemaMismatchException(
            f"source schema != table schema at {path}", df.schema, schema
        )


def _write_data_files(
    spark: SparkSession,
    root: Path,
    df: DataFrame,
    constraints: "dict[str, str] | None" = None,
    mapping: "dict[str, str] | None" = None,
) -> list[str]:
    """Write ``df`` as immutable parquet files under a fresh commit
    subdirectory; returns table-relative paths. Files are never moved
    or modified after this — manifests only reference them. Timestamps
    are forced to TIMESTAMP_MICROS: Spark's default INT96 encoding
    carries NO usable footer min/max (the stats are deprecated in the
    format), which would silently exclude timestamp columns — the most
    common range predicate — from manifest pruning.

    ``constraints`` installs an IN-PLAN assert on every written row
    (Delta's invariant construction): the pre-write validation agg runs
    as a SEPARATE job, so a source whose re-computation differs between
    jobs (non-deterministic UDF, concurrently-growing input dir) could
    pass validation yet materialize violating rows — this guard throws
    INSIDE the write job instead, before any commit publishes. Zero
    extra jobs; the write fails loudly and the orphaned files fall to
    vacuum."""
    if constraints:
        ok = F.lit(True)
        for sql in constraints.values():
            ok = ok & F.coalesce(F.expr(sql), F.lit(True))
        msg = (
            "CHECK constraint violated at write time (source re-computed "
            "differently than at validation): "
            + ", ".join(sorted(constraints))
        )
        df = df.where(F.coalesce(F.assert_true(ok, F.lit(msg)), F.lit(True)))
    if mapping:
        # constraints above reference LOGICAL names; the physical
        # rename is the last thing before bytes hit disk
        df = _to_physical(df, mapping)
    sub = f"{_DATA_DIR}/{uuid.uuid4().hex[:12]}"
    out = root / sub
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try:
        df.write.parquet(str(out))
    finally:
        # restore races among concurrent writers are benign: the value
        # only affects whether footers carry stats, and missing stats
        # degrade to conservative (no-prune), never unsound
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return [
        f"{sub}/{p.name}"
        for p in sorted(out.glob("*.parquet"))
    ]


def _stat_entries(
    root: Path,
    rel_files: list[str],
    key_field: str,
    mapping: "dict[str, str] | None" = None,
) -> list[dict]:
    """Entries' ``stats`` are keyed by the footer's PHYSICAL names —
    stable forever because files are immutable — and readers translate
    through the manifest's current mapping at prune time."""
    entries = []
    for rel in rel_files:
        stats, rows = _file_stats(str(root / rel))
        key = stats.get(_phys(mapping or {}, key_field))
        entries.append(
            {
                "path": rel,
                "rows": rows,
                "key_min": key[0] if key else None,
                "key_max": key[1] if key else None,
                "stats": stats,
            }
        )
    return entries


def _prune_by_ranges(
    entries: list[dict],
    ranges: "dict[str, tuple[Any, Any]]",
    key_field: str | None = None,
    schema: StructType | None = None,
    mapping: "dict[str, str] | None" = None,
) -> list[dict]:
    """Data skipping: drop manifest entries whose per-column [min, max]
    cannot intersect every requested range (``None`` bound = open).
    A file without stats for a column is always KEPT — pruning is
    conservative, never lossy. ``key_field`` names the column whose
    bounds also live in the legacy ``key_min``/``key_max`` fields
    (pre-stats manifests). ``schema`` enables the type-aware bound
    normalization of :func:`_norm_bound` (date/timestamp soundness);
    bounds are normalized ONCE here, not per file."""
    fields = {f.name: f.dataType for f in schema.fields} if schema else {}
    norm: dict[str, tuple[Any, Any]] = {}
    for col, (lo, hi) in ranges.items():
        dtype = fields.get(col)
        if dtype is not None:
            norm[col] = (_norm_bound(lo, dtype), _norm_bound(hi, dtype))
        else:
            norm[col] = (_stat_repr(lo), _stat_repr(hi))
    out = []
    for f in entries:
        keep = True
        for col, (lo, hi) in norm.items():
            st = (f.get("stats") or {}).get(_phys(mapping or {}, col))
            if st is None and col == key_field:
                st = [f.get("key_min"), f.get("key_max")]
            if st is None or st[0] is None or st[1] is None:
                continue
            mn, mx = st
            if (lo is not None and mx < lo) or (hi is not None and mn > hi):
                keep = False
                break
        if keep:
            out.append(f)
    return out




def _pruned_entries(
    m: dict,
    schema: StructType,
    key_range: "tuple[Any, Any] | None" = None,
    ranges: "dict[str, tuple[Any, Any]] | None" = None,
    eq: "dict[str, Any] | None" = None,
) -> "tuple[list[dict], dict[str, tuple[Any, Any]]]":
    """The manifest-level data-skipping core shared by
    :meth:`TxnTable.read_with_receipt` and the ``gcpde_txn`` batch
    DataSource (gcpde_spark/txn_source.py): intersect every bound
    naming one column, prune file entries by per-column [min, max]
    stats and (for ``eq``) Bloom indexes. Returns the surviving
    entries plus the intersected ranges for the caller's residual row
    filter — pruning alone is a superset, never the exact answer."""
    field_types = {f.name: f.dataType for f in schema.fields}

    def _tighten(acc: dict, col: str, rng: "tuple[Any, Any]") -> None:
        # a column named by more than one of ranges/eq/key_range
        # gets the INTERSECTION — silently replacing one request
        # with another returned rows satisfying neither (prune used
        # eq while the row filter used the range). Bounds are
        # compared through _norm_bound so mixed representations of
        # the same column (naive vs tz-aware datetime on TIMESTAMP,
        # date vs datetime on DATE) intersect on the SAME semantics
        # the pruner applies, instead of raising TypeError or
        # picking the wall-clock-wrong endpoint; the RAW winning
        # value is kept, because the caller's residual row filter
        # hands it to Spark as a typed literal.
        if col not in acc:
            acc[col] = rng
            return
        dtype = field_types.get(col)

        def norm(x: Any) -> Any:
            return x if dtype is None else _norm_bound(x, dtype)

        (alo, ahi), (blo, bhi) = acc[col], rng
        if alo is None:
            lo = blo
        elif blo is None:
            lo = alo
        else:
            lo = alo if norm(alo) >= norm(blo) else blo
        if ahi is None:
            hi = bhi
        elif bhi is None:
            hi = ahi
        else:
            hi = ahi if norm(ahi) <= norm(bhi) else bhi
        acc[col] = (lo, hi)

    all_ranges: "dict[str, tuple[Any, Any]]" = {}
    for col, rng in (ranges or {}).items():
        _tighten(all_ranges, col, rng)
    for col, v in (eq or {}).items():
        if v is None:
            raise ValueError(
                f"eq[{col!r}] is NULL — SQL equality never matches NULL"
            )
        _tighten(all_ranges, col, (v, v))
    if key_range is not None:
        _tighten(all_ranges, _keys(m)[0], key_range)
    entries = m["files"]
    mp = _mapping_of(m)
    if all_ranges:
        entries = _prune_by_ranges(
            entries, all_ranges, _keys(m)[0], schema, mp
        )
    if eq:
        entries = _prune_by_bloom(entries, eq, schema, mp)
    return entries, all_ranges


def _publish(
    root: Path,
    version: int,
    manifest: dict,
    backend: "CommitBackend | None" = None,
) -> None:
    """Atomically publish a manifest through the commit arbitration
    ``backend`` (default: the process-wide one — POSIX ``link(2)``):
    exactly one of N racing writers creates the version's manifest
    object; the rest raise :class:`ConcurrentCommitError`. The manifest
    is stamped with a ``commit_id`` UUID so object-store backends can
    resolve ambiguous (applied-then-timed-out) outcomes by read-back —
    see :mod:`gcpde_spark.commit_backend`. Either way the manifest is
    fully visible or absent, never partial."""
    log = root / _LOG_DIR
    # commit wall-clock at the single publish choke point — what
    # timestamp time travel (version_at) resolves against
    manifest.setdefault("ts", time.time())
    # publish the LOWEST format version the manifest actually needs, so
    # unmapped tables stay readable by v1 readers forever
    manifest.setdefault(
        "format_version", 2 if manifest.get("column_mapping") else 1
    )
    # bloom indexing at the same choke point: cfg rides the rolled
    # commit meta, so every verb inherits it without knowing it exists;
    # only entries MISSING a bloom compute one (carried-over COW entries
    # keep theirs — immutable files, immutable filters). Driver-side per
    # new file, same note as _file_stats: distribute at huge file counts.
    cfg = _bloom_of(manifest)
    if cfg and cfg.get("cols"):
        mp = _mapping_of(manifest)
        phys_cols = [_phys(mp, c) for c in cfg["cols"]]
        for e in manifest.get("files") or []:
            # per-COLUMN backfill: re-enabling with different columns
            # (or enabling after files already carry filters for the
            # old set) must index the new ones too; columns already
            # decided — a filter OR an explicit None marker — are never
            # re-read
            have = e.get("bloom") or {}
            needed = [c for c in phys_cols if c not in have]
            if needed:
                e["bloom"] = {
                    **have,
                    **_bloom_build(
                        str(root / e["path"]), needed, float(cfg["fpp"])
                    ),
                }
    manifest.setdefault("commit_id", uuid.uuid4().hex)
    (backend or _COMMIT_BACKEND).publish(
        log / _mname(version),
        json.dumps(manifest).encode("utf-8"),
        manifest["commit_id"],
    )
