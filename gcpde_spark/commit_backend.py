"""Commit arbitration backends for :class:`gcpde_spark.txn.TxnTable`.

The entire transactional layer reduces its concurrency story to ONE
primitive: *create this manifest object at this exact name, fail if the
name is taken* — exactly one of N racing writers may win version ``v``,
every loser must see :class:`~gcpde_spark.errors.ConcurrentCommitError`.
This module makes that primitive pluggable:

- :class:`PosixLinkBackend` — the sandbox/NFS/local-disk arbitration:
  stage to a temp name, ``os.link`` to the final name (hard-link create
  is atomic and fails ``EEXIST`` when the version is taken), unlink the
  stage. This is what the layer shipped with through round 5.
- :class:`ConditionalPutBackend` — the object-store arbitration the
  reference's storage world actually needs (its whole I/O layer is GCS,
  ``gcpde/gcs.py``; semantics only — no client library is imported
  here): a conditional PUT with *if-none-match* / *if-generation-match:
  0* semantics (GCS ``x-goog-if-generation-match: 0``, S3
  ``If-None-Match: *``, ABFS conditional create), retried through
  transient faults. The subtle part an object store adds over POSIX is
  the AMBIGUOUS outcome: a PUT that times out after the server applied
  it. The backend resolves every ambiguity by re-reading the object and
  comparing the manifest's ``commit_id`` (a per-commit UUID stamped by
  ``txn._publish``): our id ⇒ the earlier attempt landed and we WON;
  another id ⇒ we lost the race. This makes retry-after-timeout safe —
  no double commit, no lost win — which a bare retry loop is not.
- :class:`SimulatedObjectStore` — a local-directory object store for
  tests and CI: server-side conditional-put atomicity (objects become
  visible atomically, as real stores guarantee, even though the
  *protocol* around them is failure-prone) with deterministic fault
  injection — transient errors BEFORE the server applies a put (nothing
  happened), transient errors AFTER it applied (the ambiguous case),
  and an interloper hook that lands a competing object inside the race
  window a naive exists-check-then-write would miss.

No conditional-put RENAME exists on object stores, so nothing here
renames: the data files a commit references are immutable fresh-named
objects (safe to PUT blind) and the manifest is the only object whose
creation needs arbitration.

Scale note: arbitration cost is O(1) objects per commit regardless of
table size — the loser retries only the manifest race, never rewrites
data. That is the same cost model as Delta's ``_delta_log`` conditional
writes and Iceberg's atomic metadata swap.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from pathlib import Path
from typing import Callable

from gcpde_spark.errors import ConcurrentCommitError


class ObjectStoreError(Exception):
    """Base class for object-store request failures."""


class PreconditionFailed(ObjectStoreError):
    """The conditional PUT lost: an object already exists at the name
    (HTTP 412 under if-generation-match: 0 / if-none-match)."""


class TransientStoreError(ObjectStoreError):
    """A retryable failure (429/5xx/timeout). The request MAY OR MAY
    NOT have been applied server-side — callers must treat the outcome
    as unknown and resolve it by reading back."""


class CommitBackend:
    """Arbitrates exclusive creation of one manifest object.

    ``publish`` must either create ``final`` with exactly ``payload``
    (and return), or raise :class:`ConcurrentCommitError` when another
    writer owns the name, or raise a backend error when the store is
    unreachable. It must NEVER leave a partially-visible object and
    must never report success unless the winning object carries this
    call's ``commit_id``.
    """

    def publish(self, final: Path, payload: bytes, commit_id: str) -> None:
        raise NotImplementedError


class PosixLinkBackend(CommitBackend):
    """Hard-link commit arbitration for POSIX filesystems (the
    round-1..5 behavior, unchanged): ``link(2)`` is atomic and fails
    ``EEXIST`` on a taken name, so the kernel picks the single winner."""

    def publish(self, final: Path, payload: bytes, commit_id: str) -> None:
        stage = final.parent / f".tmp-{uuid.uuid4().hex}.json"
        stage.write_bytes(payload)
        try:
            os.link(stage, final)
        except FileExistsError as exc:
            raise ConcurrentCommitError(
                f"{final} was committed by another writer; re-read the "
                "table and re-apply the merge"
            ) from exc
        finally:
            stage.unlink(missing_ok=True)


class ConditionalPutBackend(CommitBackend):
    """Conditional-PUT commit arbitration for object stores.

    ``store`` is any object exposing the two-verb client contract::

        put_if_absent(path: Path, data: bytes) -> None
            # raises PreconditionFailed when the name is taken,
            # TransientStoreError on retryable faults (outcome unknown)
        get(path: Path) -> bytes | None

    — the exact shape a thin GCS/S3 adapter has (GCS: insert with
    ``ifGenerationMatch=0`` + objects.get; S3: PutObject with
    ``If-None-Match: *`` + GetObject). Retries transient faults up to
    ``max_attempts`` with linear backoff; EVERY failure path read-backs
    the object and decides by ``commit_id``, so an applied-then-failed
    PUT is recognized as our win on the next attempt instead of
    surfacing a spurious conflict (and a competing object is recognized
    as a real loss instead of being clobbered).
    """

    def __init__(
        self,
        store,
        max_attempts: int = 6,
        backoff_s: float = 0.05,
    ):
        if max_attempts < 1:
            raise ValueError(f"max_attempts must be >= 1, got {max_attempts}")
        self.store = store
        self.max_attempts = max_attempts
        self.backoff_s = backoff_s

    def _resolve(self, final: Path, commit_id: str) -> "bool | None":
        """Read the object back and decide the race: True = our commit
        landed, False = another writer's did, None = nothing there."""
        data = self.store.get(final)
        if data is None:
            return None
        try:
            winner = json.loads(data.decode("utf-8")).get("commit_id")
        except (ValueError, UnicodeDecodeError):
            winner = None
        return winner == commit_id

    def publish(self, final: Path, payload: bytes, commit_id: str) -> None:
        last: "Exception | None" = None
        for attempt in range(self.max_attempts):
            try:
                self.store.put_if_absent(final, payload)
                return
            except PreconditionFailed as exc:
                if self._resolve(final, commit_id):
                    return  # an earlier ambiguous attempt of OURS landed
                raise ConcurrentCommitError(
                    f"{final} was committed by another writer; re-read "
                    "the table and re-apply the merge"
                ) from exc
            except TransientStoreError as exc:
                last = exc
                won = self._resolve(final, commit_id)
                if won is True:
                    return  # applied before the fault surfaced
                if won is False:
                    raise ConcurrentCommitError(
                        f"{final} was committed by another writer; "
                        "re-read the table and re-apply the merge"
                    ) from exc
                if attempt + 1 < self.max_attempts:
                    time.sleep(self.backoff_s * (attempt + 1))
        raise TransientStoreError(
            f"commit of {final} still failing after "
            f"{self.max_attempts} attempts"
        ) from last


class SimulatedObjectStore:
    """A local-directory object store with conditional-put semantics
    and DETERMINISTIC fault injection, for testing
    :class:`ConditionalPutBackend` without any cloud dependency.

    Server-side guarantees it simulates faithfully:

    - object visibility is atomic (stage + ``rename`` performed under
      the server lock — readers never see a partial object, matching
      real stores even though this simulator runs on a filesystem);
    - ``put_if_absent`` is a server-side compare-and-set: the existence
      check and the write are one critical section.

    Client-visible faults it injects (all counted per ``put_if_absent``
    call, 1-based):

    - ``fail_before`` — attempts in this set raise
      :class:`TransientStoreError` BEFORE anything is applied;
    - ``fail_after`` — attempts in this set APPLY the put, then raise
      :class:`TransientStoreError` (the ambiguous outcome);
    - ``interloper`` — callable invoked inside the critical section
      just before the existence check on the attempts in
      ``interlope_on``; landing a competing object there exercises the
      race window that an unconditional exists-then-write client would
      lose silently.

    Thread-safe within one process (a ``threading.Lock`` plays the
    store's server); cross-process arbitration is the real service's
    job, not this simulator's.
    """

    def __init__(
        self,
        fail_before: "set[int] | None" = None,
        fail_after: "set[int] | None" = None,
        interloper: "Callable[[Path], None] | None" = None,
        interlope_on: "set[int] | None" = None,
    ):
        self._lock = threading.Lock()
        self.fail_before = fail_before or set()
        self.fail_after = fail_after or set()
        self.interloper = interloper
        self.interlope_on = interlope_on or set()
        self.puts = 0  # applied puts (for test assertions)
        self.calls = 0  # put_if_absent calls, incl. failed ones

    def put_if_absent(self, path: Path, data: bytes) -> None:
        with self._lock:
            self.calls += 1
            n = self.calls
            if n in self.fail_before:
                raise TransientStoreError(f"injected 503 before apply #{n}")
            if self.interloper and n in self.interlope_on:
                self.interloper(path)
            if path.exists():
                raise PreconditionFailed(f"{path} exists")
            tmp = path.parent / f".put-{uuid.uuid4().hex}"
            path.parent.mkdir(parents=True, exist_ok=True)
            tmp.write_bytes(data)
            os.rename(tmp, path)  # atomic visibility, like a real store
            self.puts += 1
            if n in self.fail_after:
                raise TransientStoreError(
                    f"injected timeout after apply #{n}"
                )

    def get(self, path: Path) -> "bytes | None":
        with self._lock:
            try:
                return path.read_bytes()
            except FileNotFoundError:
                return None
