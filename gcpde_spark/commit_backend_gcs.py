"""GCS adapter for :class:`gcpde_spark.commit_backend.ConditionalPutBackend`.

Binds the backend's two-verb store contract (``put_if_absent`` /
``get``) to the public ``google-cloud-storage`` client — the reference
library's entire storage world is GCS (``gcpde/gcs.py:1-628``), so this
is the adapter a production deployment of the txn format would mount::

    from gcpde_spark.commit_backend import ConditionalPutBackend
    from gcpde_spark.commit_backend_gcs import GcsObjectStore
    from gcpde_spark.txn import set_commit_backend

    store = GcsObjectStore("my-bucket", mount_root="/mnt/gcs/my-bucket")
    set_commit_backend(ConditionalPutBackend(store))

Arbitration mapping (docs/txn_format.md §Commit protocol): the exclusive
-create primitive is a PUT with **``if_generation_match=0``** — GCS
applies it iff no live generation of the object exists, an atomic
server-side compare-and-set (HTTP precondition
``x-goog-if-generation-match: 0``; a taken name answers 412). The SDK's
own retry is DISABLED on that call (``retry=None``): a conditional PUT
is not idempotent-by-status (our applied-then-timed-out PUT re-answers
412), and re-attempt/ambiguity resolution belongs to
``ConditionalPutBackend``, which re-reads the object and decides by the
manifest's ``commit_id``.

This module imports no cloud SDK at import time — the client is built
lazily on first use (or injected, which is what the contract tests do:
they run the same win/lose/ambiguous scenarios the simulator covers
against a fake client speaking the SDK's surface). Classification of
SDK errors is STRUCTURAL (HTTP status read off the exception) so it
holds for any google-api-core version and for the test fakes alike.
"""

from __future__ import annotations

import time
from pathlib import Path

from gcpde_spark.commit_backend import (
    PreconditionFailed,
    TransientStoreError,
)

# statuses a client may retry per cloud guidance: request timeout,
# too-many-requests, and server-side 5xx
_TRANSIENT_STATUSES = {408, 429, 500, 502, 503, 504}


def _status_of(exc: BaseException) -> "int | None":
    """HTTP status carried by an SDK exception, read structurally:
    google-api-core exceptions expose ``code`` (int); raw transport
    errors expose ``response.status_code``."""
    code = getattr(exc, "code", None)
    if isinstance(code, int):
        return code
    resp = getattr(exc, "response", None)
    status = getattr(resp, "status_code", None)
    return status if isinstance(status, int) else None


def _is_transient(exc: BaseException) -> bool:
    if isinstance(exc, (ConnectionError, TimeoutError)):
        return True  # socket-level faults: outcome unknown
    return _status_of(exc) in _TRANSIENT_STATUSES


class GcsObjectStore:
    """``put_if_absent``/``get`` over one GCS bucket.

    ``mount_root`` maps the txn layer's POSIX paths to object names:
    the layer addresses manifests as local paths (e.g.
    ``/mnt/gcs/bucket/table/_txn_log/00000007.json``), and the object
    key is ``key_prefix + path.relative_to(mount_root)``. ``client`` is
    injectable for tests; left ``None`` it lazy-imports
    ``google.cloud.storage`` on first request (so this module is
    importable in environments without the SDK — construction succeeds,
    the first call fails loudly with the install hint).
    """

    def __init__(
        self,
        bucket: str,
        mount_root: "str | Path",
        key_prefix: str = "",
        client=None,
        get_attempts: int = 3,
        backoff_s: float = 0.05,
    ):
        self.bucket_name = bucket
        self.mount_root = Path(mount_root)
        self.key_prefix = key_prefix
        self._client = client
        self.get_attempts = get_attempts
        self.backoff_s = backoff_s

    def _blob(self, path: Path):
        if self._client is None:
            try:
                from google.cloud import storage  # optional dependency
            except ImportError as exc:  # pragma: no cover - env-specific
                raise ImportError(
                    "GcsObjectStore needs the google-cloud-storage "
                    "package (pip install google-cloud-storage) or an "
                    "injected client"
                ) from exc
            self._client = storage.Client()
        return self._client.bucket(self.bucket_name).blob(self._key(path))

    def _key(self, path: Path) -> str:
        return self.key_prefix + "/".join(path.relative_to(self.mount_root).parts)

    def put_if_absent(self, path: Path, data: bytes) -> None:
        blob = self._blob(path)
        try:
            # retry=None: ONE wire attempt per call — see module docstring
            blob.upload_from_string(
                data,
                content_type="application/json",
                if_generation_match=0,
                retry=None,
            )
        except Exception as exc:
            if _status_of(exc) == 412:
                raise PreconditionFailed(
                    f"gs://{self.bucket_name}/{self._key(path)} exists"
                ) from exc
            if _is_transient(exc):
                raise TransientStoreError(str(exc)) from exc
            raise

    def get(self, path: Path) -> "bytes | None":
        last: "Exception | None" = None
        for attempt in range(self.get_attempts):
            blob = self._blob(path)
            try:
                return blob.download_as_bytes()
            except Exception as exc:
                if _status_of(exc) == 404:
                    return None
                if not _is_transient(exc):
                    raise
                last = exc
                if attempt + 1 < self.get_attempts:
                    time.sleep(self.backoff_s * (attempt + 1))
        raise TransientStoreError(
            f"get of {self._key(path)} still failing after "
            f"{self.get_attempts} attempts"
        ) from last
