"""S3 adapter for :class:`gcpde_spark.commit_backend.ConditionalPutBackend`.

Same role as :mod:`gcpde_spark.commit_backend_gcs`, for the other big
object store. Arbitration mapping (docs/txn_format.md §Commit
protocol): the exclusive-create primitive is ``PutObject`` with
**``IfNoneMatch="*"``** — S3 applies it iff no object exists at the
key (supported on general-purpose and directory buckets since 2024; a
taken key answers HTTP 412 ``PreconditionFailed``). Two S3-specific
wrinkles the classifier handles:

- **409 ``ConditionalRequestConflict``**: S3 answers it when multiple
  conditional writers race one key and a winner is still materializing;
  AWS guidance is *retry*, and on retry the loser sees the clean 412.
  Mapped to :class:`TransientStoreError` (the backend's read-back then
  resolves it by ``commit_id`` — also covering the case where the
  materializing winner was our own earlier ambiguous attempt).
- ``GetObject`` answers 404 as error code ``NoSuchKey`` — mapped to
  ``None`` per the store contract.

No boto3 import at module import time: the client is injected (what
the contract tests do, with a fake speaking botocore's ClientError
surface structurally) or lazy-built on first use. Classification is
structural — error code + HTTP status read off ``exc.response`` — so
it holds across botocore versions and for test fakes alike.
"""

from __future__ import annotations

import time
from pathlib import Path

from gcpde_spark.commit_backend import (
    PreconditionFailed,
    TransientStoreError,
)

_TRANSIENT_STATUSES = {408, 429, 500, 502, 503, 504}
_TRANSIENT_CODES = {
    "ConditionalRequestConflict",  # 409 during a conditional-write race
    "SlowDown",
    "RequestTimeout",
    "ThrottlingException",
    "Throttling",
    "InternalError",
    "ServiceUnavailable",
}


def _error_of(exc: BaseException) -> "tuple[str | None, int | None]":
    """(error code, HTTP status) read structurally off a botocore-style
    ``ClientError`` (``exc.response`` dict); (None, None) otherwise."""
    resp = getattr(exc, "response", None)
    if not isinstance(resp, dict):
        return None, None
    code = (resp.get("Error") or {}).get("Code")
    status = (resp.get("ResponseMetadata") or {}).get("HTTPStatusCode")
    return code, status if isinstance(status, int) else None


def _is_transient(exc: BaseException) -> bool:
    if isinstance(exc, (ConnectionError, TimeoutError)):
        return True
    code, status = _error_of(exc)
    return code in _TRANSIENT_CODES or status in _TRANSIENT_STATUSES


class S3ObjectStore:
    """``put_if_absent``/``get`` over one S3 bucket (see
    :class:`gcpde_spark.commit_backend_gcs.GcsObjectStore` for the
    ``mount_root`` → object-key mapping, identical here)."""

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

    def _s3(self):
        if self._client is None:
            try:
                import boto3  # optional dependency
            except ImportError as exc:  # pragma: no cover - env-specific
                raise ImportError(
                    "S3ObjectStore needs the boto3 package "
                    "(pip install boto3) or an injected client"
                ) from exc
            # botocore's standard mode retries idempotent calls; a
            # conditional PUT must be single-shot per call (an
            # applied-then-timed-out PUT re-answers 412 on the SDK's
            # internal retry, masking our win) — the backend owns
            # retries, so configure zero client-side attempts
            from botocore.config import Config

            self._client = boto3.client(
                "s3", config=Config(retries={"max_attempts": 1})
            )
        return self._client

    def _key(self, path: Path) -> str:
        return self.key_prefix + "/".join(path.relative_to(self.mount_root).parts)

    def put_if_absent(self, path: Path, data: bytes) -> None:
        try:
            self._s3().put_object(
                Bucket=self.bucket_name,
                Key=self._key(path),
                Body=data,
                ContentType="application/json",
                IfNoneMatch="*",
            )
        except Exception as exc:
            code, status = _error_of(exc)
            if code == "PreconditionFailed" or status == 412:
                raise PreconditionFailed(
                    f"s3://{self.bucket_name}/{self._key(path)} exists"
                ) from exc
            if _is_transient(exc):
                raise TransientStoreError(str(exc)) from exc
            raise

    def get(self, path: Path) -> "bytes | None":
        last: "Exception | None" = None
        for attempt in range(self.get_attempts):
            try:
                resp = self._s3().get_object(
                    Bucket=self.bucket_name, Key=self._key(path)
                )
                return resp["Body"].read()
            except Exception as exc:
                code, status = _error_of(exc)
                if code in ("NoSuchKey", "404") or status == 404:
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
