"""Contract tests for the real-client object-store adapters
(gcpde_spark/commit_backend_gcs.py, commit_backend_s3.py): the SAME
win / lose / transient / ambiguous scenarios the fault-injecting
SimulatedObjectStore covers, run against each adapter over a fake
client speaking its SDK's wire surface (no cloud, no credentials —
the sandbox substitute for an integration run, per the round-6
verdict). The fakes raise errors STRUCTURALLY shaped like the SDKs'
(GCS: ``.code`` int; S3: botocore ``.response`` dict), which is
exactly what the adapters classify on."""

from __future__ import annotations

import io
import json

import pytest

from gcpde_spark.commit_backend import (
    ConditionalPutBackend,
    PreconditionFailed,
    SimulatedObjectStore,
    TransientStoreError,
)
from gcpde_spark.commit_backend_gcs import GcsObjectStore
from gcpde_spark.commit_backend_s3 import S3ObjectStore
from gcpde_spark.errors import ConcurrentCommitError


def _manifest(commit_id: str) -> bytes:
    return json.dumps({"version": 1, "commit_id": commit_id}).encode()


# ---------------------------------------------------------------- fakes


class _GcsError(Exception):
    def __init__(self, code: int, msg: str = ""):
        super().__init__(msg or f"http {code}")
        self.code = code  # google-api-core exceptions carry .code


class _FakeGcsBlob:
    def __init__(self, client, bucket: str, key: str):
        self._c, self._b, self._k = client, bucket, key

    def upload_from_string(self, data, content_type=None, **kw):
        assert kw.get("if_generation_match") == 0, (
            "adapter must send the exclusive-create precondition"
        )
        assert "retry" in kw and kw["retry"] is None, (
            "adapter must disable the SDK's own retry on conditional PUT"
        )
        c = self._c
        c.calls += 1
        n = c.calls
        if n in c.fail_before:
            raise _GcsError(503, f"injected 503 before apply #{n}")
        if (self._b, self._k) in c.objects:
            raise _GcsError(412, "conditionNotMet")
        c.objects[(self._b, self._k)] = (
            data.encode() if isinstance(data, str) else bytes(data)
        )
        c.puts += 1
        if n in c.fail_after:
            raise _GcsError(504, f"injected timeout after apply #{n}")

    def download_as_bytes(self):
        try:
            return self._c.objects[(self._b, self._k)]
        except KeyError:
            raise _GcsError(404, "notFound") from None


class _FakeGcsBucket:
    def __init__(self, client, name):
        self._c, self._n = client, name

    def blob(self, key):
        return _FakeGcsBlob(self._c, self._n, key)


class FakeGcsClient:
    def __init__(self, fail_before=(), fail_after=()):
        self.objects: "dict[tuple[str, str], bytes]" = {}
        self.fail_before, self.fail_after = set(fail_before), set(fail_after)
        self.calls = self.puts = 0

    def bucket(self, name):
        return _FakeGcsBucket(self, name)


class _S3Error(Exception):
    def __init__(self, code: str, status: int):
        super().__init__(f"{code} ({status})")
        self.response = {  # botocore ClientError surface
            "Error": {"Code": code},
            "ResponseMetadata": {"HTTPStatusCode": status},
        }


class FakeS3Client:
    def __init__(self, fail_before=(), fail_after=(), conflict_on=()):
        self.objects: "dict[tuple[str, str], bytes]" = {}
        self.fail_before, self.fail_after = set(fail_before), set(fail_after)
        self.conflict_on = set(conflict_on)  # 409 ConditionalRequestConflict
        self.calls = self.puts = 0

    def put_object(self, Bucket, Key, Body, ContentType=None, **kw):
        assert kw.get("IfNoneMatch") == "*", (
            "adapter must send the exclusive-create precondition"
        )
        self.calls += 1
        n = self.calls
        if n in self.fail_before:
            raise _S3Error("ServiceUnavailable", 503)
        if n in self.conflict_on:
            raise _S3Error("ConditionalRequestConflict", 409)
        if (Bucket, Key) in self.objects:
            raise _S3Error("PreconditionFailed", 412)
        self.objects[(Bucket, Key)] = bytes(Body)
        self.puts += 1
        if n in self.fail_after:
            raise _S3Error("RequestTimeout", 408)

    def get_object(self, Bucket, Key):
        try:
            return {"Body": io.BytesIO(self.objects[(Bucket, Key)])}
        except KeyError:
            raise _S3Error("NoSuchKey", 404) from None


# ------------------------------------------------- the shared contract
#
# each case builds (store, peek, plant) over tmp_path-relative paths:
#   peek(path)  -> bytes | None     what the store now holds
#   plant(path) -> None             land a rival object at the name


def _mk_sim(tmp_path, fail_before=(), fail_after=()):
    store = SimulatedObjectStore(
        fail_before=set(fail_before), fail_after=set(fail_after)
    )

    def peek(p):
        return p.read_bytes() if p.exists() else None

    def plant(p, data):
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(data)

    return store, peek, plant


def _mk_gcs(tmp_path, fail_before=(), fail_after=()):
    client = FakeGcsClient(fail_before, fail_after)
    store = GcsObjectStore(
        "bkt", mount_root=tmp_path, key_prefix="t/", client=client,
        backoff_s=0.0,
    )

    def peek(p):
        return client.objects.get(("bkt", store._key(p)))

    def plant(p, data):
        client.objects[("bkt", store._key(p))] = data

    store.applied = lambda: client.puts
    return store, peek, plant


def _mk_s3(tmp_path, fail_before=(), fail_after=()):
    client = FakeS3Client(fail_before, fail_after)
    store = S3ObjectStore(
        "bkt", mount_root=tmp_path, key_prefix="t/", client=client,
        backoff_s=0.0,
    )

    def peek(p):
        return client.objects.get(("bkt", store._key(p)))

    def plant(p, data):
        client.objects[("bkt", store._key(p))] = data

    store.applied = lambda: client.puts
    return store, peek, plant


CASES = [("sim", _mk_sim), ("gcs", _mk_gcs), ("s3", _mk_s3)]


@pytest.mark.parametrize("name,mk", CASES)
def test_contract_clean_win_publishes_payload(tmp_path, name, mk):
    store, peek, _ = mk(tmp_path)
    p = tmp_path / "_txn_log" / "00000001.json"
    ConditionalPutBackend(store, backoff_s=0.0).publish(
        p, _manifest("me"), "me"
    )
    assert json.loads(peek(p))["commit_id"] == "me"


@pytest.mark.parametrize("name,mk", CASES)
def test_contract_taken_name_is_a_conflict_and_rival_survives(
    tmp_path, name, mk
):
    store, peek, plant = mk(tmp_path)
    p = tmp_path / "_txn_log" / "00000001.json"
    plant(p, _manifest("rival"))
    with pytest.raises(ConcurrentCommitError):
        ConditionalPutBackend(store, backoff_s=0.0).publish(
            p, _manifest("me"), "me"
        )
    assert json.loads(peek(p))["commit_id"] == "rival"


@pytest.mark.parametrize("name,mk", CASES)
def test_contract_transient_pre_apply_faults_are_retried(tmp_path, name, mk):
    store, peek, _ = mk(tmp_path, fail_before={1, 2})
    p = tmp_path / "_txn_log" / "00000001.json"
    ConditionalPutBackend(store, backoff_s=0.0).publish(
        p, _manifest("me"), "me"
    )
    assert json.loads(peek(p))["commit_id"] == "me"


@pytest.mark.parametrize("name,mk", CASES)
def test_contract_ambiguous_outcome_resolves_as_own_win(tmp_path, name, mk):
    """PUT applied server-side, then the fault surfaces: the backend
    must recognize the object as OURS on read-back — success, exactly
    one applied put, no spurious conflict."""
    store, peek, _ = mk(tmp_path, fail_after={1})
    p = tmp_path / "_txn_log" / "00000001.json"
    ConditionalPutBackend(store, backoff_s=0.0).publish(
        p, _manifest("me"), "me"
    )
    assert json.loads(peek(p))["commit_id"] == "me"
    applied = getattr(store, "applied", lambda: store.puts)()
    assert applied == 1  # no double commit


@pytest.mark.parametrize("name,mk", CASES)
def test_contract_ambiguous_loss_is_a_conflict(tmp_path, name, mk):
    """Transient fault with a RIVAL's object at the name: read-back
    sees a foreign commit_id — a real loss, never clobbered."""
    store, peek, plant = mk(tmp_path, fail_before={1})
    p = tmp_path / "_txn_log" / "00000001.json"
    backend = ConditionalPutBackend(store, backoff_s=0.0)
    plant(p, _manifest("rival"))  # rival lands inside the fault window
    with pytest.raises(ConcurrentCommitError):
        backend.publish(p, _manifest("me"), "me")
    assert json.loads(peek(p))["commit_id"] == "rival"


def test_s3_conditional_request_conflict_is_retried_to_resolution(tmp_path):
    """S3's 409 ConditionalRequestConflict during a racing conditional
    write is transient per AWS guidance: retried, then resolved — as a
    loss when the materializing winner was a rival."""
    client = FakeS3Client(conflict_on={1})
    store = S3ObjectStore("bkt", mount_root=tmp_path, client=client,
                          backoff_s=0.0)
    p = tmp_path / "_txn_log" / "00000001.json"
    client.objects[("bkt", store._key(p))] = _manifest("rival")
    with pytest.raises(ConcurrentCommitError):
        ConditionalPutBackend(store, backoff_s=0.0).publish(
            p, _manifest("me"), "me"
        )
    # and as a WIN when no rival exists (the conflict was our own echo)
    client2 = FakeS3Client(conflict_on={1})
    store2 = S3ObjectStore("bkt", mount_root=tmp_path, client=client2,
                           backoff_s=0.0)
    ConditionalPutBackend(store2, backoff_s=0.0).publish(
        p, _manifest("me"), "me"
    )
    assert json.loads(client2.objects[("bkt", store2._key(p))])[
        "commit_id"
    ] == "me"


@pytest.mark.parametrize(
    "mk,experr",
    [(_mk_gcs, PreconditionFailed), (_mk_s3, PreconditionFailed)],
)
def test_adapters_raw_store_verbs_match_simulator_semantics(
    tmp_path, mk, experr
):
    """The two-verb contract itself (what ConditionalPutBackend relies
    on): put_if_absent raises PreconditionFailed on a taken name, get
    answers None for a missing object and bytes for a present one."""
    store, _, plant = mk(tmp_path)
    p = tmp_path / "_txn_log" / "00000009.json"
    assert store.get(p) is None
    store.put_if_absent(p, b"{}")
    assert store.get(p) == b"{}"
    with pytest.raises(experr):
        store.put_if_absent(p, b"again")


@pytest.mark.parametrize("mk", [_mk_gcs, _mk_s3])
def test_adapter_get_retries_transient_then_raises(tmp_path, mk):
    store, _, _ = mk(tmp_path)
    calls = {"n": 0}
    real_blob_like = store.get

    # exhaust the get retry budget with always-transient faults
    if isinstance(store, GcsObjectStore):
        class _B:
            def download_as_bytes(self):
                calls["n"] += 1
                raise _GcsError(503)

        store._blob = lambda p: _B()
    else:
        class _C:
            def get_object(self, Bucket, Key):
                calls["n"] += 1
                raise _S3Error("SlowDown", 503)

        store._client = _C()
    with pytest.raises(TransientStoreError):
        store.get(tmp_path / "_txn_log" / "x.json")
    assert calls["n"] == store.get_attempts


@pytest.mark.parametrize("mk", [_mk_gcs, _mk_s3])
def test_adapter_key_mapping_strips_mount_root(tmp_path, mk):
    store, _, _ = mk(tmp_path)
    p = tmp_path / "tbl" / "_txn_log" / "00000003.json"
    assert store._key(p) == "t/tbl/_txn_log/00000003.json"


def test_adapters_import_and_construct_without_cloud_sdks():
    """The modules must be importable and stores constructible with no
    SDK installed; only the first real request demands one (loudly)."""
    from pathlib import Path

    g = GcsObjectStore("b", mount_root="/mnt/x")
    s = S3ObjectStore("b", mount_root="/mnt/x")
    for store, pkg in ((g, "google.cloud.storage"), (s, "boto3")):
        try:
            __import__(pkg)
            pytest.skip(f"{pkg} installed in this env")
        except ImportError:
            pass
        with pytest.raises(ImportError):
            store.put_if_absent(Path("/mnt/x/a"), b"")


def test_end_to_end_txn_commits_through_gcs_adapter_fake(spark, tmp_path):
    """A TxnTable whose commits are arbitrated by ConditionalPutBackend
    over the GCS adapter (fake client): create + merge + constraint
    land, losers of an injected ambiguous outcome still read back a
    consistent log."""
    from pyspark.sql import functions as F

    from gcpde_spark.txn import TxnTable

    client = FakeGcsClient(fail_after={2})  # 2nd commit: applied+timeout
    store = GcsObjectStore("bkt", mount_root=tmp_path, client=client,
                           backoff_s=0.0)
    backend = ConditionalPutBackend(store, backoff_s=0.0)

    # the txn layer also WRITES manifests through the backend but READS
    # them from the filesystem — mirror applied objects to disk, which
    # is exactly what a gcsfuse-style mount does for a real bucket
    real_put = store.put_if_absent

    def put_and_mirror(path, data):
        try:
            real_put(path, data)
        finally:
            # mirror SERVER state: an applied-then-timed-out put exists
            # in the bucket, so the mount shows it too
            applied = client.objects.get(("bkt", store._key(path)))
            if applied is not None:
                path.parent.mkdir(parents=True, exist_ok=True)
                path.write_bytes(applied)

    store.put_if_absent = put_and_mirror
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("v")
    )
    t = TxnTable.create(
        spark, str(tmp_path / "tbl"), df, key_field="id",
        commit_backend=backend,
    )
    t.merge(spark.createDataFrame([(3, "X")], "id long, v string"))
    assert t.version() == 1
    assert {r.v for r in t.read().where("id = 3").collect()} == {"X"}
    # both manifests exist as objects with their commit ids intact
    keys = {k for _, k in client.objects}
    assert any(k.endswith("00000000.json") for k in keys)
    assert any(k.endswith("00000001.json") for k in keys)
