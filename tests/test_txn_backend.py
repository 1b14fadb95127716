"""Commit-arbitration backends (gcpde_spark/commit_backend.py): the
conditional-PUT object-store backend must uphold the same single-winner
invariant as POSIX link(2) through transient faults, ambiguous
(applied-then-timed-out) outcomes, and interlopers landing inside the
race window — and the existing contention / model-fuzz / exactly-once
suites must run green with the simulated object store arbitrating
every commit."""

from __future__ import annotations

import json
import threading
from pathlib import Path

import pytest

import gcpde_spark.txn as txn
from gcpde_spark.commit_backend import (
    ConditionalPutBackend,
    PosixLinkBackend,
    PreconditionFailed,
    SimulatedObjectStore,
    TransientStoreError,
)
from gcpde_spark.errors import ConcurrentCommitError


def _payload(cid: str) -> bytes:
    return json.dumps({"version": 1, "commit_id": cid}).encode()


# ---------------------------------------------------------------------------
# unit semantics
# ---------------------------------------------------------------------------


def test_posix_backend_single_winner(tmp_path):
    be = PosixLinkBackend()
    final = tmp_path / "log" / "m.json"
    final.parent.mkdir()
    be.publish(final, _payload("a"), "a")
    with pytest.raises(ConcurrentCommitError):
        be.publish(final, _payload("b"), "b")
    assert json.loads(final.read_text())["commit_id"] == "a"
    # no stage-file residue either way
    assert list(final.parent.glob(".tmp-*")) == []


def test_conditional_put_loser_gets_concurrent_commit_error(tmp_path):
    store = SimulatedObjectStore()
    be = ConditionalPutBackend(store)
    final = tmp_path / "m.json"
    be.publish(final, _payload("a"), "a")
    with pytest.raises(ConcurrentCommitError):
        be.publish(final, _payload("b"), "b")
    assert json.loads(final.read_text())["commit_id"] == "a"


def test_conditional_put_retries_through_pre_apply_faults(tmp_path):
    # first two attempts 503 before anything lands; third applies
    store = SimulatedObjectStore(fail_before={1, 2})
    be = ConditionalPutBackend(store, backoff_s=0.0)
    final = tmp_path / "m.json"
    be.publish(final, _payload("a"), "a")
    assert store.puts == 1 and store.calls == 3
    assert json.loads(final.read_text())["commit_id"] == "a"


def test_conditional_put_resolves_ambiguous_outcome_as_own_win(tmp_path):
    """The object-store-specific hazard: the PUT is APPLIED server-side
    but the response is lost. A bare retry would see 'exists' and
    report a spurious conflict (or worse, a naive backend would
    clobber); commit_id read-back must recognize the win."""
    store = SimulatedObjectStore(fail_after={1})
    be = ConditionalPutBackend(store, backoff_s=0.0)
    final = tmp_path / "m.json"
    be.publish(final, _payload("a"), "a")  # must NOT raise
    assert store.puts == 1  # applied exactly once, no double commit
    assert json.loads(final.read_text())["commit_id"] == "a"


def test_conditional_put_ambiguous_loss_is_a_conflict(tmp_path):
    """Ambiguous fault, and by the time we read back an INTERLOPER's
    object is there instead (we never actually applied): the read-back
    must classify it as a real loss, not retry forever or claim it."""
    final = Path()  # bound below once tmp_path exists

    def interloper(path: Path) -> None:
        tmp = path.parent / ".rival"
        tmp.write_bytes(_payload("rival"))
        tmp.rename(path)

    store = SimulatedObjectStore(
        fail_before={1}, interloper=interloper, interlope_on={2}
    )
    be = ConditionalPutBackend(store, backoff_s=0.0)
    final = tmp_path / "m.json"
    with pytest.raises(ConcurrentCommitError):
        be.publish(final, _payload("a"), "a")
    assert json.loads(final.read_text())["commit_id"] == "rival"


def test_conditional_put_exhausts_transient_faults_loudly(tmp_path):
    store = SimulatedObjectStore(fail_before={1, 2, 3})
    be = ConditionalPutBackend(store, max_attempts=3, backoff_s=0.0)
    with pytest.raises(TransientStoreError, match="3 attempts"):
        be.publish(tmp_path / "m.json", _payload("a"), "a")
    assert store.puts == 0


def test_simulated_store_cas_is_atomic_under_threads(tmp_path):
    """The simulator's put_if_absent really is a critical section: 16
    threads racing one name produce exactly one object and 15
    PreconditionFailed."""
    store = SimulatedObjectStore()
    final = tmp_path / "m.json"
    outcomes: list = []

    def racer(i: int) -> None:
        try:
            store.put_if_absent(final, _payload(f"t{i}"))
            outcomes.append("won")
        except PreconditionFailed:
            outcomes.append("lost")

    ts = [threading.Thread(target=racer, args=(i,)) for i in range(16)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert outcomes.count("won") == 1 and outcomes.count("lost") == 15
    assert store.puts == 1


# ---------------------------------------------------------------------------
# the txn layer on the simulated object store
# ---------------------------------------------------------------------------


@pytest.fixture
def objstore(monkeypatch):
    """Route EVERY commit in the process through the conditional-put
    backend over a fault-injecting simulated object store: one
    transient pre-apply fault and one ambiguous post-apply fault every
    13 calls (deterministic — no wall-clock/randomness), so long
    scenarios exercise the retry/read-back machinery repeatedly."""
    store = SimulatedObjectStore(
        fail_before=set(range(5, 100_000, 13)),
        fail_after=set(range(9, 100_000, 13)),
    )
    prev = txn.set_commit_backend(ConditionalPutBackend(store, backoff_s=0.0))
    yield store
    txn.set_commit_backend(prev)


def test_txn_verbs_commit_through_object_store(spark, tmp_path, objstore):
    """create/merge/delete/compact/restore all arbitrate through the
    simulated store (no os.link anywhere), survive the injected faults,
    and read back exactly right."""
    from pyspark.sql import functions as F

    df = spark.range(40).select(
        F.col("id"), (F.col("id") % 5).cast("string").alias("v")
    )
    t = txn.TxnTable.create(spark, str(tmp_path / "t"), df, key_field="id")
    t.merge(spark.createDataFrame([(3, "X"), (99, "NEW")], "id long, v string"))
    t.delete("id = 7")
    t.compact(n_files=2)
    got = {r.id: r.v for r in t.read().collect()}
    assert got[3] == "X" and got[99] == "NEW" and 7 not in got
    assert len(got) == 40  # 40 - deleted + merged-new
    t.restore(0)
    assert {r.id for r in t.read().collect()} == set(range(40))
    assert objstore.puts == t.version() + 1  # one object per commit
    assert objstore.calls > objstore.puts  # faults actually fired


def test_thread_contention_suite_on_object_store(spark, tmp_path, objstore):
    """The round-5 contention test, unchanged, with every commit
    arbitrated by conditional PUT + fault injection instead of
    link(2): 9 racing merges across 3 threads land exactly once."""
    from tests.test_txn import (
        test_concurrent_writers_under_real_thread_contention as suite,
    )

    suite(spark, tmp_path)


def test_model_fuzz_suite_on_object_store(spark, tmp_path, objstore):
    """The model-based op-interleaving fuzz (random verb sequences ≡
    dict model, incl. CDF replay), unchanged, on the object-store
    backend."""
    from tests.test_txn import (
        test_random_op_sequences_match_dict_model_and_cdf_replay as suite,
    )

    suite(spark, tmp_path)


def test_exactly_once_sync_suite_on_object_store(spark, tmp_path, objstore):
    """The incremental-mirror exactly-once contract, unchanged, on the
    object-store backend (sync bookkeeping rides commit meta, so the
    ambiguous-outcome handling must not double-apply a batch)."""
    from tests.test_txn import (
        test_sync_table_exactly_once_incremental_mirror as suite,
    )

    suite(spark, tmp_path)


def test_single_winner_race_suite_on_object_store(spark, tmp_path, monkeypatch):
    """The direct version-race test, unchanged, on a fault-free
    simulated store (its own interleaving writes the rival manifest
    via the filesystem, which the store sees — same object namespace)."""
    from tests.test_txn import test_concurrent_commit_single_winner as suite

    store = SimulatedObjectStore()
    prev = txn.set_commit_backend(ConditionalPutBackend(store, backoff_s=0.0))
    try:
        suite(spark, tmp_path, monkeypatch)
    finally:
        txn.set_commit_backend(prev)
