"""Conditional-PUT claim strategy: the object-store side of the txlog
commit seam, run through the same contended-writer matrix as the
filesystem claim (VERDICT r8 item 3) plus the crash-heal path."""

import os
import threading

import pytest

from tabata_spark.sources.objectstore import (
    ConditionalPutClaim,
    InMemoryObjectStore,
)
from tabata_spark.sources.txlog import (
    _commit,
    tx_history,
    tx_read,
    tx_set_claimer,
    tx_write,
)


@pytest.fixture()
def claimed_root(tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    store = InMemoryObjectStore()
    tx_set_claimer(root, ConditionalPutClaim(store))
    yield root, store
    tx_set_claimer(root, None)


def test_store_conditional_create_semantics():
    s = InMemoryObjectStore()
    assert s.put_if_absent("k", b"a") is True
    assert s.put_if_absent("k", b"b") is False  # If-None-Match: * fails
    assert s.get("k") == b"a"  # loser's body never lands
    with pytest.raises(KeyError):
        s.get("missing")


def test_contended_writers_through_conditional_put(claimed_root):
    # the exact matrix test_txlog runs on the filesystem claim: N
    # writers x M commits -> N*M contiguous versions, every payload
    # exactly once, all arbitration through the store's conditional PUT
    root, store = claimed_root
    N, M = 5, 4
    errors = []

    def writer(w):
        try:
            for j in range(M):
                _commit(root, "append", [f"data/w{w}/f{j}.parquet"], [])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(N)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    hist = tx_history(root)
    assert [c["version"] for c in hist] == list(range(1, N * M + 1))
    added = [f for c in hist for f in c["add"]]
    assert len(added) == len(set(added)) == N * M
    # every version was arbitrated by the store and mirrored locally
    assert len(store.list_prefix("")) == N * M
    assert store.put_attempts >= N * M


def test_contended_same_txn_token_exactly_once(claimed_root):
    root, store = claimed_root
    versions, lock = [], threading.Lock()

    def writer(w):
        v = _commit(root, "append", [f"data/w{w}.parquet"], [], txn="batch:0")
        with lock:
            versions.append(v)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert versions == [1, 1, 1, 1]
    hist = tx_history(root)
    assert len(hist) == 1 and len(hist[0]["add"]) == 1


def test_lost_conditional_put_is_retried_at_same_version(claimed_root):
    root, store = claimed_root
    store.fail_next_puts = 2  # two denied PUTs, no object created
    v = _commit(root, "append", ["data/a.parquet"], [])
    assert v == 1  # retried the SAME version until the PUT landed
    assert store.put_attempts == 3


def test_crash_between_put_and_mirror_heals(claimed_root):
    # winner's PUT landed but it died before mirroring: the local log
    # is blind to v1. A later writer must lose the v1 claim, heal the
    # mirror from the store, and land at v2.
    root, store = claimed_root
    logd = os.path.join(root, "_txlog")
    os.makedirs(logd, exist_ok=True)
    key = f"{os.path.abspath(logd)}/{1:020d}.json"
    payload = b'{"version": 1, "mode": "append", "add": ["data/ghost.parquet"], "remove": []}'
    assert store.put_if_absent(key, payload)  # the crashed winner
    assert not os.path.exists(os.path.join(logd, f"{1:020d}.json"))

    v = _commit(root, "append", ["data/b.parquet"], [])
    assert v == 2  # healed v1, then claimed the next version
    hist = tx_history(root)
    assert [c["version"] for c in hist] == [1, 2]
    assert hist[0]["add"] == ["data/ghost.parquet"]  # the healed entry


def test_end_to_end_write_read_under_conditional_put(spark, claimed_root):
    root, store = claimed_root
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    tx_write(df, root)
    tx_write(spark.range(10, 15).selectExpr("id", "id * 2 AS v"), root)
    assert tx_read(spark, root).count() == 15
    assert len(store.list_prefix("")) == 2


# ---------------------------------------------------------------------------
# ObjectStoreLogStore: the full log READ path (r9 gap) — the log lives
# ENTIRELY in the store, no _txlog directory on any filesystem. The
# whole protocol matrix re-runs against it.

from tabata_spark.sources.objectstore import ObjectStoreLogStore  # noqa: E402
from tabata_spark.sources.txlog import (  # noqa: E402
    CHECKPOINT_INTERVAL,
    tx_checkpoint,
    tx_compact,
    tx_delete_where,
    tx_merge,
    tx_restore,
    tx_set_log_store,
    tx_txns,
    tx_version,
)


@pytest.fixture()
def storelog_root(tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    store = InMemoryObjectStore()
    tx_set_log_store(root, ObjectStoreLogStore(store))
    yield root, store
    tx_set_log_store(root, None)


def _no_local_log(root):
    return not os.path.exists(os.path.join(root, "_txlog"))


def test_storelog_roundtrip_without_any_log_directory(spark, storelog_root):
    root, store = storelog_root
    tx_write(spark.range(10).selectExpr("id", "id * 2 AS v"), root)
    tx_write(spark.range(10, 15).selectExpr("id", "id * 2 AS v"), root)
    assert tx_read(spark, root).count() == 15
    assert tx_version(root) == 2
    # the load-bearing assertion: the READ path never touched a
    # filesystem log — no _txlog directory exists at all
    assert _no_local_log(root)
    assert len(store.list_prefix("")) == 2


def test_storelog_contended_writers(storelog_root):
    root, store = storelog_root
    N, M = 5, 4
    errors = []

    def writer(w):
        try:
            for j in range(M):
                _commit(root, "append", [f"data/w{w}/f{j}.parquet"], [])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(N)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    hist = tx_history(root)
    assert [c["version"] for c in hist] == list(range(1, N * M + 1))
    added = [f for c in hist for f in c["add"]]
    assert len(added) == len(set(added)) == N * M
    assert _no_local_log(root)


def test_storelog_txn_exactly_once(storelog_root):
    root, _ = storelog_root
    v1 = _commit(root, "append", ["data/a.parquet"], [], txn="batch:0")
    v2 = _commit(root, "append", ["data/b.parquet"], [], txn="batch:0")
    assert v1 == v2 == 1
    assert tx_txns(root) == {"batch:0": 1}
    assert _no_local_log(root)


def test_storelog_crash_replay_needs_no_heal(storelog_root):
    # A winner that "crashed" right after its conditional PUT is still
    # fully visible to every other writer/reader: the store IS the log
    # (the claim-strategy seam needed a local mirror + heal here).
    root, store = storelog_root
    logd = os.path.abspath(os.path.join(root, "_txlog"))
    payload = (
        b'{"version": 1, "mode": "append",'
        b' "add": ["data/ghost.parquet"], "remove": []}'
    )
    assert store.put_if_absent(f"{logd}/{1:020d}.json", payload)
    v = _commit(root, "append", ["data/b.parquet"], [])
    assert v == 2
    hist = tx_history(root)
    assert [c["version"] for c in hist] == [1, 2]
    assert hist[0]["add"] == ["data/ghost.parquet"]
    assert _no_local_log(root)


def test_storelog_checkpoint_catchup(storelog_root):
    # cross CHECKPOINT_INTERVAL commits: the auto-checkpoint must land
    # as a store object and resolution must keep working from it
    root, store = storelog_root
    n = CHECKPOINT_INTERVAL + 3
    for j in range(n):
        _commit(root, "append", [f"data/f{j}.parquet"], [])
    ckpts = [k for k in store.list_prefix("") if k.endswith(".checkpoint.json")]
    assert len(ckpts) == 1 and f"{CHECKPOINT_INTERVAL:020d}" in ckpts[0]
    from tabata_spark.sources.txlog import _resolve

    state = _resolve(root)
    assert state["version"] == n and len(state["active"]) == n
    # manual checkpoint is a store write too
    tx_checkpoint(root)
    assert (
        len([k for k in store.list_prefix("") if k.endswith(".checkpoint.json")])
        == 2
    )
    assert _no_local_log(root)


def test_storelog_time_travel_delete_merge_compact_restore(spark, storelog_root):
    root, _ = storelog_root
    from pyspark.sql import functions as F

    tx_write(spark.range(20).selectExpr("id", "id * 2 AS v"), root)
    tx_delete_where(spark, root, F.col("id") >= 15)
    assert tx_read(spark, root).count() == 15
    src = spark.range(14, 18).selectExpr("id", "id * 100 AS v")
    tx_merge(spark, root, src, ["id"])
    got = {r["id"]: r["v"] for r in tx_read(spark, root).collect()}
    assert got[14] == 1400 and got[17] == 1700 and len(got) == 18
    tx_compact(spark, root, n_files=2)
    assert tx_read(spark, root).count() == 18
    # time travel to v1 then restore it
    assert tx_read(spark, root, version=1).count() == 20
    tx_restore(root, 1)
    assert tx_read(spark, root).count() == 20
    assert _no_local_log(root)
