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
