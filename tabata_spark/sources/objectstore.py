"""Conditional-PUT commit-claim strategy for the transactional log.

:class:`FilesystemClaim` (txlog.py) documents the contract every claim
strategy must meet; this module provides the OBJECT-STORE side of that
seam — the mechanism a 1000-executor deployment actually uses, where
the table root lives on S3/GCS/ABFS and rename/link atomicity does not
exist:

- :class:`InMemoryObjectStore` — a local mock honoring the
  strongly-consistent conditional-create semantics modern object
  stores expose (S3 ``If-None-Match: *`` on PUT, GCS
  ``ifGenerationMatch=0``, ABFS blob create with ``If-None-Match``):
  `put_if_absent` atomically creates the key IFF it does not exist.
  One lock around a dict is exactly the consistency model those
  stores now guarantee (S3 has been strongly consistent since 2020).
- :class:`ConditionalPutClaim` — the txlog claim strategy: the commit
  entry is claimed by a conditional PUT of its payload to the
  ``<logdir>/<name>`` key. The STORE is the source of truth for who
  won; the winning entry is then mirrored into the local log
  directory so the filesystem read path (``_list_log``/
  ``_read_commit``) sees it — the same split as Delta's
  ``S3SingleDriverLogStore``/``S3DynamoDBLogStore`` designs, where an
  external atomic primitive arbitrates and the log listing follows.
  A loser whose local mirror is missing the winning entry self-heals
  by fetching it from the store (crash-between-claim-and-mirror
  recovery), so the retry loop always sees the true latest version.

Swapping :class:`InMemoryObjectStore` for a real client is one class:
anything with ``put_if_absent(key, body) -> bool`` and
``get(key) -> bytes`` satisfies :class:`ConditionalPutClaim`.
"""

from __future__ import annotations

import os
import threading
import uuid

__all__ = [
    "InMemoryObjectStore",
    "ConditionalPutClaim",
    "ObjectStoreLogStore",
]


class InMemoryObjectStore:
    """Mock strongly-consistent object store with conditional create.

    ``put_if_absent`` is the ``If-None-Match: *`` PUT: atomically
    create-if-absent, returning whether THIS call created the object.
    ``fail_next_puts`` injects precondition-style denials (a lost
    conditional PUT) for retry testing.
    """

    def __init__(self) -> None:
        self._objects: dict[str, bytes] = {}
        self._lock = threading.Lock()
        self.put_attempts = 0
        self.fail_next_puts = 0

    def put_if_absent(self, key: str, body: bytes) -> bool:
        with self._lock:
            self.put_attempts += 1
            if self.fail_next_puts:
                self.fail_next_puts -= 1
                return False
            if key in self._objects:
                return False
            self._objects[key] = bytes(body)
            return True

    def put(self, key: str, body: bytes) -> None:
        """Unconditional PUT (atomic last-writer-wins, as object
        stores guarantee per key) — the checkpoint-publish primitive;
        commits always go through ``put_if_absent``."""
        with self._lock:
            self._objects[key] = bytes(body)

    def get(self, key: str) -> bytes:
        with self._lock:
            try:
                return self._objects[key]
            except KeyError:
                raise KeyError(f"object store: no such key {key!r}") from None

    def exists(self, key: str) -> bool:
        with self._lock:
            return key in self._objects

    def list_prefix(self, prefix: str) -> list[str]:
        with self._lock:
            return sorted(k for k in self._objects if k.startswith(prefix))


class ConditionalPutClaim:
    """txlog claim strategy backed by an object store's conditional PUT.

    Satisfies the :class:`~tabata_spark.sources.txlog.FilesystemClaim`
    contract: atomic publish-if-absent, no reader-visible partial
    entries, durable True acknowledgements (delegated to the store —
    a real client returns success only after the PUT is durable).

    The local mirror step exists because this repo's read path lists
    the log from the filesystem; on a real deployment the read path
    goes through the store's Hadoop FS connector and the mirror is the
    store object itself. The mirror write is temp-file + ``rename`` —
    atomic for readers; only the unique winner (or a healer copying
    the winner's identical bytes) ever targets a given name, so a
    concurrent heal is a benign same-bytes overwrite.
    """

    def __init__(self, store) -> None:
        self.store = store

    def _key(self, logd: str, name: str) -> str:
        return f"{os.path.abspath(logd)}/{name}"

    def _mirror(self, logd: str, name: str, payload: bytes) -> None:
        tmp = os.path.join(logd, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, os.path.join(logd, name))

    def claim(self, logd: str, name: str, payload: bytes) -> bool:
        key = self._key(logd, name)
        if self.store.put_if_absent(key, payload):
            self._mirror(logd, name, payload)
            return True
        # Lost the race. If the winner's entry is absent locally (it
        # crashed after the PUT, before mirroring), heal the mirror so
        # our caller's next version probe sees the truth instead of
        # retrying the same taken version forever.
        if not os.path.exists(os.path.join(logd, name)):
            try:
                self._mirror(logd, name, self.store.get(key))
            except KeyError:
                # denial without an object (injected failure) — the
                # caller retries the same version, matching a lost
                # conditional PUT whose effects never landed
                pass
        return False


class ObjectStoreLogStore:
    """Full object-store LOG STORE for the transactional log — the
    read path the r9 seam lacked: with this installed (via
    :func:`~tabata_spark.sources.txlog.tx_set_log_store`) the log
    lives ENTIRELY in the store. No ``_txlog`` directory exists on
    any filesystem; listing, entry reads, checkpoint publishes and
    commit claims are all store operations:

    - ``list_names`` → one ``list_prefix`` call on the log's key
      prefix (S3 LIST with prefix+delimiter; strongly consistent on
      S3/GCS/ABFS since 2020, which is what makes name-based version
      discovery sound).
    - ``read`` → GET (absent key surfaces as ``FileNotFoundError`` so
      callers keep one error vocabulary across log stores).
    - ``write`` → unconditional PUT (checkpoints: idempotent bytes
      per version, last-writer-wins is benign).
    - ``claim`` → conditional PUT (``If-None-Match: *`` /
      ``ifGenerationMatch=0``), the atomic commit arbitration.

    Data files stay on whatever filesystem Spark's Hadoop connectors
    address — the log is the only component that needs
    conditional-create semantics the connectors do not expose.

    Works with anything exposing ``put_if_absent / put / get /
    list_prefix`` (:class:`InMemoryObjectStore` here; a boto3/gcs
    client adapter in production is ~10 lines)."""

    def __init__(self, store, prefix: str = "") -> None:
        self.store = store
        self.prefix = prefix

    def _dir_key(self, logd: str) -> str:
        return f"{self.prefix}{os.path.abspath(logd)}"

    def prepare(self, logd: str) -> None:
        """No-op: object stores have no directories to create."""

    def list_names(self, logd: str) -> list[str]:
        d = self._dir_key(logd) + "/"
        return [k[len(d):] for k in self.store.list_prefix(d)]

    def read(self, logd: str, name: str) -> bytes:
        try:
            return self.store.get(f"{self._dir_key(logd)}/{name}")
        except KeyError:
            raise FileNotFoundError(
                f"object store: no log entry {name} under {logd}"
            ) from None

    def write(self, logd: str, name: str, payload: bytes) -> None:
        self.store.put(f"{self._dir_key(logd)}/{name}", payload)

    def claim(self, logd: str, name: str, payload: bytes) -> bool:
        return self.store.put_if_absent(
            f"{self._dir_key(logd)}/{name}", payload
        )
