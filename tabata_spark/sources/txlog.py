"""Transactional table log — a minimal Delta-Lake-style commit
protocol over plain parquet directories (public design: an ordered
JSON action log + immutable data files; see the Delta Lake paper,
VLDB 2020).

Why the engine needs it: the mutable stores in this repo (rollup,
SCD2, CMS) rely on dynamic-partition overwrite plus directory
removal — correct single-writer, but readers can observe half-applied
states and concurrent writers can interleave. The tx log gives:

- **Atomic commits**: a version becomes visible only when its log
  entry ``_txlog/<version>.json`` is atomically created (O_EXCL on a
  filesystem; a conditional PUT on an object store). Data directories
  are immutable once committed.
- **Snapshot isolation**: a reader resolves the active directory set
  from the log ONCE; in-flight writers add new directories that no
  existing snapshot references.
- **Optimistic concurrency**: two writers racing on version N — one
  wins the O_EXCL create, the loser re-reads the log and retries at
  N+1 (its already-written data directory is still unreferenced, so
  retrying is just another commit attempt).
- **Time travel**: any historical version replays the log prefix.

Scale shape: the log is O(commits) tiny JSON; state resolution reads
the log, never lists data; deletes are file-granular copy-on-write
(`input_file_name()` finds touched directories in ONE scan — the
untouched ones are re-linked, not rewritten). At 100 TB the same
layout works with the log in a strongly-consistent store; periodic
:func:`tx_compact` bounds both file count and log-replay length.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession

_LOG_DIR = "_txlog"
_DATA_DIR = "data"
_MAX_RETRIES = 20


def _log_path(root: str) -> str:
    return os.path.join(root, _LOG_DIR)


def _commits(root: str) -> list[dict]:
    """All committed actions, version-ordered. Ignores foreign files
    in the log directory (crashed tmp files can never collide with
    the ``<20-digit>.json`` claim names)."""
    logd = _log_path(root)
    if not os.path.isdir(logd):
        return []
    out = []
    for f in sorted(os.listdir(logd)):
        if f.endswith(".json") and f[:-5].isdigit():
            with open(os.path.join(logd, f)) as fh:
                out.append(json.load(fh))
    return out


def tx_history(root: str) -> list[dict]:
    """The committed action log (version, mode, add/remove dirs)."""
    return _commits(root)


def _active_dirs(root: str, version: int | None = None) -> list[str]:
    """Replay the log (to ``version`` inclusive, or fully) into the
    set of live data directories."""
    active: list[str] = []
    for c in _commits(root):
        if version is not None and c["version"] > version:
            break
        if c["mode"] == "overwrite":
            active = []
        elif c["mode"] == "replace":
            rm = set(c.get("remove", []))
            active = [d for d in active if d not in rm]
        active.extend(c["add"])
    return active


def _commit(
    root: str,
    mode: str,
    add: list[str],
    remove: list[str],
    txn: str | None = None,
) -> int:
    """Atomically claim the next version. O_EXCL create IS the commit;
    losing a race means re-reading the log and retrying — the data
    dirs in ``add`` are unreferenced until the commit lands, so a
    retry is safe.

    ``txn`` is an idempotence token (Delta's transaction-identifier
    mechanism): if any committed entry already carries it, the commit
    is a no-op returning that version — the retry loop re-checks after
    every lost race, so exactly one writer of a txn ever lands."""
    logd = _log_path(root)
    os.makedirs(logd, exist_ok=True)
    for _ in range(_MAX_RETRIES):
        commits = _commits(root)
        if txn is not None:
            for c in commits:
                if c.get("txn") == txn:
                    return c["version"]
        version = (commits[-1]["version"] + 1) if commits else 1
        entry = {"version": version, "mode": mode, "add": add, "remove": remove}
        if txn is not None:
            entry["txn"] = txn
        claim = os.path.join(logd, f"{version:020d}.json")
        try:
            with open(claim, "x") as fh:
                json.dump(entry, fh)
            return version
        except FileExistsError:
            continue  # lost the race — recompute version, retry
    raise RuntimeError(
        f"txlog commit contention: {_MAX_RETRIES} straight losses at {root}"
    )


def tx_write(
    df: DataFrame, root: str, mode: str = "append", txn: str | None = None
) -> int:
    """Write ``df`` as a new immutable data directory and commit it.

    ``mode='append'`` adds to the snapshot; ``mode='overwrite'``
    replaces it (prior directories stay on disk for time travel until
    :func:`tx_vacuum`). ``txn`` makes the write idempotent: a replay
    with the same token commits nothing (its freshly-written data dir
    stays unreferenced for :func:`tx_vacuum`) — the exactly-once
    handle for streaming/restart delivery. Returns the committed (or
    pre-existing, for a replayed txn) version."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if txn is not None:
        for c in _commits(root):
            if c.get("txn") == txn:
                return c["version"]  # replay — skip the data write too
    rel = os.path.join(_DATA_DIR, uuid.uuid4().hex)
    df.write.parquet(os.path.join(root, rel))
    return _commit(root, mode, [rel], [], txn=txn)


def tx_read(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Snapshot read at the latest (or a historical) version."""
    dirs = _active_dirs(root, version)
    if not dirs:
        raise ValueError(
            f"txlog table {root} has no data"
            + (f" at version {version}" if version is not None else "")
        )
    return spark.read.parquet(*[os.path.join(root, d) for d in dirs])


def tx_delete_where(
    spark: SparkSession, root: str, condition: Column
) -> int:
    """File-granular copy-on-write delete: ONE scan with
    ``input_file_name()`` finds the directories holding matching rows;
    only those are rewritten (filtered), the rest survive untouched —
    the Delta DELETE shape, where cost follows data locality, not
    table size. Returns the committed version (a no-op delete still
    commits, pinning the read snapshot it validated against)."""
    from pyspark.sql import functions as F

    touched_files = (
        tx_read(spark, root)
        .filter(condition)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    touched = set()
    for r in touched_files:
        p = r["f"].removeprefix("file://")
        rel = os.path.relpath(os.path.dirname(p), root)
        touched.add(rel)
    add: list[str] = []
    for d in sorted(touched):
        kept = spark.read.parquet(os.path.join(root, d)).filter(~condition)
        if kept.head(1):
            rel = os.path.join(_DATA_DIR, uuid.uuid4().hex)
            kept.write.parquet(os.path.join(root, rel))
            add.append(rel)
    return _commit(root, "replace", add, sorted(touched))


def tx_merge(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    key_cols: list[str],
) -> int:
    """Delta-style MERGE (upsert): rows of ``source`` replace
    same-key rows in the table; new keys are inserted. File-granular
    copy-on-write, same shape as :func:`tx_delete_where`: ONE
    broadcast-semi-join scan with ``input_file_name()`` finds the
    directories holding matched keys; only those are rewritten (with
    matched rows anti-joined away), everything else survives
    untouched, and the source lands as one new directory. Cost follows
    how many files the matched keys live in, not table size — with
    key-clustered layout (compact sorted by key) a point-key merge
    touches one file.

    The whole rewrite set + insert commits as ONE atomic version: a
    reader sees either the old snapshot or the fully-merged one."""
    from pyspark.sql import functions as F

    keys = source.select(*key_cols).distinct()
    # input_file_name() must be projected BEFORE the join: Spark
    # rejects it in plans with more than one file source, so tag each
    # row with its file in a single-source projection, then semi-join
    tagged = tx_read(spark, root).select(
        F.input_file_name().alias("f"), *key_cols
    )
    touched_files = (
        tagged.join(F.broadcast(keys), key_cols, "left_semi")
        .select("f")
        .distinct()
        .collect()
    )
    touched = set()
    for r in touched_files:
        p = r["f"].removeprefix("file://")
        touched.add(os.path.relpath(os.path.dirname(p), root))
    add: list[str] = []
    for d in sorted(touched):
        kept = spark.read.parquet(os.path.join(root, d)).join(
            F.broadcast(keys), key_cols, "left_anti"
        )
        if kept.head(1):
            rel = os.path.join(_DATA_DIR, uuid.uuid4().hex)
            kept.write.parquet(os.path.join(root, rel))
            add.append(rel)
    rel = os.path.join(_DATA_DIR, uuid.uuid4().hex)
    source.write.parquet(os.path.join(root, rel))
    add.append(rel)
    return _commit(root, "replace", add, sorted(touched))


def tx_compact(spark: SparkSession, root: str, n_files: int = 1) -> int:
    """Rewrite the live snapshot into ``n_files`` coalesced files and
    commit a replace — bounds file count AND log-replay length (a
    reader after compaction resolves one add). Old directories stay
    for time travel until :func:`tx_vacuum`."""
    dirs = _active_dirs(root)
    rel = os.path.join(_DATA_DIR, uuid.uuid4().hex)
    tx_read(spark, root).coalesce(n_files).write.parquet(
        os.path.join(root, rel)
    )
    return _commit(root, "replace", [rel], dirs)


def tx_vacuum(root: str) -> list[str]:
    """Delete data directories not referenced by the LATEST snapshot.
    Destroys time travel to versions that referenced them (Delta's
    vacuum contract). Returns the removed directory names."""
    live = {os.path.normpath(d) for d in _active_dirs(root)}
    datad = os.path.join(root, _DATA_DIR)
    removed = []
    if os.path.isdir(datad):
        for d in os.listdir(datad):
            rel = os.path.normpath(os.path.join(_DATA_DIR, d))
            if rel not in live:
                shutil.rmtree(os.path.join(root, rel), ignore_errors=True)
                removed.append(rel)
    return removed
