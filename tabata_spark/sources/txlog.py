"""Transactional table log — a minimal Delta-Lake-style commit
protocol over plain parquet files (public design: an ordered JSON
action log listing immutable data FILES; see the Delta Lake paper,
VLDB 2020).

Why the engine needs it: the mutable stores in this repo (rollup,
SCD2, CMS) rely on dynamic-partition overwrite plus directory
removal — correct single-writer, but readers can observe half-applied
states and concurrent writers can interleave. The tx log gives:

- **Atomic commits**: a version becomes visible only when its log
  entry ``_txlog/<version>.json`` is atomically created. The claim
  primitive is pluggable (:class:`FilesystemClaim` — O_EXCL-style
  hard link — by default; a conditional-PUT strategy on an object
  store, see :func:`tx_set_claimer`). Data files are immutable once
  committed.
- **Snapshot isolation**: a reader resolves the active file set from
  the log ONCE; in-flight writers add new files that no existing
  snapshot references.
- **Optimistic concurrency**: two writers racing on version N — one
  wins the claim, the loser re-reads the log and retries at N+1 (its
  already-written data files are unreferenced, so retrying is just
  another commit attempt).
- **Time travel**: any historical version replays the log prefix.
- **File-granular copy-on-write**: the log tracks individual parquet
  files (exactly as Delta does), so DELETE/MERGE rewrite only the
  files that actually hold matching rows — after a key-clustered
  :func:`tx_compact`, a point-key merge touches one file out of
  thousands.
- **Log checkpoints**: every ``CHECKPOINT_INTERVAL`` commits the
  resolved table state (active files, schema history, txn tokens,
  file stats) is summarized into ``<version>.checkpoint.json``
  (Delta's checkpoint mechanism); snapshot resolution then reads ONE
  checkpoint plus the commit suffix — O(1) + O(suffix), not
  O(commits).

Scale shape: the log is O(commits) tiny JSON; state resolution reads
the latest checkpoint + suffix, never lists data. At 100 TB the same
layout works with the log in a strongly-consistent store; periodic
:func:`tx_compact` bounds both file count and log-replay length (and
with ``cluster_by`` buys CoW locality + footer-stats pruning).
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
_CKPT_SUFFIX = ".checkpoint.json"

#: Auto-checkpoint cadence: after a commit lands on a multiple of this
#: version number, the committer writes a checkpoint summarizing the
#: whole resolved state (Delta defaults to 10). Resolution cost is
#: then bounded by the interval regardless of table age.
CHECKPOINT_INTERVAL = 20


# ---------------------------------------------------------------------------
# commit-claim strategies (the object-store seam)


class FilesystemClaim:
    """Default claim strategy: POSIX atomic hard link.

    **The contract an alternative (object-store) strategy must meet**
    — this is the entire concurrency story, so it is spelled out:

    ``claim(logd, name, payload)`` atomically publishes ``payload``
    as the entry named ``name`` in log directory ``logd`` IFF no
    entry with that name exists, returning True; it returns False
    (without side effects visible to readers) when the name is
    already taken — the caller lost the race and will retry at the
    next version. Readers must never observe a partially-written
    entry, and a True return must be durable: once acknowledged, the
    entry survives a crash (a lost acknowledged commit would let a
    replayed streaming batch double-apply despite its txn token).

    On S3 / GCS / ABFS the implementation is a conditional PUT of the
    payload to the ``<logd>/<name>`` key (``If-None-Match: *`` /
    ``ifGenerationMatch=0`` / ``If-None-Match`` on blob creation),
    which those stores execute atomically and durably — exactly the
    mechanism Delta uses where the store supports it. Register such a
    strategy per table with :func:`tx_set_claimer`.

    The filesystem default writes a fully-fsynced temp file and
    hard-links it into the claim name — link(2) fails if the name
    exists, and the entry is never visible half-written (an
    open('x') + write would expose a partial/empty file to concurrent
    readers, and a crash between the two would brick the version
    forever). After a successful link the log DIRECTORY is fsynced
    too: the file's bytes were already fsynced via the temp fd, but
    the directory entry (the link itself) is metadata that a power
    loss could otherwise drop even after we acknowledged the commit.
    """

    def claim(self, logd: str, name: str, payload: bytes) -> bool:
        tmp = os.path.join(logd, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, os.path.join(logd, name))  # atomic claim
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)
        dfd = os.open(logd, os.O_RDONLY)
        try:
            os.fsync(dfd)  # durable directory entry (see docstring)
        finally:
            os.close(dfd)
        return True


_FS_CLAIM = FilesystemClaim()
_CLAIMERS: dict[str, object] = {}


class FilesystemLogStore:
    """Default log store: the filesystem IS the log. Owns ALL log
    I/O for a table — listing entry names, reading entries, atomic
    unclaimed writes (checkpoints), and claimed writes (commits,
    delegated to the table's claim strategy). The object-store
    counterpart is :class:`~tabata_spark.sources.objectstore.
    ObjectStoreLogStore`, installed via :func:`tx_set_log_store` —
    with it, NO local ``_txlog`` directory exists at all."""

    def __init__(self, claimer=None) -> None:
        self._claimer = claimer or _FS_CLAIM

    def prepare(self, logd: str) -> None:
        os.makedirs(logd, exist_ok=True)

    def list_names(self, logd: str) -> list[str]:
        if os.path.isdir(logd):
            return os.listdir(logd)
        return []

    def read(self, logd: str, name: str) -> bytes:
        with open(os.path.join(logd, name), "rb") as fh:
            return fh.read()

    def write(self, logd: str, name: str, payload: bytes) -> None:
        """Atomic UNCLAIMED publish (checkpoints): tmp + rename — a
        reader sees the whole entry or none; last writer wins (all
        checkpoint writers for a version produce identical bytes)."""
        tmp = os.path.join(logd, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(logd, name))

    def claim(self, logd: str, name: str, payload: bytes) -> bool:
        return self._claimer.claim(logd, name, payload)


_LOG_STORES: dict[str, object] = {}


def tx_set_log_store(root: str, log_store) -> None:
    """Install a LOG STORE for table ``root`` (None restores the
    filesystem default) — the full object-store seam: listing,
    reading, checkpointing AND claiming all route through it, so the
    transactional LOG needs no local ``_txlog`` directory at all (the
    r9 gap: :func:`tx_set_claimer` covered only commit arbitration
    and mirrored entries to the filesystem for the read side).

    The contract (all four methods; ``prepare`` may be a no-op):
    ``list_names(logd)`` → entry names under the log's key prefix;
    ``read(logd, name)`` → entry bytes (KeyError/FileNotFoundError
    when absent); ``write(logd, name, payload)`` → atomic
    last-writer-wins publish (checkpoints only — identical bytes per
    version); ``claim(logd, name, payload)`` → atomic
    publish-if-absent per :class:`FilesystemClaim`'s contract.

    DATA files are not routed: Spark's own Hadoop FS connectors
    already read/write parquet on any object store — the log is the
    only part needing conditional-create semantics the connectors
    don't expose."""
    key = os.path.abspath(root)
    if log_store is None:
        _LOG_STORES.pop(key, None)
    else:
        _LOG_STORES[key] = log_store


def tx_set_claimer(root: str, claimer) -> None:
    """Install a commit-claim strategy for table ``root`` (None
    restores the filesystem default). The strategy must satisfy the
    contract documented on :class:`FilesystemClaim` — on an object
    store, a conditional PUT of the entry payload. Reads still go
    through the filesystem log path, so a bare claim strategy mirrors
    entries locally; prefer :func:`tx_set_log_store`, which routes
    the READ side through the store too."""
    key = os.path.abspath(root)
    if claimer is None:
        _CLAIMERS.pop(key, None)
    else:
        _CLAIMERS[key] = claimer


def _claimer(root: str):
    return _CLAIMERS.get(os.path.abspath(root), _FS_CLAIM)


def _log_store(root: str):
    store = _LOG_STORES.get(os.path.abspath(root))
    if store is not None:
        return store
    return FilesystemLogStore(_claimer(root))


# ---------------------------------------------------------------------------
# log listing + state resolution (checkpoint-accelerated)


def _log_path(root: str) -> str:
    return os.path.join(root, _LOG_DIR)


def _list_log(root: str) -> tuple[list[int], list[int]]:
    """(commit versions, checkpoint versions), each sorted — from the
    entry NAMES alone (one directory/prefix listing, no entry reads).
    Ignores foreign files (crashed tmp files can never collide with
    the ``<20-digit>.json`` claim names)."""
    commits: list[int] = []
    ckpts: list[int] = []
    for f in _log_store(root).list_names(_log_path(root)):
        if f.endswith(_CKPT_SUFFIX) and f[: -len(_CKPT_SUFFIX)].isdigit():
            ckpts.append(int(f[: -len(_CKPT_SUFFIX)]))
        elif f.endswith(".json") and f[:-5].isdigit():
            commits.append(int(f[:-5]))
    return sorted(commits), sorted(ckpts)


def _read_commit(root: str, version: int) -> dict:
    return json.loads(
        _log_store(root).read(_log_path(root), f"{version:020d}.json")
    )


def _commits(root: str) -> list[dict]:
    """All committed actions, version-ordered (the full-history path —
    :func:`tx_history` only; state resolution goes through
    :func:`_resolve` instead, which reads O(1) + O(suffix) files)."""
    return [_read_commit(root, v) for v in _list_log(root)[0]]


def _empty_state() -> dict:
    return {
        "version": 0,
        "active": [],
        # [[version, schema]] recorded only when the schema CHANGED —
        # >1 entry means the table evolved and reads must merge
        "schema_history": [],
        "txns": {},
        "stats": {},
    }


def _apply(state: dict, c: dict) -> None:
    state["version"] = c["version"]
    if c["mode"] == "overwrite":
        state["active"] = []
        state["stats"] = {}
    elif c["mode"] == "replace":
        rm = set(c.get("remove", []))
        state["active"] = [f for f in state["active"] if f not in rm]
        # drop dead-file stats with the files: without this, resolved
        # state and every checkpoint grow monotonically across
        # compactions (each tx_compact would double the tracked set)
        for f in rm:
            state["stats"].pop(f, None)
    state["active"].extend(c["add"])
    if "schema" in c:
        h = state["schema_history"]
        if not h or h[-1][1] != c["schema"]:
            h.append([c["version"], c["schema"]])
    if "txn" in c:
        state["txns"][c["txn"]] = c["version"]
    state["stats"].update(c.get("stats", {}))


def _resolve(root: str, version: int | None = None) -> dict:
    """Resolve the table state at ``version`` (or latest): start from
    the newest checkpoint at-or-before it and replay only the commit
    suffix. This is the O(1) + O(suffix) path every read/write uses;
    only :func:`tx_history` ever replays the whole log."""
    commit_vs, ckpt_vs = _list_log(root)
    if version is not None:
        commit_vs = [v for v in commit_vs if v <= version]
        ckpt_vs = [v for v in ckpt_vs if v <= version]
    state = _empty_state()
    start = 0
    if ckpt_vs:
        start = ckpt_vs[-1]
        state = json.loads(
            _log_store(root).read(
                _log_path(root), f"{start:020d}{_CKPT_SUFFIX}"
            )
        )
    for v in commit_vs:
        if v > start:
            _apply(state, _read_commit(root, v))
    return state


def _write_checkpoint(root: str, state: dict) -> None:
    """Atomically publish a checkpoint of ``state`` at its version
    (the log store's unclaimed write: tmp + rename on a filesystem, a
    plain PUT on an object store — a reader either sees the whole
    checkpoint or none; all writers of a version produce identical
    bytes, so last-writer-wins is benign. A crashed half-written
    checkpoint is invisible — the log remains the source of truth,
    checkpoints only accelerate it)."""
    _log_store(root).write(
        _log_path(root),
        f"{state['version']:020d}{_CKPT_SUFFIX}",
        json.dumps(state).encode(),
    )


def tx_checkpoint(root: str) -> int:
    """Write a log checkpoint at the latest version and return it —
    callable any time; the committer also does this automatically
    every :data:`CHECKPOINT_INTERVAL` commits."""
    state = _resolve(root)
    if state["version"] == 0:
        raise ValueError(f"txlog table {root} has no commits to checkpoint")
    _write_checkpoint(root, state)
    return state["version"]


def tx_history(root: str) -> list[dict]:
    """The committed action log (version, mode, add/remove files)."""
    return _commits(root)


def _active_files(root: str, version: int | None = None) -> list[str]:
    """The live data-file set (root-relative paths) at ``version``
    (or latest), resolved checkpoint-first."""
    return _resolve(root, version)["active"]


def _canonical_schema(df: DataFrame) -> list[list[str]]:
    """(name, type) pairs, nullability ignored — the schema identity
    the log enforces."""
    return [[f.name, f.dataType.simpleString()] for f in df.schema.fields]


def _latest_schema(root: str) -> list[list[str]] | None:
    """The canonical schema of the most recent commit that recorded
    one (schema evolution makes later commits authoritative)."""
    h = _resolve(root)["schema_history"]
    return h[-1][1] if h else None


def _check_schema(
    root: str, df: DataFrame, evolve: bool = False
) -> list[list[str]]:
    """Schema enforcement on write (Delta's contract): every write
    must match the table's canonical schema exactly (names + types,
    order-sensitive like parquet itself). A mixed-schema table is
    silently corrupt — an INT file in a BIGINT column fails only at
    read time, on whichever file a scan touches first — so mismatch
    is an error at WRITE time, where the caller can still fix it.

    ``evolve=True`` permits ADDITIVE evolution (Delta's mergeSchema):
    the write may introduce new columns, but every existing table
    column must keep its name and type — old files then read with
    nulls in the new columns. Type changes and drops stay errors."""
    schema = _canonical_schema(df)
    table = _latest_schema(root)
    if table is None or table == schema:
        return schema
    if evolve:
        new = dict(map(tuple, schema))
        bad = [
            [n, t]
            for n, t in map(tuple, table)
            if n not in new or new[n] != t
        ]
        if not bad:
            return schema  # additive: new canonical schema
        raise ValueError(
            f"schema evolution on txlog table {root} may only ADD "
            f"columns: existing {bad} changed or dropped"
        )
    raise ValueError(
        f"schema mismatch writing to txlog table {root}: "
        f"table has {table}, write has {schema} "
        "(cast/rename to match, pass evolve=True to add columns, "
        "or start a new table)"
    )


def _write_data(df: DataFrame, root: str) -> list[str]:
    """Write ``df`` into a fresh immutable directory and return the
    root-relative paths of its parquet part files — the unit the log
    tracks (Delta's add-file actions)."""
    rel_dir = os.path.join(_DATA_DIR, uuid.uuid4().hex)
    full = os.path.join(root, rel_dir)
    df.write.parquet(full)
    return sorted(
        os.path.join(rel_dir, f)
        for f in os.listdir(full)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def _file_stats(root: str, files: list[str], cols: list[str]) -> dict:
    """Per-file min/max of ``cols`` from the parquet FOOTERS (pyarrow
    metadata — no data read): the Delta add-file stats that let
    readers prune files from the log alone. Values are JSON-encoded;
    non-primitive or statless columns are simply absent."""
    import pyarrow.parquet as pq

    out: dict = {}
    for rel in files:
        md = pq.ParquetFile(os.path.join(root, rel)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        stats: dict = {}
        for c in cols:
            if c not in idx:
                continue
            lo = hi = None
            ok = True
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(idx[c]).statistics
                if s is None or not s.has_min_max:
                    ok = False
                    break
                mn, mx = s.min, s.max
                if isinstance(mn, bytes):
                    mn, mx = mn.decode("utf-8", "replace"), mx.decode(
                        "utf-8", "replace"
                    )
                lo = mn if lo is None or mn < lo else lo
                hi = mx if hi is None or mx > hi else hi
            if ok and lo is not None:
                stats[c] = [lo, hi]
        if stats:
            out[rel] = stats
    return out


def tx_files_for_box(
    root: str, box: dict, version: int | None = None
) -> tuple[list[str], int]:
    """Multi-dimensional data skipping from the LOG alone (no footer
    reads at query time): the active files whose recorded [min, max]
    intersects ``[lo, hi]`` on EVERY dimension of ``box`` ({col:
    (lo, hi)}) — a file is skipped as soon as ANY dimension's range
    excludes it, and files with no recorded stats for a dimension are
    kept conservatively. After a :func:`tx_compact` with
    ``zorder_by`` on the box's columns, every dimension's per-file
    range is narrow, so a k-dimensional box prunes on all k
    predicates at once (the Z-order payoff a 1-D ``cluster_by``
    can't give). Returns (kept_files, n_skipped)."""
    state = _resolve(root, version)
    stats = state["stats"]
    kept, skipped = [], 0
    for f in state["active"]:
        fs = stats.get(f, {})
        for col, (lo, hi) in box.items():
            s = fs.get(col)
            if s is not None and (s[1] < lo or s[0] > hi):
                skipped += 1
                break
        else:
            kept.append(f)
    return kept, skipped


def tx_files_for_range(
    root: str, col: str, lo, hi, version: int | None = None
) -> tuple[list[str], int]:
    """1-D special case of :func:`tx_files_for_box`."""
    return tx_files_for_box(root, {col: (lo, hi)}, version)


def tx_read_box(
    spark: SparkSession, root: str, box: dict
) -> DataFrame:
    """Box-predicate snapshot read with log-level data skipping:
    files whose recorded stats exclude the box on any dimension never
    reach the scan (on top of parquet's own row-group pruning within
    the files that do), and the box predicates are applied to the
    survivors so the result is exactly the rows inside the box. Reads
    go through the canonical-schema path (evolved columns intact)."""
    from pyspark.sql import functions as F

    files, _ = tx_files_for_box(root, box)
    if not files:
        return tx_read(spark, root).filter(F.lit(False))
    state = _resolve(root)
    df = _read_files_canonical(spark, root, files, state)
    for col, (lo, hi) in box.items():
        df = df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
    return df


def tx_read_range(
    spark: SparkSession, root: str, col: str, lo, hi
) -> DataFrame:
    """Range-predicate snapshot read with log-level data skipping:
    files whose stats exclude [lo, hi] never reach the scan (on top
    of parquet's own row-group pruning within the files that do).
    After a ``cluster_by`` compact with ``stats_cols`` on the same
    key, a point/range read touches only the files owning that
    range — O(selectivity), not O(table)."""
    return tx_read_box(spark, root, {col: (lo, hi)})


def tx_files_for_values(
    root: str, col: str, values, version: int | None = None
) -> tuple[list[str], int]:
    """Value-SET data skipping from the log alone: the active files
    whose recorded [min, max] on ``col`` contains AT LEAST ONE of
    ``values`` (an IN-list probe, vs the interval probe of
    :func:`tx_files_for_range`). Files without recorded stats are
    kept conservatively. After a ``cluster_by=[col]`` compact each
    file owns a narrow value range, so k probe values touch at most
    k files no matter how many files the table has — the shape that
    makes point lookups (e.g. an LSH bucket probe against a stored
    signature index) O(probes), not O(table). Membership is decided
    per file by binary search over the SORTED probe list: O(log k)
    per file, so a large IN-list stays cheap. Returns
    (kept_files, n_skipped)."""
    import bisect

    state = _resolve(root, version)
    vals = sorted(set(values))
    if not vals:
        return [], len(state["active"])
    stats = state["stats"]
    kept, skipped = [], 0
    for f in state["active"]:
        s = stats.get(f, {}).get(col)
        if s is None:
            kept.append(f)
            continue
        i = bisect.bisect_left(vals, s[0])
        if i < len(vals) and vals[i] <= s[1]:
            kept.append(f)
        else:
            skipped += 1
    return kept, skipped


def tx_read_values(
    spark: SparkSession, root: str, col: str, values
) -> DataFrame:
    """IN-list snapshot read with log-level data skipping: files
    whose stats exclude every probe value never reach the scan, and
    the IN predicate is applied to the survivors (parquet row-group
    stats prune further inside kept files). The point-probe
    counterpart of :func:`tx_read_range`."""
    from pyspark.sql import functions as F

    vals = sorted(set(values))
    files, _ = tx_files_for_values(root, col, vals)
    if not files:
        return tx_read(spark, root).filter(F.lit(False))
    state = _resolve(root)
    df = _read_files_canonical(spark, root, files, state)
    if len(vals) <= 64:
        # small lists push into the parquet scan as an IN filter
        return df.filter(F.col(col).isin(vals))
    # large lists: a literal IN expression with thousands of entries
    # is a Catalyst/codegen pathology (measured r8: a ~16k-value isin
    # made a pruned read 2.5x SLOWER than the full scan it replaced).
    # A broadcast semi-join against a values frame keeps the plan
    # size O(1) and still evaluates as a hashed lookup per row.
    from pyspark.sql.types import StructType

    field = next(f for f in df.schema.fields if f.name == col)
    vdf = spark.createDataFrame(
        [(v,) for v in vals], schema=StructType([field])
    )
    return df.join(F.broadcast(vdf), col, "left_semi")


class TxConflictError(RuntimeError):
    """A replace commit's read snapshot was invalidated by a
    concurrent non-append commit — re-run the operation against the
    new snapshot (Delta's ConcurrentModificationException)."""


def _commit(
    root: str,
    mode: str,
    add: list[str],
    remove: list[str],
    txn: str | None = None,
    schema: list[list[str]] | None = None,
    base_version: int | None = None,
    stats: dict | None = None,
) -> int:
    """Atomically claim the next version via the table's claim
    strategy (:class:`FilesystemClaim` default — see its docstring
    for the atomicity/durability contract and the object-store
    conditional-PUT equivalent). Losing a race means re-resolving the
    log and retrying — the files in ``add`` are unreferenced until
    the commit lands, so a retry is safe.

    ``txn`` is an idempotence token (Delta's transaction-identifier
    mechanism): if any committed entry already carries it, the commit
    is a no-op returning that version — the retry loop re-checks after
    every lost race, so exactly one writer of a txn ever lands.

    ``base_version`` is the snapshot a replace commit computed its
    remove set against. If any NON-APPEND commit landed after it, the
    remove/add sets are stale (e.g. a concurrent compact already
    removed the same files — blindly committing would resurrect
    deleted rows and duplicate survivors), so the commit raises
    :class:`TxConflictError` instead of corrupting the table.
    Concurrent appends are tolerated: they add files the replace
    never read, matching Delta's WriteSerializable level.

    After a landed commit whose version is a multiple of
    :data:`CHECKPOINT_INTERVAL`, the resolved state is checkpointed
    (best-effort acceleration — a crash before the checkpoint loses
    nothing; the commit itself is already durable)."""
    logd = _log_path(root)
    store = _log_store(root)
    store.prepare(logd)
    for _ in range(_MAX_RETRIES):
        state = _resolve(root)
        if txn is not None and txn in state["txns"]:
            return state["txns"][txn]
        latest = state["version"]
        if base_version is not None:
            for v in range(base_version + 1, latest + 1):
                c = _read_commit(root, v)
                if c["mode"] != "append":
                    raise TxConflictError(
                        f"txlog {root}: concurrent {c['mode']} commit "
                        f"v{c['version']} invalidated this operation's "
                        f"snapshot v{base_version} — re-run it"
                    )
        version = latest + 1
        entry = {"version": version, "mode": mode, "add": add, "remove": remove}
        if txn is not None:
            entry["txn"] = txn
        if schema is not None:
            entry["schema"] = schema
        if stats:
            entry["stats"] = stats
        payload = json.dumps(entry).encode()
        if store.claim(logd, f"{version:020d}.json", payload):
            if version % CHECKPOINT_INTERVAL == 0:
                # best-effort FOR REAL: the commit is already durable,
                # so an I/O failure here must not surface as a commit
                # error (a retrying caller would double-apply); the
                # next interval re-checkpoints
                try:
                    _write_checkpoint(root, _resolve(root, version))
                except OSError:
                    pass
            return version
        # lost the race — recompute version, retry
    raise RuntimeError(
        f"txlog commit contention: {_MAX_RETRIES} straight losses at {root}"
    )


def tx_write(
    df: DataFrame,
    root: str,
    mode: str = "append",
    txn: str | None = None,
    evolve: bool = False,
    stats_cols: list[str] | None = None,
) -> int:
    """Write ``df`` as new immutable data files and commit them.

    ``mode='append'`` adds to the snapshot; ``mode='overwrite'``
    replaces it (prior files stay on disk for time travel until
    :func:`tx_vacuum`). ``txn`` makes the write idempotent: a replay
    with the same token commits nothing (its freshly-written files
    stay unreferenced for :func:`tx_vacuum`) — the exactly-once
    handle for streaming/restart delivery. ``evolve=True`` allows the
    write to ADD columns (see :func:`_check_schema`); readers then
    merge schemas and old rows surface nulls in the new columns.
    Returns the committed (or pre-existing, for a replayed txn)
    version."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if txn is not None:
        txns = _resolve(root)["txns"]
        if txn in txns:
            return txns[txn]  # replay — skip the data write too
    schema = _check_schema(root, df, evolve=evolve)
    files = _write_data(df, root)
    stats = _file_stats(root, files, stats_cols) if stats_cols else None
    return _commit(
        root, mode, files, [], txn=txn, schema=schema, stats=stats
    )


def _read_files_canonical(
    spark: SparkSession, root: str, files: list[str], state: dict
) -> DataFrame:
    """Read specific table files under the CANONICAL (latest) schema.

    After additive schema evolution a file set can mix old- and
    new-schema files; a plain ``spark.read.parquet`` would infer one
    file's (possibly narrower) schema and silently drop evolved
    columns — fatal when the result is a copy-on-write REWRITE, which
    would then commit a corrupted snapshot. So: merge file schemas
    (footer reads — only paid when the log actually records more than
    one schema) and project to the canonical latest order, nulls
    where a file predates a column."""
    from pyspark.sql import functions as F

    hist = state["schema_history"]
    reader = spark.read
    evolved = len(hist) > 1
    if evolved:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(*[os.path.join(root, f) for f in files])
    if evolved:
        cols = [
            F.col(n) if n in df.columns else F.lit(None).cast(t).alias(n)
            for n, t in map(tuple, hist[-1][1])
        ]
        df = df.select(*cols)
    return df


def tx_read(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Snapshot read at the latest (or a historical) version — the
    exact file list from the log (checkpoint-accelerated), no
    directory listing. After schema evolution the scan merges file
    schemas and columns come back in the canonical (latest-schema,
    as of the requested version — Delta time travel presents each
    version under its own era's schema) order with nulls where old
    files predate a column."""
    state = _resolve(root, version)
    files = state["active"]
    if not files:
        raise ValueError(
            f"txlog table {root} has no data"
            + (f" at version {version}" if version is not None else "")
        )
    return _read_files_canonical(spark, root, files, state)


def _touched_relpaths(root: str, rows) -> list[str]:
    out = set()
    for r in rows:
        p = r["f"].removeprefix("file://")
        out.add(os.path.relpath(p, root))
    return sorted(out)


def _latest_version(root: str) -> int:
    commits, _ = _list_log(root)
    return commits[-1] if commits else 0


def tx_version(root: str) -> int:
    """Latest committed version of the table (0 = no table yet)."""
    return _latest_version(root)


def tx_txns(root: str) -> dict:
    """Resolved txn-token → version map of the current snapshot — the
    Delta ``txnVersion`` lookup. Lets an application discover the
    high-water mark of an idempotent writer (e.g. which source
    version a derived index has absorbed) without side-channel
    state."""
    return dict(_resolve(root)["txns"])


def tx_added_files(root: str, after_version: int, mode: str = "append") -> list[str]:
    """Relpaths of data files ADDED by commits with
    ``version > after_version`` and the given ``mode`` — the
    change-feed primitive a derived index uses to catch up on an
    append-only table. The returned files may since have been
    compacted out of the ACTIVE set; they still hold exactly the rows
    those commits introduced and remain on disk until
    :func:`tx_vacuum`, so a bounded catch-up can read them directly
    (callers should fall back to a full rebuild if one has been
    vacuumed away)."""
    out: list[str] = []
    for c in _commits(root):
        if c["version"] > after_version and c["mode"] == mode:
            out.extend(c["add"])
    return out


def tx_delete_where(
    spark: SparkSession, root: str, condition: Column
) -> int:
    """File-granular copy-on-write delete: ONE scan with
    ``input_file_name()`` finds the exact files holding matching rows;
    only those are rewritten (filtered), every other file survives
    untouched — the Delta DELETE shape, where cost follows data
    locality, not table size. Returns the committed version (a no-op
    delete still commits, pinning the snapshot it validated against).
    Raises :class:`TxConflictError` if a concurrent non-append commit
    invalidated the snapshot.

    SQL three-valued logic: only rows where ``condition`` is TRUE are
    deleted. Rows where it evaluates to NULL (e.g. a null in a column
    the predicate references) are KEPT — a bare ``filter(~cond)``
    would silently drop them from the rewrite (NULL is not TRUE), so
    the keep-side predicate is null-coalesced to False before
    negation (the SQL-standard DELETE contract; Delta matches it)."""
    from pyspark.sql import functions as F

    state = _resolve(root)
    base = state["version"]
    snap = tx_read(spark, root)
    touched = _touched_relpaths(
        root,
        snap.filter(condition)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect(),
    )
    add: list[str] = []
    if touched:
        kept = _read_files_canonical(spark, root, touched, state).filter(
            ~F.coalesce(condition, F.lit(False))
        )
        if kept.head(1):
            add = _write_data(kept, root)
    return _commit(
        root, "replace", add, touched,
        schema=_canonical_schema(snap), base_version=base,
    )


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
    exact files holding matched keys; only those are rewritten (with
    matched rows anti-joined away, under the canonical merged schema
    so evolved columns survive the rewrite), everything else survives
    untouched, and the source lands as new files. Cost follows how
    many files the matched keys live in, not table size — after a
    key-clustered :func:`tx_compact`, a point-key merge touches one
    file (pinned by test).

    The whole rewrite set + insert commits as ONE atomic version: a
    reader sees either the old snapshot or the fully-merged one.
    Raises ValueError when ``source`` carries duplicate keys (Delta's
    multiple-source-matches error — silently inserting both would
    leave the table permanently violating key uniqueness), and
    :class:`TxConflictError` on a concurrent non-append commit."""
    from pyspark.sql import functions as F

    state = _resolve(root)
    base = state["version"]
    schema = _check_schema(root, source)
    dup = (
        source.groupBy(*key_cols)
        .count()
        .filter(F.col("count") > 1)
        .head(1)
    )
    if dup:
        raise ValueError(
            f"tx_merge source has duplicate keys on {key_cols} "
            f"(e.g. {tuple(dup[0][k] for k in key_cols)}) — an upsert "
            "with ambiguous sources has no well-defined result"
        )
    keys = source.select(*key_cols).distinct()
    # input_file_name() must be projected BEFORE the join: Spark
    # rejects it in plans with more than one file source, so tag each
    # row with its file in a single-source projection, then semi-join
    tagged = tx_read(spark, root).select(
        F.input_file_name().alias("f"), *key_cols
    )
    touched = _touched_relpaths(
        root,
        tagged.join(F.broadcast(keys), key_cols, "left_semi")
        .select("f")
        .distinct()
        .collect(),
    )
    add: list[str] = []
    if touched:
        kept = _read_files_canonical(spark, root, touched, state).join(
            F.broadcast(keys), key_cols, "left_anti"
        )
        if kept.head(1):
            add.extend(_write_data(kept, root))
    add.extend(_write_data(source, root))
    return _commit(
        root, "replace", add, touched, schema=schema, base_version=base
    )


def tx_compact(
    spark: SparkSession,
    root: str,
    n_files: int = 1,
    cluster_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> int:
    """Rewrite the live snapshot into ``n_files`` files and commit a
    replace — bounds file count AND log-replay length (a reader after
    compaction resolves one add set). Old files stay for time travel
    until :func:`tx_vacuum`.

    ``cluster_by`` range-partitions and sorts the rewrite on the given
    key columns (Delta's OPTIMIZE clustering in the 1-D case): each
    output file then holds a disjoint key range, so a later
    :func:`tx_merge`/:func:`tx_delete_where` on clustered keys
    rewrites only the files whose ranges contain them, and parquet
    min/max footer stats prune snapshot reads — this is what turns
    the CoW cost from O(table) into O(touched data).

    ``zorder_by`` (≥2 integer-valued columns, mutually exclusive with
    ``cluster_by``) clusters by the Morton interleave of the columns'
    integer ranks instead (Delta's OPTIMIZE ZORDER BY; key machinery
    shared with :mod:`tabata_spark.core.maintenance`): every
    participating column's per-file [min, max] comes out narrow —
    ~n_files^(1/k) of its span with k dimensions — so a box predicate
    on ANY subset of the columns prunes files via the recorded log
    stats (:func:`tx_files_for_box`), where a 1-D cluster only ever
    prunes on its leading key. Bounds come from one scalar
    aggregation folded back as literals; the key is exact BIGINT
    shift/mask arithmetic, so the layout is deterministic under any
    partitioning. Stats are recorded for the z-order columns by
    default."""
    base = _latest_version(root)
    files = _active_files(root)
    snap = tx_read(spark, root)
    if cluster_by and zorder_by:
        raise ValueError("cluster_by and zorder_by are mutually exclusive")
    if zorder_by:
        from pyspark.sql import functions as F

        from tabata_spark.core.maintenance import zorder_key, zorder_rank

        row = snap.agg(
            *[F.min(c).cast("long").alias(f"__mn_{c}") for c in zorder_by],
            *[F.max(c).cast("long").alias(f"__mx_{c}") for c in zorder_by],
        ).collect()[0]
        allnull = [c for c in zorder_by if row[f"__mn_{c}"] is None]
        if allnull:
            raise ValueError(f"zorder_by columns are all-null: {allnull}")
        ranked = [
            zorder_rank(c, row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in zorder_by
        ]
        snap = (
            snap.withColumn("__z", zorder_key(ranked))
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    elif cluster_by:
        snap = snap.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        snap = snap.coalesce(n_files)
    out_files = _write_data(snap, root)
    # clustered compaction records stats for its cluster keys by
    # default — disjoint (cluster) or narrow (z-order) per-file ranges
    # are exactly what data skipping (tx_files_for_box) feeds on
    cols = stats_cols if stats_cols is not None else (cluster_by or zorder_by or [])
    stats = _file_stats(root, out_files, cols) if cols else None
    return _commit(
        root, "replace", out_files, files,
        schema=_canonical_schema(snap), base_version=base, stats=stats,
    )


def tx_vacuum(root: str, retention_s: float = 3600.0) -> list[str]:
    """Delete data files not referenced by the LATEST snapshot (and
    prune emptied directories). Destroys time travel to versions that
    referenced them (Delta's vacuum contract). Returns the removed
    file paths.

    ``retention_s`` protects IN-FLIGHT writers (Delta's retention
    window): a writer inside ``tx_write``/``tx_merge`` has written
    data files that no snapshot references YET — its commit lands a
    moment later. Only unreferenced files older than the window are
    deleted; vacuuming with ``retention_s=0`` while any writer is
    active can delete files a succeeding commit then references,
    bricking the snapshot."""
    import time

    live = {os.path.normpath(f) for f in _active_files(root)}
    datad = os.path.join(root, _DATA_DIR)
    cutoff = time.time() - retention_s
    removed = []
    if os.path.isdir(datad):
        for d in os.listdir(datad):
            sub = os.path.join(datad, d)
            if not os.path.isdir(sub):
                continue
            for f in os.listdir(sub):
                rel = os.path.normpath(os.path.join(_DATA_DIR, d, f))
                full = os.path.join(root, rel)
                if (
                    f.endswith(".parquet")
                    and rel not in live
                    and os.path.getmtime(full) <= cutoff
                ):
                    os.remove(full)
                    removed.append(rel)
            if not any(
                f.endswith(".parquet") for f in os.listdir(sub)
            ):
                shutil.rmtree(sub, ignore_errors=True)
    return removed


def tx_restore(root: str, version: int) -> int:
    """Restore the table to a historical version's snapshot (Delta
    RESTORE): commits a replace whose file set equals that version's —
    no data is copied, the old files are simply re-referenced, and the
    restore itself is one more versioned commit (so it can in turn be
    time-traveled past or restored away). Raises for a version the
    table never had, or if any needed file was already vacuumed.
    Pure log/filesystem work — no SparkSession involved (like
    :func:`tx_vacuum`)."""
    latest = _latest_version(root)
    if not 1 <= version <= latest:
        # existence must be checked against the VERSION RANGE, not the
        # file set: a too-high version replays the whole log and would
        # silently "restore" the current snapshot, and a real version
        # whose snapshot is legitimately empty (delete-all) would be
        # wrongly rejected
        raise ValueError(
            f"txlog table {root} has no version {version} (latest: {latest})"
        )
    target = _active_files(root, version)
    missing = [f for f in target if not os.path.exists(os.path.join(root, f))]
    if missing:
        raise ValueError(
            f"cannot restore {root} to v{version}: {len(missing)} of its "
            f"files were vacuumed (e.g. {missing[0]})"
        )
    current = _active_files(root)
    cur = set(current)
    tgt = set(target)
    return _commit(
        root,
        "replace",
        [f for f in target if f not in cur],
        [f for f in current if f not in tgt],
        base_version=latest,
    )
