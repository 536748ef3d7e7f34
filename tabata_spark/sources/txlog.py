"""Transactional table log — a minimal Delta-Lake-style commit
protocol over plain parquet files (public design: an ordered JSON
action log listing immutable data FILES; see the Delta Lake paper,
VLDB 2020).

Why the engine needs it: the mutable stores in this repo (rollup,
SCD2, CMS) rely on dynamic-partition overwrite plus directory
removal — correct single-writer, but readers can observe half-applied
states and concurrent writers can interleave. The tx log gives:

- **Atomic commits**: a version becomes visible only when its log
  entry ``_txlog/<version>.json`` is atomically created (O_EXCL on a
  filesystem; a conditional PUT on an object store). Data files are
  immutable once committed.
- **Snapshot isolation**: a reader resolves the active file set from
  the log ONCE; in-flight writers add new files that no existing
  snapshot references.
- **Optimistic concurrency**: two writers racing on version N — one
  wins the O_EXCL create, the loser re-reads the log and retries at
  N+1 (its already-written data files are unreferenced, so retrying
  is just another commit attempt).
- **Time travel**: any historical version replays the log prefix.
- **File-granular copy-on-write**: the log tracks individual parquet
  files (exactly as Delta does), so DELETE/MERGE rewrite only the
  files that actually hold matching rows — after a key-clustered
  :func:`tx_compact`, a point-key merge touches one file out of
  thousands.

Scale shape: the log is O(commits) tiny JSON; state resolution reads
the log, never lists data. At 100 TB the same layout works with the
log in a strongly-consistent store; periodic :func:`tx_compact`
bounds both file count and log-replay length (and with
``cluster_by`` buys CoW locality + footer-stats pruning).
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
    """The committed action log (version, mode, add/remove files)."""
    return _commits(root)


def _active_files(root: str, version: int | None = None) -> list[str]:
    """Replay the log (to ``version`` inclusive, or fully) into the
    live data-file set (root-relative paths)."""
    active: list[str] = []
    for c in _commits(root):
        if version is not None and c["version"] > version:
            break
        if c["mode"] == "overwrite":
            active = []
        elif c["mode"] == "replace":
            rm = set(c.get("remove", []))
            active = [f for f in active if f not in rm]
        active.extend(c["add"])
    return active


def _canonical_schema(df: DataFrame) -> list[list[str]]:
    """(name, type) pairs, nullability ignored — the schema identity
    the log enforces."""
    return [[f.name, f.dataType.simpleString()] for f in df.schema.fields]


def _latest_schema(root: str) -> list[list[str]] | None:
    """The canonical schema of the most recent commit that recorded
    one (schema evolution makes later commits authoritative)."""
    out = None
    for c in _commits(root):
        if "schema" in c:
            out = c["schema"]
    return out


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


def _commit_stats(root: str) -> dict:
    """Union of every commit's recorded file stats (later commits
    never re-stat existing files, so entries are disjoint)."""
    out: dict = {}
    for c in _commits(root):
        out.update(c.get("stats", {}))
    return out


def tx_files_for_range(
    root: str, col: str, lo, hi, version: int | None = None
) -> tuple[list[str], int]:
    """Data skipping from the LOG alone (no footer reads at query
    time): the active files whose recorded [min, max] for ``col``
    intersects [lo, hi] — files with no recorded stats are kept
    conservatively. Returns (kept_files, n_skipped)."""
    stats = _commit_stats(root)
    kept, skipped = [], 0
    for f in _active_files(root, version):
        s = stats.get(f, {}).get(col)
        if s is not None and (s[1] < lo or s[0] > hi):
            skipped += 1
            continue
        kept.append(f)
    return kept, skipped


def tx_read_range(
    spark: SparkSession, root: str, col: str, lo, hi
) -> DataFrame:
    """Range-predicate snapshot read with log-level data skipping:
    files whose stats exclude [lo, hi] never reach the scan (on top
    of parquet's own row-group pruning within the files that do).
    After a ``cluster_by`` compact with ``stats_cols`` on the same
    key, a point/range read touches only the files owning that
    range — O(selectivity), not O(table)."""
    from pyspark.sql import functions as F

    files, _ = tx_files_for_range(root, col, lo, hi)
    if not files:
        return tx_read(spark, root).filter(F.lit(False))
    return (
        spark.read.parquet(*[os.path.join(root, f) for f in files])
        .filter((F.col(col) >= lo) & (F.col(col) <= hi))
    )


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
    """Atomically claim the next version. The claim is a fully-written
    temp file hard-linked into the ``<version>.json`` name — link(2)
    fails if the name exists, and the entry is never visible
    half-written (an open('x') + write would expose a partial/empty
    file to concurrent readers, and a crash between the two would
    brick the version forever). Losing a race means re-reading the
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
    never read, matching Delta's WriteSerializable level."""
    logd = _log_path(root)
    os.makedirs(logd, exist_ok=True)
    for _ in range(_MAX_RETRIES):
        commits = _commits(root)
        if txn is not None:
            for c in commits:
                if c.get("txn") == txn:
                    return c["version"]
        if base_version is not None:
            for c in commits:
                if c["version"] > base_version and c["mode"] != "append":
                    raise TxConflictError(
                        f"txlog {root}: concurrent {c['mode']} commit "
                        f"v{c['version']} invalidated this operation's "
                        f"snapshot v{base_version} — re-run it"
                    )
        version = (commits[-1]["version"] + 1) if commits else 1
        entry = {"version": version, "mode": mode, "add": add, "remove": remove}
        if txn is not None:
            entry["txn"] = txn
        if schema is not None:
            entry["schema"] = schema
        if stats:
            entry["stats"] = stats
        claim = os.path.join(logd, f"{version:020d}.json")
        tmp = os.path.join(logd, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(entry, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, claim)  # atomic claim of a fully-written entry
            return version
        except FileExistsError:
            continue  # lost the race — recompute version, retry
        finally:
            os.unlink(tmp)
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
        for c in _commits(root):
            if c.get("txn") == txn:
                return c["version"]  # replay — skip the data write too
    schema = _check_schema(root, df, evolve=evolve)
    files = _write_data(df, root)
    stats = _file_stats(root, files, stats_cols) if stats_cols else None
    return _commit(
        root, mode, files, [], txn=txn, schema=schema, stats=stats
    )


def tx_read(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Snapshot read at the latest (or a historical) version — the
    exact file list from the log, no directory listing. After schema
    evolution the scan merges file schemas (footer reads — only paid
    when the log actually records more than one schema) and columns
    come back in the canonical (latest-schema) order with nulls where
    old files predate a column."""
    files = _active_files(root, version)
    if not files:
        raise ValueError(
            f"txlog table {root} has no data"
            + (f" at version {version}" if version is not None else "")
        )
    # schema as of the requested version (Delta time travel presents
    # each version under its own era's schema)
    schemas = [
        c["schema"]
        for c in _commits(root)
        if "schema" in c and (version is None or c["version"] <= version)
    ]
    reader = spark.read
    evolved = any(s != schemas[-1] for s in schemas) if schemas else False
    if evolved:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(*[os.path.join(root, f) for f in files])
    if evolved:
        from pyspark.sql import functions as F

        cols = [
            F.col(n) if n in df.columns else F.lit(None).cast(t).alias(n)
            for n, t in map(tuple, schemas[-1])
        ]
        df = df.select(*cols)
    return df


def _touched_relpaths(root: str, rows) -> list[str]:
    out = set()
    for r in rows:
        p = r["f"].removeprefix("file://")
        out.add(os.path.relpath(p, root))
    return sorted(out)


def _latest_version(root: str) -> int:
    commits = _commits(root)
    return commits[-1]["version"] if commits else 0


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
    invalidated the snapshot."""
    from pyspark.sql import functions as F

    base = _latest_version(root)
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
        kept = spark.read.parquet(
            *[os.path.join(root, f) for f in touched]
        ).filter(~condition)
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
    matched rows anti-joined away), everything else survives
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

    base = _latest_version(root)
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
        kept = spark.read.parquet(
            *[os.path.join(root, f) for f in touched]
        ).join(F.broadcast(keys), key_cols, "left_anti")
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
    the CoW cost from O(table) into O(touched data)."""
    base = _latest_version(root)
    files = _active_files(root)
    snap = tx_read(spark, root)
    if cluster_by:
        snap = snap.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        snap = snap.coalesce(n_files)
    out_files = _write_data(snap, root)
    # clustered compaction records stats for its cluster keys by
    # default — disjoint per-file ranges are exactly what data
    # skipping (tx_files_for_range) feeds on
    cols = stats_cols if stats_cols is not None else (cluster_by or [])
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
