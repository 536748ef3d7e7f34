"""SCD2 dimension history (operators/scd.py).

The battery oracle (q_scd2_customers) pins the window semantics
against DuckDB; these tests pin the incremental-apply contract:
folding a batch into an existing dimension must equal rebuilding
from the full log.
"""

from __future__ import annotations

from tabata_spark.operators.scd import scd2_apply, scd2_history


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "key long, ts long, segment string, nation int"
    )


def test_noop_states_collapse(spark):
    log = _log(
        spark,
        [
            (1, 0, "A", 1),
            (1, 1, "A", 1),  # no-op: must collapse
            (1, 2, "B", 1),
            (2, 0, "A", 2),
        ],
    )
    hist = scd2_history(log, key="key", ts="ts").collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["key"], []).append(r)
    assert len(by_key[1]) == 2  # A@0, B@2 — the ts=1 no-op is gone
    v1, v2 = sorted(by_key[1], key=lambda r: r["version"])
    assert (v1["valid_from"], v1["valid_to"], v1["is_current"]) == (0, 2, False)
    assert (v2["valid_from"], v2["valid_to"], v2["is_current"]) == (2, None, True)
    assert by_key[2][0]["is_current"] is True


def test_incremental_apply_equals_full_rebuild(spark):
    full = [
        (1, 0, "A", 1),
        (2, 0, "A", 2),
        (3, 0, "B", 3),
        (1, 1, "B", 1),
        (2, 1, "A", 2),  # no-op
        (1, 2, "C", 9),
        (3, 2, "B", 4),
    ]
    base = [r for r in full if r[1] == 0]
    later = [r for r in full if r[1] > 0]
    dim0 = scd2_history(_log(spark, base), key="key", ts="ts")
    folded = scd2_apply(dim0, _log(spark, later), key="key", ts="ts")
    rebuilt = scd2_history(_log(spark, full), key="key", ts="ts")
    key = lambda r: (r["key"], r["version"])
    assert sorted(map(tuple, folded.collect()), key=lambda t: t[:2]) == sorted(
        map(tuple, rebuilt.collect()), key=lambda t: t[:2]
    )


def test_apply_leaves_untouched_keys_alone(spark):
    dim0 = scd2_history(
        _log(spark, [(1, 0, "A", 1), (2, 0, "B", 2)]), key="key", ts="ts"
    )
    batch = _log(spark, [(1, 1, "Z", 1)])
    out = scd2_apply(dim0, batch, key="key", ts="ts")
    rows = {(r["key"], r["version"]): r for r in out.collect()}
    assert rows[(2, 1)]["segment"] == "B" and rows[(2, 1)]["is_current"] is True
    assert rows[(1, 2)]["segment"] == "Z" and rows[(1, 2)]["is_current"] is True
    assert rows[(1, 1)]["valid_to"] == 1


def test_pit_join_picks_covering_version(spark):
    from tabata_spark.operators.scd import pit_join

    dim = scd2_history(
        _log(
            spark,
            [(1, 0, "A", 1), (1, 5, "B", 1), (1, 9, "C", 2)],
        ),
        key="key",
        ts="ts",
    )
    facts = spark.createDataFrame(
        [(100, 1, 0), (101, 1, 4), (102, 1, 5), (103, 1, 99)],
        "fid long, key long, t long",
    )
    out = pit_join(
        facts, dim.withColumnRenamed("key", "dkey"), key="dkey", ts="t", fact_key="key"
    )
    got = {r["fid"]: r["segment"] for r in out.collect()}
    assert got == {100: "A", 101: "A", 102: "B", 103: "C"}


def _scd2_reference(rows):
    """Pure-python SCD2: rows = (key, ts, seg, nation); returns the
    set of (key, version, seg, nation, valid_from, valid_to,
    is_current) tuples."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, ts, seg, nat in rows:
        by_key[k].append((ts, seg, nat))
    out = set()
    for k, states in by_key.items():
        states.sort()
        kept = []
        for ts, seg, nat in states:
            if not kept or (seg, nat) != (kept[-1][1], kept[-1][2]):
                kept.append((ts, seg, nat))
        for i, (ts, seg, nat) in enumerate(kept):
            vt = kept[i + 1][0] if i + 1 < len(kept) else None
            out.add((k, i + 1, seg, nat, ts, vt, vt is None))
    return out


def test_scd2_matches_python_reference_on_random_logs(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    state = st.tuples(
        st.sampled_from(["A", "B", "C"]), st.integers(0, 2)
    )

    @settings(max_examples=12, deadline=None)
    @given(
        st.dictionaries(
            st.integers(1, 4),
            st.lists(state, min_size=1, max_size=6),
            min_size=1,
            max_size=4,
        )
    )
    def inner(log_by_key):
        rows = [
            (k, ts, seg, nat)
            for k, states in log_by_key.items()
            for ts, (seg, nat) in enumerate(states)
        ]
        got = {
            tuple(r)
            for r in scd2_history(
                _log(spark, rows), key="key", ts="ts"
            ).collect()
        }
        assert got == _scd2_reference(rows)

    inner()


def test_stream_scd2_maintain_converges_to_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from tabata_spark.streaming.sinks import stream_scd2_maintain

    full = [
        (1, 0, "A", 1),
        (2, 0, "A", 2),
        (1, 1, "B", 1),
        (2, 1, "A", 2),  # no-op
        (3, 1, "C", 3),
        (1, 2, "B", 9),
    ]
    df = _log(spark, full)
    src = str(tmp_path / "src")
    # one file per ts => micro-batches arrive in change order
    df.repartition(3, F.col("ts")).write.parquet(src)
    store = str(tmp_path / "dim")
    q = stream_scd2_maintain(
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        store,
        str(tmp_path / "ck"),
        key="key",
        ts="ts",
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.read.parquet(store).collect()))
    want = sorted(
        map(tuple, scd2_history(df, key="key", ts="ts").collect())
    )
    assert got == want
