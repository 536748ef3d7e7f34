"""Bench-artifact invariants (VERDICT r14 #3): the committed
BENCH_ALL.json must cover EVERY registered battery query and every
BENCH_EXTRA production twin — "every query has a timing row" is a
mechanical assertion, not a claim. BENCH_r14's gap (two queries
registered after the last --all pass) is the failure mode this pins
against: an artifact that silently lags the registry reads as full
coverage when it is not."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_all_covers_every_registered_query():
    from tabata_spark.battery import BENCH_EXTRA, QUERIES

    with open(os.path.join(REPO, "BENCH_ALL.json")) as fh:
        bench_all = json.load(fh)

    registered = set(QUERIES) | set(BENCH_EXTRA)
    timed = set(bench_all.get("queries", {}))
    errored = set(bench_all.get("errors", {}))

    missing = sorted(registered - timed - errored)
    assert missing == [], (
        f"BENCH_ALL.json lags the registry by {len(missing)} queries "
        f"({missing[:5]}...): re-run `python bench.py --all`"
    )
    # errors are allowed to EXIST in the artifact (fault isolation)
    # but a committed artifact with errors is a red flag on its own
    assert errored == set(), f"BENCH_ALL.json carries errors: {sorted(errored)}"
    # no orphan rows for queries that were since deregistered
    orphans = sorted(timed - registered)
    assert orphans == [], f"BENCH_ALL.json has rows for unregistered: {orphans}"
    assert bench_all["n_queries"] == len(timed)


def test_bench_all_rows_have_timing_shape():
    with open(os.path.join(REPO, "BENCH_ALL.json")) as fh:
        bench_all = json.load(fh)
    for name, row in bench_all["queries"].items():
        assert row["steady_s"] > 0, name
        assert row["cold_s"] > 0, name
        assert row["rows"] >= 0, name
