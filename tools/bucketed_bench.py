"""Bucketed-signal-store bench pair (SCALE.md known-next-step).

Measures every signal-view battery query twice at the target SF:
plain (signals recomputed from events.parquet: one window shuffle per
query) vs bucketed (signals stored once via save_bucketed — the scan's
hashpartitioning(record_id) satisfies the record windows, zero
exchange per query). Prints per-query steady-state seconds for both
modes plus the Exchange-node count of each physical plan.

Run: python tools/bucketed_bench.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIGNAL_QUERIES = [
    "w_positions",
    "w_running",
    "w_segment_ramp",
    "w_indicator_full",
    "w_rev_indicator",
    "w_savgol_interior",
    "a_user_summary",
    "a_standardize",
    "w_rolling_time",
    "a_winsorize",
    "w_m4_downsample",
    "a_quantile_transform",
    "a_funnel_depth",
]

TABLE = "signals_bench"


def _exchanges(df) -> int:
    # SHUFFLE exchanges only (plans.inspect regex): a bare substring
    # count also matched BroadcastExchange and inflated both sides
    from tabata_spark.plans.inspect import plan_counts

    return plan_counts(df)["exchanges"]


def _time_one(spark, sf_dir, name):
    from tabata_spark import battery

    fn = battery.QUERIES[name]
    fn(spark, sf_dir).count()  # cold: JIT + shuffle-file warmup
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    return time.perf_counter() - t0, _exchanges(fn(spark, sf_dir))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    os.environ.pop("SPARK_GRAFT_SIGNALS_TABLE", None)

    from tabata_spark.core.signalset import SignalSet, save_bucketed
    from tabata_spark.session import get_spark
    from tabata_spark.sources.relational import events_as_signals, load_table

    spark = get_spark(
        "bucketed-bench",
        extra_conf={"spark.sql.warehouse.dir": "/tmp/bucketed_bench_warehouse"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    t0 = time.perf_counter()
    save_bucketed(
        SignalSet(events_as_signals(load_table(spark, sf_dir, "events"))),
        TABLE,
        num_buckets=32,
    )
    build_s = time.perf_counter() - t0

    # interleave the two modes per query so machine drift hits both
    # sides equally (a sequential plain-then-bucketed sweep once mixed
    # a concurrent job into one side and inverted the verdict)
    plain, bucketed = {}, {}
    for name in SIGNAL_QUERIES:
        os.environ.pop("SPARK_GRAFT_SIGNALS_TABLE", None)
        plain[name] = _time_one(spark, sf_dir, name)
        os.environ["SPARK_GRAFT_SIGNALS_TABLE"] = TABLE
        try:
            bucketed[name] = _time_one(spark, sf_dir, name)
        finally:
            os.environ.pop("SPARK_GRAFT_SIGNALS_TABLE", None)

    print(f"\nsf_dir={sf_dir}  bucketed store build (one-time): {build_s:.2f}s")
    print(f"{'query':24s} {'plain_s':>8s} {'buck_s':>8s} {'ratio':>6s} {'exch':>9s}")
    tp = tb = 0.0
    for name in SIGNAL_QUERIES:
        ps, pe = plain[name]
        bs, be = bucketed[name]
        tp += ps
        tb += bs
        print(
            f"{name:24s} {ps:8.3f} {bs:8.3f} {bs / ps:6.2f} {pe:>4d}->{be:<4d}"
        )
    print(f"{'TOTAL':24s} {tp:8.3f} {tb:8.3f} {tb / tp:6.2f}")


if __name__ == "__main__":
    main()
