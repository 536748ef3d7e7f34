"""Round-17 optimization profiler: time single battery queries in
isolation and capture their physical plans.

    python tools/r17_profile.py [--tag before|after] [--noop] \
        [--sf DIR] query [query ...]

Per query: one warm run (codegen), then 3 timed runs; prints
min/median. ``--tag`` writes ``plans/r17/<query>_<tag>.txt`` with the
``explain('formatted')`` output (the judge-checkable plan artifact).
``--noop`` times ``df.write.format('noop')`` instead of ``.count()``
(guide §1.4 — computes every column; the bench methodology stays
``.count()`` for round-over-round comparability, so noop numbers are
diagnostic only). Jobs are labelled via setJobDescription (guide §1.5).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    tag = None
    noop = False
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--tag":
            tag = args[i + 1]
            i += 2
        elif a == "--noop":
            noop = True
            i += 1
        elif a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(a)
            i += 1

    from tabata_spark import battery
    from tabata_spark.session import get_spark

    spark = get_spark("r17-profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r17",
    )
    if tag:
        os.makedirs(plans_dir, exist_ok=True)

    def run(df):
        if noop:
            df.write.format("noop").mode("overwrite").save()
            return -1
        return df.count()

    for name in names:
        fn = battery.QUERIES.get(name) or battery.BENCH_EXTRA.get(name)
        if fn is None:
            print(f"{name}: UNKNOWN", flush=True)
            continue
        sc = spark.sparkContext
        sc.setJobDescription(f"r17-profile: {name} warm")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        build = time.perf_counter() - t0
        n = run(df)
        cold = time.perf_counter() - t0
        if tag:
            # plan of the same lazy frame the bench times (captured
            # post-run so AQE-verified plan text is still the static
            # one; final plans live in the SQL tab only)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        times = []
        for k in range(3):
            sc.setJobDescription(f"r17-profile: {name} run{k}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = run(df)
            times.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        times.sort()
        print(
            f"{name}: min {times[0]:.3f}s med {times[1]:.3f}s"
            f" (cold {cold:.3f}s, build {build:.3f}s, rows {n})",
            flush=True,
        )


if __name__ == "__main__":
    main()
