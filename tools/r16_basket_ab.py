"""Round-16 calibration A/B: does the 4-shape BASKET track the battery
mix where the single sentinel does not? (VERDICT r15 next-round #2)

Protocol (one process per condition, so JVM state is comparable):
JVM warmup -> sentinel reading (bench._time_sentinel at sf0.1) ->
basket reading (bench._time_basket at the pinned sf0.01 dir) -> a
16-query MIX drawn from the battery's families at sf0.1 (1 warm +
min-of-2 steady each). Run once on a QUIET host and once under load
(e.g. `stress`-style spinners or a co-tenant burst); the analysis
divides each instrument's loaded reading by its quiet reading:

    sentinel_factor   = sentinel_loaded / sentinel_quiet
    basket_factor     = median over shapes of (loaded/quiet)
    mix_factor        = median over mix queries of (loaded/quiet)

The basket earns its place if |basket - mix| < |sentinel - mix|, and
its per-shape SPREAD (max/min of the shape ratios) is the
non-uniform-ambient detector no scalar can be.

    python tools/r16_basket_ab.py <label> [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the mix: one representative per battery family, cheap enough that
# the whole pass stays ~30 s quiet (relational agg, shuffle join,
# cube, window/signal, sessionize, per-record agg, dedup x2, text x2,
# similarity, sketch, graph, rank window, interval join, datetime agg)
MIX = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q_cube_orders",
    "w_positions",
    "w_sessionize",
    "a_user_summary",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_tokens",
    "text_quality",
    "sim_topk_cosine",
    "sketch_cms_tokens",
    "q_pagerank",
    "q_window_rank",
    "j_interval_attrib",
    "q_month_revenue",
]


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "quiet"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/tmp/r16_basket_ab_{label}.json"
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from tabata_spark import battery
    from tabata_spark.session import get_spark

    spark = get_spark("r16-basket-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    sentinel = bench._time_sentinel(spark, sf_dir)
    print(f"# sentinel: {sentinel:.4f}s", file=sys.stderr)
    basket = bench._time_basket(spark)
    print(f"# basket: {basket}", file=sys.stderr)

    mix: dict[str, float] = {}
    for name in MIX:
        fn = battery.QUERIES[name]
        fn(spark, sf_dir).count()  # warm
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            ts.append(time.perf_counter() - t0)
        mix[name] = round(min(ts), 4)
        print(f"# {name}: {mix[name]:.3f}s", file=sys.stderr)

    out = {
        "label": label,
        "sf_dir": sf_dir,
        "sentinel_s": sentinel,
        "basket_s": basket,
        "mix_s": mix,
        "mix_total_s": round(sum(mix.values()), 4),
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
