"""Scale probe: run the core signal operators at multi-million-row
scale (distributed generation, no driver pandas) and report wall
times + rows/sec. Evidence for the 100 TB design claims:

    python tools/scale_probe.py [n_records] [n_rows]

Defaults 2,000 records x 5,000 rows = 10M rows (~0.5 GB in memory).
Everything measured AFTER the data is materialized to Parquet, so
times are operator cost, not generation.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 5000

    from pyspark.sql import functions as F

    from tabata_spark.operators.flight import cruise_summary
    from tabata_spark.operators.indicator import indicator_col
    from tabata_spark.operators.positions import with_positions
    from tabata_spark.operators.savgol import savgol_apply, savgol_native
    from tabata_spark.operators.slicing import left_of
    from tabata_spark.session import get_spark
    from tabata_spark.sources.generator import make_flights_distributed

    spark = get_spark("scale-probe")
    total = n_records * n_rows
    out: dict[str, float] = {}

    tmp = tempfile.mkdtemp(prefix="scale_probe_")
    path = os.path.join(tmp, "signals")
    t0 = time.perf_counter()
    make_flights_distributed(spark, n_records, n_rows).write.mode(
        "overwrite"
    ).parquet(path)
    out["generate_write_s"] = round(time.perf_counter() - t0, 2)
    df = spark.read.parquet(path)

    def probe(name, frame, cols):
        """Force-evaluate the named columns — a bare count() lets
        Catalyst prune the computation under test entirely."""
        t = time.perf_counter()
        r = frame.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash(*[F.col(f"`{c}`") for c in cols])).alias("h"),
        ).collect()[0]
        out[name] = round(time.perf_counter() - t, 2)
        print(f"# {name}: {out[name]}s ({r['n']} rows)", file=sys.stderr)

    probe(
        "positions",
        with_positions(df),
        ["LEN[pts]", "REV[pts]", "PERCENT[%]"],
    )
    probe("savgol_native_w11", savgol_native(df, "ALT[m]", "sg", 11, 2, 1), ["sg"])
    probe(
        "savgol_apply_4specs",
        savgol_apply(
            df,
            [
                ("ALT[m]", "s0", 21, 2, 0),
                ("ALT[m]", "s1", 21, 2, 1),
                ("Tisa[K]", "s2", 11, 2, 0),
                ("Vz[m/s]", "s3", 11, 2, 1),
            ],
        ),
        ["s0", "s1", "s2", "s3"],
    )
    probe("indicator_w11", indicator_col(df, "ALT[m]", "ind", 11, 1, 1.0), ["ind"])
    probe("cruise_summary", cruise_summary(df), ["conso_kg_h", "alt_max"])
    instants = df.groupBy("record_id").agg(
        F.expr("min_by(seq, struct(`ALT[m]` * -1, seq))").alias("seq")
    )
    probe("slice_left_argmax", left_of(df, instants), ["ALT[m]"])

    out.update(
        {
            "n_records": n_records,
            "n_rows_per_record": n_rows,
            "total_rows": total,
            "rows_per_sec_indicator": round(total / max(out["indicator_w11"], 1e-9)),
        }
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
