"""Local replica of the driver's correctness gate.

Runs every battery query on Spark AND its DuckDB oracle on the same
parquet directory, compares row count, column names, and values
(order-insensitive, exact after the queries' own rounding), and prints
one line per query. Run:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from tabata_spark.sources.relational import TABLES  # noqa: E402


def normalize(rows, cols):
    """Sort columns by name, stringify values with stable float repr,
    sort rows — the order-insensitive comparable form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    # Full-precision repr so this gate is at least as
                    # strict as the driver's value hash (%.9g hid the
                    # millisecond digits of epoch-seconds doubles —
                    # round-4 w_sessionize red was invisible locally).
                    # -0.0 normalized: engines disagree on its sign.
                    vals.append(repr(v + 0.0 if v == 0.0 else v))
            elif isinstance(v, decimal.Decimal):
                # Decimal canonicalized through float: both engines hand
                # back Python Decimal locally, so a plain str() compare
                # is blind to the scale/trailing-zero/type divergence
                # that made the driver's hasher disagree on the r5
                # decimal outputs (VERDICT r5 item 4). The float repr is
                # what the driver reliably hashes — compare in that
                # space. (Battery outputs should not be decimal at all;
                # see the decimal-output FAIL below.)
                vals.append(repr(float(v)))
            elif isinstance(v, bool):
                vals.append(str(bool(v)))
            elif v is None:
                vals.append("")
            else:
                vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from tabata_spark import battery
    from tabata_spark.session import get_spark

    if os.environ.get("SPARK_GRAFT_BARE"):
        # driver replica: a BARE session (none of session.py's configs)
        # — the per-call confs in sources.relational.load_table must
        # carry the whole correctness story, exactly as in the driver's
        # own harness
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[32]").appName(
            "oracle-check-bare"
        ).getOrCreate()
    else:
        spark = get_spark("oracle-check")
    split = os.environ.get("SPARK_GRAFT_SPLIT_BYTES")
    if split:
        # adversarial scan splitting: shatter the parquet inputs into
        # many tiny partitions so partial-aggregation order diverges
        # maximally from file order — any output that only matched the
        # oracle via accidental accumulation order fails this sweep
        spark.conf.set("spark.sql.files.maxPartitionBytes", split)
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = 0
    for name, fn in battery.QUERIES.items():
        if only and name not in only:
            continue
        status, detail = "PASS", ""
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            from pyspark.sql.types import DecimalType

            dec_cols = [
                f.name
                for f in sdf.schema.fields
                if isinstance(f.dataType, DecimalType)
            ]
            srows = [tuple(r) for r in sdf.collect()]
            if dec_cols:
                # Driver-risky: the per-round hasher canonicalizes
                # DOUBLE/int reliably and DECIMAL unreliably (all nine
                # r5 hash-reds were decimal outputs). Battery outputs
                # must encode exact decimals as DOUBLE at the boundary.
                status, detail = "FAIL", f"decimal output columns {dec_cols}"
            elif name in battery.ORACLES:
                ores = con.sql(battery.ORACLES[name])
                ocols = ores.columns
                orows = ores.fetchall()
                if sorted(map(str.lower, scols)) != sorted(map(str.lower, ocols)):
                    status, detail = "FAIL", f"cols spark={scols} duck={ocols}"
                elif len(srows) != len(orows):
                    status, detail = "FAIL", f"rows spark={len(srows)} duck={len(orows)}"
                else:
                    a = normalize(srows, scols)
                    b = normalize(orows, ocols)
                    if a != b:
                        bad = sum(1 for x, y in zip(a, b) if x != y)
                        ex = next((x, y) for x, y in zip(a, b) if x != y)
                        status, detail = "FAIL", f"{bad}/{len(a)} rows differ e.g. {ex}"
            else:
                detail = f"rows-only ({len(srows)})"
        except Exception as e:  # noqa: BLE001
            status, detail = "ERROR", repr(e)[:200]
        ok = status == "PASS"
        n_pass += ok
        n_fail += not ok
        print(f"{status:5s} {name} {detail}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
