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


def find_negzero_cols(rows, cols):
    """Column names holding any -0.0 float — the driver-hash landmine
    class: an output that can be -0.0 in one engine can be +0.0 in the
    other (DuckDB round() keeps the sign of a -1e-17, Spark's
    BigDecimal round drops it — the r10 q_eval_slices red). Even a
    MATCHED -0.0 today is one engine version away from a red, so the
    gate flags the presence, not just the divergence; queries clamp or
    `+ 0.0` at the source."""
    import struct

    bad = set()
    for r in rows:
        for i, v in enumerate(r):
            if isinstance(v, float) and v == 0.0 and struct.pack(
                ">d", v
            ) != struct.pack(">d", 0.0):
                bad.add(cols[i])
    return sorted(bad)


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
                    # -0.0 is NOT normalized: the driver's hasher
                    # distinguishes it, and DuckDB's round() emits it
                    # where Spark's BigDecimal round drops the sign —
                    # normalizing here hid the r10 q_eval_slices red.
                    # Queries must clamp/shift at the source instead.
                    vals.append(repr(v))
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


#: DuckDB result types the driver's hasher canonicalizes unreliably.
#: DECIMAL caused the nine r5 hash-reds; HUGEINT (DuckDB's output type
#: for window/plain integer sums, INT128) caused the r4-r6 w_sessionize
#: red. Both compare equal to BIGINT/DOUBLE as local Python values, so
#: only a TYPE lint can see them — the value compare is structurally
#: blind (VERDICT r6 "What's wrong"). Nested types (array/map/struct)
#: joined the class in r10: the driver's pandas canonicalizer cannot
#: sort/hash a list cell (a_label_centroids red — unhashable type).
RISKY_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "INT128")


def _duck_type_class(t: str) -> str:
    u = str(t).upper()
    if u.startswith(("DECIMAL", "HUGEINT", "UHUGEINT", "INT128")):
        return "risky"
    if u in (
        "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
    ):
        return "int"
    if u in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if u == "BOOLEAN":
        return "bool"
    if u == "VARCHAR":
        return "str"
    if u.startswith("TIMESTAMP"):
        return "timestamp"
    if u == "DATE":
        return "date"
    if u == "BLOB":
        return "binary"
    if u.endswith("[]") or u.startswith(("LIST", "ARRAY", "MAP", "STRUCT", "UNION")):
        return "risky"
    return u


def _spark_type_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType):
        return "risky"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "risky"
    return dt.simpleString()


def lint_oracle_types(con, name, ocols, otypes, scols=None, stypes=None):
    """Return a list of lint-failure strings for one oracle result.

    Two checks: (a) no DuckDB output column may be HUGEINT/DECIMAL/
    INT128 — the driver-hasher-unreliable class; (b) when the Spark
    schema is available, each same-named column's type class must
    match (int vs int, float vs float, ...)."""
    fails = []
    for c, t in zip(ocols, otypes):
        if _duck_type_class(t) == "risky":
            fails.append(f"oracle col {c} is {t} (driver-hasher-unreliable)")
    if scols is not None and stypes is not None:
        sclass = {c.lower(): _spark_type_class(t) for c, t in zip(scols, stypes)}
        for c, t in zip(ocols, otypes):
            oc = _duck_type_class(t)
            sc = sclass.get(c.lower())
            if sc is not None and oc != sc and "risky" not in (oc, sc):
                fails.append(f"type-class mismatch {c}: spark={sc} duck={oc} ({t})")
    return fails


def lint_only(sf_dir, only=()):
    """DuckDB-only fast pass: run every oracle, lint result types.

    No Spark session needed — catches the whole HUGEINT/DECIMAL class
    across all registered oracles in seconds."""
    from tabata_spark import battery

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in battery.ORACLES.items():
        if only and name not in only:
            continue
        try:
            rel = con.sql(sql)
            fails = lint_oracle_types(con, name, rel.columns, rel.types)
        except Exception as e:  # noqa: BLE001
            fails = [f"ERROR {repr(e)[:160]}"]
        ok = not fails
        n_pass += ok
        n_fail += not ok
        print(f"{'PASS' if ok else 'FAIL':5s} {name} {'; '.join(fails)}")
    print(f"\n[type-lint] {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


def main():
    argv = [a for a in sys.argv[1:] if a != "--lint-only"]
    if "--lint-only" in sys.argv:
        sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
        lint_only(sf_dir, set(argv[1:]))
        return
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

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

    # SPARK_GRAFT_CLEARCACHE=1: drop all cached data between queries.
    # For the ADVERSARIAL full-battery marathons only (bare 1 GiB x
    # all 219 queries): cached state accumulates across queries faster
    # than the ContextCleaner's weak-ref GC drains it, and at a 1 GiB
    # budget the marathon session eventually dies of storage pressure
    # that no single query causes (r16: 188 green, then a GCLocker
    # death at q_pagerank_weighted which passes alone; r15's order
    # squeaked through at 218). The driver's real gate runs 50 queries
    # on a default session — leave this OFF for driver-shaped runs.
    clear_cache = bool(os.environ.get("SPARK_GRAFT_CLEARCACHE"))
    n_pass = n_fail = 0
    for name, fn in battery.QUERIES.items():
        if only and name not in only:
            continue
        if clear_cache:
            spark.catalog.clearCache()
        status, detail = "PASS", ""
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            from pyspark.sql.types import (
                ArrayType,
                DecimalType,
                MapType,
                StructType,
            )

            dec_cols = [
                f.name
                for f in sdf.schema.fields
                if isinstance(f.dataType, DecimalType)
            ]
            nested_cols = [
                f.name
                for f in sdf.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            srows = [tuple(r) for r in sdf.collect()]
            if dec_cols:
                # Driver-risky: the per-round hasher canonicalizes
                # DOUBLE/int reliably and DECIMAL unreliably (all nine
                # r5 hash-reds were decimal outputs). Battery outputs
                # must encode exact decimals as DOUBLE at the boundary.
                status, detail = "FAIL", f"decimal output columns {dec_cols}"
            elif nested_cols:
                # Driver-fatal, not just risky: the driver's pandas
                # canonicalizer crashes sorting a list cell (the r10
                # a_label_centroids red). Battery outputs must be flat
                # scalar columns — explode vectors to (key, pos, value).
                status, detail = "FAIL", f"nested output columns {nested_cols}"
            elif find_negzero_cols(srows, scols):
                status, detail = (
                    "FAIL",
                    f"-0.0 in output columns {find_negzero_cols(srows, scols)}"
                    " (driver-hash landmine: clamp or + 0.0 at the source)",
                )
            elif name in battery.ORACLES:
                ores = con.sql(battery.ORACLES[name])
                ocols = ores.columns
                otypes = list(ores.types)
                orows = ores.fetchall()
                lint = lint_oracle_types(
                    con, name, ocols, otypes, scols,
                    [f.dataType for f in sdf.schema.fields],
                )
                # visible evidence the spark-vs-duck type-class
                # comparison ran for THIS query (VERDICT r7 item 7)
                classes = sorted(
                    {_spark_type_class(f.dataType) for f in sdf.schema.fields}
                )
                detail = f"types✓{{{','.join(classes)}}}"
                onegz = find_negzero_cols(orows, ocols)
                if lint:
                    status, detail = "FAIL", "; ".join(lint)
                elif onegz:
                    status, detail = (
                        "FAIL",
                        f"-0.0 in ORACLE columns {onegz} (driver-hash "
                        "landmine: clamp or + 0.0 in the oracle SQL)",
                    )
                elif sorted(map(str.lower, scols)) != sorted(map(str.lower, ocols)):
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
