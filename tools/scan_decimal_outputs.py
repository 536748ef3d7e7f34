"""List every battery query whose OUTPUT schema contains a DecimalType.

Round-5 evidence (VERDICT.md): the driver's value-hasher canonicalizes
DOUBLE and integer outputs reliably and DECIMAL outputs unreliably —
all nine r5 hash-red rows emit DECIMAL columns, and the same queries
were hash-green in r4 with rounded-DOUBLE outputs. The battery
convention is therefore: exact decimal ACCUMULATION internally, DOUBLE
(or integer/string) ENCODING at the output boundary.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql.types import DecimalType

sys.path.insert(0, "/root/repo")

from tabata_spark.battery import QUERIES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("decimal-scan")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, SF_DIR)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: BUILD-ERROR {e}")
            bad += 1
            continue
        dec = [f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
        if dec:
            print(f"{name}: DECIMAL {dec}")
            bad += 1
    print(f"scanned {len(QUERIES)} queries, {bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
