"""Deterministic synthetic flight-signal generator (FIXTURES.md F1).

Mirrors the shape of the reference's AFL1EB dataset (52 records ×
6 channels ~1 Hz, /root/reference/README.md:11-13): trapezoid altitude
profile, anti-correlated temperature, airspeed rising with altitude,
vertical speed ≈ dALT/dt, monotone-decreasing mass, thrust high in
climb. Seeded — the reference's unseeded randomness is deliberately
replaced (SURVEY §7 determinism note).

Used by tests and the scipy-parity oracles; production data arrives
via Parquet.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

CHANNELS = ["ALT[m]", "Tisa[K]", "TAS[m/s]", "Vz[m/s]", "Masse[kg]", "F[N]"]


def make_flight(
    rng: np.random.Generator,
    n: int | None = None,
    cruise_alt: float | None = None,
    start: str = "2019-01-01T06:00:00",
    low_cruise: bool = False,
) -> pd.DataFrame:
    """One flight record: pandas frame with DatetimeIndex @1 Hz."""
    if n is None:
        n = int(rng.integers(2000, 8000))
    if cruise_alt is None:
        cruise_alt = float(rng.uniform(8000, 11000))
    if low_cruise:
        cruise_alt = float(rng.uniform(5000, 7500))  # "never exceeds 8000 m" bad record
    climb_n = max(int(n * rng.uniform(0.12, 0.2)), 50)
    desc_n = max(int(n * rng.uniform(0.12, 0.2)), 50)
    cruise_n = n - climb_n - desc_n
    alt = np.concatenate(
        [
            np.linspace(0, cruise_alt, climb_n),
            cruise_alt
            + np.cumsum(rng.choice([0.0, 0.0, 0.0, 50.0, -50.0], size=cruise_n))
            * 0.02,
            np.linspace(cruise_alt, 0, desc_n),
        ]
    )
    alt = alt + rng.normal(0, 3.0, n)
    vz = np.gradient(alt)  # ≈ d(ALT)/dt at 1 Hz
    tisa = 288.15 - 0.0065 * alt + rng.normal(0, 0.5, n)
    tas = 120 + 110 * (alt / max(cruise_alt, 1.0)) + rng.normal(0, 2.0, n)
    masse = np.linspace(60000, 60000 - n * rng.uniform(1.2, 1.8), n) + rng.normal(0, 5, n)
    thrust = np.where(np.arange(n) < climb_n, 200000.0, 120000.0) + rng.normal(0, 3000, n)
    idx = pd.date_range(start, periods=n, freq="1s")
    return pd.DataFrame(
        {
            "ALT[m]": alt,
            "Tisa[K]": tisa,
            "TAS[m/s]": tas,
            "Vz[m/s]": vz,
            "Masse[kg]": masse,
            "F[N]": thrust,
        },
        index=idx,
    )


def make_flight_records(
    n_records: int = 12,
    seed: int = 42,
    with_bad_records: bool = True,
    n_rows: int | None = None,
) -> dict[str, pd.DataFrame]:
    """``{record_name: frame}`` keyed ``record_00 …`` (alphabetical order
    == creation order). Includes FIXTURES.md edge cases when asked:
    a low-cruise record, a short record, and one missing ``F[N]``."""
    rng = np.random.default_rng(seed)
    out: dict[str, pd.DataFrame] = {}
    for i in range(n_records):
        name = f"record_{i:02d}"
        start = f"2019-01-{(i % 27) + 1:02d}T06:00:00"
        if with_bad_records and i == n_records - 3:
            out[name] = make_flight(rng, n=n_rows, start=start, low_cruise=True)
        elif with_bad_records and i == n_records - 2:
            out[name] = make_flight(rng, n=max((n_rows or 400) // 8, 300), start=start)
        elif with_bad_records and i == n_records - 1:
            out[name] = make_flight(rng, n=n_rows, start=start).drop(columns=["F[N]"])
        else:
            out[name] = make_flight(rng, n=n_rows, start=start)
    return out


def make_flights_distributed(
    spark,
    n_records: int = 200,
    n_rows: int = 5000,
    seed: int = 42,
    partitions: int | None = None,
):
    """Distributed twin of :func:`make_flight_records`: generates the
    same *shape* of flight signals (trapezoid altitude, anti-correlated
    temperature, monotone mass) as pure Column expressions over
    ``spark.range`` — no driver-side pandas, no collect. This is the
    scale path: 10⁹ rows generate as fast as the cluster can write.

    Profile parameters vary per record via seeded hashes of the record
    index, so records differ deterministically.
    """
    from pyspark.sql import functions as F

    total = n_records * n_rows
    df = spark.range(0, total, 1, partitions or spark.sparkContext.defaultParallelism)
    rec = (F.col("id") / n_rows).cast("long")
    seq = F.col("id") % n_rows

    def h(salt: int):
        """Deterministic uniform [0,1) per record."""
        return (
            F.pmod(F.xxhash64(rec, F.lit(seed), F.lit(salt)), F.lit(1_000_000))
            / 1_000_000.0
        )

    def hrow(salt: int):
        """Deterministic uniform [0,1) per row (noise source)."""
        return (
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)), F.lit(1_000_000))
            / 1_000_000.0
        )

    cruise_alt = 8000 + 3000 * h(1)
    climb_n = (n_rows * (0.12 + 0.08 * h(2))).cast("long")
    desc_n = (n_rows * (0.12 + 0.08 * h(3))).cast("long")
    cruise_end = F.lit(n_rows) - desc_n

    alt_clean = (
        F.when(seq < climb_n, cruise_alt * seq / climb_n)
        .when(seq >= cruise_end, cruise_alt * (F.lit(n_rows) - 1 - seq) / desc_n)
        .otherwise(cruise_alt)
    )
    noise = lambda s, scale: (hrow(s) - 0.5) * (2 * scale)  # noqa: E731
    alt = alt_clean + noise(10, 3.0)
    vz = (
        F.when(seq < climb_n, cruise_alt / climb_n)
        .when(seq >= cruise_end, -cruise_alt / desc_n)
        .otherwise(F.lit(0.0))
        + noise(11, 0.3)
    )
    base_ts = F.lit("2019-01-01 06:00:00").cast("timestamp")

    return df.select(
        F.concat(F.lit("record_"), F.lpad(rec.cast("string"), 6, "0")).alias(
            "record_id"
        ),
        seq.cast("long").alias("seq"),
        F.timestamp_seconds(F.unix_timestamp(base_ts) + rec * 86400 + seq).alias("ts"),
        alt.alias("ALT[m]"),
        (288.15 - 0.0065 * alt + noise(12, 0.5)).alias("Tisa[K]"),
        (120 + 110 * alt / cruise_alt + noise(13, 2.0)).alias("TAS[m/s]"),
        vz.alias("Vz[m/s]"),
        (60000 - seq * (1.2 + 0.6 * h(4)) + noise(14, 5.0)).alias("Masse[kg]"),
        (
            F.when(seq < climb_n, 200000.0).otherwise(120000.0) + noise(15, 3000.0)
        ).alias("F[N]"),
    )
