"""Custom stateful streaming operators (applyInPandasWithState).

The reference's anomaly scoring (out-of-tube counts, tubes.py:392-406)
reimagined as an incremental streaming operator: per record (user), a
running (n, n_out) counter updated across micro-batches, with the tube
bounds fixed (learned offline by :class:`~tabata_spark.ml.tube.Tube`).

This is the ``applyInPandasWithState`` pattern the engine uses for any
custom per-key streaming state: Arrow-batched group input, explicit
state schema, update-mode output. Works identically under
``availableNow`` backfill and a live stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n long, n_out long, frac_out double"
STATE_SCHEMA = "n long, n_out long"


def streaming_out_of_tube(
    events: DataFrame,
    lo: float,
    hi: float,
    value_col: str = "value",
    key_col: str = "user_id",
) -> DataFrame:
    """Running out-of-tube score per key over a stream.

    Emits the updated cumulative (n, n_out, frac_out) for every key
    touched in each micro-batch."""

    def fn(
        key: tuple, pdfs: Iterator[Any], state: GroupState
    ) -> Iterator[Any]:
        import pandas as pd

        n, n_out = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            v = pdf[value_col]
            n += int(len(v))
            n_out += int(((v > hi) | (v < lo)).sum())
        state.update((n, n_out))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n": [n],
                "n_out": [n_out],
                "frac_out": [n_out / n if n else 0.0],
            }
        )

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_cusum(
    df,
    value: str = "value",
    key: str = "user_id",
    order: tuple[str, str] = ("ts", "event_id"),
    k: float = 0.5,
    h: float = 5.0,
):
    """One-sided CUSUM change detection, batch form. The textbook
    recursion ``S_t = max(0, S_{t-1} + x_t - k)`` has the closed
    prefix form ``S_t = R_t - min(0, min_{j<=t} R_j)`` with R the
    running sum of (x - k) — so the whole detector is two ordered
    windows over ONE key partitioning (no recursion, no UDF), and a
    DuckDB oracle replays it with the same two windows. Alarm when
    S_t > h. Emits (key, order..., s, alarm).

    This is the engine's instant-detection theme (threshold crossings
    on a derived statistic) in monitoring form; the streaming twin is
    :func:`streaming_cusum`."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # decimal running sums: order-independent, oracle-exact
    r = F.sum((F.col(value) - F.lit(k)).cast("decimal(18,6)")).over(w)
    out = df.withColumn("__r", r).withColumn(
        "s",
        (F.col("__r") - F.least(F.lit(0).cast("decimal(18,6)"), F.min("__r").over(w)))
        .cast("decimal(18,6)"),
    )
    return out.withColumn("alarm", F.col("s") > F.lit(h)).drop("__r")


def streaming_cusum(
    events,
    value: str = "value",
    key: str = "user_id",
    ts: str = "ts",
    k: float = 0.5,
    h: float = 5.0,
    watermark: str = "2 hours",
):
    """Streaming CUSUM as a custom stateful operator
    (``applyInPandasWithState``; the newer transformWithStateInPandas
    API expresses the same thing but its state-server protocol needs
    protobuf, which this environment does not ship): per-key state
    carries (running_sum, running_min) — O(1) per key regardless of
    history. Rows are processed in event-time order WITHIN each
    micro-batch (sorted in the handler); cross-batch order follows
    arrival, the standard practical contract for monitoring streams
    (an availableNow replay of an ordered source is deterministic,
    which is what the parity test pins). Emits the same
    (key, ts, s, alarm) rows as :func:`batch_cusum`."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # Output schema derived from the INPUT column names and types, so a
    # non-default key name or a string/int key round-trips correctly
    # (a literal 'user_id long' schema mislabeled or broke any other
    # keying).
    key_type = events.schema[key].dataType.simpleString()
    ts_type = events.schema[ts].dataType.simpleString()
    out_schema = f"`{key}` {key_type}, `{ts}` {ts_type}, s double, alarm boolean"
    state_schema = "r double, rmin double"

    def fn(key_tuple, pdfs, state: GroupState):
        import pandas as pd

        r, rmin = state.get if state.exists else (0.0, 0.0)
        for pdf in pdfs:
            pdf = pdf.sort_values(ts)
            out_s = []
            for x in pdf[value]:
                r += float(x) - k
                rmin = min(rmin, r)
                out_s.append(r - min(0.0, rmin))
            yield pd.DataFrame(
                {
                    key: pdf[key],
                    ts: pdf[ts],
                    "s": out_s,
                    "alarm": [v > h for v in out_s],
                }
            )
        state.update((r, rmin))

    src = events.withWatermark(ts, watermark) if events.isStreaming else events
    return src.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_ewma(
    events,
    value: str = "value",
    key: str = "user_id",
    ts: str = "ts",
    alpha: float = 0.2,
    watermark: str = "2 hours",
):
    """Streaming EWMA as a custom stateful operator — the EXACT
    recursive form the batch truncated kernel approximates
    (operators/ewma.py): per-key state is the adjust=True pair
    (num, den) with num_t = x_t + (1-a)·num_{t-1},
    den_t = 1 + (1-a)·den_{t-1}; y_t = num_t/den_t. O(1) state per key
    regardless of history — the recursion that forces a sequential
    scan in batch is exactly what a stateful stream gives for free.

    Rows are processed in event-time order WITHIN each micro-batch;
    cross-batch order follows arrival (the CUSUM contract — an
    availableNow replay of an ordered source is deterministic, pinned
    by the parity test). Emits (key, ts, ewma) per input row.
    On series shorter than the batch kernel's lookback the two agree
    exactly (truncation is a no-op there)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = events.schema[key].dataType.simpleString()
    ts_type = events.schema[ts].dataType.simpleString()
    out_schema = f"`{key}` {key_type}, `{ts}` {ts_type}, ewma double"
    state_schema = "num double, den double"
    decay = 1.0 - alpha

    def fn(key_tuple, pdfs, state: GroupState):
        import pandas as pd

        num, den = state.get if state.exists else (0.0, 0.0)
        # A key group larger than arrow maxRecordsPerBatch arrives as
        # MULTIPLE chunks; sorting each chunk independently would break
        # the 'event-time order within each micro-batch' contract at
        # chunk boundaries — concatenate first, sort once.
        chunks = [pdf for pdf in pdfs]
        pdf = (
            pd.concat(chunks, ignore_index=True) if len(chunks) > 1
            else chunks[0] if chunks else pd.DataFrame(columns=[key, ts, value])
        )
        pdf = pdf.sort_values(ts)
        out = []
        for x in pdf[value]:
            num = float(x) + decay * num
            den = 1.0 + decay * den
            out.append(num / den)
        yield pd.DataFrame({key: pdf[key], ts: pdf[ts], "ewma": out})
        state.update((num, den))

    src = events.withWatermark(ts, watermark) if events.isStreaming else events
    return src.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
