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
