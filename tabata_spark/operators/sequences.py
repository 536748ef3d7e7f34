"""Event-sequence extraction (net-new training-pipeline surface):
turn a raw event log into per-session ordered sequences — the
training-example shape for behavior models (next-event prediction,
session embeddings) and the input to funnel/Markov analyses.

Scale: session assignment is the standard gap-rule pair of windows
over ONE (user) partitioning; sequence assembly is a groupBy whose
state per group is the session's own events (bounded by session
length, not user history). One shuffle end to end when the source is
already user-bucketed; two otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tabata_spark.operators.timeutil import epoch_diff_s


def with_sessions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_min: float = 30.0,
    out_col: str = "session_id",
) -> DataFrame:
    """Gap-rule session assignment: a new session starts at the first
    event and whenever the gap to the previous event exceeds
    ``gap_min`` minutes. (ts, id) is the total event order — ties in
    ts are deterministic. Adds ``out_col`` (1-based per user)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(ts_col).over(w)
    new_sess = F.when(
        prev.isNull() | (epoch_diff_s(F.col(ts_col), prev) > gap_min * 60.0), 1
    ).otherwise(0)
    return events.withColumn(
        out_col,
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def session_sequences(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    gap_min: float = 30.0,
    sep: str = " ",
) -> DataFrame:
    """Per-session ordered event-type sequences:
    (user, session_id, n_events, t_start, t_end, seq).

    Assembly is sort_array(collect_list(struct(ts, id, type))) — the
    struct's (ts, id) prefix makes the in-group sort total and
    deterministic, and the aggregation buffer holds one session's
    events, not one user's history."""
    sess = with_sessions(events, user_col, ts_col, id_col, gap_min)
    ev = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"), F.col(id_col).alias("i"), F.col(type_col).alias("e")
            )
        )
    )
    return sess.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("t_start"),
        F.max(ts_col).alias("t_end"),
        F.array_join(F.transform(ev, lambda s: s["e"]), sep).alias("seq"),
    )
