"""Event-time windowed aggregation — batch/stream dual-mode.

The reference has no streaming surface (SURVEY §1.2: nothing
event-time or unbounded), so this is a north-star extension: the
tumbling-window rollup a training-data pipeline runs over an events
stream (per-type counts/sums for monitoring, rate features, etc.).

The same transformation works on a batch DataFrame and on a
``readStream`` DataFrame — that is the point of Structured Streaming's
unified model. In streaming mode, add ``withWatermark`` before calling
so late data is bounded; the aggregation state is then evictable.

Scale notes: a tumbling-window groupBy shuffles once on
``(window, keys)``; partial aggregation happens map-side, so the
shuffle carries one row per (window, key) per task — not per event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    unit: str = "hour",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window rollup: count / sum / avg of ``value_col`` per
    (window_start, keys). ``unit`` is a ``date_trunc`` unit (minute /
    hour / day) — a tumbling window of that calendar size.

    Output window_start is a formatted string so downstream hashing is
    timezone-representation-stable.
    """
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    ts = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "bigint":
        # epoch-nanos long (parquet TIMESTAMP(NANOS) via nanosAsLong):
        # integer `div` to seconds — exact, no double rounding
        ts = F.timestamp_seconds(F.expr(f"{ts_col} div 1000000000"))
    w = F.date_trunc(unit, ts)
    return (
        df.groupBy(w.alias("__w"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum(value_col), 4) + F.lit(0.0)).alias("sum_value"),
            (F.round(F.avg(value_col), 4) + F.lit(0.0)).alias("avg_value"),
        )
        .select(
            F.date_format("__w", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: int = 30,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Gap-based sessionization via the classic window-function
    construction: a new session starts when the time since the user's
    previous event exceeds the gap; session_id = running count of
    starts. One shuffle on ``user_id`` (the window partition key).
    Pass ``tiebreak_cols`` (e.g. an event id) when timestamps can
    collide, so the running count is deterministic."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, *tiebreak_cols)
    prev_ts = F.lag(ts_col).over(w)
    new_sess = (
        F.when(prev_ts.isNull(), 1)
        .when(
            F.col(ts_col).cast("long") - prev_ts.cast("long") > gap_minutes * 60, 1
        )
        .otherwise(0)
    )
    return df.withColumn("session_seq", F.sum(new_sess).over(w))
