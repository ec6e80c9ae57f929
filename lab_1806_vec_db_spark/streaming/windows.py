"""Event-time windowed aggregation — batch/stream dual-mode.

The reference has no streaming surface (SURVEY §1.2: nothing
event-time or unbounded), so this is a north-star extension: the
tumbling-window rollup a training-data pipeline runs over an events
stream (per-type counts/sums for monitoring, rate features, etc.).

The same transformation works on a batch DataFrame and on a
``readStream`` DataFrame — that is the point of Structured Streaming's
unified model. In streaming mode the grouping uses ``F.window`` (a
time-window grouping the state store understands), so with a
``watermark`` the per-window aggregation state is actually evicted
once the watermark passes the window end; a plain
``groupBy(date_trunc(ts))`` would be opaque to the state manager and
grow without bound. Batch mode keeps the ``date_trunc`` form (same
results, oracle-friendly plan).

Scale notes: a tumbling-window groupBy shuffles once on
``(window, keys)``; partial aggregation happens map-side, so the
shuffle carries one row per (window, key) per task — not per event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _avg4(value_col: str):
    """Engine-portable 4-dp average. Two traps stack here: (1) engines
    disagree by 1 ulp on the raw sum (summation order), so derive from
    the ROUNDED sum — dividing a 4-dp-clean double is bit-identical
    everywhere; (2) avg = sum/n regularly lands on exact half-at-5th-
    decimal values where decimal-string rounding (Spark round →
    BigDecimal of the shortest repr) and binary rounding (DuckDB)
    disagree, so round via floor(x·10⁴ + 0.5)/10⁴ — pure binary-value
    arithmetic both engines evaluate identically (the SQL twin is
    spelled out in plans/pipeline_queries.py)."""
    clean_sum = F.round(F.sum(value_col), 4) + F.lit(0.0)
    q = clean_sum / F.count("*")
    return F.floor(q * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0) + F.lit(0.0)


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

    Caveat: in streaming mode the window is ``F.window(ts, "1 <unit>")``,
    whose calendar alignment matches ``date_trunc`` for minute/hour in
    any whole-hour timezone; for ``day`` the two coincide only when the
    session timezone is UTC (Spark windows align to the epoch).
    """
    ts = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "bigint":
        # epoch-nanos long (parquet TIMESTAMP(NANOS) via nanosAsLong):
        # integer `div` to seconds — exact, no double rounding
        ts = F.timestamp_seconds(F.expr(f"{ts_col} div 1000000000"))
    df = df.withColumn("__ts", ts)
    if watermark is not None:
        # watermark on the (possibly converted) event-time column the
        # grouping actually uses — required for state eviction
        df = df.withWatermark("__ts", watermark)
    aggs = (
        F.count("*").alias("n_events"),
        (F.round(F.sum(value_col), 4) + F.lit(0.0)).alias("sum_value"),
        _avg4(value_col).alias("avg_value"),
    )
    if df.isStreaming:
        dur = {"minute": "1 minute", "hour": "1 hour", "day": "1 day"}[unit]
        out = df.groupBy(F.window("__ts", dur).alias("__w"), *keys).agg(*aggs)
        wstart = F.col("__w.start")
    else:
        out = df.groupBy(F.date_trunc(unit, F.col("__ts")).alias("__w"), *keys).agg(*aggs)
        wstart = F.col("__w")
    return out.select(
        F.date_format(wstart, "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        *keys,
        "n_events",
        "sum_value",
        "avg_value",
    )


def hopping_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "2 hours",
    slide: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Hopping (sliding) window rollup: each event lands in
    ``window/slide`` overlapping windows — the moving-average /
    rate-feature shape a training pipeline computes over an events
    stream. ``F.window(ts, window, slide)`` is the native form and
    works identically on batch and ``readStream`` (with a watermark the
    state store evicts windows the watermark has passed).

    Scale: the window explode multiplies rows by window/slide
    *map-side*, then one (window, keys) shuffle carries map-combined
    partials — the blow-up never crosses the wire as raw events.
    """
    ts = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "bigint":
        ts = F.timestamp_seconds(F.expr(f"{ts_col} div 1000000000"))
    df = df.withColumn("__ts", ts)
    if watermark is not None:
        df = df.withWatermark("__ts", watermark)
    out = df.groupBy(F.window("__ts", window, slide).alias("__w"), *keys).agg(
        F.count("*").alias("n_events"),
        (F.round(F.sum(value_col), 4) + F.lit(0.0)).alias("sum_value"),
        _avg4(value_col).alias("avg_value"),
    )
    return out.select(
        F.date_format(F.col("__w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        *keys,
        "n_events",
        "sum_value",
        "avg_value",
    )


def session_agg(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: int = 30,
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Per-session rollup via NATIVE session windows
    (``F.session_window``): one row per (user, session) with the
    session bounds, event count, and value sum. Works unchanged on a
    batch DataFrame and on ``readStream`` — in streaming mode the
    state store merges/extends open sessions and (with a watermark)
    evicts them once the watermark passes the session end, which is
    exactly the custom-stateful-operator shape a hand-rolled
    ``applyInPandasWithState`` sessionizer would otherwise need.

    Semantics (verified empirically, and what the oracle mirrors): an
    event extends its user's current session while
    ``ts <= prev_ts + gap``; the session's reported end is
    ``last_event + gap``. Equivalent to the classic lag/running-count
    construction in :func:`sessionize` with a strict ``>`` gap test.

    Scale: one keyed shuffle on ``user_id`` (session merging is local
    to the key's partition); map-side partials don't apply to session
    merge, but state is bounded per key and watermark-evicted.
    """
    dt = dict(df.dtypes).get(ts_col)
    if dt == "bigint":
        ts = F.timestamp_seconds(F.expr(f"{ts_col} div 1000000000"))
    elif dt == "timestamp_ntz":
        # keep NTZ native: session_window handles it without a tz
        # conversion — casting to TIMESTAMP would shift wall times
        # through the session timezone and corrupt gaps across DST
        ts = F.col(ts_col)
    else:
        ts = F.col(ts_col).cast("timestamp")
    df = df.withColumn("__ts", ts)
    if watermark is not None:
        df = df.withWatermark("__ts", watermark)
    out = df.groupBy(
        F.session_window("__ts", f"{int(gap_minutes)} minutes").alias("__w"),
        user_col,
    ).agg(
        F.count("*").alias("n_events"),
        (F.round(F.sum(value_col), 4) + F.lit(0.0)).alias("sum_value"),
    )
    return out.select(
        user_col,
        F.date_format(F.col("__w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.col("__w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        "sum_value",
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
    # Epoch-seconds for gap arithmetic, type-robust AND timezone-proof:
    # numeric columns pass through; TIMESTAMP holds an instant, so
    # cast-to-long is exact; TIMESTAMP_NTZ is naive wall time, so
    # derive a NAIVE epoch arithmetically (days-since-epoch·86400 +
    # time-of-day) — routing NTZ through a TIMESTAMP cast would shift
    # it by the session tz offset, which does NOT cancel in gap
    # differences when a DST transition falls inside the gap.
    dt = dict(df.dtypes).get(ts_col)
    c = F.col(ts_col)
    if dt in ("bigint", "int", "long", "double"):
        secs_expr = c.cast("bigint")
    elif dt == "timestamp_ntz":
        secs_expr = (
            F.datediff(c.cast("date"), F.lit("1970-01-01")).cast("bigint") * 86400
            + F.hour(c).cast("bigint") * 3600
            + F.minute(c).cast("bigint") * 60
            + F.second(c).cast("bigint")
        )
    else:
        secs_expr = c.cast("timestamp").cast("long")
    df = df.withColumn("__secs", secs_expr)
    prev_secs = F.lag("__secs").over(w)
    new_sess = (
        F.when(prev_secs.isNull(), 1)
        .when(F.col("__secs") - prev_secs > gap_minutes * 60, 1)
        .otherwise(0)
    )
    return df.withColumn("session_seq", F.sum(new_sess).over(w)).drop("__secs")
