"""Batch analytics over the events table beyond windowed rollups:
ranked top-N per window, hour-over-hour user retention, and exact
value quantiles.

The reference has no event/time surface at all (SURVEY §1.2), so
these are north-star extensions — the monitoring/feature queries a
training-data pipeline runs next to its corpus jobs. All three are
pure Catalyst plans:

- ``topn_per_window``: tumbling rollup (one (window, key) shuffle with
  map-side partials) + a rank window over the tiny per-window key set.
  The rank partition is (window), whose cardinality is hours — the
  second shuffle moves one row per (window, key), never per event.
- ``hourly_retention``: distinct (hour, user) pairs (one shuffle,
  map-side combine), then a self equi-join on (hour+1, user) — keyed,
  never all-pairs; at 100 TB both sides shuffle on the same composite
  key so AQE can coalesce, and the per-hour aggregate is k-bounded.
- ``value_quantiles``: exact linear-interpolation percentiles via the
  built-in ``percentile`` aggregate (sort-based within each group,
  one keyed shuffle). Exact quantiles at 100 TB require the per-group
  sort; ``approx_percentile`` (KLL/GK sketch) is the scale fallback
  when error tolerance allows — noted in docs/SCALE.md.

Timestamp handling follows streaming/windows.py: the driver's parquet
types ``ts`` as TIMESTAMP(NANOS) which Spark reads as epoch-nanos
BIGINT under ``nanosAsLong``; every function gates on the actual dtype
so TIMESTAMP/TIMESTAMP_NTZ fixtures work identically
(tests/test_events_dtype.py pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lab_1806_vec_db_spark.streaming.windows import tumbling_agg


def _floor_div(col: F.Column, divisor: int) -> F.Column:
    """True floor division on integral columns — Spark's ``div`` and
    integer casts truncate toward zero, which disagrees with the
    DuckDB oracles' ``//`` for negative (pre-1970) timestamps. pmod is
    always non-negative, so (x - pmod(x, d)) div d floors exactly.
    ``div`` (not ``/``): the numerator is an exact multiple of d, and
    integral division keeps it exact for ALL bigint inputs — float
    ``/`` holds the numerator in a double, losing low bits once it
    passes ~2^53·d (nanosecond stamps beyond ~2116 / before ~1853
    would floor off by one vs the oracle's exact ``//``)."""
    d = F.lit(divisor)
    return F.call_function("div", col - F.pmod(col, d), d)


def _epoch_seconds(df: DataFrame, ts_col: str) -> F.Column:
    """Event time as epoch seconds regardless of the writer's type
    (floor semantics — pre-1970 nanos land in the earlier second)."""
    if dict(df.dtypes)[ts_col] == "bigint":
        return _floor_div(F.col(ts_col), 1_000_000_000)
    # TIMESTAMP_NTZ can't cast to long directly; go via TIMESTAMP
    # (session tz is pinned UTC by session.py, so this is stable)
    return F.col(ts_col).cast("timestamp").cast("long")


def topn_per_window(
    df: DataFrame,
    n: int = 3,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    unit: str = "hour",
) -> DataFrame:
    """Top-``n`` keys per tumbling window ranked by summed value.

    Ranking uses the ROUNDED sum (the rollup's own output) with the
    key as tiebreak, so the cut is deterministic across engines.
    """
    rolled = tumbling_agg(df, ts_col=ts_col, unit=unit, keys=(key_col,),
                          value_col=value_col)
    w = Window.partitionBy("window_start").orderBy(
        F.col("sum_value").desc(), F.col(key_col)
    )
    return (
        rolled.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= n)
        .select("window_start", key_col, "n_events", "sum_value", "rnk")
    )


def hourly_retention(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Hour-over-hour user retention: for each hour bucket, how many
    distinct active users are also active in the NEXT hour.

    Returns (hour_id, n_users, n_retained, retention) per hour with
    ≥1 user, ordered by hour_id. hour_id is epoch-hours (exact
    integer floor division — timezone-free).
    """
    hours = (
        df.select(
            _floor_div(_epoch_seconds(df, ts_col), 3600).alias("hour_id"),
            F.col(user_col).alias("u"),
        )
        .distinct()
    )
    nxt = hours.select((F.col("hour_id") - 1).alias("hour_id"), F.col("u").alias("u2"))
    return (
        hours.join(nxt, (hours.hour_id == nxt.hour_id) & (hours.u == nxt.u2), "left")
        .groupBy(hours.hour_id.alias("hour_id"))
        .agg(
            F.count("*").alias("n_users"),
            F.count("u2").alias("n_retained"),
            (F.round(F.count("u2").cast("double") / F.count("*"), 4) + F.lit(0.0))
            .alias("retention"),
        )
    )


def value_quantiles(
    df: DataFrame,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Exact per-key value quantiles (linear interpolation between
    order statistics — the PERCENTILE_CONT definition both Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` implement)."""
    def label(p: float) -> str:
        # round, don't truncate: int(0.29*100) is 28 on IEEE doubles;
        # keep fractional percentiles distinct (p97_5 for 0.975)
        s = f"{p * 100:.10g}"
        return "p" + s.replace(".", "_").replace("-", "m")

    labels = [label(p) for p in probs]
    if len(set(labels)) != len(labels):
        raise ValueError(f"duplicate quantile labels from probs={probs}")
    pct = F.percentile(F.col(value_col), F.array(*[F.lit(p) for p in probs]))
    out = df.groupBy(key_col).agg(
        F.count("*").alias("n"),
        *[
            (F.round(F.get(pct, i), 4) + F.lit(0.0)).alias(labels[i])
            for i in range(len(probs))
        ],
    )
    return out
