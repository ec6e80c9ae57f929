"""As-of (point-in-time) join — the classic temporal operator Spark
has no built-in for and the reference engine (vector-only, SURVEY
§2.8: no joins at all) lacks entirely.

``asof_join(left, right)`` matches every left row to the LATEST right
row of the same key whose timestamp is ≤ the left row's (optionally
within a tolerance) — last-touchpoint attribution, mark-to-market
pricing, sensor alignment.

Implementation is the scalable union-tag construction, NOT a range
join (which explodes to O(|L|·|R|) candidate pairs per key before
filtering) and NOT a per-key collect:

  1. tag right rows 0 and left rows 1, union them (map-only);
  2. one window over (key) ordered by (ts, tag, right-tiebreak):
     ``last(right_col, ignorenulls=True)`` with an unbounded-preceding
     row frame carries the most recent right payload forward onto each
     left row — right-before-left at equal ts gives ``<=`` semantics;
  3. keep the left rows; null out carries older than ``tolerance``.

Cost at 100 TB: ONE shuffle on the key (both inputs hash-partition
together), a per-partition sort, and O(1) window state per row — the
same plan Flink/kdb-style as-of engines run distributed. Ties on
(key, ts) inside the right frame resolve by the ``right_order`` column
(largest wins), so results are deterministic; DuckDB's native ASOF
JOIN is the oracle twin (plans/relational_queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str,
    right_payload: tuple[str, ...],
    right_ts_alias: str = "matched_ts",
    tolerance: int | None = None,
    right_order: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row + the payload of the latest
    ``right`` row with equal ``key_cols`` and ``right.ts <= left.ts``
    (and ``left.ts - right.ts <= tolerance`` when given; ``ts_col``
    must be numeric for tolerance math). Unmatched rows keep NULL
    payloads. ``right_order`` breaks (key, ts) ties inside ``right``
    (largest value wins); omit it when (key, ts) is unique.
    """
    keys = list(key_cols)
    lcols = left.columns
    carry = [right_ts_alias, *right_payload]
    clash = [c for c in carry if c in lcols]
    if clash:
        raise ValueError(
            f"asof_join: carried right columns {clash} collide with left "
            f"columns — alias them (right_ts_alias / rename the payload)"
        )
    missing = [c for c in (*keys, ts_col) if c not in right.columns]
    if missing:
        raise ValueError(f"asof_join: right side lacks {missing}")

    # carry the whole right ROW as one struct, not per-column lasts: a
    # NULL payload value in the matching right row must surface as
    # NULL, not be skipped for a stale value from an older row (and
    # per-column carries could even mix fields of different rows). The
    # struct itself is non-null for every right row, so
    # last(ignorenulls) always lands on the latest right ROW.
    rstruct_type = (
        "struct<" + ",".join(
            [f"`{right_ts_alias}`:{dict(right.dtypes)[ts_col]}"]
            + [f"`{c}`:{dict(right.dtypes)[c]}" for c in right_payload]
        ) + ">"
    )
    lt = left.select(
        *[F.col(c) for c in lcols],
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__rord"),
        F.lit(None).cast(rstruct_type).alias("__rrow"),
    )
    rord = (F.col(right_order) if right_order is not None else F.lit(0)).cast("long")
    rt = right.select(
        *[F.col(c) for c in keys],
        F.col(ts_col),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in lcols if c not in keys and c != ts_col],
        F.lit(0).alias("__side"),
        rord.alias("__rord"),
        F.struct(
            F.col(ts_col).alias(right_ts_alias),
            *[F.col(c) for c in right_payload],
        ).cast(rstruct_type).alias("__rrow"),
    ).select(  # align column order with lt for unionByName safety
        *lcols, "__side", "__rord", "__rrow"
    )

    u = lt.unionByName(rt)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__rord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried_row: Column = F.last(
        F.when(F.col("__side") == 0, F.col("__rrow")), ignorenulls=True
    ).over(w)
    out = u.select(
        *lcols, F.col("__side"),
        *[carried_row[c].alias(c) for c in carry],
    ).filter(F.col("__side") == 1)

    if tolerance is not None:
        in_tol = F.col(right_ts_alias).isNotNull() & (
            F.col(ts_col) - F.col(right_ts_alias) <= F.lit(tolerance)
        )
        out = out.select(
            *lcols,
            *[F.when(in_tol, F.col(c)).alias(c) for c in carry],
        )
    else:
        out = out.select(*lcols, *carry)
    return out
