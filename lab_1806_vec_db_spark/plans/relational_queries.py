"""Driver-contract entries for the relational analytics suite
(operators/relational.py): TPC-H-shaped rollup and join queries over
the lineitem/orders/customer/supplier/nation/region tables — the
SURVEY §2.8 join/aggregation category the reference engine has no
answer for.

Money math is exact integer cents on both engines (per-row
``floor(x·100 + .5)``, BIGINT sums), so these entries are
hash-deterministic at any scale factor — no float-summation-order
caveats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lab_1806_vec_db_spark.plans.entry_queries import register
from lab_1806_vec_db_spark.session import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


_CENTS_BASE = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_CENTS_DISC = "CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)"
_CENTS_CHARGE = (
    "CAST(floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100 + 0.5)"
    " AS BIGINT)"
)


@register(
    "tpch_pricing_summary",
    f"""SELECT l_returnflag, l_linestatus,
  CAST(round(sum(l_quantity), 0) AS BIGINT) AS sum_qty,
  CAST(sum({_CENTS_BASE}) AS BIGINT) AS sum_base_cents,
  CAST(sum({_CENTS_DISC}) AS BIGINT) AS sum_disc_cents,
  CAST(sum({_CENTS_CHARGE}) AS BIGINT) AS sum_charge_cents,
  floor(sum(l_quantity) / count(*) * 10000.0 + 0.5) / 10000.0 + 0.0 AS avg_qty,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2 ORDER BY 1, 2""",
)
def tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing rollup (operators/relational.py:
    pricing_summary): scan + one keyed aggregation with map-side
    partials; date filter and 6-column projection reach the parquet
    scan. Money sums are exact BIGINT cents."""
    from lab_1806_vec_db_spark.operators.relational import pricing_summary

    return pricing_summary(_t(spark, sf_dir, "lineitem")).orderBy(
        "l_returnflag", "l_linestatus"
    )


@register(
    "tpch_shipping_priority",
    f"""SELECT l.l_orderkey AS l_orderkey,
  strftime(o.o_orderdate, '%Y-%m-%d') AS o_date,
  o.o_orderpriority AS o_orderpriority,
  CAST(sum({_CENTS_DISC}) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""",
)
def tpch_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 top-10 open orders by outstanding revenue
    (operators/relational.py:shipping_priority): segment-filtered
    customer keys broadcast into orders, ONE fact-fact shuffle on
    orderkey, exact-cents revenue, k-bounded TakeOrdered cut."""
    from lab_1806_vec_db_spark.operators.relational import shipping_priority

    return shipping_priority(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@register(
    "tpch_regional_volume",
    f"""SELECT n.n_name AS n_name,
  CAST(sum({_CENTS_DISC}) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND s.s_nationkey = c.c_nationkey
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1 ORDER BY revenue_cents DESC, n_name""",
)
def tpch_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 revenue per nation, supplier and customer co-national
    (operators/relational.py:regional_volume): broadcast dim chains
    (region→nation→customer/supplier), one orderkey fact shuffle."""
    from lab_1806_vec_db_spark.operators.relational import regional_volume

    return regional_volume(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


# ---- as-of join, grouping sets, set operations (SURVEY §2.8 categories) ----


@register(
    "events_asof_attribution",
    """WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS ts_sec
  FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS ts_sec,
         max(event_id) AS click_event_id
  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
SELECT p.event_id AS event_id, p.user_id AS user_id, p.ts_sec AS ts_sec,
       c.ts_sec AS click_ts, c.click_event_id AS click_event_id
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.ts_sec >= c.ts_sec
ORDER BY event_id""",
)
def events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touchpoint attribution: every purchase matched to the SAME
    user's latest prior (or simultaneous) click — a true as-of join
    (operators/asof.py, union-tag + ignore-nulls window: ONE keyed
    shuffle, no range explosion). Oracle is DuckDB's native ASOF LEFT
    JOIN. Clicks pre-aggregate to unique (user, second) so the match
    is well-defined on both engines."""
    from pyspark.sql import functions as F

    from lab_1806_vec_db_spark.operators.asof import asof_join
    from lab_1806_vec_db_spark.operators.events import _epoch_seconds

    ev = _t(spark, sf_dir, "events")
    ev = ev.withColumn("ts_sec", _epoch_seconds(ev, "ts"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_sec"
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts_sec")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    return asof_join(
        p, c, key_cols=("user_id",), ts_col="ts_sec",
        right_payload=("click_event_id",), right_ts_alias="click_ts",
    ).orderBy("event_id")


@register(
    "events_rollup",
    """SELECT event_type,
  CAST((epoch_us(ts) // 1000000 // 3600) % 24 AS BIGINT) AS hod,
  count(*) AS n_events,
  round(sum(value), 4) + 0.0 AS sum_value,
  CAST(GROUPING(event_type, (epoch_us(ts) // 1000000 // 3600) % 24) AS BIGINT) AS gid
FROM events
GROUP BY ROLLUP(event_type, (epoch_us(ts) // 1000000 // 3600) % 24)
ORDER BY gid, event_type, hod""",
)
def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (event_type, hour-of-day) with subtotal and
    grand-total rows plus the GROUPING bitmask — the grouping-sets
    category from SURVEY §2.8. One shuffle: Spark expands the grouping
    sets map-side and aggregates all levels in a single pass."""
    from pyspark.sql import functions as F

    from lab_1806_vec_db_spark.operators.events import _epoch_seconds

    ev = _t(spark, sf_dir, "events")
    from lab_1806_vec_db_spark.operators.events import _floor_div

    ev = ev.withColumn(
        "hod", _floor_div(_epoch_seconds(ev, "ts"), 3600) % 24
    )
    return (
        ev.rollup("event_type", "hod")
        .agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum("value"), 4) + F.lit(0.0)).alias("sum_value"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
        .select("event_type", "hod", "n_events", "sum_value", "gid")
        .orderBy("gid", "event_type", "hod")
    )


@register(
    "events_user_overlap",
    """(SELECT DISTINCT user_id, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_id
  FROM events WHERE event_type = 'click'
 INTERSECT
 SELECT DISTINCT user_id, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_id
  FROM events WHERE event_type = 'purchase')
EXCEPT
SELECT DISTINCT user_id, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_id
  FROM events WHERE event_type = 'error'
ORDER BY user_id, hour_id""",
)
def events_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (SURVEY §2.8) at user-hour granularity: hours in
    which a user both clicked AND purchased without a same-hour error
    — INTERSECT then EXCEPT, each a keyed distinct aggregation (Spark
    plans them as left-semi / left-anti hash joins over distinct
    (user, hour) keys; user-level sets are degenerate in this corpus
    because every synthetic user emits every event type)."""
    from pyspark.sql import functions as F

    from lab_1806_vec_db_spark.operators.events import _epoch_seconds

    ev = _t(spark, sf_dir, "events")
    from lab_1806_vec_db_spark.operators.events import _floor_div

    ev = ev.withColumn(
        "hour_id", _floor_div(_epoch_seconds(ev, "ts"), 3600)
    )

    def uh(t: str) -> DataFrame:
        return ev.filter(F.col("event_type") == t).select("user_id", "hour_id")

    return (
        uh("click").intersect(uh("purchase")).subtract(uh("error"))
    ).orderBy("user_id", "hour_id")


@register(
    "events_json_props",
    """SELECT event_type, count(*) AS n,
  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
  CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
  CAST(sum(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) >= 50
           THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
FROM events GROUP BY event_type ORDER BY event_type""",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON property extraction (the SURVEY §2.8 JSON
    category): ``from_json`` parses the props column with an explicit
    schema INSIDE whole-stage codegen — a typed Catalyst expression,
    not a UDF — then a plain keyed rollup. At 100 TB the parse is
    map-only and fuses with the scan; pin the schema (as here) rather
    than schema_of_json sampling."""
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k bigint")["k"]
    ev = ev.withColumn("k", k)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k") >= 50, 1).otherwise(0)).cast("bigint").alias("n_hi"),
        )
        .orderBy("event_type")
    )


@register(
    "tpch_active_customers",
    """SELECT c.c_mktsegment AS c_mktsegment,
  count(*) AS n_active
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '2000-01-01 00:00:00')
GROUP BY 1 ORDER BY 1""",
)
def tpch_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (SURVEY §2.8): customers with ≥1 order in 1999,
    counted per market segment. The semi join shuffles only the
    distinct custkeys of the filtered orders — no order payload
    columns move, and duplicate orders never multiply customers."""
    from pyspark.sql import functions as F

    from lab_1806_vec_db_spark.operators.relational import _lit_ts, _ts

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    o99 = o.filter(
        (_ts(o, "o_orderdate") >= _lit_ts("1999-01-01"))
        & (_ts(o, "o_orderdate") < _lit_ts("2000-01-01"))
    ).select("o_custkey")
    return (
        c.join(o99, c.c_custkey == o99.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_active"))
        .orderBy("c_mktsegment")
    )


@register(
    "tpch_dormant_customers",
    """SELECT c.c_mktsegment AS c_mktsegment,
  count(*) AS n_dormant
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '2000-01-01 00:00:00')
GROUP BY 1 ORDER BY 1""",
)
def tpch_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (SURVEY §2.8): customers with NO order in 1999,
    per segment — the NOT-EXISTS dual of tpch_active_customers; same
    shuffle economics (distinct keys only)."""
    from pyspark.sql import functions as F

    from lab_1806_vec_db_spark.operators.relational import _lit_ts, _ts

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    o99 = o.filter(
        (_ts(o, "o_orderdate") >= _lit_ts("1999-01-01"))
        & (_ts(o, "o_orderdate") < _lit_ts("2000-01-01"))
    ).select("o_custkey")
    return (
        c.join(o99, c.c_custkey == o99.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_dormant"))
        .orderBy("c_mktsegment")
    )


@register(
    "events_value_bands",
    """WITH bands(band, lo, hi) AS (
  VALUES ('tiny', 0.0, 10.0), ('small', 10.0, 50.0),
         ('mid', 50.0, 200.0), ('large', 200.0, 1e18))
SELECT b.band AS band, count(*) AS n_events,
  round(sum(e.value), 4) + 0.0 AS sum_value
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY 1 ORDER BY 1""",
)
def events_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (range-predicate) join against a band table — the
    interval-classification shape (SURVEY §2.8 theta joins). The band
    side is tiny, so Spark plans a broadcast join with the BETWEEN
    predicate evaluated stream-side — each event row tests 4 bands,
    no shuffle of the fact table. For band tables too big to
    broadcast, the scalable rewrite is bucketize-the-point +
    equi-join on bucket (the LSH/IVF trick), documented in
    docs/SCALE.md."""
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    bands = ev.sparkSession.createDataFrame(
        [("tiny", 0.0, 10.0), ("small", 10.0, 50.0),
         ("mid", 50.0, 200.0), ("large", 200.0, 1e18)],
        "band string, lo double, hi double",
    )
    return (
        ev.join(
            F.broadcast(bands),
            (ev.value >= bands.lo) & (ev.value < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum("value"), 4) + F.lit(0.0)).alias("sum_value"),
        )
        .orderBy("band")
    )


_SQL_SURFACE = """SELECT c_mktsegment,
  count(*) AS n_customers,
  CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS acctbal_cents,
  CAST(min(c_custkey) AS BIGINT) AS first_custkey
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment"""


@register("sql_surface_segments", _SQL_SURFACE)
def sql_surface_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point (SURVEY §2.8 'SQL parser'): the ONE query
    string is executed verbatim by BOTH engines — Spark parses it with
    its ANSI SQL parser over a registered temp view, DuckDB runs it as
    the oracle. Dialect-portable by construction (exact-cents floor
    arithmetic, no engine-specific functions); Catalyst plans the same
    map-combined hash aggregate the DataFrame API would."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_SQL_SURFACE)


@register(
    "events_cube",
    """SELECT event_type,
  CAST(user_id % 4 AS BIGINT) AS cohort,
  count(*) AS n_events,
  round(sum(value), 4) + 0.0 AS sum_value,
  CAST(GROUPING(event_type, user_id % 4) AS BIGINT) AS gid
FROM events
GROUP BY CUBE(event_type, user_id % 4)
ORDER BY gid, event_type, cohort""",
)
def events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (event_type, user cohort): all four grouping
    sets — detail, each one-dimension subtotal, grand total — with the
    GROUPING bitmask, in a single-pass grouping-sets aggregation
    (completes the §2.8 family next to events_rollup's hierarchy)."""
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    ev = ev.withColumn("cohort", (F.col("user_id") % 4).cast("bigint"))
    return (
        ev.cube("event_type", "cohort")
        .agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum("value"), 4) + F.lit(0.0)).alias("sum_value"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
        .select("event_type", "cohort", "n_events", "sum_value", "gid")
        .orderBy("gid", "event_type", "cohort")
    )


# ---- round-8 TPC-H additions: Q6 (scan-bound) and Q10 (join + top-k) -------

_CENTS_Q6 = "CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)"


@register(
    "tpch_revenue_change",
    f"""SELECT CAST(sum({_CENTS_Q6}) AS BIGINT) AS revenue_cents,
  count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24""",
)
def tpch_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 revenue-change forecast (operators/relational.py:
    revenue_change): the pure scan-bound shape — every predicate
    reaches the parquet scan, two-column projection, keyless aggregate
    with map-side partials. Exact BIGINT cents."""
    from lab_1806_vec_db_spark.operators.relational import revenue_change

    return revenue_change(_t(spark, sf_dir, "lineitem"))


@register(
    "tpch_returned_items",
    f"""SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
  n.n_name AS n_name,
  CAST(sum({_CENTS_DISC}) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, c_custkey LIMIT 20""",
)
def tpch_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting (operators/relational.py:
    returned_item_revenue): top-20 customers by one quarter's returned
    revenue — pushed flag/date filters, one orderkey fact shuffle, one
    custkey rollup shuffle, broadcast customer/nation dims, k-bounded
    TakeOrdered."""
    from lab_1806_vec_db_spark.operators.relational import returned_item_revenue

    return returned_item_revenue(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "nation"),
    )
