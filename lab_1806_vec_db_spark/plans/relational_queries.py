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
  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
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
