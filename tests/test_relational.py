"""Relational analytics suite: exact-cents determinism, dtype
robustness, and the plan shapes the 100 TB design requires
(broadcast dim joins, pushed-down date filters, k-bounded top-k)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from lab_1806_vec_db_spark.operators.relational import (
    cents,
    pricing_summary,
    regional_volume,
    shipping_priority,
)
from lab_1806_vec_db_spark.session import read_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_cents_is_exact_half_up(spark):
    df = spark.createDataFrame(
        [(1.005,), (2.675,), (0.1,), (123.456,)], "x double"
    ).select(cents(F.col("x")).alias("c"))
    # floor(x*100+0.5) on the DOUBLE values (1.005*100 = 100.49999…)
    assert [r["c"] for r in df.collect()] == [100, 268, 10, 12346]


@pytest.fixture(scope="module")
def tiny_lineitem(spark):
    rows = [
        # okey, pkey, skey, line, qty, price, disc, tax, rf, ls, ship(ns)
        (1, 1, 1, 1, 10.0, 100.0, 0.1, 0.05, "A", "F", 10**9 * 86400),
        (2, 1, 1, 1, 5.0, 50.0, 0.0, 0.0, "A", "F", 10**9 * 86400),
        (3, 1, 1, 1, 7.0, 10.0, 0.5, 0.1, "R", "O", 10**9 * 86400 * 900),
    ]
    return spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int,"
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double,"
        "l_returnflag string, l_linestatus string, l_shipdate bigint",
    )


def test_pricing_summary_exact(tiny_lineitem):
    out = {(r["l_returnflag"], r["l_linestatus"]): r
           for r in pricing_summary(tiny_lineitem, cutoff="1971-01-01").collect()}
    af = out[("A", "F")]
    assert af["sum_qty"] == 15
    assert af["sum_base_cents"] == 15000
    assert af["sum_disc_cents"] == 9000 + 5000       # 100*0.9 + 50
    assert af["sum_charge_cents"] == 9450 + 5000     # 90*1.05 + 50
    assert af["avg_qty"] == 7.5
    assert af["count_order"] == 2
    assert ("R", "O") not in out                     # date filter applied


def test_pricing_summary_timestamp_dtype(tiny_lineitem):
    ts = tiny_lineitem.withColumn(
        "l_shipdate", F.timestamp_seconds(F.expr("l_shipdate div 1000000000"))
    )
    a = sorted(map(tuple, pricing_summary(tiny_lineitem).collect()))
    b = sorted(map(tuple, pricing_summary(ts).collect()))
    assert a == b


def test_q1_filter_pushed_to_scan(spark, sf_correct):
    plan = _plan(pricing_summary(read_table(spark, sf_correct, "lineitem")))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "l_shipdate" in pushed[0]
    schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    # column pruning: the unused l_partkey never leaves the scan
    assert schema and "l_partkey" not in schema[0]


def test_q3_broadcasts_dims_and_bounds_topk(spark, sf_correct):
    plan = _plan(shipping_priority(
        read_table(spark, sf_correct, "customer"),
        read_table(spark, sf_correct, "orders"),
        read_table(spark, sf_correct, "lineitem"),
    ))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan   # k-bounded cut, no global sort


def test_q5_no_cartesian_no_fact_broadcast_of_lineitem(spark, sf_correct):
    plan = _plan(regional_volume(
        read_table(spark, sf_correct, "customer"),
        read_table(spark, sf_correct, "orders"),
        read_table(spark, sf_correct, "lineitem"),
        read_table(spark, sf_correct, "supplier"),
        read_table(spark, sf_correct, "nation"),
        read_table(spark, sf_correct, "region"),
    ))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q5_co_national_constraint(spark, sf_correct):
    out = regional_volume(
        read_table(spark, sf_correct, "customer"),
        read_table(spark, sf_correct, "orders"),
        read_table(spark, sf_correct, "lineitem"),
        read_table(spark, sf_correct, "supplier"),
        read_table(spark, sf_correct, "nation"),
        read_table(spark, sf_correct, "region"),
        region_name="EUROPE",
    )
    rows = out.collect()
    assert all(r["revenue_cents"] > 0 for r in rows)
    # every returned nation is in EUROPE
    nr = (
        read_table(spark, sf_correct, "nation")
        .join(
            read_table(spark, sf_correct, "region").filter(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_name")
    )
    euro = {r["n_name"] for r in nr.collect()}
    assert {r["n_name"] for r in rows} <= euro


def test_revenue_change_pushdown_and_hand_values(spark):
    from lab_1806_vec_db_spark.operators.relational import revenue_change

    li = spark.createDataFrame(
        [
            # in window, in band, under qty: 100.00 * 0.05 -> 500 cents
            (1, 10.0, 100.0, 0.05, 0.0, "N", "O", "1997-06-01"),
            # discount out of band
            (2, 10.0, 100.0, 0.10, 0.0, "N", "O", "1997-06-01"),
            # quantity too high
            (3, 30.0, 100.0, 0.06, 0.0, "N", "O", "1997-06-01"),
            # outside the date window
            (4, 10.0, 100.0, 0.06, 0.0, "N", "O", "1998-06-01"),
            # in: 50.00 * 0.07 -> 350 cents
            (5, 23.0, 50.0, 0.07, 0.0, "N", "O", "1997-12-31"),
        ],
        "l_orderkey long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    row = revenue_change(li).first()
    assert row["revenue_cents"] == 850 and row["n_rows"] == 2
    # scan-bound contract: every predicate reaches the scan, no join
    plan = revenue_change(li)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_returned_item_revenue_topk(spark):
    from lab_1806_vec_db_spark.operators.relational import returned_item_revenue

    li = spark.createDataFrame(
        [(1, 100.0, 0.0, "R"), (1, 50.0, 0.5, "R"), (2, 999.0, 0.0, "N"),
         (3, 10.0, 0.0, "R")],
        "l_orderkey long, l_extendedprice double, l_discount double, l_returnflag string",
    )
    orders = spark.createDataFrame(
        [(1, 7, "1997-02-01"), (2, 7, "1997-02-01"), (3, 8, "1996-01-01")],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    customer = spark.createDataFrame(
        [(7, "Ann", 1), (8, "Bo", 1)], "c_custkey long, c_name string, c_nationkey int"
    )
    nation = spark.createDataFrame([(1, "FR")], "n_nationkey int, n_name string")
    out = returned_item_revenue(customer, orders, li, nation).collect()
    # order 3 is outside the window; order 2 is not returned
    assert len(out) == 1
    r = out[0]
    # 100.00 + 50.00*0.5 = 125.00 -> 12500 cents
    assert (r["c_custkey"], r["c_name"], r["n_name"], r["revenue_cents"]) == (7, "Ann", "FR", 12500)


def test_q6_predicates_reach_scan(spark, sf_correct):
    from lab_1806_vec_db_spark.operators.relational import revenue_change

    plan = _plan(revenue_change(read_table(spark, sf_correct, "lineitem")))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    # the discount band and quantity cap must land in the parquet scan
    assert pushed and any("l_discount" in l and "l_quantity" in l for l in pushed)
    assert "Join" not in plan  # scan-bound by construction
    # only the two money columns + predicate columns are read
    schema_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert schema_lines and all("l_returnflag" not in l for l in schema_lines)


def test_q10_broadcasts_dims_and_bounds_topk(spark, sf_correct):
    from lab_1806_vec_db_spark.operators.relational import returned_item_revenue

    plan = _plan(returned_item_revenue(
        read_table(spark, sf_correct, "customer"),
        read_table(spark, sf_correct, "orders"),
        read_table(spark, sf_correct, "lineitem"),
        read_table(spark, sf_correct, "nation"),
    ))
    assert "BroadcastHashJoin" in plan       # customer/nation dims broadcast
    assert "TakeOrderedAndProject" in plan   # k-bounded cut, no global sort
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_returnflag" in l for l in pushed)  # R-flag filter at the scan
