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
