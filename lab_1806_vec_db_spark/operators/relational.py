"""Relational analytics over the TPC-H-shaped tables: scan-heavy
rollups and multi-way joins — the SURVEY §2.8 category the reference
engine lacks entirely (no joins of any kind in /root/reference/src/;
its metadata filter is opaque string equality only).

These exist because an analytics engine serving an LLM data platform
answers relational questions NEXT TO its vector/corpus queries —
billing rollups, join-enriched provenance, per-region volume — and
because they exercise the two join strategies the 100 TB design
leans on:

- **dimension joins broadcast when the dim is broadcast-sized**:
  nation/region are constant-size at every SF and always broadcast;
  customer/supplier scale linearly with SF, so their broadcast is a
  default (right at bench scale, BroadcastHashJoin gated in
  tests/test_relational.py) behind a ``broadcast_dims`` switch —
  above the broadcast threshold the same plan degrades to a shuffle
  join AQE sizes, with only the constant dims broadcast;
- **fact-fact joins shuffle on the join key exactly once**:
  lineitem ⋈ orders co-partitions on orderkey; at cluster scale the
  same plan holds with bucketed tables (docs/SCALE.md).

Determinism contract: money aggregates are EXACT — per-row amounts
round half-up to integer cents (``floor(x*100 + .5)``, bit-identical
IEEE ops in Spark and DuckDB), then sum as BIGINT, so no
float-summation-order noise exists at any scale. Averages divide one
exact double by an exact count and round via the binary
``floor(q·10⁴ + .5)/10⁴`` trick (streaming/windows.py:_avg4).

Timestamp columns follow the repo-wide convention: the driver's
parquet types them TIMESTAMP(NANOS), which Spark reads as epoch-nanos
BIGINT under ``nanosAsLong``; predicates gate on the actual dtype so
TIMESTAMP-typed fixtures behave identically.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cents(x: Column) -> Column:
    """Exact integer cents: floor(x·100 + 0.5) — one deterministic
    IEEE rounding per row, BIGINT thereafter."""
    return F.floor(x * F.lit(100.0) + F.lit(0.5))


def _avg4(total: Column, n: Column) -> Column:
    q = total.cast("double") / n
    return F.floor(q * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0) + F.lit(0.0)


def _ts(df: DataFrame, col: str) -> Column:
    """Timestamp column as a comparable TIMESTAMP regardless of dtype.
    Nanos convert at MICROSECOND precision (not whole seconds) so
    sub-second boundary rows classify exactly as the DuckDB oracle's
    native TIMESTAMP comparison does."""
    if dict(df.dtypes)[col] == "bigint":
        return F.timestamp_micros(F.expr(f"{col} div 1000"))
    return F.col(col).cast("timestamp")


def _lit_ts(iso: str) -> Column:
    return F.lit(_dt.datetime.fromisoformat(iso))


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing rollup of
    all lineitems shipped on/before ``cutoff``. Pure scan + ONE keyed
    aggregation; partial aggregates combine map-side, the shuffle
    carries one row per (flag, status) per task. The date filter and
    the 6-column projection push into the parquet scan."""
    lf = lineitem.filter(_ts(lineitem, "l_shipdate") <= _lit_ts(cutoff))
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc * (F.lit(1.0) + F.col("l_tax"))
    return (
        lf.groupBy("l_returnflag", "l_linestatus")
        .agg(
            # round-to-nearest BEFORE the bigint cast: Spark's double→
            # bigint cast truncates while DuckDB's rounds — explicit
            # round() makes both engines agree for non-integral sums
            F.round(F.sum("l_quantity"), 0).cast("bigint").alias("sum_qty"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(cents(disc)).alias("sum_disc_cents"),
            F.sum(cents(charge)).alias("sum_charge_cents"),
            _avg4(F.sum("l_quantity"), F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    pivot: str = "1998-06-30",
    k: int = 10,
    broadcast_dims: bool = True,
) -> DataFrame:
    """TPC-H Q3 shape: top-``k`` open orders of one market segment by
    outstanding revenue. The segment-filtered customer keys broadcast
    into the orders scan (dim join, no fact shuffle) while customer
    fits the broadcast threshold — it scales with SF, so
    ``broadcast_dims=False`` demotes it to a shuffle join at extreme
    scale; the surviving orders join lineitem on orderkey — the one
    fact-fact shuffle; the final cut is a k-bounded
    TakeOrderedAndProject on the EXACT cents revenue with orderkey
    tiebreak."""
    maybe_bc = F.broadcast if broadcast_dims else (lambda d: d)
    c = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.filter(_ts(orders, "o_orderdate") < _lit_ts(pivot)).select(
        "o_orderkey", "o_custkey",
        F.date_format(_ts(orders, "o_orderdate"), "yyyy-MM-dd").alias("o_date"),
        "o_orderpriority",
    )
    l = lineitem.filter(_ts(lineitem, "l_shipdate") > _lit_ts(pivot)).select(
        "l_orderkey",
        cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev"),
    )
    return (
        l.join(
            o.join(maybe_bc(c), o.o_custkey == c.c_custkey).select(
                "o_orderkey", "o_date", "o_orderpriority"
            ),
            l.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_date", "o_orderpriority")
        .agg(F.sum("rev").alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), F.col("l_orderkey"))
        .limit(k)
    )


def regional_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    year_start: str = "1996-01-01",
    year_end: str = "1997-01-01",
    broadcast_dims: bool = True,
) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where the supplier and the
    ordering customer share that nation, one region, one order year.
    nation/region (25 / 5 rows at every SF) always broadcast;
    customer and supplier broadcast only under ``broadcast_dims`` —
    they scale linearly with SF, so above the broadcast threshold
    (~TPC-H SF100 for customer) pass ``broadcast_dims=False`` and the
    probe becomes a shuffle join that AQE sizes (docs/SCALE.md).
    lineitem ⋈ orders is the single mandatory fact shuffle on
    orderkey; the customer-nation == supplier-nation constraint
    applies post-join as a cheap filter."""
    maybe_bc = F.broadcast if broadcast_dims else (lambda d: d)
    nr = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")
    c = customer.join(
        F.broadcast(nr), customer.c_nationkey == nr.n_nationkey
    ).select("c_custkey", F.col("n_nationkey").alias("c_nkey"))
    s = supplier.join(
        F.broadcast(nr), supplier.s_nationkey == nr.n_nationkey
    ).select("s_suppkey", F.col("n_nationkey").alias("s_nkey"), "n_name")
    o = orders.filter(
        (_ts(orders, "o_orderdate") >= _lit_ts(year_start))
        & (_ts(orders, "o_orderdate") < _lit_ts(year_end))
    ).select("o_orderkey", "o_custkey")
    l = lineitem.select(
        "l_orderkey", "l_suppkey",
        cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev"),
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(maybe_bc(c), F.col("o_custkey") == c.c_custkey)
        .join(maybe_bc(s), F.col("l_suppkey") == s.s_suppkey)
        .filter(F.col("c_nkey") == F.col("s_nkey"))
        .groupBy("n_name")
        .agg(F.sum("rev").alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), F.col("n_name"))
    )


def revenue_change(
    lineitem: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 shape: revenue delta from a hypothetical discount
    change — a pure scan-bound query: every predicate (ship-date year,
    discount band, quantity cap) is a plain column comparison that
    reaches the parquet scan as PushedFilters, the projection is two
    columns, and the single aggregate has no keys (map-side partials
    collapse to one row per task). At 100 TB this is THE query shape
    that measures scan + pushdown health; zero joins, zero wide
    shuffles. Money math in exact BIGINT cents per row (one IEEE
    rounding each), summed as integers."""
    li = lineitem.filter(
        (_ts(lineitem, "l_shipdate") >= _lit_ts(date_from))
        & (_ts(lineitem, "l_shipdate") < _lit_ts(date_to))
        & (F.col("l_discount") >= disc_lo)
        & (F.col("l_discount") <= disc_hi)
        & (F.col("l_quantity") < max_qty)
    )
    rev = cents(F.col("l_extendedprice") * F.col("l_discount"))
    return li.agg(
        F.sum(rev).cast("bigint").alias("revenue_cents"),
        F.count("*").alias("n_rows"),
    )


def returned_item_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1997-01-01",
    date_to: str = "1997-04-01",
    k: int = 20,
    broadcast_dims: bool = True,
) -> DataFrame:
    """TPC-H Q10 shape: the top-k customers by revenue lost to
    returned items in one quarter. Plan: the return-flag filter and
    the order-date filter push into their scans; lineitem ⋈ orders is
    the one mandatory fact shuffle on orderkey; the per-customer
    rollup is the second keyed shuffle; customer (+25-row nation)
    broadcast under ``broadcast_dims`` (pass False above ~SF100 and
    the probe becomes an AQE-sized shuffle join); the final cut is a
    k-bounded TakeOrdered, never a global sort."""
    maybe_bc = F.broadcast if broadcast_dims else (lambda d: d)
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev"),
    )
    o = orders.filter(
        (_ts(orders, "o_orderdate") >= _lit_ts(date_from))
        & (_ts(orders, "o_orderdate") < _lit_ts(date_to))
    ).select("o_orderkey", "o_custkey")
    c = customer.join(
        F.broadcast(nation),
        customer.c_nationkey == nation.n_nationkey,
    ).select("c_custkey", "c_name", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev").alias("revenue_cents"))
        .join(maybe_bc(c), F.col("o_custkey") == c.c_custkey)
        .select("c_custkey", "c_name", "n_name", "revenue_cents")
        .orderBy(F.col("revenue_cents").desc(), F.col("c_custkey"))
        .limit(k)
    )
