"""TPC-H-classic headline queries adapted to the testdata schema —
the engine's OLAP showcase plans (multi-way joins, dense aggregates,
top-k over joins). Determinism per the §2 contract: money through
DECIMAL, averages as exact-sum / count, total ORDER BY.

These exercise plan quality more than the single-operator queries:
q46 is the widest aggregate, q47 a join→agg→top-k pipeline, q48 a
5-way join with two broadcastable dims and a selective region filter
that must prune before the fact join.
"""

from __future__ import annotations

import functools as _functools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.session import repartition_if_split_starved
from data_warehouse_nhom8_spark.sources import Catalog


def q46_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → partial agg → final agg, 8 metrics.

    Determinism + the decimal-tax fix (round 7): money sums run as
    EXACT INTEGER CENTS through `aggregates.exact_money_aggs` — the
    source columns are fixed-point (<= 2 decimals), so round(x*100)
    recovers exact integers and every product/sum below is integer
    arithmetic, bit-identical at any parallelism and in any engine
    (the oracle runs the same staging in DuckDB). The previous
    decimal(18,x)-staged form was value-identical but paid boxed Java
    BigDecimal per row: 8.9 s vs 3.9 s at the 60M-row probe. The
    charge column (6-decimal) is now mathematically exact rather than
    a rounding of the double product. Output columns stay DOUBLE per
    the driver-gate contract (round-1 post-mortem)."""
    from data_warehouse_nhom8_spark.operators.aggregates import (
        cents,
        exact_money_aggs,
    )

    c = Catalog(spark, sf_dir)
    li = c.lineitem.filter(F.to_date("l_shipdate") <= F.lit("2000-06-01").cast("date"))
    # the integer partial agg is still CPU-bound: don't let a
    # 3-row-group local file cap it at 3 cores (no-op at scale)
    li = repartition_if_split_starved(
        li.select(
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax",
        )
    )
    qty_c, price_c = cents("l_quantity"), cents("l_extendedprice")
    disc_c, tax_c = cents("l_discount"), cents("l_tax")
    out = exact_money_aggs(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": (qty_c, 100.0),
            "sum_base_price": (price_c, 100.0),
            "sum_disc_price": (price_c * (100 - disc_c), 1e4),
            "sum_charge": (price_c * (100 - disc_c) * (100 + tax_c), 1e6),
            "__sum_disc": (disc_c, 100.0),
        },
        extra_partial={"count_order": F.count(F.lit(1))},
        extra_final={
            "avg_qty": F.round(F.col("sum_qty") / F.col("count_order"), 2),
            "avg_price": F.round(F.col("sum_base_price") / F.col("count_order"), 2),
            "avg_disc": F.round(F.col("__sum_disc") / F.col("count_order"), 4),
        },
    )
    return out.select(
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc",
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


def q47_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join → agg → top-10 by revenue.

    Determinism: revenue = exact integer 1e-4 units summed as LONG —
    single-level is overflow-safe here because the group is ONE ORDER
    (<= 7 lines x ~1e9 units, bounded at any SF); one IEEE divide at
    output, identical staging in the oracle."""
    from data_warehouse_nhom8_spark.operators.aggregates import cents

    c = Catalog(spark, sf_dir)
    cust = c.customer.filter(F.col("c_mktsegment") == "BUILDING")
    orders = c.orders.filter(
        F.to_date("o_orderdate") < F.lit("1998-01-01").cast("date")
    )
    li = c.lineitem.filter(F.to_date("l_shipdate") > F.lit("1998-01-01").cast("date"))
    revenue = (
        F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).cast("double")
        / 1e4
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q48_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join (2 broadcast dims), revenue per
    nation for one region-year.

    Determinism: revenue = exact integer 1e-4 units via the two-level
    `exact_money_aggs` scheme — per-NATION sums grow with SF (no
    per-group bound), so the LONG partials stay partition-bounded and
    the dim-sized merge runs through DECIMAL(38,0); identical integer
    staging in the oracle (no DECIMAL output columns — round-1
    hash-gate post-mortem)."""
    from data_warehouse_nhom8_spark.operators.aggregates import (
        cents,
        exact_money_aggs,
    )

    c = Catalog(spark, sf_dir)
    joined = (
        c.customer.join(c.orders, c.customer["c_custkey"] == c.orders["o_custkey"])
        .join(c.lineitem, F.col("o_orderkey") == c.lineitem["l_orderkey"])
        .join(
            c.supplier,
            (F.col("l_suppkey") == c.supplier["s_suppkey"])
            & (F.col("c_nationkey") == c.supplier["s_nationkey"]),
        )
        .join(F.broadcast(c.nation), F.col("s_nationkey") == c.nation["n_nationkey"])
        .join(F.broadcast(c.region), F.col("n_regionkey") == c.region["r_regionkey"])
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
            & (F.to_date("o_orderdate") < F.lit("1998-01-01").cast("date"))
        )
    )
    return (
        exact_money_aggs(
            joined,
            ["n_name"],
            {"revenue": (cents("l_extendedprice") * (100 - cents("l_discount")), 1e4)},
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def q71_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking — EXISTS lineitem with a
    non-equi residual (shipped >60 days after the order date) as a
    LEFT SEMI join, then a tiny count-per-priority aggregate.

    Scale notes: the semi join shuffles on the order key only; the
    residual predicate evaluates inside the join (no post-filter pass),
    and the 5-group count is a map-side partial agg. Reference parity:
    the warehouse's late-order report (loadtowh/load_to_wh.sh daily
    checks) is the same EXISTS-per-order shape."""
    c = Catalog(spark, sf_dir)
    orders = c.orders.filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = c.lineitem.select("l_orderkey", "l_shipdate")
    cond = (orders["o_orderkey"] == li["l_orderkey"]) & (
        F.to_date(li["l_shipdate"]) > F.date_add(F.to_date(orders["o_orderdate"]), 60)
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q72_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional exact-cents
    sums over a broadcast fact⋈part join, one output row.

    Determinism: both sums are exact integer 1e-4 units through the
    two-level `exact_money_aggs` scheme (global group — unbounded
    with SF); the pct is one IEEE multiply+divide on bit-identical
    inputs, so Spark and DuckDB agree bitwise without rounding."""
    from data_warehouse_nhom8_spark.operators.aggregates import (
        cents,
        exact_money_aggs,
    )

    c = Catalog(spark, sf_dir)
    li = c.lineitem.filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    disc_e4 = cents("l_extendedprice") * (100 - cents("l_discount"))
    joined = li.join(
        F.broadcast(c.part.select("p_partkey", "p_type")),
        li["l_partkey"] == F.col("p_partkey"),
    )
    return exact_money_aggs(
        joined,
        [],
        {
            "promo_revenue": (
                F.when(F.col("p_type") == "PROMO", disc_e4).otherwise(F.lit(0)),
                1e4,
            ),
            "total_revenue": (disc_e4, 1e4),
        },
        extra_final={
            "promo_pct": (F.lit(100.0) * F.col("promo_revenue")) / F.col("total_revenue")
        },
    ).select("promo_revenue", "total_revenue", "promo_pct")


def q73_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume customers — agg-filter on the fact
    (HAVING sum(qty) > 300) BEFORE joining orders/customer, so the join
    input is the ~0.3% qualifying orders, not the raw fact.

    Scale notes: the groupBy(l_orderkey) partial-aggregates map-side;
    the >300 filter runs on the agg output (tiny), and both following
    joins shuffle only qualifying keys. The exact integer-cents LONG
    sum makes the threshold comparison engine-independent (per-ORDER
    sums are bounded at any SF, so single-level is overflow-safe —
    and codegen-primitive instead of boxed decimal)."""
    from data_warehouse_nhom8_spark.operators.aggregates import cents

    c = Catalog(spark, sf_dir)
    big = (
        c.lineitem.groupBy("l_orderkey")
        .agg((F.sum(cents("l_quantity")).cast("double") / 100.0).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300.0)
    )
    return (
        big.join(c.orders, big["l_orderkey"] == c.orders["o_orderkey"])
        .join(c.customer, F.col("o_custkey") == c.customer["c_custkey"])
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


def q74_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top supplier by quarterly revenue — per-supplier
    revenue agg, scalar MAX over that agg (broadcast single-row join,
    no second fact scan), equality filter, dim join for the name.

    Determinism: revenue is an exact integer-cents LONG sum cast once
    to double on both engines (per-SUPPLIER quarterly revenue is
    bounded at any SF — suppliers scale with SF, their per-key line
    count does not — so single-level is overflow-safe), so the
    MAX-equality selects the identical supplier set even under ties.

    Scale notes: the MAX aggregates the per-supplier agg OUTPUT to
    ONE row and broadcasts it back (round-7: this replaced an
    unpartitioned window — suppliers scale linearly with SF, so at
    100 TB that window would drag ~1e9 rows through one task, a hard
    wall). The derivation appears twice in the static plan (the
    classic Q15 tradeoff); both instances are pushed-filtered fully
    parallel scans, and Spark's exchange reuse collapses them when
    stage sizes warrant — two parallel scans beat one scan plus a
    single-task window at any SF."""
    from data_warehouse_nhom8_spark.operators.aggregates import cents

    c = Catalog(spark, sf_dir)
    rev = (
        c.lineitem.filter(
            (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.to_date("l_shipdate") < F.lit("1997-04-01").cast("date"))
        )
        .groupBy("l_suppkey")
        .agg(
            (
                F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).cast(
                    "double"
                )
                / 1e4
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .drop("__mx")
        .join(c.supplier, F.col("l_suppkey") == c.supplier["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q75_dormant_customer_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: high-balance customers with no recent orders —
    scalar-subquery threshold (exact-sum/count average over positive
    balances) + anti join against recent order custkeys, rolled up per
    market segment.

    Scale notes: the threshold is one broadcast scalar; the anti join
    shuffles on custkey with the recent-orders side pre-projected to
    the key column only. The reference's datamart 'inactive customers'
    report (datamart/load_to_dm.py) is this shape."""
    c = Catalog(spark, sf_dir)
    pos = c.customer.filter(F.col("c_acctbal") > 0)
    thresh = pos.agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__avg")
    )
    recent = c.orders.filter(
        F.to_date("o_orderdate") >= F.lit("2000-01-01").cast("date")
    ).select("o_custkey")
    return (
        c.customer.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(recent, F.col("c_custkey") == recent["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


def q76_moving_avg_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-frame window: 3-order moving average of order value per
    customer (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW).

    Determinism: the frame is keyed by a total order (date, orderkey);
    the moving sum runs as exact integer cents (3-row bounded frame —
    overflow-free LONG at any scale, no boxed decimal in the window
    buffer) and divides by the frame count once in IEEE double —
    bitwise identical across engines. Scale notes: one shuffle on
    o_custkey; the frame is O(1) memory per row (sliding, bounded)."""
    from pyspark.sql.window import Window

    from data_warehouse_nhom8_spark.operators.aggregates import cents

    c = Catalog(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return (
        c.orders.select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            (
                F.sum(cents("o_totalprice")).over(w).cast("double") / 100.0
                / F.count(F.lit(1)).over(w)
            ).alias("moving_avg_price"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


def q77_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue — the
    returns report: filtered fact ⋈ orders ⋈ customer ⋈ broadcast
    nation, revenue agg per customer, deterministic top-20.

    Scale notes: the returnflag + date filters push to the parquet
    scan; nation broadcasts; the final top-20 compiles to
    TakeOrderedAndProject (no global sort). Revenue = exact integer
    1e-4 units summed as LONG (per-CUSTOMER revenue in a one-year
    window is bounded at any SF — customers scale with SF, their
    per-key order count does not), one IEEE divide at output."""
    from data_warehouse_nhom8_spark.operators.aggregates import cents

    c = Catalog(spark, sf_dir)
    li = c.lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = c.orders.filter(
        (F.to_date("o_orderdate") >= F.lit("1998-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1999-01-01").cast("date"))
    )
    revenue = (
        F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).cast("double")
        / 1e4
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(c.customer, F.col("o_custkey") == c.customer["c_custkey"])
        .join(F.broadcast(c.nation), F.col("c_nationkey") == c.nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q86_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: forecasting-revenue-change — a pure
    filter-and-sum with THREE range predicates that must all reach the
    parquet scan (date window, discount band, quantity cap). The whole
    query is one scan + partial agg + single-row final agg; at 100 TB
    its cost is exactly the bytes the pushed filters let through.

    Determinism: revenue = Σ(extendedprice·discount) as exact integer
    1e-4 units (both factors are 2-decimal fixed-point; see
    `exact_money_aggs` — same staging in the DuckDB oracle), one cast
    to DOUBLE at the end (reference parity: the datamart's
    single-number revenue gates, datamart/load_to_dm.py:127-139)."""
    from data_warehouse_nhom8_spark.operators.aggregates import (
        cents,
        exact_money_aggs,
    )

    c = Catalog(spark, sf_dir)
    li = c.lineitem.filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01").cast("date"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return exact_money_aggs(
        li,
        [],
        {"revenue": (cents("l_extendedprice") * cents("l_discount"), 1e4)},
        extra_partial={"n_lines": F.count(F.lit(1))},
    ).select("revenue", "n_lines")


def q87_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: volume shipping between two nations — the
    supplier-nation x customer-nation pair report.

    Scale notes: both nation dims are pre-filtered to the two nations
    of interest and BROADCAST, so the fact stream is pruned to the
    qualifying suppliers/customers by two broadcast hash joins before
    any shuffle; the residual (A,B)|(B,A) pair predicate evaluates on
    the joined row. Only the orders/customer equi-joins shuffle."""
    c = Catalog(spark, sf_dir)
    nations = ["NATION_1", "NATION_2"]
    n1 = c.nation.filter(F.col("n_name").isin(nations)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = c.nation.filter(F.col("n_name").isin(nations)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    li = c.lineitem.filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    from data_warehouse_nhom8_spark.operators.aggregates import (
        cents,
        exact_money_aggs,
    )

    joined = (
        li.join(c.supplier, li["l_suppkey"] == c.supplier["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(c.orders, F.col("l_orderkey") == c.orders["o_orderkey"])
        .join(c.customer, F.col("o_custkey") == c.customer["c_custkey"])
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year(F.to_date("l_shipdate")).cast("long"))
    )
    # per-(nation-pair, year) revenue grows with SF → two-level exact
    return (
        exact_money_aggs(
            joined,
            ["supp_nation", "cust_nation", "l_year"],
            {"revenue": (cents("l_extendedprice") * (100 - cents("l_discount")), 1e4)},
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q88_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — one nation's share of
    ECONOMY-part revenue among ASIA-region customers, per order year.

    Scale notes: part (type-filtered), nation (region-pruned via a
    broadcast region join) and the share nation are all broadcast; the
    share is a conditional-sum / sum on the SAME aggregated row — one
    pass, no second scan. Division happens once per year row in IEEE
    double on bit-identical exact-decimal inputs."""
    c = Catalog(spark, sf_dir)
    part = c.part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    asia_nations = (
        c.nation.join(
            F.broadcast(c.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    supp_nation = c.nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    orders = c.orders.filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    from data_warehouse_nhom8_spark.operators.aggregates import (
        cents,
        exact_money_aggs,
    )

    vol_e4 = cents("l_extendedprice") * (100 - cents("l_discount"))
    joined = (
        c.lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == orders["o_orderkey"])
        .join(c.customer, F.col("o_custkey") == c.customer["c_custkey"])
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("c_nk"))
        .join(c.supplier, F.col("l_suppkey") == c.supplier["s_suppkey"])
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("s_nk"))
        .withColumn("o_year", F.year(F.to_date("o_orderdate")).cast("long"))
    )
    # per-year volumes grow with SF → two-level exact integer sums
    return (
        exact_money_aggs(
            joined,
            ["o_year"],
            {
                "nation_volume": (
                    F.when(F.col("supp_nation") == "NATION_2", vol_e4).otherwise(
                        F.lit(0)
                    ),
                    1e4,
                ),
                "total_volume": (vol_e4, 1e4),
            },
            extra_final={
                "mkt_share": F.col("nation_volume") / F.col("total_volume")
            },
        )
        .select("o_year", "nation_volume", "total_volume", "mkt_share")
        .orderBy("o_year")
    )


def q89_priority_line_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode report adapted: the testdata carries
    no l_shipmode, so line status stands in for the mode): count
    high- vs low-priority orders' lines per status for one ship year —
    the canonical join + conditional-CASE-sum pair.

    Scale notes: the date filter pushes to the fact scan; the join
    shuffles on orderkey only with orders pre-projected to (key,
    priority); both CASE sums partial-aggregate map-side."""
    c = Catalog(spark, sf_dir)
    li = c.lineitem.filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01").cast("date"))
    ).select("l_orderkey", "l_linestatus")
    orders = c.orders.select("o_orderkey", "o_orderpriority")
    high = F.sum(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    )
    low = F.sum(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0).otherwise(1)
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(high.alias("high_line_count"), low.alias("low_line_count"))
        .orderBy("l_linestatus")
    )


def q90_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — LEFT OUTER
    join so zero-order customers keep a 0 bucket, then a second
    aggregate over the first (distribution of the counts).

    Scale notes: count(o_orderkey) skips the outer join's nulls, so
    the 0 bucket emerges without special-casing; both aggregates
    partial-combine map-side; the distribution agg's input is already
    customer-cardinality (dim-sized), so the second shuffle is tiny."""
    c = Catalog(spark, sf_dir)
    ords = c.orders.filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        c.customer.select("c_custkey")
        .join(ords, F.col("c_custkey") == ords["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q91_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity-order revenue — the correlated
    `l_quantity < 0.2 * AVG(l_quantity per part)` subquery, decorrelated
    the way it must run at scale: the per-part average is ONE partial
    aggregate over the (part-pruned) fact, broadcast back and compared
    — never a per-row rescan of lineitem.

    Determinism: the average is exact integer-cents sum / count (both
    engines compute the identical double; per-PART line counts are
    bounded at any SF, so the LONG sum is overflow-safe); the 0.2x
    threshold is one IEEE op on bit-identical inputs; the final global
    sum (unbounded with SF) runs through the two-level
    `exact_money_aggs` scheme with /7.0 applied once at output."""
    from data_warehouse_nhom8_spark.operators.aggregates import (
        cents,
        exact_money_aggs,
    )

    c = Catalog(spark, sf_dir)
    part = c.part.filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10)
    ).select("p_partkey")
    li = c.lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
    pruned = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    avg_q = pruned.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (
            F.sum(cents("l_quantity")).cast("double") / 100.0
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    qualifying = pruned.join(
        F.broadcast(avg_q), F.col("l_partkey") == F.col("avg_pk")
    ).filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    return (
        exact_money_aggs(
            qualifying,
            [],
            {"__sum_ext": (cents("l_extendedprice"), 100.0)},
            extra_partial={"n_lines": F.count(F.lit(1))},
            extra_final={"avg_yearly": F.col("__sum_ext") / F.lit(7.0)},
        )
        .select("avg_yearly", "n_lines")
    )


def q92_disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: discounted revenue under an OR-of-ANDs
    predicate spanning both join sides (brand/size from part,
    quantity from lineitem).

    Scale notes: Catalyst splits the disjunction — the part-only
    conjuncts ((brand,size) per arm) push to the broadcast part scan,
    the quantity bands stay as the join residual; the fact is never
    scanned without the partkey broadcast filter. This is the classic
    'predicate too tangled to push' trap; the plan gate pins that the
    part scan carries PushedFilters."""
    c = Catalog(spark, sf_dir)
    j = c.lineitem.join(
        F.broadcast(c.part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    arm = lambda brand, smax, qlo, qhi: (
        (F.col("p_brand") == brand)
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= smax)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
    )
    cond = arm("Brand#1", 5, 1, 11) | arm("Brand#2", 10, 10, 20) | arm("Brand#3", 15, 20, 30)
    return j.filter(cond).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q93_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who kept orders waiting — the
    EXISTS + NOT-EXISTS double self-join on the fact. Adapted: the
    testdata has no commit/receipt dates, so 'late' = shipped more
    than 90 days after the order date; supplier scope = ASIA region.

    Scale notes (round-7 rewrite): the textbook plan runs the EXISTS
    as a LEFT SEMI and the NOT EXISTS as a LEFT ANTI self-join — three
    fact-scale shuffles. The set conditions are per-ORDER properties,
    so they reduce to two aggregates instead: a late line (o, s)
    qualifies iff the order has exactly one distinct late supplier (no
    OTHER supplier was late — the one late supplier is necessarily s)
    and at least two distinct suppliers overall (some other supplier
    exists). Both set-cardinality tests reduce to MIN/MAX equality —
    `min(s) == max(s)` ⟺ exactly one distinct — so the aggregates are
    plain map-side-combinable min/max with NO distinct state (an exact
    count-distinct over the full fact measured 2x slower than the
    self-joins; min/max matches them). The oracle keeps the
    EXISTS/NOT-EXISTS form, so the rewrite's equivalence is externally
    hash-checked, not assumed. A/B at the 60M-row probe: wall parity
    with the semi+anti form — the rewrite wins on ROBUSTNESS, not
    wall: the self-joins carry `l_suppkey != s2` inequality residuals,
    which degrade quadratically on a hot order key (every probe row
    scans the key's whole build side), while min/max aggregation is
    strictly one state per order at any skew. Supplier dim broadcasts
    after reduction."""
    c = Catalog(spark, sf_dir)
    late = (
        c.lineitem.join(
            c.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(
            F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 90)
        )
        .select("l_orderkey", "l_suppkey")
    )
    sole_late_orders = (
        late.groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("__smin"), F.max("l_suppkey").alias("__smax"))
        .filter(F.col("__smin") == F.col("__smax"))
        .select(F.col("l_orderkey").alias("__lo"))
    )
    multi_supplier_orders = (
        c.lineitem.select("l_orderkey", "l_suppkey")
        .groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("__smin"), F.max("l_suppkey").alias("__smax"))
        .filter(F.col("__smin") != F.col("__smax"))
        .select(F.col("l_orderkey").alias("__mo"))
    )
    asia_supp = (
        c.supplier.join(
            F.broadcast(
                c.nation.join(
                    F.broadcast(c.region.filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    cand = late.join(
        sole_late_orders, F.col("l_orderkey") == F.col("__lo"), "left_semi"
    ).join(multi_supplier_orders, F.col("l_orderkey") == F.col("__mo"), "left_semi")
    return (
        cand.join(F.broadcast(asia_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


def derived_partsupp(c: "Catalog") -> DataFrame:
    """The testdata ships no partsupp table, so the five partsupp-
    dependent TPC-H shapes (Q2/Q9/Q11/Q16/Q20) derive one INSIDE the
    query as a deterministic function of part x supplier-count — the
    same derivation, in the same integer arithmetic, runs in the DuckDB
    oracle SQL (``_PARTSUPP_SQL``), so both engines see the identical
    relation with zero new data files.

    Per part, 4 suppliers (TPC-H's own fan-out): for i in 0..3,
      ps_suppkey         = (p_partkey*13 + i*17) % S      (S = |supplier|;
                            keys 0-based contiguous in the testdata)
    The "4 distinct suppliers per part" claim requires gcd(S, 17) == 1
    and S > 3 — if 17 | S the four generated rows collapse onto one
    ps_suppkey (invisible to the oracle hash gate, since DuckDB runs
    the same derivation, but it would break q101's top-100 total-order
    assumption). tests/test_tpch.py::test_derived_partsupp_supplier_
    counts_coprime pins this for every testdata scale factor.
      ps_availqty        = 1 + (p_partkey*31 + i*37) % 9999
      ps_supplycost_cents= (p_partkey*53 + i*41) % 20000 + 100
    All BIGINT — exact cross-engine math per the determinism doctrine;
    ``ps_supplycost`` (dollars, double) is one IEEE divide of the exact
    cents, bit-identical across engines.

    Scale notes: the derivation is a map-only explode over the part
    scan (4 rows out per row in — no shuffle, no driver scalar; the
    supplier count joins as a broadcast one-row aggregate). At 100 TB a
    real partsupp would be a parquet table and every consumer below
    joins it by key exactly as they join this."""
    s_cnt = F.broadcast(c.supplier.agg(F.count(F.lit(1)).alias("__s_cnt")))
    # parsed-string form (round-10 build-cost rule, r15: this helper
    # backs five queries and its Column chains cost ~0.1 s of py4j
    # plan construction per build) — CAST(...AS BIGINT)/%/explode
    # parse to the identical operators, and every consumer's DuckDB
    # oracle pins the values bitwise
    return (
        c.part.select("p_partkey")
        .crossJoin(s_cnt)
        .selectExpr("p_partkey", "__s_cnt", "explode(array(0, 1, 2, 3)) AS __i")
        .selectExpr(
            "p_partkey AS ps_partkey",
            "CAST((p_partkey * 13 + __i * 17) % __s_cnt AS BIGINT) AS ps_suppkey",
            "CAST(1 + (p_partkey * 31 + __i * 37) % 9999 AS BIGINT) AS ps_availqty",
            "CAST((p_partkey * 53 + __i * 41) % 20000 + 100 AS BIGINT)"
            " AS ps_supplycost_cents",
        )
        .selectExpr(
            "*",
            "CAST(ps_supplycost_cents AS DOUBLE) / CAST('100.0' AS DOUBLE)"
            " AS ps_supplycost",
        )
    )


# The identical derivation for the DuckDB oracle (same integer math).
_PARTSUPP_SQL = """
  partsupp AS (
    SELECT p.p_partkey AS ps_partkey,
           CAST((p.p_partkey * 13 + t.i * 17) % sc.s_cnt AS BIGINT) AS ps_suppkey,
           CAST(1 + (p.p_partkey * 31 + t.i * 37) % 9999 AS BIGINT) AS ps_availqty,
           CAST((p.p_partkey * 53 + t.i * 41) % 20000 + 100 AS BIGINT) AS ps_supplycost_cents,
           CAST((p.p_partkey * 53 + t.i * 41) % 20000 + 100 AS DOUBLE) / 100.0 AS ps_supplycost
    FROM part p
    CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(i)
    CROSS JOIN (SELECT COUNT(*) AS s_cnt FROM supplier) sc
  )
"""


def q101_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier — the classic correlated
    scalar subquery (``ps_supplycost = (SELECT MIN ... WHERE same
    part)``), decorrelated the only way that survives 100 TB: the
    per-part minimum is a WINDOW over the already-joined candidate
    rows, so partsupp is derived/scanned ONCE and no per-row re-scan
    exists anywhere in the plan (the naive correlated form re-runs the
    subquery per part).

    Determinism: the min/equality compare on exact integer cents; the
    output cost is the one-IEEE-divide dollars; (s_acctbal, s_name,
    ps_partkey) is a total order because a supplier appears at most
    once per part."""
    from pyspark.sql.window import Window

    c = Catalog(spark, sf_dir)
    europe_supp = (
        c.supplier.join(
            F.broadcast(
                c.nation.join(
                    F.broadcast(c.region.filter(F.col("r_name") == "EUROPE")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = c.part.filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 16)
    ).select("p_partkey")
    cand = (
        derived_partsupp(c)
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(europe_supp), F.col("ps_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("ps_partkey")
    return (
        cand.withColumn("__min_cents", F.min("ps_supplycost_cents").over(w))
        .filter(F.col("ps_supplycost_cents") == F.col("__min_cents"))
        .select("s_acctbal", "s_name", "n_name", "ps_partkey", "ps_supplycost")
        .orderBy(F.desc("s_acctbal"), "s_name", "ps_partkey")
        .limit(100)
    )


def q102_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: important stock identification — per-part stock
    value in one nation, HAVING value above a share of the global
    total. The global total aggregates the per-part agg OUTPUT to one
    row and broadcasts back (round-7: replaced an unpartitioned
    window — parts scale linearly with SF, so at 100 TB that window
    would single-task ~1e9 rows; the one-row broadcast keeps every
    stage parallel). The map-only partsupp derivation appears twice
    in the static plan (both branches re-derive from the part scan —
    explode + integer math, no shuffle); exchange reuse collapses the
    per-part shuffle when stage sizes warrant.

    Threshold is scale-free (1.5x the average per-part value) so the
    query returns rows at every SF; value arithmetic is exact BIGINT
    cents end-to-end, the threshold compare one IEEE divide+multiply
    on bit-identical inputs."""
    c = Catalog(spark, sf_dir)
    nation_supp = (
        c.supplier.join(
            F.broadcast(c.nation.filter(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    per_part = (
        derived_partsupp(c)
        .join(F.broadcast(nation_supp), F.col("ps_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("ps_partkey")
        .agg(F.sum(F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("__value_cents"))
    )
    totals = per_part.agg(
        F.sum("__value_cents").alias("__tot"), F.count(F.lit(1)).alias("__n")
    )
    return (
        per_part.join(F.broadcast(totals))
        .filter(
            F.col("__value_cents").cast("double")
            > F.col("__tot").cast("double") / F.col("__n") * 1.5
        )
        .select(
            "ps_partkey",
            (F.col("__value_cents").cast("double") / 100.0).alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), "ps_partkey")
    )


def _partsupp_fits_broadcast(sf_dir: str, threshold_bytes: int = 10 << 20) -> bool:
    """Stats-driven side choice for the partsupp equi-joins: the
    derived partsupp is a pure function of the part table (x4
    fan-out, 4 BIGINT columns), so its materialized size is knowable
    from the part parquet FOOTER before planning — |part rows| x 4
    rows x ~48 B (4 longs + row overhead). Catalyst can't see this
    (the derivation goes through an explode + cross of a one-row
    agg, which blinds its size estimate to "unknown/huge"), so the
    plan layer makes the call the optimizer would make with stats:
    broadcast under the session's default autoBroadcastJoinThreshold
    (10 MB), shuffle otherwise. TPC-H scales part linearly with SF —
    at 100 TB this returns False and the (partkey, suppkey) shuffle
    join stands; AQE (on above auto_aqe's local threshold, and always
    on a real cluster) re-derives the
    same decision at runtime for mid scales. Metadata-only read,
    memoized per path."""
    return _part_rows_cached(os.path.abspath(sf_dir)) * 4 * 48 < threshold_bytes


@_functools.lru_cache(maxsize=64)
def _part_rows_cached(sf_dir: str) -> int:
    try:
        import pyarrow.parquet as pq

        path = os.path.join(sf_dir, "part.parquet")
        if os.path.isdir(path):
            return sum(
                pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return 1 << 62  # unknown size -> never broadcast (fail safe)


def q103_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit — the widest join in the
    suite (lineitem ⋈ part ⋈ partsupp ⋈ supplier ⋈ nation ⋈ orders),
    profit = revenue minus supply cost, per supplier nation and order
    year.

    Scale notes: the name-filtered part keys broadcast and prune BOTH
    the fact scan and the partsupp derivation before the (partkey,
    suppkey) join — that join's strategy is the stats-driven
    `_partsupp_fits_broadcast` call (partsupp is fact-sized at real
    scale — 4x |part|, which TPC-H scales with SF — so it shuffles
    there; at dim-ish sizes the footer stats prove it broadcastable
    and the lineitem side never shuffles at all; measured at sf0.1
    warm: 1.30 -> 0.92 s); orders joins on the orderkey shuffle;
    supplier→nation are broadcast dims.
    Determinism: amount = exact integer 1e-4 units — revenue as
    price_cents x (100 - disc_cents), cost as the derived integer
    supplycost cents x integer quantity cents — through the two-level
    `exact_money_aggs` scheme (same staging in the oracle); one cast
    to double at output."""
    from data_warehouse_nhom8_spark.operators.aggregates import (
        cents,
        exact_money_aggs,
    )

    c = Catalog(spark, sf_dir)
    part = c.part.filter(F.col("p_name").like("%r%")).select("p_partkey")
    ps = derived_partsupp(c).join(
        F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey")
    ).select("ps_partkey", "ps_suppkey", "ps_supplycost_cents")
    li = c.lineitem.join(
        F.broadcast(part.select(F.col("p_partkey").alias("__pk"))),
        F.col("l_partkey") == F.col("__pk"),
    ).select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount")
    amount_e4 = cents("l_extendedprice") * (100 - cents("l_discount")) - F.col(
        "ps_supplycost_cents"
    ) * cents("l_quantity")
    if _partsupp_fits_broadcast(c.sf_dir):
        ps = F.broadcast(ps)
    joined = (
        li.join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(c.orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.supplier.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c.nation.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", F.year(F.to_date("o_orderdate")).cast("long"))
    )
    return (
        exact_money_aggs(joined, ["n_name", "o_year"], {"sum_profit": (amount_e4, 1e4)})
        .orderBy("n_name", F.desc("o_year"))
    )


def q104_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: parts/supplier relationship — DISTINCT supplier
    count per (brand, type, size) over filtered parts, EXCLUDING a
    supplier denylist via LEFT ANTI join (Q16's NOT IN subquery, which
    must compile to one anti join — never a per-row membership probe).

    Scale notes: part filters push to the scan feeding the derivation;
    the denylist is name-pattern-derived, dim-sized, broadcast for the
    anti join; count(DISTINCT) shuffles once on the group keys."""
    c = Catalog(spark, sf_dir)
    part = c.part.filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 5, 11, 17, 23, 29, 35, 41, 47))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    excluded = c.supplier.filter(F.col("s_name").like("%7")).select("s_suppkey")
    return (
        derived_partsupp(c)
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(excluded), F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q105_excess_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: excess-inventory suppliers — suppliers in one
    region holding more than half a year's shipped quantity of some
    name-prefixed part (the nested EXISTS-with-correlated-agg,
    decorrelated to one per-(part,supplier) aggregate + key join).

    Scale notes: the 'small%' prefix pushes to the part scan
    (StartsWith PushedFilter) and prunes both the fact agg and the
    derivation via broadcast; the correlated `0.5 * SUM(l_quantity)`
    is ONE grouped aggregate joined back on (partkey, suppkey) — no
    per-row subquery; the final supplier restriction is a LEFT SEMI
    against the qualifying keys. Threshold compare: exact decimal sum
    cast to double, one IEEE multiply."""
    c = Catalog(spark, sf_dir)
    part = c.part.filter(F.col("p_name").like("small%")).select("p_partkey")
    shipped = (
        c.lineitem.filter(
            (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.to_date("l_shipdate") < F.lit("1998-01-01").cast("date"))
        )
        .join(F.broadcast(part.select(F.col("p_partkey").alias("__pk"))), F.col("l_partkey") == F.col("__pk"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("__qty"))
    )
    ps = derived_partsupp(c).join(
        F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey")
    )
    if _partsupp_fits_broadcast(c.sf_dir):
        # footer stats prove the pruned derivation dim-sized: the
        # grouped shipped agg then never shuffles a second time for
        # the (partkey, suppkey) join (see _partsupp_fits_broadcast)
        ps = F.broadcast(ps)
    excess = (
        ps.join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty").cast("double") > 0.5 * F.col("__qty"))
        .select("ps_suppkey")
    )
    asia_nations = c.nation.join(
        F.broadcast(c.region.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    return (
        c.supplier.join(
            F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


TPCH_QUERIES = {
    "q46_pricing_summary": q46_pricing_summary,
    "q47_shipping_priority": q47_shipping_priority,
    "q48_local_supplier_volume": q48_local_supplier_volume,
    "q71_late_shipment_priority": q71_late_shipment_priority,
    "q72_promo_revenue": q72_promo_revenue,
    "q73_large_volume_customer": q73_large_volume_customer,
    "q74_top_supplier": q74_top_supplier,
    "q75_dormant_customer_value": q75_dormant_customer_value,
    "q76_moving_avg_order_value": q76_moving_avg_order_value,
    "q77_returned_item_revenue": q77_returned_item_revenue,
    "q86_forecast_revenue": q86_forecast_revenue,
    "q87_volume_shipping": q87_volume_shipping,
    "q88_market_share": q88_market_share,
    "q89_priority_line_mix": q89_priority_line_mix,
    "q90_customer_order_distribution": q90_customer_order_distribution,
    "q91_small_quantity_revenue": q91_small_quantity_revenue,
    "q92_disjunctive_predicate_revenue": q92_disjunctive_predicate_revenue,
    "q93_waiting_supplier": q93_waiting_supplier,
    "q101_min_cost_supplier": q101_min_cost_supplier,
    "q102_important_stock": q102_important_stock,
    "q103_product_profit": q103_product_profit,
    "q104_supplier_part_count": q104_supplier_part_count,
    "q105_excess_inventory": q105_excess_inventory,
}

TPCH_ORACLES = {
    "q46_pricing_summary": """
        WITH s AS (
          SELECT l_returnflag, l_linestatus,
                 CAST(ROUND(l_quantity * 100) AS BIGINT) AS qty_c,
                 CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
                 CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_c,
                 CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_c
          FROM lineitem WHERE date_trunc('day', l_shipdate) <= DATE '2000-06-01'
        )
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(qty_c) AS DOUBLE) / 100.0 AS sum_qty,
               CAST(SUM(price_c) AS DOUBLE) / 100.0 AS sum_base_price,
               CAST(SUM(price_c * (100 - disc_c)) AS DOUBLE) / 10000.0 AS sum_disc_price,
               CAST(SUM(price_c * (100 - disc_c) * (100 + tax_c)) AS DOUBLE) / 1000000.0 AS sum_charge,
               ROUND(CAST(SUM(qty_c) AS DOUBLE) / 100.0 / COUNT(*), 2) AS avg_qty,
               ROUND(CAST(SUM(price_c) AS DOUBLE) / 100.0 / COUNT(*), 2) AS avg_price,
               ROUND(CAST(SUM(disc_c) AS DOUBLE) / 100.0 / COUNT(*), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM s
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "q47_shipping_priority": """
        SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS DOUBLE)
                 / 10000.0 AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND date_trunc('day', o.o_orderdate) < DATE '1998-01-01'
          AND date_trunc('day', l.l_shipdate) > DATE '1998-01-01'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey LIMIT 10
    """,
    "q48_local_supplier_volume": """
        SELECT n.n_name,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS DOUBLE)
                 / 10000.0 AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND date_trunc('day', o.o_orderdate) >= DATE '1996-01-01'
          AND date_trunc('day', o.o_orderdate) < DATE '1998-01-01'
        GROUP BY n.n_name ORDER BY revenue DESC, n.n_name NULLS FIRST
    """,
    "q71_late_shipment_priority": """
        SELECT o.o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE date_trunc('day', o.o_orderdate) >= DATE '1996-01-01'
          AND date_trunc('day', o.o_orderdate) < DATE '1997-01-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND date_trunc('day', l.l_shipdate) >
                  date_trunc('day', o.o_orderdate) + INTERVAL 60 DAY
          )
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority NULLS FIRST
    """,
    "q72_promo_revenue": """
        WITH s AS (
          SELECT CASE WHEN p.p_type = 'PROMO'
                      THEN CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                           * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                      ELSE 0 END AS promo_e4,
                 CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)) AS total_e4
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE date_trunc('day', l.l_shipdate) >= DATE '1997-01-01'
            AND date_trunc('day', l.l_shipdate) < DATE '1998-01-01'
        )
        SELECT CAST(SUM(promo_e4) AS DOUBLE) / 10000.0 AS promo_revenue,
               CAST(SUM(total_e4) AS DOUBLE) / 10000.0 AS total_revenue,
               (100.0 * (CAST(SUM(promo_e4) AS DOUBLE) / 10000.0))
                 / (CAST(SUM(total_e4) AS DOUBLE) / 10000.0) AS promo_pct
        FROM s
    """,
    "q73_large_volume_customer": """
        WITH big AS (
          SELECT l_orderkey,
                 CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 > 300.0
        )
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice, b.sum_qty
        FROM big b
        JOIN orders o ON b.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
    """,
    "q74_top_supplier": """
        WITH rev AS (
          SELECT l_suppkey,
                 CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE)
                   / 10000.0 AS total_revenue
          FROM lineitem
          WHERE date_trunc('day', l_shipdate) >= DATE '1997-01-01'
            AND date_trunc('day', l_shipdate) < DATE '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
        ORDER BY s.s_suppkey
    """,
    "q75_dormant_customer_value": """
        SELECT c.c_mktsegment,
               COUNT(*) AS n_custs,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        FROM customer c
        WHERE c.c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
            FROM customer WHERE c_acctbal > 0
          )
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND date_trunc('day', o.o_orderdate) >= DATE '2000-01-01'
          )
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment NULLS FIRST
    """,
    "q76_moving_avg_order_value": """
        SELECT o_orderkey, o_custkey, o_orderdate,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
                 / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                 AS moving_avg_price
        FROM orders
        ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    "q77_returned_item_revenue": """
        SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS DOUBLE)
                 / 10000.0 AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND date_trunc('day', o.o_orderdate) >= DATE '1998-01-01'
          AND date_trunc('day', o.o_orderdate) < DATE '1999-01-01'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
    "q86_forecast_revenue": """
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE)
                 / 10000.0 AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE date_trunc('day', l_shipdate) >= DATE '1997-01-01'
          AND date_trunc('day', l_shipdate) < DATE '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q87_volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l.l_shipdate) AS l_year,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS DOUBLE)
                 / 10000.0 AS revenue
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE n1.n_name IN ('NATION_1', 'NATION_2')
          AND n2.n_name IN ('NATION_1', 'NATION_2')
          AND n1.n_name <> n2.n_name
          AND date_trunc('day', l.l_shipdate) >= DATE '1996-01-01'
          AND date_trunc('day', l.l_shipdate) < DATE '1998-01-01'
        GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l.l_shipdate)
        ORDER BY supp_nation NULLS FIRST, cust_nation NULLS FIRST, l_year
    """,
    "q88_market_share": """
        SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
               CAST(SUM(CASE WHEN ns.n_name = 'NATION_2'
                             THEN CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                                  * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                             ELSE 0 END) AS DOUBLE) / 10000.0 AS nation_volume,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS DOUBLE)
                 / 10000.0 AS total_volume,
               (CAST(SUM(CASE WHEN ns.n_name = 'NATION_2'
                             THEN CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                                  * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                             ELSE 0 END) AS DOUBLE) / 10000.0)
                 / (CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS DOUBLE)
                    / 10000.0) AS mkt_share
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        JOIN region r ON nc.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation ns ON s.s_nationkey = ns.n_nationkey
        WHERE p.p_type = 'ECONOMY' AND r.r_name = 'ASIA'
          AND date_trunc('day', o.o_orderdate) >= DATE '1996-01-01'
          AND date_trunc('day', o.o_orderdate) < DATE '1998-01-01'
        GROUP BY EXTRACT(year FROM o.o_orderdate)
        ORDER BY o_year
    """,
    "q89_priority_line_mix": """
        SELECT l.l_linestatus,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE date_trunc('day', l.l_shipdate) >= DATE '1997-01-01'
          AND date_trunc('day', l.l_shipdate) < DATE '1998-01-01'
        GROUP BY l.l_linestatus
        ORDER BY l.l_linestatus NULLS FIRST
    """,
    "q90_customer_order_distribution": """
        WITH per_cust AS (
          SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM per_cust
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q91_small_quantity_revenue": """
        WITH pruned AS (
          SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE p.p_brand = 'Brand#3' AND p.p_size < 10
        ), avg_q AS (
          SELECT l_partkey AS avg_pk,
                 CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
                   / COUNT(*) AS avg_qty
          FROM pruned GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(ROUND(pr.l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
                 / 7.0 AS avg_yearly,
               COUNT(*) AS n_lines
        FROM pruned pr JOIN avg_q a ON pr.l_partkey = a.avg_pk
        WHERE pr.l_quantity < 0.2 * a.avg_qty
    """,
    "q92_disjunctive_predicate_revenue": """
        SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
    """,
    "q93_waiting_supplier": """
        WITH late AS (
          SELECT l.l_orderkey, l.l_suppkey
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE date_trunc('day', l.l_shipdate) >
                date_trunc('day', o.o_orderdate) + INTERVAL 90 DAY
        )
        SELECT s.s_name, COUNT(*) AS numwait
        FROM late l1
        JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name LIMIT 20
    """,
    "q101_min_cost_supplier": f"""
        WITH {_PARTSUPP_SQL},
        cand AS (
          SELECT s.s_acctbal, s.s_name, n.n_name, ps.ps_partkey,
                 ps.ps_supplycost_cents, ps.ps_supplycost,
                 MIN(ps.ps_supplycost_cents) OVER (PARTITION BY ps.ps_partkey) AS min_cents
          FROM partsupp ps
          JOIN part p ON ps.ps_partkey = p.p_partkey
                     AND p.p_type = 'STANDARD' AND p.p_size < 16
          JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, ps_partkey, ps_supplycost
        FROM cand WHERE ps_supplycost_cents = min_cents
        ORDER BY s_acctbal DESC, s_name, ps_partkey
        LIMIT 100
    """,
    "q102_important_stock": f"""
        WITH {_PARTSUPP_SQL},
        per_part AS (
          SELECT ps.ps_partkey,
                 SUM(ps.ps_supplycost_cents * ps.ps_availqty) AS value_cents
          FROM partsupp ps
          WHERE ps.ps_suppkey IN (
            SELECT s.s_suppkey FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = 'NATION_7'
          )
          GROUP BY ps.ps_partkey
        ),
        tot AS (
          SELECT ps_partkey, value_cents,
                 SUM(value_cents) OVER () AS total_cents,
                 COUNT(*) OVER () AS n_parts
          FROM per_part
        )
        SELECT ps_partkey, CAST(value_cents AS DOUBLE) / 100.0 AS stock_value
        FROM tot
        WHERE CAST(value_cents AS DOUBLE) > CAST(total_cents AS DOUBLE) / n_parts * 1.5
        ORDER BY stock_value DESC, ps_partkey
    """,
    "q103_product_profit": f"""
        WITH {_PARTSUPP_SQL}
        SELECT n.n_name, EXTRACT(year FROM o.o_orderdate) AS o_year,
               CAST(SUM(
                 CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                 - ps.ps_supplycost_cents * CAST(ROUND(l.l_quantity * 100) AS BIGINT)
               ) AS DOUBLE) / 10000.0 AS sum_profit
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%r%'
        JOIN partsupp ps ON l.l_partkey = ps.ps_partkey AND l.l_suppkey = ps.ps_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
        ORDER BY n.n_name NULLS FIRST, o_year DESC
    """,
    "q104_supplier_part_count": f"""
        WITH {_PARTSUPP_SQL}
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
        FROM partsupp ps
        JOIN part p ON ps.ps_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#5'
          AND p.p_type NOT LIKE 'PROMO%'
          AND p.p_size IN (1, 5, 11, 17, 23, 29, 35, 41, 47)
          AND ps.ps_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand NULLS FIRST,
                 p.p_type NULLS FIRST, p.p_size
    """,
    "q105_excess_inventory": f"""
        WITH {_PARTSUPP_SQL},
        shipped AS (
          SELECT l.l_partkey, l.l_suppkey,
                 CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE 'small%'
          WHERE date_trunc('day', l.l_shipdate) >= DATE '1997-01-01'
            AND date_trunc('day', l.l_shipdate) < DATE '1998-01-01'
          GROUP BY l.l_partkey, l.l_suppkey
        )
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        WHERE s.s_suppkey IN (
          SELECT ps.ps_suppkey
          FROM partsupp ps
          JOIN part p ON ps.ps_partkey = p.p_partkey AND p.p_name LIKE 'small%'
          JOIN shipped sh ON ps.ps_partkey = sh.l_partkey
                         AND ps.ps_suppkey = sh.l_suppkey
          WHERE CAST(ps.ps_availqty AS DOUBLE) > 0.5 * sh.qty
        )
        ORDER BY s.s_suppkey
    """,
}
