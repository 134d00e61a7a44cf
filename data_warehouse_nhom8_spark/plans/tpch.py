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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.session import repartition_if_split_starved
from data_warehouse_nhom8_spark.sources import Catalog


def q46_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → partial agg → final agg, 8 metrics.

    Determinism: the sums run through DECIMAL internally (exact,
    order-independent at any parallelism) but the OUTPUT columns are
    cast to DOUBLE — DECIMAL output columns hash-mismatch in the
    driver gate (round-1 post-mortem). The exact-decimal → double
    conversion is a single correctly-rounded IEEE division while the
    unscaled sum stays below 2^53, so Spark and DuckDB agree bitwise.
    """
    c = Catalog(spark, sf_dir)
    li = c.lineitem.filter(F.to_date("l_shipdate") <= F.lit("2000-06-01").cast("date"))
    # the boxed-decimal partial agg is CPU-bound: don't let a
    # 3-row-group local file cap it at 3 cores (no-op at scale)
    li = repartition_if_split_starved(
        li.select(
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax",
        )
    )
    dec2 = lambda col: F.col(col).cast("decimal(18,2)")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(18,6)")
    cnt = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(F.sum(dec2("l_quantity")).cast("double") / cnt, 2).alias("avg_qty"),
            F.round(F.sum(dec2("l_extendedprice")).cast("double") / cnt, 2).alias("avg_price"),
            F.round(F.sum(dec2("l_discount")).cast("double") / cnt, 4).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q47_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join → agg → top-10 by revenue.

    Determinism: decimal sum internal, DOUBLE output (uniform no-
    DECIMAL-output contract; per-order sums are far below 2^53 so the
    conversion is bit-identical across engines)."""
    c = Catalog(spark, sf_dir)
    cust = c.customer.filter(F.col("c_mktsegment") == "BUILDING")
    orders = c.orders.filter(
        F.to_date("o_orderdate") < F.lit("1998-01-01").cast("date")
    )
    li = c.lineitem.filter(F.to_date("l_shipdate") > F.lit("1998-01-01").cast("date"))
    revenue = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    ).cast("double")
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

    Determinism: revenue sums through DECIMAL internally, output cast
    to DOUBLE (no DECIMAL output columns — round-1 hash-gate
    post-mortem; ordering key stays the exact decimal)."""
    c = Catalog(spark, sf_dir)
    revenue = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    ).cast("double")
    return (
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
        .groupBy("n_name")
        .agg(revenue.alias("revenue"))
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
    """TPC-H Q14 shape: promo revenue share — conditional DECIMAL sums
    over a broadcast fact⋈part join, one output row.

    Determinism: both sums are exact decimals cast to double; the pct
    is one IEEE multiply+divide on bit-identical inputs, so Spark and
    DuckDB agree bitwise without rounding."""
    c = Catalog(spark, sf_dir)
    li = c.lineitem.filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    joined = li.join(
        F.broadcast(c.part.select("p_partkey", "p_type")),
        li["l_partkey"] == F.col("p_partkey"),
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    ).cast("double")
    total = F.sum(disc_price).cast("double")
    return joined.agg(
        promo.alias("promo_revenue"),
        total.alias("total_revenue"),
        ((F.lit(100.0) * promo) / total).alias("promo_pct"),
    )


def q73_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume customers — agg-filter on the fact
    (HAVING sum(qty) > 300) BEFORE joining orders/customer, so the join
    input is the ~0.3% qualifying orders, not the raw fact.

    Scale notes: the groupBy(l_orderkey) partial-aggregates map-side;
    the >300 filter runs on the agg output (tiny), and both following
    joins shuffle only qualifying keys. The exact-decimal sum makes the
    threshold comparison engine-independent."""
    c = Catalog(spark, sf_dir)
    big = (
        c.lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"))
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

    Determinism: revenue is an exact decimal sum cast once to double on
    both engines, so the MAX-equality selects the identical supplier
    set even under ties.

    Scale notes: the naive Q15 (scalar subquery over the same agg)
    scans the fact TWICE — once for the per-supplier revenue, once for
    its max. The unpartitioned MAX window instead runs on the agg
    OUTPUT (one row per supplier), so the fact is scanned once; the
    single-partition window stage is over supplier cardinality, which
    is dim-sized, not fact-sized."""
    from pyspark.sql.window import Window

    c = Catalog(spark, sf_dir)
    rev = (
        c.lineitem.filter(
            (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.to_date("l_shipdate") < F.lit("1997-04-01").cast("date"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("total_revenue")
        )
    )
    mx = F.max("total_revenue").over(Window.partitionBy())
    return (
        rev.withColumn("__mx", mx)
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
    the moving sum runs through DECIMAL (exact, frame-order-
    independent) and divides by the frame count once in IEEE double —
    bitwise identical across engines. Scale notes: one shuffle on
    o_custkey; the frame is O(1) memory per row (sliding, bounded)."""
    from pyspark.sql.window import Window

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
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
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
    TakeOrderedAndProject (no global sort)."""
    c = Catalog(spark, sf_dir)
    li = c.lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = c.orders.filter(
        (F.to_date("o_orderdate") >= F.lit("1998-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1999-01-01").cast("date"))
    )
    revenue = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    ).cast("double")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(c.customer, F.col("o_custkey") == c.customer["c_custkey"])
        .join(F.broadcast(c.nation), F.col("c_nationkey") == c.nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
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
}

TPCH_ORACLES = {
    "q46_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2) AS avg_qty,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2) AS avg_price,
               ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem WHERE date_trunc('day', l_shipdate) <= DATE '2000-06-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "q47_shipping_priority": """
        SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
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
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
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
        SELECT
          CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                        THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
          CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
          (100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                        THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE))
            / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS promo_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE date_trunc('day', l.l_shipdate) >= DATE '1997-01-01'
          AND date_trunc('day', l.l_shipdate) < DATE '1998-01-01'
    """,
    "q73_large_volume_customer": """
        WITH big AS (
          SELECT l_orderkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300.0
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
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
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
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                 AS moving_avg_price
        FROM orders
        ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    "q77_returned_item_revenue": """
        SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
               CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
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
}
