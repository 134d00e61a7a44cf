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


TPCH_QUERIES = {
    "q46_pricing_summary": q46_pricing_summary,
    "q47_shipping_priority": q47_shipping_priority,
    "q48_local_supplier_volume": q48_local_supplier_volume,
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
}
