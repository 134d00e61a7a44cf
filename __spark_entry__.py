"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (smoke check at sf0.001).
``queries()`` — every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable.
``oracle_sql()`` — DuckDB twins; the driver hash-compares at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pricing-summary rollup (TPC-H-Q1 shape — the densest
    aggregate the engine plans: scan → partial agg → shuffle → final
    agg, money sums in DECIMAL internally so results are
    order-independent; outputs DOUBLE per the no-DECIMAL-output
    contract)."""
    from data_warehouse_nhom8_spark.sources import Catalog

    c = Catalog(spark, "/root/testdata/sf0.001")
    li = c.lineitem
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from data_warehouse_nhom8_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from data_warehouse_nhom8_spark.plans import ORACLES

    return dict(ORACLES)
