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
    agg). Money sums run as exact integer cents through
    `aggregates.exact_money_aggs` (partition-bounded LONG partials +
    DECIMAL(38,0) merge — order-independent at any parallelism, no
    boxed-decimal hot path); outputs DOUBLE per the no-DECIMAL-output
    contract."""
    from data_warehouse_nhom8_spark.operators.aggregates import (
        cents,
        exact_money_aggs,
    )
    from data_warehouse_nhom8_spark.sources import Catalog

    c = Catalog(spark, "/root/testdata/sf0.001")
    return (
        exact_money_aggs(
            c.lineitem,
            ["l_returnflag", "l_linestatus"],
            {
                "sum_qty": (cents("l_quantity"), 100.0),
                "sum_base_price": (cents("l_extendedprice"), 100.0),
                "sum_disc_price": (
                    cents("l_extendedprice") * (100 - cents("l_discount")),
                    1e4,
                ),
            },
            extra_partial={"count_order": F.count(F.lit(1))},
            extra_final={
                "avg_qty": F.round(F.col("sum_qty") / F.col("count_order"), 2)
            },
        )
        .select(
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "avg_qty", "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from data_warehouse_nhom8_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from data_warehouse_nhom8_spark.plans import ORACLES

    return dict(ORACLES)
