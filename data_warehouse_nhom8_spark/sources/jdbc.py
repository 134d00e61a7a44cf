"""JDBC source/sink (SURVEY.md §2a S5/S6) — the reference reads and
writes MySQL everywhere (staging_transformer_v2.py:108,
datamart/load_to_dm.py:118-124, LoadToWH.java:115-125). The engine is
parquet-native, but the connector surface exists so a reference user
can point a job at their MySQL during migration.

The execution path is live-tested against embedded Derby (the JDBC
driver every Spark distribution ships for its Hive metastore):
batched writes, overwrite/append modes, range-partitioned parallel
reads, and predicate pushdown into the database (plan-gated on
PushedFilters) all run for real in tests/test_jdbc.py — a reference
user swaps in their MySQL URL with no code change. The
option-building contract is additionally factored into pure
functions (`jdbc_read_options` / `jdbc_write_options`) so a
misconfigured job fails fast python-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_read_options(
    url: str,
    table: str,
    user: str,
    password: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> dict[str, str]:
    """Options for a parallel JDBC scan. With `partition_column`
    (+bounds), Spark issues `num_partitions` range-partitioned queries
    instead of one giant serial read — mandatory beyond toy sizes."""
    opts = {
        "url": url,
        "dbtable": table,
        "user": user,
        "password": password,
        "fetchsize": "10000",
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound/upper_bound")
        opts.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
        )
    return opts


def jdbc_write_options(
    url: str, table: str, user: str, password: str, batchsize: int = 10000
) -> dict[str, str]:
    """Options for the batched JDBC sink (the executemany twin,
    staging_loader.py:85)."""
    return {
        "url": url,
        "dbtable": table,
        "user": user,
        "password": password,
        "batchsize": str(batchsize),
    }


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    opts = jdbc_read_options(
        url, table, user, password, partition_column, num_partitions,
        lower_bound, upper_bound,
    )
    return spark.read.format("jdbc").options(**opts).load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    mode: str = "append",
    batchsize: int = 10000,
) -> None:
    opts = jdbc_write_options(url, table, user, password, batchsize)
    df.write.format("jdbc").options(**opts).mode(mode).save()
