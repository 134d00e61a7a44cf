"""JDBC source/sink (SURVEY.md §2a S5/S6) — the reference reads and
writes MySQL everywhere (staging_transformer_v2.py:108,
datamart/load_to_dm.py:118-124, LoadToWH.java:115-125). The engine is
parquet-native, but the connector surface exists so a reference user
can point a job at their MySQL during migration.

No JDBC driver jar ships in this environment, so these are thin,
untested-against-a-live-DB wrappers; predicate pushdown, partitioned
reads, and batched writes are configured the way a production job
would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


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
    """Parallel JDBC scan. With `partition_column` (+bounds), Spark
    issues `num_partitions` range-partitioned queries instead of one
    giant serial read — mandatory beyond toy table sizes."""
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("fetchsize", "10000")
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound/upper_bound")
        r = (
            r.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return r.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    mode: str = "append",
    batchsize: int = 10000,
) -> None:
    """Batched JDBC sink (the executemany twin, staging_loader.py:85)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("batchsize", str(batchsize))
        .mode(mode)
        .save()
    )
