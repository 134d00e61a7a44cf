"""Bucketed managed tables — the co-located-join storage layout
(SURVEY.md §4: the Spark substitute for the reference's BTREE/UNIQUE
indexes, and the 100 TB answer to repeated joins on the same key).

Writing both sides of a recurring join bucketed (+ sorted) by the key
means later joins read co-located buckets: the physical plan has NO
Exchange on either side (test-gated in tests/test_tables_stateful.py;
measured 4.6x on the q73-core shape at the 60M-row probe — see
SCALE_NOTES.md). This is the natural layout for tables repeatedly
merged on their keys (staging snapshot, warehouse table) on a
deployment whose catalog serves bucketed tables; the engine's
versioned snapshots default to plain parquet for portability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed parquet table."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
