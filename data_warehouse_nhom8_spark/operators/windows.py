"""Window / top-k operators (SURVEY.md §2e).

The reference's `ORDER BY ... DESC LIMIT 1` latest-row lookup
(reference extract/run_topcv_scraper_with_retry.sh:186-190) is the
row_number-rank-1 pattern; `ORDER BY ... LIMIT k` status views
(reference extract/check_scraper_status.sh:53-66) are Spark's
`TakeOrderedAndProject` (no global sort materialized — each partition
keeps k rows, the driver merges; survives any data size as long as k
is small).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    rank_col: str = "__rn",
) -> DataFrame:
    """One row per key, first under `order_by` (W1 / D1 dedup core).

    Shuffles once on `keys`; at scale prefer this over
    `dropDuplicates` when the *which row wins* tiebreak matters
    (dropDuplicates keeps an arbitrary row).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) == 1)
        .drop(rank_col)
    )


def topk(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k by composite sort (W2) — TakeOrderedAndProject."""
    return df.orderBy(*order_by).limit(k)
