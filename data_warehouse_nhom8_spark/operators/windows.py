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


def funnel_counts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered funnel conversion: how many entities completed step 1,
    then step 2 STRICTLY AFTER their first step 1, then step 3 after
    that, ... — the product-analytics query (view → click → purchase)
    the reference's daily charts can't answer from plain GROUP BYs.

    Single scan, one shuffle: each step's first-qualifying timestamp
    is a per-entity window MIN over the previous step's timestamp
    (`MIN(CASE WHEN type=s AND ts > t_prev THEN ts END) OVER
    (PARTITION BY user)`), then one global conditional count-distinct
    per step. No self-joins of the event log (the naive funnel is a
    k-way self-join — unbounded at 100 TB); state per entity is k
    timestamps. Output: one row per step (step_index, step, n_users)
    with monotonically non-increasing counts.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col)
    d = events.select(user_col, ts_col, type_col)
    prev: Column | None = None
    t_cols = []
    for i, s in enumerate(steps):
        cond = F.col(type_col) == F.lit(s)
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
        t = F.min(F.when(cond, F.col(ts_col))).over(w)
        name = f"__t{i}"
        d = d.withColumn(name, t)
        prev = F.col(name)
        t_cols.append(name)
    aggs = [
        F.count_distinct(
            F.when(F.col(t).isNotNull(), F.col(user_col))
        ).alias(f"__n{i}")
        for i, t in enumerate(t_cols)
    ]
    row = d.agg(*aggs)
    steps_df = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).cast("long").alias("step_index"),
                        F.lit(s).alias("step"),
                        F.col(f"__n{i}").alias("n_users"),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("r")
    )
    return steps_df.select("r.step_index", "r.step", "r.n_users")
