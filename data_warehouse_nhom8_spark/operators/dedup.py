"""Keyed upsert + duplicate handling (SURVEY.md §2i, D1/D3/D4).

The reference's upsert is MySQL ``INSERT ... ON DUPLICATE KEY UPDATE``
on ``UNIQUE(job_id)`` (reference staging/staging_transformer_v2.py:134-151,
key at staging/init_staging_db_v2.sql:69): last writer wins. On Spark
that is a snapshot merge: union(current, incoming), rank by
(key, recency) with incoming preferred, keep rank 1, rewrite the
snapshot.

Scale: one shuffle on the key; the snapshot table should be written
bucketed/partitioned by the key's hash range so repeated daily merges
shuffle only the increment (see pipeline.staging).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def upsert_last_writer_wins(
    current: DataFrame | None,
    incoming: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column] = (),
) -> DataFrame:
    """Merge `incoming` into `current`, newest version per key wins (D1).

    `order_by` breaks ties *within* each side (e.g. latest
    extracted_date first); between sides, incoming always beats
    current — the ON DUPLICATE KEY UPDATE semantics.
    """
    inc = incoming.withColumn("__src", F.lit(1))
    if current is None:
        union = inc
    else:
        union = current.withColumn("__src", F.lit(0)).unionByName(inc)
    w = Window.partitionBy(*keys).orderBy(F.desc("__src"), *order_by)
    return (
        union.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def upsert_keyed_join(
    current: DataFrame | None,
    incoming: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column] = (),
    broadcast: bool = True,
) -> DataFrame:
    """Exact twin of `upsert_last_writer_wins` with a JOIN-shaped plan
    — the production merge for bucketed snapshots (pytest-gated
    equivalence in tests/test_upsert_scd2.py).

    Why a second formulation exists: the window form unions current
    with the increment and ranks the WHOLE table on the key — one full
    shuffle of the snapshot per daily merge, every day, forever. This
    form dedups the increment alone (window over increment-scale
    rows), then keeps `current` rows via one BROADCAST LEFT ANTI join
    on the keys: the snapshot side never shuffles, and over a bucketed
    snapshot (sources.snapshots bucket_by) the whole merge plan is
    Exchange-free on the table side. At 100 TB: cost is O(increment)
    shuffle + one table stream, vs O(table) shuffle for the window
    form.

    Contract: `current` must be unique per key (the invariant every
    upsert output maintains). The window form additionally dedups an
    unhealthy current; this form preserves it — feed it snapshots,
    not raw data.

    `broadcast=False` drops the hint for increment sizes past
    broadcast limits (a month-long backfill day, a bulk import):
    the anti join then sorts/merges — over a BUCKETED snapshot the
    table side still never shuffles (the scan carries the hash
    distribution), so only the increment moves either way."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        *(order_by or [F.lit(1)])
    )
    inc = (
        incoming.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if current is None:
        return inc
    inc_keys = inc.select(*keys)
    if broadcast:
        inc_keys = F.broadcast(inc_keys)
    kept = current.join(inc_keys, on=list(keys), how="left_anti")
    return kept.unionByName(inc.select(*current.columns))


def insert_ignore(current: DataFrame, incoming: DataFrame, keys: Sequence[str]) -> DataFrame:
    """`mysqldump --insert-ignore` replay semantics (D3): existing keys
    win, duplicates within the increment are dropped arbitrarily."""
    fresh = incoming.dropDuplicates(list(keys)).join(
        current.select(*keys), on=list(keys), how="left_anti"
    )
    return current.unionByName(fresh)


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Duplicate detection (D4): keys occurring more than once, with
    counts — the `sort | uniq -d` CSV check (extract doc §7)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
