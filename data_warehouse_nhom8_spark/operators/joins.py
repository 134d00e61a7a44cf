"""Join operators (SURVEY.md §2c).

The reference's joins are MySQL joins under utf8mb4_unicode_ci —
case/accent-insensitive string keys (reference
loadtowh/create_warehouse_db.sql:19) — plus a hand-rolled broadcast
hash lookup (a date_dim dict probed per row, reference
staging/staging_transformer_v2.py:77-86) and SCD2's
equi-plus-residual change-detection join (reference
loadtowh/load_to_wh.sh:64-75).

Scale notes (100 TB):
- dimension lookups are *always* broadcast (`F.broadcast`) — a 7k-row
  date_dim must never shuffle a 100 TB fact;
- fact-fact joins shuffle on their equi keys; AQE skew-join handles
  hot keys, and `salted_join` is the explicit fallback for known-hot
  keys (e.g. a company_name that is 10% of all rows);
- anti/semi joins keep the probe side unprojected (Catalyst prunes to
  the key columns on the build side automatically).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.functions.cleaning import collation_key


def norm_key(col: Column | str) -> Column:
    """Collation-normalized join/group key — delegates to
    `functions.cleaning.collation_key` (Spark 4 native UNICODE_CI_AI:
    case- AND accent-insensitive, the exact utf8mb4_unicode_ci twin
    the reference's tables declare, create_warehouse_db.sql:19).

    One normalization helper for the whole engine: SCD2 keys, generic
    parity joins, and invariant checks all agree that
    'Hà Nội' == 'ha noi'.
    """
    return collation_key(col)


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column | str | Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Broadcast hash join of a fact against a small dimension (J2)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS (J5)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS (J4)."""
    return left.join(right, on=on, how="left_anti")


def changed_rows_condition(
    left_prefix: str,
    right_prefix: str,
    compare_cols: Sequence[str],
    null_safe: bool = True,
) -> Column:
    """Residual change-detection predicate for SCD2 (J3).

    The reference uses MySQL `<>`, which is NULL-unsafe: a NULL on
    either side makes the comparison unknown and the row is NOT
    treated as changed (reference loadtowh/load_to_wh.sh:70-74).
    Engine default is null-safe (`~(a <=> b)`: NULL → non-NULL counts
    as a change); ``null_safe=False`` replicates MySQL exactly.
    """
    parts = []
    for c in compare_cols:
        a, b = F.col(f"{left_prefix}.{c}"), F.col(f"{right_prefix}.{c}")
        parts.append(~a.eqNullSafe(b) if null_safe else a != b)
    cond = parts[0]
    for p in parts[1:]:
        cond = cond | p
    return cond


def salted_join(
    big: DataFrame,
    skewed: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: salt the big side, explode the other.

    For known-hot keys when AQE's runtime skew splitting isn't enough:
    `big` gets a deterministic per-row salt in [0, n_salts); `skewed`
    is replicated n_salts times; the join key becomes (key, salt), so
    one hot key spreads over n_salts reducers.

    The salt hashes the ROW (all columns), not the key alone (same-key
    rows must fan out) and never uses monotonically_increasing_id
    (partition-layout-dependent: retries/reruns would salt the same
    row differently, violating the engine's determinism-under-replay
    contract — see operators.scd2).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn("__salt", salt.cast("int"))
    rep = skewed.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = big_s.join(rep, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_time: str,
    right_time: str,
    payload_cols: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """As-of (event-time) join: every left row gets the payload of the
    LATEST right row with right_time <= left_time in its key group —
    the point-in-time lookup feature pipelines need (no Spark
    built-in; DuckDB's native ASOF JOIN is the oracle twin).

    Spark-first shape — union + running `last` window, ONE shuffle on
    (keys) and zero range explosion:
      * tag right rows 0 / left rows 1, union by name;
      * window per key ordered by (time, tag): a running
        last(non-null) of the right payload STRUCT carries the newest
        at-or-before right row onto each left row (right sorts before
        left at equal timestamps, so ties are inclusive);
      * keep left rows, unpack the struct.
    The payloads ride in ONE struct so a legitimately-NULL payload
    column is carried as NULL (a bare per-column last(ignorenulls)
    would skip past it to an older row).

    Right rows must be unique per (keys, right_time) — pre-aggregate
    if not; ties would otherwise be resolved by an unstable union
    order. Internal column names `__t`/`__is_l`/`__payload`/`__row`
    are reserved: neither input may carry them. At 100 TB this is a single hash-partition by key with a
    per-partition sort: the same cost class as any keyed window, and
    far cheaper than the naive range-join (left x right per key)."""
    keys = list(keys)
    payload_cols = list(payload_cols)
    l_tag = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_l"),
        F.lit(None).cast(
            right.select(F.struct(*payload_cols).alias("s")).schema["s"].dataType
        ).alias("__payload"),
        F.struct(*left.columns).alias("__row"),
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_l"),
        F.struct(*payload_cols).alias("__payload"),
        F.lit(None).cast(l_tag.schema["__row"].dataType).alias("__row"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t"), F.col("__is_l"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag).select(
        "__is_l",
        "__row",
        F.last("__payload", ignorenulls=True).over(w).alias("__p"),
    )
    out_cols = [F.col("__row")[c].alias(c) for c in left.columns] + [
        F.col("__p")[c].alias(f"{prefix}{c}") for c in payload_cols
    ]
    return filled.filter(F.col("__is_l") == 1).select(*out_cols)


def interval_range_join(
    events: DataFrame,
    intervals: DataFrame,
    time_col: str,
    start_col: str,
    end_col: str,
    bucket: Column | None = None,
    bucket_us: int = 6 * 3600 * 1_000_000,
) -> DataFrame:
    """Range (interval-containment) join: event rows matched to every
    interval with start <= t < end — without the cartesian product
    Spark plans for a raw inequality join.

    Scale shape: both sides map to fixed-width time buckets (each
    interval EXPLODES into the buckets it overlaps — ceil(len/width)
    rows, bounded and small when `bucket_us` ~ interval length), the
    join runs as a plain HASH equi-join on the bucket, and the exact
    range predicate filters residually inside matched buckets. An
    event's timestamp lives in exactly one bucket, so no dedup pass
    is needed. Pick `bucket_us` near the typical interval length:
    wider buckets → fewer interval replicas but more false candidates
    filtered residually; narrower → the reverse.

    Column names must be disjoint across the two inputs (besides the
    internal `__b` bucket): the residual filter re-references
    `time_col`/`start_col`/`end_col` by name after the join, so a
    shared name would be ambiguous — rename before joining."""
    t_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))
    ev = events.withColumn("__b", (t_us / bucket_us).cast("long"))
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                (s_us / bucket_us).cast("long"),
                ((e_us - 1) / bucket_us).cast("long"),
            )
        ),
    )
    joined = ev.join(iv, "__b")
    return joined.filter((t_us >= s_us) & (t_us < e_us)).drop("__b")
