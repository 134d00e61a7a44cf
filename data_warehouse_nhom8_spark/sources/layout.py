"""Data-layout clustering (z-order) for at-rest parquet — the
maintenance op Delta formalizes as OPTIMIZE ZORDER BY and Iceberg as
rewrite_data_files(sort_order=zorder(...)).

Why it matters at 100 TB: parquet scans prune with file/row-group
min-max statistics. A table sorted by one column prunes well on that
column and not at all on any other; interleaving the bits of k columns
into one z-value and range-partitioning on it makes every file cover a
small HYPER-RECTANGLE of the key space, so selective filters on ANY of
the clustered columns skip most files. The reference has no analogue
(MySQL B-trees serve its point lookups); this is the Spark-native
replacement for those secondary access paths.

Mechanics: each column is linearly scaled to a `bits`-wide integer
using its global min/max (one tiny agg — 2k scalars to the driver,
control-plane sized like the IVF centroid model), the scaled values
are bit-interleaved into a single long with native shift/and/or
expressions (whole-stage codegen, no UDF), and the rewrite is
`repartitionByRange` on the z-value + an in-partition sort. The
shuffle is inherent to re-clustering — the same cost OPTIMIZE ZORDER
pays — which is why it lives in the offline compaction path, not on
the write path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC_KINDS = (
    "tinyint", "smallint", "int", "bigint", "float", "double", "date",
    "timestamp", "timestamp_ntz", "decimal",
)


def _as_double(df: DataFrame, col: str) -> Column:
    kind = dict(df.dtypes)[col]
    base = kind.split("(")[0]
    if base not in _NUMERIC_KINDS:
        raise ValueError(
            f"zorder column {col!r} has type {kind}: z-ordering needs a "
            "range-comparable numeric/date/timestamp column (string "
            "buckets would destroy the range locality pruning relies on)"
        )
    c = F.col(col)
    if base in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(c.cast("timestamp")).cast("double")
    if base == "date":
        return F.datediff(c, F.lit("1970-01-01").cast("date")).cast("double")
    return c.cast("double")


def zorder_value_col(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """LongType z-value interleaving `bits` bits of each column's
    min-max-scaled rank. k·bits must fit a signed long (≤ 63). NULLs
    scale to bucket 0 (cluster together at the low edge)."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    if len(cols) * bits > 63:
        raise ValueError(
            f"{len(cols)} columns x {bits} bits = {len(cols) * bits} "
            "interleaved bits; must fit a signed long (<= 63) — lower "
            "`bits` or cluster fewer columns"
        )
    exprs = {c: _as_double(df, c) for c in cols}
    stats = df.agg(
        *[F.min(e).alias(f"mn_{c}") for c, e in exprs.items()],
        *[F.max(e).alias(f"mx_{c}") for c, e in exprs.items()],
    ).collect()[0]
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) if (mn is not None and mx is not None and mx > mn) else 1.0
        scaled = F.least(
            F.lit(top),
            F.greatest(
                F.lit(0),
                F.floor((exprs[c] - F.lit(float(mn or 0.0))) / F.lit(span) * top),
            ),
        ).cast("long")
        scaled = F.coalesce(scaled, F.lit(0))
        # spread column i's bits to positions i, i+k, i+2k, ...
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(scaled, b).bitwiseAND(F.lit(1)), b * len(cols) + i
            )
    return z


def cluster_by_zorder(
    df: DataFrame, cols: list[str], n_partitions: int, bits: int = 16
) -> DataFrame:
    """Rewrite-shape for z-clustered output: range-partition on the
    z-value (each output file covers one contiguous z range = one
    hyper-rectangle of the key space) and sort within partitions so
    row-group stats prune too."""
    z = zorder_value_col(df, cols, bits).alias("__z")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
