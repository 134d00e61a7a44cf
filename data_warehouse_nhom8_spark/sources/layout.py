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


# --------------------------------------------------------------------------
# File-level data skipping: a min/max stats manifest over a version dir —
# the read-side payoff of z-clustering. Table formats keep exactly this in
# their metadata layer (Iceberg manifest files' lower_bounds/upper_bounds,
# Delta's stats JSON in the transaction log); on plain parquet Spark can
# only prune ROW GROUPS after opening every footer, so at 100 TB a
# selective query still pays one footer round-trip per file. The manifest
# collapses that to one control-plane read, and lets the planner drop
# files before the scan is even constructed.

_MANIFEST = "_STATS.json"


def _stat_to_jsonable(v):
    """Parquet footer stats → (kind, comparable JSON scalar).
    Timestamps/dates become epoch micros/days so comparison is numeric
    and timezone-free; the KIND tag makes bound conversion unambiguous
    at prune time (a raw numeric compare of micros vs days would
    silently over-prune). Bytes (undecodable) are rejected → the
    column gets no stats and its files are never skipped (fail-open)."""
    import datetime

    if isinstance(v, datetime.datetime):
        epoch = datetime.datetime(1970, 1, 1, tzinfo=v.tzinfo)
        return "ts", (v - epoch) // datetime.timedelta(microseconds=1)
    if isinstance(v, datetime.date):
        return "date", (v - datetime.date(1970, 1, 1)).days
    if isinstance(v, bool):
        raise TypeError(type(v))
    if isinstance(v, (int, float)):
        return "num", v
    if isinstance(v, str):
        return "str", v
    raise TypeError(type(v))


def _bound_to_comparable(v, kind: str | None, side: str = "lo"):
    """User-supplied predicate bound → the stored column's comparable
    space, driven by the column's stats KIND (so a date bound prunes a
    timestamp column correctly and vice versa). `side` matters for
    widening conversions: a DATE used as the UPPER bound of a
    TIMESTAMP range must cover the WHOLE day (end-of-day micros) —
    midnight would over-prune files holding later-in-the-day rows.
    Returns None when the bound cannot be safely compared against this
    kind — the caller must then KEEP the file (data skipping fails
    open, never wrong)."""
    import datetime

    if kind == "ts":
        if isinstance(v, datetime.datetime):
            return _stat_to_jsonable(v)[1]
        if isinstance(v, datetime.date):
            micros = _stat_to_jsonable(
                datetime.datetime(v.year, v.month, v.day)
            )[1]
            if side == "hi":  # conservative: whole day inside the bound
                return micros + 24 * 3600 * 1_000_000 - 1
            return micros
        return None
    if kind == "date":
        if isinstance(v, datetime.datetime):
            return (v.date() - datetime.date(1970, 1, 1)).days
        if isinstance(v, datetime.date):
            return (v - datetime.date(1970, 1, 1)).days
        return None
    if kind == "num":
        return v if isinstance(v, (int, float)) and not isinstance(v, bool) else None
    if kind == "str":
        return v if isinstance(v, str) else None
    return None


# Per-file Bloom filters for POINT-lookup skipping: min/max ranges
# prune range predicates on clustered columns, but an equality probe on
# a high-cardinality unclustered key (job_id, user_id) intersects every
# file's [min, max]. A small per-file Bloom answers "does this file
# possibly contain v?" with no false negatives — Delta's bloom-filter
# index / Iceberg's puffin blobs, folded into the same _STATS.json.
# Integer key columns only (the vectorized splitmix64 path); others are
# simply not bloom-indexed and never skipped on points (fail-open).

_B64_MASK = (1 << 64) - 1


def _splitmix64_np(x):
    import numpy as np

    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _splitmix64_py(x: int) -> int:
    x &= _B64_MASK
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _B64_MASK
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _B64_MASK
    x ^= x >> 31
    return x


def _bloom_params(n: int, fpp: float) -> tuple[int, int]:
    import math

    n = max(1, n)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 63) // 64 * 64  # whole words
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _bloom_build(values, fpp: float) -> dict:
    """values: integer numpy array (de-duplicated by the caller)."""
    import base64

    import numpy as np

    m, k = _bloom_params(len(values), fpp)
    h1 = _splitmix64_np(values.astype(np.uint64))
    h2 = _splitmix64_np(values.astype(np.uint64) ^ np.uint64(0x9E3779B97F4A7C15))
    h2 |= np.uint64(1)  # odd, so the double-hash cycle covers m
    bits = np.zeros(m // 64, dtype=np.uint64)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
        word, bit = idx >> np.uint64(6), idx & np.uint64(63)
        np.bitwise_or.at(bits, word.astype(np.int64), np.uint64(1) << bit)
    return {
        "m": m,
        "k": k,
        # explicit little-endian words: the probe indexes bytes as
        # raw[word*8 + (bit>>3)], which is only valid for '<u8' layout
        "bits": base64.b64encode(bits.astype("<u8").tobytes()).decode("ascii"),
    }


def _bloom_maybe_contains(bloom: dict, value: int) -> bool:
    import base64

    raw = base64.b64decode(bloom["bits"])
    m, k = bloom["m"], bloom["k"]
    h1 = _splitmix64_py(value)
    h2 = _splitmix64_py(value ^ 0x9E3779B97F4A7C15) | 1
    for i in range(k):
        # wrap to 64 bits BEFORE the modulo — the numpy build side does
        # uint64 wraparound addition, unbounded python ints would not
        idx = ((h1 + i * h2) & _B64_MASK) % m
        word = idx >> 6
        byte = raw[word * 8 + ((idx & 63) >> 3)]
        if not (byte >> ((idx & 63) & 7)) & 1:
            return False
    return True


def write_stats_manifest(
    vdir: str,
    cols: list[str],
    bloom_cols: list[str] | None = None,
    bloom_fpp: float = 0.01,
) -> dict:
    """Collect per-file min/max for `cols` from parquet FOOTERS (no data
    is read — the stats were already computed by the writing executors)
    and persist them atomically as `_STATS.json` in the version dir.

    Driver cost is O(files × cols) scalars — control-plane sized, the
    same budget as a table format's manifest. Columns whose stats are
    absent or non-serializable are recorded as null (those files are
    kept by the pruner: data skipping must fail open).

    `bloom_cols` additionally builds a per-file BLOOM filter for each
    named INTEGER column (point-lookup skipping — see module note).
    Unlike the footer stats this reads the named columns' data (column-
    pruned), so it belongs in the same maintenance window as the
    compaction rewrite it usually follows; ~10 bits/distinct value at
    the default 1% fpp."""
    import json
    import os

    import pyarrow.parquet as pq

    manifest: dict[str, dict] = {}
    blooms: dict[str, dict] = {}
    for name in sorted(os.listdir(vdir)):
        if not name.endswith(".parquet"):
            continue
        pf = pq.ParquetFile(os.path.join(vdir, name))
        if bloom_cols:
            import numpy as np

            per_bloom: dict[str, dict] = {}
            avail = set(pf.schema_arrow.names)
            for c in bloom_cols:
                if c not in avail:
                    continue
                arr = pf.read(columns=[c]).column(c)
                try:
                    vals = np.unique(arr.to_numpy(zero_copy_only=False))
                    if vals.dtype.kind == "f":
                        # nullable int columns surface as float64 with
                        # NaN for null — strip nulls, recover the ints
                        vals = vals[~np.isnan(vals)]
                        if not np.all(vals == np.floor(vals)):
                            raise TypeError(vals.dtype)
                        vals = vals.astype(np.int64)
                    if vals.dtype.kind not in ("i", "u"):
                        raise TypeError(vals.dtype)
                except (TypeError, ValueError):
                    continue  # non-integer column: no bloom, fail open
                per_bloom[c] = _bloom_build(vals, bloom_fpp)
            if per_bloom:
                blooms[name] = per_bloom
        md = pf.metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        per_col: dict[str, list | None] = {}
        for c in cols:
            if c not in idx:
                per_col[c] = None
                continue
            mn = mx = kind = None
            ok = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                try:
                    klo, lo = _stat_to_jsonable(st.min)
                    khi, hi = _stat_to_jsonable(st.max)
                except TypeError:
                    ok = False
                    break
                if klo != khi or (kind is not None and kind != klo):
                    ok = False
                    break
                kind = klo
                mn = lo if mn is None or lo < mn else mn
                mx = hi if mx is None or hi > mx else mx
            per_col[c] = [mn, mx, kind] if ok and mn is not None else None
        manifest[name] = per_col
    payload = {"columns": cols, "files": manifest, "blooms": blooms}
    tmp = os.path.join(vdir, _MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, os.path.join(vdir, _MANIFEST))
    return payload


def read_stats_manifest(vdir: str) -> dict | None:
    import json
    import os

    try:
        with open(os.path.join(vdir, _MANIFEST)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def prune_files(
    vdir: str, ranges: dict, points: dict | None = None
) -> tuple[list[str], int]:
    """File paths whose stats MAY satisfy every range in `ranges`
    ({col: (lo, hi)}, either bound None for open) AND every equality
    probe in `points` ({col: value} — checked against the per-file
    Bloom when one exists), plus the total file count. Files without
    usable stats/blooms for a predicate column are kept (fail-open).
    With no manifest, everything is kept — the result is always a
    superset of the matching files (Blooms have no false negatives),
    so a residual filter on the returned scan yields exactly the
    full-scan answer."""
    import os

    points = points or {}
    all_files = sorted(
        os.path.join(vdir, f) for f in os.listdir(vdir) if f.endswith(".parquet")
    )
    manifest = read_stats_manifest(vdir)
    if manifest is None or (not ranges and not points):
        return all_files, len(all_files)
    kept = []
    # bounds convert once per (column, kind) pair, not once per file
    bound_cache: dict = {}

    def conv(col, v, kind, side):
        key = (col, kind, side, id(v))
        if key not in bound_cache:
            bound_cache[key] = (
                None if v is None else _bound_to_comparable(v, kind, side)
            )
        return bound_cache[key]

    for path in all_files:
        stats = manifest["files"].get(os.path.basename(path), {})
        keep = True
        for col, (lo, hi) in ranges.items():
            s = stats.get(col)
            if s is None or len(s) < 3:
                continue  # no (typed) stats for this column: keep
            mn, mx, kind = s
            clo, chi = conv(col, lo, kind, "lo"), conv(col, hi, kind, "hi")
            # a bound that can't be converted to the column's stats
            # space is unusable — fail open on that side
            if clo is not None and mx < clo:
                keep = False
                break
            if chi is not None and mn > chi:
                keep = False
                break
        if keep and points:
            file_blooms = manifest.get("blooms", {}).get(
                os.path.basename(path), {}
            )
            for col, value in points.items():
                b = file_blooms.get(col)
                if b is None:
                    continue  # no bloom for this column: keep
                # multi-point probe (semi-join pruning): a list/set of
                # keys keeps the file iff ANY key may be present — the
                # file-skip shape of "scan only files that may hold a
                # candidate id". Non-integer members fail open.
                if isinstance(value, (list, tuple, set, frozenset)):
                    # EMPTY collection is a DECISION, not an any([])
                    # accident (ADVICE r10): a multi-point probe IS a
                    # semi-join — zero candidate keys means zero
                    # matching rows, so pruning every bloomed file is
                    # the correct (and cheapest) answer. Callers that
                    # mean "unknown candidates, scan everything" must
                    # pass None/omit the column, same as any other
                    # un-probeable value.
                    vals = [
                        v for v in value
                        if isinstance(v, int) and not isinstance(v, bool)
                    ]
                    if len(vals) != len(value):
                        continue  # non-integer probe member: keep
                    if not any(_bloom_maybe_contains(b, v) for v in vals):
                        keep = False
                        break
                    continue
                if not isinstance(value, int) or isinstance(value, bool):
                    continue  # non-integer probe: keep
                if not _bloom_maybe_contains(b, value):
                    keep = False
                    break
        if keep:
            kept.append(path)
    return kept, len(all_files)


# ---------------------------------------------------------------------------
# Hive-partitioned fact layout + dynamic partition pruning
# ---------------------------------------------------------------------------

def write_hive_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Write a fact as a Hive-partitioned parquet directory tree
    (`col=value/` subdirs) — the scan-path twin of the reference's
    `raw/source=X/date=Y/` CSV layout (extract/topcv_scraper_v5.py:
    198-202) applied to the warehouse fact itself.

    Why it matters at 100 TB: a partition column never reaches the data
    files — it is directory metadata — so two pruning paths apply:

    * STATIC partition pruning: a literal filter on the partition
      column selects subdirectories before any I/O is scheduled.
    * DYNAMIC partition pruning (DPP): when the filter lives on a
      JOINED dimension (`fact ⋈ date_dim WHERE dim.month = 5`),
      Catalyst injects a `dynamicpruning#` subquery into the fact
      scan's PartitionFilters: the dim side (broadcast) runs first,
      and only the fact partitions whose keys appear in the dim result
      are ever listed/read. This is the mechanism that makes the
      star-schema day-dimension filter — the reference's every
      datamart query (datamart/load_to_dm.py:127-139) — touch only
      matching day directories instead of the whole fact.

    Dynamic overwrite: with `mode="overwrite"` Spark's
    `partitionOverwriteMode=dynamic` session default (set in
    session.get_spark) replaces only the partitions present in `df` —
    the idempotent daily re-run contract of the reference's
    truncate-and-reload day partition, without touching other days.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_hive_partitioned(df_or_spark, path: str) -> DataFrame:
    """Read a Hive-partitioned tree; partition columns come back as
    real columns inferred from the directory names."""
    spark = df_or_spark if hasattr(df_or_spark, "read") else df_or_spark.sparkSession
    return spark.read.parquet(path)
