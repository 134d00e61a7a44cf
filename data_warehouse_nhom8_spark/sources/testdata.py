"""Readers for the driver-generated parquet testdata.

One parquet file per table under ``{sf_dir}/{name}.parquet``
(TESTDATA.md). Readers always pass the explicit schema so a scan
never pays inference and column pruning works from the first plan.
"""

from __future__ import annotations

import os
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from data_warehouse_nhom8_spark import schemas


# Plan-reuse cache: repeated load_table calls in one session re-list
# files and re-resolve schemas (~50-100 ms per table per query at the
# bench's 49-query scale). DataFrames are immutable lazy plans, so
# sharing one per (session, sf_dir, table) is safe. Keyed by the
# session OBJECT in a WeakKeyDictionary — id(spark) can be recycled
# by CPython after GC, handing a new session DataFrames bound to a
# stopped one; weak keys also let entries die with their session
# instead of growing unbounded.
_df_cache: WeakKeyDictionary = WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a DataFrame (lazy; no action).

    ``events.ts`` has shipped in two vintages: parquet TIMESTAMP(NANOS)
    (which Spark's vectorized reader rejects — [PARQUET_TYPE_ILLEGAL] —
    so we read it as nanos-since-epoch under the legacy long mode and
    truncate to microseconds, matching DuckDB) and, since the testdata
    regeneration, plain TIMESTAMP(MICROS). The loader inspects the
    resolved type and handles either, normalizing to TIMESTAMP_NTZ.
    The other tables' ms timestamps arrive as TIMESTAMP_NTZ natively.
    """
    if name not in schemas.TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table: {name}")
    per_session = _df_cache.get(spark)
    if per_session is None:
        per_session = _df_cache[spark] = {}
    key = (sf_dir, name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, sf_dir, name)
    per_session[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # A table may be served from a versioned snapshot DIRECTORY
    # ({sf_dir}/{name}/, e.g. the bench's bucketed production-layout
    # fixture) instead of a plain {name}.parquet file. The snapshot
    # reader routes bucketed versions through the catalog so the scan
    # carries the bucket distribution — this is what lets the whole
    # query registry run unchanged against the bucketed layout by
    # just pointing sf_dir at a fixture dir.
    if not os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
        snap = os.path.join(sf_dir, name)
        if os.path.isdir(snap):
            from data_warehouse_nhom8_spark.sources.snapshots import snapshot_read

            df = snapshot_read(spark, snap)
            if df is not None:
                return df
    if name == "events":
        # scope the legacy conf to this read: the scan captures it at
        # analysis time, and leaving it set session-wide would silently
        # change how OTHER nanos-timestamp parquet reads resolve. The
        # conf is a no-op for a TIMESTAMP(MICROS) file, so setting it
        # unconditionally is safe; the resolved type tells us which
        # vintage we actually got.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(f"{sf_dir}/events.parquet")
            if isinstance(df.schema["ts"].dataType, LongType):
                # legacy vintage: raw nanos-since-epoch long -> truncate
                # to micros (same truncation DuckDB applies)
                ts = F.timestamp_micros(F.expr("ts div 1000"))
            else:
                # current vintage: already a timestamp; just normalize
                ts = F.col("ts")
            df = df.withColumn("ts", ts.cast("timestamp_ntz"))
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for the SQL API)."""
    for name in schemas.TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# The production bucketed layout for the testdata facts: the two
# big co-located-join tables hash-distributed on their join key (the
# same storage decision the daily pipeline makes for staging/warehouse
# — SCALE_NOTES.md measured 2.2-4.5x on the recurring orderkey joins
# at 60M/600M rows). Both sides of a co-located join MUST share the
# bucket count, so the fixture pins one count for the pair.
BUCKETED_FIXTURE_KEYS: dict[str, list[str]] = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
}


def build_bucketed_fixture(
    spark: SparkSession,
    sf_dir: str,
    dest: str,
    keys: dict[str, list[str]] | None = None,
    n_buckets: int | None = None,
) -> dict:
    """Materialize a testdata dir in the PRODUCTION layout: the fact
    tables in `keys` become bucketed versioned snapshots under
    `{dest}/{table}/`; every other table is symlinked as plain
    parquet. `load_table`/`Catalog` then serve `dest` transparently,
    so the whole query registry runs against the bucketed layout by
    passing `dest` as the sf_dir — the bench's `bucketed_*` lane.

    Idempotent and stamped: a `_FIXTURE.json` records the source dir,
    per-table mtimes, keys and count; a matching stamp skips the
    rebuild (the bench pays the build once per testdata generation,
    and reports it separately — a production deployment pays it at
    ingest, not per query). Returns {"built": bool, "seconds": s}.

    `n_buckets=None` (default) sizes each fact from its SOURCE
    parquet's footer-uncompressed bytes at ~64 MB per bucket (the
    COMPUTE grain — a bucketed scan yields one un-splittable task per
    bucket, so this deliberately runs 4x finer than
    `snapshot_overwrite`'s 256 MB at-rest file-size rule; see
    `_size_from_source`), next power of two, clamp [8, 4096] — the x100
    probe exposed the old fixed-8 default as the r8 under-bucketing
    pathology in miniature (60M-row lineitem in 8 buckets = 7.5M-row
    sort tasks on 32 cores; q93-bucketed read SLOWER than plain).
    Pass an int to pin (co-located pairs at sf0.1 still resolve to
    the same 8-bucket floor either way, so the bench layout is
    unchanged there)."""
    import json
    import time

    from data_warehouse_nhom8_spark.session import _dir_uncompressed_bytes
    from data_warehouse_nhom8_spark.sources.snapshots import snapshot_overwrite

    def _size_from_source(table: str) -> int:
        # ~64 MB uncompressed per bucket (the shuffle-sizing rule, not
        # the 256 MB at-rest file target): a bucketed scan yields ONE
        # task per bucket that AQE cannot re-split, so buckets are the
        # COMPUTE grain here — the x100 probe measured q93 20% slower
        # on 8 buckets (7.5M-row sort tasks) than plain 64-partition
        # shuffles. Single-file tables (driver testdata) footer-read
        # directly; _dir_uncompressed_bytes walks directories.
        src = os.path.join(sf_dir, f"{table}.parquet")
        if os.path.isfile(src):
            try:
                import pyarrow.parquet as pq

                md = pq.ParquetFile(src).metadata
                total = sum(
                    md.row_group(i).total_byte_size
                    for i in range(md.num_row_groups)
                )
            except Exception:
                total = os.path.getsize(src)
        else:
            total = _dir_uncompressed_bytes(src)
        n = 8
        while n < 4096 and n * (64 << 20) < total:
            n *= 2
        return n

    keys = keys if keys is not None else BUCKETED_FIXTURE_KEYS
    counts = {
        t: (n_buckets if n_buckets is not None else _size_from_source(t))
        for t in keys
    }
    # co-located join pairs must share a count: lift every bucketed
    # fact to the max so l_orderkey==o_orderkey stays exchange-free
    if counts:
        shared = max(counts.values())
        counts = {t: shared for t in counts}
    os.makedirs(dest, exist_ok=True)
    marker = os.path.join(dest, "_FIXTURE.json")
    stamp = {
        "sf_dir": os.path.abspath(sf_dir),
        "n_buckets": counts,
        "keys": {t: list(c) for t, c in sorted(keys.items())},
        "mtimes": {
            t: os.path.getmtime(os.path.join(sf_dir, f"{t}.parquet"))
            for t in schemas.TESTDATA_TABLES
        },
    }
    if os.path.exists(marker):
        try:
            with open(marker) as fh:
                if json.load(fh) == stamp:
                    return {"built": False, "seconds": 0.0}
        except (OSError, ValueError):
            pass
    t0 = time.perf_counter()
    for t in schemas.TESTDATA_TABLES:
        if t in keys:
            # prepartition: a fixture build is a bulk backfill — one
            # shuffle onto the bucket hash writes ONE file per bucket
            # instead of tasks x buckets staged files (the 600M-row
            # build's disk killer)
            snapshot_overwrite(
                load_table(spark, sf_dir, t),
                os.path.join(dest, t),
                bucket_by=keys[t],
                n_buckets=counts[t],
                prepartition=True,
            )
        else:
            link = os.path.join(dest, f"{t}.parquet")
            src = os.path.abspath(os.path.join(sf_dir, f"{t}.parquet"))
            if os.path.lexists(link):
                os.remove(link)
            os.symlink(src, link)
    with open(marker, "w") as fh:
        json.dump(stamp, fh)
    return {"built": True, "seconds": round(time.perf_counter() - t0, 3)}


class Catalog:
    """Lazy handle bundle over one scale-factor directory.

    ``Catalog(spark, sf_dir).orders`` is the orders DataFrame; handles
    are created on first access and cached (plan reuse, not data cache).
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._dfs: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_") or name not in schemas.TESTDATA_TABLES:
            raise AttributeError(name)
        if name not in self._dfs:
            self._dfs[name] = load_table(self.spark, self.sf_dir, name)
        return self._dfs[name]

    def table(self, name: str) -> DataFrame:
        return getattr(self, name)
