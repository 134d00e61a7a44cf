"""SparkSession factory.

Defaults chosen for correctness-vs-oracle and for scale:

- ``spark.sql.session.timeZone=UTC`` — the oracle (DuckDB) treats
  parquet timestamps as UTC-naive; pinning the session TZ makes
  date_trunc/year/month agree. (The reference pins Asia/Ho_Chi_Minh
  for its MySQL servers — see reference loadtowh/LoadToWH.java:12 —
  which the pipeline layer honours via an explicit option; query
  correctness against the oracle needs UTC.)
- AQE on (coalesce partitions, skew join): at 100 TB the static
  shuffle-partition guess is always wrong; AQE re-plans at runtime.
- ``spark.sql.shuffle.partitions`` sized from the local parallelism
  for tests; on a real cluster this should be ~2-3x total cores and
  AQE coalescing takes it down per-stage.
- Arrow enabled for any pandas interchange (vectorized UDF path).
"""

from __future__ import annotations

import os
from weakref import WeakKeyDictionary

from pyspark.sql import SparkSession

# per-session memo for repartition_if_split_starved's planning probe
# (weak keys: entries die with their session)
_split_memo: WeakKeyDictionary = WeakKeyDictionary()

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def auto_shuffle_partitions(data_dir: str, target_partition_bytes: int = 64 << 20,
                            floor: int = 8, ceiling: int = 4096,
                            cpu_floor_bytes: int = 128 << 20) -> int:
    """Data-driven shuffle-partition sizing, clamped to [floor,
    ceiling], from parquet-footer UNCOMPRESSED bytes (shuffle rows are
    decompressed width — on-disk bytes understate compressible data):

    * bytes term: ~one partition per 64 MB (spill safety; saturates
      `ceiling` at 100 TB, where AQE coalesces per-stage).
    * cores term: once the input exceeds `cpu_floor_bytes` the floor
      rises to the core count — mid-size inputs are CPU-bound in the
      join/agg stages long before the 64 MB-per-partition rule kicks
      in, and 8 partitions on 32 cores idles 3/4 of the machine.
      Measured on a 10x-replicated 6M-row fact set (134 MB on disk /
      175 MB decompressed): 8 partitions ran a join-heavy suite in
      12.98 s, 32 partitions 10.46 s (-20%), identical results.
    * tiny inputs (the sf0.1 bench: ~22 MB decompressed) keep the low
      `floor` — there, per-task scheduling overhead dominates and
      fewer tasks win (measured in round 2).

    The wrong constant in either direction is the classic Spark perf
    bug (200 tasks over 50 MB, or 200 tasks over 100 TB).
    """
    total = _dir_uncompressed_bytes(data_dir)
    floor_eff = max(floor, DEFAULT_CPUS) if total > cpu_floor_bytes else floor
    return max(floor_eff, min(ceiling, total // target_partition_bytes or floor))


def _dir_bytes(data_dir: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(data_dir):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


import functools


@functools.lru_cache(maxsize=64)
def _dir_uncompressed_bytes(data_dir: str) -> int:
    """Decompressed data size from parquet footers (row-group
    total_byte_size sums — metadata-only reads). Non-parquet files
    count at on-disk size; unreadable footers fall back the same way.
    Memoized per path: auto_aqe + auto_shuffle_partitions both call
    this at session bootstrap, and a static data dir need not have
    every footer parsed twice (benchmark/testdata dirs never change
    within a process; a table that grows gets a fresh session)."""
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover — pyarrow ships with pyspark
        return _dir_bytes(data_dir)
    total = 0
    for root, _dirs, files in os.walk(data_dir):
        for f in files:
            full = os.path.join(root, f)
            if f.endswith(".parquet"):
                try:
                    md = pq.ParquetFile(full).metadata
                    total += sum(
                        md.row_group(i).total_byte_size for i in range(md.num_row_groups)
                    )
                    continue
                except Exception:
                    pass
            try:
                total += os.path.getsize(full)
            except OSError:
                pass
    return total


def auto_aqe(data_dir: str, threshold_bytes: int = 1 << 33) -> bool:
    """Data-driven AQE policy for LOCAL sessions. AQE's runtime
    re-planning costs one driver barrier per shuffle stage (~100-300
    ms each locally); its payoff — fixing mis-sized shuffles and skew
    at runtime — only exists when the static estimate can be
    meaningfully wrong. This engine sizes shuffles statically from
    parquet footers (`auto_shuffle_partitions`) and makes the
    borderline join-side calls from footer row counts
    (`tpch._partsupp_fits_broadcast`), so locally there is nothing
    left for AQE to correct and every barrier is pure latency.

    Measured (round 11, AQE-off vs AQE-on wall, identical results):
    sf0.1 0.02 GiB: 32.5 vs 36.4 s; x10 probe 0.17 GiB: 10.1 vs
    11.8 s; x100 probe 1.6 GiB / 60M-row lineitem: 47.4 vs 62.6 s —
    the x100 regression concentrates in the join-heavy shapes
    (q48 5.6→11.9, q73 7.1→14.3). Round 10 measured the OPPOSITE at
    x10 (AQE-on 15.3 vs off 27.3) — the round-11 stats-driven static
    plans made AQE's runtime conversions redundant, which is why the
    threshold moved from 1 GiB to 8 GiB: below it the static plan is
    footer-stat-sized and AQE only adds barriers; above it (and on
    any real cluster, where stats go stale, tenants interfere, and
    skew is live) AQE is the right default — a cluster deployment
    sets spark.sql.adaptive.enabled explicitly and this local policy
    never runs. Threshold follows UNCOMPRESSED bytes (same rationale
    as auto_shuffle_partitions: the plan's work scales with
    decompressed width, not the on-disk footprint).
    """
    return _dir_uncompressed_bytes(data_dir) > threshold_bytes


def repartition_for_compute(df, partitions: int | None = None):
    """Decouple compute parallelism from input-split parallelism.

    A scan's task count is bounded by file/row-group structure (one
    single-row-group parquet file ⇒ ONE task no matter how many cores
    — the testdata files are exactly that), and Catalyst pushes
    projections into the scan task, so expression-heavy per-row work
    (shingling, signatures, language-ID, Arrow codecs) silently runs
    single-threaded. One cheap shuffle of the raw rows buys full-core
    parallelism for everything downstream. Use ONLY around
    compute-per-byte-heavy operators: for ordinary scans the shuffle
    costs more than it saves, and at 100 TB input splits already match
    the cluster."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def repartition_if_split_starved(df, min_fraction: float = 0.5):
    """Input-split starvation guard for compute-heavy aggregations.

    Scan-side partial aggregation runs on as many tasks as the file
    layout yields — a 3-row-group parquet table caps a CPU-bound agg
    (e.g. boxed wide-decimal sums) at 3 cores no matter the cluster.
    If the plan's scan parallelism is below `min_fraction` of the
    available cores, shuffle the (already filtered/pruned) rows to
    full parallelism; otherwise return the plan UNCHANGED — on any
    real multi-split input (every production table, 100 TB) this is
    a no-op and no shuffle is added. Data-driven like
    auto_shuffle_partitions/auto_aqe: the policy reads the actual
    layout instead of hard-coding either choice.

    The probe (`df.rdd.getNumPartitions()`) costs ~40 ms of physical
    planning per FRESH DataFrame — r15 floor-profile work memoizes it
    per (session, input file set): every call site hands this a
    filtered/projected SCAN (that is the contract — the parallelism
    being probed is the scan's), and a scan's split count is a
    function of the file layout alone, so the memo can never change
    the decision for those shapes."""
    spark = df.sparkSession
    key = tuple(sorted(df.inputFiles()))
    if not key:
        # non-file-backed input (LocalRelation, localCheckpointed RDD,
        # in-memory test frame): there is no layout to key the memo on
        # — an empty-tuple key would alias every such DataFrame to the
        # first one probed (r15 review). Probe directly.
        parts = df.rdd.getNumPartitions()
    else:
        memo = _split_memo.get(spark)
        if memo is None:
            memo = _split_memo[spark] = {}
        parts = memo.get(key)
        if parts is None:
            parts = memo[key] = df.rdd.getNumPartitions()
    n = spark.sparkContext.defaultParallelism
    if parts >= max(1, int(n * min_fraction)):
        return df
    return df.repartition(n)


# parsed-expression memo: (id(SparkContext), sql) -> Column. Column
# expression trees are immutable and reusable across plans, so parsing
# the same SQL text once per JVM is free speed for the big generated
# expressions (64-permutation MinHash signatures ~5 KB, hyperplane
# dot folds ~15 KB, band tables ~10 KB) that otherwise re-parse on
# EVERY plan construction. Keyed on the live context so a JVM restart
# can never serve a stale gateway ref; bounded by the distinct
# generated expressions in the workload (a few hundred).
_expr_memo: dict = {}


def memo_expr(sql: str):
    """`F.expr(sql)` with a per-JVM parse memo (r16 build-cost rule)."""
    from pyspark import SparkContext
    from pyspark.sql import functions as F

    sc = SparkContext._active_spark_context
    key = (id(sc), sql)
    col = _expr_memo.get(key)
    if col is None:
        col = _expr_memo[key] = F.expr(sql)
    return col


# sort_boundary policy bound: below this uncompressed input size the
# per-query wall sits on the client/scheduling latency floor and the
# range sampler's child re-execution is a measurable fraction of it;
# above, the added hash exchange shuffles real data for a sampler
# rescan that amortizes into the job. Measured both sides at r16:
# sf0.1 (~22 MB) WITH boundary q03 0.304 / q09 0.591 / q21 0.289 s vs
# WITHOUT 0.35 / 0.779 / 0.32; x100 (~1.7 GiB) WITH 1.38 / 6.91 /
# 2.07 vs WITHOUT 1.16 / 6.79 / 1.86 — the boundary wins under the
# floor regime and loses in the throughput regime.
_SORT_BOUNDARY_MAX_BYTES = 256 << 20


def sort_boundary(df, data_dir: str, *cols):
    """Keyed repartition of a small result before a global orderBy —
    skipped at scale (VERDICT r15 task 5's size-policied guard).

    A global sort plans `Exchange rangepartitioning`, whose bounds
    come from a sampling job that re-executes everything above the
    last real shuffle boundary (broadcasts are not boundaries). On
    scan/join-probe shapes at bench scale that double-run is a large
    fraction of the per-query latency floor, so a cheap keyed
    repartition of the result pays for itself; at throughput scale
    the same repartition is a full extra shuffle of the result while
    the sampler's rescan amortizes — so above the policy bound this
    is a no-op. Heavy-map shapes (regex/digest passes: q24/q54/q55/
    q96/q42/q110/q119) keep their unconditional boundary — there the
    rescan re-runs the expensive map at ANY scale."""
    if _dir_uncompressed_bytes(data_dir) > _SORT_BOUNDARY_MAX_BYTES:
        return df
    return df.repartition(*cols)


def get_spark(
    app_name: str = "data_warehouse_nhom8_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    session_tz: str = "UTC",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a cluster, ``master`` comes from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_CPUS
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", session_tz)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # r15 floor-profile fix: pyspark 4 wraps EVERY DataFrame API
        # call with a debug-origin capture — a Python traceback walk
        # plus TWO extra py4j round trips (conf read + JVM call-site
        # set) per call, measured at ~40% of the engine's total plan-
        # construction time (floor_profile python_build 7.9 s → ~3 s).
        # It only enriches error messages with Python call sites; a
        # query-serving engine takes the plain JVM error instead.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # write timestamps as TIMESTAMP_MICROS, not the legacy INT96:
        # INT96 columns carry NO parquet min/max statistics, which
        # silently disables row-group pushdown AND the engine's
        # file-level stats manifest (sources.layout) on every time
        # column — the most common prune dimension at 100 TB
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Spark's canonical 10 MB, NOT higher: auto-broadcasting a
        # multi-100k-row side makes EVERY task deserialize + hash-build
        # the whole relation — measured on a 6M-row probe, a ~24 MB
        # broadcast orders side ran q48 in 3.55 s vs 1.33 s with the
        # same side shuffled (SMJ partitions the build). Dim tables
        # broadcast via explicit F.broadcast() hints regardless.
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        # a query-serving driver re-runs the same plan shapes all day;
        # the default 100-entry generated-class cache evicts across a
        # ~50-query workload and re-pays Janino compilation per query
        .config("spark.sql.codegen.cache.maxEntries", "10000")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
