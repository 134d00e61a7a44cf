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

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def auto_shuffle_partitions(data_dir: str, target_partition_bytes: int = 64 << 20,
                            floor: int = 8, ceiling: int = 4096) -> int:
    """Data-driven shuffle-partition sizing: ~one partition per 64 MB
    of input, clamped to [floor, ceiling]. At sf0.1 (~60 MB) this is
    `floor`; at 100 TB it saturates `ceiling` and AQE coalesces
    per-stage. The wrong constant in either direction is the classic
    Spark perf bug (200 tasks over 50 MB, or 200 tasks over 100 TB).
    """
    total = _dir_bytes(data_dir)
    return max(floor, min(ceiling, total // target_partition_bytes or floor))


def _dir_bytes(data_dir: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(data_dir):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def auto_aqe(data_dir: str, threshold_bytes: int = 1 << 30) -> bool:
    """Data-driven AQE policy. AQE's runtime re-planning costs one
    driver barrier per shuffle stage (~100-300 ms each locally); its
    payoff — fixing mis-sized shuffles and skew at runtime — only
    exists when the static estimate can be meaningfully wrong. Below
    ~1 GiB, `auto_shuffle_partitions` has already right-sized the plan
    from file stats and every stage barrier is pure latency; above it
    (and on any real cluster) AQE stays on. Measured at sf0.1: AQE off
    saves ~15-20% wall on the oracled suite with identical results.
    """
    return _dir_bytes(data_dir) > threshold_bytes


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
    layout instead of hard-coding either choice."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(1, int(n * min_fraction)):
        return df
    return df.repartition(n)


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
        # write timestamps as TIMESTAMP_MICROS, not the legacy INT96:
        # INT96 columns carry NO parquet min/max statistics, which
        # silently disables row-group pushdown AND the engine's
        # file-level stats manifest (sources.layout) on every time
        # column — the most common prune dimension at 100 TB
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
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
