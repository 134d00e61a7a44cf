"""AQE certification lane.

The engine's SparkSession default is ``spark.sql.adaptive.enabled=true``
(session.py — at 100 TB the static shuffle-partition guess is always
wrong), and every oracle test in this suite already EXECUTES with AQE
on via the shared fixture. What had never been observed before this
lane is the FINAL adaptive plan: the plan gates in test_plans.py read
the pre-execution text (``AdaptiveSparkPlan isFinalPlan=false`` — the
static plan), so runtime re-planning (coalesced shuffle reads,
preserved broadcasts, skew splitting) went unasserted.

This lane certifies, on representative join/agg/window shapes:
  1. the final adaptive plan keeps every property the static gates pin
     (broadcast dims stay broadcast, no cartesian appears at runtime);
  2. AQE-on and AQE-off produce identical results (same session JVM,
     isolated ``newSession`` confs);
  3. partition coalescing actually engages on an over-provisioned
     shuffle (``AQEShuffleRead coalesced``);
  4. skew-join splitting actually engages on a manufactured hot key.

The 6M-row mid-scale probe (scripts/midscale_probe.py) runs the same
certification at a scale where AQE's decisions are load-bearing;
SCALE_NOTES.md records its numbers.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.plans import QUERIES
from tests.conftest import SF_DIR, canon

# one of each plan family the static gates certify
REPRESENTATIVE = [
    "q46_pricing_summary",        # scan → partial → final agg
    "q48_local_supplier_volume",  # 5-way join, broadcast dims
    "q73_large_volume_customer",  # agg-before-join + top-k
    "q93_waiting_supplier",       # semi + anti self-join
    "q101_min_cost_supplier",     # window decorrelation (derived partsupp)
    "q102_important_stock",       # window-over-agg-output scalar
]


@pytest.fixture(scope="module")
def aqe_off(spark):
    """Same JVM/context, isolated SQLConf with AQE disabled."""
    s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    return s


def _final_plan(df) -> str:
    df.collect()  # AQE finalizes the plan only during execution
    return df._jdf.queryExecution().executedPlan().toString()


def test_engine_default_is_adaptive(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_final_adaptive_plan_keeps_static_gates(spark, name):
    p = _final_plan(QUERIES[name](spark, SF_DIR))
    assert "isFinalPlan=true" in p, "query must have executed under AQE"
    assert "CartesianProduct" not in p, f"{name}: runtime re-plan introduced a cartesian"
    if name in (
        "q48_local_supplier_volume",
        "q93_waiting_supplier",
        "q101_min_cost_supplier",
    ):
        assert "BroadcastHashJoin" in p, (
            f"{name}: dim broadcasts must survive the runtime re-plan"
        )


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_aqe_on_off_results_identical(spark, aqe_off, name):
    on = sorted(
        tuple(canon(v) for v in r) for r in QUERIES[name](spark, SF_DIR).collect()
    )
    off = sorted(
        tuple(canon(v) for v in r) for r in QUERIES[name](aqe_off, SF_DIR).collect()
    )
    assert on == off, f"{name}: AQE changed the result"


def test_aqe_coalesces_overprovisioned_shuffle(spark):
    """The 100 TB story's core claim: a wrong static partition count is
    repaired at runtime. 64 shuffle partitions over a ~100 KB agg must
    coalesce (parallelismFirst off = honor the advisory size, Spark's
    own recommendation for cost-efficiency)."""
    s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "64")
    s.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    df = (
        s.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    p = _final_plan(df)
    assert "AQEShuffleRead coalesced" in p, p[:1200]
    assert df.rdd.getNumPartitions() < 64


def test_aqe_splits_skewed_join_partition(spark):
    """Skew-join splitting must actually engage: a 95%-hot key on the
    probe side of a shuffle join, thresholds scaled to test data (the
    defaults target 256 MB partitions). The final plan must carry the
    skew=true join marker — this is the mechanism the engine relies on
    instead of hand-salting every production join."""
    s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    left = s.range(0, 300_000).select(
        F.when(F.col("id") % 20 < 19, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = s.range(0, 2_000).select(F.col("id").alias("k2"))
    j = left.join(right, F.col("k") == F.col("k2"))
    p = _final_plan(j)
    assert "isSkewJoin=true" in p or "skewed" in p, p[:1500]
