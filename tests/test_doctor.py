"""Plan-doctor lint rules: each anti-pattern detected, clean plans
stay clean, and every declared oracled query passes the fatal gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.plans.doctor import assert_scale_safe, lint_plan


def rules_of(findings):
    return {f["rule"] for f in findings}


def test_detects_cartesian_join(spark):
    a, b = spark.range(10), spark.range(10).withColumnRenamed("id", "j")
    bad = a.hint("shuffle_replicate_nl").join(b, F.col("id") > F.col("j"))
    assert "cartesian-join" in rules_of(lint_plan(bad))
    with pytest.raises(ValueError, match="cartesian-join"):
        assert_scale_safe(bad)


def test_nested_loop_against_broadcast_side_is_warn_not_fatal(spark):
    """The scalar-threshold shape (q75): BNLJ against a 1-row
    broadcast side is flagged for review but not fatal."""
    a, b = spark.range(10), spark.range(10).withColumnRenamed("id", "j")
    nl = a.join(b, F.col("id") > F.col("j"))
    assert "nested-loop-join" in rules_of(lint_plan(nl))
    assert_scale_safe(nl)


def test_detects_python_row_udf(spark):
    from pyspark.sql.functions import udf

    slow = udf(lambda x: x + 1, "long")
    bad = spark.range(10).select(slow("id").alias("y"))
    assert "python-row-udf" in rules_of(lint_plan(bad))


def test_arrow_paths_are_not_flagged_as_row_udfs(spark):
    out = spark.range(64).mapInPandas(lambda it: it, "id long")
    assert "python-row-udf" not in rules_of(lint_plan(out))
    assert_scale_safe(out)


def test_detects_unpartitioned_window(spark):
    from pyspark.sql.window import Window

    bad = spark.range(100).withColumn(
        "rk", F.row_number().over(Window.partitionBy().orderBy("id"))
    )
    assert "unpartitioned-window" in rules_of(lint_plan(bad))
    # warn, not fatal: the dim-sized normalizer shape is legitimate
    assert_scale_safe(bad)


def test_partitioned_window_is_clean(spark):
    from pyspark.sql.window import Window

    ok = spark.range(100).withColumn("g", F.col("id") % 10).withColumn(
        "rk", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    assert "unpartitioned-window" not in rules_of(lint_plan(ok))


def test_detects_decimal_output(spark):
    bad = spark.range(10).select(F.col("id").cast("decimal(18,2)").alias("d"))
    assert "decimal-output" in rules_of(lint_plan(bad))


def test_clean_aggregate_passes(spark):
    ok = spark.range(1000).withColumn("g", F.col("id") % 7).groupBy("g").count()
    findings = lint_plan(ok)
    assert rules_of(findings) <= {"many-exchanges"}  # at most sizing info
    assert_scale_safe(ok)


def test_all_declared_queries_are_scale_safe(spark):
    """The fatal rules must hold for every declared query (q42's
    mapInPandas is Arrow, not BatchEvalPython, so no exclusions)."""
    from data_warehouse_nhom8_spark.plans import QUERIES
    from tests.conftest import SF_DIR

    for name, fn in QUERIES.items():
        assert_scale_safe(fn(spark, SF_DIR))


def test_detects_dead_pushdown_on_computed_predicate(spark, tmp_path):
    """A filter on a computed expression (length(upper(x))) cannot
    push; only IsNotNull reaches the scan — the rule must fire. The
    same filter on the raw column pushes and must stay clean."""
    path = str(tmp_path / "t")
    spark.range(100).selectExpr("cast(id as string) AS s").write.parquet(path)
    dead = spark.read.parquet(path).filter(F.length(F.upper("s")) > 1)
    assert "no-pushdown" in rules_of(lint_plan(dead))
    pushed = spark.read.parquet(path).filter(F.col("s") > "5")
    assert "no-pushdown" not in rules_of(lint_plan(pushed))


def test_broadcast_exchanges_do_not_count_as_shuffles(spark):
    """q88's 7-broadcast star join must not trip many-exchanges —
    BroadcastExchange/ReusedExchange are not shuffles."""
    from data_warehouse_nhom8_spark.plans import QUERIES
    from tests.conftest import SF_DIR

    findings = lint_plan(QUERIES["q88_market_share"](spark, SF_DIR))
    assert "many-exchanges" not in rules_of(findings), findings


def test_detects_decimal_buffered_aggregation(spark):
    """A SUM over a DECIMAL-cast column gets the info finding; the
    integer-cents twin of the same sum stays clean (the round-7
    money-sum doctrine, operationalized)."""
    df = spark.range(100).selectExpr("id % 3 AS k", "id / 7.0 AS v")
    dec = df.groupBy("k").agg(
        F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("t")
    )
    assert "decimal-agg" in rules_of(lint_plan(dec))
    cents = df.groupBy("k").agg(
        (F.sum(F.round(F.col("v") * 100).cast("long")).cast("double") / 100.0).alias("t")
    )
    assert "decimal-agg" not in rules_of(lint_plan(cents))


def test_detects_near_threshold_broadcast(spark):
    """A forced broadcast() of a build side whose size estimate sits
    near/over autoBroadcastJoinThreshold is flagged: the probes
    measured a ~24 MB auto-broadcast losing 3x to the shuffle join it
    displaced, and a hinted broadcast on a growing table fails only
    after the data grows."""
    big = spark.range(3_000_000).withColumnRenamed("id", "k")  # ~24 MB estimate
    probe = spark.range(100).join(F.broadcast(big), F.col("id") == F.col("k"))
    found = [f for f in lint_plan(probe) if f["rule"] == "large-broadcast"]
    assert found and found[0]["severity"] == "warn"
    assert_scale_safe(probe)  # advisory: warn, not fatal
    # tighter frac flags, looser frac (100x threshold) stays quiet
    assert "large-broadcast" not in rules_of(lint_plan(probe, broadcast_frac=100.0))


def test_small_dim_broadcast_is_clean(spark):
    dim = spark.range(25).withColumnRenamed("id", "k")
    probe = spark.range(1000).join(F.broadcast(dim), F.col("id") == F.col("k"))
    assert "large-broadcast" not in rules_of(lint_plan(probe))


def test_detects_sentinel_date_output(spark):
    """A DATE output column whose plan carries an out-of-pandas-bounds
    literal (the SCD2 9999-12-31 current-row sentinel) gets the warn —
    the q114/q115 round-11 driver-failure class; projecting the same
    column as an ISO string clears it."""
    df = spark.range(5).select(
        "id", F.lit("9999-12-31").cast("date").alias("expired")
    )
    assert "sentinel-date-output" in rules_of(lint_plan(df))
    s = spark.range(5).select(
        "id",
        F.date_format(F.lit("9999-12-31").cast("date"), "yyyy-MM-dd").alias("expired"),
    )
    assert "sentinel-date-output" not in rules_of(lint_plan(s))


def test_in_bounds_date_output_is_clean(spark):
    df = spark.range(5).select(
        "id", F.lit("1995-06-17").cast("date").alias("d")
    )
    assert "sentinel-date-output" not in rules_of(lint_plan(df))
