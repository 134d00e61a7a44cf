"""Declarative data-quality expectations: single-pass verification,
write-path gate, ledger integration (operators.expectations)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.operators.expectations import (
    Expect,
    check,
    check_to_ledger,
    verify,
)

SUITE = [
    Expect("id_not_null", "not_null", "id"),
    Expect("id_unique", "unique", "id"),
    Expect("status_valid", "accepted_values", "status", {"values": ["a", "b"]}),
    Expect("score_range", "in_range", "score", {"min": 0, "max": 100}),
    Expect("code_shape", "matches_regex", "code", {"pattern": r"^[A-Z]{2}\d+$"}),
    Expect("lo_le_hi", "expression", params={"expr": "lo <= hi"}),
]

ROWS_SCHEMA = "id long, status string, score long, code string, lo long, hi long"


def test_clean_data_passes_every_expectation(spark):
    df = spark.createDataFrame(
        [(1, "a", 50, "AB12", 1, 2), (2, "b", 0, "XY9", 0, 0)], ROWS_SCHEMA
    )
    counts = verify(df, SUITE)  # must not raise
    assert counts == {e.name: 0 for e in SUITE}


def test_each_violation_kind_is_counted(spark):
    df = spark.createDataFrame(
        [
            (None, "a", 50, "AB12", 1, 2),   # id null
            (2, "zz", -1, "ab", 5, 1),       # bad status, range, regex, lo>hi
            (3, "a", 101, None, None, 1),    # range high; null code counts; null lo -> expr violation
            (3, "b", 50, "CD7", 0, 0),       # duplicate id 3
        ],
        ROWS_SCHEMA,
    )
    counts = check(df, SUITE)
    assert counts["id_not_null"] == 1
    assert counts["id_unique"] == 1          # one extra copy of id=3
    assert counts["status_valid"] == 1
    assert counts["score_range"] == 2
    assert counts["code_shape"] == 2         # malformed + NULL
    assert counts["lo_le_hi"] == 2           # lo>hi + NULL lo
    with pytest.raises(ValueError, match="id_unique"):
        verify(df, SUITE)


def test_single_pass_plan(spark):
    """The whole suite must compile to ONE aggregate over ONE scan —
    the Deequ-style fusion that makes a 50-check suite affordable at
    100 TB."""
    df = spark.createDataFrame([(1, "a", 5, "AB1", 0, 1)], ROWS_SCHEMA)
    aggs = []
    from data_warehouse_nhom8_spark.operators.expectations import _violation_expr

    for e in SUITE:
        if e.kind == "unique":
            aggs.append(F.count(e.col).alias("c"))
            aggs.append(F.count_distinct(F.col(e.col)).alias("d"))
        else:
            aggs.append(_violation_expr(e).alias(f"v_{e.name}"))
    plan = df.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1 or plan.count("LocalTableScan") <= 2, plan


def test_empty_input_is_all_green(spark):
    df = spark.createDataFrame([], ROWS_SCHEMA)
    assert all(v == 0 for v in check(df, SUITE).values())


def test_ledger_integration(spark, tmp_path):
    from data_warehouse_nhom8_spark.pipeline.ledger import RunLedger

    led = RunLedger(spark, str(tmp_path / "ledger"))
    day = datetime.date(2025, 6, 1)
    good = spark.createDataFrame([(1, "a", 50, "AB12", 1, 2)], ROWS_SCHEMA)
    bad = spark.createDataFrame([(None, "a", 50, "AB12", 1, 2)], ROWS_SCHEMA)

    check_to_ledger(good, SUITE, led, day, suite="staging")
    check_to_ledger(bad, SUITE, led, day + datetime.timedelta(days=1), suite="staging")

    latest = {
        (r["process"], str(r["run_date"])): r for r in led.latest_status().collect()
    }
    assert latest[("dq:staging", "2025-06-01")]["status"] == "Success"
    failed = latest[("dq:staging", "2025-06-02")]
    assert failed["status"] == "Failed" and "id_not_null" in failed["error_message"]


def test_unique_approx_first_escalation_and_single_pass(spark):
    """Round 9 (ADVICE r8): `unique` is EXACT by default — the r8
    approx-first default silently weakened configured DQ gates.
    params {"approx": True} opts into the HLL-sketch fused pass.
    Clean data: ONE aggregate pass, no Expand, no escalation.
    Duplicated data: the sketch disagrees with count() beyond rsd and
    a second EXACT pass returns the true violation count."""
    from data_warehouse_nhom8_spark.operators.expectations import Expect, check

    exp = [Expect("uniq_id", "unique", "id", {"approx": True})]
    clean = spark.range(0, 5000).select(F.col("id"))
    stats = {}
    assert check(clean, exp, stats=stats) == {"uniq_id": 0}
    assert stats["escalated"] == []
    # the fused plan is sketch-based: no Expand (exact distinct's
    # rewrite) in the single-pass plan
    plan = (
        clean.agg(
            F.count("id").alias("c"),
            F.approx_count_distinct("id", 0.01).alias("a"),
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan

    # dup mass beyond rsd → sketch disagrees → exact escalation pass
    dup = clean.union(spark.range(0, 400).select(F.col("id")))
    stats = {}
    assert check(dup, exp, stats=stats) == {"uniq_id": 400}
    assert stats["escalated"] == ["uniq_id"]

    # at dim scale rsd*count < 1, so ANY duplicate escalates (exact)
    small = spark.range(0, 50).union(spark.range(0, 1))
    stats = {}
    assert check(
        small, [Expect("u", "unique", "id", {"approx": True})], stats=stats
    ) == {"u": 1}
    assert stats["escalated"] == ["u"]

    # documented tolerance OF THE OPT-IN: dup mass below sketch
    # resolution at scale may be accepted in the single approx pass;
    # the DEFAULT (no params) is exact and always catches it
    tiny_dup = clean.union(spark.range(0, 7).select(F.col("id")))
    stats = {}
    approx = check(tiny_dup, exp, stats=stats)
    default_exact = check(tiny_dup, [Expect("uniq_id", "unique", "id")])
    explicit_exact = check(
        tiny_dup, [Expect("uniq_id", "unique", "id", {"exact": True})]
    )
    assert default_exact == {"uniq_id": 7}
    assert explicit_exact == {"uniq_id": 7}
    assert approx["uniq_id"] in (0, 7)  # 0 when within noise, 7 if escalated
