"""Bucketed co-located joins, custom stateful streaming dedup, and
the approx-distinct scale twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.sources.tables import read_table, save_bucketed
from data_warehouse_nhom8_spark.streaming import jobs
from data_warehouse_nhom8_spark.streaming.stateful import first_seen_filter
from tests.conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Both sides bucketed+sorted on the key ⇒ the join plan contains
    no Exchange (the co-location payoff; SURVEY §4 index substitute).
    (Warehouse dir is set session-wide in conftest — it's a static conf.)"""
    from data_warehouse_nhom8_spark.sources import load_table

    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    save_bucketed(orders, "b_orders", ["o_custkey"], 8)
    save_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "b_customer", ["o_custkey"], 8
    )
    # disable broadcast so the planner takes the bucketed SMJ path (at
    # real scale both sides are too big to broadcast — that's when
    # bucketing pays)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_table(spark, "b_orders").join(read_table(spark, "b_customer"), "o_custkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_streaming_first_seen_dedup(spark, tmp_path):
    """Keys survive only their first micro-batch — state persists
    across batches via the state store."""
    src = tmp_path / "src"
    b1 = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, v long"
    )
    b1.write.parquet(str(src / "f1"))
    out1 = str(tmp_path / "out1")

    stream = jobs.stream_source(spark, str(src / "*"), b1.schema)
    deduped = first_seen_filter(stream, ["k"], "k string, v long")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out1)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got1 = sorted((r["k"], r["v"]) for r in spark.read.parquet(out1).collect())
    assert got1 == [("a", 1), ("a", 2), ("b", 3)]  # first batch: all pass

    # batch 2: 'a' and 'b' suppressed (seen), 'c' passes
    b2 = spark.createDataFrame([("a", 9), ("b", 9), ("c", 4)], "k string, v long")
    b2.write.parquet(str(src / "f2"))
    stream = jobs.stream_source(spark, str(src / "*"), b1.schema)
    q = (
        first_seen_filter(stream, ["k"], "k string, v long")
        .writeStream.format("parquet")
        .option("path", out1)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got2 = sorted((r["k"], r["v"]) for r in spark.read.parquet(out1).collect())
    assert got2 == [("a", 1), ("a", 2), ("b", 3), ("c", 4)]


def test_first_seen_ttl_readmits_under_available_now(spark, tmp_path):
    """Cron/AvailableNow ingest shape: with timeout_eviction=False the
    query TERMINATES under Trigger.AvailableNow (ProcessingTimeTimeout
    would spin forever), and TTL re-admission is exact even when the
    re-sighting arrives in the FIRST batch to run after the idle gap —
    no intervening batch ever existed to fire an eviction callback, so
    only the arrival-time check can honor the contract."""
    import time

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    schema_str = "k string, v long"
    schema = spark.createDataFrame([], schema_str).schema

    def run_once(ttl_ms: int) -> None:
        stream = jobs.stream_source(spark, str(src / "*"), schema)
        q = (
            first_seen_filter(
                stream, ["k"], schema_str, ttl_ms=ttl_ms, timeout_eviction=False
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()  # must return: NoTimeout under the hood

    def rows():
        return sorted((r["k"], r["v"]) for r in spark.read.parquet(out).collect())

    spark.createDataFrame([("a", 1)], schema_str).coalesce(1).write.parquet(
        str(src / "f1")
    )
    run_once(ttl_ms=600_000)
    assert rows() == [("a", 1)]

    # second run WITHIN the TTL: 'a' suppressed, marker admits. The
    # window is 10 MINUTES — ttl_ms is a per-run read parameter of the
    # arrival-time check, so the suppression phase can pick a TTL no
    # plausible CI pause or query-startup stall outlives (the r13
    # advisor flagged the old 8 s window as flaky by construction)
    spark.createDataFrame([("a", 9), ("m1", 1)], schema_str).coalesce(1).write.parquet(
        str(src / "f2")
    )
    run_once(ttl_ms=600_000)
    assert rows() == [("a", 1), ("m1", 1)]

    # idle past the TTL with NO batch running in the gap, then the
    # re-sighting arrives in the next run's first batch. The expiry
    # phase re-reads the SAME state with a 1 s TTL: the 2 s sleep
    # guarantees expiry without the suite ever sleeping a full
    # suppression window
    time.sleep(2.0)
    spark.createDataFrame([("a", 2), ("m2", 1)], schema_str).coalesce(1).write.parquet(
        str(src / "f3")
    )
    run_once(ttl_ms=1000)
    assert ("a", 2) in rows(), rows()
    assert ("m2", 1) in rows()


def test_approx_distinct_within_tolerance(spark):
    from data_warehouse_nhom8_spark.plans.extensions import approx_distinct_detail

    rows = approx_distinct_detail(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        err = abs(r["approx_users"] - r["exact_users"]) / max(r["exact_users"], 1)
        assert err <= 0.05, f"{r['event_type']}: {r['approx_users']} vs {r['exact_users']}"


def test_freq_candidate_rollup_exact_when_m_covers(spark):
    """m ≥ per-cell cardinality ⇒ nothing truncates and the merged
    head equals the exact per-coarse-key counts (q78's certification
    regime)."""
    from data_warehouse_nhom8_spark.operators.aggregates import freq_candidate_rollup
    from data_warehouse_nhom8_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    _fine, head = freq_candidate_rollup(
        ev, ["event_type", "day"], ["event_type"], "user_id", m=10_000, k=3
    )
    got = {
        (r.event_type, r.user_id): r.lb_count
        for r in head.collect()
    }
    exact = {
        (r.event_type, r.user_id): r.n
        for r in ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got, "head must be non-empty"
    for key, lb in got.items():
        assert lb == exact[key], f"{key}: merged {lb} != exact {exact[key]}"


def test_freq_candidate_rollup_truncation_guarantees(spark):
    """Planted-skew fixture in the truncating regime (m=2): the heavy
    hitter survives the per-cell truncation, its merged count is a
    lower bound on the true count, and the shortfall stays within the
    Misra-Gries bound Σ_cells floor(N_cell/(m+1))."""
    from data_warehouse_nhom8_spark.operators.aggregates import freq_candidate_rollup

    rows = []
    # 6 cells; in each: heavy item 'hh' 5×, then 4 tail items 1-3× —
    # tail items rotate per cell so no tail item accumulates globally
    for cell in range(6):
        rows += [("g", cell, "hh")] * 5
        for t in range(4):
            rows += [("g", cell, f"t{cell}_{t}")] * (1 + (cell + t) % 3)
    df = spark.createDataFrame(rows, "grp string, cell int, item string")
    m = 2
    fine, head = freq_candidate_rollup(
        df, ["grp", "cell"], ["grp"], "item", m=m, k=3
    )
    # per-cell candidate lists are bounded by m
    fine_counts = fine.groupBy("grp", "cell").count().collect()
    assert all(r["count"] <= m for r in fine_counts)

    exact = {
        r.item: r.n
        for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    cell_sizes = [r["count"] for r in df.groupBy("cell").count().collect()]
    slack = sum(n // (m + 1) for n in cell_sizes)

    got = {r.item: r.lb_count for r in head.collect()}
    assert "hh" in got, "heavy hitter must survive truncation"
    for item, lb in got.items():
        assert lb <= exact[item], "merged count must be a lower bound"
        assert exact[item] - lb <= slack, (
            f"{item}: shortfall {exact[item] - lb} exceeds MG bound {slack}"
        )
    # the heavy hitter is in every cell's top-m, so its bound is exact
    assert got["hh"] == exact["hh"]


def test_first_seen_dedup_ttl_evicts_and_readmits(spark, tmp_path):
    """ttl_ms bounds first-seen state for an unbounded key universe:
    a key sighted within the TTL stays suppressed, a key idle past the
    TTL is evicted (processing-time timeout) and its next sighting
    re-admits. One continuously-running processingTime query — with
    ProcessingTimeTimeout the stateful operator always reports another
    batch may be needed, so availableNow would never terminate; the
    long-running stream is the production shape for TTL state anyway.
    Marker keys prove each file was processed before asserting."""
    import time

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    schema = "k string, v long"

    # both files upfront, ONE part file each (coalesce), one file per
    # trigger: 'a' then has data in every batch that could evict it,
    # so the suppress assertion is timing-independent — eviction only
    # fires for a key with NO data in the batch, and a sighted key
    # renews. (Splitting a9/m1 across part files let an eviction fire
    # between them on a slow box.)
    first = spark.createDataFrame([("a", 1)], schema).coalesce(1)
    first.write.parquet(str(src / "f1"))
    time.sleep(1.1)  # distinct mtime: the file source processes f1 first
    spark.createDataFrame([("a", 9), ("m1", 1)], schema).coalesce(1).write.parquet(
        str(src / "f2")
    )
    stream = jobs.stream_source(
        spark, str(src / "*"), first.schema, max_files_per_trigger=1
    )
    q = (
        first_seen_filter(stream, ["k"], schema, ttl_ms=3000)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(processingTime="300 milliseconds")
        .start()
    )

    def rows():
        try:
            return {(r["k"], r["v"]) for r in spark.read.parquet(out).collect()}
        except Exception:
            return set()

    def wait_for(key, deadline_s=90):
        deadline = time.time() + deadline_s
        while not any(k == key for k, _ in rows()):
            assert q.exception() is None, q.exception()
            assert time.time() < deadline, (key, rows())
            time.sleep(0.3)

    try:
        # f1 admits 'a'; f2 (next trigger, within TTL): suppressed
        wait_for("m1")
        assert ("a", 1) in rows()
        assert ("a", 9) not in rows()
        # idle past the TTL: the state store evicts 'a' (empty batches
        # keep firing under ProcessingTimeTimeout), so it re-admits
        time.sleep(5)
        spark.createDataFrame([("a", 2), ("m2", 1)], schema).coalesce(1).write.parquet(
            str(src / "f3")
        )
        wait_for("m2")
        assert ("a", 2) in rows(), rows()
    finally:
        q.stop()
        q.awaitTermination()
