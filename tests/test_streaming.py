"""Streaming twins: results must equal their batch counterparts
(SURVEY §2h — the oracle for streaming is the batch plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.sources import load_table
from data_warehouse_nhom8_spark.sources.snapshots import epoch_read, snapshot_read
from data_warehouse_nhom8_spark.streaming import jobs
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events re-materialized as micro-timestamp parquet (the raw
    testdata is TIMESTAMP(NANOS), unreadable by the streaming source)."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    # watermarks require TIMESTAMP (tz-aware); the engine reader yields
    # NTZ for oracle parity, so the streaming layer casts (UTC session
    # tz => identical instants)
    load_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).write.parquet(path)
    return path


@pytest.fixture(scope="module")
def events_schema(spark, events_dir):
    return spark.read.parquet(events_dir).schema


def test_tumbling_stream_equals_batch(spark, events_dir, events_schema, tmp_path):
    stream = jobs.stream_source(spark, events_dir, events_schema)
    agg = jobs.tumbling_rollup(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (str(r["w_start"]), r["event_type"]): (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.date_trunc("day", "ts").alias("w_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / 100.0
            ).alias("total"),
        )
    )
    want = {
        (str(r["w_start"]), r["event_type"]): (r["n"], r["total"])
        for r in batch.collect()
    }
    assert got == want


def test_session_stream_matches_gap_analysis(spark, events_dir, events_schema, tmp_path):
    """session_window sessions per user == the Q29 LAG-gap count.
    A far-future sentinel event pushes the watermark past all real
    sessions so append mode emits them."""
    sentinel = spark.createDataFrame(
        [(999999, "2030-01-01 00:00:00", -1, "x", 0.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    src_dir = str(tmp_path / "src")
    spark.read.parquet(events_dir).unionByName(sentinel).write.parquet(src_dir)

    stream = jobs.stream_source(spark, src_dir, events_schema)
    q = (
        jobs.session_rollup(stream, gap="30 minutes", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("session_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("SELECT user_id, COUNT(*) AS n FROM session_out WHERE user_id >= 0 GROUP BY user_id")
        .collect()
    )
    got_map = {r["user_id"]: r["n"] for r in got}

    from data_warehouse_nhom8_spark.plans.queries import q29_session_gap

    want = {r["user_id"]: r["n_sessions"] for r in q29_session_gap(spark, SF_DIR).collect()}
    assert got_map == want


def test_sliding_window_stream(spark, events_dir, events_schema, tmp_path):
    """Sliding windows: each event lands in window_duration/slide
    windows; totals across windows = n_events * (window/slide)."""
    stream = jobs.stream_source(spark, events_dir, events_schema)
    q = (
        jobs.sliding_rollup(stream, window="1 hour", slide="15 minutes")
        .writeStream.format("memory")
        .queryName("sliding_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cks"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    total = spark.sql("SELECT SUM(n) AS s FROM sliding_out").collect()[0]["s"]
    n_events = spark.read.parquet(events_dir).count()
    assert total == n_events * 4  # 1h / 15min = 4 windows per event


def test_foreachbatch_upsert_two_batches(spark, tmp_path):
    """Two micro-batch files arriving in sequence; final snapshot ==
    last-writer-wins state (the D1 contract, streaming face)."""
    src = tmp_path / "src"
    snap = str(tmp_path / "snap")
    schema = "job_id string, salary string, extracted_date date"

    b1 = spark.createDataFrame(
        [("a", "old", "2025-03-10"), ("b", "keep", "2025-03-10")],
        "job_id string, salary string, extracted_date string",
    ).withColumn("extracted_date", F.col("extracted_date").cast("date"))
    b1.write.parquet(str(src / "f1"))

    stream = jobs.stream_source(spark, str(src / "*"), b1.schema)
    writer = jobs.upsert_sink(
        stream, snap, keys=["job_id"], order_by_cols=["extracted_date"],
        checkpoint=str(tmp_path / "ck"),
    )
    jobs.run_available_now(writer)
    got1 = {r["job_id"]: r["salary"] for r in snapshot_read(spark, snap).collect()}
    assert got1 == {"a": "old", "b": "keep"}

    b2 = spark.createDataFrame(
        [("a", "new", "2025-03-11"), ("c", "fresh", "2025-03-11")],
        "job_id string, salary string, extracted_date string",
    ).withColumn("extracted_date", F.col("extracted_date").cast("date"))
    b2.write.parquet(str(src / "f2"))

    stream = jobs.stream_source(spark, str(src / "*"), b1.schema)
    writer = jobs.upsert_sink(
        stream, snap, keys=["job_id"], order_by_cols=["extracted_date"],
        checkpoint=str(tmp_path / "ck"),  # same checkpoint: only f2 is new
    )
    jobs.run_available_now(writer)
    got2 = {r["job_id"]: r["salary"] for r in snapshot_read(spark, snap).collect()}
    assert got2 == {"a": "new", "b": "keep", "c": "fresh"}


def test_streaming_neardup_ingest_equals_batch_detector(spark, tmp_path):
    """The LLM-pipeline streaming composite: documents arriving in two
    micro-batches, incrementally deduped against the persisted
    signature state, must yield EXACTLY the full batch detector's
    pairs over all documents — and re-ingesting everything under a
    fresh checkpoint converges to the same state."""
    from data_warehouse_nhom8_spark.operators import neardup

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the garden outside"
    )
    rows1 = [(0, base), (1, base), (3, "unrelated text about catalyst plans and shuffles entirely")]
    rows2 = [(2, base.replace("warm", "cold")), (4, base.replace("birds", "bees")), (5, "short text")]
    all_docs = spark.createDataFrame(rows1 + rows2, "doc_id long, text string")
    want = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in neardup.minhash_neardup_pairs(all_docs, threshold=0.5).collect()
    }
    assert want  # fixture sanity

    src = tmp_path / "docs"
    state = str(tmp_path / "state")
    pairs = str(tmp_path / "pairs")
    spark.createDataFrame(rows1, "doc_id long, text string").write.parquet(str(src / "b1"))

    def drain(ck):
        stream = jobs.stream_source(
            spark, str(src / "*"), all_docs.schema, max_files_per_trigger=1
        )
        writer = jobs.neardup_ingest_sink(
            stream, state, pairs, checkpoint=ck, threshold=0.5
        )
        jobs.run_available_now(writer)

    drain(str(tmp_path / "ck"))
    spark.createDataFrame(rows2, "doc_id long, text string").write.parquet(str(src / "b2"))
    drain(str(tmp_path / "ck"))  # same checkpoint: only b2 is new

    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in jobs.read_neardup_pairs(spark, pairs).collect()
    }
    assert got == want
    assert jobs.read_sig_state(spark, state).count() == 6

    # replay everything under a FRESH checkpoint: state converges
    drain(str(tmp_path / "ck2"))
    got2 = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in jobs.read_neardup_pairs(spark, pairs).collect()
    }
    assert got2 == want
    assert jobs.read_sig_state(spark, state).count() == 6


def test_streaming_corpus_ingest_equals_batch_job(spark, tmp_path):
    """Streaming corpus prep over two micro-batches must equal the
    batch corpus_prep job on the union — same corpus table, same
    chunks — and draining again (replay) converges."""
    import datetime

    from data_warehouse_nhom8_spark.pipeline import corpus_prep

    texts = [
        (i, "the quick brown fox " + " ".join(f"w{i}t{j}" for j in range(40)) + " of a day")
        for i in range(8)
    ]
    all_docs = spark.createDataFrame(texts, "doc_id long, text string")

    # batch reference
    ref_out = str(tmp_path / "batch")
    corpus_prep.run_corpus_prep(
        spark, all_docs, ref_out, datetime.date(2026, 1, 1),
        chunk_tokens=16, stride=8,
    )
    want_corpus = {tuple(r) for r in snapshot_read(spark, f"{ref_out}/corpus").collect()}
    want_chunks = {tuple(r) for r in snapshot_read(spark, f"{ref_out}/chunks").collect()}
    assert want_corpus and want_chunks

    # streaming: two file batches through the sink
    src = tmp_path / "docs"
    spark.createDataFrame(texts[:5], "doc_id long, text string").write.parquet(str(src / "b1"))
    corpus_path = str(tmp_path / "corpus")
    chunks_path = str(tmp_path / "chunks")

    def drain():
        stream = jobs.stream_source(
            spark, str(src / "*"), all_docs.schema, max_files_per_trigger=1
        )
        writer = jobs.corpus_ingest_sink(
            stream, corpus_path, chunks_path,
            checkpoint=str(tmp_path / "ck"), chunk_tokens=16, stride=8,
        )
        jobs.run_available_now(writer)

    drain()
    spark.createDataFrame(texts[5:], "doc_id long, text string").write.parquet(str(src / "b2"))
    drain()
    got_corpus = {tuple(r) for r in jobs.read_corpus_store(spark, corpus_path).collect()}
    got_chunks = {tuple(r) for r in jobs.read_chunks_store(spark, chunks_path).collect()}
    assert got_corpus == want_corpus
    assert got_chunks == want_chunks

    drain()  # replay: nothing new, state unchanged
    assert {tuple(r) for r in jobs.read_corpus_store(spark, corpus_path).collect()} == want_corpus


def test_streaming_sketch_rollup_equals_batch(spark, events_dir, events_schema, tmp_path):
    """Streaming sketch-store maintenance: events arriving in
    micro-batches must yield the same per-type distinct-user
    estimates and EXACT n_rows as the one-shot batch rollup, and a
    drained re-run (same checkpoint, nothing new) must not change the
    store."""
    store = str(tmp_path / "sketch_store")
    ck = str(tmp_path / "ck")

    stream = jobs.stream_source(
        spark, events_dir, events_schema, max_files_per_trigger=1
    )
    writer = jobs.sketch_rollup_sink(
        stream, store, fine_keys=["event_type"], distinct_col="user_id",
        checkpoint=ck,
    )
    jobs.run_available_now(writer)

    got = {
        r["event_type"]: (r["est_distinct"], r["n_rows"])
        for r in jobs.read_sketch_rollup(spark, store, ["event_type"]).collect()
    }
    ev = spark.read.parquet(events_dir)
    exact = {
        r["event_type"]: (r["n"], r["rows"])
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"), F.count(F.lit(1)).alias("rows"))
        .collect()
    }
    assert set(got) == set(exact)
    for t, (n, rows) in exact.items():
        est, got_rows = got[t]
        assert got_rows == rows, (t, got_rows, rows)  # n_rows exactly-once
        assert abs(est - n) <= max(2, 0.05 * n), (t, est, n)

    before = {tuple(r) for r in epoch_read(spark, store).collect()}
    jobs.run_available_now(
        jobs.sketch_rollup_sink(
            jobs.stream_source(spark, events_dir, events_schema),
            store, fine_keys=["event_type"], distinct_col="user_id",
            checkpoint=ck,
        )
    )
    after = {tuple(r) for r in epoch_read(spark, store).collect()}
    assert before == after


def test_sketch_store_compaction_preserves_rollups(spark, events_dir, events_schema, tmp_path):
    """Compaction must shrink the store to one row per cell while
    leaving every rollup estimate and exact n_rows unchanged (sketch
    union associativity)."""
    store = str(tmp_path / "store")
    jobs.run_available_now(
        jobs.sketch_rollup_sink(
            jobs.stream_source(spark, events_dir, events_schema, max_files_per_trigger=1),
            store, fine_keys=["event_type"], distinct_col="user_id",
            checkpoint=str(tmp_path / "ck"),
        )
    )
    before = {
        r["event_type"]: (r["est_distinct"], r["n_rows"])
        for r in jobs.read_sketch_rollup(spark, store, ["event_type"]).collect()
    }
    n_cells_before = epoch_read(spark, store).count()

    jobs.compact_sketch_store(spark, store, ["event_type"])

    after = {
        r["event_type"]: (r["est_distinct"], r["n_rows"])
        for r in jobs.read_sketch_rollup(spark, store, ["event_type"]).collect()
    }
    compacted = epoch_read(spark, store)
    assert after == before
    assert compacted.count() == len(before) <= n_cells_before
    assert {r["epoch"] for r in compacted.collect()} == {-1}


def test_streaming_freq_head_equals_batch(spark, events_dir, events_schema, tmp_path):
    """Streaming heavy-hitter maintenance: micro-batched arrival must
    yield the same per-type top-5 users (items AND counts) as the
    one-shot batch operator in the non-truncating regime, and a
    drained re-run must not change the store."""
    from data_warehouse_nhom8_spark.operators.aggregates import freq_candidate_rollup
    from data_warehouse_nhom8_spark.sources.snapshots import snapshot_read

    store = str(tmp_path / "freq_store")
    ck = str(tmp_path / "ck")

    jobs.run_available_now(
        jobs.freq_head_sink(
            jobs.stream_source(spark, events_dir, events_schema, max_files_per_trigger=1),
            store, fine_keys=["event_type"], item_col="user_id",
            checkpoint=ck, m=100_000,
        )
    )
    got = {
        (r["event_type"], r["rank"]): (r["user_id"], r["lb_count"])
        for r in jobs.read_freq_head(
            spark, store, ["event_type"], "user_id", k=5
        ).collect()
    }

    ev = spark.read.parquet(events_dir)
    _fine, head = freq_candidate_rollup(
        ev.select("event_type", "user_id"),
        ["event_type"], ["event_type"], "user_id", m=100_000, k=5,
    )
    want = {
        (r["event_type"], r["rank"]): (r["user_id"], r["lb_count"])
        for r in head.collect()
    }
    assert got == want and len(want) > 0

    before = {tuple(r) for r in epoch_read(spark, store).collect()}
    jobs.run_available_now(
        jobs.freq_head_sink(
            jobs.stream_source(spark, events_dir, events_schema),
            store, fine_keys=["event_type"], item_col="user_id",
            checkpoint=ck, m=100_000,
        )
    )
    after = {tuple(r) for r in epoch_read(spark, store).collect()}
    assert before == after


def test_freq_store_compaction_preserves_heads(spark, events_dir, events_schema, tmp_path):
    """Compaction folds epochs into one row per (cell, item) and the
    coarse top-k is unchanged in the non-truncating regime."""
    from data_warehouse_nhom8_spark.sources.snapshots import snapshot_read

    store = str(tmp_path / "store")
    jobs.run_available_now(
        jobs.freq_head_sink(
            jobs.stream_source(spark, events_dir, events_schema, max_files_per_trigger=1),
            store, fine_keys=["event_type"], item_col="user_id",
            checkpoint=str(tmp_path / "ck"), m=100_000,
        )
    )
    before = {
        (r["event_type"], r["rank"]): (r["user_id"], r["lb_count"])
        for r in jobs.read_freq_head(spark, store, ["event_type"], "user_id", k=5).collect()
    }
    n_before = epoch_read(spark, store).count()
    jobs.compact_freq_store(spark, store, ["event_type"], "user_id", m=100_000)
    after = {
        (r["event_type"], r["rank"]): (r["user_id"], r["lb_count"])
        for r in jobs.read_freq_head(spark, store, ["event_type"], "user_id", k=5).collect()
    }
    n_after = epoch_read(spark, store).count()
    assert after == before
    assert n_after <= n_before
    assert {r["epoch"] for r in epoch_read(spark, store).collect()} == {-1}


def test_interval_stream_join_equals_batch(spark, events_dir, events_schema, tmp_path):
    """Attribution shape: purchase within 1h of a view by the same
    user — streaming inner interval join must equal the batch join."""
    stream = jobs.stream_source(spark, events_dir, events_schema)
    views = stream.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    buys = stream.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    joined = jobs.interval_stream_join(views, buys, within="1 hour", watermark="2 hours")
    out = joined.select(
        F.col("event_id").alias("view_id"), F.col("r_event_id").alias("buy_id")
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["view_id"], r["buy_id"])
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }

    ev = spark.read.parquet(events_dir)
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("ts").alias("vts"), F.col("event_id").alias("view_id")
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("bu"), F.col("ts").alias("bts"), F.col("event_id").alias("buy_id")
    )
    want = {
        (r["view_id"], r["buy_id"])
        for r in v.join(
            b,
            (F.col("u") == F.col("bu"))
            & (F.col("bts") >= F.col("vts"))
            & (F.col("bts") <= F.col("vts") + F.expr("INTERVAL 1 hour")),
        ).collect()
    }
    assert len(want) > 0, "test data must produce at least one attribution pair"
    assert got == want


def test_dedup_within_watermark_drops_replayed_rows(spark, events_dir, events_schema, tmp_path):
    """Feeding the same events twice (duplicate files) must yield each
    event_id exactly once downstream."""
    src = str(tmp_path / "dup_src")
    ev = spark.read.parquet(events_dir)
    ev.write.parquet(src)
    ev.write.mode("append").parquet(src)  # exact replay
    assert spark.read.parquet(src).count() == 2 * ev.count()

    stream = jobs.stream_source(spark, src, events_schema)
    deduped = jobs.dedup_within_watermark(stream, keys=("event_id",), watermark="1 day")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT event_id FROM dedup_out").collect()
    ids = [r["event_id"] for r in got]
    assert len(ids) == len(set(ids)) == ev.count()


def test_interval_stream_join_left_outer_emits_unconverted(spark, tmp_path):
    """left_outer: a view with no purchase inside the interval is
    emitted with null right columns once BOTH watermarks pass the end
    of its match window. Sentinels must advance both streams' event
    time (each side's watermark tracks only rows that survive its
    filter), and outer state flushes on the NEXT batch after the
    advance — hence three single-file batches."""
    import time

    schema_s = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "louter_src")

    def write_file(rows, mode):
        (
            spark.createDataFrame(rows, schema_s)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
            .write.mode(mode)
            .parquet(src)
        )
        time.sleep(1.1)  # distinct mtimes => deterministic batch order

    # batch 1: the real day — user 1 converts, user 2 never does
    write_file(
        [
            (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
            (2, "2024-01-01 10:30:00", 1, "purchase", 5.0, "{}"),
            (3, "2024-01-01 10:00:00", 2, "view", 1.0, "{}"),
        ],
        "overwrite",
    )
    # batch 2: sentinels advance BOTH sides' watermarks far past the day
    write_file(
        [
            (90, "2030-01-01 00:00:00", -1, "view", 0.0, "{}"),
            (91, "2030-06-01 00:00:00", -2, "purchase", 0.0, "{}"),
        ],
        "append",
    )
    # batch 3: one more trigger so the advanced watermark flushes state
    write_file([(92, "2031-01-01 00:00:00", -3, "view", 0.0, "{}")], "append")

    schema = spark.read.parquet(src).schema
    stream = jobs.stream_source(spark, src, schema, max_files_per_trigger=1)
    views = stream.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    buys = stream.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    j = jobs.interval_stream_join(
        views, buys, within="1 hour", watermark="0 seconds", how="left_outer"
    )
    q = (
        j.select("event_id", "r_event_id")
        .writeStream.format("memory")
        .queryName("louter_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_louter"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM louter_out").collect()
    }
    assert (1, 2) in got, got            # converted view keeps its match
    assert (3, None) in got, got         # unconverted view emitted with nulls
    assert (1, None) not in got          # matched view is never ALSO emitted null


def test_interval_join_checkpoint_restart_continues_exactly_once(spark, tmp_path):
    """Exactly-once across restarts: run the interval join AvailableNow
    over day-1 files, stop, drop more files, re-run with the SAME
    checkpoint — the append sink must accumulate the complete result
    with no duplicates (state + source offsets recover from the
    checkpoint)."""
    import time

    schema_s = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "ck_src")
    ck = str(tmp_path / "ck_restart")
    out_parquet = str(tmp_path / "ck_out")

    def write_file(rows, mode):
        (
            spark.createDataFrame(rows, schema_s)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
            .write.mode(mode)
            .parquet(src)
        )
        time.sleep(1.1)

    def run_once():
        stream = jobs.stream_source(spark, src, spark.read.parquet(src).schema)
        views = stream.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
        buys = stream.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
        j = jobs.interval_stream_join(views, buys, within="1 hour", watermark="2 hours")
        q = (
            j.select(F.col("event_id").alias("view_id"), F.col("r_event_id").alias("buy_id"))
            .writeStream.format("parquet")
            .option("path", out_parquet)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # day 1: one converting pair
    write_file(
        [
            (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
            (2, "2024-01-01 10:30:00", 1, "purchase", 5.0, "{}"),
        ],
        "overwrite",
    )
    run_once()
    got1 = {(r["view_id"], r["buy_id"]) for r in spark.read.parquet(out_parquet).collect()}
    assert got1 == {(1, 2)}

    # restart later with new arrivals: user 1's old view must NOT
    # re-match (already emitted once), user 2's new pair must appear
    write_file(
        [
            (3, "2024-01-01 10:40:00", 2, "view", 1.0, "{}"),
            (4, "2024-01-01 11:00:00", 2, "purchase", 9.0, "{}"),
        ],
        "append",
    )
    run_once()
    got2 = sorted(
        (r["view_id"], r["buy_id"]) for r in spark.read.parquet(out_parquet).collect()
    )
    assert got2 == [(1, 2), (3, 4)], got2  # complete, no duplicates


def test_streaming_vocab_store_equals_batch_and_scores(spark, tmp_path):
    """Streaming vocabulary maintenance: docs arriving in micro-batches
    must yield exactly the whole-corpus vocab_counts, surprisal scored
    against the store must equal the full-corpus scorer bit-for-bit,
    a drained re-run must not change the store, and compaction must
    change nothing downstream."""
    from data_warehouse_nhom8_spark.operators.text import (
        surprisal_against_vocab,
        unigram_surprisal_scores,
        vocab_counts,
    )

    texts = [
        (i, f"alpha tok{i % 5} beta tok{i % 3} common words here")
        for i in range(12)
    ]
    all_docs = spark.createDataFrame(texts, "doc_id long, text string")
    src = tmp_path / "docs"
    spark.createDataFrame(texts[:7], "doc_id long, text string").write.parquet(str(src / "b1"))
    store = str(tmp_path / "vocab_store")
    ck = str(tmp_path / "ck")

    def drain():
        stream = jobs.stream_source(
            spark, str(src / "*"), all_docs.schema, max_files_per_trigger=1
        )
        jobs.run_available_now(
            jobs.vocab_store_sink(stream, store, checkpoint=ck)
        )

    drain()
    spark.createDataFrame(texts[7:], "doc_id long, text string").write.parquet(str(src / "b2"))
    drain()

    want_vocab = {tuple(r) for r in vocab_counts(all_docs).collect()}
    got_vocab = {tuple(r) for r in jobs.read_vocab_store(spark, store).collect()}
    assert got_vocab == want_vocab

    want_scores = [tuple(r) for r in unigram_surprisal_scores(all_docs).collect()]
    got_scores = [
        tuple(r)
        for r in surprisal_against_vocab(
            all_docs, jobs.read_vocab_store(spark, store)
        ).collect()
    ]
    assert got_scores == want_scores

    before = {tuple(r) for r in epoch_read(spark, store).collect()}
    drain()  # replay: nothing new, store unchanged
    assert {tuple(r) for r in epoch_read(spark, store).collect()} == before

    jobs.compact_vocab_store(spark, store)
    compacted = epoch_read(spark, store)
    assert {r["epoch"] for r in compacted.collect()} == {-1}
    assert {tuple(r) for r in jobs.read_vocab_store(spark, store).collect()} == want_vocab
    assert [
        tuple(r)
        for r in surprisal_against_vocab(
            all_docs, jobs.read_vocab_store(spark, store)
        ).collect()
    ] == want_scores


def _poisoned(merge, fail_epoch: int, armed: dict):
    """Wrap a store merge to crash AFTER the snapshot write of
    `fail_epoch` — the worst restart case: store committed, checkpoint
    offset NOT committed, so Spark re-delivers the same epoch on
    restart and the merge's epoch-replacement must make the second
    application a no-op."""

    def inner(batch, epoch_id):
        merge(batch, epoch_id)
        if epoch_id == fail_epoch and not armed["fired"]:
            armed["fired"] = True
            raise RuntimeError("injected mid-epoch kill (store written, ckpt not)")

    return inner


def test_vocab_store_mid_epoch_kill_restart_converges(spark, tmp_path):
    """vocab_store_sink under a mid-epoch kill: the injected crash
    lands between the store snapshot-commit and the checkpoint commit
    of epoch 1; the restarted stream (same checkpoint) re-delivers
    epoch 1 and continues — the final store must equal the
    whole-corpus batch vocabulary exactly (epoch-replacement
    idempotence under Spark's at-least-once re-delivery)."""
    from data_warehouse_nhom8_spark.operators.text import vocab_counts

    texts = [(i, f"alpha tok{i % 5} beta tok{i % 3} words here") for i in range(12)]
    all_docs = spark.createDataFrame(texts, "doc_id long, text string")
    src = tmp_path / "docs"
    for j, lo, hi in ((1, 0, 4), (2, 4, 8), (3, 8, 12)):
        spark.createDataFrame(texts[lo:hi], "doc_id long, text string").write.parquet(
            str(src / f"b{j}")
        )
    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")

    def run(merge):
        stream = jobs.stream_source(
            spark, str(src / "*"), all_docs.schema, max_files_per_trigger=1
        )
        q = (
            stream.writeStream.foreachBatch(merge)
            .option("checkpointLocation", ck)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    armed = {"fired": False}
    with pytest.raises(Exception):
        run(_poisoned(jobs.vocab_store_merge(store), 1, armed))
    assert armed["fired"], "kill must have fired after epoch 1's store write"

    run(jobs.vocab_store_merge(store))  # restart: epoch 1 re-delivered

    want = {tuple(r) for r in vocab_counts(all_docs).collect()}
    got = {tuple(r) for r in jobs.read_vocab_store(spark, store).collect()}
    assert got == want, "restarted store must equal the uninterrupted batch vocab"


def test_sketch_store_mid_epoch_kill_restart_converges(spark, events_dir, events_schema, tmp_path):
    """sketch_rollup_sink under the same mid-epoch kill: after the
    crash-and-restart, every (cell, est_distinct, n_rows) rollup row
    must be identical to an UNINTERRUPTED run of the same sink over
    the same files (sketch-register maxima are associative and the
    epoch replacement dedups the re-delivered batch, so n_rows stays
    exactly-once)."""
    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    store2, ck2 = str(tmp_path / "store2"), str(tmp_path / "ck2")

    # three explicit files => three epochs (events_dir itself is a
    # single part file, which would never reach the epoch-1 kill)
    ev = spark.read.parquet(events_dir)
    src = tmp_path / "ev_batches"
    for j in range(3):
        ev.filter(F.col("event_id") % 3 == j).coalesce(1).write.parquet(
            str(src / f"b{j}")
        )

    def run(merge, checkpoint):
        stream = jobs.stream_source(
            spark, str(src / "*"), ev.schema, max_files_per_trigger=1
        )
        q = (
            stream.writeStream.foreachBatch(merge)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    armed = {"fired": False}
    with pytest.raises(Exception):
        run(
            _poisoned(jobs.sketch_store_merge(store, ["event_type"], "user_id"), 1, armed),
            ck,
        )
    assert armed["fired"]
    run(jobs.sketch_store_merge(store, ["event_type"], "user_id"), ck)  # restart

    run(jobs.sketch_store_merge(store2, ["event_type"], "user_id"), ck2)  # uninterrupted

    killed = {
        tuple(r)
        for r in jobs.read_sketch_rollup(spark, store, ["event_type"]).collect()
    }
    clean = {
        tuple(r)
        for r in jobs.read_sketch_rollup(spark, store2, ["event_type"]).collect()
    }
    assert killed == clean, "kill+restart must match the uninterrupted run exactly"


def test_streaming_doctor_lints_microbatch_plans(spark, tmp_path):
    """VERDICT r7 stretch #9: the doctor checklist runs INSIDE
    foreachBatch where streaming plans materialize. A seeded fatal
    anti-pattern (row-at-a-time Python UDF) gets a Failed doctor:stream:* ledger row and (with
    enforce) fails the query loudly on epoch 0; the production
    upsert_sink's clean merge plan gets a Success row."""
    import pytest as _pytest

    from data_warehouse_nhom8_spark.pipeline.ledger import RunLedger
    from data_warehouse_nhom8_spark.streaming.jobs import (
        lint_microbatch,
        run_available_now,
        stream_source,
        upsert_sink,
    )

    ledger = RunLedger(spark, str(tmp_path / "ledger"))
    src = tmp_path / "src"
    b1 = spark.createDataFrame(
        [("a", 1, 10), ("b", 2, 20)], "k string, seq long, v long"
    )
    b1.write.parquet(str(src / "f1"))

    # seeded anti-pattern: a row-at-a-time Python UDF in the batch
    # body (BatchEvalPython — deterministically fatal, unlike a
    # crossJoin which plans as a broadcast nested loop when tiny)
    from pyspark.sql.functions import udf

    bad_udf = udf(lambda x: x)
    failures = []

    def evil(batch, epoch_id):
        plan = batch.withColumn("bad", bad_udf("k"))
        try:
            lint_microbatch(
                plan, "evil", ledger=ledger, epoch_id=epoch_id, enforce=True
            )
        except ValueError as ex:
            failures.append(str(ex))
            raise

    stream = stream_source(spark, str(src / "*"), b1.schema)
    q = (
        stream.writeStream.foreachBatch(evil)
        .option("checkpointLocation", str(tmp_path / "ck_evil"))
        .trigger(availableNow=True)
        .start()
    )
    with _pytest.raises(Exception):
        q.awaitTermination()
    assert failures and "python-row-udf" in failures[0]
    rows = ledger._read().filter("process = 'doctor:stream:evil'").collect()
    assert any(r["status"] == "Failed" for r in rows)

    # production sink: clean plan → Success row, merge still lands
    stream2 = stream_source(spark, str(src / "*"), b1.schema)
    w = upsert_sink(
        stream2,
        str(tmp_path / "snap"),
        ["k"],
        ["seq"],
        str(tmp_path / "ck_up"),
        doctor_name="upsert",
        doctor_ledger=ledger,
        doctor_enforce=True,
    )
    run_available_now(w)
    rows = ledger._read().filter("process = 'doctor:stream:upsert'").collect()
    assert any(r["status"] == "Success" for r in rows)


def test_streaming_upsert_preserves_bucketed_layout(spark, tmp_path):
    """The streaming D1 face inherits the sticky bucket layout: a
    snapshot created bucketed stays bucketed through foreachBatch
    micro-batch merges (snapshot_overwrite inherit path), with merge
    results identical to the plain run."""
    from data_warehouse_nhom8_spark.sources.snapshots import (
        snapshot_bucket_spec,
        snapshot_overwrite,
    )

    src = tmp_path / "src"
    snap = str(tmp_path / "snap")
    seed = spark.createDataFrame(
        [("z", "seed", "2025-03-01")],
        "job_id string, salary string, extracted_date string",
    ).withColumn("extracted_date", F.col("extracted_date").cast("date"))
    snapshot_overwrite(seed, snap, bucket_by=["job_id"], n_buckets=4)

    b1 = spark.createDataFrame(
        [("a", "v1", "2025-03-10"), ("z", "newer", "2025-03-10")],
        "job_id string, salary string, extracted_date string",
    ).withColumn("extracted_date", F.col("extracted_date").cast("date"))
    b1.write.parquet(str(src / "f1"))

    stream = jobs.stream_source(spark, str(src / "*"), b1.schema)
    writer = jobs.upsert_sink(
        stream, snap, keys=["job_id"], order_by_cols=["extracted_date"],
        checkpoint=str(tmp_path / "ck"),
    )
    jobs.run_available_now(writer)
    assert snapshot_bucket_spec(snap) == {"cols": ["job_id"], "n": 4, "sorted": True}
    got = {r["job_id"]: r["salary"] for r in snapshot_read(spark, snap).collect()}
    assert got == {"a": "v1", "z": "newer"}


def test_span_store_streaming_equals_batch_and_replay_converges(spark, tmp_path):
    """Streaming span-dedup store: two micro-batches of documents
    through span_store_sink == the batch-built store over all docs;
    a REPLAYED epoch (same epoch_id driven twice through the exact
    production merge) leaves the store unchanged; the incremental
    detector over read_span_store matches the full detector."""
    from data_warehouse_nhom8_spark.operators.span_dedup import (
        duplicated_spans,
        duplicated_spans_incremental,
        span_store_build,
    )
    from data_warehouse_nhom8_spark.streaming.jobs import (
        compact_span_store,
        read_span_store,
        span_store_merge,
        span_store_sink,
    )

    shared = "one two three four five six seven eight nine ten"
    b1_rows = [(0, shared + " tail a"), (1, "totally different words here")]
    b2_rows = [(2, "prefix " + shared), (3, "more unrelated content")]
    b1 = spark.createDataFrame(b1_rows, "doc_id long, text string")
    b2 = spark.createDataFrame(b2_rows, "doc_id long, text string")
    src = tmp_path / "docs"
    b1.write.parquet(str(src / "f1"))
    store = str(tmp_path / "store")
    w = 4

    def drain():
        stream = jobs.stream_source(spark, str(src / "*"), b1.schema)
        q = (
            span_store_sink(stream, store, str(tmp_path / "ck"), window=w)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    b2.write.parquet(str(src / "f2"))
    drain()

    got = sorted(map(tuple, read_span_store(spark, store).collect()))
    want = sorted(
        map(tuple, span_store_build(b1.unionByName(b2), window=w).collect())
    )
    assert got == want

    # replay convergence: re-drive epoch 0's merge with b1 again
    span_store_merge(store, window=w)(b1, 0)
    assert sorted(map(tuple, read_span_store(spark, store).collect())) == want

    # offline compaction changes no counts
    compact_span_store(spark, store)
    assert sorted(map(tuple, read_span_store(spark, store).collect())) == want

    # incremental detector against the streamed store == full detector
    batch3 = spark.createDataFrame(
        [(9, "intro " + shared + " outro"), (10, "fresh unique text")],
        "doc_id long, text string",
    )
    inc = {
        tuple(r)
        for r in duplicated_spans_incremental(
            batch3, read_span_store(spark, store), window=w
        ).collect()
    }
    full = {
        tuple(r)
        for r in duplicated_spans(
            b1.unionByName(b2).unionByName(batch3), window=w
        ).collect()
        if r["doc_id"] >= 9
    }
    assert inc == full and inc


def test_url_store_first_seen_streaming_equals_batch_and_replay(spark, tmp_path):
    """Streaming canonical-URL first-seen registry (round-11, VERDICT
    r10 task 7): crawl batches through url_store_sink == a batch run
    ranking every doc by (epoch, md5-pri, id) per canon_url; a
    REPLAYED epoch (production merge re-driven with the same
    epoch_id) leaves the registry unchanged; draining an empty source
    is a no-op; recrawled URLs (same canon_url, later epoch) never
    displace the first sighting."""
    from pyspark.sql import Window

    from data_warehouse_nhom8_spark.operators.corpus import url_canonical_cols
    from data_warehouse_nhom8_spark.streaming.jobs import (
        read_url_store,
        url_store_merge,
        url_store_sink,
    )

    # b2 recrawls b1's URL 'a/1' under different raw variants and adds
    # fresh URLs; duplicate canon within b2 exercises the batch winner
    b1_rows = [
        (1, "HTTP://WWW.A.example.com:80/1/index.html"),
        (2, "https://b.Example.com/Two/"),
    ]
    b2_rows = [
        (3, "http://a.example.COM/1"),          # recrawl of b1's first
        (4, "https://c.example.com/Three?q=1"), # fresh
        (5, "https://c.example.com/Three#f"),   # same canon as id 4
    ]
    schema = "doc_id long, url string"
    b1 = spark.createDataFrame(b1_rows, schema)
    b2 = spark.createDataFrame(b2_rows, schema)
    src = tmp_path / "crawl"
    b1.write.parquet(str(src / "f1"))
    store = str(tmp_path / "urlstore")

    def drain():
        stream = jobs.stream_source(spark, str(src / "*"), b1.schema)
        q = (
            url_store_sink(stream, store, str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    b2.write.parquet(str(src / "f2"))
    drain()

    got = {
        r["canon_url"]: (r["doc_id"], r["epoch"])
        for r in read_url_store(spark, store).collect()
    }

    # batch twin: rank all docs by (epoch, md5 pri, id) per canon_url
    from pyspark.sql import functions as F  # noqa: F811

    allb = b1.withColumn("e", F.lit(0)).unionByName(b2.withColumn("e", F.lit(1)))
    cols = url_canonical_cols("url")
    pri = F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit("url0")))
    w = Window.partitionBy("canon_url").orderBy("e", "__pri", "doc_id")
    want = {
        r["canon_url"]: (r["doc_id"], r["e"])
        for r in allb.select(
            "doc_id", "e", cols["canon_url"].alias("canon_url")
        )
        .withColumn("__pri", pri)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .collect()
    }
    assert got == want
    # the recrawl kept the FIRST sighting, and both fresh canon URLs
    # resolved one winner each
    assert got["a.example.com/1"][1] == 0
    assert len(got) == 3

    # replay convergence: re-drive epoch 1's merge with b2 again
    url_store_merge(store)(b2, 1)
    got2 = {
        r["canon_url"]: (r["doc_id"], r["epoch"])
        for r in read_url_store(spark, store).collect()
    }
    assert got2 == want

    # drained empty source: no-op
    drain()
    got3 = {
        r["canon_url"]: (r["doc_id"], r["epoch"])
        for r in read_url_store(spark, store).collect()
    }
    assert got3 == want


def test_streaming_decontam_ingest_equals_batch_job(spark, tmp_path):
    """Decontamination-on-ingest: streaming corpus prep with a
    benchmark gram store must equal the batch run_corpus_prep with
    the SAME bench_grams/max_cont_fraction on the union — scrubbed
    text, drop-gated docs, chunks — and a drained replay converges."""
    import datetime

    from data_warehouse_nhom8_spark.operators.corpus import benchmark_gram_store
    from data_warehouse_nhom8_spark.pipeline import corpus_prep

    bench_text = " ".join(f"bm{i}" for i in range(60))
    bench = spark.createDataFrame(
        [(9001, bench_text)], "doc_id long, text string"
    )
    store = str(tmp_path / "bg_store")
    benchmark_gram_store(bench, store, gram_w=8)

    filler = lambda i: " ".join(f"w{i}t{j}" for j in range(40))  # noqa: E731
    texts = [
        (0, "the quick brown fox " + filler(0) + " of a day"),  # clean
        # light quote: scrubbed, survives the gate
        (1, "the story begins " + " ".join(f"bm{i}" for i in range(10, 18))
            + " " + filler(1)),
        # heavy quote: past salvage, dropped at the door
        (2, " ".join(f"bm{i}" for i in range(5, 55)) + " tail x"),
        (3, "another clean doc " + filler(3) + " end of text"),
    ]
    all_docs = spark.createDataFrame(texts, "doc_id long, text string")
    kw = dict(chunk_tokens=16, stride=8, bench_grams=store,
              decontam_gram_w=8, max_cont_fraction=0.5)

    ref_out = str(tmp_path / "batch")
    corpus_prep.run_corpus_prep(
        spark, all_docs, ref_out, datetime.date(2026, 1, 1), **kw
    )
    want_corpus = {tuple(r) for r in snapshot_read(spark, f"{ref_out}/corpus").collect()}
    want_chunks = {tuple(r) for r in snapshot_read(spark, f"{ref_out}/chunks").collect()}
    assert want_corpus and want_chunks
    assert 2 not in {t[0] for t in want_corpus}  # heavy doc gated out
    # the light doc's stored text is the SCRUBBED form
    light_text = next(t[1] for t in want_corpus if t[0] == 1)
    assert "bm10" not in light_text and "the story begins" in light_text

    src = tmp_path / "docs"
    spark.createDataFrame(texts[:2], "doc_id long, text string").write.parquet(str(src / "b1"))
    corpus_path = str(tmp_path / "corpus")
    chunks_path = str(tmp_path / "chunks")

    def drain():
        stream = jobs.stream_source(
            spark, str(src / "*"), all_docs.schema, max_files_per_trigger=1
        )
        writer = jobs.corpus_ingest_sink(
            stream, corpus_path, chunks_path,
            checkpoint=str(tmp_path / "ck"), **kw
        )
        jobs.run_available_now(writer)

    drain()
    spark.createDataFrame(texts[2:], "doc_id long, text string").write.parquet(str(src / "b2"))
    drain()
    got_corpus = {tuple(r) for r in jobs.read_corpus_store(spark, corpus_path).collect()}
    got_chunks = {tuple(r) for r in jobs.read_chunks_store(spark, chunks_path).collect()}
    assert got_corpus == want_corpus
    assert got_chunks == want_chunks

    drain()  # replay: nothing new, state unchanged
    assert {tuple(r) for r in jobs.read_corpus_store(spark, corpus_path).collect()} == want_corpus


def test_ivf_store_streaming_ingest_equals_batch_index(spark, tmp_path):
    """Streaming ANN ingest (round 11): embeddings arriving in two
    micro-batches, assigned against a FIXED offline-fit model, must
    serve the SAME top-k as the one-shot batch index on the union;
    a replayed epoch leaves the store unchanged; a re-sent id from a
    later epoch is ignored (first-seen)."""
    import numpy as np

    from data_warehouse_nhom8_spark.operators.similarity import (
        cosine_topk_ivf_probe,
        ivf_assign,
        ivf_fit_centroids,
        ivf_save_model,
    )
    from data_warehouse_nhom8_spark.streaming.jobs import (
        ivf_store_merge,
        ivf_store_sink,
        read_ivf_store,
    )

    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(120, 8)).astype("float32")
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    schema = "vec_id long, embedding array<float>"
    all_df = spark.createDataFrame(rows, schema)

    model_path = str(tmp_path / "ivf_model")
    centroids = ivf_fit_centroids(all_df, n_centroids=4, iters=3)
    ivf_save_model(centroids, model_path)

    src = tmp_path / "emb"
    spark.createDataFrame(rows[:70], schema).write.parquet(str(src / "f1"))
    store = str(tmp_path / "ivfstore")

    def drain():
        stream = jobs.stream_source(spark, str(src / "*"), all_df.schema)
        q = (
            ivf_store_sink(stream, model_path, store, str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    spark.createDataFrame(rows[70:], schema).write.parquet(str(src / "f2"))
    drain()

    q_vec = [float(x) for x in vecs[0]]
    got = [
        (r["vec_id"], r["cosine"])
        for r in cosine_topk_ivf_probe(
            read_ivf_store(spark, store), centroids, q_vec, k=5, n_probe=2
        ).collect()
    ]
    # batch twin: the same probe over a one-shot assignment of the union
    want_index = ivf_assign(all_df, centroids)
    want = [
        (r["vec_id"], r["cosine"])
        for r in cosine_topk_ivf_probe(
            want_index.withColumnRenamed("__v", "v").withColumnRenamed("v", "__v"),
            centroids, q_vec, k=5, n_probe=2,
        ).collect()
    ]
    assert got == want and len(got) == 5

    def snap():
        return {
            (r["vec_id"], tuple(r["__v"]), r["cluster"])
            for r in read_ivf_store(spark, store).collect()
        }

    before = snap()
    # replay convergence: re-drive epoch 1's merge with the same batch
    ivf_store_merge(model_path, store)(spark.createDataFrame(rows[70:], schema), 1)
    assert snap() == before
    # first-seen: id 0 re-sent in a later epoch (even with a DIFFERENT
    # vector) is ignored — the original row stands
    mutated = [(0, [float(x) for x in rng.normal(size=8)])]
    ivf_store_merge(model_path, store)(spark.createDataFrame(mutated, schema), 7)
    assert snap() == before


def test_ivf_store_dedups_duplicate_ids_within_one_batch(spark, tmp_path):
    """Round-12 ADVICE fix: duplicate vec_ids arriving in a SINGLE
    micro-batch must admit exactly one deterministic row (previously
    the merge only anti-joined against PRIOR epochs, so in-batch
    duplicates all landed, violating read_ivf_store's
    one-row-per-id-ever contract and duplicating probe results)."""
    import numpy as np

    from data_warehouse_nhom8_spark.operators.similarity import (
        ivf_fit_centroids,
        ivf_save_model,
    )
    from data_warehouse_nhom8_spark.streaming.jobs import (
        ivf_store_merge,
        read_ivf_store,
    )

    rng = np.random.default_rng(7)
    base = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(20)]
    schema = "vec_id long, embedding array<float>"
    all_df = spark.createDataFrame(base, schema)
    model_path = str(tmp_path / "model")
    ivf_save_model(ivf_fit_centroids(all_df, n_centroids=2, iters=2), model_path)
    store = str(tmp_path / "store")

    dup_vec_a = [float(x) for x in rng.normal(size=8)]
    dup_vec_b = [float(x) for x in rng.normal(size=8)]
    batch = base[:5] + [(99, dup_vec_a), (99, dup_vec_b), (99, dup_vec_a)]
    merge = ivf_store_merge(model_path, store)
    merge(spark.createDataFrame(batch, schema), 0)

    rows = read_ivf_store(spark, store).collect()
    ids = [r["vec_id"] for r in rows]
    assert sorted(ids) == sorted(set(ids)), "duplicate id admitted"
    assert ids.count(99) == 1
    winner = next(tuple(r["__v"]) for r in rows if r["vec_id"] == 99)
    # deterministic winner: re-running the same batch as a replay
    # (same epoch) and as a fresh store yields the same row
    merge(spark.createDataFrame(batch, schema), 0)
    again = next(
        tuple(r["__v"])
        for r in read_ivf_store(spark, store).collect()
        if r["vec_id"] == 99
    )
    assert again == winner


def test_streaming_html_ingest_equals_batch_job(spark, tmp_path):
    """HTML-on-ingest: streaming corpus prep over raw-HTML batches
    must equal the batch run_corpus_prep with the same html_col on
    the union — markup stripped before quality gates, so a doc whose
    TEXT passes but whose markup would fail length gates is judged on
    text."""
    import datetime

    from data_warehouse_nhom8_spark.pipeline import corpus_prep

    def wrap(i, body):
        return (
            i,
            f"<html><head><title>D{i}</title><style>p{{x}}</style></head>"
            f"<body><p>{body}</p><script>var a=1;</script></body></html>",
        )

    texts = [
        wrap(i, "the quick brown fox " + " ".join(f"w{i}t{j}" for j in range(40)) + " of a day")
        for i in range(6)
    ]
    all_docs = spark.createDataFrame(texts, "doc_id long, html string")
    kw = dict(chunk_tokens=16, stride=8, html_col="html")

    ref_out = str(tmp_path / "batch")
    corpus_prep.run_corpus_prep(
        spark, all_docs, ref_out, datetime.date(2026, 1, 2), **kw
    )
    want_corpus = {tuple(r) for r in snapshot_read(spark, f"{ref_out}/corpus").collect()}
    assert want_corpus
    # markup never reaches the corpus table
    assert all("<" not in t[1] for t in want_corpus)

    src = tmp_path / "docs"
    spark.createDataFrame(texts[:3], "doc_id long, html string").write.parquet(str(src / "b1"))
    corpus_path = str(tmp_path / "corpus")
    chunks_path = str(tmp_path / "chunks")

    def drain():
        stream = jobs.stream_source(
            spark, str(src / "*"), all_docs.schema, max_files_per_trigger=1
        )
        writer = jobs.corpus_ingest_sink(
            stream, corpus_path, chunks_path,
            checkpoint=str(tmp_path / "ck"), **kw
        )
        jobs.run_available_now(writer)

    drain()
    spark.createDataFrame(texts[3:], "doc_id long, html string").write.parquet(str(src / "b2"))
    drain()
    got_corpus = {tuple(r) for r in jobs.read_corpus_store(spark, corpus_path).collect()}
    assert got_corpus == want_corpus


def test_compacted_url_store_antijoin_shuffles_only_the_batch(spark, tmp_path):
    """The 100 TB claim in url_store_merge's docstring, pinned in the
    plan: after compact_url_store (bucketed base on canon_url), the
    first-seen anti-join carries the store's bucket distribution — the
    ONLY hashpartitioning exchange is the batch side. Broadcast is
    disabled so the dim-sized test store can't cheat its way out of
    the join shape a 10^10-row registry would face."""
    import re

    from data_warehouse_nhom8_spark.sources.snapshots import (
        epoch_append,
        epoch_read,
    )

    s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    store = str(tmp_path / "url")
    rows = s.range(50_000).select(
        F.concat(F.lit("https://ex.com/"), F.col("id").cast("string")).alias(
            "canon_url"
        ),
        F.lit("ex.com").alias("domain"),
        F.col("id").alias("doc_id"),
        F.lit(0).cast("long").alias("epoch"),
    )
    epoch_append(rows, store, 0)
    jobs.compact_url_store(s, store)
    prior = epoch_read(s, store)
    batch = s.range(100).select(
        F.concat(F.lit("https://ex.com/x"), F.col("id").cast("string")).alias(
            "canon_url"
        )
    )
    fresh = batch.join(prior.select("canon_url"), "canon_url", "left_anti")
    p = fresh._jdf.queryExecution().executedPlan().toString()
    n_hash_ex = len(re.findall(r"Exchange hashpartitioning", p))
    assert n_hash_ex == 1, p  # the batch side; the bucketed store stays put
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
    assert fresh.count() == 100  # all new URLs admitted (disjoint prefix)

    # MID-STREAM (round 12 split anti-join): live epochs on top of the
    # bucketed base must NOT cost the base its distribution — the
    # merge antis the parts sequentially, so the plan still carries
    # exactly one batch-side exchange per base-anti (the epoch tail is
    # broadcast-sized and adds no hashpartitioning of the store).
    from data_warehouse_nhom8_spark.sources.snapshots import epoch_read_parts

    epoch_append(
        s.createDataFrame(
            [("https://ex.com/tail1", "ex.com", 1_000_001, 7)],
            "canon_url string, domain string, doc_id long, epoch long",
        ),
        store,
        7,
    )
    base, tail = epoch_read_parts(s, store)
    assert base is not None and tail is not None
    staged = batch.join(base.select("canon_url"), "canon_url", "left_anti")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    staged = staged.join(tail.select("canon_url"), "canon_url", "left_anti")
    p2 = staged._jdf.queryExecution().executedPlan().toString()
    base_side_ex = len(re.findall(r"Exchange hashpartitioning", p2))
    assert base_side_ex <= 2, p2  # batch-side only; never the full store
    assert "BroadcastHashJoin" in p2  # the epoch tail broadcasts
    assert staged.count() == 100


def test_epoch_compact_refuses_while_writer_stream_is_active(
    spark, events_dir, events_schema, tmp_path
):
    """The epoch folds' OFFLINE contract, enforced mechanically
    (round 13): compaction against a store whose registered writer
    stream is still active must raise; after a clean stop the same
    compact succeeds. The sink registers its checkpoint in the store
    dir; the guard resolves it to the checkpoint's persistent query
    id and checks spark.streams.active."""
    import time

    from data_warehouse_nhom8_spark.sources.snapshots import epoch_ids

    store = str(tmp_path / "sketch_store")
    ck = str(tmp_path / "ck")
    writer = jobs.sketch_rollup_sink(
        jobs.stream_source(spark, events_dir, events_schema, max_files_per_trigger=1),
        store,
        fine_keys=["event_type"],
        distinct_col="user_id",
        checkpoint=ck,
    )
    q = writer.trigger(processingTime="500 milliseconds").start()
    try:
        deadline = time.time() + 60
        while not epoch_ids(store):
            assert time.time() < deadline, "no epoch committed within 60s"
            time.sleep(0.2)
        with pytest.raises(RuntimeError, match="still active"):
            jobs.compact_sketch_store(spark, store, ["event_type"])
    finally:
        q.stop()
        q.awaitTermination()
    jobs.compact_sketch_store(spark, store, ["event_type"])  # offline: fine
    assert epoch_ids(store) == []


def test_lww_read_tail_broadcast_is_size_guarded(spark, tmp_path, monkeypatch):
    """_lww_read force-broadcasts the live epoch tail's key set only
    when the tail's on-disk bytes are under the ceiling; above it the
    read degrades to a plain (shuffle-able) anti join with identical
    rows — a lagging compaction slows down, it must never OOM."""
    from data_warehouse_nhom8_spark.sources.snapshots import (
        epoch_append,
        snapshot_overwrite,
    )

    path = str(tmp_path / "store")
    base = spark.createDataFrame(
        [(1, "a", -1), (2, "b", -1)], "k long, v string, epoch long"
    )
    snapshot_overwrite(base, path)
    epoch_append(
        spark.createDataFrame([(2, "b2", 0)], "k long, v string, epoch long"),
        path,
        0,
    )

    def read():
        return jobs._lww_read(spark, path, ["k"], [F.desc("v")])

    small = read()
    assert "Broadcast" in small._jdf.queryExecution().executedPlan().toString()
    rows_small = {tuple(r) for r in small.collect()}

    monkeypatch.setattr(jobs, "_TAIL_BROADCAST_MAX_BYTES", 0)
    big = read()
    # no FORCED broadcast hint on the anti join's logical plan
    assert "ResolvedHint" not in big._jdf.queryExecution().logical().toString()
    assert {tuple(r) for r in big.collect()} == rows_small == {(1, "a"), (2, "b2")}


def test_no_raw_epoch_stamps_in_sinks():
    """Source tripwire: every store face must stamp rows via
    on_disk_epoch (stream id + re-registration rebase). A raw
    F.lit(epoch_id) stamp would silently lose LWW resolution to an
    older stream's higher ids after a checkpoint re-registration —
    the exact bug class fixed this round."""
    src = open(jobs.__file__.replace(".pyc", ".py")).read()
    assert "F.lit(epoch_id)" not in src, (
        "raw epoch stamp found in streaming/jobs.py — stamp with "
        "F.lit(on_disk_epoch(<store_path>, epoch_id)) instead"
    )


def test_lww_winner_after_checkpoint_reregistration(spark, tmp_path):
    """After a store is re-pointed at a NEW checkpoint (last-writer-
    wins re-registration), the new writer's rows must WIN LWW
    resolution even though its stream epoch ids restart at 0: the
    sinks stamp rows with `on_disk_epoch` (stream id + rebase), so
    desc(epoch) ordering agrees with the log — a raw stamp of 0 would
    LOSE against the old stream's higher ids."""
    from data_warehouse_nhom8_spark.sources.snapshots import (
        epoch_append,
        on_disk_epoch,
        register_store_checkpoint,
    )

    path = str(tmp_path / "store")
    register_store_checkpoint(path, str(tmp_path / "ckA"))

    def put(eid, k, v):
        df = spark.createDataFrame(
            [(k, v, on_disk_epoch(path, eid))], "k long, v string, epoch long"
        )
        epoch_append(df, path, eid)

    put(0, 1, "old0")
    put(5, 1, "old5")
    register_store_checkpoint(path, str(tmp_path / "ckB"))
    put(0, 1, "new0")  # stream B's ids restart at 0
    got = {tuple(r) for r in jobs._lww_read(spark, path, ["k"], []).collect()}
    assert got == {(1, "new0")}, got


def test_partitioned_upsert_sink_rewrites_only_touched_partitions(spark, tmp_path):
    """Partition-grain streaming MERGE (round 13): a micro-batch that
    touches one date partition must leave every other partition's
    files byte-identical on disk (same paths, sizes, mtimes) — the
    partitioned mirror of test_epoch_append_io_is_batch_sized — while
    the merged table equals the batch last-writer-wins state."""
    import os

    src = tmp_path / "src"
    table = str(tmp_path / "table")
    schema_s = "k string, v string, day string"

    def mk(rows, tag):
        df = spark.createDataFrame(rows, schema_s).withColumn(
            "day", F.col("day").cast("date")
        )
        df.write.parquet(str(src / tag))
        return df

    b1 = mk(
        [
            ("a", "a1", "2025-03-10"),
            ("b", "b1", "2025-03-11"),
            ("c", "c1", "2025-03-12"),
        ],
        "f1",
    )
    writer = jobs.upsert_sink_partitioned(
        jobs.stream_source(spark, str(src / "*"), b1.schema),
        table,
        keys=["k"],
        order_by_cols=["day"],
        partition_col="day",
        checkpoint=str(tmp_path / "ck"),
    )
    jobs.run_available_now(writer)
    parts = sorted(p for p in os.listdir(table) if p.startswith("day="))
    assert parts == ["day=2025-03-10", "day=2025-03-11", "day=2025-03-12"]

    def listing(part):
        d = os.path.join(table, part)
        return sorted(
            (f, os.path.getsize(os.path.join(d, f)), os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    untouched_before = {p: listing(p) for p in parts if p != "day=2025-03-11"}

    # batch 2 touches ONLY 2025-03-11 (update b, insert d)
    mk([("b", "b2", "2025-03-11"), ("d", "d1", "2025-03-11")], "f2")
    jobs.run_available_now(
        jobs.upsert_sink_partitioned(
            jobs.stream_source(spark, str(src / "*"), b1.schema),
            table,
            keys=["k"],
            order_by_cols=["day"],
            partition_col="day",
            checkpoint=str(tmp_path / "ck"),
        )
    )
    got = {r["k"]: r["v"] for r in spark.read.parquet(table).collect()}
    assert got == {"a": "a1", "b": "b2", "c": "c1", "d": "d1"}
    # the untouched partitions were neither rewritten nor re-listed
    for p, before in untouched_before.items():
        assert listing(p) == before, p


def test_partitioned_upsert_preserves_null_partition_rows(spark, tmp_path):
    """NULL partition values are real rows (hive's
    __HIVE_DEFAULT_PARTITION__ directory, which dynamic overwrite WILL
    replace), but an equi semi-join never matches NULL keys — the sink
    must read the null partition back through an IsNull predicate or a
    later null-partition batch silently erases every earlier
    null-partition key."""
    src = tmp_path / "src"
    table = str(tmp_path / "table")
    schema_s = "k string, v string, day string"

    def mk(rows, tag):
        df = spark.createDataFrame(rows, schema_s).withColumn(
            "day", F.col("day").cast("date")
        )
        df.write.parquet(str(src / tag))
        return df

    def run():
        jobs.run_available_now(
            jobs.upsert_sink_partitioned(
                jobs.stream_source(spark, str(src / "*"), b1.schema),
                table,
                keys=["k"],
                order_by_cols=["day"],
                partition_col="day",
                checkpoint=str(tmp_path / "ck"),
            )
        )

    b1 = mk([("a", "a1", None), ("b", "b1", "2025-03-11")], "f1")
    run()
    # batch 2 touches ONLY the null partition with a different key:
    # pre-fix the overwrite replaced the directory with just 'c'
    mk([("c", "c1", None)], "f2")
    run()
    got = {r["k"]: (r["v"], r["day"]) for r in spark.read.parquet(table).collect()}
    assert got == {
        "a": ("a1", None),
        "b": ("b1", __import__("datetime").date(2025, 3, 11)),
        "c": ("c1", None),
    }, got


def test_partitioned_upsert_readback_does_not_retype_string_partitions(
    spark, tmp_path
):
    """The read-back pins the batch's schema: partition-directory type
    INFERENCE would re-type a zero-padded STRING day ('00123') as INT
    and the next merge would write a NEW day=123 directory, leaving
    the old day=00123 rows behind as permanent stale duplicates."""
    import os

    src = tmp_path / "src"
    table = str(tmp_path / "table")
    schema_s = "k string, v string, day string"

    def run(schema):
        jobs.run_available_now(
            jobs.upsert_sink_partitioned(
                jobs.stream_source(spark, str(src / "*"), schema),
                table,
                keys=["k"],
                order_by_cols=["v"],
                partition_col="day",
                checkpoint=str(tmp_path / "ck"),
            )
        )

    b1 = spark.createDataFrame([("a", "a1", "00123")], schema_s)
    b1.write.parquet(str(src / "f1"))
    run(b1.schema)
    spark.createDataFrame([("a", "a2", "00123")], schema_s).write.parquet(
        str(src / "f2")
    )
    run(b1.schema)
    parts = sorted(p for p in os.listdir(table) if p.startswith("day="))
    assert parts == ["day=00123"], parts
    rows = [(r["k"], r["v"], r["day"]) for r in spark.read.schema(b1.schema).parquet(table).collect()]
    assert rows == [("a", "a2", "00123")], rows


def test_partitioned_upsert_survives_static_overwrite_session(spark, tmp_path):
    """The writer pins partitionOverwriteMode=dynamic on itself: a
    session whose ambient conf is Spark's stock STATIC default must
    still rewrite only the touched partitions (static mode would
    delete the whole table tree on mode=overwrite — every untouched
    partition gone)."""
    import os

    src = tmp_path / "src"
    table = str(tmp_path / "table")
    schema_s = "k string, v string, day string"

    def mk(rows, tag):
        df = spark.createDataFrame(rows, schema_s).withColumn(
            "day", F.col("day").cast("date")
        )
        df.write.parquet(str(src / tag))
        return df

    b1 = mk([("a", "a1", "2025-03-10"), ("b", "b1", "2025-03-11")], "f1")
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        jobs.run_available_now(
            jobs.upsert_sink_partitioned(
                jobs.stream_source(spark, str(src / "*"), b1.schema),
                table,
                keys=["k"],
                order_by_cols=["day"],
                partition_col="day",
                checkpoint=str(tmp_path / "ck"),
            )
        )
        mk([("b", "b2", "2025-03-11")], "f2")
        jobs.run_available_now(
            jobs.upsert_sink_partitioned(
                jobs.stream_source(spark, str(src / "*"), b1.schema),
                table,
                keys=["k"],
                order_by_cols=["day"],
                partition_col="day",
                checkpoint=str(tmp_path / "ck"),
            )
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    assert sorted(
        p for p in os.listdir(table) if p.startswith("day=")
    ) == ["day=2025-03-10", "day=2025-03-11"], "untouched partition must survive"
    got = {r["k"]: r["v"] for r in spark.read.parquet(table).collect()}
    assert got == {"a": "a1", "b": "b2"}


def test_partitioned_upsert_listing_is_bounded_to_touched_dirs(spark, tmp_path):
    """r13 verdict task 3: the merge read-back's file index must touch
    only the K(+NULL) partition directories the batch names — never
    the full hive tree. The path constructor is pinned against
    directories SPARK'S OWN WRITER created for every value class the
    contract admits (strings incl. metachars needing percent-escape,
    zero-padded strings, ints, dates, NULL, empty string)."""
    import datetime
    import os

    table = str(tmp_path / "t")
    vals = ["plain", "a b", "a:b", "a/b", "00123", "", None]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "k long, p string")
    df.write.partitionBy("p").parquet(table)
    on_disk = sorted(d for d in os.listdir(table) if d.startswith("p="))
    # constructor reproduces Spark's dir name for EVERY written value
    built = sorted({jobs._hive_part_dirname("p", v) for v in vals})
    assert built == on_disk, (built, on_disk)

    # int and date partition values against Spark's writer too
    for typed_vals, schema in [
        ([1, 123], "k long, p long"),
        ([datetime.date(2025, 3, 10)], "k long, p date"),
    ]:
        t2 = str(tmp_path / f"t_{schema.split(',')[1].strip().replace(' ', '_')}")
        spark.createDataFrame(
            [(i, v) for i, v in enumerate(typed_vals)], schema
        ).write.partitionBy("p").parquet(t2)
        for v in typed_vals:
            assert os.path.isdir(os.path.join(t2, jobs._hive_part_dirname("p", v)))

    # the file index is O(K): a batch naming 2 of the 7 partitions
    # (plus one value with no directory yet) yields exactly those 2
    # paths — the untouched tree is never listed
    got = jobs._touched_partition_paths(table, "p", ["plain", "a b", "brand-new"])
    assert got == sorted(
        os.path.join(table, jobs._hive_part_dirname("p", v)) for v in ["plain", "a b"]
    )
    # NULL and empty string resolve to the single hive default dir
    got = jobs._touched_partition_paths(table, "p", [None, ""])
    assert got == [os.path.join(table, "p=__HIVE_DEFAULT_PARTITION__")]


def test_partitioned_upsert_refuses_unrenderable_partition_types(spark, tmp_path):
    """r14 review finding: the explicit-path read-back renders
    partition values with Python str(), which diverges from Spark's
    own directory rendering for double (1.2345678E7 vs 12345678.0)
    and fractional-second timestamp values — a missed directory means
    the dynamic overwrite silently DELETES that partition's committed
    rows. The sink must refuse such partition columns at CONSTRUCTION
    time, and keep accepting the pinned-safe types."""
    import pytest as _pytest

    def sink_for(schema_s, cast=None):
        df = spark.createDataFrame([], schema_s)
        if cast is not None:
            df = df.withColumn("p", F.col("p").cast(cast))
        return jobs.upsert_sink_partitioned(
            jobs.stream_source(spark, str(tmp_path / "none*"), df.schema),
            str(tmp_path / "t"),
            keys=["k"],
            order_by_cols=["v"],
            partition_col="p",
            checkpoint=str(tmp_path / "ck"),
        )

    for bad, cast in [
        ("k string, v string, p double", None),
        ("k string, v string, p float", None),
        ("k string, v string, p string", "timestamp"),
        ("k string, v string, p string", "decimal(10,2)"),
    ]:
        with _pytest.raises(TypeError, match="partition column"):
            sink_for(bad, cast)

    # the pinned-safe types still construct
    for ok, cast in [
        ("k string, v string, p string", None),
        ("k string, v string, p int", None),
        ("k string, v string, p long", None),
        ("k string, v string, p string", "date"),
        ("k string, v string, p boolean", None),
    ]:
        assert sink_for(ok, cast) is not None
