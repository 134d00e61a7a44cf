"""Salted skew join correctness + the SQL API surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.operators.joins import norm_key, salted_join
from data_warehouse_nhom8_spark.sql_api import sql
from tests.conftest import SF_DIR


def _skewed_fixture(spark):
    # 'hot' carries 80% of rows — the company_name-style hot key
    big = spark.createDataFrame(
        [("hot", i) for i in range(400)] + [(f"k{i % 20}", i) for i in range(100)],
        "key string, v long",
    )
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(20)] + [("orphan", "X")],
        "key string, label string",
    )
    return big, dim


def test_salted_join_equals_plain_inner(spark):
    big, dim = _skewed_fixture(spark)
    plain = {(r["key"], r["v"], r["label"]) for r in big.join(dim, "key").collect()}
    salted = {
        (r["key"], r["v"], r["label"])
        for r in salted_join(big, dim, "key", n_salts=4).collect()
    }
    assert salted == plain
    assert len(salted) == 500  # every big row matched exactly once


def test_salted_join_left(spark):
    big, dim = _skewed_fixture(spark)
    no_match = big.unionByName(
        spark.createDataFrame([("missing", 1)], "key string, v long")
    )
    plain = {
        (r["key"], r["v"], r["label"])
        for r in no_match.join(dim, "key", "left").collect()
    }
    salted = {
        (r["key"], r["v"], r["label"])
        for r in salted_join(no_match, dim, "key", n_salts=4, how="left").collect()
    }
    assert salted == plain  # unmatched rows kept exactly once with NULL label


def test_salted_join_deterministic_across_runs(spark):
    """Same inputs ⇒ identical salted result twice in a row — the salt
    must not depend on partition layout (round-1 verdict #6:
    monotonically_increasing_id changed under retries/reruns)."""
    big, dim = _skewed_fixture(spark)
    run = lambda: sorted(
        (r["key"], r["v"], r["label"])
        for r in salted_join(big.repartition(7), dim, "key", n_salts=4).collect()
    )
    first = run()
    second = run()
    assert first == second
    # and a different partitioning of the same data gives the same result
    third = sorted(
        (r["key"], r["v"], r["label"])
        for r in salted_join(big.repartition(3), dim, "key", n_salts=4).collect()
    )
    assert first == third


def test_norm_key_accent_and_case_insensitive(spark):
    """The generic join-key normalizer carries full utf8mb4_unicode_ci
    parity (case AND accents) — one helper, same semantics as SCD2."""
    left = spark.createDataFrame([("Hà Nội", 1), ("Sài Gòn", 2)], "city string, a long")
    right = spark.createDataFrame([("ha noi", "north"), ("SAI GON", "south")], "city string, side string")
    j = (
        left.select(norm_key("city").alias("k"), "a")
        .join(right.select(norm_key("city").alias("k"), "side"), on="k")
        .select("a", "side")
    )
    assert sorted((r["a"], r["side"]) for r in j.collect()) == [(1, "north"), (2, "south")]


def test_sql_api(spark):
    df = sql(
        spark,
        SF_DIR,
        """
        SELECT c_mktsegment, COUNT(*) AS total
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
    )
    rows = df.collect()
    assert sum(r["total"] for r in rows) == sql(spark, SF_DIR, "SELECT * FROM customer").count()


def test_sql_api_joins_all_tables(spark):
    df = sql(
        spark,
        SF_DIR,
        """
        SELECT r.r_name, COUNT(DISTINCT c.c_custkey) AS n
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
        """,
    )
    assert df.count() == 5  # all regions represented


def test_asof_join_semantics(spark):
    """Ties are inclusive (right at the same instant wins), missing
    prior rows yield NULLs, and a legitimately-NULL payload column is
    carried as NULL instead of skipped to an older row."""
    from data_warehouse_nhom8_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, None), (2, 99, 7.0)],
        "k long, t long, v double",
    )
    out = {
        r["tag"]: (r["asof_v"], r["asof_t"])
        for r in asof_join(left, right, ["k"], "t", "t", ["v", "t"]).collect()
    }
    assert out["a"] == (100.0, 10)   # tie at t=10 included
    assert out["b"] == (None, 15)    # newest prior row has NULL v — kept NULL
    assert out["c"] == (None, None)  # nothing at-or-before t=5
    assert out["d"] == (None, None)  # right exists only later


def test_interval_range_join_boundaries(spark):
    """[start, end) semantics across bucket boundaries: an interval
    spanning multiple buckets matches events in each, end is
    exclusive, start inclusive."""
    from data_warehouse_nhom8_spark.operators.joins import interval_range_join

    events = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 05:59:59"),
         (3, "2024-01-01 06:00:00"), (4, "2024-01-01 13:00:00")],
        "event_id long, ts string",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"))
    iv = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "2024-01-01 06:00:00"),   # 1 bucket
         (11, "2024-01-01 05:00:00", "2024-01-01 14:00:00")],  # 3 buckets
        "w_id long, s string, e string",
    ).select("w_id", F.col("s").cast("timestamp").alias("s"), F.col("e").cast("timestamp").alias("e"))
    got = {
        (r["event_id"], r["w_id"])
        for r in interval_range_join(events, iv, "ts", "s", "e").collect()
    }
    assert got == {(1, 10), (2, 10), (2, 11), (3, 11), (4, 11)}


def test_runtime_bloom_filter_semi_join_reduction(spark):
    """Spark's runtime Bloom-filter join (semi-join reduction): with a
    selective filter on the build side of a shuffle join, the PROBE
    side gets `might_contain(bloom(build keys))` injected BEFORE its
    shuffle — rows that cannot match never leave the mapper. In
    production the defaults activate this at >=10 GB probe scans; the
    test lowers the thresholds to exercise it on local data. At 100 TB
    this is the difference between shuffling the whole fact and
    shuffling the ~matching fraction."""
    from tests.conftest import SF_DIR

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in p, p[:1200]
        assert "bloom_filter_agg" in p
        # and the result is unchanged by the reduction: collect the
        # bloom-ON result first, THEN the bloom-OFF twin (the optimizer
        # rule reads the conf at action time, so the off-switch must be
        # live during the second collect)
        with_bloom = j.collect()
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        without_bloom = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
            .collect()
        )
        assert with_bloom == without_bloom
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
