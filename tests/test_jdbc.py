"""S5/S6 JDBC connector contract, executed LIVE against embedded
Derby (the JDBC driver PySpark ships for its Hive metastore — on the
executor classpath in every Spark distribution). The reference's
MySQL URLs swap in with no code change; what these tests pin is the
real JDBC execution path: batched write, overwrite/append modes,
range-partitioned parallel read, and predicate pushdown into the
database (plan-gated on PushedFilters).

The option-building contract stays unit-tested separately so a
misconfigured option fails fast with a python-side error, not a
42-frame JVM trace.
"""

from __future__ import annotations

import pytest

from data_warehouse_nhom8_spark.sources.jdbc import (
    jdbc_read_options,
    jdbc_write_options,
    read_jdbc,
    write_jdbc,
)

URL = "jdbc:mysql://db.example:3306/warehouse"


def test_read_options_basic():
    opts = jdbc_read_options(URL, "staging_jobs", "u", "p")
    assert opts["url"] == URL
    assert opts["dbtable"] == "staging_jobs"
    assert opts["fetchsize"] == "10000"  # never an unbatched serial read
    assert "partitionColumn" not in opts


def test_read_options_partitioned():
    opts = jdbc_read_options(
        URL, "staging_jobs", "u", "p",
        partition_column="job_sk", num_partitions=16,
        lower_bound=1, upper_bound=1_000_000,
    )
    assert opts["partitionColumn"] == "job_sk"
    assert opts["numPartitions"] == "16"
    assert (opts["lowerBound"], opts["upperBound"]) == ("1", "1000000")


def test_read_options_partitioned_requires_bounds():
    with pytest.raises(ValueError, match="lower_bound/upper_bound"):
        jdbc_read_options(URL, "t", "u", "p", partition_column="job_sk")


def test_write_options_batched():
    opts = jdbc_write_options(URL, "dm_table", "u", "p", batchsize=5000)
    assert opts["batchsize"] == "5000"
    assert opts["dbtable"] == "dm_table"


def test_read_jdbc_unreachable_db_fails_on_connection_not_options(spark):
    """With a valid option set, the FIRST failure against a dead URL
    is the driver/connection, not option parsing."""
    with pytest.raises(Exception, match="(?i)driver|connection"):
        read_jdbc(spark, URL, "t", "u", "p")


# ------------------------------------------------ live Derby round-trip

@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "db"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_write_read_roundtrip(spark, derby_url):
    df = spark.range(0, 100).selectExpr(
        "id", "cast(id * 2 as double) as v", "concat('row-', id) as s"
    )
    write_jdbc(df, derby_url, "T_ROUNDTRIP", "app", "app", mode="overwrite", batchsize=50)
    back = read_jdbc(spark, derby_url, "T_ROUNDTRIP", "app", "app")
    rows = {r["id"]: (r["v"], r["s"]) for r in back.collect()}
    assert len(rows) == 100
    assert rows[7] == (14.0, "row-7")


def test_jdbc_append_mode(spark, derby_url):
    df = spark.range(0, 10).selectExpr("id", "cast(id as double) as v", "'a' as s")
    write_jdbc(df, derby_url, "T_APPEND", "app", "app", mode="overwrite")
    write_jdbc(df, derby_url, "T_APPEND", "app", "app", mode="append")
    assert read_jdbc(spark, derby_url, "T_APPEND", "app", "app").count() == 20


def test_jdbc_partitioned_read_parallelism(spark, derby_url):
    """partitionColumn + bounds must yield num_partitions concurrent
    range queries (the parallel-scan contract), covering all rows with
    no dupes at the stride boundaries."""
    df = spark.range(0, 1000).selectExpr("id", "cast(id as double) as v", "'x' as s")
    write_jdbc(df, derby_url, "T_PART", "app", "app", mode="overwrite")
    back = read_jdbc(
        spark, derby_url, "T_PART", "app", "app",
        partition_column="id", num_partitions=4, lower_bound=0, upper_bound=1000,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
    assert back.select("id").distinct().count() == 1000


def test_jdbc_predicate_pushdown_plan(spark, derby_url):
    """Filters must reach the database as PushedFilters — scanning the
    whole remote table to filter Spark-side is wrong at any scale."""
    df = spark.range(0, 200).selectExpr("id", "cast(id as double) as v", "'x' as s")
    write_jdbc(df, derby_url, "T_PUSH", "app", "app", mode="overwrite")
    flt = read_jdbc(spark, derby_url, "T_PUSH", "app", "app").filter("id < 10")
    plan = flt._jdf.queryExecution().executedPlan().toString()
    norm = plan.replace('"', "").lower()
    assert "pushedfilters" in norm and "lessthan(id,10)" in norm, plan
    assert flt.count() == 10
