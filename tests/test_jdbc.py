"""S5 JDBC connector contract — no driver jar ships in this
environment, so the tests pin (1) the option-building contract and
(2) that read_jdbc wires those options into Spark's real JDBC source
(which parses them and then fails on the missing driver, not on bad
options)."""

from __future__ import annotations

import pytest

from data_warehouse_nhom8_spark.sources.jdbc import (
    jdbc_read_options,
    jdbc_write_options,
    read_jdbc,
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


def test_read_jdbc_reaches_spark_jdbc_source(spark):
    """The options must survive the full PySpark plumbing into the JVM
    JDBC relation provider: with a valid option set, the FIRST failure
    is the missing driver (connection attempt), not option parsing."""
    with pytest.raises(Exception, match="(?i)driver|connection"):
        read_jdbc(spark, URL, "t", "u", "p")
