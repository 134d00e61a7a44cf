"""Loader smoke test over every scale factor.

Round-4 postmortem: the driver regenerated /root/testdata with
``events.ts`` as parquet TIMESTAMP(MICROS) while the loader still
applied the round-1 TIMESTAMP(NANOS) workaround, and nothing in the
suite caught it — 8 CORRECTNESS rows, 24 tests, and the whole bench
died on one untested environment assumption. This test pins the
loader's contract against whatever vintage of testdata is on disk:
every table loads, ``events.ts`` resolves to TIMESTAMP_NTZ, and key
dtypes match schemas.py. Metadata-only (schema resolution, no action)
except one tiny take(1) on events.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from data_warehouse_nhom8_spark import schemas
from data_warehouse_nhom8_spark.sources.testdata import load_table

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_all_tables_load_and_events_ts_is_timestamp_ntz(spark, sf_dir):
    for name in schemas.TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        assert len(df.columns) > 0, f"{name}: empty schema"
    events = load_table(spark, sf_dir, "events")
    assert isinstance(events.schema["ts"].dataType, T.TimestampNTZType), (
        f"{sf_dir}: events.ts resolved to {events.schema['ts'].dataType}; "
        "the loader must normalize either testdata vintage to TIMESTAMP_NTZ"
    )


def test_events_ts_values_resolve(spark):
    # one real row through the conversion path — catches an analysis-
    # time-valid but execution-time-broken conversion expression
    if not SF_DIRS:
        pytest.skip("no testdata on this machine")
    row = load_table(spark, SF_DIRS[0], "events").select("ts").take(1)
    assert row and row[0]["ts"] is not None


def test_key_dtypes_stable(spark):
    if not SF_DIRS:
        pytest.skip("no testdata on this machine")
    sf_dir = SF_DIRS[0]
    expect = {
        ("orders", "o_orderkey"): T.LongType,
        ("orders", "o_totalprice"): (T.DoubleType, T.DecimalType),
        ("lineitem", "l_quantity"): (T.DoubleType, T.DecimalType, T.LongType),
        ("documents", "doc_id"): T.LongType,
        ("embeddings", "embedding"): T.ArrayType,
    }
    for (tbl, col), typ in expect.items():
        dt = load_table(spark, sf_dir, tbl).schema[col].dataType
        assert isinstance(dt, typ), f"{tbl}.{col}: {dt}"
