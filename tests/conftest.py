"""Shared fixtures: one SparkSession per test session, DuckDB oracle
connection over the same parquet, and the canonicalizing comparator
used by every oracle test (the local mimic of the driver's gate)."""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from data_warehouse_nhom8_spark.session import get_spark

    s = get_spark(
        "tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-")},
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        return "f:nan" if math.isnan(v) else f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v.normalize()}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"dt:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def assert_matches_oracle(sdf, duck_con, sql):
    """Driver-gate mimic: rowcount + column names + sorted values."""
    scols = sdf.columns
    srows = [tuple(canon(v) for v in row) for row in sdf.collect()]
    cur = duck_con.execute(sql)
    dcols = [d[0] for d in cur.description]
    drows = [tuple(canon(v) for v in row) for row in cur.fetchall()]

    assert sorted(scols) == sorted(dcols), f"columns {sorted(scols)} != {sorted(dcols)}"
    assert len(srows) == len(drows), f"rowcount {len(srows)} != {len(drows)}"
    sidx = [scols.index(c) for c in sorted(scols)]
    didx = [dcols.index(c) for c in sorted(dcols)]
    ss = sorted(tuple(r[i] for i in sidx) for r in srows)
    dd = sorted(tuple(r[i] for i in didx) for r in drows)
    assert ss == dd, f"values differ; first diffs: {[(a, b) for a, b in zip(ss, dd) if a != b][:3]}"
