"""t2-tier: every declared query hash-matches its DuckDB twin
(the driver's correctness gate, run here at sf0.001 for speed;
scripts/verify_oracle.py runs the same compare at sf0.01)."""

from __future__ import annotations

import pytest

from data_warehouse_nhom8_spark.plans import ORACLES, QUERIES
from tests.conftest import SF_DIR, assert_matches_oracle


def test_every_query_has_an_oracle_or_is_flagged():
    missing = [k for k in QUERIES if k not in ORACLES]
    # non-SQL-expressible ops are allowed to omit the oracle, but must
    # be explicitly suffixed so the weaker rows-only check is visible
    assert all(k.endswith("_noracle") for k in missing), missing


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    if name not in ORACLES:
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0  # rows-only check
        return
    assert_matches_oracle(QUERIES[name](spark, SF_DIR), duck, ORACLES[name])


def test_entry_smoke(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "count_order"}
