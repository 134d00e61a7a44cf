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


def test_sql_surface_matches_dataframe_plans(spark):
    """SQL-string surface parity: every oracle SQL that is ANSI enough
    to parse on Spark must produce the SAME result as the DataFrame
    plan when run via spark.sql over registered views — a reference
    user can keep writing SQL. DuckDB-dialect oracles (string_split_
    regex / unnest / quantile_cont / ...) are excluded by the parse
    attempt itself; the portable majority must stay portable."""
    from tests.conftest import canon
    from data_warehouse_nhom8_spark.plans import ORACLES, QUERIES
    from data_warehouse_nhom8_spark.sources import register_views

    register_views(spark, SF_DIR)
    ran, mismatched = 0, []
    for name, sql in ORACLES.items():
        try:
            sdf = spark.sql(sql)
            srows = sdf.collect()
        except Exception:
            continue  # DuckDB-dialect oracle; DuckDB remains its oracle
        ran += 1
        ddf = QUERIES[name](spark, SF_DIR)
        cols = sorted(sdf.columns)
        assert cols == sorted(ddf.columns), name
        a = sorted(
            tuple(canon(r[c]) for c in cols) for r in srows
        )
        b = sorted(
            tuple(canon(r[c]) for c in cols) for r in ddf.collect()
        )
        if a != b:
            mismatched.append(name)
    assert not mismatched, mismatched
    # the measured portable count — a previously-portable oracle
    # regressing out of the SQL surface must fail here, not hide in
    # the dialect skip (59 measured when the gate was added; 58 since
    # round 12: q06 retired to its q73 superset [-1], q114/q115's
    # sentinel-safe outputs use the portable CAST(date AS STRING)
    # [ISO in both engines, so they STAY on the surface], and the new
    # q117 oracle is DuckDB-dialect by necessity [regex 'g' flags];
    # 57 since round 13: the portable q01 retired to its q47/q77
    # supersets [-1] and the new q49 oracle is DuckDB-dialect by
    # necessity [UNNEST lambda shingles + recursive CTE]; 56 since
    # round 13b: the portable q02 retired to its q20 superset [-1]
    # and the new q41 oracle is DuckDB-dialect by necessity
    # [DOUBLE[] cast + 1-based array indexing]; 55 since round 15:
    # the portable q17 retired to its q86 superset [-1] and the new
    # q38 oracle is DuckDB-dialect by necessity [string_split_regex,
    # HUGEINT two's-complement fold, 1-based list slicing])
    assert ran >= 55, f"only {ran} oracle SQL strings ran on Spark SQL"
