"""Parser edge cases from the reference transformer
(staging_transformer_v2.py:53-75) — the FIXTURES.md A1 salary and
posted_time contracts."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.functions.cleaning import (
    clean_salary_cols,
    posted_date_col,
)

M = 1_000_000

SALARY_CASES = [
    ("Thỏa thuận", 0, 0),
    ("thỏa thuận", 0, 0),
    ("Tới 15 triệu", 0, 15 * M),
    ("Trên 20 triệu", 20 * M, 0),
    ("10 - 15 triệu", 10 * M, 15 * M),
    ("10 đến 15 triệu", 10 * M, 15 * M),  # range wins over the 'đến' up-to marker
    ("đến 15 triệu", 0, 15 * M),
    ("15 - 20 Triệu", 15 * M, 20 * M),
    ("1,200 - 1,800 USD", 1200 * M, 1800 * M),
    ("12 triệu", 12 * M, 12 * M),
    ("", None, None),
    (None, None, None),
    ("garbage no numbers", None, None),
]

POSTED_CASES = [
    ("hôm qua", "2025-03-09"),
    ("Hôm qua", "2025-03-09"),
    ("3 ngày trước", "2025-03-07"),
    ("2 tuần trước", "2025-02-24"),
    ("hôm nay", "2025-03-10"),
    ("", None),
    (None, None),
    ("xyz garbage", None),
]


def test_salary_parser(spark):
    df = spark.createDataFrame(
        [(i, s) for i, (s, _, _) in enumerate(SALARY_CASES)], "id int, salary string"
    )
    smin, smax = clean_salary_cols("salary")
    got = {
        r["id"]: (r["salary_min"], r["salary_max"])
        for r in df.select("id", smin.alias("salary_min"), smax.alias("salary_max")).collect()
    }
    for i, (s, lo, hi) in enumerate(SALARY_CASES):
        assert got[i] == (lo, hi), f"salary {s!r}: got {got[i]}, want {(lo, hi)}"


def test_posted_date(spark):
    df = spark.createDataFrame(
        [(i, p, "2025-03-10") for i, (p, _) in enumerate(POSTED_CASES)],
        "id int, posted string, extracted string",
    )
    got = {
        r["id"]: r["d"]
        for r in df.select(
            "id", posted_date_col("posted", "extracted").alias("d")
        ).collect()
    }
    for i, (p, want) in enumerate(POSTED_CASES):
        want_d = datetime.date.fromisoformat(want) if want else None
        assert got[i] == want_d, f"posted {p!r}: got {got[i]}, want {want_d}"


def test_parsers_stay_native(spark):
    """The parsers must compile to Catalyst expressions — no
    BatchEvalPython / ArrowEvalPython in the plan (100 TB hot path)."""
    df = spark.createDataFrame([("10 - 15 triệu", "2025-01-01", "hôm qua")],
                               "salary string, extracted string, posted string")
    smin, smax = clean_salary_cols("salary")
    plan = (
        df.select(smin, smax, posted_date_col("posted", "extracted"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan, plan
