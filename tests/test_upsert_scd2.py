"""D1 upsert + D2 SCD2 invariants (SURVEY.md §5 engine test strategy,
FIXTURES.md A4 scenarios): day-1 all-new; day-2 unchanged / changed /
brand-new / NULL-on-one-side / case-variant keys; rerun idempotence."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.operators.dedup import (
    duplicate_keys,
    insert_ignore,
    upsert_last_writer_wins,
)
from data_warehouse_nhom8_spark.operators.scd2 import (
    CURRENT_SENTINEL,
    scd2_invariant_violations,
    scd2_merge,
)

JOB_COLS = (
    "job_id string, job_title string, company_name string, salary string, "
    "location string, experience_required string, posted_time string, "
    "job_url string, extracted_date date, date_id long"
)


def jobs_df(spark, rows):
    return spark.createDataFrame(rows, JOB_COLS)


def day(s):
    return datetime.date.fromisoformat(s)


def row(job_id, title="Dev", company="ACME", salary="10 - 15 triệu",
        location="HN", exp="2 năm", posted="2025-03-09", url=None, d="2025-03-10"):
    return (
        job_id, title, company, salary, location, exp, posted,
        url or f"https://x/{job_id}", day(d), 1,
    )


# ---------------------------------------------------------------- D1 upsert

def test_upsert_new_and_update(spark):
    cur = jobs_df(spark, [row("a", salary="old"), row("b")])
    inc = jobs_df(spark, [row("a", salary="new"), row("c")])
    out = upsert_last_writer_wins(cur, inc, ["job_id"], [F.desc("extracted_date")])
    got = {r["job_id"]: r["salary"] for r in out.collect()}
    assert got == {"a": "new", "b": "10 - 15 triệu", "c": "10 - 15 triệu"}


def test_upsert_idempotent(spark):
    cur = jobs_df(spark, [row("a"), row("b")])
    inc = jobs_df(spark, [row("a", salary="new")])
    once = upsert_last_writer_wins(cur, inc, ["job_id"], [F.desc("extracted_date")])
    twice = upsert_last_writer_wins(once, inc, ["job_id"], [F.desc("extracted_date")])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_insert_ignore(spark):
    cur = jobs_df(spark, [row("a", salary="keep")])
    inc = jobs_df(spark, [row("a", salary="drop"), row("b")])
    out = insert_ignore(cur, inc, ["job_id"])
    got = {r["job_id"]: r["salary"] for r in out.collect()}
    assert got == {"a": "keep", "b": "10 - 15 triệu"}


def test_duplicate_keys(spark):
    df = jobs_df(spark, [row("a", url="u1"), row("b", url="u1"), row("c", url="u2")])
    dups = duplicate_keys(df, ["job_url"]).collect()
    assert len(dups) == 1 and dups[0]["job_url"] == "u1" and dups[0]["n"] == 2


# ---------------------------------------------------------------- D2 SCD2

def first_load(spark):
    inc = jobs_df(spark, [row("a", title="Dev", company="ACME"),
                          row("b", title="QA", company="Beta")])
    return scd2_merge(None, inc, ["job_title", "company_name"],
                      ["salary", "location"], "2025-03-10")


def test_scd2_first_load(spark):
    snap = first_load(spark)
    rows = snap.collect()
    assert len(rows) == 2
    assert all(str(r["expired"]) == CURRENT_SENTINEL for r in rows)
    sks = sorted(r["job_sk"] for r in rows)
    assert sks == [1, 2]  # deterministic surrogate keys
    assert scd2_invariant_violations(snap, ["job_title", "company_name"]).count() == 0


def test_scd2_collated_compare_ignores_case_accent_changes(spark):
    """Reference parity: MySQL <> under utf8mb4_unicode_ci sees
    'Hà Nội' → 'ha noi' as UNCHANGED — a case/accent-only difference
    in a tracked attribute must not expire + re-insert a version
    (ADVICE round 1). Binary mode (collate_compare=False) must still
    detect it."""
    inc2 = jobs_df(spark, [
        row("a", title="Dev", company="ACME", location="hà nội", d="2025-03-11"),
    ])
    base = first_load(spark).withColumn("location", F.lit("Ha Noi"))
    merged = scd2_merge(base, inc2, ["job_title", "company_name"],
                        ["salary", "location"], "2025-03-11")
    # collated (default): no new version for the Dev/ACME key
    assert merged.count() == 2
    assert merged.filter(F.col("expired") != CURRENT_SENTINEL).count() == 0

    binary = scd2_merge(base, inc2, ["job_title", "company_name"],
                        ["salary", "location"], "2025-03-11",
                        collate_compare=False)
    # binary: 'Ha Noi' != 'hà nội' ⇒ expire + new version
    assert binary.count() == 3
    assert binary.filter(F.col("expired") != CURRENT_SENTINEL).count() == 1


def test_scd2_day2_changed_new_unchanged(spark):
    snap = first_load(spark)
    inc2 = jobs_df(spark, [
        row("a", title="Dev", company="ACME", salary="CHANGED", d="2025-03-11"),
        row("b", title="QA", company="Beta", d="2025-03-11"),   # unchanged attrs
        row("c", title="Ops", company="Gamma", d="2025-03-11"),  # brand new
    ])
    snap2 = scd2_merge(snap, inc2, ["job_title", "company_name"],
                       ["salary", "location"], "2025-03-11")
    rows = snap2.collect()
    assert len(rows) == 4  # a-old(expired), a-new, b (untouched), c
    cur = {(r["job_title"]): r for r in rows if str(r["expired"]) == CURRENT_SENTINEL}
    assert set(cur) == {"Dev", "QA", "Ops"}
    assert cur["Dev"]["salary"] == "CHANGED"
    expired = [r for r in rows if str(r["expired"]) != CURRENT_SENTINEL]
    assert len(expired) == 1 and str(expired[0]["expired"]) == "2025-03-11"
    assert scd2_invariant_violations(snap2, ["job_title", "company_name"]).count() == 0
    # unchanged row keeps its original surrogate key
    qa_sks = {r["job_sk"] for r in rows if r["job_title"] == "QA"}
    assert qa_sks == {first_sk(snap, "QA")}


def first_sk(snap, title):
    return [r["job_sk"] for r in snap.collect() if r["job_title"] == title][0]


def test_scd2_rerun_same_day_noop(spark):
    snap = first_load(spark)
    inc2 = jobs_df(spark, [row("a", salary="CHANGED", d="2025-03-11"), row("c", title="Ops", company="Gamma", d="2025-03-11")])
    snap2 = scd2_merge(snap, inc2, ["job_title", "company_name"],
                       ["salary", "location"], "2025-03-11")
    snap3 = scd2_merge(snap2, inc2, ["job_title", "company_name"],
                       ["salary", "location"], "2025-03-11")
    assert sorted(map(tuple, snap2.collect())) == sorted(map(tuple, snap3.collect()))


def test_scd2_collation_insensitive_keys(spark):
    """Same key differing only in case must NOT create a second
    version chain (utf8mb4_unicode_ci parity)."""
    snap = first_load(spark)
    inc2 = jobs_df(spark, [row("a", title="DEV", company="acme", d="2025-03-11")])  # same key, same attrs
    snap2 = scd2_merge(snap, inc2, ["job_title", "company_name"],
                       ["salary", "location"], "2025-03-11")
    assert snap2.count() == 2  # no new version
    assert scd2_invariant_violations(snap2, ["job_title", "company_name"]).count() == 0


def test_scd2_accent_insensitive_keys(spark):
    """utf8mb4_unicode_ci is also ACCENT-insensitive: 'Công ty Hà Nội'
    and 'Cong ty Ha Noi' are the same natural key (Spark 4 native
    UNICODE_CI_AI collation)."""
    inc1 = jobs_df(spark, [row("a", title="Kỹ sư", company="Công ty Hà Nội")])
    snap = scd2_merge(None, inc1, ["job_title", "company_name"],
                      ["salary", "location"], "2025-03-10")
    # same key sans accents, same attrs -> no new version
    inc2 = jobs_df(spark, [row("a", title="Ky su", company="Cong ty Ha Noi", d="2025-03-11")])
    snap2 = scd2_merge(snap, inc2, ["job_title", "company_name"],
                       ["salary", "location"], "2025-03-11")
    assert snap2.count() == 1
    # same key sans accents, CHANGED salary -> expire + new version
    inc3 = jobs_df(spark, [row("a", title="KY SU", company="cong ty ha noi",
                               salary="Trên 50 triệu", d="2025-03-12")])
    snap3 = scd2_merge(snap2, inc3, ["job_title", "company_name"],
                       ["salary", "location"], "2025-03-12")
    assert snap3.count() == 2
    assert scd2_invariant_violations(snap3, ["job_title", "company_name"]).count() == 0


@pytest.mark.parametrize("null_safe,expect_versions", [(True, 2), (False, 1)])
def test_scd2_null_semantics(spark, null_safe, expect_versions):
    """NULL→value: null-safe mode counts it as a change (2 versions of
    the row); MySQL `<>` mode does not (1 version) — reference
    load_to_wh.sh:70-74 vs SURVEY §4 decision."""
    inc1 = jobs_df(spark, [row("a", salary=None)])
    snap = scd2_merge(None, inc1, ["job_title", "company_name"],
                      ["salary"], "2025-03-10")
    inc2 = jobs_df(spark, [row("a", salary="NEW", d="2025-03-11")])
    snap2 = scd2_merge(snap, inc2, ["job_title", "company_name"],
                       ["salary"], "2025-03-11", null_safe=null_safe)
    assert snap2.count() == expect_versions


def test_scd2_as_of_reads_the_version_current_on_that_day(spark):
    """Point-in-time read: before the change day the old version,
    from the change day on the new one (half-open [effective,
    expired)); before the first load, nothing."""
    from data_warehouse_nhom8_spark.operators.scd2 import scd2_as_of

    snap = first_load(spark)
    inc2 = jobs_df(spark, [row("a", salary="Trên 25 triệu", d="2025-03-15")])
    snap2 = scd2_merge(snap, inc2, ["job_title", "company_name"],
                       ["salary", "location"], "2025-03-15")

    before = {r["job_title"]: r["salary"] for r in scd2_as_of(snap2, "2025-03-12").collect()}
    assert before["Dev"] == "10 - 15 triệu"
    on_change = {r["job_title"]: r["salary"] for r in scd2_as_of(snap2, "2025-03-15").collect()}
    assert on_change["Dev"] == "Trên 25 triệu"     # change day reads the new version
    assert on_change["QA"] == "10 - 15 triệu"       # untouched key still present
    assert scd2_as_of(snap2, "2025-03-01").count() == 0  # before first load
    # exactly one version per key at any date
    for d in ("2025-03-12", "2025-03-15", "2025-04-01"):
        per_key = (
            scd2_as_of(snap2, d).groupBy("job_title", "company_name")
            .count().filter(F.col("count") > 1)
        )
        assert per_key.count() == 0, d


def test_scd2_temporal_join_picks_version_at_fact_date(spark):
    """Each fact row enriches with the dim version current at ITS OWN
    date — one match per fact row, no range explosion."""
    from data_warehouse_nhom8_spark.operators.scd2 import scd2_temporal_join

    snap = first_load(spark)
    inc2 = jobs_df(spark, [row("a", salary="Trên 25 triệu", d="2025-03-15")])
    snap2 = scd2_merge(snap, inc2, ["job_title", "company_name"],
                       ["salary", "location"], "2025-03-15")

    fact = spark.createDataFrame(
        [
            (1, "Dev", "ACME", "2025-03-11"),
            (2, "Dev", "ACME", "2025-03-20"),
            (3, "QA", "Beta", "2025-03-20"),
            (4, "Dev", "ACME", "2025-03-01"),   # before any version
        ],
        "txn_id long, job_title string, company_name string, txn_date string",
    ).withColumn("txn_date", F.col("txn_date").cast("date"))

    out = {r["txn_id"]: r for r in scd2_temporal_join(
        fact, snap2, ["job_title", "company_name"], "txn_date"
    ).collect()}
    assert len(out) == 4                                  # left join: row count preserved
    assert out[1]["salary"] == "10 - 15 triệu"            # pre-change version
    assert out[2]["salary"] == "Trên 25 triệu"            # post-change version
    assert out[3]["salary"] == "10 - 15 triệu"            # never-changed key
    assert out[4]["salary"] is None                       # no version valid yet
