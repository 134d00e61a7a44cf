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


def test_upsert_keyed_join_is_exact_twin_of_window_form(spark):
    """The round-8 production D1 merge (join-shaped, table side never
    shuffles) must return exactly what the window form returns, on
    updates, inserts, within-batch dups, and a no-op rerun."""
    from pyspark.sql import functions as F

    from data_warehouse_nhom8_spark.operators.dedup import (
        upsert_keyed_join,
        upsert_last_writer_wins,
    )

    cur = spark.createDataFrame(
        [(1, "a", "2026-01-01"), (2, "b", "2026-01-02"), (3, "c", "2026-01-03")],
        "k long, v string, d string",
    )
    inc = spark.createDataFrame(
        [
            (2, "b2", "2026-01-05"),   # update
            (2, "b1", "2026-01-04"),   # older within-batch dup: loses
            (9, "z", "2026-01-05"),    # insert
        ],
        "k long, v string, d string",
    )
    order = [F.desc("d"), F.asc("v")]
    for c, i in [(cur, inc), (None, inc)]:
        a = sorted(map(tuple, upsert_keyed_join(c, i, ["k"], order).collect()))
        b = sorted(map(tuple, upsert_last_writer_wins(c, i, ["k"], order).collect()))
        assert a == b, (a, b)
    # rerun with the same increment is a no-op on both forms
    m1 = upsert_keyed_join(cur, inc, ["k"], order)
    m2 = upsert_keyed_join(m1, inc, ["k"], order)
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))


def test_canonical_key_matches_collation_key_on_reference_domain(spark):
    """canonical_key (plain string — bucketable) must induce the same
    key-equality classes as collation_key (ICU UNICODE_CI_AI — the
    merge's reference semantics) over Vietnamese + Latin job text."""
    from pyspark.sql import functions as F

    from data_warehouse_nhom8_spark.functions.cleaning import (
        canonical_key,
        collation_key,
    )

    import unicodedata

    nfd = lambda s: unicodedata.normalize("NFD", s)  # noqa: E731
    pairs = [
        ("Hà Nội", "ha noi", True),
        ("Đà Nẵng", "da nang", True),
        ("  Kỹ  Sư   Dữ Liệu ", "ky su du lieu", True),
        ("CÔNG TY TNHH ABC", "công ty tnhh abc", True),
        ("Montréal Café", "montreal cafe", True),
        ("Hà Nội", "ha noi 2", False),
        ("Dev", "Designer", False),
        ("Hưng Yên", "hung yen", True),
        ("Thừa Thiên Huế", "thua thien hue", True),
        # ADVICE r8: decomposed (NFD) input must induce the SAME key
        # classes — ICU equality is normalization-insensitive, so a
        # scraped NFD title must not split the business key
        (nfd("Hà Nội"), "Hà Nội", True),
        (nfd("Thừa Thiên Huế"), "thua thien hue", True),
        (nfd("Kỹ Sư Dữ Liệu"), "ky su du lieu", True),
        ("Qu\u00e2\u0323n 1", "qu\u1eadn 1", True),  # mixed: \u1ead as \u00e2 + dot-below
        (nfd("Montréal"), "montreal", True),
        (nfd("Hà Nội"), "ha noi 2", False),
    ]
    df = spark.createDataFrame(pairs, "a string, b string, want boolean")
    got = df.select(
        "want",
        (canonical_key("a") == canonical_key("b")).alias("canon_eq"),
        (collation_key("a") == collation_key("b")).alias("icu_eq"),
    ).collect()
    for r in got:
        assert r["canon_eq"] == r["want"] == r["icu_eq"], dict(r.asDict())


def test_scd2_keep_norm_keys_bucketed_merge_twin_and_reuse(spark, tmp_path):
    """keep_norm_keys=True persists plain-string `__nk_*` columns, the
    snapshot buckets on them, and the NEXT merge reuses them (no
    recompute — business results identical to the plain path, SCD2
    invariants hold, and the persisted columns survive the roundtrip)."""
    from pyspark.sql import functions as F

    from data_warehouse_nhom8_spark.operators.scd2 import (
        scd2_invariant_violations,
        scd2_merge,
    )
    from data_warehouse_nhom8_spark.sources.snapshots import (
        snapshot_bucket_spec,
        snapshot_overwrite,
        snapshot_read,
    )

    day1 = spark.createDataFrame(
        [("Dev", "Hà Nội Corp", "10tr", "2026-01-01"),
         ("QA", "Beta", "8tr", "2026-01-01")],
        "job_title string, company_name string, salary string, extracted_date string",
    ).withColumn("extracted_date", F.col("extracted_date").cast("date"))
    day2 = spark.createDataFrame(
        [("dev", "ha noi corp", "12tr", "2026-01-02"),   # same key, changed salary
         ("Intern", "Beta", "3tr", "2026-01-02")],
        "job_title string, company_name string, salary string, extracted_date string",
    ).withColumn("extracted_date", F.col("extracted_date").cast("date"))

    keys, cmp_cols = ["job_title", "company_name"], ["salary"]
    path = str(tmp_path / "wh")

    s1 = scd2_merge(None, day1, keys, cmp_cols, "2026-01-01", keep_norm_keys=True)
    assert {"__nk_job_title", "__nk_company_name"} <= set(s1.columns)
    snapshot_overwrite(
        s1, path, bucket_by=["__nk_job_title", "__nk_company_name"], n_buckets=4
    )
    assert snapshot_bucket_spec(path)["cols"] == ["__nk_job_title", "__nk_company_name"]

    cur = snapshot_read(spark, path)
    s2 = scd2_merge(cur, day2, keys, cmp_cols, "2026-01-02", keep_norm_keys=True)
    snapshot_overwrite(s2, path)  # inherits the bucket layout
    got = snapshot_read(spark, path)
    assert snapshot_bucket_spec(path) is not None

    # business-twin vs the plain (non-persisted, ICU) path
    p1 = scd2_merge(None, day1, keys, cmp_cols, "2026-01-01")
    p2 = scd2_merge(p1, day2, keys, cmp_cols, "2026-01-02")
    biz = ["job_title", "company_name", "salary", "extracted_date", "job_sk", "expired"]
    assert sorted(map(tuple, got.select(*biz).collect())) == sorted(
        map(tuple, p2.select(*biz).collect())
    )
    assert scd2_invariant_violations(got, keys).count() == 0
    # the Dev/Hà Nội key matched case+accent-insensitively: old expired
    assert got.filter(F.col("expired") != F.lit("9999-12-31").cast("date")).count() == 1


def test_scd2_bucketed_current_removes_table_side_exchange(spark, tmp_path):
    """Plan gate for the bucketed D2 merge: with broadcast disabled
    (the both-sides-big regime), the merge over a bucketed current
    plans strictly FEWER shuffles than over the same data as plain
    parquet — the live side's Exchange on the normalized key is gone
    because the scan is already hash-distributed on it."""
    from pyspark.sql import functions as F

    from data_warehouse_nhom8_spark.operators.scd2 import scd2_merge
    from data_warehouse_nhom8_spark.sources.snapshots import (
        snapshot_overwrite,
        snapshot_read,
    )

    base = spark.range(0, 2000).select(
        F.concat(F.lit("title_"), F.col("id")).alias("job_title"),
        F.concat(F.lit("co_"), (F.col("id") % 50)).alias("company_name"),
        F.concat(F.lit("s"), F.col("id")).alias("salary"),
        F.lit("2026-01-01").cast("date").alias("extracted_date"),
    )
    s1 = scd2_merge(
        None, base, ["job_title", "company_name"], ["salary"], "2026-01-01",
        keep_norm_keys=True,
    )
    b_path, p_path = str(tmp_path / "b"), str(tmp_path / "p")
    snapshot_overwrite(
        s1, b_path, bucket_by=["__nk_job_title", "__nk_company_name"], n_buckets=4
    )
    snapshot_overwrite(s1, p_path, bucket_by=[])

    inc = base.limit(100).withColumn("salary", F.lit("changed"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def n_exchanges(path):
            m = scd2_merge(
                snapshot_read(spark, path), inc,
                ["job_title", "company_name"], ["salary"], "2026-01-02",
                keep_norm_keys=True,
            )
            return (
                m._jdf.queryExecution().executedPlan().toString().count(
                    "Exchange hashpartitioning"
                )
            )

        nb, np_ = n_exchanges(b_path), n_exchanges(p_path)
        assert nb < np_, (nb, np_)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_scd2_as_of_pruned_skips_files_and_equals_plain(spark, tmp_path):
    """Round-12 verdict task 7: the at-rest point-in-time read prunes
    files through the stats manifest — a multi-version SCD2 snapshot
    whose files segregate by effective date must (a) return EXACTLY
    the plain scd2_as_of rows for every probe date and (b) skip every
    file whose version range starts after the as-of date."""
    import datetime

    from data_warehouse_nhom8_spark.operators.scd2 import (
        scd2_as_of,
        scd2_as_of_pruned,
    )
    from data_warehouse_nhom8_spark.sources.snapshots import (
        snapshot_compact,
        snapshot_overwrite,
        snapshot_read,
    )

    # 4 keys x 8 yearly versions: effective 2018..2025-01-01, each
    # version expires at the next one's effective; 2025 is current
    # (9999-12-31 sentinel)
    rows = []
    for k in range(4):
        for y in range(2018, 2026):
            eff = datetime.date(y, 1, 1)
            exp = datetime.date(9999, 12, 31) if y == 2025 else datetime.date(y + 1, 1, 1)
            rows.append((k, eff, exp, y * 100 + k))
    snap = spark.createDataFrame(
        rows, "nk long, effective date, expired date, attr long"
    )
    path = str(tmp_path / "scd2")
    snapshot_overwrite(snap.repartition(4), path)
    out = snapshot_compact(
        spark,
        path,
        target_file_bytes=1 << 10,
        zorder_by=["effective"],
        stats_cols=["effective", "expired"],
    )
    assert out is not None

    plain = snapshot_read(spark, path)
    for probe in ("2019-06-15", "2021-01-01", "2025-07-01"):
        df, n_sel, n_total = scd2_as_of_pruned(
            spark, path, probe, effective_col="effective"
        )
        got = sorted((r.nk, r.attr) for r in df.collect())
        want = sorted(
            (r.nk, r.attr)
            for r in scd2_as_of(plain, probe, effective_col="effective").collect()
        )
        assert got == want and len(want) == 4, (probe, got, want)
        assert n_total > 2, "fixture should have several files"
        if probe == "2019-06-15":
            # files holding only 2020+ versions can't satisfy
            # min(effective) <= 2019-06-15 — they must be skipped
            assert n_sel < n_total, (n_sel, n_total)

    # a date before any version: no rows, schema intact
    df, n_sel, n_total = scd2_as_of_pruned(
        spark, path, "2000-01-01", effective_col="effective"
    )
    assert df.count() == 0 and set(df.columns) == {"nk", "effective", "expired", "attr"}


def test_warehouse_as_of_routes_through_pruned_face(spark, tmp_path):
    """Round-13 verdict task 6: the PRODUCTION point-in-time read
    (`pipeline.warehouse_load.warehouse_as_of`) takes the stats-pruned
    path on a maintained multi-version store — identical rows to
    filtering the plain snapshot, with files actually skipped."""
    import datetime

    from data_warehouse_nhom8_spark.operators.scd2 import (
        scd2_as_of,
        scd2_as_of_pruned,
    )
    from data_warehouse_nhom8_spark.pipeline.warehouse_load import (
        load_day_to_warehouse,
        warehouse_as_of,
    )
    from data_warehouse_nhom8_spark.sources.snapshots import (
        snapshot_compact,
        snapshot_overwrite,
        snapshot_read,
    )

    whpath = str(tmp_path / "wh")
    schema = (
        "job_title string, company_name string, salary string, "
        "location string, experience_required string, posted_time string, "
        "job_url string, extracted_date date"
    )

    def persist(snap):
        snapshot_overwrite(snap, whpath)
        return snapshot_read(spark, whpath)

    wh = None
    for d in range(1, 7):  # 6 daily loads, every key changes daily
        day = datetime.date(2025, 3, d)
        stg = spark.createDataFrame(
            [
                (f"J{k}", "ACME", f"{d*10+k} tr", "HN", "2y", "t", "u", day)
                for k in range(4)
            ],
            schema,
        )
        wh = load_day_to_warehouse(stg, wh, day, persist=persist)

    # maintenance: small-file compaction + the validity stats manifest
    # (what run_weekly_maintenance now writes for the warehouse table)
    out = snapshot_compact(
        spark,
        whpath,
        target_file_bytes=1 << 10,
        zorder_by=["extracted_date"],
        stats_cols=["extracted_date", "expired"],
    )
    assert out is not None

    plain = snapshot_read(spark, whpath)
    for probe in ("2025-03-01", "2025-03-02", "2025-03-06"):
        got = sorted(
            (r.job_title, r.salary)
            for r in warehouse_as_of(spark, whpath, probe).collect()
        )
        want = sorted(
            (r.job_title, r.salary)
            for r in scd2_as_of(plain, probe).collect()
        )
        assert got == want and len(want) == 4, (probe, got, want)
    # early probe: versions that began later live in files the
    # manifest proves can't match — they are never opened
    _df, n_sel, n_total = scd2_as_of_pruned(
        spark, whpath, "2025-03-01", effective_col="extracted_date"
    )
    assert n_total > 2 and n_sel < n_total, (n_sel, n_total)
