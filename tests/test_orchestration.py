"""Orchestration contracts: XML config, retry-until-ledger-success,
PID locks, multi-source ingest with skip-if-done (SURVEY §3.1)."""

from __future__ import annotations

import datetime
import os

import pytest

from data_warehouse_nhom8_spark.pipeline.config import RetryPolicy, load_config
from data_warehouse_nhom8_spark.pipeline.extract import (
    ingest_source,
    read_day,
    run_all_sources,
)
from data_warehouse_nhom8_spark.pipeline.ledger import RunLedger
from data_warehouse_nhom8_spark.pipeline.orchestrator import (
    LockHeld,
    ProcessLock,
    run_with_retry,
)

D = datetime.date(2025, 3, 10)

SAMPLE_XML = """<?xml version="1.0" encoding="UTF-8"?>
<configuration>
  <paths>
    <bronze>/tmp/dw/bronze</bronze>
    <ledger>/tmp/dw/ledger</ledger>
  </paths>
  <extract>
    <retry><max_attempts>5</max_attempts><retry_interval>60</retry_interval></retry>
  </extract>
  <settings><truncateBeforeInsert>false</truncateBeforeInsert></settings>
  <aggregates>
    <table><name>agg_job_by_company</name><source>job</source>
      <groupBy>company_name</groupBy>
      <metrics><metric>COUNT(*) AS total_jobs</metric></metrics></table>
    <table><name>agg_job_by_city</name><source>job</source>
      <groupBy>location</groupBy>
      <metrics><metric>COUNT(*) AS n</metric></metrics></table>
  </aggregates>
  <expectations enforce="true">
    <expect name="job_id_not_null" kind="not_null" col="job_id"/>
    <expect name="status_ok" kind="accepted_values" col="status" values="a,b"/>
    <expect name="score_range" kind="in_range" col="score" min="0" max="100"/>
    <expect name="pair_order" kind="expression" expr="lo &lt;= hi"/>
  </expectations>
</configuration>
"""


def test_config_loader(tmp_path):
    p = tmp_path / "config.xml"
    p.write_text(SAMPLE_XML)
    cfg = load_config(str(p))
    assert cfg.bronze_path == "/tmp/dw/bronze"
    assert cfg.ledger_path == "/tmp/dw/ledger"
    assert cfg.staging_path == "data/staging"  # default
    assert cfg.retry == RetryPolicy(5, 60)
    assert not cfg.truncate_before_insert
    assert [a.table_name for a in cfg.aggregates] == ["agg_job_by_company", "agg_job_by_city"]
    assert cfg.aggregates[1].count_alias == "n"
    # config-driven DQ suite (same XML contract as the aggregate specs)
    assert cfg.expectations_enforce is True
    kinds = {e.name: e.kind for e in cfg.expectations}
    assert kinds == {"job_id_not_null": "not_null", "status_ok": "accepted_values",
                     "score_range": "in_range", "pair_order": "expression"}
    by_name = {e.name: e for e in cfg.expectations}
    assert by_name["status_ok"].params["values"] == ["a", "b"]
    assert by_name["score_range"].params == {"min": 0, "max": 100}
    assert by_name["pair_order"].params["expr"] == "lo <= hi"


def test_retry_until_ledger_success(spark, tmp_path):
    led = RunLedger(spark, str(tmp_path / "ledger"))
    attempts = []

    def flaky_job():
        attempts.append(1)
        lid = led.open_run("p", D)
        if len(attempts) < 3:
            led.close_run(lid, "p", D, "Failed", error_message="boom")
        else:
            led.close_run(lid, "p", D, "Success")

    waits = []
    ok = run_with_retry(flaky_job, led, "p", D, RetryPolicy(3, 900), sleeper=waits.append)
    assert ok and len(attempts) == 3
    assert waits == [900, 900]  # slept between attempts, not after success


def test_retry_exhausted(spark, tmp_path):
    led = RunLedger(spark, str(tmp_path / "ledger"))

    def always_fails():
        lid = led.open_run("p", D)
        led.close_run(lid, "p", D, "Failed", error_message="nope")

    ok = run_with_retry(always_fails, led, "p", D, RetryPolicy(2, 1), sleeper=lambda s: None)
    assert not ok


def test_retry_ignores_exception_trusts_ledger(spark, tmp_path):
    """A job that raises but wrote Success is a success — DB-status
    detection, not exit codes (run_topcv_scraper_with_retry.sh:186-196)."""
    led = RunLedger(spark, str(tmp_path / "ledger"))

    def weird_job():
        lid = led.open_run("p", D)
        led.close_run(lid, "p", D, "Success")
        raise RuntimeError("crashed after committing")

    ok = run_with_retry(weird_job, led, "p", D, RetryPolicy(3, 1), sleeper=lambda s: None)
    assert ok


def test_latest_status_failed_then_success(spark, tmp_path):
    """A retry Success must outrank the earlier Failed row in
    latest_status (log_id must be monotonic — regression for the
    random-uuid ordering bug)."""
    led = RunLedger(spark, str(tmp_path / "ledger"))
    lid = led.open_run("p", D)
    led.close_run(lid, "p", D, "Failed", error_message="first try")
    lid2 = led.open_run("p", D)
    led.close_run(lid2, "p", D, "Success", rows_processed=7)
    latest = led.latest_status().filter("process = 'p'").collect()
    assert len(latest) == 1
    assert latest[0]["status"] == "Success" and latest[0]["rows_processed"] == 7


def test_lock_liveness(tmp_path):
    lock = ProcessLock(str(tmp_path), "p")
    with lock:
        other = ProcessLock(str(tmp_path), "p")
        with pytest.raises(LockHeld):
            other.acquire()
    # stale lock (dead pid) is broken
    (tmp_path / "p.lock").write_text("999999999")
    lock2 = ProcessLock(str(tmp_path), "p")
    lock2.acquire()
    lock2.release()


def fake_rows(n, source_id, d, start=0):
    return [
        {
            "source_id": source_id,
            "job_id": f"{source_id}-{i}",
            "job_title": f"Role {i}",
            "company_name": "ACME",
            "salary": "10 - 15 triệu",
            "location": "HN",
            "experience_required": "",
            "job_type": "",
            "posted_time": "hôm qua",
            "tags": "",
            "job_url": f"https://x/{source_id}/{i}",
            "company_logo": "",
            "extracted_date": d.isoformat(),
            "extracted_timestamp": f"{d} 02:00:00",
        }
        for i in range(start, start + n)
    ]


def test_ingest_and_run_all_with_skip(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    led = RunLedger(spark, str(tmp_path / "ledger"))

    calls = []

    def conn_a(source_id, d):
        calls.append(source_id)
        return fake_rows(3, source_id, d)

    def conn_b(source_id, d):
        calls.append(source_id)
        raise RuntimeError("scrape blew up")

    res = run_all_sources(spark, {"topcv_jobs": conn_a, "jobsgo_jobs": conn_b}, D, bronze, led)
    assert res == {"topcv_jobs": 3, "jobsgo_jobs": -1}
    assert led.is_done("extract_topcv_jobs", D)
    assert not led.is_done("extract_jobsgo_jobs", D)

    # second run: topcv skipped (U2 gate), jobsgo retried and fixed
    def conn_b_fixed(source_id, d):
        calls.append(source_id)
        return fake_rows(2, source_id, d)

    res2 = run_all_sources(
        spark, {"topcv_jobs": conn_a, "jobsgo_jobs": conn_b_fixed}, D, bronze, led
    )
    assert res2 == {"jobsgo_jobs": 2}
    assert calls.count("topcv_jobs") == 1  # never re-scraped

    merged = read_day(spark, bronze, D)
    assert merged.count() == 5  # U1: multi-file scan merges both sources
    assert merged.filter("job_id = 'topcv_jobs-0'").count() == 1


def test_run_daily_cli_composition(spark, tmp_path):
    """scripts/run_daily.py: file-drop connector -> composed day ->
    per-stage report; rerun skips extract (ledger) and stays stable."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "run_daily", os.path.join(os.path.dirname(__file__), "..", "scripts", "run_daily.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    drops = tmp_path / "in"
    drops.mkdir()
    (drops / "topcv_jobs.csv").write_text(
        "source_id,job_id,job_title,company_name,salary,location,"
        "experience_required,job_type,posted_time,tags,job_url,company_logo,"
        "extracted_date,extracted_timestamp\n"
        "topcv_jobs,t1,Dev,ACME,10 - 15 triệu,HN,2 năm,,hôm qua,,https://x/t1,,"
        "2025-03-10,2025-03-10 02:00:00\n",
        encoding="utf-8",
    )
    from data_warehouse_nhom8_spark.pipeline.config import AggSpec, EngineConfig
    from data_warehouse_nhom8_spark.pipeline.daily import run_daily_pipeline

    cfg = EngineConfig(
        bronze_path=str(tmp_path / "bronze"),
        staging_path=str(tmp_path / "staging"),
        warehouse_path=str(tmp_path / "wh"),
        datamart_path=str(tmp_path / "dm"),
        ledger_path=str(tmp_path / "ledger"),
        locks_path=str(tmp_path / "locks"),
        aggregates=(AggSpec("agg_job_by_company", "company_name", "total_jobs"),),
    )
    import datetime

    day = datetime.date(2025, 3, 10)
    conn = mod.file_connector(str(drops))
    r1 = run_daily_pipeline(spark, cfg, {"topcv_jobs": conn}, day)
    assert r1["extract"] == {"topcv_jobs": 1}
    assert r1["staging_rows"] == 1 and r1["warehouse_rows"] == 1
    r2 = run_daily_pipeline(spark, cfg, {"topcv_jobs": conn}, day)
    assert r2["extract"] == {}  # skip-if-done
    assert r2["warehouse_rows"] == 1  # idempotent merge


def test_auto_shuffle_partitions_scales_with_cores_and_bytes(tmp_path, spark):
    """Sizing contract: tiny dirs keep the low floor (task overhead
    dominates); dirs past the CPU-bound threshold rise to the core
    count; huge inputs follow the bytes rule up to the ceiling."""
    from data_warehouse_nhom8_spark.session import (
        DEFAULT_CPUS,
        auto_shuffle_partitions,
    )

    small = tmp_path / "small"
    spark.range(10).write.parquet(str(small))
    assert auto_shuffle_partitions(str(small)) == 8

    assert (
        auto_shuffle_partitions(str(small), cpu_floor_bytes=0)
        == max(8, DEFAULT_CPUS)
    ), "past the CPU-bound threshold the floor is the core count"

    # bytes term: with a 1-byte target the partition count must follow
    # total uncompressed bytes (hundreds for even this tiny file) —
    # i.e. exceed every floor, proving the bytes rule is actually live
    by_bytes = auto_shuffle_partitions(str(small), target_partition_bytes=1)
    assert by_bytes > DEFAULT_CPUS and by_bytes <= 4096


def test_backfill_range_composition(spark, tmp_path):
    """The backfill loop's semantics, driven directly: three
    consecutive days through run_daily_pipeline with periodic
    maintenance — each day's rows land, the ledger gates reruns, and
    compaction after day 2 changes no results (what
    scripts/run_backfill.py composes per CLI invocation)."""
    import datetime

    from data_warehouse_nhom8_spark.pipeline.config import AggSpec, EngineConfig
    from data_warehouse_nhom8_spark.pipeline.daily import (
        run_daily_pipeline,
        run_weekly_maintenance,
    )

    cfg = EngineConfig(
        bronze_path=str(tmp_path / "bronze"),
        staging_path=str(tmp_path / "staging"),
        warehouse_path=str(tmp_path / "wh"),
        datamart_path=str(tmp_path / "dm"),
        ledger_path=str(tmp_path / "ledger"),
        locks_path=str(tmp_path / "locks"),
        aggregates=(AggSpec("agg_job_by_company", "company_name", "total_jobs"),),
    )
    d0 = datetime.date(2025, 4, 1)
    days = [d0 + datetime.timedelta(days=i) for i in range(3)]

    def conn(source_id, d):
        return [
            {
                "source_id": source_id, "job_id": f"j{d.day}", "job_title": "Dev",
                "company_name": "ACME", "salary": "Thỏa thuận", "location": "HN",
                "experience_required": "", "job_type": "", "posted_time": "hôm qua",
                "tags": "", "job_url": f"https://x/j{d.day}", "company_logo": "",
                "extracted_date": d.isoformat(), "extracted_timestamp": "",
            }
        ]

    for i, day in enumerate(days):
        r = run_daily_pipeline(spark, cfg, {"topcv_jobs": conn}, day)
        assert r["staging_rows"] == i + 1
        if i == 1:  # --maintenance-every 2 twin
            m = run_weekly_maintenance(spark, cfg)
            assert m["compacted_staging"] in (True, False)

    final = run_daily_pipeline(spark, cfg, {"topcv_jobs": conn}, days[-1])
    assert final["extract"] == {}  # rerun of the last day: fully gated
    assert final["staging_rows"] == 3 and final["warehouse_rows"] == 3


def test_backfill_cli_importable():
    """scripts/run_backfill.py must import cleanly with the scripts
    dir on sys.path (its `from run_daily import file_connector` is how
    the CLI resolves when run as a script)."""
    import importlib.util
    import os
    import sys

    scripts = os.path.join(os.path.dirname(__file__), "..", "scripts")
    sys.path.insert(0, scripts)
    try:
        spec = importlib.util.spec_from_file_location(
            "run_backfill", os.path.join(scripts, "run_backfill.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert callable(mod.main)
    finally:
        sys.path.remove(scripts)


def test_backfill_killed_mid_range_resumes_and_maintenance_bounds_files(
    spark, tmp_path
):
    """VERDICT r7 #7: inject a failure at day k of a backfill range
    (a data-quality abort AFTER extract, BEFORE the warehouse merge —
    a mid-day kill), then rerun the WHOLE range: completed days are
    ledger-skipped in seconds, the killed day resumes from its own
    bronze (idempotent stages), and the maintenance sweep keeps the
    snapshot's version count at the GC bound and its live file count
    at the bucket count."""
    import datetime

    from data_warehouse_nhom8_spark.operators.expectations import Expect
    from data_warehouse_nhom8_spark.pipeline.config import EngineConfig
    from data_warehouse_nhom8_spark.pipeline.daily import (
        run_daily_pipeline,
        run_weekly_maintenance,
    )
    from data_warehouse_nhom8_spark.sources.snapshots import (
        _current_version,
        snapshot_versions,
    )

    cfg = EngineConfig(
        bronze_path=str(tmp_path / "bronze"),
        staging_path=str(tmp_path / "staging"),
        warehouse_path=str(tmp_path / "wh"),
        datamart_path=str(tmp_path / "dm"),
        ledger_path=str(tmp_path / "ledger"),
    )
    d0 = datetime.date(2025, 5, 1)
    days = [d0 + datetime.timedelta(days=i) for i in range(3)]

    def conn(source_id, d):
        comp = "EVIL" if d == days[1] else "ACME"
        return [
            {
                "source_id": source_id, "job_id": f"j{d.day}", "job_title": "Dev",
                "company_name": comp, "salary": "10 triệu", "location": "HN",
                "experience_required": "", "job_type": "", "posted_time": "hôm qua",
                "tags": "", "job_url": f"https://x/j{d.day}", "company_logo": "",
                "extracted_date": d.isoformat(), "extracted_timestamp": "",
            }
        ]

    dq = [Expect("no_evil", "expression", params={"expr": "company_name != 'EVIL'"})]

    # first invocation: dies mid-day-2 (DQ abort between staging
    # transform and the warehouse merge)
    import pytest as _pytest

    run_daily_pipeline(spark, cfg, {"topcv_jobs": conn}, days[0],
                       expectations=dq, expectations_enforce=True)
    with _pytest.raises(ValueError, match="no_evil"):
        run_daily_pipeline(spark, cfg, {"topcv_jobs": conn}, days[1],
                           expectations=dq, expectations_enforce=True)

    # second invocation over the WHOLE range (operator lifts the gate):
    # day 0 fully ledger-skipped, day 1 resumes from its own bronze
    r0 = run_daily_pipeline(spark, cfg, {"topcv_jobs": conn}, days[0])
    assert r0["extract"] == {}  # skip-if-done
    reports = [run_daily_pipeline(spark, cfg, {"topcv_jobs": conn}, d)
               for d in days[1:]]
    assert reports[-1]["staging_rows"] == 3
    assert reports[-1]["warehouse_rows"] == 3

    # maintenance-every-N sweep: version count at the GC bound, live
    # bucketed version compacted to file-per-bucket
    run_weekly_maintenance(spark, cfg)
    assert len(snapshot_versions(cfg.staging_path)) <= 2
    v = _current_version(cfg.staging_path)
    vdir = f"{cfg.staging_path}/v{v:08d}"
    import os as _os

    files = [f for f in _os.listdir(vdir) if f.endswith(".parquet")]
    assert len(files) <= 16, files
