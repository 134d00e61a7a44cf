"""Run one cron day of the composed pipeline from the command line —
the engine's stand-in for the reference's crontab chain
(extract/run_all_scrapers.sh 02:00 → staging/run_staging_pipeline.sh
→ loadtowh/run_loadtowh.sh → datamart cron 08:00; see SURVEY §3).

Usage:
  python scripts/run_daily.py --config config.xml [--day 2025-03-10] \
      [--input-csv-dir DIR]

Connectors: production deployments register live Connector callables
(extract.Connector — anything that yields row dicts for a (source,
day)). This CLI ships a FILE connector: point --input-csv-dir at a
directory of `{source_id}.csv` files with the raw scraper header
(schemas.RAW_JOBS_CSV) and each file becomes that source's day feed —
the same contract as the reference's scraper CSV drop. Without
--input-csv-dir the day runs with no new extract input, which still
exercises staging → warehouse → datamart idempotently (a rerun).

Every stage is ledger-gated (skip-if-done) and every merge idempotent,
so re-running a partially failed day continues where it stopped.
"""

from __future__ import annotations

import argparse
import csv
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def file_connector(csv_dir: str):
    """Connector over dropped CSV files: {csv_dir}/{source_id}.csv."""

    def conn(source_id: str, day: datetime.date):
        path = os.path.join(csv_dir, f"{source_id}.csv")
        if not os.path.exists(path):
            return []
        with open(path, newline="", encoding="utf-8-sig") as fh:
            return list(csv.DictReader(fh))

    return conn


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True, help="engine config XML")
    ap.add_argument("--day", default=None, help="run date (YYYY-MM-DD); default today")
    ap.add_argument("--input-csv-dir", default=None, help="dir of {source}.csv drops")
    ap.add_argument(
        "--sources",
        default="topcv_jobs,jobsgo_jobs",
        help="comma-separated source ids (reference parity default)",
    )
    ap.add_argument(
        "--no-bucketed",
        action="store_true",
        help="create NEW snapshot tables as plain parquet instead of the "
        "bucketed default (an existing bucketed table is never demoted — "
        "layout is sticky)",
    )
    ap.add_argument(
        "--doctor",
        action="store_true",
        help="lint the pipeline's own stage plans (staging transform, "
        "datamart fact input) and ledger the findings as doctor:* rows",
    )
    args = ap.parse_args()

    from data_warehouse_nhom8_spark.pipeline.config import load_config
    from data_warehouse_nhom8_spark.pipeline.daily import run_daily_pipeline
    from data_warehouse_nhom8_spark.session import get_spark

    cfg = load_config(args.config)
    day = (
        datetime.date.fromisoformat(args.day) if args.day else datetime.date.today()
    )
    connectors = {}
    if args.input_csv_dir:
        conn = file_connector(args.input_csv_dir)
        connectors = {s.strip(): conn for s in args.sources.split(",") if s.strip()}

    spark = get_spark("daily")
    report = run_daily_pipeline(
        spark, cfg, connectors, day,
        bucketed=not args.no_bucketed,
        doctor_self=args.doctor,
        expectations=list(cfg.expectations) or None,
        expectations_enforce=cfg.expectations_enforce,
    )
    print(json.dumps({"day": day.isoformat(), **report}, default=str))


if __name__ == "__main__":
    main()
