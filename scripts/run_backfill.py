"""Backfill a date RANGE of the composed pipeline — the engine's
stand-in for the reference's "re-run the crontab chain day by day
after an outage" runbook (SURVEY §3; every stage is ledger-gated and
idempotent, so a backfill that dies resumes where it stopped and
already-complete days are skipped in seconds).

Usage:
  python scripts/run_backfill.py --config config.xml \
      --from 2025-03-01 --to 2025-03-10 [--input-csv-dir DIR] \
      [--doctor] [--maintenance-every 7]

`--maintenance-every N` runs the weekly-maintenance twin (snapshot
compaction + ledger prune) after every N backfilled days — a long
backfill otherwise accumulates N versions of small files.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--from", dest="start", required=True, help="YYYY-MM-DD inclusive")
    ap.add_argument("--to", dest="end", required=True, help="YYYY-MM-DD inclusive")
    ap.add_argument("--input-csv-dir", default=None)
    ap.add_argument("--sources", default="topcv_jobs,jobsgo_jobs")
    ap.add_argument("--doctor", action="store_true")
    ap.add_argument("--maintenance-every", type=int, default=0)
    args = ap.parse_args()

    from run_daily import file_connector

    from data_warehouse_nhom8_spark.pipeline.config import load_config
    from data_warehouse_nhom8_spark.pipeline.daily import (
        run_daily_pipeline,
        run_weekly_maintenance,
    )
    from data_warehouse_nhom8_spark.session import get_spark

    cfg = load_config(args.config)
    start = datetime.date.fromisoformat(args.start)
    end = datetime.date.fromisoformat(args.end)
    if end < start:
        raise SystemExit("--to is before --from")

    connectors = {}
    if args.input_csv_dir:
        conn = file_connector(args.input_csv_dir)
        connectors = {s.strip(): conn for s in args.sources.split(",") if s.strip()}

    spark = get_spark("backfill")
    day, i = start, 0
    while day <= end:
        report = run_daily_pipeline(
            spark, cfg, connectors, day,
            doctor_self=args.doctor,
            expectations=list(cfg.expectations) or None,
            expectations_enforce=cfg.expectations_enforce,
        )
        print(json.dumps({"day": day.isoformat(), **report}, default=str))
        i += 1
        if args.maintenance_every and i % args.maintenance_every == 0:
            m = run_weekly_maintenance(spark, cfg)
            print(json.dumps({"maintenance_after": day.isoformat(), **m}, default=str))
        day += datetime.timedelta(days=1)


if __name__ == "__main__":
    main()
