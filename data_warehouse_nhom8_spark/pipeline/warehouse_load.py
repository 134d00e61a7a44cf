"""Warehouse load: the reference's §3.3 flow, Spark-shaped.

Reference: java orchestrator → is_process_done gate → mysqldump of the
day's partition → scp/ssh → SCD2 UPDATE/INSERT merge → row counts into
the ledger (reference loadtowh/LoadToWH.java, load_to_wh.sh).

Engine: no dump/ship (shared storage); one driver function —
ledger gate → filter the day's increment (the `--where DATE(...)`
filter, here partition pruning) → SCD2 merge → snapshot overwrite →
observe counts into the ledger.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.operators.scd2 import scd2_merge
from data_warehouse_nhom8_spark.pipeline.ledger import RunLedger

SCD2_NATURAL_KEYS = ("job_title", "company_name")  # load_to_wh.sh:66-67
SCD2_COMPARE_COLS = (  # load_to_wh.sh:70-74
    "salary",
    "location",
    "experience_required",
    "posted_time",
    "job_url",
)


def load_day_to_warehouse(
    staging: DataFrame,
    warehouse: DataFrame | None,
    day: datetime.date | str,
    ledger: RunLedger | None = None,
    process: str = "load_to_wh",
    null_safe: bool = True,
) -> DataFrame:
    """Merge one day's staging increment into the SCD2 `job` table and
    return the new snapshot. Skip-if-done honoured via the ledger."""
    day = datetime.date.fromisoformat(day) if isinstance(day, str) else day
    if ledger is not None and ledger.is_done(process, day):
        return warehouse

    start = datetime.datetime.now()
    log_id = ledger.open_run(process, day) if ledger is not None else None

    inc = staging.filter(F.col("extracted_date") == F.lit(day))
    snapshot = scd2_merge(
        current=warehouse,
        incoming=inc,
        natural_keys=list(SCD2_NATURAL_KEYS),
        compare_cols=list(SCD2_COMPARE_COLS),
        effective_date=day.isoformat(),
        null_safe=null_safe,
    )
    if ledger is not None:
        ledger.close_run(
            log_id,
            process,
            day,
            "Success",
            rows_processed=inc.count(),
            start_time=start,
        )
    return snapshot
