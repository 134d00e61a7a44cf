"""Staging transform: the reference's §3.2 flow as ONE Catalyst plan.

Reference shape (three processes + row loops):
  staging_loader.py: glob CSVs → TRUNCATE temp → per-row INSERT
  staging_transformer_v2.py: fetchall → per-row clean_salary /
  calc_posted_date / date_dim dict probe → per-row upsert

Engine shape (this module):
  partitioned CSV scan (pruned to the requested source/date)
  → projection to the 9-column staging contract
    (the reference drops source_id/tags/company_logo/extracted_timestamp,
     staging_loader.py:74-84 — schema evolution by projection)
  → native-expression derived columns (salary_min/max, posted_time)
  → broadcast join to date_dim for the surrogate date_id
    (the Python dict probe at staging_transformer_v2.py:77-86,125-130)
  → last-writer-wins upsert into the staging snapshot (D1)

No fetchall, no row loop: the whole transform is whole-stage codegen
and one shuffle (the upsert's key shuffle). 100 TB note: the snapshot
rewrite is the scale cost; partition the snapshot by a stable hash
bucket of job_id so the merge rewrites only buckets containing
incoming keys (dynamic partition overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.functions.cleaning import (
    clean_salary_cols,
    posted_date_col,
)
from data_warehouse_nhom8_spark.operators.dedup import upsert_keyed_join

STAGING_PROJECTION = [
    "job_id",
    "job_title",
    "company_name",
    "salary",
    "location",
    "experience_required",
    "posted_time",
    "job_url",
    "extracted_date",
]


def transform_raw_jobs(raw: DataFrame, date_dim: DataFrame) -> DataFrame:
    """raw (14-col all-string bronze) → typed silver rows with
    derived salary bounds, resolved posting date, date_id SK."""
    smin, smax = clean_salary_cols("salary")
    typed = (
        raw.filter(F.col("job_id").isNotNull() & (F.trim("job_id") != ""))
        .filter(F.col("job_title").isNotNull() & (F.trim("job_title") != ""))
        .select(
            *STAGING_PROJECTION,
        )
        .withColumn("extracted_date", F.col("extracted_date").cast("date"))
        .withColumn("salary_min", smin)
        .withColumn("salary_max", smax)
        .withColumn(
            "posted_time",
            F.date_format(
                posted_date_col("posted_time", "extracted_date"), "yyyy-MM-dd"
            ),
        )
    )
    dim = date_dim.select(
        F.col("full_date"), F.col("date_sk").alias("date_id")
    )
    return typed.join(
        F.broadcast(dim), typed["extracted_date"] == dim["full_date"], "left"
    ).drop("full_date")


def upsert_staging(current: DataFrame | None, transformed: DataFrame) -> DataFrame:
    """D1 merge on the UNIQUE(job_id) contract; within a batch the
    newest extracted_date wins.

    Production plan (round 8): the JOIN-shaped merge — the snapshot
    side streams through one broadcast anti join and never shuffles
    (Exchange-free over the bucketed staging snapshot; the window
    form, kept as the generic D1 operator, shuffles the whole table
    per merge). Exact-twin equivalence is pytest-gated."""
    return upsert_keyed_join(
        current,
        transformed,
        keys=["job_id"],
        order_by=[F.desc("extracted_date")],
    )
