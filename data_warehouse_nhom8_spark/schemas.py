"""Explicit StructType schemas for every table the engine touches.

Two families:

* Driver testdata (TPC-H-ish star + events/documents/embeddings) —
  shapes documented in FIXTURES.md §B; used by the declared oracle
  queries Q01..Q32.
* Reference-domain pipeline tables (raw job CSV, staging, date_dim,
  SCD2 warehouse `job`, control-plane ledgers) — mirrors the schemas
  in the reference DDL (reference staging/init_staging_db_v2.sql:41-71,
  loadtowh/create_warehouse_db.sql:31-43,7723-7739,
  extract/create_control_db_v5.sql:34-54).

Schema-on-load semantics (the reference's all-TEXT temp table) are
modelled by `RAW_JOBS_CSV`: every column StringType, cast later in the
typed staging step.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Driver testdata
# --------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TESTDATA_TABLES = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --------------------------------------------------------------------------
# Reference-domain pipeline tables
# --------------------------------------------------------------------------

# 13-column scraped CSV contract (reference extract/topcv_scraper_v5.py:206)
# + JobsGo's 14th column job_type (reference extract/jobsgo_scraper_v1.py:198).
# All strings: schema-on-load, like the reference's all-TEXT temp table
# (reference staging/init_staging_db_v2.sql:41-52).
RAW_JOBS_CSV = T.StructType(
    [
        T.StructField("source_id", T.StringType()),
        T.StructField("job_id", T.StringType()),
        T.StructField("job_title", T.StringType()),
        T.StructField("company_name", T.StringType()),
        T.StructField("salary", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("experience_required", T.StringType()),
        T.StructField("job_type", T.StringType()),
        T.StructField("posted_time", T.StringType()),
        T.StructField("tags", T.StringType()),
        T.StructField("job_url", T.StringType()),
        T.StructField("company_logo", T.StringType()),
        T.StructField("extracted_date", T.StringType()),
        T.StructField("extracted_timestamp", T.StringType()),
    ]
)

# Typed staging table (reference staging/init_staging_db_v2.sql:56-71), unique
# on job_id (:69), plus the engine-extension parsed salary_min/salary_max
# (the reference computes them at staging/staging_transformer_v2.py:53-62
# but drops them; we keep both raw and parsed).
STAGING_JOBS = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("job_title", T.StringType()),
        T.StructField("company_name", T.StringType()),
        T.StructField("salary", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("experience_required", T.StringType()),
        T.StructField("posted_time", T.StringType()),
        T.StructField("job_url", T.StringType()),
        T.StructField("extracted_date", T.DateType()),
        T.StructField("date_id", T.LongType()),
        T.StructField("salary_min", T.LongType()),
        T.StructField("salary_max", T.LongType()),
    ]
)

# Warehouse date dimension, 10 columns
# (reference loadtowh/create_warehouse_db.sql:31-43).
DATE_DIM = T.StructType(
    [
        T.StructField("date_sk", T.LongType(), False),
        T.StructField("full_date", T.DateType()),
        T.StructField("day_since_month_start", T.IntegerType()),
        T.StructField("day_of_week_calendar", T.StringType()),
        T.StructField("calendar_month_name", T.StringType()),
        T.StructField("day_of_month", T.IntegerType()),
        T.StructField("day_of_year", T.IntegerType()),
        T.StructField("week_of_year", T.StringType()),
        T.StructField("is_holiday", T.StringType()),
        T.StructField("day_type", T.StringType()),
    ]
)

# SCD2 warehouse fact/dim `job`
# (reference loadtowh/create_warehouse_db.sql:7723-7739): surrogate job_sk,
# natural key (job_title, company_name), expired='9999-12-31' marks the
# current version (:7734), soft-delete flag (:7735).
JOB_SCD2 = T.StructType(
    [
        T.StructField("job_sk", T.LongType(), False),
        T.StructField("job_id", T.StringType()),
        T.StructField("job_title", T.StringType()),
        T.StructField("company_name", T.StringType()),
        T.StructField("salary", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("experience_required", T.StringType()),
        T.StructField("posted_time", T.StringType()),
        T.StructField("job_url", T.StringType()),
        T.StructField("extracted_date", T.DateType()),
        T.StructField("date_id", T.LongType()),
        T.StructField("expired", T.DateType()),
        T.StructField("is_deleted", T.BooleanType()),
    ]
)

SCD2_CURRENT_SENTINEL = "9999-12-31"

# Canonical run-ledger row (FIXTURES.md A5) — unifies the reference's five
# control tables: extract_log (reference extract/create_control_db_v5.sql:34-54),
# process_log (:76-91), load_log (staging/init_staging_db_v2.sql:5-17),
# load_to_wh_log (loadtowh/create_config_loadtowh.sql:86-98), load_to_dm_log
# (datamart/load_to_dm.py:77-84). `duration_seconds` — the reference's stored
# generated column (create_control_db_v5.sql:47) — is computed at write time.
RUN_LEDGER = T.StructType(
    [
        T.StructField("log_id", T.LongType(), False),
        T.StructField("process", T.StringType(), False),
        T.StructField("run_date", T.DateType(), False),
        T.StructField("status", T.StringType(), False),  # Running|Success|Failed
        T.StructField("rows_processed", T.LongType()),
        T.StructField("file_path", T.StringType()),
        T.StructField("start_time", T.TimestampType()),
        T.StructField("end_time", T.TimestampType()),
        T.StructField("duration_seconds", T.LongType()),
        T.StructField("error_message", T.StringType()),
    ]
)

LEDGER_STATUSES = ("Running", "Success", "Failed")
