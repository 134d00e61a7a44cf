"""Snapshot helpers shared by every read-modify-overwrite path
(staging upsert, SCD2 warehouse, streaming upsert sink, ledger prune).

The hazard they guard: the snapshot being replaced is also the plan's
input, and `mode("overwrite")` deletes the input files before the job
that still needs them finishes — or worse, a cached plan recomputes
from already-deleted files after executor loss. The safe local
pattern is materialize-then-rewrite; at real scale replace this with
a versioned-directory swap or a table format's atomic commit (noted
in SCALE_NOTES.md).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def has_parquet(path: str) -> bool:
    return os.path.exists(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )


def safe_overwrite(df: DataFrame, path: str, schema: T.StructType | None = None) -> int:
    """Durably materialize `df`, then overwrite `path`. Returns the row
    count (free — the rows are in hand). collect() is bounded by the
    snapshot size, which for the engine's control/snapshot tables is
    the increment-scale working set, not the raw data."""
    spark = df.sparkSession
    rows = df.collect()
    out = spark.createDataFrame(rows, schema or df.schema)
    out.write.mode("overwrite").parquet(path)
    return len(rows)
