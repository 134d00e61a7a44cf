"""SQL entry point: the engine's second API surface.

The reference's users are SQL users (every transform is MySQL SQL).
`sql()` registers the testdata (or any parquet directory of tables)
as temp views and runs a query through Catalyst — same planner, same
physical plans as the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_nhom8_spark.sources import register_views


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run SQL over the registered table set of `sf_dir`."""
    register_views(spark, sf_dir)
    return spark.sql(query)
