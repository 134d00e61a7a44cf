"""Sources & sinks."""

from data_warehouse_nhom8_spark.sources.testdata import Catalog, load_table, register_views
from data_warehouse_nhom8_spark.sources.csv_partitioned import (
    read_partitioned_csv,
    write_partitioned_csv,
)

__all__ = [
    "Catalog",
    "load_table",
    "register_views",
    "read_partitioned_csv",
    "write_partitioned_csv",
]
