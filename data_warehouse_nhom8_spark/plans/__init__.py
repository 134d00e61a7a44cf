"""Declared query plans (SURVEY.md §2 oracle contract)."""

from data_warehouse_nhom8_spark.plans.queries import QUERIES as _CORE
from data_warehouse_nhom8_spark.plans.oracles import ORACLES as _CORE_ORACLES
from data_warehouse_nhom8_spark.plans.extensions import (
    EXTENSION_ORACLES,
    EXTENSION_QUERIES,
)
from data_warehouse_nhom8_spark.plans.tpch import TPCH_ORACLES, TPCH_QUERIES

QUERIES = {**_CORE, **EXTENSION_QUERIES, **TPCH_QUERIES}
ORACLES = {**_CORE_ORACLES, **EXTENSION_ORACLES, **TPCH_ORACLES}

__all__ = ["QUERIES", "ORACLES"]
