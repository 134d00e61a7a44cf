"""Declared query plans (SURVEY.md §2 oracle contract)."""

from data_warehouse_nhom8_spark.plans.queries import QUERIES
from data_warehouse_nhom8_spark.plans.oracles import ORACLES

__all__ = ["QUERIES", "ORACLES"]
