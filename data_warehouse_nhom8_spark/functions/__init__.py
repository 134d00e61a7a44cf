"""Scalar column-expression builders (SURVEY.md §2g)."""

from data_warehouse_nhom8_spark.functions.cleaning import (
    clean_salary_cols,
    posted_date_col,
    normalize_text,
)

__all__ = ["clean_salary_cols", "posted_date_col", "normalize_text"]
