"""Set operations (SURVEY.md §2f).

U1 (the reference's shell CSV concat, reference
extract/run_all_scrapers.sh:100-133) is `unionByName`; U2's
skip-if-done complement (reference extract/run_all_scrapers.sh:22-44)
is EXCEPT / left-anti.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame) -> DataFrame:
    """UNION ALL by column name (bag semantics, no dedup)."""
    return reduce(lambda a, b: a.unionByName(b), dfs)


def except_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    """SQL EXCEPT (set semantics — result is distinct)."""
    return left.subtract(right)


def intersect_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    """SQL INTERSECT (set semantics)."""
    return left.intersect(right)
