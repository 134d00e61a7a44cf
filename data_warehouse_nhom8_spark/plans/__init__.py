"""Declared query plans (SURVEY.md §2 oracle contract).

Registry ordering is part of the verification contract: the per-round driver
records correctness rows for EXACTLY the first 50 of ``queries()`` in dict
order (r1: all 49 then-declared; r2 and r3: exactly 50 of 64 — the cap is a
hard 50).  With 57 oracled queries, no single round can certify them all, so
the ordering policy is a ROTATION: each round puts the oracled queries that
missed the previous round's window first, so the union of any two consecutive
rounds' CORRECTNESS files covers all 57.  ``_noracle`` rows-only queries sit
last — they only get the weaker check anyway, so they belong outside the
certification window (each has an exact-twin pytest instead).

Certification ledger:
  r2 window: q01–q45 range (incl. the 6 noracle) — q46-48/q54-64 missing.
  r3 window: q46-48, q54-64 first, then q01–q36 — q37/q40/q42-45/q50/q52
             (oracled) + noracle missing.
  r4 order (this file): those 8 first → r3 ∪ r4 covers every oracled query.
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

# Oracled queries that fell outside the round-3 window (everything else
# oracled has a green CORRECTNESS_r03 row) — front of the round-4 order.
_MISSED_LAST_ROUND = [
    "q37_lang_id",
    "q40_cosine_topk",
    "q42_multimodal_features",
    "q43_approx_distinct",
    "q44_rollup",
    "q45_percentiles",
    "q50_ngram_jaccard",
    "q52_lsh_bucket_histogram",
]


def _registry_order(names):
    front = [n for n in _MISSED_LAST_ROUND if n in names]
    oracled = [n for n in sorted(names) if n in ORACLES and n not in front]
    noracle = [n for n in sorted(names) if n not in ORACLES and n not in front]
    return front + oracled + noracle


QUERIES = {name: _ALL_QUERIES[name] for name in _registry_order(_ALL_QUERIES)}

__all__ = ["QUERIES", "ORACLES"]
