"""Declared query plans (SURVEY.md §2 oracle contract).

Registry ordering is part of the verification contract: the per-round driver
records correctness rows for EXACTLY the first 50 of ``queries()`` in dict
order (r1: all 49 then-declared; r2 and r3: exactly 50 of 64 — the cap is a
hard 50).  With 63 oracled queries, no single round can certify them all, so
the ordering policy is a ROTATION: each round puts the oracled queries that
missed the previous round's window first, so the union of any two consecutive
rounds' CORRECTNESS files covers all 63.  ``_noracle`` rows-only queries sit
last — they only get the weaker check anyway, so they belong outside the
certification window (each has an exact-twin pytest instead).

Certification ledger:
  r2 window: q01–q45 range (incl. the 6 noracle) — q46-48/q54-64 missing.
  r3 window: q46-48, q54-64 first, then q01–q36 — q37/q40/q42-45/q50/q52
             (oracled) + noracle missing.
  r4 window: those 8 first; 7 went green, but a testdata-regeneration bug in
             the events loader (fixed in sources/testdata.py) failed every
             events-table query: q16/q18/q19/q27/q28/q29/q30/q43.
  r5 order (this file): the 16 uncovered + the 5 new (q65–q69) = 21
             fronted → r4 ∪ r5 covers every oracled query, and
             q43_approx_distinct gets its first-ever green row.
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

# Oracled queries with no green round-4 row: the 8 events-table queries
# that hit the loader bug (q43 additionally has never had a green row),
# q57–q64 which sat outside r4's 50-row window (green in r3), and the
# five round-5-new queries (q65–q69, first appearance). Fronting all
# 21 makes r4 ∪ r5 cover every oracled query; the 13 that fall out of
# r5's window (q37/q40/q42/q44-48/q50/q52/q54-56) are all green in r4.
_MISSED_LAST_ROUND = [
    "q43_approx_distinct",
    "q16_daily_rollup",
    "q18_latest_per_key",
    "q19_topk",
    "q27_props_extract",
    "q28_tumbling_daily_window",
    "q29_session_gap",
    "q30_keyed_upsert",
    "q57_decontamination",
    "q58_corpus_prep_summary",
    "q59_stratified_sample",
    "q60_asof_join",
    "q61_range_join",
    "q62_hll_rollup",
    "q63_pivot",
    "q64_unpivot",
    "q65_repetition_quality",
    "q66_vocab_topk",
    "q67_bigram_topk",
    "q68_kll_quantile_rollup",
    "q69_theta_retention",
]


def _registry_order(names):
    front = [n for n in _MISSED_LAST_ROUND if n in names]
    oracled = [n for n in sorted(names) if n in ORACLES and n not in front]
    noracle = [n for n in sorted(names) if n not in ORACLES and n not in front]
    return front + oracled + noracle


QUERIES = {name: _ALL_QUERIES[name] for name in _registry_order(_ALL_QUERIES)}

__all__ = ["QUERIES", "ORACLES"]
