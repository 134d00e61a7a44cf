"""Declared query plans (SURVEY.md §2 oracle contract).

Registry ordering is part of the verification contract: the per-round driver
records correctness rows for EXACTLY the first 50 of ``queries()`` in dict
order (r1: all 49 then-declared; r2 and r3: exactly 50 of 64 — the cap is a
hard 50).  With more oracled queries than window rows, no single round can
certify them all, so the ordering policy is a ROTATION: each round puts the
oracled queries that missed the previous round's window first, so the union
of any two consecutive rounds' CORRECTNESS files covers every oracled query.
``_noracle`` rows-only queries sit last — they only get the weaker check
anyway, so they belong outside the certification window (each has an
exact-twin pytest instead).

Since round 6 the front list is SELF-MAINTAINING: at import time we read the
newest ``CORRECTNESS_r*.json`` in the repo root and front every oracled query
without a green row in it (never-certified queries — e.g. ones added this
round — have no row at all and therefore front automatically).  The static
``_BOOTSTRAP_FRONT`` below is only the round-1 fallback when no driver file
exists yet.

Certification ledger:
  r2 window: q01–q45 range (incl. the 6 noracle) — q46-48/q54-64 missing.
  r3 window: q46-48, q54-64 first, then q01–q36 — q37/q40/q42-45/q50/q52
             (oracled) + noracle missing.
  r4 window: those 8 first; 7 went green, but a testdata-regeneration bug in
             the events loader (fixed in sources/testdata.py) failed every
             events-table query: q16/q18/q19/q27/q28/q29/q30/q43.
  r5 window: the 16 uncovered + the 5 new (q65–q69) fronted → 50/50 green;
             r4 ∪ r5 covers every oracled query.
  r6+ window: derived — ORACLES minus green(newest CORRECTNESS file), so the
             two-round union stays complete by construction
             (tests/test_plans.py::test_rotation_keeps_consecutive_round_coverage).
"""

import glob
import json
import os

from data_warehouse_nhom8_spark.plans.queries import QUERIES as _CORE
from data_warehouse_nhom8_spark.plans.queries import (
    RETIRED_QUERIES as _CORE_RETIRED,
)
from data_warehouse_nhom8_spark.plans.oracles import ORACLES as _CORE_ORACLES
from data_warehouse_nhom8_spark.plans.oracles import (
    RETIRED_ORACLES as _CORE_RETIRED_ORACLES,
)
from data_warehouse_nhom8_spark.plans.extensions import (
    EXTENSION_ORACLES,
    EXTENSION_QUERIES,
    RETIRED_EXTENSION_ORACLES,
    RETIRED_EXTENSION_QUERIES,
)
from data_warehouse_nhom8_spark.plans.tpch import TPCH_ORACLES, TPCH_QUERIES

_ALL_QUERIES = {**_CORE, **EXTENSION_QUERIES, **TPCH_QUERIES}
ORACLES = {**_CORE_ORACLES, **EXTENSION_ORACLES, **TPCH_ORACLES}

# Rotation-slack accounting (round 15): 101 oracled + 5 noracle.
# OPTIMIZATION-ROUND AMENDMENT: the r15-build retirements q17 -> q86
# and q63 -> q64 described below were ROLLED BACK when the round was
# re-scoped as an optimization round (no query timed in BENCH_r14 may
# disappear).  Both queries are declared and oracled again; the window
# overflow this creates is pinned on them via RESTORED_SUBSET_COVERED
# below.  The historical notes are kept as written.
# Two promotions this round. q38 MinHash-LSH: the shingle hashes
# switched xxhash64 -> md5 hi/lo halves (the q39/q41 construction),
# so the permutation family, banding, bucket caps, and exact-Jaccard
# verify are all engine-reproducible and the generated DuckDB twin
# matches row-exact; funded by retiring q17 -> q86 (same
# predicate-gated global-aggregate shape; q17 sat in the
# r13-certified half so the derived front stays at exactly 48).
# q53 incremental near-dup: its pytest-pinned contract (identical to
# the full detector on corpus ∪ batch restricted to pairs touching a
# batch id) makes its twin q38's bitwise twin plus the batch
# restriction, so the promotion certifies the persisted
# corpus_sig_store serving path end to end; unfunded — the derived
# front moves 48 -> 49, still inside the driver's 50-row window, and
# the remaining noracle five (BPE merges, WAV/AVI codecs, IVF/PQ ANN)
# are all genuinely non-SQL-expressible.
# Round-15 late addition: q119 n-gram repetition (the Gopher
# phrase-level filter tier, oracled from birth — md5-class grams +
# the q110/q112 gaps-and-islands coverage twin), funded by retiring
# q63 -> q64 (q64's oracle runs the identical wide pivot CTE and
# unpivots it — every q63 cell is exactly one q64 long row; q63 sat
# in the r13-certified half, i.e. the current derived front, so the
# swap keeps the front at 49 and the active registry at 99).
# Two promotions this round: q39 simhash (md5-derived token hashes
# make the tier bitwise-reproducible in DuckDB, q41's construction)
# and q118 semantic-dedup (composes two already-certified halves:
# q41's bitwise hyperplane buckets edge the graph, q49's
# recursive-CTE min-label propagation clusters it).
# Fifteen redundant oracles have been RETIRED to their superset shapes
# (r9: q05, q14, q26, q43, q44; r11: q07 -> q48, q11 -> q93/q105,
# q08 -> q48; r12: q06 -> q73; r13: q01 -> q47/q77, q02 -> q20;
# r14: q52 -> q41, whose oracle certifies the hyperplane buckets AND
# the pair cosines, a strict superset of q52's bucket histogram, and
# q40 -> q41, which certifies the identical exact cosine folds and
# deterministic top-k ordering bitwise; r15: q17 -> q86 (funding
# q38) and q63 -> q64, whose oracle unpivots the identical wide
# pivot CTE (funding q119) — see
# queries.RETIRED_QUERIES / extensions.RETIRED_EXTENSION_QUERIES for
# the subset→superset mapping); each keeps a per-suite-run DuckDB
# twin in tests/test_retired_oracles.py. Growth spends slack, junk
# retires to refill it: r10 added q111-q113 (slack 5 -> 2), r11
# added the SCD2 pair q114/q115 (funded by retiring q07/q11) and the
# decontamination scrub q116 (funded by retiring q08), r12 promoted
# q117 html-extract to oracled (funded by retiring q06), r13
# promoted q49 cluster-dedup to oracled — connected components is
# exactly computable in DuckDB as a recursive CTE — funded by
# retiring q01 (r11-certified, i.e. sitting in the r13 derived
# front, so the swap keeps the front at exactly 48 <= 50 and the
# two-round union stays complete by construction), and promoted q41
# embedding-neardup to oracled (the hyperplane tier is fully
# deterministic — md5-derived planes + left-associative double folds
# — so the DuckDB twin reproduces buckets and cosines bitwise; funded
# by retiring q02 to its q20 aliased-lower superset, also from the
# r11-certified half, so the front stays at exactly 48 and slack 2).
RETIRED_QUERIES = {**_CORE_RETIRED, **RETIRED_EXTENSION_QUERIES}
RETIRED_ORACLES = {**_CORE_RETIRED_ORACLES, **RETIRED_EXTENSION_ORACLES}

# Round-1 fallback only: with no CORRECTNESS file on disk there is nothing to
# rotate against, so front the queries that would otherwise sort last.
_BOOTSTRAP_FRONT = [
    "q43_approx_distinct",
    "q57_decontamination",
    "q58_corpus_prep_summary",
    "q59_stratified_sample",
    "q60_asof_join",
    "q61_range_join",
    "q62_hll_rollup",
    "q64_unpivot",
    "q65_repetition_quality",
    "q66_vocab_topk",
    "q67_bigram_topk",
    "q68_kll_quantile_rollup",
    "q69_theta_retention",
    "q70_sliding_rollup",
]


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def latest_correctness_green(root: str | None = None):
    """(filename, green-query-set) of the newest CORRECTNESS_r*.json, or
    (None, None) when no driver file exists yet (round 1)."""
    files = sorted(glob.glob(os.path.join(root or _repo_root(), "CORRECTNESS_r*.json")))
    if not files:
        return None, None
    try:
        with open(files[-1]) as fh:
            rows = json.load(fh)
    except (OSError, ValueError):
        return None, None
    green = {
        q
        for q, r in rows.items()
        if isinstance(r, dict)
        and r.get("rows_match")
        and r.get("schema_match")
        and r.get("hash_match")
    }
    return os.path.basename(files[-1]), green



# r15 optimization round: q17/q63 were retired mid-build (to fund the
# q38/q119 oracle slots) but the optimization driver's contract forbids
# removing any query present in BENCH_r14, so both are RESTORED.  That
# puts 101 oracled queries over a 2x50-row certification window; the
# structural overflow is pinned HERE, on the restored pair, because
# each is the one query class that can best afford to sit outside the
# window: SAME-SHAPE coverage (r16, correcting the r15 claim per
# ADVICE: q17's oracle is NOT a cell-for-cell subset of q86's — q86
# aggregates lineitem revenue, q17 counts orders; q63 ⊂ q64 IS real
# oracle containment, but a green superset row still only runs the
# superset's SPARK plan, never the restored query's).  The real
# correctness guarantee for the pair is therefore the per-suite
# DuckDB-twin pytest (tests/test_retired_oracles.py::
# test_restored_pair_matches_duckdb_oracles — every suite run, both
# queries' actual Spark plans vs their actual oracles), plus the
# window ALTERNATION below so each restored query also gets a real
# driver row when the parity allows one.
RESTORED_SUBSET_COVERED = {
    "q17_scalar_agg_gate": "q86_forecast_revenue",
    "q63_pivot": "q64_unpivot",
}


def _green_rounds(root: str | None = None) -> dict:
    """query -> highest round number with a green driver row, scanned
    over EVERY CORRECTNESS_r*.json.  Drives the restored-pair window
    alternation: the restored query that has gone longest without a
    real driver row sorts earlier, so the pair alternates through the
    one window slot the 101-over-2x50 overflow leaves them (ADVICE
    r15: a fixed sort order starved q63 of driver rows forever)."""
    import re

    out: dict = {}
    for path in sorted(
        glob.glob(os.path.join(root or _repo_root(), "CORRECTNESS_r*.json"))
    ):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        for q, r in rows.items():
            if (
                isinstance(r, dict)
                and r.get("rows_match")
                and r.get("schema_match")
                and r.get("hash_match")
            ):
                out[q] = max(out.get(q, 0), rnd)
    return out


def _compute_front(names) -> list:
    """Oracled queries lacking a green row in the newest CORRECTNESS file,
    in stable sorted order.  These MUST head the registry so the driver's
    50-row window certifies them this round.  The restored subset-covered
    pair sorts LAST (stalest-certified first among themselves) so that
    any window overflow lands on a restored query — and, across rounds,
    alternates between the two."""
    _, green = latest_correctness_green()
    if green is None:
        return [n for n in _BOOTSTRAP_FRONT if n in names]
    front = [n for n in sorted(names) if n in ORACLES and n not in green]
    if not any(n in RESTORED_SUBSET_COVERED for n in front):
        return sorted(front)
    stale = _green_rounds()
    return sorted(
        front,
        key=lambda n: (
            n in RESTORED_SUBSET_COVERED,
            stale.get(n, -1) if n in RESTORED_SUBSET_COVERED else 0,
            n,
        ),
    )


_MISSED_LAST_ROUND = _compute_front(_ALL_QUERIES)


def _registry_order(names):
    front = [n for n in _MISSED_LAST_ROUND if n in names]
    oracled = [n for n in sorted(names) if n in ORACLES and n not in front]
    noracle = [n for n in sorted(names) if n not in ORACLES and n not in front]
    return front + oracled + noracle


QUERIES = {name: _ALL_QUERIES[name] for name in _registry_order(_ALL_QUERIES)}

__all__ = [
    "QUERIES",
    "ORACLES",
    "RETIRED_QUERIES",
    "RETIRED_ORACLES",
    "RESTORED_SUBSET_COVERED",
    "latest_correctness_green",
]
