"""Declarative data-quality expectations, verified in ONE pass.

The reference trusts its loaders (a malformed salary or duplicate id
is found when a report looks wrong); the engine's quarantine catches
SCHEMA-level breakage at ingest. This module is the remaining tier —
dbt-test / Deequ-style CONTENT constraints ("job_id never null",
"salary_min <= salary_max", "status in (...)") — evaluated the way
they must run at 100 TB: every check compiles to a conditional
aggregate and ALL of them run in a single `agg()` over one scan (a
constraint suite that scans per check re-reads the table N times;
Deequ's operator fusion is the same idea).

`check` returns per-expectation violation counts; `verify` raises on
any violation (the write-path gate); `check_to_ledger` records a
`dq:<name>` run-ledger row per suite (Failed + detail on violations),
the same monitoring surface the doctor and drift views use.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expect:
    """One declarative constraint.

    kind ∈ {not_null, unique, accepted_values, in_range,
    matches_regex, expression}; `col` is the target column (for
    `expression`, pass the boolean SQL string in params["expr"] —
    rows where it is FALSE or NULL count as violations)."""

    name: str
    kind: str
    col: str | None = None
    params: dict = field(default_factory=dict)


def _violation_expr(e: Expect) -> Column:
    c = F.col(e.col) if e.col else None
    if e.kind == "not_null":
        bad = c.isNull()
    elif e.kind == "accepted_values":
        bad = ~c.isin(*e.params["values"]) | c.isNull()
    elif e.kind == "in_range":
        lo, hi = e.params["min"], e.params["max"]
        bad = (c < F.lit(lo)) | (c > F.lit(hi)) | c.isNull()
    elif e.kind == "matches_regex":
        bad = ~c.rlike(e.params["pattern"]) | c.isNull()
    elif e.kind == "expression":
        bad = ~F.coalesce(F.expr(e.params["expr"]), F.lit(False))
    else:
        raise ValueError(f"unknown expectation kind {e.kind!r} ({e.name})")
    return F.sum(F.when(bad, 1).otherwise(0)).cast("long")


def check(
    df: DataFrame, expectations: list[Expect], stats: dict | None = None
) -> dict:
    """violation counts per expectation name, via ONE aggregate pass.

    `unique` is EXACT BY DEFAULT (round 9, the round-8 approx-first
    default silently weakened existing DQ gates: duplicate mass below
    rsd·count reported 0 violations with no caller opt-in). The 100 TB
    shape — `approx_count_distinct(col, rsd)`, a mergeable HLL sketch
    instead of the exact distinct's full key shuffle — is the OPT-IN
    `params={"approx": True}`. Its escalation contract:

      * sketch agrees with count() within rsd        → clean, done in
        ONE pass (dup mass below sketch resolution is accepted — the
        documented tolerance the caller opted into; at dim scale
        rsd·count < 1, so ANY duplicate escalates and stays exact)
      * sketch disagrees beyond rsd                  → a second pass
        computes the exact count(DISTINCT) for the suspect columns
        only, so reported violation counts are never estimates

    params: {"approx": True} opts into the sketch; {"rsd": 0.01}
    tunes it; {"exact": True} is the (now-default) explicit form,
    kept for round-8 callers. Pass a dict as `stats` to receive
    {"escalated": [names]} for observability. Empty input yields
    all-zero counts."""

    def _approx(e: Expect) -> bool:
        return bool(e.params.get("approx")) and not e.params.get("exact")

    aggs, uniques = [], []
    for e in expectations:
        if e.kind == "unique":
            uniques.append(e)
            aggs.append(F.count(e.col).alias(f"__cnt_{e.name}"))
            if _approx(e):
                aggs.append(
                    F.approx_count_distinct(
                        e.col, float(e.params.get("rsd", 0.01))
                    ).alias(f"__apx_{e.name}")
                )
            else:
                aggs.append(
                    F.count_distinct(F.col(e.col)).alias(f"__dst_{e.name}")
                )
        else:
            aggs.append(_violation_expr(e).alias(f"__v_{e.name}"))
    row = df.agg(*aggs).collect()[0] if aggs else None
    out = {}
    suspects = []
    for e in expectations:
        if e.kind == "unique":
            cnt = int(row[f"__cnt_{e.name}"])
            if not _approx(e):
                out[e.name] = cnt - int(row[f"__dst_{e.name}"])
            else:
                apx = int(row[f"__apx_{e.name}"])
                rsd = float(e.params.get("rsd", 0.01))
                if abs(cnt - apx) <= rsd * cnt:
                    out[e.name] = 0  # clean within sketch resolution
                else:
                    suspects.append(e)
        else:
            out[e.name] = int(row[f"__v_{e.name}"] or 0)
    if suspects:
        # exact pass ONLY for the columns the sketch flagged — the
        # expensive Expand/shuffle runs on suspicion, not by default
        srow = df.agg(
            *[F.count(e.col).alias(f"__cnt_{e.name}") for e in suspects],
            *[
                F.count_distinct(F.col(e.col)).alias(f"__dst_{e.name}")
                for e in suspects
            ],
        ).collect()[0]
        for e in suspects:
            out[e.name] = int(srow[f"__cnt_{e.name}"] - srow[f"__dst_{e.name}"])
    if stats is not None:
        stats["escalated"] = [e.name for e in suspects]
    return out


def verify(df: DataFrame, expectations: list[Expect]) -> dict:
    """The write-path gate: raise ValueError naming every violated
    expectation (with counts); return the all-green counts otherwise."""
    counts = check(df, expectations)
    bad = {k: v for k, v in counts.items() if v > 0}
    if bad:
        raise ValueError(f"data-quality expectations violated: {bad}")
    return counts


def check_to_ledger(
    df: DataFrame,
    expectations: list[Expect],
    ledger,
    run_date,
    suite: str = "default",
) -> dict:
    """Run the suite and record ONE `dq:<suite>` run-ledger row:
    Success with rows_processed = number of expectations when all
    pass, Failed with the violation map in error_message otherwise
    (the drift/doctor monitoring surface)."""
    import datetime

    t0 = datetime.datetime.now()
    log_id = ledger.open_run(f"dq:{suite}", run_date)
    counts = check(df, expectations)
    bad = {k: v for k, v in counts.items() if v > 0}
    ledger.close_run(
        log_id,
        f"dq:{suite}",
        run_date,
        status="Failed" if bad else "Success",
        rows_processed=len(expectations),
        error_message=(f"violations: {bad}"[:1000] if bad else None),
        start_time=t0,
    )
    return counts
