"""Plan doctor: lint a DataFrame's physical plan for the
anti-patterns that kill queries at 100 TB.

The regression suite pins these properties per-query
(tests/test_plans.py); `lint_plan` is the same knowledge as a
runtime diagnostic a user can call on THEIR query before submitting
it to a large cluster — the engine's `EXPLAIN`-review checklist,
automated. Inspection is text-level over the executed plan (the same
surface the plan gates assert on), so it needs no private Spark APIs
beyond `queryExecution`.

Severities: "fatal" shapes lose by orders of magnitude at scale
(cartesian joins, per-row Python UDFs); "warn" shapes are sometimes
legitimate but deserve a look (unpartitioned windows over non-tiny
inputs, scans with nothing pushed, decimal outputs under the engine's
oracle contract); "info" is sizing context (exchange count).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _plan_text(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def lint_plan(
    df: DataFrame, max_exchanges: int = 6, broadcast_frac: float = 0.5
) -> list[dict]:
    """Return findings as dicts: {"rule", "severity", "detail"}.

    Rules:
      cartesian-join     fatal  CartesianProduct: O(n*m) row pairing with
                                neither side bounded — a missing equi-key.
      nested-loop-join   warn   BroadcastNestedLoopJoin: O(n*m) against a
                                BROADCAST-BOUNDED side; legitimate for the
                                scalar-threshold shape (1-row build), fatal
                                in spirit if the build side is a real table.
      python-row-udf     fatal  BatchEvalPython (row-at-a-time Python in
                                the hot path; Arrow mapInPandas/pandas_udf
                                do NOT trigger this).
      unpartitioned-window warn Window with an empty PARTITION BY: the
                                whole input crosses one task. Fine over a
                                dim-sized aggregate (the q74/q97 shape),
                                fatal over a fact.
      no-pushdown        warn   the plan filters rows but no scan pushed a
                                non-IsNotNull predicate — the format or the
                                predicate shape defeated pushdown (checked
                                on the FORMATTED explain, where per-scan
                                PushedFilters print un-truncated).
      decimal-output     warn   DECIMAL output columns violate the engine's
                                cross-engine hash contract (keep decimal
                                internal to sums; cast outputs to double).
      decimal-agg        info   a SUM with a DECIMAL-cast input: exact but
                                boxed-BigDecimal per row; fact-sized
                                fixed-point sums should use
                                aggregates.exact_money_aggs (integer cents).
      large-broadcast    warn   a BroadcastExchange whose build side's
                                size ESTIMATE exceeds `broadcast_frac` of
                                autoBroadcastJoinThreshold: near-threshold
                                auto-broadcasts are the silent 3x of the
                                mid-scale probes (a ~24 MB orders side
                                auto-broadcast cost 3x vs shuffle join —
                                BASELINE.md mid-scale section), and a
                                forced broadcast() hint on a growing
                                table fails only AFTER the data grows.
      many-exchanges     info   more than `max_exchanges` shuffles: check
                                for a reusable partitioning or bucketing.
    """
    p = _plan_text(df)
    findings: list[dict] = []

    if "CartesianProduct" in p:
        findings.append(
            {
                "rule": "cartesian-join",
                "severity": "fatal",
                "detail": "CartesianProduct in plan: no equi-condition reached "
                "the join — O(left x right) pairing at scale",
            }
        )
    if "BroadcastNestedLoopJoin" in p:
        findings.append(
            {
                "rule": "nested-loop-join",
                "severity": "warn",
                "detail": "BroadcastNestedLoopJoin: every stream row scans the "
                "broadcast side — fine for a 1-row scalar build (threshold "
                "pattern), wrong against a real table; add an equi-key",
            }
        )
    if "BatchEvalPython" in p:
        findings.append(
            {
                "rule": "python-row-udf",
                "severity": "fatal",
                "detail": "row-at-a-time Python UDF in the plan; use native "
                "pyspark.sql.functions or an Arrow pandas_udf",
            }
        )
    # An unpartitioned window is fed by an Exchange SinglePartition
    # (possibly through Sort/AQEShuffleRead nodes) — that exchange is
    # the all-rows-to-one-task move.
    lines = p.splitlines()
    for i, line in enumerate(lines):
        if re.search(r"\bWindow(?:Exec)? \[", line):
            for nxt in lines[i + 1 : i + 5]:
                if "Exchange SinglePartition" in nxt:
                    findings.append(
                        {
                            "rule": "unpartitioned-window",
                            "severity": "warn",
                            "detail": "window with empty PARTITION BY moves "
                            "all rows to one task; acceptable only over "
                            "dim-sized inputs: " + line.strip()[:120],
                        }
                    )
                    break
                if not re.search(r"\b(Sort|AQEShuffleRead|ShuffleQueryStage)\b", nxt):
                    break
    # Dead pushdown: the plan filters rows but no scan pushed a real
    # predicate (IsNotNull conjuncts push for ANY filter and don't
    # count). Uses the FORMATTED explain, whose per-scan details print
    # PushedFilters un-truncated (toString clips long lists).
    fmt = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pushed_lists = re.findall(r"PushedFilters: \[([^\]]*)\]", fmt)
    if pushed_lists and re.search(r"\(\d+\) Filter\b", fmt):
        real_pushed = any(
            any(
                tok.strip() and not tok.strip().startswith("IsNotNull")
                for tok in lst.split(",")
            )
            for lst in pushed_lists
        )
        if not real_pushed:
            findings.append(
                {
                    "rule": "no-pushdown",
                    "severity": "warn",
                    "detail": "the plan filters rows but no scan pushed a "
                    "non-IsNotNull predicate — the source format or the "
                    "predicate shape (computed expression?) defeated pushdown",
                }
            )
    from pyspark.sql.types import DecimalType

    dec = [f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
    if dec:
        findings.append(
            {
                "rule": "decimal-output",
                "severity": "warn",
                "detail": f"DECIMAL output columns {dec}: keep decimal internal "
                "to sums, cast outputs to double (oracle-hash contract)",
            }
        )
    # Sentinel-date outputs: a DATE/TIMESTAMP output column combined
    # with a plan literal outside pandas' ns-timestamp year range
    # [1678, 2261] (e.g. the SCD2 current-row sentinel 9999-12-31)
    # kills any pandas-normalizing consumer with OutOfBoundsDatetime —
    # the q114/q115 round-11 driver failure class. Static best-effort:
    # only literals visible in the plan text are caught; verify_oracle
    # value-checks the real output.
    from pyspark.sql.types import DateType, TimestampType

    dtcols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (DateType, TimestampType))
    ]
    if dtcols:
        oob_lits = sorted(
            {
                m
                for m in re.findall(r"\b(\d{4})-\d{2}-\d{2}\b", p)
                if not (1678 <= int(m) <= 2261)
            }
        )
        if oob_lits:
            findings.append(
                {
                    "rule": "sentinel-date-output",
                    "severity": "warn",
                    "detail": f"date/timestamp output columns {dtcols} with "
                    f"out-of-pandas-bounds year literal(s) {oob_lits} in the "
                    "plan: pandas ns timestamps cap at 2262 — project "
                    "sentinel-carrying dates as ISO strings "
                    "(date_format(..., 'yyyy-MM-dd'))",
                }
            )
    # DECIMAL-buffered aggregation: exact, but >18-digit sum buffers
    # box to Java BigDecimal per input row — the 60M-row probe
    # measured 2-4x vs integer-cents staging on fact-sized aggs
    if re.search(r"partial_sum\([^)]*cast\([^)]* as decimal", p, re.IGNORECASE):
        findings.append(
            {
                "rule": "decimal-agg",
                "severity": "info",
                "detail": "DECIMAL-buffered SUM in the plan: exact but boxed "
                "per row; for fact-sized fixed-point inputs use "
                "aggregates.exact_money_aggs (integer cents — same "
                "exactness, 2-4x measured)",
            }
        )
    findings.extend(_lint_broadcast_sizes(df, broadcast_frac))
    # count real SHUFFLES only — BroadcastExchange/ReusedExchange are
    # not data movements of the stream side and are often the FIX
    n_ex = len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)", p
        )
    )
    if n_ex > max_exchanges:
        findings.append(
            {
                "rule": "many-exchanges",
                "severity": "info",
                "detail": f"{n_ex} shuffle exchanges (> {max_exchanges}): look "
                "for a reusable partitioning, broadcastable side, or bucketed "
                "layout",
            }
        )
    return findings


def _parse_size_bytes(v: str) -> int | None:
    """'10485760b' / '10MB' / '-1' → bytes (None when disabled)."""
    m = re.fullmatch(r"\s*(-?\d+)\s*([kmgt]?i?b?)\s*", str(v), re.IGNORECASE)
    if not m:
        return None
    n = int(m.group(1))
    if n < 0:
        return None
    unit = m.group(2).lower().rstrip("ib") or "b"
    return n * {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}[unit]


def _iter_plan_nodes(node):
    yield node
    name = node.getClass().getName()
    # AQE nodes hide their subtree from children(): descend explicitly
    # (AdaptiveSparkPlanExec.executedPlan = current plan, the initial
    # one pre-execution; QueryStageExec.plan = the stage's subtree)
    if name.endswith("AdaptiveSparkPlanExec"):
        yield from _iter_plan_nodes(node.executedPlan())
        return
    if name.endswith("QueryStageExec"):
        yield from _iter_plan_nodes(node.plan())
        return
    ch = node.children()
    for i in range(ch.size()):
        yield from _iter_plan_nodes(ch.apply(i))


def _lint_broadcast_sizes(df: DataFrame, broadcast_frac: float = 0.5) -> list[dict]:
    """Flag BroadcastExchange nodes whose build-side Catalyst size
    ESTIMATE exceeds `broadcast_frac` x autoBroadcastJoinThreshold
    (round-9 verdict task 8). Rationale: the threshold is a cliff —
    the r6 probe's ~24 MB orders side sailed under a raised runtime
    estimate, auto-broadcast, and lost 3x to the shuffle join it
    displaced; and an explicit broadcast() hint bypasses the
    threshold entirely, so a dim that GROWS past broadcastable size
    fails in production, not in review. Anything within 2x of the
    cliff deserves a look (a true small dim estimates far below it).

    Uses each BroadcastExchangeExec child's logical-link statistics —
    the same estimate the planner itself broadcast-decided on. Purely
    advisory (warn): estimates over-state post-filter sizes, so a
    flagged plan needs a human, not an abort. Defensive against JVM
    API drift: any reflection failure yields no findings rather than
    a lint crash."""
    findings: list[dict] = []
    try:
        thresh = _parse_size_bytes(
            df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
        )
        if not thresh:
            return findings
        for node in _iter_plan_nodes(df._jdf.queryExecution().executedPlan()):
            if "BroadcastExchangeExec" not in node.getClass().getName():
                continue
            child = node.child()
            link = child.logicalLink()
            if not link.isDefined():
                continue
            est = int(link.get().stats().sizeInBytes())  # py4j maps BigInt → int
            if est > broadcast_frac * thresh:
                findings.append(
                    {
                        "rule": "large-broadcast",
                        "severity": "warn",
                        "detail": f"broadcast build side estimates {est} bytes "
                        f"(threshold {thresh}, frac {broadcast_frac}): near- or "
                        "over-threshold broadcasts lose to shuffle joins (3x at "
                        "the 60M-row probe) and break when the table grows — "
                        "verify the side is a bounded dim: "
                        + child.nodeName(),
                    }
                )
    except Exception:  # py4j/API drift — advisory rule, never crash the lint
        return findings
    return findings


def assert_scale_safe(df: DataFrame) -> None:
    """Raise ValueError listing any FATAL findings — the pre-submit
    guard for production pipelines."""
    fatal = [f for f in lint_plan(df) if f["severity"] == "fatal"]
    if fatal:
        raise ValueError(
            "plan is not scale-safe:\n"
            + "\n".join(f"- [{f['rule']}] {f['detail']}" for f in fatal)
        )
