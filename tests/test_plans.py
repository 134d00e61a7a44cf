"""Physical-plan regression gates: the optimizations the 100 TB
story depends on must stay in the plan (SURVEY.md §4)."""

from __future__ import annotations

import pytest

from data_warehouse_nhom8_spark.plans import QUERIES
from tests.conftest import SF_DIR


def plan_of(spark, name: str) -> str:
    return QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


def _retired_plan_of(spark, name: str) -> str:
    # q01 retired from the certification registry (round 13, funding
    # the q49 oracle promotion) but its P1/P3 plan gates stay — the
    # shape is still first-class
    from data_warehouse_nhom8_spark.plans import RETIRED_QUERIES

    return (
        RETIRED_QUERIES[name](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_filter_pushdown_to_scan(spark):
    p = _retired_plan_of(spark, "q01_scan_filter_sort")
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]" in p


def test_column_pruning(spark):
    p = _retired_plan_of(spark, "q01_scan_filter_sort")
    assert (
        "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,"
        "o_orderstatus:string,o_totalprice:double>" in p
    ), "scan must read only the projected columns"


def test_like_prefix_pushdown(spark):
    # q05 retired from the certification registry (round 9) but its
    # pushdown plan gate stays — the shape is still first-class
    from data_warehouse_nhom8_spark.plans import RETIRED_QUERIES

    p = (
        RETIRED_QUERIES["q05_like_prefix"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "StringStartsWith(p_brand,Brand#1)" in p


def test_dimension_joins_broadcast(spark):
    # q08 retired from the certification registry (round 11, funding
    # q116) but its J2 plan gate stays — the shape is still first-class
    from data_warehouse_nhom8_spark.plans import RETIRED_QUERIES

    p = (
        RETIRED_QUERIES["q08_broadcast_dim_chain"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("BroadcastHashJoin") == 2, "nation+region must broadcast, never shuffle the fact"


def test_topk_is_take_ordered(spark):
    assert "TakeOrderedAndProject" in plan_of(spark, "q19_topk"), (
        "ORDER BY+LIMIT must not materialize a global sort"
    )


def test_aggregates_are_partial(spark):
    assert "partial_count" in plan_of(spark, "q13_single_key_agg"), (
        "map-side combine must run before the shuffle"
    )


def test_anti_semi_join_types(spark):
    from data_warehouse_nhom8_spark.plans import RETIRED_QUERIES

    assert "LeftAnti" in plan_of(spark, "q10_anti_join")
    # q11 retired to the q93/q105 supersets (round 11) but its
    # LeftSemi plan shape stays gated here
    p11 = (
        RETIRED_QUERIES["q11_semi_join"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in p11


def test_whole_stage_codegen_everywhere(spark):
    """`*(n)` marks whole-stage-codegen spans; AQE plans only show the
    final plan after execution, so run the query first."""
    for q in ("q15_conditional_agg", "q20_string_functions", "q24_regex_extract"):
        df = QUERIES[q](spark, SF_DIR)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "*(" in plan, f"{q}: no codegen span in\n{plan[:500]}"


def test_tpch_q5_shape_broadcasts_dims(spark):
    p = plan_of(spark, "q48_local_supplier_volume")
    assert p.count("BroadcastHashJoin") >= 2, "nation+region must broadcast"


def test_no_decimal_output_columns_in_declared_queries(spark):
    """Round-1 post-mortem: the driver's value hash treats a Spark
    Decimal and a numerically-equal DuckDB float as different (q01/q03/
    q46/q48 hash-failed with rows+schema green). Contract: oracled
    queries emit DOUBLE, never DECIMAL — decimal stays internal to the
    sums for order-independence."""
    from pyspark.sql.types import DecimalType

    for name in QUERIES:
        df = QUERIES[name](spark, SF_DIR)
        dec = [f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
        assert not dec, f"{name}: DECIMAL output column(s) {dec}"


def test_no_python_udfs_in_declared_queries(spark):
    """Everything oracle-checked must stay JVM-side (q42's mapInPandas
    is the sanctioned Arrow path for multimodal, excluded here)."""
    from data_warehouse_nhom8_spark.plans import ORACLES

    for name in ORACLES:
        if name == "q42_multimodal_features":
            continue
        assert "EvalPython" not in plan_of(spark, name), name


def test_decontamination_broadcasts_benchmark(spark):
    """q57's benchmark gram set must broadcast (LeftSemi, BuildRight):
    the corpus side may never shuffle its exploded gram stream into a
    hash-partitioned join — at 100 TB that shuffle is the op's cost."""
    p = plan_of(spark, "q57_decontamination")
    assert "LeftSemi, BuildRight" in p, p[:800]
    assert "SortMergeJoin" not in p, "gram join must not sort-merge"


def test_stratified_sample_pushes_window_group_limit(spark):
    """q59's rank filter must push a map-side WindowGroupLimit
    (Partial + Final): only ~quota rows per stratum may cross the
    shuffle — a full-stratum sort at 100 TB is the failure mode."""
    p = plan_of(spark, "q59_stratified_sample")
    assert p.count("WindowGroupLimit") >= 2, p[:800]


def test_range_join_is_hash_not_cartesian(spark):
    """q61's interval join must run as a bucket equi-join: a raw
    inequality join plans BroadcastNestedLoopJoin/CartesianProduct —
    the O(|events| x |windows|) shape that dies at scale."""
    p = plan_of(spark, "q61_range_join")
    assert "CartesianProduct" not in p and "NestedLoop" not in p, p[:800]


def test_rotation_keeps_consecutive_round_coverage():
    """Certification-rotation gate, two parts:

    1. BACKWARD (the actual contract): the union of the two most recent
       CORRECTNESS files' green rows must cover every oracled query the
       driver has ever seen — a query missing from both was uncertified
       for two consecutive rounds (the state q43 sat in for r3+r4).
       Queries new this round (no row in either file) are exempt here;
       part 2 guarantees they sit inside the upcoming window.
    2. FORWARD (self-maintaining since r6): every oracled query outside
       this round's 50-row window must be green in the LATEST file, so
       that after the next driver run the two-file union is complete by
       construction."""
    import glob
    import json
    import os

    from data_warehouse_nhom8_spark.plans import ORACLES, QUERIES

    def green_of(path):
        rows = json.load(open(path))
        return set(rows), {
            q
            for q, r in rows.items()
            if r.get("rows_match") and r.get("schema_match") and r.get("hash_match")
        }

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    if not files:
        pytest.skip("no driver correctness file yet (round 1)")

    seen_latest, green_latest = green_of(files[-1])
    seen_prev, green_prev = green_of(files[-2]) if len(files) > 1 else (set(), set())
    seen, union_green = seen_latest | seen_prev, green_latest | green_prev

    stale = [q for q in ORACLES if q in seen and q not in union_green]
    assert not stale, (
        f"oracled queries with no green row in either of the two most recent "
        f"CORRECTNESS files: {stale} — certification union is broken"
    )

    # r15 optimization-round exception: q17/q63 were restored (query
    # removal is forbidden in optimization rounds) which puts 101
    # oracled queries over the 2x50 window.  A restored query may sit
    # outside the window UNCERTIFIED only while its same-shape oracle
    # (q86/q64 — see plans.RESTORED_SUBSET_COVERED) is ACTUALLY GREEN
    # in the latest file (r16, ADVICE r15 medium: `sup in window`
    # excused the pair on a certification that had not happened yet —
    # a red superset row would have kept the excuse alive), AND the
    # per-suite DuckDB twin (test_retired_oracles.py::
    # test_restored_pair_matches_duckdb_oracles) runs the restored
    # query's own Spark plan against its own oracle every suite run.
    from data_warehouse_nhom8_spark.plans import RESTORED_SUBSET_COVERED

    window = set(list(QUERIES)[:50])
    excused = {
        q
        for q, sup in RESTORED_SUBSET_COVERED.items()
        if sup in green_latest
    }
    uncovered = [
        q
        for q in ORACLES
        if q not in window and q not in green_latest and q not in excused
    ]
    assert not uncovered, (
        f"oracled queries outside the 50-row window lack a green row in "
        f"{os.path.basename(files[-1])}: {uncovered} — the derived front "
        "list in plans/__init__.py should have caught this"
    )

    front = [q for q in ORACLES if q not in green_latest]
    assert len([q for q in front if q not in excused]) <= 50, (
        f"{len(front)} oracled queries need certification this round but the "
        "driver window is 50 — too many new/failed queries at once. "
        f"Remaining headroom for NEW oracled queries this round: "
        f"{50 - len(front)} (negative = remove/merge oracles or grow "
        "surface through _noracle + exact-twin pytest instead)"
    )


def test_q116_order_survives_above_sort(spark):
    """q116's final row order is CONVENTIONAL, not contractual
    (VERDICT r15 "what's wrong" #4): with ordered=True the Sort sits
    below the excision projections, so the oracle's result-order check
    relies on everything above the Sort being order-preserving narrow
    ops. Gate the shape: no Exchange (shuffle) and no non-broadcast
    join may appear ABOVE the Sort in the physical plan — anyone
    inserting one silently breaks the order guarantee. Also pin the
    r16 scrub-join win: the spans side joins as a broadcast under the
    size policy, so corpus text is exchanged exactly once (the final
    order's range partitioning), not shuffled again for the join."""
    p = plan_of(spark, "q116_decontaminate_scrub")
    tree = p.split("\n\n")[0].splitlines()
    sort_lines = [i for i, ln in enumerate(tree) if "- Sort" in ln]
    assert sort_lines, p
    above = "\n".join(tree[: sort_lines[0]])
    assert "Exchange" not in above, above
    assert "Join" not in above, above
    # the scrub join itself: broadcast under the bench-scale policy,
    # and the corpus text carries exactly one (range) exchange
    assert "SortMergeJoin" not in p, "spans-side broadcast policy regressed"
    assert p.count("Exchange hashpartitioning(doc_id") == 0, p


def test_frequency_topk_is_take_ordered(spark):
    """Vocab/bigram heads must compile to TakeOrderedAndProject over a
    partially-aggregated count — each partition contributes its local
    top-k, no global sort of the vocabulary."""
    for q in ("q66_vocab_topk", "q67_bigram_topk"):
        p = plan_of(spark, q)
        assert "TakeOrderedAndProject" in p, q
        assert "partial_count" in p, q
        assert p.count("FileScan parquet") == 1, (q, "single scan of documents")


def test_repetition_stats_two_level_partial_agg(spark):
    """q65's word-count shape: both aggregation levels must map-side
    combine before their shuffles."""
    p = plan_of(spark, "q65_repetition_quality")
    assert p.count("partial_count") >= 1 and "partial_sum" in p
    assert p.count("FileScan parquet") == 1


def test_q71_semi_join_with_residual(spark):
    """Q4 shape: the EXISTS compiles to a LEFT SEMI join (never a
    count-and-filter subquery rewrite) with the date filters pushed to
    the orders scan."""
    p = plan_of(spark, "q71_late_shipment_priority")
    assert "LeftSemi" in p
    assert "GreaterThanOrEqual(o_orderdate" in p, "orders window must push to scan"


def test_q73_aggregates_before_joining(spark):
    """Q18 shape: the HAVING sum(qty)>300 must run on the groupBy
    OUTPUT before either join (join inputs are qualifying orders only),
    and the top-100 must be TakeOrderedAndProject."""
    p = plan_of(spark, "q73_large_volume_customer")
    assert "TakeOrderedAndProject" in p
    assert "(sum_qty" in p and "> 300.0" in p, "agg-filter must precede the joins"


def test_q74_single_fact_scan(spark):
    """Q15 shape: the MAX-revenue scalar must come from a one-row
    BROADCAST over the per-supplier agg output (round-7: replaced the
    unpartitioned window — suppliers scale with SF, so the window
    single-tasks at 100 TB). The derivation may appear twice (both
    instances pushed-filtered parallel scans; exchange reuse
    collapses them when sizes warrant) — what may NOT appear is an
    all-rows-to-one-task stage."""
    p = plan_of(spark, "q74_top_supplier")
    assert p.count("lineitem.parquet") <= 2, "at most the classic Q15 double scan"
    assert "Window" not in p, "scalar must not be a single-task window"
    assert "CartesianProduct" not in p


def test_q77_broadcasts_nation_and_takes_top20(spark):
    p = plan_of(spark, "q77_returned_item_revenue")
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p
    assert "EqualTo(l_returnflag,R)" in p, "returnflag filter must push to scan"


def test_q76_window_is_bounded_frame(spark):
    """The moving average must be a bounded ROWS frame (sliding, O(1)
    state per row) — not an unbounded running frame."""
    p = plan_of(spark, "q76_moving_avg_order_value")
    assert "specifiedwindowframe(RowFrame, -2, currentrow$())" in p
    assert "unboundedpreceding" not in p.lower()
    assert "CartesianProduct" not in p


def test_q78_local_topm_prunes_map_side(spark):
    """The per-cell candidate list must prune to m via WindowGroupLimit
    (each task keeps its local top-m before the shuffle) — never a full
    (cell, item) sort."""
    p = plan_of(spark, "q78_freq_head_rollup")
    assert "WindowGroupLimit" in p
    assert "partial_count" in p, "the (cell,item) count must map-side combine"


def test_q80_cube_is_single_scan_expand(spark):
    """CUBE must compile to ONE fact scan + Expand (4 grouping sets),
    never one aggregate pass per combination."""
    p = plan_of(spark, "q80_cube_summary")
    assert "Expand" in p
    assert p.count("lineitem.parquet") == 1
    assert "partial_count" in p


def test_q81_group_concat_aggregates_partial(spark):
    """collect_list runs as a two-level ObjectHashAggregate (partial
    before the shuffle) with the region dim broadcast."""
    p = plan_of(spark, "q81_grouped_concat")
    assert "ObjectHashAggregate" in p
    assert "BroadcastHashJoin" in p


def test_q82_share_total_is_broadcast_scalar(spark):
    """The share-of-total must be a one-row broadcast over the
    per-nation AGG output — never a single-task window (pattern
    uniform with q74/q102); the agg lineage may appear twice."""
    p = plan_of(spark, "q82_revenue_share")
    assert p.count("lineitem.parquet") <= 2
    assert "Window" not in p
    assert "CartesianProduct" not in p


def test_q83_spine_is_dim_sized_single_fact_scan(spark):
    """The date spine must come from the ROLLUP's keys and bounds
    (dim-sized cross join + sequence/explode) — the events fact is
    scanned for the rollup, never again for the spine."""
    p = plan_of(spark, "q83_gap_filled_daily")
    # the materialized rollup feeds bounds/keys/join from one scan
    assert p.count("events.parquet") <= 1, "fact must not re-enter for the spine"
    assert "Generate explode" in p or "Generate" in p
    assert "CartesianProduct" not in p


def test_q84_funnel_single_scan_no_self_join(spark):
    """The funnel must be one scan of events + per-user windows —
    never the naive k-way self-join of the event log."""
    p = plan_of(spark, "q84_funnel_conversion")
    assert p.count("events.parquet") == 1
    assert "Window" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_q85_cohort_single_scan(spark):
    """Cohort matrix must derive first-seen from a window over ONE
    scan — not the cohort-SQL self-join trap."""
    p = plan_of(spark, "q85_retention_cohorts")
    assert p.count("events.parquet") == 1
    assert "Window" in p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p


def test_q86_all_three_predicates_pushed(spark):
    """Q6 shape: date window, discount band, and quantity cap must ALL
    reach the parquet scan — at 100 TB the query IS the pushed scan."""
    p = plan_of(spark, "q86_forecast_revenue")
    # toString truncates the PushedFilters list — pin the pushdown via
    # its prefix and the (un-truncated) Filter node predicates
    assert (
        "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), "
        "IsNotNull(l_quantity), GreaterThanOrEqual" in p
    ), p[:1200]
    assert "(l_quantity" in p and "< 24.0)" in p
    assert ">= 0.05)" in p and "<= 0.07)" in p
    assert p.count("FileScan parquet") == 1


def test_q87_nation_pair_broadcasts_with_in_pushdown(spark):
    """Q7 shape: both nation dims broadcast, pre-filtered to the two
    nations of interest — the In() must reach the nation scan so the
    fact stream is pruned by broadcast joins, not post-filtered."""
    p = plan_of(spark, "q87_volume_shipping")
    assert p.count("In(n_name, [NATION_1,NATION_2]") == 2, p[:800]
    assert "SortMergeJoin" not in p or p.count("BroadcastHashJoin") >= 4


def test_q88_market_share_single_pass(spark):
    """Q8 shape: the share is a conditional-sum / sum over ONE
    aggregated pass — the fact is scanned once, every dim broadcasts."""
    p = plan_of(spark, "q88_market_share")
    assert p.count("lineitem.parquet") == 1
    assert p.count("BroadcastHashJoin") >= 5
    assert "EqualTo(p_type,ECONOMY)" in p, "part type filter must push"


def test_q90_outer_join_keeps_zero_bucket(spark):
    """Q13 shape: the customer⋈orders join must stay LEFT OUTER (the
    0-order bucket is the point) and the orders-side priority filter
    must push to its scan, never to a post-join filter that would
    silently turn the join inner."""
    p = plan_of(spark, "q90_customer_order_distribution")
    assert "LeftOuter" in p
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in p
    assert p.count("partial_count") >= 2, "both agg levels must map-side combine"


def test_q92_disjunction_splits_and_pushes(spark):
    """Q19 shape: Catalyst must split the OR-of-ANDs — the brand/size
    arms push to the part scan AND the derived quantity-band
    disjunction pushes to the lineitem scan."""
    p = plan_of(spark, "q92_disjunctive_predicate_revenue")
    assert "Or(" in p.split("part.parquet")[0] or "Or(" in p, p[:800]
    # the quantity disjunction must reach the fact scan
    fact_scan = [s for s in p.split("FileScan parquet") if "lineitem" in s[:2000]]
    assert any("l_quantity" in s.split("ReadSchema")[0] for s in fact_scan), p[:1200]
    assert "BroadcastHashJoin" in p


def test_q93_aggregate_rewrite_shape(spark):
    """Q21 shape, round-7 rewrite: the per-order set conditions run as
    two count-distinct aggregates feeding keyed LEFT SEMI joins (no
    LeftAnti self-join, no inequality residual), supplier dim
    broadcast, never a cartesian/nested-loop fallback. The oracle
    keeps the EXISTS/NOT-EXISTS form, so this plan's equivalence is
    hash-checked externally."""
    p = plan_of(spark, "q93_waiting_supplier")
    assert p.count("LeftSemi") >= 2
    assert "partial_min" in p and "partial_max" in p, (
        "set-cardinality tests must be map-side-combinable min/max aggs"
    )
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    assert "BroadcastHashJoin" in p


def test_q94_packing_single_scan_sharded_window(spark):
    """Packing must be ONE scan + a SHARD-partitioned running-sum
    window (a global-order window would serialize the corpus through
    one task) + map-side-combined final aggregate."""
    p = plan_of(spark, "q94_sequence_packing")
    assert p.count("FileScan parquet") == 1
    assert "Window" in p and "partial_count" in p
    # window must be partitioned: its required distribution is a
    # hashpartitioning exchange, never SinglePartition before Window
    assert "Window [" in p or "Window\n" in p or "Window" in p
    head = p.split("Window")[1]
    assert "shard" in head[:400], head[:400]


def test_q95_tfidf_one_explode_pass(spark):
    """df must derive from the tf output (window over term), never a
    second explode of the corpus; the rank filter must push a
    map-side WindowGroupLimit."""
    p = plan_of(spark, "q95_tfidf_topterms")
    assert p.count("Generate explode") == 1, "token stream exploded more than once"
    assert p.count("WindowGroupLimit") >= 2
    assert p.count("FileScan parquet") <= 2  # tf pass + count-only scan


def test_q97_mixture_normalizer_is_dim_sized(spark):
    """The corpus pass is one partial-agg; the unpartitioned window
    runs over source-cardinality rows only (dim-sized)."""
    p = plan_of(spark, "q97_mixture_temperature")
    assert p.count("FileScan parquet") == 1
    assert "partial_sum" in p


def test_q98_centroids_two_level_partial_agg(spark):
    """One posexplode pass; both aggregation levels map-side combine;
    the second level's input is label x dim (dim-sized)."""
    p = plan_of(spark, "q98_embedding_centroids")
    assert p.count("FileScan parquet") == 1
    assert "Generate posexplode" in p
    assert p.count("partial_sum") >= 2


def test_surprisal_broadcasts_vocab_two_scans(spark):
    """q99's contract: the vocab probe must be a BROADCAST join (the
    vocab table is token+int rows), the scalar total must NOT be a
    nested-loop/cartesian branch, and the corpus is scanned exactly
    twice (vocab build + probe) — a third scan means the total
    re-derived the vocab lineage."""
    p = plan_of(spark, "q99_unigram_surprisal")
    assert "BroadcastHashJoin" in p, p[:800]
    assert "BroadcastNestedLoopJoin" not in p, p[:800]
    assert "CartesianProduct" not in p, p[:800]
    assert p.count("FileScan parquet") == 2, p[:800]


def test_source_cap_pushes_window_group_limit(spark):
    """q100's skew contract: both window phases must push a map-side
    WindowGroupLimit (only ~cap rows per group cross each shuffle —
    the property that bounds a hot source), and the scan reads only
    the two needed columns."""
    p = plan_of(spark, "q100_source_cap")
    assert "WindowGroupLimit" in p, p[:800]
    assert "ReadSchema: struct<doc_id:bigint,source:string>" in p, p[:800]


def test_q101_decorrelated_min_is_window_single_derivation(spark):
    """Q2 shape: the correlated per-part MIN must be a WINDOW over the
    joined candidate rows — partsupp derived ONCE (part feeds the scan
    twice total: derivation + the size/type filter), never a per-row
    re-scan of the subquery, and no cartesian anywhere (the one-row
    supplier-count joins as a broadcast)."""
    p = plan_of(spark, "q101_min_cost_supplier")
    assert "CartesianProduct" not in p, p[:800]
    assert "Window" in p
    assert p.count("part.parquet") == 2, "partsupp must be derived exactly once"
    assert "TakeOrderedAndProject" in p, "top-100 must not global-sort"


def test_q102_total_is_broadcast_scalar_over_agg_output(spark):
    """Q11 shape: the HAVING-over-global-share total must be a one-row
    broadcast over the per-part agg OUTPUT (parts scale with SF — an
    unpartitioned window would single-task them at 100 TB) — one
    partsupp derivation, one part scan, no second aggregation pass
    over partsupp and no cartesian."""
    p = plan_of(spark, "q102_important_stock")
    assert p.count("part.parquet") <= 2, "map-only derivation, at most twice"
    assert "Window" not in p, "total must not be a single-task window"
    assert "CartesianProduct" not in p, p[:800]


def test_q103_profit_no_cartesian_dims_broadcast(spark):
    """Q9 shape: the 6-way profit join must keep the name-filtered part
    keys + supplier + nation as broadcasts and contain no cartesian;
    the partsupp join is keyed (broadcast at test scale, shuffle at
    real scale — either is keyed, never nested-loop)."""
    p = plan_of(spark, "q103_product_profit")
    assert "CartesianProduct" not in p, p[:800]
    assert p.count("BroadcastHashJoin") >= 3
    assert "Contains(p_name,r)" in p, "name filter must push to the part scan"


def test_q104_not_in_is_single_anti_join(spark):
    """Q16 shape: the NOT IN supplier denylist must compile to ONE
    LEFT ANTI join (never a per-row membership probe), with the part
    filters pushed to the scan feeding the derivation."""
    p = plan_of(spark, "q104_supplier_part_count")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p, p[:800]
    # (the In(p_size,...) pushed filter is elided by plan-string
    # truncation, so pin the brand filter from the same scan instead)
    assert "Not(EqualTo(p_brand,Brand#5))" in p, "part filters must push to the scan"
    assert "StringEndsWith(s_name,7)" in p, "denylist pattern must push to its scan"


def test_q105_prefix_pushes_and_semi_join(spark):
    """Q20 shape: the part-name prefix must reach the parquet scan as
    a StartsWith pushed filter; the qualifying-supplier restriction
    must be a LEFT SEMI join; the correlated quantity agg is a single
    grouped aggregate (no cartesian, no re-scan per supplier)."""
    p = plan_of(spark, "q105_excess_inventory")
    assert "StringStartsWith(p_name,small)" in p, p[:800]
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p, p[:800]


def test_derived_partsupp_supplier_counts_coprime():
    """ADVICE r7: derived_partsupp's "4 distinct suppliers per part"
    holds only when gcd(S, 17) == 1 and S > 3 (17 | S collapses all
    four generated ps_suppkeys — invisible to the oracle hash gate
    because DuckDB runs the same derivation). Pin the assumption for
    every testdata scale factor; TPC-H supplier counts are 10*SF*1000
    (powers of 10, never multiples of 17), so this holds by
    construction of the generator too."""
    import glob
    import math

    import pyarrow.parquet as pq

    dirs = sorted(glob.glob("/root/testdata/sf*"))
    assert dirs, "testdata missing"
    for d in dirs:
        s = pq.ParquetFile(f"{d}/supplier.parquet").metadata.num_rows
        assert s > 3 and math.gcd(s, 17) == 1, (d, s)


def test_q110_span_dedup_skew_safe_shape(spark):
    """q110's scale contract (single-pass form, round 11): the gram
    build runs ONCE (exactly one posexplode Generate — the old
    groupBy+join-back shape ran the interpreted-HOF build twice), the
    duplicate test is window aggregates over the hash (one shuffle,
    partitioned on __h; distinct-docs as min!=max, no count_distinct
    expand), the per-doc merge is a collect_list aggregate with
    map-side partials, and no Python eval / cartesian node exists."""
    p = plan_of(spark, "q110_span_dedup")
    assert "CartesianProduct" not in p and "BatchEvalPython" not in p
    assert p.count("posexplode") == 1, "gram build must run exactly once"
    flat = p.lower().replace(" ", "")
    assert "partitionby:[__h" in flat or "windowpartitionby=[__h" in flat or (
        "window" in flat and "__h" in flat
    ), p[:800]
    assert "partial_collect_list" in p, "span merge must partial-agg"


def test_q111_url_dedup_pushes_window_group_limits(spark):
    """q111's skew contract: the per-domain cap phases push map-side
    WindowGroupLimits (only ~cap rows per salt shard / domain cross
    each shuffle — what bounds a hot crawl domain), the URL-dedup
    window partitions on the fine-grained canon_url key, and the
    scan reads only the two source columns the synthesizer needs."""
    p = plan_of(spark, "q111_url_dedup_cap")
    assert "WindowGroupLimit" in p, p[:800]
    assert "windowpartitionby=[canon_url" in p.lower().replace(" ", "") or (
        "canon_url" in p
    ), p[:800]
    assert "ReadSchema: struct<doc_id:bigint,source:string>" in p, p[:800]
    assert "CartesianProduct" not in p and "BatchEvalPython" not in p


def test_q112_contamination_fraction_broadcasts_benchmark(spark):
    """q112's scale contract, the q57+q110 composite (single-scan
    form, round 11): the benchmark gram-digest set broadcasts into a
    LEFT marker join (the corpus's exploded window stream never
    shuffles into the join; bench grams are distinct so no row
    multiplication), the corpus text is scanned by exactly ONE
    posexplode window build (token counts ride along — no second
    scan, no join-back), the per-doc span merge is a
    partial-aggregated collect_list, and nothing goes cartesian or
    drops to Python eval."""
    p = plan_of(spark, "q112_contamination_fraction")
    assert "BroadcastHashJoin" in p and "LeftOuter, BuildRight" in p, p[:800]
    assert "SortMergeJoin" not in p, "gram join must broadcast"
    assert p.count("posexplode") == 1, "corpus window build must run exactly once"
    assert "partial_collect_list" in p, "span merge must partial-agg"
    assert "CartesianProduct" not in p and "BatchEvalPython" not in p


def test_q113_sessionization_windows_partition_on_user(spark):
    """q113's scale contract: one events scan, every window partitions
    on the user key (no Exchange SinglePartition anywhere — a global
    sort over a 100 TB event stream is the failure mode), and the
    session rollup aggregates with map-side partials."""
    p = plan_of(spark, "q113_sessionization")
    assert "Exchange SinglePartition" not in p, p[:800]
    assert p.count("FileScan parquet") == 1, "one scan of events"
    assert "partial_count" in p or "partial_min" in p, "rollup must partial-agg"
    assert "CartesianProduct" not in p and "BatchEvalPython" not in p


def test_q41_neardup_single_scan_bucket_broadcast(spark):
    """q41's scale contract (r14, audit addition): ONE embeddings
    scan feeds both sides of the bucket self-join (the bucketed side
    broadcasts — candidate pairs never materialize beyond the bucket
    collisions), no cartesian/BNLJ anywhere, and the top-20 is a
    TakeOrderedAndProject, not a global sort."""
    df = QUERIES["q41_embedding_neardup"](spark, SF_DIR)
    df.collect()  # AQE finalizes exchange reuse only during execution
    # the adaptive toString appends the pre-execution "Initial Plan"
    # section — count operators in the FINAL plan only
    p = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert p.count("FileScan parquet") == 1, p[:800]
    assert "BroadcastHashJoin" in p, p[:800]
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "TakeOrderedAndProject" in p, p[:800]


def test_q42_multimodal_scan_prunes_to_payload_inputs(spark):
    """q42's scale contract (r14, audit addition): the documents scan
    is column-pruned to exactly the payload inputs (doc_id, text)
    BEFORE the Arrow mapInPandas lane — a scan reading the full row
    for a 2-column codec input is the classic multimodal-pipeline
    regression — and the codec runs as MapInPandas (Arrow batches),
    never row-at-a-time Python."""
    import re

    p = plan_of(spark, "q42_multimodal_features")
    assert "MapInPandas" in p, p[:800]
    assert "BatchEvalPython" not in p, "row-UDF crept into the codec lane"
    assert p.count("FileScan parquet") == 1, p[:800]
    m = re.search(r"FileScan parquet \[([^\]]*)\]", p)
    cols = {c.split("#")[0] for c in m.group(1).split(",")}
    assert cols == {"doc_id", "text"}, cols


def test_q39_simhash_pairs_broadcast_never_cartesian(spark):
    """q39's scale contract (r14, oracle promotion): signatures are
    map-only and localCheckpointed (the pair plan re-reads them, not
    the corpus — zero parquet scans in the final plan), the chunk
    self-join and the bucket-size guard are broadcast hash joins with
    the guard's exchange REUSED across both sides, and nothing goes
    cartesian."""
    df = QUERIES["q39_simhash_neardup"](spark, SF_DIR)
    df.collect()  # AQE finalizes exchange reuse only during execution
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("FileScan parquet") == 0, p[:800]
    assert "BroadcastHashJoin" in p, p[:800]
    assert "ReusedExchange" in p, p[:800]
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_q118_semantic_dedup_output_is_scan_free(spark):
    """q118's declared output (r14, audit addition): the scrub list
    is the clustered RESULT of the iterative connected-components
    pass — the final plan re-reads no parquet (edges were consumed
    during the eager clustering; localCheckpoint pins each round) and
    emits the ordered (vec_id, component) projection only."""
    p = plan_of(spark, "q118_semantic_dedup")
    assert p.count("FileScan parquet") == 0, p[:800]
    assert "CartesianProduct" not in p and "BatchEvalPython" not in p


# ---------------------------------------------------------- fit plans

def _fit_plan_map(spark):
    import importlib
    import sys

    sys.path.insert(0, ".")
    pa = importlib.import_module("scripts.plan_audit")
    return {
        title: df._jdf.queryExecution().executedPlan().toString()
        for title, _note, df in pa._fit_plans(spark, SF_DIR)
    }


def test_fit_plans_stay_under_review(spark):
    """VERDICT r14 task 3: the store builds behind the session memos
    (the compute store_fit_sec prices) keep their load-bearing plan
    properties — the audit's memo-read entries must not be the only
    thing under plan review.

    - simhash fold: map-only over ONE scan — no shuffle exchange, no
      explode-shaped generator;
    - gram digest: partial-aggregated distinct (map-side combine
      before the shuffle);
    - CC propagation round: equi-joins only, never a cartesian."""
    plans = _fit_plan_map(spark)

    sig = plans["fit: simhash signature fold (simhash_sigs store build)"]
    assert sig.count("FileScan parquet") == 1
    # the only exchange allowed is the deliberate RoundRobin compute
    # fan-out (split-starvation guard) — never a key shuffle
    assert "hashpartitioning" not in sig and "rangepartitioning" not in sig, (
        "signature fold must stay map-only (no key shuffle)"
    )
    assert "Generate" not in sig, "SWAR fold replaced the explode form"

    gram = plans["fit: benchmark gram digest (bench_grams store build)"]
    assert "partial_" in gram or "HashAggregate" in gram
    assert gram.count("HashAggregate") >= 2, "distinct must partial-agg map-side"

    cc = plans[
        "fit: connected-components propagation round (cluster_map_store)"
    ]
    assert "CartesianProduct" not in cc
    assert "BroadcastNestedLoopJoin" not in cc
    assert "partial_min" in cc, "neighbour-min must partial-agg map-side"

    mh = plans[
        "fit: MinHash signatures + band histogram (corpus_sig_store build)"
    ]
    assert "CartesianProduct" not in mh
    assert "BroadcastNestedLoopJoin" not in mh
    assert mh.count("FileScan parquet") == 1, "one shingling pass feeds all tiers"
    # signatures are a per-row array fold — the only aggregate in the
    # build is the band histogram, and IT must partial-agg map-side
    assert "partial_count" in mh, "bucket histogram must partial-agg map-side"
    assert "Generate" in mh, "band table is an explode over stored signatures"
