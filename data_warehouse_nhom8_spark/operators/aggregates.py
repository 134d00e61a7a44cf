"""Aggregation operators (SURVEY.md §2d).

Everything here is a plain hash aggregate — partial (map-side) +
final after a shuffle on the group keys, which is what Spark plans
for `groupBy().agg()` automatically. The helpers encode the
determinism contract used by the oracle comparison:

- money sums go through DECIMAL(18,2) (exact, associative — a double
  sum is order-dependent and a 100 TB sum *will* differ run to run);
- averages are computed as exact decimal SUM / COUNT, so Spark and
  DuckDB round the same value;
- `approx_count_distinct` is exposed as the scale twin of exact
  COUNT(DISTINCT) — at 100 TB the exact form is a full shuffle of the
  distinct keys, HLL is a constant-size sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def count_if(cond: Column) -> Column:
    """SUM(CASE WHEN cond THEN 1 ELSE 0 END) — conditional count (A2)."""
    return F.sum(F.when(cond, 1).otherwise(0))


def decimal_sum(col: Column | str, scale: int = 2) -> Column:
    """Exact, order-independent money sum: SUM(CAST(x AS DECIMAL(18,s)))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})"))


def exact_avg(col: Column | str, round_to: int = 2) -> Column:
    """Deterministic ROUND(AVG(x), n) via exact decimal sum / count.

    Returns DOUBLE so Spark and DuckDB agree on the output type.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.sum(c.cast("decimal(18,4)"))
    return F.round(s / F.count(F.lit(1)), round_to).cast("double")


def grouping_sets_union(df: DataFrame, key_sets: list[list[str]], agg_cols: list[Column]) -> DataFrame:
    """GROUPING SETS as a union of per-set aggregates (A1 generalized).

    The reference's datamart runs one GROUP BY per configured key over
    the same source (reference datamart/load_to_dm.py:118-123 +
    config.xml:86-123); expressing the set as GROUPING SETS lets Spark
    share the scan via `Expand` instead of N passes.

    This helper keeps the semantics portable: union of groupBys with
    NULL-padding for the keys outside each set. (For the shared-scan
    physical plan, use `spark.sql` GROUPING SETS — both are provided
    so plans can be compared.)
    """
    all_keys: list[str] = []
    for ks in key_sets:
        for k in ks:
            if k not in all_keys:
                all_keys.append(k)
    parts = []
    for ks in key_sets:
        g = df.groupBy(*ks).agg(*agg_cols)
        for k in all_keys:
            if k not in ks:
                g = g.withColumn(k, F.lit(None).cast(df.schema[k].dataType))
        parts.append(g.select(*all_keys, *[c for c in g.columns if c not in all_keys]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def hll_sketch_rollup(
    df: DataFrame,
    fine_keys: list[str],
    coarse_keys: list[str],
    distinct_col: str,
    est_name: str = "est_distinct",
) -> tuple[DataFrame, DataFrame]:
    """Mergeable count-distinct rollup: (fine-grain sketch table,
    coarse re-aggregated estimates).

    The 100 TB pattern exact COUNT(DISTINCT) cannot do: pre-aggregate
    a constant-size HLL sketch per fine cell (e.g. event_type × day),
    store it, and answer ANY coarser rollup by unioning sketches —
    never rescanning the fact table, never shuffling the distinct
    keys. Daily jobs append fine cells; monthly/level rollups are
    sketch unions over the tiny cell table. Estimate error is the
    standard HLL ±~1.6% (lgConfigK default 12); pytest pins tolerance
    vs exact and union-vs-direct agreement."""
    fine = df.groupBy(*fine_keys).agg(
        F.hll_sketch_agg(distinct_col).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    coarse = fine.groupBy(*coarse_keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(est_name),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n_rows").alias("n_rows"),
    )
    return fine, coarse


def kll_quantile_rollup(
    df: DataFrame,
    fine_keys: list[str],
    coarse_keys: list[str],
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.95),
) -> tuple[DataFrame, DataFrame]:
    """Mergeable quantile rollup — the KLL twin of `hll_sketch_rollup`.

    Exact percentiles need the full value multiset per group (a sort
    or full collection — unbounded state at 100 TB). A KLL sketch is
    constant-size with a guaranteed rank error (~1.65% at the default
    k=200), and sketches MERGE: pre-aggregate one per fine cell, then
    answer any coarser rollup by merging cell sketches — no fact
    rescan, no value shuffle. Fine table: (fine_keys, sketch, n_rows);
    coarse table: (coarse_keys, q_<pct> estimates, n_cells, n_rows).
    Tolerance vs exact percentiles is pinned in pytest and in q68's
    driver oracle (rank-of-estimate within 5% of target)."""
    aliases = [f"q_{int(round(q * 100))}" for q in quantiles]
    if len(set(aliases)) != len(aliases):
        # e.g. 0.50 and 0.504 both round to q_50 — the duplicate name
        # breaks every downstream select-by-name silently
        raise ValueError(
            f"quantiles {quantiles} collide after integer-percent "
            f"naming ({aliases}); space them at least one percent "
            "apart or query the fine sketches directly"
        )
    fine = df.groupBy(*fine_keys).agg(
        F.expr(f"kll_sketch_agg_double({value_col})").alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    ests = [
        F.expr(f"kll_sketch_get_quantile_double(kll_merge_agg_double(sketch), {q})")
        # round before int(): 0.29 * 100 float-truncates to 28
        .alias(alias)
        for q, alias in zip(quantiles, aliases)
    ]
    coarse = fine.groupBy(*coarse_keys).agg(
        *ests,
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n_rows").alias("n_rows"),
    )
    return fine, coarse


def local_topm(
    df: DataFrame, keys: list[str], count_col: str, item_col: str, m: int
) -> DataFrame:
    """Per-group bounded head: keep each group's top-``m`` rows by
    (count desc, item asc) — the ONE definition of candidate-list
    truncation shared by the batch rollup, the streaming sink, the
    store reader, and the compactor, so tie-break order can never
    drift between them. Compiles to WindowGroupLimit (map-side prune
    before the shuffle)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(F.desc(count_col), F.col(item_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= m)
        .drop("__rk")
    )


def freq_candidate_rollup(
    df: DataFrame,
    fine_keys: list[str],
    coarse_keys: list[str],
    item_col: str,
    m: int = 100,
    k: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """Mergeable heavy-hitter rollup — the frequency member of the
    sketch-store family (HLL=distinct, KLL=quantiles, theta=sets,
    this=frequent items).

    Per fine cell, keep the exact local top-``m`` (item, count) pairs —
    a bounded candidate list, the SpaceSaving/Misra-Gries store shape.
    Any coarser rollup sums the stored candidate counts per item and
    takes its top-``k``; the fact table is never rescanned.

    Guarantees (pinned in tests/test_tables_stateful.py):
    - stored counts are exact per cell, so the merged count is a LOWER
      BOUND on the true count, short by at most the item's mass in
      cells where it fell outside the local top-m — bounded by
      Σ_cells floor(N_cell / (m+1));
    - every item with true coarse count > Σ_cells N_cell/(m+1) appears
      in the merged CANDIDATE SET (it cannot be truncated everywhere).
      The returned head is then the top-``k`` of the candidates by
      lower-bound count — a qualifying item can still fall outside a
      small k, and a truncated-but-heavier item can rank below a
      lighter untruncated one; consumers needing the full guarantee
      should read the merged candidates (rank unfiltered) rather than
      the k-head;
    - when m ≥ per-cell item cardinality nothing truncates and the
      rollup is bit-exact (the certification setting for q78).

    Scale notes: the (cell, item) count partial-aggregates map-side;
    the local top-m compiles to WindowGroupLimit (each task prunes to
    m before the shuffle); the merge shuffles only the ≤ m×cells
    candidate rows. No global frequency sort ever happens.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(*fine_keys, item_col).agg(F.count(F.lit(1)).alias("cnt"))
    fine = local_topm(counts, fine_keys, "cnt", item_col, m)
    merged = fine.groupBy(*coarse_keys, item_col).agg(F.sum("cnt").alias("lb_count"))
    w_coarse = Window.partitionBy(*coarse_keys).orderBy(
        F.desc("lb_count"), F.col(item_col)
    )
    head = merged.withColumn("rank", F.row_number().over(w_coarse)).filter(
        F.col("rank") <= k
    )
    return fine, head


def theta_user_overlap(
    df: DataFrame,
    entity_col: str,
    cohort_col: str,
    cohort_a: str,
    cohort_b: str,
) -> DataFrame:
    """Distinct-entity set algebra via theta sketches: |A|, |B|,
    |A ∩ B|, |A ∪ B| estimates for two cohorts (e.g. retention =
    users who did BOTH event types) in ONE scan.

    Exact set intersection needs the distinct entity sets themselves
    (INTERSECT = two shuffles of every key). Theta sketches are
    constant-size, mergeable, and support intersection/difference —
    at 100 TB the per-cohort sketches come from the same pre-
    aggregated cell store as the HLL rollup, and any cohort-pair
    overlap is answered sketch-side. Single-row output with rounded
    estimates.

    Cohort values are injected as proper literals (a conditional
    projection the aggregate sees as its input), never spliced into
    SQL text — a cohort name containing a quote is data, not syntax.
    """
    # theta_sketch_agg ignores nulls, so a when() with no otherwise
    # restricts each sketch to its cohort's entities
    in_a = F.when(F.col(cohort_col) == F.lit(cohort_a), F.col(entity_col))
    in_b = F.when(F.col(cohort_col) == F.lit(cohort_b), F.col(entity_col))

    def est(expr: str) -> Column:
        return F.expr(f"round(theta_sketch_estimate({expr}))").cast("long")

    return (
        df.select(in_a.alias("__ca"), in_b.alias("__cb"))
        .agg(
            F.expr("theta_sketch_agg(__ca)").alias("__sa"),
            F.expr("theta_sketch_agg(__cb)").alias("__sb"),
        )
        .select(
            est("__sa").alias("est_a"),
            est("__sb").alias("est_b"),
            est("theta_intersection(__sa, __sb)").alias("est_both"),
            est("theta_union(__sa, __sb)").alias("est_either"),
        )
    )


def cents(col: Column | str, digits: int = 2) -> Column:
    """Exact integer staging of a fixed-point money/rate column: the
    source doubles carry <= `digits` decimal places, so
    round(x * 10^digits) recovers the exact integer numerator — the
    same expression runs in the DuckDB oracle (both engines HALF_UP
    away from zero on the identically-computed double product)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * (10 ** digits)).cast("long")


def exact_money_aggs(
    df: DataFrame,
    group_cols: list[str],
    cent_sums: dict[str, tuple[Column, float]],
    extra_partial: dict[str, Column] | None = None,
    extra_final: dict[str, Column] | None = None,
) -> DataFrame:
    """Exact, order-independent money sums WITHOUT the boxed-decimal
    hot path — the round-7 fix for the 2-4x "decimal tax" the 60M-row
    probe measured on q46/q103 (Java BigDecimal per row vs DuckDB's
    vectorized int128).

    Two-level scheme, exact at unbounded scale:

      stage 1: group by (keys, spark_partition_id()) summing exact
               integer cents as LONG — codegen'd primitive adds. For
               direct file scans the partial cannot overflow: rows per
               input split are bounded by
               spark.sql.files.maxPartitionBytes (~1e6 rows at 64 MB),
               and the largest per-row cents value (~1e11 for a
               6-decimal charge) keeps the per-partition partial
               < 1.1e17 << 2^63. For POST-SHUFFLE inputs (join
               outputs: q87/q88/q103) the per-partition row count is
               set by shuffle partitioning, not file splits, so the
               bound is softer — with 2^63/1e11 ≈ 9e7 rows of headroom
               per partition it holds at any sane parallelism, and the
               DESIGNED failure mode past it is a loud ANSI overflow
               throw (see safety net below), never silent wraparound.
      stage 2: merge the dim-sized partials through DECIMAL(38,0) —
               exact integer addition with no overflow bound; the
               boxed path now touches n_partitions x n_groups rows
               instead of every fact row.

    Integer addition is associative/commutative, so the result is
    bit-identical at ANY parallelism and identical to a single-level
    integer sum in any engine (the DuckDB oracle uses SUM(BIGINT) →
    HUGEINT). Measured at 60M rows: 8.9 s (decimal-staged) → 3.9 s,
    value-identical on every column. Safety net: the engine runs with
    ANSI mode on (Spark 4 default), so if an input ever breaks the
    per-partition bound the LONG partial THROWS an overflow error
    instead of silently wrapping.

    `cent_sums`: alias -> (integer-cents Column, divisor) — output is
    CAST(SUM(cents) AS DOUBLE) / divisor. `extra_partial` aggregates
    ride stage 1 and are SUMMED in stage 2 — they must be
    sum-mergeable (counts, sums; a min/max would need a matching
    merge and is not supported here). `extra_final` expressions are
    evaluated over the stage-2 output (refer to sum aliases /
    extra_partial aliases by name).

    Empty-input semantics match single-level SQL exactly: with
    group_cols=[] and ZERO input rows, stage 1 emits no rows and the
    stage-2 global agg emits one row — COUNT-like extra_partial
    aggregates (detected from the expression) are coalesced to 0 to
    match SQL's COUNT-over-empty = 0, while SUM columns stay NULL
    (SQL's SUM-over-empty = NULL, identical to the DuckDB oracle)."""
    extra_partial = extra_partial or {}
    partial = df.groupBy(
        *group_cols, F.spark_partition_id().alias("__pid")
    ).agg(
        *[F.sum(c).alias(f"__p_{a}") for a, (c, _s) in cent_sums.items()],
        *[e.alias(f"__p_{a}") for a, e in extra_partial.items()],
    )

    # stage-2 merges as ONE parsed SQL string per alias (round-10
    # build-cost rule, applied r15 per the floor profile: the Column
    # chains here cost ~50 py4j round trips per output column and this
    # helper backs ~14 money queries — ~0.1-0.25 s of pure plan
    # construction each). The SQL parses to the identical operators
    # (SUM / CAST / double divide; divisor round-trips exactly through
    # repr) — value identity is pinned bitwise by every consumer's
    # DuckDB oracle and by test_exact_money_sql_form_identical.
    def _merge_extra_sql(a: str, e: Column) -> str:
        # COUNT over empty input is 0, not NULL — restore that after
        # the two-level split (stage 1 emits no rows on empty input).
        if "count(" in repr(e).lower():
            return f"COALESCE(SUM(__p_{a}), CAST(0 AS BIGINT)) AS {a}"
        return f"SUM(__p_{a}) AS {a}"

    final_aggs = [
        F.expr(
            f"CAST(SUM(CAST(__p_{a} AS DECIMAL(38,0))) AS DOUBLE) / "
            f"CAST('{s!r}' AS DOUBLE) AS {a}"
        )
        for a, (_c, s) in cent_sums.items()
    ] + [F.expr(_merge_extra_sql(a, e)) for a, e in extra_partial.items()]
    out = partial.groupBy(*group_cols).agg(*final_aggs)
    if extra_final:
        out = out.withColumns(dict(extra_final))
    return out
