"""Substring-span deduplication (SURVEY §2k X1/X2 extension — the
TOKEN-LEVEL dedup tier between exact-doc and near-dup).

Document-level dedup misses the dominant contamination mode of real
training corpora: long VERBATIM SPANS repeated across otherwise-
distinct documents (boilerplate, licenses, quoted articles — the
"Deduplicating Training Data Makes Language Models Better" failure
mode). This operator finds every maximal token span whose W-token
windows all occur elsewhere in the corpus, exactly:

  1. every W-token rolling window is hashed (same lambda-variable
     shingle shape as `operators.neardup` — higher-order lambdas are
     interpreted, so the token array binds once per document);
  2. one global groupBy finds window hashes occurring >= min_count
     times (optionally in >= 2 DISTINCT documents — self-repetition
     within one doc is q65's repetition signal, a different axis);
  3. duplicated window POSITIONS join back (semi-join on the hash)
     and per-document overlapping windows merge into maximal spans
     with a native sort + fold (per-doc state is position-list-sized,
     never corpus-sized).

Scale notes: the only corpus-scale shuffles are the window-hash
groupBy and the join-back on the hash — both key-partitioned,
skew-safe (a boilerplate hash repeated millions of times groups to
ONE row before the join-back; the join explodes only true duplicate
positions). No all-pairs comparison exists; cost is O(total_tokens)
map-side + O(distinct_windows) shuffle. Windows use md5 over the
joined gram (not xxhash64) so a cross-engine oracle could reproduce
counts; the operator itself is exact-twin pytest-verified.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from data_warehouse_nhom8_spark.regexes import WS_SPLIT, WS_SPLIT_SQL


def _window_hashes_sql(text: str, w: int, binary: bool = False) -> str:
    """SQL text of `_window_hashes` over a named column — for callers
    that embed it in a larger parsed expression (posexplode etc.)."""
    gram = f"md5(concat_ws(' ', slice(tk, i, {w})))"
    if binary:
        gram = f"unhex({gram})"
    return (
        f"transform(array(split(lower(trim({text})), '{WS_SPLIT_SQL}')), "
        f"tk -> transform(sequence(1, greatest(size(tk) - {w - 1}, 1)), "
        f"i -> {gram}))[0]"
    )


def _window_hashes(text: Column | str, w: int, binary: bool = False) -> Column:
    """array<string> (or array<binary> with `binary=True`): md5 of
    each W-token rolling window (lowercased, whitespace-split).
    Documents shorter than w tokens yield a single whole-document
    window.

    `binary=True` (r16, guide §2.3 — narrow the shuffle key) emits
    `unhex(md5(...))`: 16 raw bytes instead of the 32-char hex string.
    unhex is a bijection of md5's lowercase hex, so the equality
    classes — and therefore every duplicate decision — are IDENTICAL;
    the window-hash exchange (the span-dedup family's dominant
    shuffle) carries half the key bytes. The hex form stays the
    default because the benchmark gram store persists hex digests
    (`_gram_digests` contract) and the contamination operators join
    against it.

    Pass the column NAME (str) on latency-sensitive paths: the whole
    nested-HOF tree then parses as ONE SQL string in a single JVM
    round-trip (the round-10 build-cost rule — plan CONSTRUCTION was
    costing more driver time than execution on the span-dedup family).
    Same operators, same token binding, bit-identical plans."""
    if isinstance(text, str):
        from data_warehouse_nhom8_spark.session import memo_expr

        return memo_expr(_window_hashes_sql(text, w, binary))
    toks = F.split(F.lower(F.trim(text)), WS_SPLIT)

    def h(x: Column) -> Column:
        return F.unhex(F.md5(x)) if binary else F.md5(x)

    def build(tk: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.size(tk) - (w - 1), F.lit(1)))
        return F.transform(idx, lambda i: h(F.concat_ws(" ", F.slice(tk, i, w))))

    return F.transform(F.array(toks), build)[0]


def duplicated_spans(
    docs: DataFrame,
    window: int = 20,
    min_count: int = 2,
    across_docs: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize: bool = False,
) -> DataFrame:
    """(doc_id, span_start, span_end, n_windows) — maximal 0-based
    token ranges [span_start, span_end) covered by duplicated
    W-token windows. `across_docs=True` (default) counts a window as
    duplicated only when it appears in >= 2 distinct documents AND
    >= min_count times overall (min_count keeps its occurrence-count
    meaning on both branches; the default 2 makes the conjunction a
    no-op since 2 distinct docs imply 2 occurrences).

    Plan shape (round 11 — SINGLE-PASS window form): one gram build,
    one shuffle. The previous shape (groupBy(__h) duplicate counts,
    then join the qualifying hashes back to the window table) ran the
    interpreted-HOF gram build TWICE — Catalyst shares no subtree
    across a self-join — and shuffled the window table a second time
    for the join-back. Window aggregates over `partitionBy(__h)`
    compute the same duplicate test (occurrence count; >= 2 distinct
    docs as `min(__id) != max(__id)`, cheaper than a count_distinct
    expand) on ONE shuffle of the window table, then filter in place.
    Measured at sf0.1 (5000 docs, warm, 8 shuffle partitions):
    2.5/1.9 s old vs 1.4 s new, bit-identical output (pytest + the
    q110/q112 oracles gate equality). Skew: a boilerplate hash
    repeated millions of times hash-clusters to one task here exactly
    as it did in the join-back form — same exposure, one less pass.

    `materialize` (kept for API stability): eagerly localCheckpoints
    the exploded window table. With the single-pass form there is no
    double gram build left to cure, so the default False is simply
    no pinned storage blocks; flip it only when the plan above this
    operator is expensive enough to be worth cutting (results are
    identical either way, pytest-gated)."""
    from data_warehouse_nhom8_spark.session import repartition_if_split_starved

    # the gram build is compute-per-byte-heavy interpreted-HOF work —
    # don't let a single-file input cap it at one task. Assembled as
    # parsed selectExpr (r16 build-cost rule — q110's timed path);
    # same window aggregates as the Column form, results oracle-pinned.
    wins = repartition_if_split_starved(docs.select(id_col, text_col)).selectExpr(
        f"{id_col} AS __id",
        f"posexplode({_window_hashes_sql(text_col, window, binary=True)})"
        " AS (__pos, __h)",
    )
    if materialize:
        wins = wins.localCheckpoint(eager=True)
    cond = f"count(1) OVER (PARTITION BY __h) >= {int(min_count)}"
    if across_docs:
        cond += (
            " AND min(__id) OVER (PARTITION BY __h)"
            " <> max(__id) OVER (PARTITION BY __h)"
        )
    hits = (
        wins.selectExpr("__id", "__pos", f"({cond}) AS __dup")
        .filter("__dup")
        .select("__id", "__pos")
    )
    return _positions_to_spans(hits, window, id_col)


def _merge_positions_col(col: str, window: int):
    """Native fold: sorted window positions → array of maximal merged
    spans (struct<s,e,n>); merge when p <= last.e (overlap OR
    adjacency — equivalent to the oracle's gaps-and-islands break at
    p - lag(p) > window, since ends are p+window and monotone).

    Assembled as ONE parsed SQL string (round-10 build-cost rule):
    the fold tree is ~40 py4j calls in Column form and is rebuilt on
    every plan construction; the SQL form is a single JVM round-trip
    and plans identically (same CASE/concat/named_struct operators —
    certified by the q110/q112 oracles and the exact-twin pytests).
    The Column twin below is kept for reference and regression
    comparison."""
    from data_warehouse_nhom8_spark.session import memo_expr

    w = int(window)
    return memo_expr(
        f"aggregate({col}, "
        "CAST(array() AS array<struct<s:int,e:int,n:int>>), "
        "(acc, p) -> CASE WHEN size(acc) > 0 AND p <= element_at(acc, -1).e "
        "THEN concat(slice(acc, 1, size(acc) - 1), "
        "array(named_struct('s', element_at(acc, -1).s, "
        f"'e', greatest(element_at(acc, -1).e, CAST(p + {w} AS INT)), "
        "'n', element_at(acc, -1).n + 1))) "
        f"ELSE concat(acc, array(named_struct('s', CAST(p AS INT), "
        f"'e', CAST(p + {w} AS INT), 'n', 1))) END)"
    )


def _merge_positions_col_column_form(col: str, window: int):
    """Column-API twin of `_merge_positions_col` — kept for the
    bit-identity regression test (test_span_merge_sql_form_identical)
    and as the readable specification of the fold."""
    return F.aggregate(
        col,
        F.array().cast("array<struct<s:int,e:int,n:int>>"),
        lambda acc, p: F.when(
            (F.size(acc) > 0) & (p <= F.element_at(acc, -1)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        F.greatest(
                            F.element_at(acc, -1)["e"],
                            (p + window).cast("int"),
                        ).alias("e"),
                        (F.element_at(acc, -1)["n"] + 1).alias("n"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(
                        p.cast("int").alias("s"),
                        (p + window).cast("int").alias("e"),
                        F.lit(1).alias("n"),
                    )
                ),
            )
        ),
    )


def _positions_to_spans(hits: DataFrame, window: int, id_col: str) -> DataFrame:
    """(__id, __pos) duplicated-window positions → exploded span rows."""
    merged = (
        hits.groupBy("__id")
        .agg(F.expr("sort_array(collect_list(__pos))").alias("__ps"))
        .select("__id", _merge_positions_col("__ps", window).alias("__spans"))
    )
    return merged.selectExpr(
        f"__id AS {id_col}", "explode(__spans) AS __sp"
    ).selectExpr(
        id_col,
        "__sp.s AS span_start",
        "__sp.e AS span_end",
        "__sp.n AS n_windows",
    )


def span_dedup_stats(
    docs: DataFrame,
    window: int = 20,
    across_docs: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize: bool = False,
) -> DataFrame:
    """Per-document duplicated-token accounting: (doc_id, n_tokens,
    dup_tokens, dup_fraction, n_spans). Documents with no duplicated
    span report zeros (left join against the span table)."""
    spans = duplicated_spans(
        docs, window=window, across_docs=across_docs,
        id_col=id_col, text_col=text_col, materialize=materialize,
    )
    per_doc = spans.groupBy(id_col).agg(
        F.expr("sum(span_end - span_start)").alias("dup_tokens"),
        F.expr("count(1)").alias("n_spans"),
    )
    toks = docs.selectExpr(
        id_col,
        f"size(split(lower(trim({text_col})), '{WS_SPLIT_SQL}')) AS n_tokens",
    )
    return toks.join(per_doc, id_col, "left").selectExpr(
        id_col,
        "n_tokens",
        # spans are window-granular; a short tail doc can be fully
        # covered by a window longer than the doc — clamp
        "least(coalesce(dup_tokens, 0), n_tokens) AS dup_tokens",
        "coalesce(n_spans, 0) AS n_spans",
        "CASE WHEN n_tokens > 0 THEN round(least(coalesce(dup_tokens, 0),"
        " n_tokens) / n_tokens, 4) ELSE 0.0d END AS dup_fraction",
    )


def filter_span_duplicates(
    docs: DataFrame,
    max_dup_fraction: float = 0.5,
    window: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus filter: drop documents whose duplicated-span token
    fraction exceeds the threshold (the standard span-dedup policy —
    remove the COPIES-heavy documents, keep originals with minor
    overlap)."""
    stats = span_dedup_stats(
        docs, window=window, id_col=id_col, text_col=text_col
    ).select(id_col, "dup_fraction")
    return (
        docs.join(stats, id_col, "left")
        .filter(F.coalesce(F.col("dup_fraction"), F.lit(0.0)) <= max_dup_fraction)
        .drop("dup_fraction")
    )


# ----------------------------------------------------- incremental store
#
# The daily-pipeline face (same contract as the incremental MinHash
# detector): a persisted (window_hash, n_docs) count table lets each
# daily batch detect its duplicated spans against the WHOLE corpus
# while hashing only its own documents. Counts of distinct docs are
# exact and additive across disjoint batches, so
#     incremental(batch | store(corpus)) == full(corpus ∪ batch) ↾ batch
# exactly (pytest-gated). Persist the store through the versioned
# snapshots (replay-idempotent when keyed by batch — see the sketch
# stores in streaming.jobs for the replacement pattern).


def span_store_build(
    docs: DataFrame,
    window: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(h, n_docs) — per-window-hash DISTINCT document counts. The
    store is distinct-window-sized (corpus-sublinear after the
    groupBy) and is the only state the incremental detector needs."""
    from data_warehouse_nhom8_spark.session import repartition_if_split_starved

    wins = repartition_if_split_starved(docs.select(id_col, text_col)).selectExpr(
        f"{id_col} AS __id",
        f"explode(array_distinct("
        f"{_window_hashes_sql(text_col, window, binary=True)})) AS h",
    )
    return wins.groupBy("h").agg(F.count(F.lit(1)).alias("n_docs"))


def span_store_update(store: DataFrame | None, batch_store: DataFrame) -> DataFrame:
    """Merge a batch's counts into the persisted store (counts are
    additive across disjoint document sets)."""
    if store is None:
        return batch_store
    return (
        store.unionByName(batch_store)
        .groupBy("h")
        .agg(F.sum("n_docs").alias("n_docs"))
    )


def duplicated_spans_incremental(
    batch_docs: DataFrame,
    store: DataFrame | None,
    window: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Duplicated spans WITHIN THE BATCH, judged against corpus ∪
    batch: a window is duplicated iff its distinct-doc count across
    the store plus the batch reaches 2. Only the batch is hashed; the
    corpus contributes its count table (broadcast- or hash-joined on
    the window hash). Output schema matches `duplicated_spans`.
    The batch gram build feeds both the count and the join-back;
    recompute beats checkpointing the exploded windows (measured —
    see `duplicated_spans(materialize=)`), so the plan stays lazy."""
    from data_warehouse_nhom8_spark.session import repartition_if_split_starved

    wins = repartition_if_split_starved(
        batch_docs.select(id_col, text_col)
    ).selectExpr(
        f"{id_col} AS __id",
        f"posexplode({_window_hashes_sql(text_col, window, binary=True)})"
        " AS (__pos, __h)",
    )
    batch_counts = wins.select("__id", "__h").distinct().groupBy("__h").agg(
        F.count(F.lit(1)).alias("__bn")
    )
    stored = (
        store.select(F.col("h").alias("__h"), F.col("n_docs").alias("__sn"))
        if store is not None
        else None
    )
    totals = (
        batch_counts.join(stored, "__h", "left") if stored is not None else
        batch_counts.withColumn("__sn", F.lit(0))
    )
    dup = totals.filter(
        F.coalesce(F.col("__sn"), F.lit(0)) + F.col("__bn") >= 2
    ).select("__h")
    hits = wins.join(dup, "__h").select("__id", "__pos")
    return _positions_to_spans(hits, window, id_col)
