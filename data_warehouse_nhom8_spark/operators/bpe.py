"""Distributed byte-pair-encoding vocabulary training (SURVEY §2k —
the tokenizer-training step of an LLM data pipeline; the reference
stack has no analogue, this is a scale extension like MinHash/IVF).

Shape, and why it scales to 100 TB:

- ONE corpus scan builds the (word, count) vocabulary — the classic
  BPE trick: merge statistics depend only on distinct words and their
  frequencies, so the iterative phase never touches the corpus again.
  The word table is dim-sized (vocabulary grows ~sublinearly with
  corpus size) and is cached/persisted across iterations.
- Merge learning runs LOCALLY over the collected histogram when the
  distinct-word count fits `local_vocab_threshold` (the default path:
  one corpus-scan job total, exact incremental pair updates — a
  32k-merge production vocab is 1 Spark job, not 32k). The fallback
  for larger-than-driver vocabularies is the fully distributed loop:
  each merge iteration is a small distributed job over the word table
  (explode adjacent pairs weighted by count, aggregate, one-row
  collect of the winner, native `aggregate`-fold rewrite — no Python
  in the loop). Same tie-break in both paths ⇒ identical merge list.
- Tie-breaking is total (count desc, then pair lexicographic), so
  the learned merge list is deterministic at any parallelism — the
  exact-twin contract vs a single-node reference implementation is
  pytest-gated.

Encoding applies the learned merges per word. Two paths: a pure
plan-expression fold chain (zero Python — but Spark evaluates
higher-order `aggregate` lambdas INTERPRETED, never codegen, so k
chained folds cost k interpreted passes per word: measured 20.5 s vs
0.5 s at k=12 over 5k docs), and the production path — an
Arrow-batched mapInPandas with the merge list broadcast (the same
sanctioned vectorized-Python lane as the multimodal codec).
`native_max_merges` picks the crossover; the default keeps only
trivial merge lists on the expression path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from data_warehouse_nhom8_spark.regexes import WS_SPLIT

# End-of-word sentinel. '▁' (U+2581) is printable and CAN occur in
# real text, so every path NORMALIZES it away from the input before
# tokenizing (stripping at text level == stripping per word, since the
# sentinel is not whitespace); after that it marks word ends
# unambiguously. Train, native encode and pandas encode all apply the
# same normalization, so the exact-twin contract holds on any input.
EOW = "▁"

# Java regex \s is ASCII-only ([ \t\n\x0B\f\r]); Python's str.split()
# and \s additionally split on Unicode whitespace (\xa0,  , ...).
# The Python encode path must match the Spark/Java splitter EXACTLY or
# documents containing non-ASCII whitespace would tokenize differently
# depending on native_max_merges — so both Python paths use this class.
_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def _py_words(text: object) -> list[str]:
    """Python twin of the Spark-side lower → strip-EOW → \\s+ split."""
    return [w for w in _WS_RE.split(str(text).lower().replace(EOW, "")) if w]


def _norm_text(text_col: str) -> Column:
    """lower + EOW-strip, the shared Spark-side normalization."""
    return F.translate(F.lower(F.col(text_col)), EOW, "")


def _words_with_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, n) over the whitespace-split corpus — the one corpus
    scan; everything iterative happens on this dim-sized table."""
    return (
        docs.select(
            F.explode(F.split(_norm_text(text_col), WS_SPLIT)).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(word: Column) -> Column:
    """word -> array of single-character symbols + end-of-word mark."""
    return F.concat(F.split(word, ""), F.array(F.lit(EOW)))


def _merge_fold(symbols: Column, left: Column, right: Column) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) symbol
    pairs, as a native `aggregate` fold: standard BPE application
    semantics ('aaa' under (a,a) -> ['aa','a'])."""
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left)
            & (x == right),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(left, right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _apply_merge_greedy(syms: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right merge application — the Python twin of
    `_merge_fold` (identical semantics: 'aaa' under (a,a) → ['aa','a'])."""
    out = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def _train_local(
    hist: list[tuple[str, int]], num_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """Exact greedy BPE over a collected (word, count) histogram, with
    incremental pair-count maintenance — identical tie-break to the
    distributed loop (count desc, then (left, right) lexicographic
    ascending; Python str comparison == Spark UTF8 binary order since
    UTF-8 preserves code-point order). One distributed job replaced
    num_merges jobs; per merge only the words containing the chosen
    pair are re-tokenized and their pair deltas applied."""
    from collections import Counter, defaultdict

    words: list[list[str]] = [list(w) + [EOW] for w, _n in hist]
    counts = [n for _w, n in hist]
    pair_counts: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = defaultdict(set)

    def word_pairs(syms: list[str]) -> Counter:
        c: Counter = Counter()
        for a, b in zip(syms, syms[1:]):
            c[(a, b)] += 1
        return c

    for i, syms in enumerate(words):
        for p, k in word_pairs(syms).items():
            pair_counts[p] += k * counts[i]
            where[p].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < min_pair_count:
            break
        merges.append(best)
        for i in sorted(where[best]):
            old = word_pairs(words[i])
            words[i] = _apply_merge_greedy(words[i], *best)
            new = word_pairs(words[i])
            for p in old.keys() | new.keys():
                d = new.get(p, 0) - old.get(p, 0)
                if d:
                    pair_counts[p] += d * counts[i]
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
                if new.get(p, 0) > 0:
                    where[p].add(i)
        where.pop(best, None)
    return merges


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 50,
    min_pair_count: int = 2,
    local_vocab_threshold: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merges from the corpus; returns the
    ordered merge list [(left, right), ...].

    Stops early when no remaining pair reaches `min_pair_count`.

    Job shape (round 8 — the fix for one-Spark-job-per-merge): merge
    statistics depend only on the (word, count) histogram, which is
    corpus-SUBLINEAR (dim-sized — ~50M distinct words at 100 TB ≈ low
    GB). When the histogram has at most `local_vocab_threshold`
    distinct words, the trainer runs ONE distributed corpus-scan job
    and learns all merges in an exact local loop with incremental
    pair-count updates — the architecture every production tokenizer
    trainer uses (distributed count, single-node merge learning). A
    32k-merge vocabulary is 1 Spark job instead of 32k. Above the
    threshold it falls back to the fully-distributed per-merge loop
    (unbounded vocab, one small job per merge). Both paths use the
    same tie-break (count desc, pair lexicographic asc), so the merge
    list is IDENTICAL — pytest-gated against each other and against
    the single-node reference."""
    spark = docs.sparkSession
    base = _words_with_counts(docs, text_col)
    if local_vocab_threshold > 0:
        hist = base.limit(local_vocab_threshold + 1).collect()
        if len(hist) <= local_vocab_threshold:
            return _train_local(
                sorted((r["word"], r["n"]) for r in hist),
                num_merges,
                min_pair_count,
            )
    words = base.select(_initial_symbols(F.col("word")).alias("syms"), "n")
    words.persist()
    words.count()  # materialize the single corpus scan
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(num_merges):
            pairs = (
                words.select(
                    F.explode(
                        F.zip_with(
                            F.slice(F.col("syms"), 1, F.size("syms") - 1),
                            F.slice(F.col("syms"), 2, F.size("syms") - 1),
                            lambda a, b: F.struct(
                                a.alias("left"), b.alias("right")
                            ),
                        )
                    ).alias("pair"),
                    "n",
                )
                .groupBy("pair.left", "pair.right")
                .agg(F.sum("n").alias("cnt"))
                # deterministic winner at any parallelism
                .orderBy(F.desc("cnt"), "left", "right")
                .limit(1)
            )
            top = pairs.collect()
            if not top or top[0]["cnt"] < min_pair_count:
                break
            left, right = top[0]["left"], top[0]["right"]
            merges.append((left, right))
            rewritten = words.select(
                _merge_fold(F.col("syms"), F.lit(left), F.lit(right)).alias("syms"),
                "n",
            )
            rewritten.persist()
            rewritten.count()
            words.unpersist()
            words = rewritten
    finally:
        words.unpersist()
    return merges


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """The token vocabulary implied by a merge list (merged symbols in
    learned order; base characters come from the data at encode time)."""
    return [left + right for left, right in merges]


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    native_max_merges: int = 4,
) -> DataFrame:
    """Tokenize `text_col` with a learned merge list: whitespace split,
    per-word symbol init, merges applied in rank order, tokens
    flattened per document.

    For k <= `native_max_merges` the k folds are chained plan
    expressions (zero Python — but interpreted: higher-order
    `aggregate` lambdas never enter whole-stage codegen, so each
    merge is a per-word interpreted pass). Above that the same greedy
    fold runs in an Arrow-batched mapInPandas with the merge list
    broadcast — measured 40x faster at k=12 (0.5 s vs 20.5 s over the
    sf0.1 batch), the same sanctioned vectorized lane as the
    multimodal codec. Both paths are exact twins (pytest-gated)."""
    if len(merges) <= native_max_merges:
        words = F.filter(
            F.split(_norm_text(text_col), WS_SPLIT), lambda w: w != ""
        )
        tok = lambda w: _encode_word_native(w, merges)  # noqa: E731
        return docs.withColumn(
            out_col, F.flatten(F.transform(words, tok))
        )

    from data_warehouse_nhom8_spark.session import repartition_for_compute

    docs = repartition_for_compute(docs)
    merges_b = docs.sparkSession.sparkContext.broadcast(list(merges))

    def run(batches):
        ms = merges_b.value

        def enc_word(w):
            syms = list(w) + [EOW]
            for left, right in ms:
                syms = _apply_merge_greedy(syms, left, right)
            return syms

        for pdf in batches:
            pdf = pdf.copy()
            pdf["__tokens"] = [
                [t for w in _py_words(x) for t in enc_word(w)]
                for x in pdf["__text"]
            ]
            yield pdf

    staged = docs.withColumn("__text", F.col(text_col))
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in staged.schema.fields
    ) + ", __tokens array<string>"
    res = staged.mapInPandas(run, schema=out_schema)
    return res.withColumn(out_col, F.col("__tokens")).drop("__text", "__tokens")


def _encode_word_native(word: Column, merges: list[tuple[str, str]]) -> Column:
    syms = _initial_symbols(word)
    for left, right in merges:
        syms = _merge_fold(syms, F.lit(left), F.lit(right))
    return syms
