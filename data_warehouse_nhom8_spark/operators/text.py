"""Text-analysis operators for LLM training-data pipelines
(SURVEY.md §2k X1/X3; north-star extensions beyond the reference).

All hot-path expressions are native Catalyst (no Python UDFs): at
100 TB these run inside whole-stage codegen over the parquet scan,
pushing only the projected text column.

Operators:
  exact_dedup         — md5-keyed exact duplicate removal (X1)
  token_count_col     — whitespace tokenization count
  bpe_ish_token_count — sub-word-ish token estimate (regex word pieces)
  quality_cols        — length / punctuation / stopword-ratio scores
  lang_id_col         — n-gram/stopword heuristic language ID
  repetition_stats    — Gopher-style repetition signals (dup fraction,
                        top token frequency) per doc
  ngram_repetition_stats — the n-gram tier of the Gopher filter:
                        top-2-gram token fraction + duplicated-5-gram
                        coverage per doc (span-merged, clamped)
  token_topk          — corpus vocabulary head (top-k tokens)
  bigram_topk         — top-k adjacent-token bigrams
  fingerprint_col     — normalized rolling fingerprint (md5 of
                        canonicalized shingle stream)
  tfidf_top_terms     — per-doc idf-weighted keyword heads (log-free)
  unigram_surprisal_scores — CCNet-style mean-token-surprisal quality
                        score under the corpus's own unigram LM
  vocab_counts / merge_vocab_counts / surprisal_against_vocab —
                        the incremental form: persistable additive
                        vocabulary store + batch scoring (OOV → max)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.operators.windows import latest_per_key
from data_warehouse_nhom8_spark.regexes import WS_CHARS, WS_CLASS, WS_SPLIT


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ------------------------------------------------------------- exact dedup

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per exact text (md5 key), lowest id wins —
    deterministic, unlike dropDuplicates. One shuffle on the 128-bit
    key; at 100 TB group on the hash, never the text itself."""
    return latest_per_key(
        df.withColumn("__h", F.md5(_c(text_col))), ["__h"], [F.asc(id_col)]
    ).drop("__h")


# ------------------------------------------------------------ token counts

def token_count_col(text: Column | str = "text") -> Column:
    """Whitespace token count (LongType)."""
    t = F.trim(_c(text))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, WS_SPLIT))).cast("long")


def bpe_ish_token_count(text: Column | str = "text") -> Column:
    """Sub-word-ish token estimate: count of word pieces + digits +
    punctuation runs (a cheap, deterministic BPE proxy — the regex
    splits on letter-runs of <=4 chars)."""
    t = _c(text)
    pieces = F.regexp_extract_all(
        t, F.lit(rf"([A-Za-z]{{1,4}}|\d|[^{WS_CHARS}A-Za-z\d])"), 1
    )
    return F.size(pieces).cast("long")


# ---------------------------------------------------------- quality scores

_PUNCT_RE = r"[^\w\s]"

EN_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")


def quality_cols(text: Column | str = "text") -> dict[str, Column]:
    """Deterministic quality features: n_chars, n_tokens, punct_ratio,
    stopword_ratio, mean_token_len. Ratios are ROUND(x, 4) doubles."""
    t = _c(text)
    n_chars = F.length(t).cast("long")
    n_tokens = token_count_col(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(f"({_PUNCT_RE})"), 1)).cast("long")
    words = F.split(F.lower(F.trim(t)), WS_SPLIT)
    n_stop = F.size(
        F.filter(words, lambda w: w.isin(*EN_STOPWORDS))
    ).cast("long")
    safe_tokens = F.when(n_tokens > 0, n_tokens).otherwise(F.lit(1))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": F.round(n_punct / F.when(n_chars > 0, n_chars).otherwise(1), 4).cast("double"),
        "stopword_ratio": F.round(n_stop / safe_tokens, 4).cast("double"),
        "mean_token_len": F.round(
            (n_chars - (n_tokens - 1)) / safe_tokens, 4
        ).cast("double"),
    }


# ------------------------------------------------------------- language ID

# Minimal deterministic stopword tables for a 6-language heuristic.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "is", "of", "to", "that", "with"),
    "es": ("el", "la", "los", "las", "que", "es", "una", "por"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "vi": ("của", "và", "là", "các", "cho", "trong", "một", "được"),
}


def lang_id_col(text: Column | str = "text", sample_chars: int = 256, sample_tokens: int = 64) -> Column:
    """Heuristic language ID: CJK codepoint share first, then the
    stopword table with the most hits; ties broken by fixed language
    order; no hits → 'und'. Pure expressions — runs at scan speed.

    Classifies from a PREFIX SAMPLE (first `sample_chars` chars /
    `sample_tokens` tokens): language is a document-level property, and
    unicode-class regex over full 100 KB documents costs ~60% of the
    scan (measured) for no accuracy gain."""
    t = F.lower(F.substring(_c(text), 1, sample_chars))
    words = F.slice(F.split(F.trim(t), WS_SPLIT), 1, sample_tokens)
    # CJK share via length-delta (one regexp_replace pass over the
    # sample — a per-char regexp_extract_all array was 3x the cost)
    cjk = F.length(t) - F.length(F.regexp_replace(t, r"[\x{4e00}-\x{9fff}]", ""))

    def marker_hits(markers: tuple[str, ...]):
        return lambda w: w.isin(*markers)

    scores = {
        lang: F.size(F.filter(words, marker_hits(markers)))
        for lang, markers in _LANG_MARKERS.items()
    }
    best = F.lit("und")
    best_score = F.lit(0)
    # fixed order ⇒ deterministic tie-break (earlier language wins ties)
    for lang in ("en", "es", "fr", "de", "vi"):
        s = scores[lang]
        take = s > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, s).otherwise(best_score)
    return F.when(cjk * 5 > F.size(words), F.lit("zh")).otherwise(best)


def add_lang_id(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "lang_pred",
    sample_chars: int = 256,
    sample_tokens: int = 64,
) -> DataFrame:
    """`lang_id_col` staged for speed: identical predictions
    (regression-tested), ~4x faster.

    The Column form folds best/best_score through a when-chain where
    each step embeds the previous chain twice — the score expressions
    (and the tokenize under them) blow up ~2^langs times, and Catalyst
    does not CSE across conditional branches. Here the sample and the
    token array are NAMED columns (computed once per row inside the
    codegen stage), each language score is a named column, and the
    argmax is one `greatest` over (score, -priority, lang) structs —
    every score referenced exactly once; lexicographic struct order
    gives the same earlier-language-wins tie-break."""
    from data_warehouse_nhom8_spark.regexes import WS_SPLIT_SQL
    from data_warehouse_nhom8_spark.session import repartition_for_compute

    df = repartition_for_compute(df)
    internal = ["__lt", "__lw", "__cjk", "__nw"] + [
        f"__s_{lang}" for lang in _LANG_MARKERS
    ]
    langs = ("en", "es", "fr", "de", "vi")

    # Every generated column is ONE parsed SQL string (round-10
    # build-cost rule, extended r15 per the floor profile: the
    # remaining Column chains here — per-column passthrough lists, the
    # struct-greatest argmax, the when-chains — still cost ~0.28 s of
    # py4j plan construction per call). select("*", ...) + drop()
    # replace the passthrough lists; plans are identical
    # (test_lang_id_staged_matches_column_form pins predictions).
    t = f"lower(substring({text_col}, 1, {int(sample_chars)}))"
    staged = df.select(
        "*",
        F.expr(f"{t} AS __lt"),
        F.expr(
            f"slice(split(trim({t}), '{WS_SPLIT_SQL}'), 1, "
            f"{int(sample_tokens)}) AS __lw"
        ),
    )

    def _score(lang: str) -> Column:
        # null tokens excluded by both the isin and array_contains
        # forms — either yields NULL, filter drops non-true
        arr = ", ".join(
            "'" + m.replace("'", "''") + "'" for m in _LANG_MARKERS[lang]
        )
        return F.expr(
            f"size(filter(__lw, w -> array_contains(array({arr}), w)))"
            f" AS __s_{lang}"
        )

    scored = staged.select(
        "*",
        F.expr(
            "length(__lt) - length(regexp_replace(__lt,"
            " '[\\\\x{4e00}-\\\\x{9fff}]', '')) AS __cjk"
        ),
        F.expr("size(__lw) AS __nw"),
        *[_score(lang) for lang in langs],
    )
    best = "greatest(" + ", ".join(
        f"named_struct('s', __s_{lang}, 'p', {-i}, 'l', '{lang}')"
        for i, lang in enumerate(langs)
    ) + ")"
    pred = F.expr(
        f"CASE WHEN __cjk * 5 > __nw THEN 'zh' "
        f"WHEN {best}.s > 0 THEN {best}.l ELSE 'und' END AS {out_col}"
    )
    return scored.select("*", pred).drop(*internal)


# ----------------------------------------------------- repetition quality

def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per doc: token count, distinct
    token count, the most-frequent token's count, and dup_fraction =
    1 − distinct/total (ROUND 4). High dup_fraction / top_freq flags
    boilerplate and degenerate generations — the standard repetition
    gate in LLM corpus filtering.

    Shape: explode → two-level agg — the canonical word-count plan
    with map-side partial aggregation at both levels; shuffle carries
    (id, token) pairs, never documents. Edge note: a doc whose text
    trims to empty yields n_tokens=1 here (split's single empty
    token, and what the DuckDB q65 oracle computes) — this DIFFERS
    from `token_count_col`, which maps empty-trim to 0; don't join
    the two totals without reconciling that edge.
    """
    words = F.explode(F.split(F.lower(F.trim(_c(text_col))), WS_SPLIT)).alias("w")
    per_word = (
        df.select(F.col(id_col).alias("__id"), words)
        .groupBy("__id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_word.groupBy("__id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("c").cast("long").alias("top_freq"),
        F.round(F.lit(1.0) - F.count(F.lit(1)) / F.sum("c").cast("double"), 4)
        .cast("double")
        .alias("dup_fraction"),
    ).withColumnRenamed("__id", id_col)


def ngram_repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_w: int = 2,
    dup_w: int = 5,
) -> DataFrame:
    """The N-GRAM tier of the Gopher repetition filter (Rae et al.
    2021 §A1.1): `repetition_stats` flags token-level degeneration;
    this flags PHRASE-level boilerplate that unique tokens hide.
    Per doc:

      n_tokens            — whitespace-split token count (same split
                            contract as every text operator: the
                            pinned `regexes.WS_SPLIT` class);
      top_ngram_freq      — occurrence count of the doc's most
                            frequent `top_w`-gram (0 when the doc has
                            fewer than top_w tokens — the whole-doc
                            fallback window is not a real gram);
      top_ngram_fraction  — min(1, top_ngram_freq·top_w / n_tokens),
                            ROUND 6: the token fraction the top gram's
                            occurrences would cover ignoring overlap
                            (Gopher's "top n-gram fraction" gate);
      dup_ngram_tokens/_spans/_fraction — tokens covered by the UNION
                            of `dup_w`-token windows whose gram occurs
                            ≥ 2 times IN THE SAME doc, as maximal
                            merged spans (`span_dedup`'s position→span
                            fold, window-granular, clamped at doc
                            end), and that coverage over n_tokens
                            (ROUND 6) — Gopher's "duplicate n-gram
                            character fraction", token-granular.

    Shape (round-15 optimization — MAP-ONLY): every metric here is a
    WITHIN-document statistic, so nothing needs a cross-row shuffle
    at all. The previous form exploded every gram row and ran two
    two-level aggregation cascades plus a left join (6 Exchanges, two
    ObjectHashAggregate collect_list cascades); this form computes
    per document, inside one projection pass over the pruned
    (id, text) scan:
      * top freq   — sort the doc's top_w-gram array, fold the max
        run length of equal adjacent grams (run-length over a sorted
        array == occurrence count of the most frequent gram);
      * dup spans  — sort (gram, pos) structs, keep positions whose
        sorted neighbor carries the same gram (== gram occurs ≥ 2
        times in-doc), re-sort by position, and fold with the same
        `_merge_positions_col` span merge as before.
    Zero Exchange except the caller's final orderBy; document text
    never shuffles ANYWHERE (it never leaves its scan task). Gram
    identity is raw-gram string equality — the md5 class of the old
    shuffled form existed to narrow shuffle keys, and with no
    shuffle the hash is pure cost; raw equality is the same
    equivalence class (and is what the DuckDB twin groups by). All
    gram work is assembled as parsed SQL (the round-10 build-cost
    rule: one JVM round-trip per stage, not ~100 py4j calls).

    Edge notes: a doc whose text trims to empty splits to one empty
    token (n_tokens=1, the q65 `repetition_stats` convention); docs
    shorter than `dup_w` yield a single whole-doc window that can
    never reach count ≥ 2, so their coverage is 0 by construction.
    NULL-text rows drop (explicit filter — the old explode dropped
    them implicitly).

    Memory bound (ADVICE r15): the per-doc gram arrays materialize
    ~n_tokens x (top_w + dup_w) token copies INSIDE ONE ROW — about
    60 bytes/token at the defaults, i.e. ~60 MB of row state per
    million tokens, peaking while the sorted __g2/__gp arrays coexist
    in a projection. That is fine for any plausible document (a
    1M-token doc is ~100x the longest real training doc) but a
    pathological multi-100M-token blob would OOM its task. This
    operator assumes the standard corpus-prep invariant that document
    length is bounded upstream (the pipeline's quality gate drops
    giant docs; ingest caps payloads); for corpora that genuinely
    carry unbounded single documents, use the pre-r15 explode+
    aggregate form (git history) whose state is row-per-gram, and
    accept its 6 exchanges. Switching the sorted arrays to fixed-width
    gram hashes would only halve the constant, not change the
    O(n_tokens)-per-row bound, at the cost of md5-class (rather than
    raw) gram identity — not worth weakening the oracle contract."""
    from data_warehouse_nhom8_spark.operators.span_dedup import (
        _merge_positions_col,
    )
    from data_warehouse_nhom8_spark.regexes import WS_SPLIT_SQL
    from data_warehouse_nhom8_spark.session import repartition_if_split_starved

    base = repartition_if_split_starved(
        df.select(id_col, text_col).filter(_c(text_col).isNotNull())
    )
    tw, dw = int(top_w), int(dup_w)
    # token array staged once (multi-referenced non-cheap alias —
    # survives CollapseProject, so the split runs once per row)
    s1 = base.selectExpr(
        id_col,
        f"split(lower(trim({text_col})), '{WS_SPLIT_SQL}') AS __tk",
    )
    # per-doc gram artifacts, each staged named: the sorted top_w-gram
    # array and the (gram, 0-based pos) structs sorted by (gram, pos)
    s2 = s1.selectExpr(
        id_col,
        "size(__tk) AS __nt",
        f"array_sort(transform(sequence(1, greatest(size(__tk) - {tw - 1}, 1)), "
        f"i -> concat_ws(' ', slice(__tk, i, {tw})))) AS __g2",
        f"array_sort(transform(sequence(1, greatest(size(__tk) - {dw - 1}, 1)), "
        f"i -> named_struct('g', concat_ws(' ', slice(__tk, i, {dw})), "
        "'p', i - 1))) AS __gp",
    )
    # max run length of equal adjacent grams == top gram's occurrence
    # count; null-safe <=> seeds the first element against the NULL
    # accumulator (grams themselves are never NULL: concat_ws)
    s3 = s2.selectExpr(
        id_col,
        "__nt",
        "aggregate(__g2, named_struct('p', CAST(NULL AS STRING), 'r', 0, 'm', 0), "
        "(a, x) -> named_struct('p', x, "
        "'r', CASE WHEN a.p <=> x THEN a.r + 1 ELSE 1 END, "
        "'m', greatest(a.m, CASE WHEN a.p <=> x THEN a.r + 1 ELSE 1 END)), "
        "a -> a.m) AS __mx",
        "__gp",
    )
    # positions of grams occurring >= 2 times in-doc: an element of the
    # (gram, pos)-sorted array is duplicated iff a sorted NEIGHBOR
    # carries the same gram (element_at is 1-based: element_at(__gp, i)
    # is the predecessor of the element at 0-based index i)
    s4 = s3.selectExpr(
        id_col,
        "__nt",
        "__mx",
        "array_sort(transform(filter(__gp, (x, i) -> "
        "(i > 0 AND element_at(__gp, i).g = x.g) OR "
        "(i < size(__gp) - 1 AND element_at(__gp, i + 2).g = x.g)), "
        "x -> x.p)) AS __ps",
    )
    s5 = s4.select(
        F.col(id_col),
        F.col("__nt").alias("n_tokens"),
        F.when(F.col("__nt") >= tw, F.col("__mx"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("top_ngram_freq"),
        _merge_positions_col("__ps", dw).alias("__spans"),
    )
    dup_raw = F.expr(
        "coalesce(aggregate(__spans, 0, (a, x) -> a + (x.e - x.s)), 0)"
    )
    dup_tokens = F.least(dup_raw, F.col("n_tokens"))
    return s5.select(
        F.col(id_col),
        "n_tokens",
        "top_ngram_freq",
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.least(
                    F.lit(1.0),
                    F.col("top_ngram_freq") * top_w / F.col("n_tokens"),
                ),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("top_ngram_fraction"),
        dup_tokens.cast("long").alias("dup_ngram_tokens"),
        F.coalesce(F.size("__spans"), F.lit(0))
        .cast("long")
        .alias("dup_ngram_spans"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(dup_tokens.cast("double") / F.col("n_tokens"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_ngram_fraction"),
    )


def token_topk(df: DataFrame, k: int = 20, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary head: top-k tokens by total frequency, ties
    broken by token — the first step of vocabulary/BPE construction.

    explode → groupBy(token) with map-side combine, then the ordered
    LIMIT compiles to TakeOrderedAndProject: each partition keeps only
    its local top-k and the driver merges k·partitions rows — no
    global sort of the vocabulary ever materializes."""
    w = df.select(
        F.explode(F.split(F.lower(F.trim(_c(text_col))), WS_SPLIT)).alias("token")
    )
    return (
        w.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )


def bigram_topk(df: DataFrame, k: int = 20, text_col: str = "text") -> DataFrame:
    """Top-k adjacent token bigrams, ties broken by bigram — the
    n-gram statistics pass of corpus analysis (collocations, common
    boilerplate phrases). Same TakeOrderedAndProject top-k shape as
    `token_topk`; the bigram build is a per-row zip of the token
    array with its own tail (map-only, no extra shuffle).

    The split MUST be staged behind an alias before the array ops
    reference it: embedding the split expression directly in a
    per-element lambda lets Catalyst inline it per element —
    O(tokens²) re-splitting per doc, measured 10× slower at sf0.1.
    CollapseProject keeps the staged alias because it is a non-cheap
    expression referenced more than once."""
    w = df.select(F.split(F.lower(F.trim(_c(text_col))), WS_SPLIT).alias("__w"))
    n = F.size("__w")
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("__w", 1, n - 1),
            F.slice("__w", 2, n - 1),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
    ).otherwise(F.array().cast("array<string>"))
    b = w.select(F.explode(bigrams).alias("bigram"))
    return (
        b.groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(k)
    )


# ------------------------------------------------------------- fingerprint

def fingerprint_col(text: Column | str = "text", shingle: int = 3) -> Column:
    """Document fingerprint: md5 over the canonicalized (lowercased,
    whitespace-collapsed) token stream re-joined with single spaces —
    robust to case/whitespace-only edits, unlike raw md5(text)."""
    t = _c(text)
    canon = F.concat_ws(" ", F.split(F.lower(F.trim(t)), WS_SPLIT))
    return F.md5(canon)


# --------------------------------------------------------- tf-idf head

def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k characteristic terms by idf-weighted term
    frequency — keyword extraction over the corpus.

    Scoring is the log-free idf variant  score = tf · (N+1)/(df+1):
    monotone in tf and in rarity, and — unlike ln() — composed only of
    exact integer counts and ONE IEEE double multiply+divide, so Spark
    and DuckDB produce bit-identical scores (the cross-engine
    determinism contract; transcendental libm calls are not guaranteed
    to round identically). Ties break by term.

    Scale notes: the token stream is exploded and aggregated ONCE —
    document frequency is a COUNT window partitioned by term over the
    tf output (vocabulary-cardinality rows), not a second aggregate
    whose lineage would re-scan and re-explode the corpus (Catalyst
    recomputes shared subplans; the window formulation keeps df inside
    the single pipeline). N is a broadcast scalar from a count-only
    scan (no token work). The per-doc top-k rank filter pushes a
    map-side WindowGroupLimit: only ~k rows per doc cross the final
    shuffle."""
    from pyspark.sql.window import Window

    tf = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.trim(_c(text_col))), WS_SPLIT)).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    with_df = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term")).cast("long")
    )
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    scored = with_df.join(F.broadcast(n_docs)).withColumn(
        "score",
        F.col("tf").cast("double")
        * (F.col("__n") + 1).cast("double")
        / (F.col("df") + 1).cast("double"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df", "score")
        .orderBy(id_col, "rank")
    )


# ------------------------------------------------- unigram LM surprisal

def _token_stream(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) rows — the shared tokenization of every unigram-LM
    op (must stay identical across them: vocab builds and probe sides
    may only differ in COUNTS, never in what a token is)."""
    return df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(_c(text_col))), WS_SPLIT)).alias("token"),
    ).filter(F.col("token") != "")


def vocab_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(token, n) unigram counts of a document set — the persistable
    vocabulary table (the daily-pipeline store; see
    merge_vocab_counts)."""
    return (
        _token_stream(df, id_col, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def merge_vocab_counts(store: DataFrame, batch: DataFrame) -> DataFrame:
    """Additive merge of two (token, n) vocabulary tables — counts are
    the textbook mergeable statistic, so the daily vocab store updates
    from the BATCH's counts alone: union + re-sum, one shuffle of
    vocabulary-cardinality rows, never a corpus re-tokenization.
    Feeding batches through this in any order/grouping equals the
    whole-corpus vocab_counts exactly (pytest-gated)."""
    return (
        store.unionByName(batch)
        .groupBy("token")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def surprisal_against_vocab(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mbits_scale: int = 1000,
) -> DataFrame:
    """Score documents against a GIVEN (token, n) vocabulary — the
    incremental form of unigram_surprisal_scores: the daily batch is
    tokenized fresh, the corpus contributes only its persisted vocab
    store. Same schema and identical milli-bit math as the full-corpus
    form, so scoring with the final merged store reproduces the
    full run on those docs bit-for-bit (pytest-gated).

    Out-of-vocabulary tokens take n=1 (a fresh token's own count — the
    maximum surprisal the model can assign), so a slightly-stale store
    scores conservatively high rather than failing; re-merge the store
    before scoring when exactness matters.

    Scale: the vocab store broadcasts (token, int rows); the batch's
    token stream probes it map-side and aggregates (id, small-int)
    pairs — nothing the size of the corpus is ever touched."""
    # total as its own 1-row broadcast (NOT a column of the probe
    # join: an OOV token misses the join and would lose the total
    # with it, silently scoring 0 bits instead of the maximum)
    total_df = vocab.agg(F.sum("n").cast("long").alias("__N"))
    tok = _token_stream(df, id_col, text_col)
    probed = (
        tok.join(F.broadcast(vocab), "token", "left")
        .join(F.broadcast(total_df))
        .select(
            id_col,
            F.round(
                F.lit(mbits_scale)
                * F.log2(
                    F.col("__N").cast("double")
                    # OOV: n=1, a fresh token's own count — max surprisal
                    / F.coalesce(F.col("n"), F.lit(1)).cast("double")
                )
            )
            .cast("long")
            .alias("__mbits"),
        )
    )
    return (
        probed.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("__mbits").cast("long").alias("sum_mbits"),
        )
        .select(
            id_col,
            "n_tokens",
            "sum_mbits",
            (
                F.col("sum_mbits") / F.col("n_tokens") / F.lit(float(mbits_scale))
            ).alias("avg_bits"),
        )
        .orderBy(id_col)
    )


def unigram_surprisal_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mbits_scale: int = 1000,
) -> DataFrame:
    """CCNet-style statistical quality score: per-document mean token
    surprisal -log2 p(token) under the corpus's own unigram model —
    gibberish and keyboard-mash score high (rare tokens), boilerplate
    scores low; the standard cheap LM-quality filter of web-corpus
    pipelines (CCNet filters on wiki-LM perplexity; the self-corpus
    unigram model is the dependency-free analogue).

    Cross-engine determinism (the tfidf_top_terms contract —
    transcendental libm calls are NOT guaranteed to round identically
    across engines): each vocabulary entry's surprisal is quantized
    ONCE to integer milli-bits, round(scale·log2(N/n)) — a 1–2 ulp
    libm divergence (~1e-13 absolute at these magnitudes) only changes
    the rounded integer if scale·log2(N/n) lands within ~1e-10 of a
    half-integer, ~1e-10 probability per distinct count value, and
    everything downstream of the quantization is exact: integer sums,
    then ONE left-associated IEEE division chain sum/n/scale for the
    per-doc mean (exact bigints in, bit-identical double out on any
    IEEE engine — no further rounding anywhere).

    Scale: two passes over the token stream, neither shuffling raw
    text. Pass 1 builds the vocabulary — explode → groupBy(token)
    with map-side partial counts (vocabulary cardinality ≪ token
    count). Pass 2 re-derives tokens and probes the vocabulary as a
    BROADCAST hash join (the vocab table is (token, int) rows), then
    aggregates (id, small-int) pairs per doc. At 100 TB, persist the
    pass-1 vocabulary as a table (the benchmark_gram_store pattern)
    and truncate the tail to a min count with one OOV bucket — the
    probe side and the math are unchanged."""
    from pyspark.sql.window import Window

    tok = _token_stream(df, id_col, text_col)
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("n"))
    # total token count as an unpartitioned window over the VOCAB
    # AGGREGATE (vocabulary-cardinality rows — the same ≪-corpus size
    # assumption the broadcast below already makes), not a scalar
    # cross join: the separate agg branch would re-run vocab's whole
    # lineage, a third scan+explode of the corpus in the plan.
    total = F.sum("n").over(Window.partitionBy()).cast("long")
    vocab_mbits = vocab.select(
        "token",
        F.round(
            F.lit(mbits_scale)
            * F.log2(total.cast("double") / F.col("n").cast("double"))
        )
        .cast("long")
        .alias("__mbits"),
    )
    return (
        tok.join(F.broadcast(vocab_mbits), "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("__mbits").cast("long").alias("sum_mbits"),
        )
        .select(
            id_col,
            "n_tokens",
            "sum_mbits",
            (
                F.col("sum_mbits") / F.col("n_tokens") / F.lit(float(mbits_scale))
            ).alias("avg_bits"),
        )
        .orderBy(id_col)
    )


# ------------------------------------------------------ HTML extraction

def html_text_cols(html: Column | str = "html") -> dict[str, Column]:
    """Crawl-tier HTML → text extraction as pure native regex
    projections — the step every crawl pipeline runs before any of
    this module's text operators see a token. No parser library, no
    UDF: a regex pipeline in the Java-regex ∩ RE2 common subset
    (same portability contract as `corpus.pii_redact_cols`), so
    DuckDB computes the identical extraction — equality is pinned by
    a per-suite DuckDB twin pytest on synthesized HTML (the q111
    messy-URL certification pattern). `[\\s\\S]*?` stands in for
    dotall-`.` (no inline flags needed in either engine); `(?i)`
    covers tag-case variance.

    Pipeline order matters and is part of the spec:
      1. <script>/<style> blocks drop WITH their content (code and
         CSS are not text), non-greedy per block;
      2. HTML comments drop with content;
      3. every remaining tag becomes ONE space (so '</p><p>' splits
         words instead of gluing them);
      4. the five XML entities + &nbsp; decode (&amp; LAST — the
         double-escape '&amp;lt;' correctly yields literal '&lt;');
      5. whitespace collapses to single spaces, trimmed.

    Returns projections over the SAME html column (each independent,
    codegen-resident, zero shuffle at any scale):
      text     — the extracted text
      title    — first <title> content ('' when absent)
      n_links  — count of <a ... href=...> anchors (link density is
                 a quality-gate feature: boilerplate/nav pages are
                 link-dense and text-poor). Anchored to the <a tag so
                 a document QUOTING 'href="x"' in body text doesn't
                 count as a link.

    Scope of title/n_links — RAW html, by spec: both read the input
    BEFORE the script/style/comment strip, so a <title> or <a href>
    inside a comment or script block IS captured/counted even though
    the same content is excluded from `text`. Deliberate for the
    quality-gate use (a link is markup weight whether or not it's
    commented out; JS-built anchors in script bodies are exactly the
    link-density signal); the DuckDB twin and the Python hypothesis
    reference encode the same raw-html scope, and q117's oracle
    certifies it.
    """
    h = _c(html)
    no_script = F.regexp_replace(h, r"(?i)<script[^>]*>[\s\S]*?</script>", " ")
    no_style = F.regexp_replace(no_script, r"(?i)<style[^>]*>[\s\S]*?</style>", " ")
    no_comment = F.regexp_replace(no_style, r"<!--[\s\S]*?-->", " ")
    no_tags = F.regexp_replace(no_comment, r"<[^>]*>", " ")
    decoded = no_tags
    for ent, ch in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
        ("&amp;", "&"),  # last: '&amp;lt;' must yield literal '&lt;'
    ):
        decoded = F.replace(decoded, F.lit(ent), F.lit(ch))
    text = F.trim(F.regexp_replace(decoded, WS_SPLIT, " "))
    title = F.regexp_extract(h, r"(?i)<title[^>]*>([\s\S]*?)</title>", 1)
    n_links = F.size(
        F.regexp_extract_all(
            h,
            F.lit(
                rf"(?i)<a\b[^>]*\bhref{WS_CLASS}*={WS_CLASS}*(\"[^\"]*\"|'[^']*')"
            ),
            1,
        )
    ).cast("long")
    return {"text": text, "title": F.trim(title), "n_links": n_links}
