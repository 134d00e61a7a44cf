"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard
(SURVEY.md §2k X2 — LLM-data extension; no reference twin).

All pure DataFrame ops — no Python in the per-row path:

MinHash+LSH pipeline (the 100 TB design):
  1. shingle: w-token shingles from the canonical token stream
  2. minhash: k permutations via (a_i * h(shingle) + b_i) mod p over
     md5-derived 64-bit shingle hashes (`md5_token_hash64` — r15:
     switched from xxhash64 so the whole tier is reproducible in
     DuckDB and q38 carries a bitwise oracle, the q39 construction);
     each signature element = MIN over shingles (array expressions)
  3. band: split the k-signature into b bands of r; md5-hash each band
  4. bucket join: explode bands → groupBy(band_idx, band_hash) —
     candidate pairs only ever meet inside a bucket (no all-pairs!)
  5. verify: exact token-set Jaccard on candidates (array_intersect /
     array_union on the deduped md5-hashed shingle sets)

Shuffle analysis: step 4 shuffles |docs|·b rows of (int, long, id) —
independent of document length; step 5 joins only candidates. This is
the standard scale-out shape (vs. the O(n²) brute-force twin used to
test recall on small data).

SimHash: 64-bit signature from per-token md5-derived bit votes;
near-dups = signatures within a Hamming radius, found by exact-match
on rotated chunks (Charikar-style). Implemented with explode +
bitwise aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from data_warehouse_nhom8_spark.regexes import WS_SPLIT

# Mersenne prime (2^31 - 1) for the universal-hash family: keeps
# a*h+b < 2^62, inside LongType under ANSI overflow checking.
_P = (1 << 31) - 1
# Deterministic coefficients: derived from a fixed seed via md5 of the
# index — stable across runs/sessions without RNG state.


def _coeff(i: int, salt: str) -> int:
    import hashlib

    h = hashlib.md5(f"{salt}:{i}".encode()).hexdigest()
    return (int(h[:15], 16) % (_P - 1)) + 1


def shingles_col(text: Column | str = "text", w: int = 3) -> Column:
    """w-token shingles (array<string>) from the canonicalized token
    stream; documents shorter than w tokens get their whole text as
    the single shingle.

    The token array is bound as a lambda VARIABLE (via a one-element
    transform) before the per-shingle slice loop references it:
    higher-order functions are interpreted (CodegenFallback), so an
    inline split expression in the lambda body would re-tokenize the
    whole document once per shingle — O(tokens²), measured 6× slower
    at sf0.1. A lambda-variable reference is an O(1) lookup, and the
    wrapper keeps this a pure Column usable in any projection."""
    t = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(F.trim(t)), WS_SPLIT)

    def build(tk: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.size(tk) - (w - 1), F.lit(1)))
        return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tk, i, w)))

    return F.transform(F.array(toks), build)[0]


def _perm(a: int, b: int):
    # closure (not default-arg lambda): higher-order functions dispatch
    # on lambda arity, so the lambda must take exactly 1 arg
    return lambda h: (h * a + b) % _P


def _signature_parts_sql(shingle_hashes: str, k: int) -> str:
    """SQL text of the k permutation-min signature elements over a
    named shingle-hash array column — shared by the str-form
    `minhash_signature_col` and the parsed-SQL builders."""
    return ",".join(
        f"array_min(transform({shingle_hashes}, "
        f"h -> (h * {_coeff(i, 'a')}L + {_coeff(i, 'b')}L) % {_P}L))"
        for i in range(k)
    )


def minhash_signature_col(shingle_hashes: Column | str, k: int = 64) -> Column:
    """k-element MinHash signature (array<long>) over a PRE-HASHED
    shingle array (array<long>).

    The input must be a *named column* of shingle hashes, not an
    inline expression: the k array_min branches each reference the
    input, and Catalyst does not common-subexpression-eliminate across
    them — an inline shingle+hash expression gets recomputed k times
    (measured 37x slower at sf0.1). Use `minhash_signatures` for the
    correctly-staged DataFrame form.

    Pass the column NAME (str) on latency-sensitive paths: the k
    permutation branches then assemble as ONE SQL string parsed in a
    single JVM round-trip, instead of ~5k py4j calls building the
    same tree Column-by-Column — the Column form spent more driver
    time CONSTRUCTING the expression than executing it (round 10:
    1.2 s build vs 0.3 s exec per q53 probe at sf0.1; the str form
    builds in ~0.05 s and plans/executes bit-identically — same
    operators, same coefficients, same arithmetic)."""
    if isinstance(shingle_hashes, str):
        from data_warehouse_nhom8_spark.session import memo_expr

        return memo_expr(f"array({_signature_parts_sql(shingle_hashes, k)})")
    sig = []
    for i in range(k):
        a, b = _coeff(i, "a"), _coeff(i, "b")
        sig.append(F.array_min(F.transform(shingle_hashes, _perm(a, b))))
    return F.array(*sig)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    shingle_w: int = 3,
) -> DataFrame:
    """(id, sig) MinHash signatures, staged so the shingle hashing runs
    once per row: project the hash array as a named column, then fan
    out the k permutations over it."""
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            shingles_col(text_col, shingle_w),
            lambda s: F.abs(md5_token_hash64(s)) % _P,
        ).alias("__hs"),
    )
    return hashed.select("id", minhash_signature_col("__hs", k).alias("sig"))


def _h64_sql(x: str) -> str:
    """SQL-text twin of `md5_token_hash64` (hi/lo 32-bit halves of the
    first 16 md5 hex chars recombined) — for parsed-SQL builders."""
    return (
        f"(shiftleft(CAST(conv(substring(md5({x}), 1, 8), 16, 10) AS BIGINT), 32)"
        f" | CAST(conv(substring(md5({x}), 9, 8), 16, 10) AS BIGINT))"
    )


def _shingles_sql(text: str, w: int) -> str:
    """SQL-text twin of `shingles_col` (same lambda-variable token
    binding — the token array binds once, each shingle slices it)."""
    from data_warehouse_nhom8_spark.regexes import WS_SPLIT_SQL

    return (
        f"transform(array(split(lower(trim({text})), '{WS_SPLIT_SQL}')), "
        f"tk -> transform(sequence(1, greatest(size(tk) - {w - 1}, 1)), "
        f"i -> concat_ws(' ', slice(tk, i, {w}))))[0]"
    )


def minhash_signature_sets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    shingle_w: int = 3,
) -> DataFrame:
    """(id, sig, __h64): signatures PLUS the deduped 64-bit
    shingle-hash sets — the full persisted tier of an incremental
    near-dup store (signatures band candidates; the hash sets serve
    the exact-Jaccard verify without ever rescanning corpus text).
    One shingling pass feeds both (staging rule from
    minhash_signature_col); identical hash family to
    minhash_signatures, so banding results are byte-equal.

    Assembled as THREE parsed selectExpr round trips (r16, the
    round-10 build-cost rule): the Column form issued ~200 py4j calls
    per construction — this builder sits on q53's per-probe path,
    where plan construction was half the probe wall. Same operators,
    same token binding, same hash family; the Column twin below is
    pinned value-identical by test_properties."""
    sh = _shingles_sql(text_col, shingle_w)
    return (
        df.selectExpr(
            f"{id_col} AS id",
            f"transform(array_distinct({sh}), s -> {_h64_sql('s')}) AS __h64",
        )
        .selectExpr("id", "__h64", f"transform(__h64, h -> abs(h) % {_P}L) AS __hs")
        .selectExpr(
            "id",
            "__h64",
            f"array({_signature_parts_sql('__hs', k)}) AS sig",
        )
    )


def minhash_signature_sets_column_form(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    shingle_w: int = 3,
) -> DataFrame:
    """Column-API twin of `minhash_signature_sets` — kept as the
    readable specification and for the form-equivalence pytest."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.transform(
                F.array_distinct(shingles_col(text_col, shingle_w)),
                md5_token_hash64,
            ).alias("__h64"),
        )
        .select(
            "id", "__h64", F.transform("__h64", lambda h: F.abs(h) % _P).alias("__hs")
        )
        .select("id", "__h64", minhash_signature_col("__hs", k).alias("sig"))
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    bands: int = 16,
    shingle_w: int = 3,
    max_bucket_size: int = 200,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) via banded MinHash-LSH.
    rows ∝ pairs that collide in ≥1 band — the threshold curve is
    t ≈ (1/bands)^(bands/k).

    `max_bucket_size` is the degenerate-bucket guard: a band bucket of
    size g produces g² candidate pairs, and corpora with boilerplate
    (shared headers, templated text, single-vocabulary synthetic data)
    grow a few enormous buckets that would turn the bucket join into
    an accidental cross join. Skipping them is standard LSH-dedup
    practice — a genuinely near-duplicate pair collides in *several*
    independent bands, so it still surfaces via a non-degenerate one;
    what the cap drops is exactly the boilerplate-only collisions.
    This is the skew guard that keeps the shuffle bounded at 100 TB.
    """
    with_sig = minhash_signatures(df, id_col, text_col, k, shingle_w)
    banded = _band_table(with_sig, k, bands)
    bucket_sizes = banded.groupBy("band", "bhash").agg(F.count(F.lit(1)).alias("__bn"))
    bounded = banded.join(
        bucket_sizes.filter(F.col("__bn") <= max_bucket_size), on=["band", "bhash"]
    ).drop("__bn")
    a = bounded.alias("a")
    b = bounded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bhash") == F.col("b.bhash")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def _band_table(with_sig: DataFrame, k: int, bands: int) -> DataFrame:
    """(id, band, bhash) from an (id, sig) signature table — each
    band's r-element slice hashed to one 64-bit bucket key. Derivable
    from stored signatures alone (no text), which is what makes the
    incremental path cheap.

    Assembled as ONE parsed SQL string (round-10 build-cost rule,
    applied r15: the Column form issued ~300 py4j calls — 64
    element_at + casts + per-band md5 trees — on every q53 probe
    build; the parsed form is a single JVM round-trip and analyzes to
    the identical operators — `_band_table_column_form` below is the
    readable twin, pinned equal by tests/test_properties.py)."""
    r = k // bands

    structs = ", ".join(
        "named_struct('band', {b}, 'bhash', {h})".format(
            b=b,
            h=_h64_sql(
                "concat_ws(',', "
                + ", ".join(
                    f"CAST(element_at(sig, {b * r + j + 1}) AS STRING)"
                    for j in range(r)
                )
                + ")"
            ),
        )
        for b in range(bands)
    )
    from data_warehouse_nhom8_spark.session import memo_expr

    return with_sig.select(
        "id", memo_expr(f"explode(array({structs})) AS bb")
    ).select("id", "bb.band", "bb.bhash")


def _band_table_column_form(with_sig: DataFrame, k: int, bands: int) -> DataFrame:
    """Column-API twin of `_band_table` — kept as the readable
    specification and for the form-equivalence regression test."""
    r = k // bands
    return with_sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        md5_token_hash64(
                            F.concat_ws(",", *[F.element_at("sig", b * r + j + 1).cast("string") for j in range(r)])
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bhash")


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_w: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs → (id_a, id_b,
    jaccard double). The verify step after LSH."""
    sets_df = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles_col(text_col, shingle_w)).alias("sh"),
    )
    out = (
        pairs.join(sets_df.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sets_df.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return out.select(
        "id_a",
        "id_b",
        F.round(inter / F.when(union > 0, union).otherwise(1), 6).cast("double").alias("jaccard"),
    )


def minhash_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    bands: int = 16,
    shingle_w: int = 3,
    max_bucket_size: int = 200,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact-Jaccard verify →
    pairs above threshold.

    Staging (measured at sf0.1): shingle construction is the dominant
    cost (~3 s of string slicing/concat per pass) and the naive
    compose runs it ~3× (signature build + both verify join sides).
    Here the 64-bit hashed shingle sets are materialized ONCE
    (`localCheckpoint` — distributed, lineage-truncating) and every
    downstream stage — signatures, banding, verify — reads them.
    Verify intersects the 64-bit hashes, not the shingle strings:
    identical Jaccard absent md5₆₄ collisions (~|set|²/2⁶⁴ per
    pair, negligible; same contract as ngram_jaccard_pairs_exact).
    The signature path additionally folds hashes into [0, 2³¹−1) for
    the permutation family exactly as before, so signatures — and
    therefore candidates — are unchanged."""
    from data_warehouse_nhom8_spark.session import repartition_for_compute

    df = repartition_for_compute(df)
    sets = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.array_distinct(shingles_col(text_col, shingle_w)), md5_token_hash64
        ).alias("__h64"),
    ).localCheckpoint(eager=True)

    # signature path: same hash family as minhash_signatures
    # (abs(md5_token_hash64) % P), over the deduped set — array_min is
    # duplicate-insensitive, so signatures equal the multiset form
    hashed = sets.select(
        "id", F.transform("__h64", lambda h: F.abs(h) % _P).alias("__hs")
    )
    # checkpoint the signature table too (|docs| × k longs — tiny):
    # it feeds THREE consumers (bucket-size histogram + both sides of
    # the bucket self-join) and each would otherwise re-run the k
    # permutation folds over the shingle arrays
    with_sig = hashed.select(
        "id", minhash_signature_col("__hs", k).alias("sig")
    ).localCheckpoint(eager=True)
    banded = _band_table(with_sig, k, bands)
    bucket_sizes = banded.groupBy("band", "bhash").agg(F.count(F.lit(1)).alias("__bn"))
    bounded = banded.join(
        bucket_sizes.filter(F.col("__bn") <= max_bucket_size), on=["band", "bhash"]
    ).drop("__bn")
    a, b = bounded.alias("a"), bounded.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bhash") == F.col("b.bhash")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    # verify on the checkpointed hash sets
    out = (
        cands.join(sets.select(F.col("id").alias("id_a"), F.col("__h64").alias("__ha")), "id_a")
        .join(sets.select(F.col("id").alias("id_b"), F.col("__h64").alias("__hb")), "id_b")
    )
    inter = F.size(F.array_intersect("__ha", "__hb"))
    union = F.size(F.array_union("__ha", "__hb"))
    return out.select(
        "id_a",
        "id_b",
        F.round(inter / F.when(union > 0, union).otherwise(1), 6).cast("double").alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def minhash_incremental_pairs(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    corpus_sigs: DataFrame | None = None,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    bands: int = 16,
    shingle_w: int = 3,
    max_bucket_size: int = 200,
    corpus_bands: DataFrame | None = None,
    corpus_band_sizes: DataFrame | None = None,
    corpus_sets: DataFrame | None = None,
    corpus_sets_loader=None,
    band_sizes_hot: bool = False,
) -> DataFrame:
    """Daily-increment near-dup: pairs INVOLVING the new batch,
    without re-signaturing the corpus.

    The 100 TB motivation: re-running `minhash_neardup_pairs` on
    corpus ∪ batch every day re-shingles and re-signatures the whole
    corpus for a batch that is ~0.1% of it. Here only the batch is
    shingled/signatured; the corpus contributes its PERSISTED
    signature table (`corpus_sigs` — in production a parquet table
    keyed by id; computed here once when not supplied), from which
    band buckets are derived without touching text.

    Result contract (pytest-gated, exact equality): identical to the
    full detector on corpus ∪ batch restricted to pairs touching a
    batch id — same hash family, same banding, bucket-size caps
    computed over the UNION band histogram (so the skew guard sees
    the same bucket sizes as a full run), and the same exact hash-set
    Jaccard verify. Old docs' shingle sets are rebuilt only for
    candidate ids (one corpus scan filtered by a semi-joinable
    candidate list — sparse, shuffles only matched texts). To avoid
    even that scan, a production store can persist the hash sets
    beside the signatures and estimate Jaccard from signature
    agreement instead; the exact-verify form is the default because
    it keeps the driver-testable equality contract.

    `corpus_bands` / `corpus_band_sizes` are the second tier of the
    persisted store: the corpus band table and its per-bucket count
    histogram are STATIC between corpus compactions, so a daily run
    should pass the persisted tables instead of re-deriving them from
    `corpus_sigs` every batch (band explode + histogram over the full
    corpus is the dominant steady-state cost otherwise). The union
    histogram the skew guard needs is then corpus counts + batch
    counts — identical numbers to a from-scratch run (pytest-gated)."""
    from data_warehouse_nhom8_spark.session import repartition_for_compute

    new_docs = repartition_for_compute(new_docs)
    # ONE job materializes both batch artifacts (hash sets for the
    # verify step, signatures for banding): shingling runs once and
    # the per-call barrier count stays low — each localCheckpoint is a
    # full job round-trip, and on a ~1k-doc daily batch the barriers
    # cost as much as the compute. Always EAGER since r16: this is the
    # FIRST driver barrier of the probe, and with the mx histogram
    # folded into the plan (below) its job carries only the batch
    # shingle+signature pass — every downstream consumer (band
    # histogram, banding, verify sets) reads the checkpointed rows.
    # The folded hash array is staged as a NAMED column before the k
    # permutation mins fan out (staging rule from
    # minhash_signature_col's docstring); the builder is the parsed-SQL
    # `minhash_signature_sets` (r16 — this is the per-probe path).
    staged = minhash_signature_sets(
        new_docs, id_col, text_col, k, shingle_w
    ).localCheckpoint(eager=True)
    new_sets = staged.select("id", "__h64")
    new_sigs = staged.select("id", "sig")
    if corpus_sigs is None:
        corpus_sigs = minhash_signatures(
            repartition_for_compute(corpus_docs), id_col, text_col, k, shingle_w
        )

    new_bands = _band_table(new_sigs, k, bands)
    old_bands = (
        corpus_bands if corpus_bands is not None else _band_table(corpus_sigs, k, bands)
    )
    all_bands = new_bands.unionByName(old_bands)
    if corpus_band_sizes is not None:
        # NEAR-HOT bound (round 11 — the probe's steady-state cost was
        # this histogram reconciliation): a bucket's union count is
        # old + new, and the batch histogram's LARGEST per-bucket
        # count `mx` bounds every `new`, so a bucket can only exceed
        # the cap when its CORPUS count alone exceeds cap - mx.
        # Buckets below that line are provably safe with no join at
        # all, and the near-hot set above it is the skew tail — tiny
        # at ANY corpus scale by the same argument that makes the cap
        # a skew guard — so it broadcasts into the batch histogram
        # instead of full-outer-shuffling the corpus-bucket-count
        # histogram every probe. `mx` is one driver scalar off the
        # batch-sized histogram (bounded collect: 1 row). Only
        # batch-touched buckets need a verdict at all (a candidate
        # pair requires a batch-side row in the bucket), which keeps
        # every subsequent join build batch-sized. Identical pair
        # output (equality pytest + union-histogram numbers both
        # gate it).
        batch_hist = new_bands.groupBy("band", "bhash").agg(
            F.count(F.lit(1)).alias("__bn_new")
        )
        # r16 (VERDICT r15 task 1): `mx` — the batch histogram's max
        # bucket count — is folded INTO the plan as a broadcast
        # 1-row scalar (cross join) instead of a `.first()` driver
        # collect. The collect was a full serial job barrier at plan-
        # construction time (and, as the lazy checkpoint's first
        # consumer, it carried the whole batch shingle pass); in-plan
        # it executes inside the near_hot broadcast build, overlapped
        # with the other broadcast exchanges of the final job. The
        # trade documented for 100 TB: the corpus histogram scan's
        # `__bn > cap - mx` filter no longer reaches parquet row-group
        # pruning (mx is a join output, not a literal) — the histogram
        # tier is (band, bhash, count) rows, orders of magnitude
        # smaller than the corpus, and the store pins it hot anyway.
        if band_sizes_hot:
            # r16: when the caller pins the histogram tier hot (the
            # store cache does — it is registry-sized, (band, bhash,
            # count) ints), reconcile by broadcasting the WHOLE tier
            # into the batch histogram instead of the mx/near-hot
            # two-step. Identical ok set: the full tier is the
            # near-hot superset at mx = ∞, and the filter below is the
            # exact per-bucket test either way. One broadcast build
            # replaces three chained ones (mx scalar → near-hot →
            # ok) — each chained build was a serial ~20-150 ms
            # sub-job of the probe. The mx path below stays the
            # default: at 100 TB the histogram tier is NOT broadcast
            # material and the near-hot tail is.
            old_counts = F.broadcast(
                corpus_band_sizes.withColumnRenamed("__bn", "__bn_old")
            )
        else:
            # `mx` — the batch histogram's max bucket count — folded
            # INTO the plan as a broadcast 1-row scalar (cross join)
            # instead of a `.first()` driver collect (r16, VERDICT r15
            # task 1). The collect was a full serial job barrier at
            # plan-construction time (and, as the lazy checkpoint's
            # first consumer, it carried the whole batch shingle
            # pass); in-plan it executes inside the near-hot broadcast
            # build. The trade documented for 100 TB: the histogram
            # scan's `__bn > cap - mx` filter no longer reaches
            # parquet row-group pruning (mx is a join output, not a
            # literal) — the histogram tier is (band, bhash, count)
            # rows, orders of magnitude smaller than the corpus.
            mx_df = batch_hist.agg(
                F.coalesce(F.max("__bn_new"), F.lit(0)).alias("__mx")
            )
            old_counts = F.broadcast(
                corpus_band_sizes.crossJoin(F.broadcast(mx_df))
                .filter(F.col("__bn") > max_bucket_size - F.col("__mx"))
                .drop("__mx")
                .withColumnRenamed("__bn", "__bn_old")
            )
        ok_buckets = (
            batch_hist.join(old_counts, ["band", "bhash"], "left")
            .filter(
                F.col("__bn_new") + F.coalesce(F.col("__bn_old"), F.lit(0))
                <= max_bucket_size
            )
            .select("band", "bhash")
        )
        ok_b = F.broadcast(ok_buckets)
        # r16: the cap filter is applied to the PROBE side only — the
        # candidate join's key IS the bucket, so a pair's a-side bucket
        # equals its (ok-filtered) b-side bucket and filtering both
        # sides was redundant work (one extra BHJ probe pass) and one
        # extra serial broadcast dependency for the batch side.
        ab = all_bands.join(ok_b, on=["band", "bhash"])
        a, b = F.broadcast(new_bands).alias("a"), ab.alias("b")
    else:
        sizes = all_bands.groupBy("band", "bhash").agg(
            F.count(F.lit(1)).alias("__bn")
        )
        ok_buckets = sizes.filter(F.col("__bn") <= max_bucket_size).drop("__bn")
        nb = new_bands.join(ok_buckets, on=["band", "bhash"])
        ab = all_bands.join(ok_buckets, on=["band", "bhash"])
        a, b = nb.alias("a"), ab.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
        .distinct()
    )
    if corpus_sets is not None and corpus_sets_loader is None:
        # r16 single-barrier verify (cached-sets tier; VERDICT r15
        # task 1). The r15 shape checkpointed `cands` eagerly (a
        # driver barrier) and then broadcast the candidate-PRUNED sets
        # union on BOTH verify sides — each broadcast build re-ran the
        # cand-id distinct aggregate and the corpus_sets semi-join
        # (two SortMergeJoin LeftSemi + four Exchange subtrees in the
        # r15 captured plan). Here `cands` executes exactly ONCE — as
        # one broadcast build, exploded to (id_a, id_b, probe-id) so
        # BOTH pair members resolve their hash set in a SINGLE pass
        # over the sets tier (already resident: the store cache
        # checkpoints it), then a candidate-scale groupBy stitches the
        # pair back together. The BHJ does the candidate pruning the
        # semi-join did; each pair matches exactly two set rows (ids
        # are unique), so the ignorenulls-first aggregates are
        # deterministic. No driver barrier remains between the staged
        # batch checkpoint and the final action.
        sets = new_sets.unionByName(corpus_sets.select("id", "__h64"))
        exploded = cands.select(
            "id_a",
            "id_b",
            F.explode(F.array("id_a", "id_b")).alias("id"),
        )
        hits = sets.join(F.broadcast(exploded), "id")
        paired = hits.groupBy("id_a", "id_b").agg(
            F.first(
                F.when(F.col("id") == F.col("id_a"), F.col("__h64")),
                ignorenulls=True,
            ).alias("__ha"),
            F.first(
                F.when(F.col("id") == F.col("id_b"), F.col("__h64")),
                ignorenulls=True,
            ).alias("__hb"),
        )
        inter = F.size(F.array_intersect("__ha", "__hb"))
        union = F.size(F.array_union("__ha", "__hb"))
        return paired.select(
            "id_a",
            "id_b",
            F.round(inter / F.when(union > 0, union).otherwise(1), 6)
            .cast("double")
            .alias("jaccard"),
        ).filter(F.col("jaccard") >= threshold)
    # LAZY checkpoint in the store-loader path (round 12): the capped
    # cand_ids collect just below is then the single first consumer
    # and writes the checkpoint as a side effect -- the cands job and
    # the id-list job fuse into one barrier. The corpus-text fallback
    # keeps the eager barrier: its first consumer is the verify job,
    # whose two plan branches over cands would otherwise race to
    # materialize.
    cands = cands.localCheckpoint(eager=corpus_sets_loader is None)

    # shingle sets for the candidate OLD docs only (sparse rebuild)
    new_ids = new_sets.select("id")
    cand_ids = (
        cands.select(F.col("id_a").alias("id"))
        .unionByName(cands.select(F.col("id_b").alias("id")))
        .distinct()
        .join(new_ids, "id", "left_anti")
    )
    if corpus_sets_loader is not None:
        # parquet-store face (corpus_sig_store_open): hand the loader
        # the materialized candidate id list so it can file-prune the
        # sets tier (stats ranges + multi-point bloom). The collect is
        # CAPPED (ADVICE r10): candidate count is batch-scale in the
        # typical case (every pair touches a batch id), but a dirty
        # near-identical batch landing in many shared buckets can
        # fan the candidate set far past the batch — above the cap
        # the probe degrades to loader(None), a full (still
        # snapshot-pruned-by-nothing, but executor-side) sets scan,
        # instead of a driver OOM building a huge in-filter. This
        # collect is the job that MATERIALIZES the lazy cands
        # checkpoint (round 12) — one barrier where r11 had two.
        cap = 100_000
        limited = cand_ids.limit(cap + 1).collect()
        ids = [r["id"] for r in limited] if len(limited) <= cap else None
        loaded = corpus_sets_loader(ids)
        old_sets = (
            loaded.join(cand_ids, "id", "left_semi").select("id", "__h64")
            if loaded is not None
            else new_sets.limit(0)
        )
    else:
        old_sets = (
            corpus_docs.join(
                cand_ids, corpus_docs[id_col] == cand_ids["id"], "left_semi"
            )
            .select(
                F.col(id_col).alias("id"),
                F.transform(
                    F.array_distinct(shingles_col(text_col, shingle_w)),
                    md5_token_hash64,
                ).alias("__h64"),
            )
        )
    # NOT checkpointed (round 11): both inputs are already barriers
    # (new_sets reads the staged checkpoint, old_sets is a broadcast
    # semi-join of the persisted store sets against checkpointed
    # cand ids), so the verify job's two consumers just re-run two
    # cheap scans — cheaper than the 0.5 s job round-trip the eager
    # checkpoint cost here (measured at sf0.1).
    sets = new_sets.unionByName(old_sets)
    out = (
        cands.join(sets.select(F.col("id").alias("id_a"), F.col("__h64").alias("__ha")), "id_a")
        .join(sets.select(F.col("id").alias("id_b"), F.col("__h64").alias("__hb")), "id_b")
    )
    inter = F.size(F.array_intersect("__ha", "__hb"))
    union = F.size(F.array_union("__ha", "__hb"))
    return out.select(
        "id_a",
        "id_b",
        F.round(inter / F.when(union > 0, union).otherwise(1), 6).cast("double").alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def minhash_incremental_with_state(
    new_docs: DataFrame,
    store: DataFrame | None,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    bands: int = 16,
    shingle_w: int = 3,
    max_bucket_size: int = 200,
) -> tuple[DataFrame, DataFrame]:
    """Self-contained incremental near-dup against a dedup STATE table
    — no corpus text needed, so it drives the streaming ingest sink.

    `store` is (id, sig array<long>, h64 array<long>): signatures for
    banding plus the deduped 64-bit shingle-hash sets for the exact
    Jaccard verify (the state IS the corpus; ~tens of bytes per token
    — the price of exact verification without re-reading text; pass
    through `minhash_incremental_pairs` instead when corpus text is
    reachable and state should stay signature-only). Returns
    (pairs involving the batch, updated store). Pair semantics match
    the full detector exactly (same family, banding, union-histogram
    bucket caps, exact hash-set verify); feeding batches through this
    one at a time yields precisely the full-run pair set, because
    every pair is new×old-or-new exactly once — streaming-vs-batch
    equality is pytest-gated. Replays converge: re-ingesting a batch
    overwrites the same store rows and re-derives the same pairs
    (upsert by (id_a, id_b) downstream)."""
    from data_warehouse_nhom8_spark.session import repartition_for_compute

    new_docs = repartition_for_compute(new_docs)
    new_sets = new_docs.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.array_distinct(shingles_col(text_col, shingle_w)), md5_token_hash64
        ).alias("h64"),
    ).localCheckpoint(eager=True)
    new_full = new_sets.select(
        "id",
        minhash_signature_col(
            F.transform("h64", lambda h: F.abs(h) % _P), k
        ).alias("sig"),
        "h64",
    ).localCheckpoint(eager=True)
    if store is None:
        store = new_full.limit(0)
    # last-write-wins on re-ingest: old store rows for batch ids drop
    kept_old = store.join(new_full.select("id"), "id", "left_anti")
    new_store = kept_old.unionByName(new_full)

    new_bands = _band_table(new_full.select("id", "sig"), k, bands)
    old_bands = _band_table(kept_old.select("id", "sig"), k, bands)
    all_bands = new_bands.unionByName(old_bands)
    sizes = all_bands.groupBy("band", "bhash").agg(F.count(F.lit(1)).alias("__bn"))
    ok_buckets = sizes.filter(F.col("__bn") <= max_bucket_size).drop("__bn")
    nb = new_bands.join(ok_buckets, on=["band", "bhash"])
    ab = all_bands.join(ok_buckets, on=["band", "bhash"])
    a, b = nb.alias("a"), ab.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    cand_ids = (
        cands.select(F.col("id_a").alias("id"))
        .unionByName(cands.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # verify from stored sets — sparse: only candidate ids shuffle
    sets_needed = new_store.select("id", "h64").join(cand_ids, "id", "left_semi")
    out = (
        cands.join(
            sets_needed.select(F.col("id").alias("id_a"), F.col("h64").alias("__ha")), "id_a"
        ).join(
            sets_needed.select(F.col("id").alias("id_b"), F.col("h64").alias("__hb")), "id_b"
        )
    )
    inter = F.size(F.array_intersect("__ha", "__hb"))
    union = F.size(F.array_union("__ha", "__hb"))
    pairs = out.select(
        "id_a",
        "id_b",
        F.round(inter / F.when(union > 0, union).otherwise(1), 6).cast("double").alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)
    return pairs, new_store


def ngram_jaccard_pairs_exact(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_w: int = 5,
    max_shingle_df: int | None = 1000,
    materialize_postings: bool = True,
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via an inverted shingle
    index — complete recall (a pair with J ≥ t > 0 shares ≥1 shingle,
    so it appears in some posting list) without any all-pairs scan:

      1. posting list: (shingle-hash, id), distinct per doc
      2. intersection size per candidate pair = COUNT over the
         posting-list self-join (group by pair)
      3. |union| = |A| + |B| − |A∩B|  →  J = inter / union

    Scale: the self-join shuffles 8-byte hashed shingles (not the
    strings), and pair-aggregation work is Σ df(s)² over shingles —
    bounded in real corpora because long-w shingles are rare;
    `max_shingle_df` is the stop-shingle guard for boilerplate (drops
    shingles appearing in more docs than the cap, making J "Jaccard
    over non-stop shingles").  The guard is the PRODUCTION DEFAULT:
    with it off, one boilerplate shingle shared by g docs contributes
    g² candidate pairs, which is unbounded at corpus scale.  The
    default cap bounds the per-shingle pair work at 10⁶ while being
    far above any real shingle's df in a deduplicated corpus — true
    near-dup pairs share many RARE shingles, so recall is unaffected
    (asserted by the planted-duplicate pytest).  Pass None only for
    strict-exact semantics on bounded inputs (the q50 oracle does,
    because DuckDB computes the unguarded definition).
    md5₆₄ shingle collisions are possible in principle
    (~#shingles²/2⁶⁴) and ignored, as in every hashed-shingle dedup.

    Unlike `minhash_neardup_pairs` (probabilistic recall via LSH),
    this is deterministic end-to-end and therefore driver-oracled
    (q50): DuckDB computes the identical definition over raw strings.

    `materialize_postings` (default on) checkpoints the posting list
    before fan-out: the tokenize→shingle→hash subtree feeds BOTH
    sides of the self-join plus the doc-size agg (and the df-guard),
    and Catalyst does not share a subtree across a self-join — so the
    lazy plan re-shingles the corpus 3-4×. Materializing computes it
    once (measured 0.6× warm / 0.4× cold at sf0.1). The local
    checkpoint truncates lineage, so a lost executor fails the job
    instead of recomputing; on a large shared cluster where that
    matters more than the re-shingling, pass False to keep the pure
    lazy plan (results are identical either way). Note the eager
    checkpoint runs Spark jobs at CALL time (building the DataFrame
    is no longer free), and its storage blocks live until the
    returned DataFrame is garbage-collected — a long-lived session
    rebuilding this plan in a loop should hold the result briefly or
    pass False.
    """
    from data_warehouse_nhom8_spark.session import repartition_for_compute

    df = repartition_for_compute(df)
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles_col(text_col, shingle_w))).alias("s"),
    ).select("id", F.xxhash64("s").alias("h"))
    if materialize_postings:
        sh = sh.localCheckpoint(eager=True)
    if max_shingle_df is not None:
        freq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("__df"))
        sh = sh.join(freq.filter(F.col("__df") <= max_shingle_df), on="h").drop("__df")
        if materialize_postings:
            # the guarded list ALSO fans out 3 ways; re-materialize so
            # the guard join runs once (reads the first checkpoint)
            sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    j = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("__na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("__nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("__i") / (F.col("__na") + F.col("__nb") - F.col("__i")), 6
            ).cast("double").alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold)


def jaccard_bruteforce(
    df: DataFrame,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_w: int = 3,
) -> DataFrame:
    """O(n²) exact twin (recall oracle for tests; never for scale)."""
    ids = df.select(F.col(id_col).alias("id"))
    pairs = (
        ids.alias("a")
        .crossJoin(ids.alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    return jaccard_pairs(df, pairs, id_col, text_col, shingle_w).filter(
        F.col("jaccard") >= threshold
    )


# ------------------------------------------------------------------ SimHash

def md5_token_hash64(w: Column) -> Column:
    """Signed 64-bit token hash from md5: hi/lo 32-bit halves of the
    first 16 hex chars recombined (shiftleft wraps the sign bit in
    two's complement — no ANSI overflow). Chosen over xxhash64 (r14)
    because BOTH engines compute md5 identically, so the SimHash tier
    becomes end-to-end deterministic ACROSS engines and q39's DuckDB
    twin reproduces signatures, chunks, and Hamming pairs bitwise —
    the same promotion construction as q41's md5-derived hyperplanes.
    xxhash64 has no DuckDB counterpart; md5 parity is already load-
    bearing in the oracled set (q33/q36 fingerprints, q54 split
    buckets)."""
    h = F.md5(w)
    hi = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def simhash_token_hashes(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, __th) — the distinct-token 64-bit hash array every SimHash
    face folds over: lower/trim/whitespace-split, distinct (first-
    occurrence order), capped at `_SWAR_LANE_CAP` distinct tokens,
    each hashed via `md5_token_hash64`. Single definition so the
    declared query, the DuckDB twin generator, and the form-
    equivalence pytests can never drift apart."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.slice(
            F.transform(
                F.array_distinct(F.split(F.lower(F.trim(t)), WS_SPLIT)),
                md5_token_hash64,
            ),
            1,
            _SWAR_LANE_CAP,
        ).alias("__th"),
    )


def simhash_col(token_hashes: Column, bits: int = 64) -> Column:
    """SimHash signature (LongType) over a PRE-HASHED token array
    (array<long>): each bit votes +1/-1 per token hash, sign of the
    sum sets the bit. The input must be a *named column* — the `bits`
    aggregate branches would otherwise recompute the tokenize+hash
    work `bits` times (same staging rule as minhash_signature_col).
    Use `simhash_signatures` for the staged DataFrame form."""
    hashes = token_hashes
    def bit_vote(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for i in range(bits):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), bit_vote(i))
        # bit 63 of a signed long is MIN_VALUE in two's complement
        bit_val = -(1 << 63) if i == 63 else (1 << i)
        out = out + F.when(vote > 0, F.lit(bit_val).cast("long")).otherwise(0)
    return out


# 16-bit SWAR lanes: each accumulator long packs 4 bit-counters, so
# 16 longs cover all 64 bits. The top lane occupies bits 48–63 of a
# SIGNED long, so counts must stay < 2^15 to never carry into the
# sign bit (ANSI mode would raise on the overflowing add). Documents
# with more distinct tokens than the cap (~0.25 MB of unique text)
# are sketched over their first `_SWAR_LANE_CAP` distinct tokens —
# a stable, documented truncation of an already-approximate sketch.
_SWAR_LANE_CAP = (1 << 15) - 1


def _simhash_fold_packed(id_col: str = "id", arr: str = "__th") -> list[Column]:
    """Packed single-pass fold: one `aggregate` walk of the token-hash
    array maintaining 16 longs of 4×16-bit bit-vote counters. Narrow
    (no explode, no shuffle) — signature computation is map-only."""
    lanes = ", ".join(
        f"acc[{j}] + CAST("
        + " + ".join(
            f"shiftleft(shiftright(x, {j + 16 * m}) & 1, {16 * m})" for m in range(4)
        )
        + " AS BIGINT)"
        for j in range(16)
    )
    agg = F.expr(
        f"aggregate({arr}, array_repeat(CAST(0 AS BIGINT), 16), (acc, x) -> array({lanes}))"
    )
    return [F.col(id_col).alias("id"), agg.alias("__p"), F.size(arr).alias("__n")]


def _simhash_unpack_sig(bits: int = 64) -> Column:
    """Majority-vote unpack as ONE parsed SQL string (round-10
    build-cost rule): the 64-branch Column form cost ~0.8 s of py4j
    plan CONSTRUCTION per call — 2x the execution job it feeds
    (measured at sf0.1: q39 build 1.3 s vs exec 0.8 s, the build
    dominated by this tree); the SQL form parses in one JVM round
    trip and plans identically. shiftleft(1L, 63) wraps to
    MIN_VALUE in two's complement — the bit-63 literal without an
    ANSI-mode overflow. Bit-identity with the Column twin below is
    regression-tested."""
    if bits <= 0:
        return F.lit(0).cast("long")
    terms = " + ".join(
        f"IF(2 * (shiftright(element_at(__p, {i % 16 + 1}), {16 * (i // 16)})"
        f" & 65535) > __n, shiftleft(CAST(1 AS BIGINT), {i}), CAST(0 AS BIGINT))"
        for i in range(bits)
    )
    return F.expr(terms)


def _simhash_unpack_sig_column_form(bits: int = 64) -> Column:
    """Column-API twin of `_simhash_unpack_sig` — kept as the readable
    specification and for the bit-identity regression test (same
    pattern as _merge_positions_col_column_form)."""
    sig = F.lit(0).cast("long")
    for i in range(bits):
        j, m = i % 16, i // 16
        cnt = F.shiftright(F.element_at("__p", j + 1), 16 * m).bitwiseAND(F.lit(0xFFFF))
        # bit 63 of a signed long is MIN_VALUE in two's complement
        bit_val = -(1 << 63) if i == 63 else (1 << i)
        sig = sig + F.when(
            2 * cnt > F.col("__n"), F.lit(bit_val).cast("long")
        ).otherwise(0)
    return sig


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """(id, sh) SimHash signatures via a SWAR-packed single-pass fold:
    one `aggregate` walk of the token-hash array updates 16 longs of
    4×16-bit bit-vote counters, unpacked into the majority-vote
    signature in a second projection (kept un-collapsed so the fold
    runs once, not 64×). Bit-identical to the explode → 64-sum agg
    form it replaced (regression-tested) for every document within
    the lane cap, but map-only — no explode, no groupBy shuffle —
    and ~1.7× faster (2.35 s → 1.42 s at sf0.1). Documents past the
    cap are sketched over their first `_SWAR_LANE_CAP` distinct
    tokens (see the cap comment). Rows with NULL text get signature 0
    (no token votes). Token hashes are md5-derived
    (`simhash_token_hashes`) so the whole tier is reproducible in
    DuckDB — q39's oracle promotion (r14)."""
    from data_warehouse_nhom8_spark.session import repartition_for_compute

    hashed = simhash_token_hashes(
        repartition_for_compute(df), id_col, text_col
    )
    packed = hashed.select(*_simhash_fold_packed())
    return packed.select("id", _simhash_unpack_sig(bits).alias("sh"))


def simhash_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunks: int = 4,
    max_bucket_size: int = 500,
) -> DataFrame:
    """Near-dups by SimHash: block on 16-bit chunks (a pair within
    Hamming radius r < chunks must agree on ≥1 chunk), verify with
    bit_count(xor) ≤ max_hamming. Chunk buckets above
    `max_bucket_size` are skipped (same degenerate-bucket/skew guard
    as MinHash LSH — see minhash_lsh_candidates)."""
    # Materialize signatures once: the packed fold is map-only (no
    # shuffle), so without this the three consumers below (bucket
    # histogram + both sides of the chunk self-join) would each
    # recompute it — the old explode+agg form got this reuse for free
    # from its shuffle files.
    sh = simhash_signatures(df, id_col, text_col).localCheckpoint(eager=True)
    return simhash_pairs_from_signatures(sh, max_hamming, chunks, max_bucket_size)


def simhash_pairs_from_signatures(
    sh: DataFrame,
    max_hamming: int = 3,
    chunks: int = 4,
    max_bucket_size: int = 500,
) -> DataFrame:
    """The blocking+verify stage over a PRECOMPUTED (id, sh) signature
    table — split out (r14) so fit-once consumers (the q39 session
    memo; a persisted signature store at 100 TB, where recomputing
    md5 folds of the whole corpus per query is exactly what a
    production store exists to avoid) can reuse materialized
    signatures while the one-shot `simhash_neardup_pairs` face keeps
    its compute-and-pair semantics."""
    width = 64 // chunks
    mask = (1 << width) - 1
    chunked = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftright("sh", i * width).bitwiseAND(F.lit(mask)).alias("cv"),
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("c"),
    ).select("id", "sh", "c.ci", "c.cv")
    sizes = chunked.groupBy("ci", "cv").agg(F.count(F.lit(1)).alias("__bn"))
    chunked = chunked.join(
        sizes.filter(F.col("__bn") <= max_bucket_size), on=["ci", "cv"]
    ).drop("__bn")
    a, b = chunked.alias("a"), chunked.alias("b")
    # verify (bit_count, cheap) BEFORE distinct: the chunk join emits
    # each colliding pair up to `chunks` times and boilerplate corpora
    # emit millions of candidates — filtering first means the dedup
    # shuffle carries only true near-dups, not the candidate flood
    # (measured 1.5M -> ~1k rows at sf0.1)
    return (
        a.join(b, (F.col("a.ci") == F.col("b.ci")) & (F.col("a.cv") == F.col("b.cv")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ------------------------------------------------- persisted sig store
#
# The parquet face of the incremental detector's state (round-10,
# VERDICT r9 task 5): at 100 TB the signature store does NOT fit in
# executor memory — it lives as versioned snapshots, and the daily
# probe must not scan all of it. Tier layout under `{path}/`:
#
#   sigs/   (id, sig)          — banding source at store REBUILDS only
#   bands/  (band, bhash, id)  — the candidate join side (static
#                                between compactions; the probe joins
#                                its ~batch-sized band table against
#                                this, key-partitioned, no text)
#   sizes/  (band, bhash, __bn)— per-bucket histogram (skew guard)
#   sets/   (id, __h64)        — the exact-verify tier, RANGE-LAID by
#                                id with a min/max + per-file BLOOM
#                                manifest: the verify step touches
#                                only candidate ids (~batch-scale,
#                                sparse), so the scan prunes to the
#                                files that may hold one — the sets
#                                tier is the store's bulk (hash set ≈
#                                tens of bytes/token) and the only
#                                tier where file-skipping pays.

_SETS_STATS_COLS = ["id"]


def corpus_sig_store_persist(
    corpus_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    bands: int = 16,
    shingle_w: int = 3,
    n_set_files: int = 16,
) -> dict:
    """Build and persist the three-tier signature store as versioned
    snapshots (atomic commits, time travel — the compaction story of
    `sources.snapshots`). One shingling pass feeds every tier. The
    sets tier is written as `n_set_files` id-range files and gets the
    stats+bloom manifest the probe's pruned scan consults; size it to
    ~128 MB files in production (id-range layout keeps each candidate
    lookup inside one file-range)."""
    import os as _os

    from data_warehouse_nhom8_spark.sources.layout import write_stats_manifest
    from data_warehouse_nhom8_spark.sources.snapshots import snapshot_overwrite

    staged = minhash_signature_sets(corpus_docs, id_col, text_col, k, shingle_w)
    staged = staged.localCheckpoint(eager=True)  # one shingling pass, 4 writes
    sigs = staged.select("id", "sig")
    bands_df = _band_table(sigs, k, bands)
    sizes_df = bands_df.groupBy("band", "bhash").agg(
        F.count(F.lit(1)).alias("__bn")
    )
    snapshot_overwrite(sigs, _os.path.join(path, "sigs"))
    snapshot_overwrite(bands_df, _os.path.join(path, "bands"))
    snapshot_overwrite(sizes_df, _os.path.join(path, "sizes"))
    vdir = snapshot_overwrite(
        staged.select("id", "__h64").repartitionByRange(n_set_files, "id"),
        _os.path.join(path, "sets"),
    )
    write_stats_manifest(vdir, _SETS_STATS_COLS, bloom_cols=_SETS_STATS_COLS)
    return {"path": path, "k": k, "bands": bands, "shingle_w": shingle_w}


def corpus_sig_store_open(spark, path: str) -> dict:
    """Open a persisted store: DataFrames for the bands/sizes/sigs
    tiers plus `sets_loader`, a callable the incremental detector
    invokes with the CANDIDATE id list — it serves (id, __h64) from a
    stats+bloom-PRUNED snapshot scan (`snapshot_scan` ranges on
    [min,max] id plus the multi-point bloom probe), so the verify
    step reads only the set files that may hold a candidate. The
    loader returns a superset of the requested ids (file granularity;
    pruning is a superset guarantee) — the detector's joins take care
    of exactness. Also returns `sets_scan_stats`, updated per load
    with (files_selected, files_total) for plan gates."""
    import os as _os

    from data_warehouse_nhom8_spark.sources.snapshots import (
        snapshot_read,
        snapshot_scan,
    )

    sets_path = _os.path.join(path, "sets")
    stats = {"files_selected": None, "files_total": None}

    def sets_loader(cand_ids: list | None) -> DataFrame:
        # None = "candidate set too large to enumerate" (the
        # detector's collect cap): serve the FULL sets tier — an
        # executor-side scan, no driver in-filter. Distinct from []
        # (= zero candidates, nothing to load).
        if cand_ids is None:
            full = snapshot_read(spark, sets_path)
            stats["files_selected"], stats["files_total"] = None, None
            return full
        if not cand_ids:
            df, n, tot = None, 0, 0
        else:
            df, n, tot = snapshot_scan(
                spark,
                sets_path,
                ranges={"id": (min(cand_ids), max(cand_ids))},
                points={"id": list(cand_ids)},
            )
        stats["files_selected"], stats["files_total"] = n, tot
        if df is None:
            sets_df = snapshot_read(spark, sets_path)
            return sets_df.limit(0) if sets_df is not None else None
        return df

    return {
        "sigs": snapshot_read(spark, _os.path.join(path, "sigs")),
        "bands": snapshot_read(spark, _os.path.join(path, "bands")),
        "sizes": snapshot_read(spark, _os.path.join(path, "sizes")),
        "sets_loader": sets_loader,
        "sets_scan_stats": stats,
    }
