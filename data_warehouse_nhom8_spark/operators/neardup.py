"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard
(SURVEY.md §2k X2 — LLM-data extension; no reference twin).

All pure DataFrame ops — no Python in the per-row path:

MinHash+LSH pipeline (the 100 TB design):
  1. shingle: w-token shingles from the canonical token stream
  2. minhash: k permutations via (a_i * xxhash64(shingle) + b_i) mod p,
     each signature element = MIN over shingles (array expressions)
  3. band: split the k-signature into b bands of r; hash each band
  4. bucket join: explode bands → groupBy(band_idx, band_hash) —
     candidate pairs only ever meet inside a bucket (no all-pairs!)
  5. verify: exact token-set Jaccard on candidates (array_intersect /
     array_union on the deduped shingle sets)

Shuffle analysis: step 4 shuffles |docs|·b rows of (int, long, id) —
independent of document length; step 5 joins only candidates. This is
the standard scale-out shape (vs. the O(n²) brute-force twin used to
test recall on small data).

SimHash: 64-bit signature from per-token xxhash64 bit votes;
near-dups = signatures within a Hamming radius, found by exact-match
on rotated chunks (Charikar-style). Implemented with explode +
bitwise aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
    the single shingle."""
    t = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(F.trim(t)), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, w))
    )


def minhash_signature_col(shingles: Column, k: int = 64) -> Column:
    """k-element MinHash signature (array<long>) over a shingle array."""
    base = F.transform(shingles, lambda s: F.abs(F.xxhash64(s)) % _P)

    def perm(a: int, b: int):
        # closure (not default-arg lambda): higher-order functions
        # dispatch on lambda arity, so the lambda must take exactly 1 arg
        return lambda h: (h * a + b) % _P

    sig = []
    for i in range(k):
        a, b = _coeff(i, "a"), _coeff(i, "b")
        sig.append(F.array_min(F.transform(base, perm(a, b))))
    return F.array(*sig)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 64,
    bands: int = 16,
    shingle_w: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) via banded MinHash-LSH.
    rows ∝ pairs that collide in ≥1 band — the threshold curve is
    t ≈ (1/bands)^(bands/k)."""
    r = k // bands
    sig = minhash_signature_col(shingles_col(text_col, shingle_w), k)
    with_sig = df.select(F.col(id_col).alias("id"), sig.alias("sig"))
    banded = with_sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(",", *[F.element_at("sig", b * r + j + 1).cast("string") for j in range(r)])
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bhash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bhash") == F.col("b.bhash")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


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
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact-Jaccard verify →
    pairs above threshold."""
    cands = minhash_lsh_candidates(df, id_col, text_col, k, bands, shingle_w)
    return jaccard_pairs(df, cands, id_col, text_col, shingle_w).filter(
        F.col("jaccard") >= threshold
    )


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

def simhash_col(text: Column | str = "text", bits: int = 64) -> Column:
    """SimHash signature (LongType): per-token xxhash64, each bit votes
    +1/-1, sign of the vote sum sets the bit. Pure array expressions."""
    t = F.col(text) if isinstance(text, str) else text
    toks = F.array_distinct(F.split(F.lower(F.trim(t)), r"\s+"))
    hashes = F.transform(toks, lambda w: F.xxhash64(w))
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


def simhash_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunks: int = 4,
) -> DataFrame:
    """Near-dups by SimHash: block on 16-bit chunks (a pair within
    Hamming radius r < chunks must agree on ≥1 chunk), verify with
    bit_count(xor) ≤ max_hamming."""
    sh = df.select(F.col(id_col).alias("id"), simhash_col(text_col).alias("sh"))
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
    a, b = chunked.alias("a"), chunked.alias("b")
    cands = (
        a.join(b, (F.col("a.ci") == F.col("b.ci")) & (F.col("a.cv") == F.col("b.cv")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .distinct()
    )
    return cands.filter(F.col("hamming") <= max_hamming)
