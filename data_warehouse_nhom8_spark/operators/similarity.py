"""Embedding similarity search (SURVEY.md §2k X2).

Two tiers, as the SURVEY plan requires:

* brute-force cosine top-k — the exact baseline: broadcast the query
  vector, dot product as a native `aggregate(zip_with(...))`
  expression, TakeOrderedAndProject for the top-k. O(n·d), one scan,
  no shuffle. Correct at any scale, linear cost.
* LSH-bucketed ANN (random hyperplanes) — the scale path: sign-bit
  signature per vector, probe only matching/nearby buckets, exact
  rerank inside. Sub-linear reads when the bucket histogram is
  balanced. Recall is tested against the brute-force twin.

Embedding-cosine near-dup (pairs, not query): same hyperplane
buckets, exact cosine verify within buckets.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim_col(a: Column, b: Column) -> Column:
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_sim_col(F.col(vec_col).cast("array<double>"), q)
    return (
        embeddings.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


# ------------------------------------------------- hyperplane LSH (ANN)

def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (hash-derived gaussians
    via Box-Muller on md5 streams — no RNG state, same planes every
    run/session)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        vals: list[float] = []
        i = 0
        while len(vals) < dim:
            h = hashlib.md5(f"plane:{p}:{i}".encode()).digest()
            for j in range(0, 16, 8):
                u1 = (int.from_bytes(h[j : j + 4], "big") + 1) / (2**32 + 1)
                u2 = (int.from_bytes(h[j + 4 : j + 8], "big") + 1) / (2**32 + 1)
                vals.append(math.sqrt(-2 * math.log(u1)) * math.cos(2 * math.pi * u2))
            i += 1
        planes.append(vals[:dim])
    return planes


def hyperplane_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit LSH bucket id (LongType) for a vector column."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(_dot(vec, p) >= 0, F.lit(1 << i).cast("long")).otherwise(0)
    return bucket


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: restrict the exact rerank to vectors whose bucket is
    within `probe_hamming` bits of the query's bucket (multi-probe).
    At scale, write the table partitioned by bucket so the probe is
    partition pruning, not a filter."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes)
    vec_d = F.col(vec_col).cast("array<double>")
    with_bucket = embeddings.select(
        F.col(id_col), vec_d.alias("__v"), hyperplane_bucket_col(vec_d, planes).alias("__bucket")
    )
    qbucket = sum(
        (1 << i)
        for i, plane in enumerate(planes)
        if sum(a * b for a, b in zip(query_vec, plane)) >= 0
    )
    probed = with_bucket.filter(
        F.bit_count(F.col("__bucket").bitwiseXOR(F.lit(qbucket))) <= probe_hamming
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        probed.select(F.col(id_col), cosine_sim_col(F.col("__v"), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: bucket join on the hyperplane
    signature, exact cosine verify inside buckets.

    `dim` defaults to the actual vector length (sampled from one row):
    a wrong hard-coded dim makes zip_with null-pad, every dot product
    NULL, every bucket 0 — silently degenerating the bucket join into
    an O(n²) cross join."""
    if dim is None:
        head = embeddings.select(vec_col).head()
        if head is None:
            return embeddings.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cosine double"
            )
        dim = len(head[0])
    planes = _hyperplanes(dim, n_planes)
    vec_d = F.col(vec_col).cast("array<double>")
    b = embeddings.select(
        F.col(id_col).alias("id"),
        vec_d.alias("v"),
        hyperplane_bucket_col(vec_d, planes).alias("bucket"),
    )
    x, y = b.alias("x"), b.alias("y")
    cand = x.join(
        y, (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.id") < F.col("y.id"))
    )
    sim = cosine_sim_col(F.col("x.v"), F.col("y.v"))
    return (
        cand.select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.round(sim, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )
