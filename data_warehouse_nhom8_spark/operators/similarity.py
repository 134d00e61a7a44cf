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


def hyperplane_bucket_col(vec: Column | str, planes: list[list[float]]) -> Column:
    """Sign-bit LSH bucket id (LongType) for a vector column.

    Pass the column NAME (str) on latency-sensitive paths: the
    n_planes x dim plane literals then assemble as ONE SQL string
    parsed in a single JVM round-trip instead of ~dim x planes py4j
    `lit` calls — the q53 build-cost finding (round 10) applied to
    the LSH tier. Same aggregate/zip_with fold, same left-to-right
    association, repr-roundtripped double literals → bit-identical
    buckets (pytest-gated), which is what keeps q52 oracled."""
    if isinstance(vec, str):
        # r16: parse through session.memo_expr — the n_planes x dim
        # double-literal expression is a ~15 KB SQL parse per build,
        # identical every time for a fixed plane family
        from data_warehouse_nhom8_spark.session import memo_expr

        terms = []
        for i, plane in enumerate(planes):
            arr = ",".join(f"{float(x)!r}D" for x in plane)
            dot = (
                f"aggregate(zip_with({vec}, array({arr}), (x, y) -> x * y), "
                "0.0D, (acc, v) -> acc + v)"
            )
            terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << i}L ELSE 0L END)")
        return memo_expr("CAST(0 AS BIGINT) + " + " + ".join(terms))
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
    # stage the double-cast before bucketing: the per-plane dots are
    # interpreted higher-order folds, and an inline cast would re-run
    # once per plane (see q52's staging note)
    staged = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    with_bucket = staged.select(
        F.col(id_col),
        "__v",
        hyperplane_bucket_col("__v", planes).alias("__bucket"),
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


# ------------------------------------------------------------- IVF (ANN)
#
# Inverted-file index: coarse k-means quantizer → assign every vector
# to its nearest centroid → a query probes only the `n_probe` nearest
# cells and reranks exactly inside them. The second scale path beside
# hyperplane LSH: prefers clustered embedding spaces where sign-bit
# buckets split true neighbourhoods.
#
# Scale shape: training touches the data only through per-iteration
# (cluster, dim) averages — the driver only ever holds the k×d
# centroid model (inherently driver-side between Lloyd's rounds, like
# any iterative ML fit). At rest, write the table partitioned by
# `cluster` so a probe is partition pruning, not a filter.


def _sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _nearest_centroid_col(vec: Column, centroids: list[list[float]]) -> Column:
    """argmin_i ||vec - c_i||² as a native expression: array_min over
    (distance, index) structs — struct ordering breaks ties on the
    lower index. (Field aliases are normalized to col1/col2 inside an
    array literal, hence the positional getField.)"""
    cells = F.array(
        *[
            F.struct(
                _sq_dist(vec, F.array(*[F.lit(float(x)) for x in c])),
                F.lit(i),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.array_min(cells).getField("col2")


def ivf_fit_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic distributed Lloyd's: init cell c = mean of rows
    with pmod(xxhash64(id), k) == c (a fixed pseudo-random partition
    — no RNG state, same model every run), then `iters` rounds of
    assign → per-cell per-dimension mean. The driver collects only
    the k×d model each round, never the data. Empty cells keep their
    previous centroid.

    The assignment inside the loop is the codegen shape, not the
    per-row array fold: ||x−c||² = ||c||² − 2·x·c + ||x||² (the ||x||²
    term is rank-invariant and dropped), with x·c computed by
    posexplode → broadcast join against the (cell, dim, value)
    centroid literals → partial-agg sum. Everything stays in
    whole-stage codegen; the interpreted higher-order-function fold
    was ~50× slower here. Per round this shuffles n·k dot partials
    and n assignments — the standard IVF training cost."""
    spark = embeddings.sparkSession
    from data_warehouse_nhom8_spark.session import repartition_for_compute

    vec_d = F.col(vec_col).cast("array<double>")
    base = repartition_for_compute(
        embeddings.select(F.col(id_col).alias("__id"), vec_d.alias("__v"))
    ).localCheckpoint(eager=True)
    ex = base.select("__id", F.posexplode("__v").alias("__p", "__x"))

    def means_of(assign: DataFrame) -> dict[int, list[float]]:
        rows = (
            assign.join(ex, "__id")
            .groupBy("__c", "__p")
            .agg(F.avg("__x").alias("__m"))
            .collect()
        )
        out: dict[int, dict[int, float]] = {}
        for r in rows:
            out.setdefault(r["__c"], {})[r["__p"]] = r["__m"]
        return {c: [dims[p] for p in sorted(dims)] for c, dims in out.items()}

    init = means_of(
        base.select(
            "__id",
            F.pmod(F.xxhash64(F.col("__id").cast("string")), F.lit(n_centroids))
            .cast("int")
            .alias("__c"),
        )
    )
    if not init:
        return []
    dim = len(next(iter(init.values())))
    centroids = [init.get(c, [0.0] * dim) for c in range(n_centroids)]
    for _ in range(iters):
        cent_df = spark.createDataFrame(
            [(c, p, float(v)) for c, vec in enumerate(centroids) for p, v in enumerate(vec)],
            "__c int, __p int, __cv double",
        )
        cn2 = [sum(v * v for v in vec) for vec in centroids]
        dots = (
            ex.join(F.broadcast(cent_df), "__p")
            .groupBy("__id", "__c")
            .agg(F.sum(F.col("__x") * F.col("__cv")).alias("__dot"))
        )
        score = (
            F.element_at(
                F.array(*[F.lit(float(x)) for x in cn2]), F.col("__c") + 1
            )
            - 2 * F.col("__dot")
        )
        assign = dots.groupBy("__id").agg(
            F.min_by("__c", F.struct(score.alias("s"), F.col("__c"))).alias("__c")
        )
        assigned = means_of(assign)
        centroids = [assigned.get(c, centroids[c]) for c in range(n_centroids)]
    return centroids


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, v, cluster) index table. At scale, persist partitioned by
    `cluster` so probes prune partitions. Map-only: the per-row
    argmin fold costs k·d interpreted steps per vector — fine for
    index build (once per vector, carries the vector through), while
    the fit loop uses the join formulation (see ivf_fit_centroids)."""
    from data_warehouse_nhom8_spark.session import repartition_for_compute

    embeddings = repartition_for_compute(embeddings)
    vec_d = F.col(vec_col).cast("array<double>")
    return embeddings.select(
        F.col(id_col),
        vec_d.alias("__v"),
        _nearest_centroid_col(vec_d, centroids).alias("cluster"),
    )


def ivf_write_index(
    embeddings: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF index partitioned by `cluster` — the at-rest
    layout that turns a probe's cluster filter into PARTITION PRUNING
    (only the probed cells' files are listed/read; plan-gated in
    tests). Rebuild-on-refit: the index is derived data. The centroid
    MODEL (k x d floats — the other half a restarted prober needs)
    lands beside it as `_MODEL.json`, so `ivf_load_model` +
    `ivf_read_index` fully restore the ANN service with no session
    state."""
    ivf_assign(embeddings, centroids, id_col=id_col, vec_col=vec_col).withColumnRenamed(
        "__v", "v"
    ).write.mode("overwrite").partitionBy("cluster").parquet(path)
    ivf_save_model(centroids, path)


def ivf_save_model(centroids: list[list[float]], path: str) -> None:
    """Write the k x d centroid model as `_MODEL.json` under the index
    dir (driver-side: the model IS driver-sized by construction)."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_MODEL.json"), "w") as fh:
        json.dump(centroids, fh)


def ivf_load_model(path: str) -> list[list[float]]:
    """Centroid model back from `_MODEL.json`; raises FileNotFoundError
    if the index was written before model persistence existed —
    rebuild with ivf_write_index."""
    import json
    import os

    with open(os.path.join(path, "_MODEL.json")) as fh:
        return json.load(fh)


def ivf_read_index(spark, path: str) -> DataFrame:
    """(id, v, cluster) back from the partitioned store; cluster
    filters prune partitions at the source."""
    return spark.read.parquet(path).withColumnRenamed("v", "__v")


def cosine_topk_ivf_probe(
    index: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "__v",
) -> DataFrame:
    """Probe a prebuilt IVF index (the fit-once-query-many hot path):
    pick the `n_probe` cells whose centroids are nearest the query
    (driver-side on the k×d model — no data touched), filter the
    index to those cells (partition pruning when the index is stored
    partitioned by `cluster`), exact cosine rerank inside."""
    if not centroids:
        return index.sparkSession.createDataFrame([], f"{id_col} long, cosine double")
    ranked = sorted(
        range(len(centroids)),
        key=lambda c: (
            sum((a - b) * (a - b) for a, b in zip(query_vec, centroids[c])),
            c,
        ),
    )
    probe = ranked[:n_probe]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        index.filter(F.col("cluster").isin(probe))
        .select(F.col(id_col), cosine_sim_col(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def cosine_topk_ivf(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN top-k from raw embeddings: fit (unless a prefit
    `centroids` model is passed), assign, probe. Convenience wrapper
    over ivf_fit_centroids + ivf_assign + cosine_topk_ivf_probe."""
    if centroids is None:
        centroids = ivf_fit_centroids(
            embeddings, n_centroids, iters, id_col=id_col, vec_col=vec_col
        )
    if not centroids:
        return embeddings.sparkSession.createDataFrame([], f"{id_col} long, cosine double")
    indexed = ivf_assign(embeddings, centroids, id_col=id_col, vec_col=vec_col)
    return cosine_topk_ivf_probe(
        indexed, centroids, query_vec, k=k, n_probe=n_probe, id_col=id_col
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
    # stage the double-cast as a named column (q52's staging note:
    # an inline cast inside the interpreted per-plane folds re-runs
    # once per plane), then bucket via the single-parse str path.
    # A small embeddings table often lands in ONE parquet split, which
    # would run the per-row interpreted plane folds on a single core —
    # fan the scan out first (no-op on multi-split data; bucket/norm
    # are per-row, so the result is order-independent).
    from data_warehouse_nhom8_spark.session import repartition_if_split_starved

    staged = repartition_if_split_starved(
        embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
    )
    # per-vector norm computed ONCE before the self-join (each side's
    # fold runs n_rows times instead of n_pairs times; bit-identical —
    # the pair denominator is the same sqrt-of-fold product either way)
    from data_warehouse_nhom8_spark.session import memo_expr

    b = staged.select(
        "id",
        "v",
        hyperplane_bucket_col("v", planes).alias("bucket"),
        memo_expr("sqrt(aggregate(v, 0.0D, (acc, w) -> acc + w * w)) AS nrm"),
    )
    x, y = b.alias("x"), b.alias("y")
    cand = x.join(
        y, (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.id") < F.col("y.id"))
    )
    # the verify projection as one memoized parse (r16 build-cost rule;
    # same fold/when operators as the Column twin, oracle-pinned)
    return (
        cand.select(
            memo_expr("x.id AS id_a"),
            memo_expr("y.id AS id_b"),
            memo_expr(
                "round(CASE WHEN x.nrm * y.nrm > 0 THEN "
                "aggregate(zip_with(x.v, y.v, (p, q) -> p * q), 0.0D, "
                "(acc, w) -> acc + w) / (x.nrm * y.nrm) "
                "ELSE 0.0D END, 6) AS cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


def label_centroid_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label centroid statistics over a vector column: vector
    count, mean squared norm E||x||², squared centroid norm ||μ||²,
    and dispersion E||x||² − ||μ||² (total within-cluster variance —
    the k-means objective per label). The embedding-quality report a
    training pipeline runs per source/label shard.

    Determinism contract (bit-identical to the SQL twin): every
    cross-row sum is staged through DECIMAL — per-(label, dim) the
    component and component² sums are exact decimal folds of values
    that are themselves exact (float→double widening, one double
    multiply); the per-label reductions over dims are again decimal.
    The only IEEE ops are one divide per dim, one multiply per dim,
    and the final subtraction — identical operand bits on any engine,
    any row order, any partitioning.

    Scale notes: one posexplode pass (rows × dim) feeding two
    partial-aggregation levels — (label, dim) then (label); both
    map-side combine, and the second level's input is label-cardinality
    × dim (dim-sized). No window, no driver math.
    """
    dec = "decimal(28,12)"
    ex = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x"),
    )
    per_dim = ex.groupBy("label", "pos").agg(
        F.sum(F.col("x").cast(dec)).alias("s1"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("s2"),
        F.count(F.lit(1)).alias("c"),
        F.count("x").alias("nn"),  # non-null elements
    )
    mu = F.col("s1").cast("double") / F.col("c")
    per_label = per_dim.groupBy("label").agg(
        F.max("c").alias("__cmax"),
        F.min("c").alias("__cmin"),
        F.min("nn").alias("__nnmin"),
        F.sum("s2").cast("double").alias("__sumsq"),
        F.sum((mu * mu).cast(dec)).cast("double").alias("centroid_norm2"),
    )
    # ragged arrays (per-dim counts differ) or NULL elements (non-null
    # count < row count) would silently bias every statistic — fail at
    # execution instead (raise_error lives inside the n_vectors output
    # expression so column pruning can never drop the check)
    n_vectors = F.when(
        (F.col("__cmin") != F.col("__cmax")) | (F.col("__nnmin") != F.col("__cmax")),
        F.raise_error(
            F.concat(
                F.lit("label_centroid_stats: ragged vectors or NULL elements "
                      "in label "),
                F.col("label").cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.col("__cmax"))
    per_label = per_label.withColumn("n_vectors", n_vectors)
    mean_sq = F.col("__sumsq") / F.col("n_vectors")
    return per_label.select(
        "label",
        "n_vectors",
        mean_sq.alias("mean_sq_norm"),
        "centroid_norm2",
        (mean_sq - F.col("centroid_norm2")).alias("dispersion"),
    ).orderBy("label")


# --------------------------------------------------- product quantization
#
# The memory tier of ANN (round 8): PQ splits each d-dim vector into m
# subvectors and stores only the nearest sub-centroid CODE per
# subspace — a d-float vector becomes m small ints (d=64 float32 →
# m=8 bytes: 32x). Queries scan codes with an ADC lookup table built
# once per query on the driver — the scan itself is a pure-codegen
# literal-array expression, no shuffle, no Python. At 100 TB this is
# what makes an in-memory rerank tier possible at all (the raw
# vectors stay on disk for final reranking); composes with IVF
# (cluster-prune first, ADC inside the probed cells).


def pq_fit(
    embeddings: DataFrame,
    m: int = 8,
    ks: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train per-subspace codebooks with ONE JOINT deterministic
    Lloyd's loop over all m subspaces — 2 distributed jobs per
    iteration TOTAL (assignment + means), not per subspace (a naive
    per-subspace loop pays 2·m·iters jobs; measured 17.8 → ~4 s at
    the bench fit). Same determinism contract as `ivf_fit_centroids`:
    hash init on (id, subspace), codegen assignment via the
    ||c||² − 2·x·c posexplode/broadcast-join shape, driver holds only
    the m·ks·(d/m) model. Returns codebooks[j][code] = sub-centroid.

    d must be divisible by m (fail loud — silent padding would change
    distances)."""
    spark = embeddings.sparkSession
    from data_warehouse_nhom8_spark.session import repartition_for_compute

    first = embeddings.select(F.size(vec_col).alias("d")).first()
    if first is None:
        return []
    d = first["d"]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    base = repartition_for_compute(
        embeddings.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
    ).localCheckpoint(eager=True)
    ex = base.select(
        "__id", F.posexplode("__v").alias("__p", "__x")
    ).select(
        "__id",
        (F.col("__p") / dsub).cast("int").alias("__j"),
        (F.col("__p") % dsub).alias("__sp"),
        "__x",
    )

    def means_of(assign: DataFrame) -> dict[tuple[int, int], list[float]]:
        # (j, c) -> sub-centroid; m*ks*dsub rows — model-sized collect
        rows = (
            assign.join(ex, ["__id", "__j"])
            .groupBy("__j", "__c", "__sp")
            .agg(F.avg("__x").alias("__m"))
            .collect()
        )
        out: dict[tuple[int, int], dict[int, float]] = {}
        for r in rows:
            out.setdefault((r["__j"], r["__c"]), {})[r["__sp"]] = r["__m"]
        return {k: [v[p] for p in sorted(v)] for k, v in out.items()}

    subspaces = F.explode(F.array(*[F.lit(j) for j in range(m)])).alias("__j")
    init_assign = base.select("__id", subspaces).withColumn(
        "__c",
        F.pmod(
            F.xxhash64(F.concat_ws("_", F.col("__id").cast("string"), "__j")),
            F.lit(ks),
        ).cast("int"),
    )
    init = means_of(init_assign)
    if not init:
        return []
    books = [
        [init.get((j, c), [0.0] * dsub) for c in range(ks)] for j in range(m)
    ]
    for _ in range(iters):
        book_df = spark.createDataFrame(
            [
                (j, c, sp, float(v))
                for j, book in enumerate(books)
                for c, vec in enumerate(book)
                for sp, v in enumerate(vec)
            ],
            "__j int, __c int, __sp int, __cv double",
        )
        cn2_lit = F.array(
            *[
                F.array(
                    *[F.lit(float(sum(v * v for v in vec))) for vec in book]
                )
                for book in books
            ]
        )
        dots = (
            ex.join(F.broadcast(book_df), ["__j", "__sp"])
            .groupBy("__id", "__j", "__c")
            .agg(F.sum(F.col("__x") * F.col("__cv")).alias("__dot"))
        )
        score = (
            F.element_at(
                F.element_at(cn2_lit, F.col("__j") + 1), F.col("__c") + 1
            )
            - 2 * F.col("__dot")
        )
        assign = dots.groupBy("__id", "__j").agg(
            F.min_by("__c", F.struct(score.alias("s"), F.col("__c"))).alias("__c")
        )
        got = means_of(assign)
        books = [
            [got.get((j, c), books[j][c]) for c in range(ks)] for j in range(m)
        ]
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — nearest sub-centroid per subspace.

    Codegen shape (same trick as the IVF assignment): posexplode the
    vector, map each position to (subspace, sub-position), broadcast-
    join the flattened codebook long table, partial-agg the dots, and
    min_by the ||c||²−2·x·c score per (id, subspace). Shuffles n·m·ks
    dot partials — the standard PQ encode cost — and never leaves the
    JVM."""
    spark = embeddings.sparkSession
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    ex = embeddings.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("__p", "__x"),
    ).select(
        "__id",
        (F.col("__p") / dsub).cast("int").alias("__j"),
        (F.col("__p") % dsub).alias("__sp"),
        "__x",
    )
    book_rows = [
        (j, c, sp, float(v))
        for j, book in enumerate(codebooks)
        for c, vec in enumerate(book)
        for sp, v in enumerate(vec)
    ]
    book_df = spark.createDataFrame(
        book_rows, "__j int, __c int, __sp int, __cv double"
    )
    cn2 = [
        [sum(v * v for v in vec) for vec in book] for book in codebooks
    ]
    cn2_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in cn2]
    )
    dots = (
        ex.join(F.broadcast(book_df), ["__j", "__sp"])
        .groupBy("__id", "__j", "__c")
        .agg(F.sum(F.col("__x") * F.col("__cv")).alias("__dot"))
    )
    score = (
        F.element_at(F.element_at(cn2_lit, F.col("__j") + 1), F.col("__c") + 1)
        - 2 * F.col("__dot")
    )
    best = dots.groupBy("__id", "__j").agg(
        F.min_by("__c", F.struct(score.alias("s"), F.col("__c"))).alias("__c")
    )
    return (
        best.groupBy("__id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__j"), F.col("__c")))
                ),
                lambda s: s["__c"],
            ).alias("codes")
        )
        .select(F.col("__id").alias(id_col), "codes")
    )


def pq_topk_adc(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the per-subspace
    lookup table LUT[j][c] = ||q_j − codebook[j][c]||² is built on the
    driver (m·ks floats), then the scan scores each row as
    Σ_j LUT[j][codes[j]] — m literal `element_at`s, whole-stage
    codegen, map-only, TakeOrderedAndProject head. Approximate by
    construction; rerank survivors on raw vectors when exactness
    matters."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    lut = []
    for j, book in enumerate(codebooks):
        qj = query_vec[j * dsub : (j + 1) * dsub]
        lut.append(
            [sum((a - b) * (a - b) for a, b in zip(qj, vec)) for vec in book]
        )
    score = None
    for j in range(m):
        term = F.element_at(
            F.array(*[F.lit(float(x)) for x in lut[j]]),
            F.element_at(F.col("codes"), j + 1) + 1,
        )
        score = term if score is None else score + term
    return (
        codes_df.select(F.col(id_col), score.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.col(id_col))
        .limit(k)
    )


def pq_save_model(codebooks: list[list[list[float]]], path: str) -> None:
    """Persist the codebooks as JSON beside the codes table (the
    `_MODEL.json` convention the IVF index uses)."""
    import json
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump({"codebooks": codebooks}, fh)


def pq_load_model(path: str) -> list[list[list[float]]]:
    import json

    with open(path) as fh:
        return json.load(fh)["codebooks"]
