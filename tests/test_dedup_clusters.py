"""Connected-components dedup clustering: transitive closure,
canonical selection, end-to-end with the MinHash detector."""

from __future__ import annotations

from data_warehouse_nhom8_spark.operators import neardup
from data_warehouse_nhom8_spark.operators.dedup_clusters import (
    connected_components,
    dedup_keep_canonical,
)


def test_transitive_closure(spark):
    # chain 1-2-3-4 (diameter 3), pair (10,11), singleton 99 not in pairs
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # a 12-node path needs multiple propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert set(comp.values()) == {0}


def test_nonconvergence_raises(spark):
    """A diameter-25 path cannot converge in 3 rounds — the operator
    must refuse to return truncated (split) components silently."""
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(25)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=3)


def test_dedup_keep_canonical(spark):
    df = spark.createDataFrame([(i, f"d{i}") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 3), (3, 5)], "id_a long, id_b long")
    kept = sorted(r["doc_id"] for r in dedup_keep_canonical(df, pairs).collect())
    assert kept == [0, 1, 2, 4]  # cluster {1,3,5} -> keep 1


def test_cluster_dedup_with_minhash_detector(spark):
    base = ("spark engine rebuilds the warehouse pipeline with catalyst plans "
            "and parquet storage for scale " * 3)
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base + "extra tail"),          # ~dup of 0
            (2, base.replace("scale", "speed")),  # ~dup of 0 (and of 1 transitively)
            (3, "entirely different text about cats and pianos and rainfall today"),
        ],
        "doc_id long, text string",
    )
    pairs = neardup.minhash_neardup_pairs(docs, threshold=0.5)
    deduped = sorted(r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect())
    assert deduped == [0, 3]  # one canonical survivor per cluster + the outlier


def test_semantic_dedup_scrub_matches_local_union_find(spark):
    """q118's composition (embedding near-dup edges -> components ->
    non-canonical scrub list) equals a local union-find over the
    operator's OWN pair set at the driver's gate scale, and planted
    duplicate vectors land in one cluster with exactly one survivor."""
    from data_warehouse_nhom8_spark.operators import similarity
    from data_warehouse_nhom8_spark.plans.extensions import (
        _LSH_DIM,
        _LSH_PLANES,
        q118_semantic_dedup,
    )
    from tests.conftest import SF_DIR

    got = {
        (r["vec_id"], r["component"])
        for r in q118_semantic_dedup(spark, SF_DIR).collect()
    }

    # independent ground truth: union-find over the same edges
    from data_warehouse_nhom8_spark.sources import Catalog

    c = Catalog(spark, SF_DIR)
    edges = [
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_neardup_pairs(
            c.embeddings, threshold=-1.0, dim=_LSH_DIM, n_planes=_LSH_PLANES
        ).collect()
    ]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # min-id canonical per set, scrub = every non-canonical member
    want = {(v, find(v)) for v in parent if v != find(v)}
    assert got == want and got, (len(got), len(want))

    # planted near-identical vectors: one cluster, one survivor
    import random

    rnd = random.Random(7)
    base = [rnd.uniform(-1, 1) for _ in range(16)]
    rows = [(i, [x + i * 1e-4 for x in base]) for i in range(3)]  # dup group
    rows += [
        (10 + i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = similarity.embedding_neardup_pairs(df, threshold=0.99, dim=16)
    comp = connected_components(pairs, "id_a", "id_b")
    scrub = {r["id"] for r in comp.filter("id != component").collect()}
    assert scrub == {1, 2}, scrub  # 0 is the canonical survivor
