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
