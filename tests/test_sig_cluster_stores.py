"""At-rest faces of the SimHash signature table and the duplicate
cluster maps (VERDICT r14 task 1): build/open/update + epoch-append
streaming face + compaction, the corpus_sig_store pattern. These
stores back q39/q49/q118's session memos since r15 — the memo is a
cache of the store, not the store itself — so every face gets the
incremental==full / stream==batch / compaction-preserves equalities
pinned here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.streaming import jobs
from data_warehouse_nhom8_spark.streaming.jobs import (
    cluster_edges_sink,
    cluster_map_store_build,
    cluster_map_store_merge,
    cluster_map_store_update,
    compact_cluster_map_store,
    compact_simhash_sig_store,
    read_cluster_map_store,
    read_simhash_sig_store,
    simhash_sig_store_build,
    simhash_sig_store_merge,
    simhash_sig_store_sink,
    simhash_sig_store_update,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "completely different content about spark engines"),
    (4, "another unrelated document with its own words"),
    (5, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (6, None),  # NULL text → signature 0
]
SCHEMA = "doc_id long, text string"


def _sig_map(df):
    return {r["id"]: r["sh"] for r in df.collect()}


def _full_sigs(spark, rows):
    from data_warehouse_nhom8_spark.operators.neardup import simhash_signatures

    return _sig_map(simhash_signatures(spark.createDataFrame(rows, SCHEMA)))


# ------------------------------------------------------------- simhash

def test_simhash_store_incremental_equals_full(spark, tmp_path):
    """Base build on the corpus + O(batch) update on the delta reads
    back exactly the signatures of a full one-shot run."""
    base_rows, batch_rows = DOCS[:4], DOCS[4:]
    store = str(tmp_path / "sigs")
    simhash_sig_store_build(spark.createDataFrame(base_rows, SCHEMA), store)
    simhash_sig_store_update(
        spark.createDataFrame(batch_rows, SCHEMA), store, 1
    )
    got = _sig_map(read_simhash_sig_store(spark, store))
    assert got == _full_sigs(spark, DOCS)


def test_simhash_store_streaming_equals_batch_and_replay(spark, tmp_path):
    """Micro-batches through the sink == batch build+update; a
    replayed epoch converges (epoch replacement); a re-ingested id at
    a later epoch supersedes (LWW update semantics)."""
    b1 = spark.createDataFrame(DOCS[:4], SCHEMA)
    b2 = spark.createDataFrame(DOCS[4:], SCHEMA)
    src = tmp_path / "docs"
    b1.write.parquet(str(src / "f1"))
    store = str(tmp_path / "sigs")

    def drain():
        stream = jobs.stream_source(spark, str(src / "*"), b1.schema)
        q = (
            simhash_sig_store_sink(stream, store, str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    b2.write.parquet(str(src / "f2"))
    drain()
    want = _full_sigs(spark, DOCS)
    assert _sig_map(read_simhash_sig_store(spark, store)) == want

    # replay: re-drive epoch 1's merge — store unchanged
    simhash_sig_store_merge(store)(b2, 1)
    assert _sig_map(read_simhash_sig_store(spark, store)) == want

    # LWW: doc 3 re-ingested with doc 1's text at a later epoch
    simhash_sig_store_update(
        spark.createDataFrame([(3, DOCS[0][1])], SCHEMA), store, 2
    )
    got = _sig_map(read_simhash_sig_store(spark, store))
    assert got[3] == want[1]
    assert {k: v for k, v in got.items() if k != 3} == {
        k: v for k, v in want.items() if k != 3
    }


def test_simhash_store_compaction_preserves_read(spark, tmp_path):
    """Compaction folds the epochs into a bucketed LWW-resolved base:
    identical read before/after, epoch dirs gone, and a post-compact
    update still lands (the fold watermark only refuses REPLAYS of
    folded epochs)."""
    from data_warehouse_nhom8_spark.sources.snapshots import epoch_ids

    store = str(tmp_path / "sigs")
    simhash_sig_store_build(spark.createDataFrame(DOCS[:4], SCHEMA), store)
    simhash_sig_store_update(
        spark.createDataFrame(DOCS[4:], SCHEMA), store, 1
    )
    before = _sig_map(read_simhash_sig_store(spark, store))
    compact_simhash_sig_store(spark, store)
    assert epoch_ids(store) == []
    assert _sig_map(read_simhash_sig_store(spark, store)) == before

    simhash_sig_store_update(
        spark.createDataFrame([(7, "fresh post compaction text")], SCHEMA),
        store,
        2,
    )
    got = _sig_map(read_simhash_sig_store(spark, store))
    assert set(got) == set(before) | {7}


def test_q39_pairs_served_from_store_match_direct(spark, tmp_path):
    """The serve path bench uses since r15: blocking+verify over the
    OPENED store reproduces the one-shot detector exactly."""
    from data_warehouse_nhom8_spark.operators.neardup import (
        simhash_neardup_pairs,
        simhash_pairs_from_signatures,
    )

    docs = spark.createDataFrame(DOCS, SCHEMA)
    store = str(tmp_path / "sigs")
    simhash_sig_store_build(docs, store)
    via_store = sorted(
        tuple(r) for r in simhash_pairs_from_signatures(
            read_simhash_sig_store(spark, store), max_hamming=3
        ).collect()
    )
    direct = sorted(
        tuple(r) for r in simhash_neardup_pairs(docs, max_hamming=3).collect()
    )
    assert via_store == direct
    assert via_store  # the planted dup/near-dup pairs must show up


# --------------------------------------------------------- cluster map

EDGES = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)]
EDGE_SCHEMA = "id_a long, id_b long"


def _cc_map(df):
    return {r["id"]: r["component"] for r in df.collect()}


def _full_cc(spark, edges):
    from data_warehouse_nhom8_spark.operators.dedup_clusters import (
        connected_components,
    )

    return _cc_map(
        connected_components(spark.createDataFrame(edges, EDGE_SCHEMA))
    )


def test_cluster_store_incremental_equals_full(spark, tmp_path):
    """CC(base edges ∪ epoch edges) == CC(all edges) — including an
    epoch edge that MERGES two previously-separate base clusters."""
    store = str(tmp_path / "cmap")
    cluster_map_store_build(
        spark.createDataFrame(EDGES[:4], EDGE_SCHEMA), store
    )
    # (21,22),(22,23) extend a base cluster; (3,10) merges {1,2,3}
    # with {10,11} — the hard incremental case
    cluster_map_store_update(
        spark.createDataFrame(EDGES[4:] + [(3, 10)], EDGE_SCHEMA), store, 1
    )
    assert _cc_map(read_cluster_map_store(spark, store)) == _full_cc(
        spark, EDGES + [(3, 10)]
    )


def test_cluster_store_streaming_equals_batch_and_replay(spark, tmp_path):
    b1 = spark.createDataFrame(EDGES[:3], EDGE_SCHEMA)
    b2 = spark.createDataFrame(EDGES[3:], EDGE_SCHEMA)
    src = tmp_path / "edges"
    b1.write.parquet(str(src / "f1"))
    store = str(tmp_path / "cmap")

    def drain():
        stream = jobs.stream_source(spark, str(src / "*"), b1.schema)
        q = (
            cluster_edges_sink(stream, store, str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    b2.write.parquet(str(src / "f2"))
    drain()
    want = _full_cc(spark, EDGES)
    assert _cc_map(read_cluster_map_store(spark, store)) == want

    cluster_map_store_merge(store)(b2, 1)  # replay converges
    assert _cc_map(read_cluster_map_store(spark, store)) == want


def test_cluster_store_compaction_contracts_to_stars(spark, tmp_path):
    """Compaction rewrites the base as one (member, root) star edge
    per clustered id — identical map before/after, epochs folded, and
    a post-compact edge that merges two compacted clusters still
    resolves to the min-id label (contraction preserves labels)."""
    from data_warehouse_nhom8_spark.sources.snapshots import (
        epoch_ids,
        snapshot_read,
    )

    store = str(tmp_path / "cmap")
    cluster_map_store_build(spark.createDataFrame(EDGES, EDGE_SCHEMA), store)
    want = _full_cc(spark, EDGES)
    compact_cluster_map_store(spark, store)
    assert epoch_ids(store) == []
    assert _cc_map(read_cluster_map_store(spark, store)) == want
    base = snapshot_read(spark, store)
    # star form: one edge per clustered id, id_b = its component root
    stars = {(r["id_a"], r["id_b"]) for r in base.collect()}
    assert stars == set(want.items())

    # merge two compacted clusters through a fresh epoch edge
    cluster_map_store_update(
        spark.createDataFrame([(11, 20)], EDGE_SCHEMA), store, 1
    )
    got = _cc_map(read_cluster_map_store(spark, store))
    assert got == _full_cc(spark, EDGES + [(11, 20)])
    # the merged cluster's label is the global min across both halves
    assert got[23] == 10


def test_corpus_sig_store_sets_policy_branches_agree(spark, monkeypatch):
    """The bench memo's sets-tier policy (r15): below the on-disk size
    threshold the probe serves the hash sets from a resident cache;
    above it, through the pruned ``sets_loader`` scan — the 100 TB
    contract. Bench scale only ever exercises the cached branch, so
    this pins the loader branch explicitly: both policies must produce
    identical pairs, and each branch must actually be the one taken
    (``sets_cached`` None vs populated)."""
    from data_warehouse_nhom8_spark.operators import neardup
    from data_warehouse_nhom8_spark.plans import extensions as ext

    sf_dir = "/root/testdata/sf0.001"
    c = ext.Catalog(spark, sf_dir)
    corpus = c.documents.filter(F.col("doc_id") % 10 != 0)
    batch = c.documents.filter(F.col("doc_id") % 10 == 0)
    # unique memo key (shingle_w=4) so this test never collides with
    # the bench-parameter store another test may have built
    params = dict(threshold=0.8, bands=8, shingle_w=4)
    key = ("corpus_sig_store", sf_dir, 0.8, 8, 4)

    def built_pairs():
        store = ext._shared_corpus_sig_store(spark, sf_dir, corpus, **params)
        kw = (
            {"corpus_sets": store["sets_cached"]}
            if store.get("sets_cached") is not None
            else {"corpus_sets_loader": store["sets_loader"]}
        )
        pairs = sorted(
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in neardup.minhash_incremental_pairs(
                batch,
                corpus,
                corpus_sigs=store["sigs"],
                threshold=0.8,
                bands=8,
                shingle_w=4,
                corpus_bands=store["bands"],
                corpus_band_sizes=store["sizes"],
                **kw,
            ).collect()
        )
        return store, pairs

    # loader branch: force the threshold to zero BEFORE the build
    monkeypatch.setattr(ext, "_SETS_CACHE_MAX_BYTES", 0)
    store_big, via_loader = built_pairs()
    assert store_big["sets_cached"] is None
    ext._memo(spark).pop(key)

    # cached branch: restore the real threshold, rebuild fresh
    monkeypatch.undo()
    store_small, via_cache = built_pairs()
    assert store_small["sets_cached"] is not None
    ext._memo(spark).pop(key)

    assert via_loader == via_cache
    # and both equal the from-scratch detector (no store at all)
    fresh = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in neardup.minhash_incremental_pairs(
            batch, corpus, threshold=0.8, bands=8, shingle_w=4
        ).collect()
    )
    assert via_loader == fresh and fresh
