"""q119 `ngram_repetition_stats` — the n-gram tier of the Gopher
repetition filter (top-n-gram token fraction + duplicated-n-gram span
coverage per doc).

The synthetic corpus holds zero within-doc duplicated 5-grams
(measured at every SF; the declared q119 runs dup_w=3 so its oracle
comparison is non-degenerate), so the 5-gram default's behavior is
pinned here on planted documents: hand-computed coverage, adjacency
merging through the span fold, the whole-doc fallback-window guard,
and the q65 empty-text edge convention.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.operators.text import ngram_repetition_stats


def _run(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = ngram_repetition_stats(df, **kw).orderBy("doc_id").collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_hand_computed_top_and_dup(spark):
    got = _run(
        spark,
        [
            # ten tokens, 5-gram "x y z w v" at pos 0 and pos 5:
            # positions merge (5 <= 0+5) into one span [0, 10) -> full
            # coverage; top bigram "v x" ... every bigram occurs once
            # except "x y", "y z", "z w", "w v" (twice each) -> top 2
            "x y z w v x y z w v",
            # alternating pair: bigram "a b" occurs 3x in 6 tokens ->
            # top fraction min(1, 3*2/6) = 1.0; no repeated 5-gram
            "a b a b a b",
            # no repetition at all
            "one two three four five six",
        ],
    )
    d0 = got[0]
    assert d0["n_tokens"] == 10
    assert d0["top_ngram_freq"] == 2
    assert d0["top_ngram_fraction"] == pytest.approx(0.4)
    assert d0["dup_ngram_tokens"] == 10
    assert d0["dup_ngram_spans"] == 1
    assert d0["dup_ngram_fraction"] == pytest.approx(1.0)

    d1 = got[1]
    assert d1["n_tokens"] == 6
    assert d1["top_ngram_freq"] == 3
    assert d1["top_ngram_fraction"] == pytest.approx(1.0)  # clamped
    assert d1["dup_ngram_tokens"] == 0 and d1["dup_ngram_spans"] == 0

    d2 = got[2]
    assert d2["top_ngram_freq"] == 1
    assert d2["top_ngram_fraction"] == pytest.approx(2 / 6, abs=1e-6)
    assert d2["dup_ngram_fraction"] == 0.0


def test_disjoint_spans_stay_separate(spark):
    # "p q r s t" repeats at pos 0 and pos 7 (gap 7 > 5): two spans,
    # each 5 tokens -> coverage 10 of 12
    got = _run(spark, ["p q r s t gap1 gap2 p q r s t"])
    d = got[0]
    assert d["n_tokens"] == 12
    assert d["dup_ngram_spans"] == 2
    assert d["dup_ngram_tokens"] == 10
    assert d["dup_ngram_fraction"] == pytest.approx(round(10 / 12, 6))


def test_short_doc_fallback_window_guard(spark):
    # below top_w: the whole-doc fallback window is not a real gram
    got = _run(spark, ["solo", "two tokens"])
    assert got[0]["n_tokens"] == 1
    assert got[0]["top_ngram_freq"] == 0
    assert got[0]["top_ngram_fraction"] == 0.0
    assert got[0]["dup_ngram_tokens"] == 0
    assert got[1]["top_ngram_freq"] == 1
    assert got[1]["top_ngram_fraction"] == pytest.approx(1.0)


def test_empty_trim_text_edge(spark):
    # the q65 repetition_stats convention: empty-trim text splits to
    # one empty token
    got = _run(spark, ["   "])
    d = got[0]
    assert d["n_tokens"] == 1
    assert d["top_ngram_freq"] == 0 and d["top_ngram_fraction"] == 0.0
    assert d["dup_ngram_tokens"] == 0 and d["dup_ngram_fraction"] == 0.0


def test_total_over_corpus_and_types(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = ngram_repetition_stats(docs, dup_w=3)
    assert out.count() == docs.filter(F.col("text").isNotNull()).count()
    types = dict(out.dtypes)
    assert types == {
        "doc_id": "bigint",
        "n_tokens": "int",
        "top_ngram_freq": "bigint",
        "top_ngram_fraction": "double",
        "dup_ngram_tokens": "bigint",
        "dup_ngram_spans": "bigint",
        "dup_ngram_fraction": "double",
    }
    # fractions bounded; coverage clamped at doc end
    bad = out.filter(
        (F.col("top_ngram_fraction") < 0)
        | (F.col("top_ngram_fraction") > 1)
        | (F.col("dup_ngram_fraction") < 0)
        | (F.col("dup_ngram_fraction") > 1)
        | (F.col("dup_ngram_tokens") > F.col("n_tokens"))
    ).count()
    assert bad == 0


def test_oracle_twin_matches_at_gate_scale(spark, duck):
    """The declared q119 against its generated DuckDB twin at the
    suite's SF — the same comparison the driver runs at sf0.01."""
    from data_warehouse_nhom8_spark.plans import ORACLES, QUERIES
    from tests.conftest import SF_DIR, assert_matches_oracle

    sdf = QUERIES["q119_ngram_repetition"](spark, SF_DIR)
    assert_matches_oracle(sdf, duck, ORACLES["q119_ngram_repetition"])
