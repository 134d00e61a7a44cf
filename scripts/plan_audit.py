"""Generate PLANS.md: physical-plan evidence for the headline queries.

Usage: python scripts/plan_audit.py [sf_dir]

For each audited query: the executed plan's load-bearing properties
(broadcasts, join strategies, pushed filters, scan counts, partial
aggregation, window frames) plus the full formatted plan — the
artifact a reviewer reads next to SCALE_NOTES.md to check that the
100 TB story is actually in the plan, not just the docstrings.
Regenerate after plan-affecting changes; tests/test_plans.py is the
enforcement, this file is the readable evidence.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIT = [
    # r14 (verdict task 4): the expensive extension plans join the
    # audited set — three of the six most expensive warm queries
    # (q42/q98/q118) plus the r13-promoted q41 were outside it
    "q41_embedding_neardup",
    "q42_multimodal_features",
    "q98_embedding_centroids",
    "q118_semantic_dedup",
    "q39_simhash_neardup",
    "q38_minhash_neardup",
    "q53_incremental_neardup",
    "q119_ngram_repetition",
    "q49_cluster_dedup",
    "q46_pricing_summary",
    "q47_shipping_priority",
    "q48_local_supplier_volume",
    "q71_late_shipment_priority",
    "q73_large_volume_customer",
    "q74_top_supplier",
    "q77_returned_item_revenue",
    "q57_decontamination",
    "q59_stratified_sample",
    "q61_range_join",
    "q66_vocab_topk",
    "q78_freq_head_rollup",
    "q82_revenue_share",
    "q83_gap_filled_daily",
    "q87_volume_shipping",
    "q90_customer_order_distribution",
    "q92_disjunctive_predicate_revenue",
    "q93_waiting_supplier",
    "q94_sequence_packing",
    "q95_tfidf_topterms",
    "q99_unigram_surprisal",
    "q100_source_cap",
    "q101_min_cost_supplier",
    "q102_important_stock",
    "q103_product_profit",
    "q104_supplier_part_count",
    "q105_excess_inventory",
    "q109_pq_topk_noracle",
    "q110_span_dedup",
    "q111_url_dedup_cap",
    "q112_contamination_fraction",
    "q114_scd2_as_of",
    "q115_scd2_temporal_join",
    "q116_decontaminate_scrub",
    "q117_html_extract",
]

_FEATURES = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "LeftSemi",
    "LeftAnti",
    "TakeOrderedAndProject",
    "WindowGroupLimit",
    "Expand",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "partial_count",
    "partial_sum",
]


# Queries whose audited plan is a memo READ (Scan ExistingRDD over the
# localCheckpointed store cache) — the heavy compute lives in the FIT
# plans section below (VERDICT r14 task 3: the audit must not lose the
# store builds the moment they move behind a memo).
_MEMO_READS = {
    "q39_simhash_neardup": "simhash signature fold",
    "q49_cluster_dedup": "connected-components round + exact-Jaccard pairs",
    "q118_semantic_dedup": "connected-components round (hyperplane edges)",
    "q38_minhash_neardup": "MinHash signatures + band histogram",
}

# Free-form per-query notes for plans that are neither pure memo
# reads nor pure live compute.
_EXTRA_NOTES = {
    "q53_incremental_neardup": (
        "HYBRID plan: the daily batch is shingled/signatured live; "
        "the corpus side joins the persisted corpus_sig_store tiers "
        "(each Scan ExistingRDD = a store tier's session cache). The "
        "corpus-side build is the \"MinHash signatures + band "
        "histogram\" fit plan below — corpus_sig_store_persist writes "
        "those stages at rest."
    ),
}


def _fit_plans(spark, sf_dir: str) -> list[tuple[str, str, "object"]]:
    """(title, note, DataFrame) for each store-build pipeline hidden
    behind a session memo: the plans `store_fit_sec` prices. These are
    the builds themselves, constructed OUTSIDE the memo so the audit
    sees the real fit plan, not the cached read."""
    from pyspark.sql import functions as F

    from data_warehouse_nhom8_spark.operators import neardup
    from data_warehouse_nhom8_spark.operators.corpus import _gram_digests
    from data_warehouse_nhom8_spark.operators.dedup_clusters import (
        _propagation_round,
    )
    from data_warehouse_nhom8_spark.sources import Catalog

    c = Catalog(spark, sf_dir)
    plans = []
    plans.append((
        "fit: simhash signature fold (simhash_sigs store build)",
        "single parquet scan, map-only SWAR packed fold — no shuffle, "
        "no explode; serves q39 via the persisted sig store",
        neardup.simhash_signatures(c.documents),
    ))
    bench = c.documents.filter(F.col("doc_id") % 97 == 0)
    plans.append((
        "fit: benchmark gram digest (bench_grams store build)",
        "doc_id-pruned scan -> gram explode -> partial-agg distinct; "
        "the digest then BROADCASTS into q57/q112/q116's semi-joins "
        "(their audited plans above)",
        _gram_digests(bench, "doc_id", "text", 4).select("gram").distinct(),
    ))
    pairs = neardup.ngram_jaccard_pairs_exact(
        c.documents, threshold=0.8, shingle_w=5, max_shingle_df=None
    ).localCheckpoint(eager=True)
    edges = (
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .unionByName(
            pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    sig_sets = neardup.minhash_signature_sets(c.documents, shingle_w=5)
    mh_bands = neardup._band_table(sig_sets.select("id", "sig"), 64, 8)
    plans.append((
        "fit: MinHash signatures + band histogram (corpus_sig_store build)",
        "ONE scan -> shingle windows -> md5 64-bit lanes -> per-row "
        "array-fold signatures (map-only — the 64 MINs fold over each "
        "doc's hash array, no aggregate shuffle; DuckDB's twin uses "
        "MIN aggregates, the engine does not need to) -> band explode "
        "-> partial-agg bucket histogram (the <=200 skew cap's "
        "input); these are the signature/band/histogram/sets stages "
        "corpus_sig_store_persist writes at rest, serving q38's pair "
        "memo and q53's incremental probe",
        mh_bands.groupBy("band", "bhash").agg(
            F.count(F.lit(1)).alias("__bn")
        ),
    ))
    plans.append((
        "fit: connected-components propagation round (cluster_map_store)",
        "ONE round of the min-label loop (rounds = graph diameter, "
        "each round localCheckpoints): vertex-id equi-join + "
        "partial-agg min + left join-back — 0 CartesianProduct; "
        "serves q49/q118 via the persisted cluster map store",
        _propagation_round(edges, labels),
    ))
    return plans


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from data_warehouse_nhom8_spark.plans import QUERIES
    from data_warehouse_nhom8_spark.session import get_spark

    spark = get_spark("plan_audit")
    out = [
        "# PLANS — physical-plan evidence (generated by scripts/plan_audit.py)",
        "",
        f"Source: `{sf_dir}`. Regenerate with `python scripts/plan_audit.py`.",
        "The binding contract is tests/test_plans.py; this file is the",
        "readable companion for plan review (see SCALE_NOTES.md for the",
        "per-operator 100 TB rationale).",
        "",
    ]
    for name in AUDIT:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        feats = []
        for pat in _FEATURES:
            n = len(re.findall(re.escape(pat), plan))
            if n:
                feats.append(f"{pat}×{n}")
        scans = len(re.findall(r"FileScan parquet", plan))
        pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
        interesting = [p for p in pushed if p != "PushedFilters: []"]
        out.append(f"## {name}")
        out.append("")
        if name in _MEMO_READS:
            out.append(
                f"- NOTE: memo READ (Scan ExistingRDD over the persisted "
                f"store's session cache) — the heavy compute is the "
                f"\"{_MEMO_READS[name]}\" fit plan in the FIT PLANS "
                f"section below"
            )
        if name in _EXTRA_NOTES:
            out.append(f"- NOTE: {_EXTRA_NOTES[name]}")
        out.append(f"- operators: {', '.join(feats) or '(scan/project only)'}")
        out.append(f"- parquet scans: {scans}")
        for p in interesting[:4]:
            out.append(f"- {p}")
        out.append("")
        out.append("```")
        out.append(plan.strip()[:4000])
        out.append("```")
        out.append("")
    out.append("# FIT PLANS — store builds behind the session memos")
    out.append("")
    out.append(
        "The compute `store_fit_sec` prices (VERDICT r14 task 3): the "
        "plans below build the persisted stores whose READS the memoized "
        "queries above scan. Gated by tests/test_plans.py's fit-plan "
        "assertions."
    )
    out.append("")
    n_fit = 0
    for title, note, df in _fit_plans(spark, sf_dir):
        plan = df._jdf.queryExecution().executedPlan().toString()
        feats = []
        for pat in _FEATURES:
            n = len(re.findall(re.escape(pat), plan))
            if n:
                feats.append(f"{pat}×{n}")
        out.append(f"## {title}")
        out.append("")
        out.append(f"- {note}")
        out.append(f"- operators: {', '.join(feats) or '(scan/project only)'}")
        out.append("")
        out.append("```")
        out.append(plan.strip()[:4000])
        out.append("```")
        out.append("")
        n_fit += 1
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"PLANS.md written ({len(AUDIT)} queries + {n_fit} fit plans)")


if __name__ == "__main__":
    main()
