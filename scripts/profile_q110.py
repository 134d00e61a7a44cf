"""A/B experiment: q110 span-dedup plan shapes at sf0.1 (round 11).

Variants:
  A: current — groupBy(__h) count+count_distinct, join-back (gram x2)
  B: groupBy with min!=max distinct test instead of count_distinct
  C: single-pass window form — one shuffle of wins on __h, counts via
     window aggregates, filter, then positions->spans (gram x1)
"""
import sys, time

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.session import get_spark, repartition_if_split_starved
from data_warehouse_nhom8_spark.sources import Catalog
from data_warehouse_nhom8_spark.operators.span_dedup import (
    _positions_to_spans,
    _window_hashes,
    span_dedup_stats,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("profile_q110", shuffle_partitions=int(__import__("os").environ.get("PROF_SHUF","32")))
c = Catalog(spark, SF)
docs = c.documents
docs.count()

W = 12


def wins_of(d):
    return repartition_if_split_starved(d.select("doc_id", "text")).select(
        F.col("doc_id").alias("__id"),
        F.posexplode(_window_hashes("text", W)).alias("__pos", "__h"),
    )


def variant_a(d):
    return span_dedup_stats(d, window=W)


def variant_b(d):
    wins = wins_of(d)
    counts = wins.groupBy("__h").agg(
        F.count(F.lit(1)).alias("__n"),
        (F.min("__id") != F.max("__id")).alias("__multi"),
    )
    dup = counts.filter(F.col("__multi") & (F.col("__n") >= 2)).select("__h")
    hits = wins.join(dup, "__h").select("__id", "__pos")
    return _finish(d, _positions_to_spans(hits, W, "doc_id"))


def variant_c(d):
    wins = wins_of(d)
    w = Window.partitionBy("__h")
    hits = (
        wins.withColumn("__n", F.count(F.lit(1)).over(w))
        .withColumn("__multi", F.min("__id").over(w) != F.max("__id").over(w))
        .filter(F.col("__multi") & (F.col("__n") >= 2))
        .select("__id", "__pos")
    )
    return _finish(d, _positions_to_spans(hits, W, "doc_id"))


def _finish(d, spans):
    per_doc = spans.groupBy("doc_id").agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    toks = d.select(
        "doc_id",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("n_tokens"),
    )
    return (
        toks.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.least(F.coalesce("dup_tokens", F.lit(0)), F.col("n_tokens")).alias(
                "dup_tokens"
            ),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        )
        .withColumn(
            "dup_fraction",
            F.when(
                F.col("n_tokens") > 0,
                F.round(F.col("dup_tokens") / F.col("n_tokens"), 4),
            ).otherwise(F.lit(0.0)),
        )
    )


def shape(df):
    return df.select(
        "doc_id",
        "n_tokens",
        F.col("dup_tokens").cast("long").alias("dup_tokens"),
        F.col("n_spans").cast("long").alias("n_spans"),
        "dup_fraction",
    ).orderBy("doc_id")


def run(name, fn):
    # cold-ish then two warm
    times = []
    out = None
    for i in range(3):
        t0 = time.perf_counter()
        out = shape(fn(docs)).toArrow()
        times.append(round(time.perf_counter() - t0, 3))
    print(name, times, out.num_rows, flush=True)
    return out


a = run("A_current  ", variant_a)
b = run("B_minmax   ", variant_b)
cc = run("C_window   ", variant_c)


def canon(tbl):
    cols = sorted(tbl.column_names)
    return sorted(repr([r[c] for c in cols]) for r in tbl.to_pylist())


print("B==A:", canon(b) == canon(a), "C==A:", canon(cc) == canon(a))
