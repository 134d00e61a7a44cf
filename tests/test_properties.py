"""Property-based checks (SURVEY §5): the column-expression parsers
against a pure-Python executable spec, and upsert/SCD2 under random
replays. Spark evaluation is batched — one DataFrame per example —
and example counts kept small (each example is a Spark job)."""

from __future__ import annotations

import datetime
import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_warehouse_nhom8_spark.functions.cleaning import (
    clean_salary_cols,
    posted_date_col,
)
from data_warehouse_nhom8_spark.operators.dedup import upsert_last_writer_wins
from data_warehouse_nhom8_spark.operators.scd2 import (
    scd2_invariant_violations,
    scd2_merge,
)

M = 1_000_000


# ------------------------------------------------------ executable specs

def salary_spec(s: str | None) -> tuple[int | None, int | None]:
    """Pure-Python spec of the clean_salary contract (docstring of
    functions/cleaning.py)."""
    if s is None:
        return None, None
    txt = re.sub(r"[,\.]", "", s.strip()).lower()
    if txt == "":
        return None, None
    nums = re.findall(r"\d+", txt)
    if "thỏa thuận" in txt or "thoả thuận" in txt:
        return 0, 0
    if len(nums) >= 2:  # two numbers always mean a range ("10 đến 15")
        return int(nums[0]) * M, int(nums[1]) * M
    if ("tới" in txt or "đến" in txt) and nums:
        return 0, int(nums[0]) * M
    if "trên" in txt and nums:
        return int(nums[0]) * M, 0
    if len(nums) == 1:
        return int(nums[0]) * M, int(nums[0]) * M
    return None, None


def posted_spec(p: str | None, d: datetime.date) -> datetime.date | None:
    if p is None:
        return None
    txt = p.strip().lower()
    if txt == "":
        return None
    nums = re.findall(r"\d+", txt)
    n = int(nums[0]) if nums else 0
    if "hôm qua" in txt:
        return d - datetime.timedelta(days=1)
    if "ngày trước" in txt:
        return d - datetime.timedelta(days=n)
    if "tuần trước" in txt:
        return d - datetime.timedelta(days=7 * n)
    if "hôm nay" in txt or "vừa xong" in txt or "mới đăng" in txt:
        return d
    return None


# ------------------------------------------------------------- strategies

salary_texts = st.one_of(
    st.just("Thỏa thuận"),
    st.builds(lambda n: f"Tới {n} triệu", st.integers(1, 999)),
    st.builds(lambda n: f"Trên {n} triệu", st.integers(1, 999)),
    st.builds(lambda a, b: f"{a} - {b} triệu", st.integers(1, 500), st.integers(1, 500)),
    st.builds(lambda a, b: f"{a} đến {b} triệu", st.integers(1, 500), st.integers(1, 500)),
    st.builds(lambda a, b: f"{a:,} - {b:,} USD", st.integers(100, 9999), st.integers(100, 9999)),
    st.builds(lambda n: f"{n} triệu", st.integers(1, 99)),
    st.text(alphabet="abc 0123456789-", max_size=20),
    st.just(""),
    st.none(),
)

posted_texts = st.one_of(
    st.just("hôm qua"),
    st.just("Hôm nay"),
    st.builds(lambda n: f"{n} ngày trước", st.integers(0, 60)),
    st.builds(lambda n: f"{n} tuần trước", st.integers(0, 10)),
    st.text(alphabet="xyz 12", max_size=10),
    st.none(),
)


@settings(max_examples=6, deadline=None)
@given(st.lists(salary_texts, min_size=1, max_size=40))
def test_salary_parser_matches_spec(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, salary string"
    )
    smin, smax = clean_salary_cols("salary")
    got = {
        r["id"]: (r["lo"], r["hi"])
        for r in df.select("id", smin.alias("lo"), smax.alias("hi")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == salary_spec(t), f"{t!r}: {got[i]} != {salary_spec(t)}"


@settings(max_examples=6, deadline=None)
@given(st.lists(posted_texts, min_size=1, max_size=40),
       st.dates(datetime.date(2024, 1, 1), datetime.date(2026, 1, 1)))
def test_posted_date_matches_spec(spark, texts, d):
    df = spark.createDataFrame(
        [(i, t, d.isoformat()) for i, t in enumerate(texts)],
        "id int, posted string, extracted string",
    )
    got = {
        r["id"]: r["pd"]
        for r in df.select("id", posted_date_col("posted", "extracted").alias("pd")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == posted_spec(t, d), f"{t!r} @ {d}: {got[i]} != {posted_spec(t, d)}"


# --------------------------------------------------------- merge replays

kv_batches = st.lists(
    st.lists(
        st.tuples(st.sampled_from("abcde"), st.integers(0, 100)),
        min_size=1, max_size=6,
    ),
    min_size=1, max_size=4,
)


@settings(max_examples=5, deadline=None)
@given(kv_batches)
def test_upsert_replay_equals_last_writer(spark, batches):
    """Applying batches sequentially through the merge must leave, for
    every key, the value of its last occurrence (batch order, then
    within-batch seq order)."""
    snap = None
    expected: dict[str, int] = {}
    for bi, batch in enumerate(batches):
        rows = [(k, v, bi * 1000 + si) for si, (k, v) in enumerate(batch)]
        inc = spark.createDataFrame(rows, "k string, v int, seq int")
        snap = upsert_last_writer_wins(snap, inc, ["k"], [F.desc("seq")])
        for si, (k, v) in enumerate(batch):
            expected[k] = v  # later within batch wins, later batch wins
    got = {r["k"]: r["v"] for r in snap.collect()}
    assert got == expected


scd2_days = st.lists(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.sampled_from(["x", "y", None])),
        min_size=1, max_size=3, unique_by=lambda t: t[0],
    ),
    min_size=1, max_size=3,
)


def _rowset(df):
    return sorted(df.collect(), key=lambda r: tuple(map(repr, r)))


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(st.characters(min_codepoint=48, max_codepoint=122), min_size=1, max_size=8),
                min_size=1, max_size=30, unique=True))
def test_sk_assignment_is_global_rank(spark, keys):
    """The distributed SK assigner (repartitionByRange + per-partition
    row_number + offset sums) must produce exactly the keys the naive
    single-window global rank would — rank in the total order by
    natural key, 1-based — independent of input partitioning."""
    from data_warehouse_nhom8_spark.operators.scd2 import _assign_sks

    df = spark.createDataFrame([(k,) for k in keys], "nk string").repartition(5)
    got = {r["nk"]: r["sk"] for r in _assign_sks(df, None, "sk", ["nk"]).collect()}
    expected = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert got == expected


def test_sk_assignment_data_path_stays_parallel(spark):
    """Backfill-scale gate: the batch rows must not pass through a
    single-partition exchange — only the per-partition COUNTS (one row
    per range partition) may. The data-side row_number window
    partitions by the range-partition id."""
    from data_warehouse_nhom8_spark.operators.scd2 import _assign_sks

    df = spark.range(10_000).selectExpr("CAST(id AS STRING) AS nk")
    plan = (
        _assign_sks(df, None, "sk", ["nk"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "REPARTITION_BY_" in plan or "rangepartitioning" in plan, plan[:800]
    import re
    windows = re.findall(r"Window \[[^\]]*row_number[^\]]*\], \[([^\]]*)\]", plan)
    assert windows, plan[:800]
    # every row_number window declares a partition spec (no global window)
    assert all(spec.strip() for spec in windows), plan[:2000]


@settings(max_examples=4, deadline=None)
@given(scd2_days)
def test_scd2_random_replays_keep_invariants(spark, days):
    """Random day-sequences of (key, attr) loads: after every merge —
    exactly one current row per key ever loaded, and re-merging the
    same day is a no-op."""
    snap = None
    seen: set[str] = set()
    for di, day_rows in enumerate(days):
        d = (datetime.date(2025, 1, 1) + datetime.timedelta(days=di)).isoformat()
        inc = spark.createDataFrame(
            [(k, f"T{k}", v, d) for k, v in day_rows],
            "job_id string, job_title string, salary string, extracted_date string",
        ).withColumn("extracted_date", F.col("extracted_date").cast("date"))
        merged = scd2_merge(snap, inc, ["job_title"], ["salary"], d)
        # materialize: keeps the iterated plan shallow (as a real run's
        # write/read cycle would)
        rows = merged.collect()
        snap = spark.createDataFrame(rows, merged.schema)
        seen |= {k for k, _ in day_rows}
        assert scd2_invariant_violations(snap, ["job_title"]).count() == 0
        live = snap.filter(F.col("expired") == F.lit("9999-12-31").cast("date"))
        assert live.count() == len(seen)
        # rerun same day: identical snapshot
        again = scd2_merge(snap, inc, ["job_title"], ["salary"], d)
        assert _rowset(again) == sorted(rows, key=lambda r: tuple(map(repr, r)))


# ------------------------------------------- change feed / CDC consumer

# two random keyed tables: dict key -> group label; overlapping key
# spaces so every change shape (insert/delete/group-move update)
# occurs across examples
_tbl = st.dictionaries(
    st.integers(min_value=0, max_value=24),
    st.sampled_from(["g1", "g2", "g3"]),
    max_size=20,
)


@settings(max_examples=6, deadline=None)
@given(_tbl, _tbl)
def test_change_feed_and_incremental_agg_match_rebuild(spark, tmp_path_factory, t1, t2):
    """Random version pairs: (a) the preimage feed replays v1 into v2
    exactly; (b) folding the feed into v1's aggregate equals a
    from-scratch rebuild over v2."""
    from data_warehouse_nhom8_spark.pipeline.datamart import (
        AggSpec,
        apply_change_feed,
        build_aggregate,
    )
    from data_warehouse_nhom8_spark.sources.snapshots import (
        snapshot_diff,
        snapshot_overwrite,
    )

    path = str(tmp_path_factory.mktemp("cdc") / "t")
    mk = lambda t: spark.createDataFrame(  # noqa: E731
        list(t.items()) or [(None, None)], "id long, grp string"
    ).filter(F.col("id").isNotNull())
    snapshot_overwrite(mk(t1), path, keep=3)
    snapshot_overwrite(mk(t2), path, keep=3)
    feed = snapshot_diff(spark, path, 1, 2, keys=["id"], emit_update_preimage=True)
    rows = feed.collect()

    # (a) replay: v1 + feed == v2
    state = dict(t1)
    for r in sorted(rows, key=lambda r: r["_change"] != "update_preimage"):
        if r["_change"] in ("delete", "update_preimage"):
            assert state.pop(r["id"]) == r["grp"]
        else:  # insert / update_postimage
            state[r["id"]] = r["grp"]
    assert state == t2

    # (b) incremental aggregate == rebuild
    spec = AggSpec("agg", "grp", "n")
    got = {
        (r["grp"], r["n"])
        for r in apply_change_feed(build_aggregate(mk(t1), spec), feed, spec).collect()
    }
    want = {(r["grp"], r["n"]) for r in build_aggregate(mk(t2), spec).collect()}
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    files=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(0, 30)), min_size=1, max_size=12
    ),
    lo=st.one_of(st.none(), st.integers(-60, 60)),
    hi=st.one_of(st.none(), st.integers(-60, 60)),
)
def test_prune_files_is_superset_of_matching(tmp_path_factory, files, lo, hi):
    """Data-skipping safety: for ANY per-file [min,max] layout and ANY
    query range, the pruned file set contains every file whose interval
    overlaps the range — pruning may over-keep, never over-drop."""
    import json
    import os

    from data_warehouse_nhom8_spark.sources.layout import _MANIFEST, prune_files

    vdir = str(tmp_path_factory.mktemp("v"))
    manifest = {"columns": ["x"], "files": {}}
    intervals = {}
    for i, (mn, width) in enumerate(files):
        name = f"part-{i:05d}.parquet"
        open(os.path.join(vdir, name), "w").close()  # listing only
        intervals[name] = (mn, mn + width)
        manifest["files"][name] = {"x": [mn, mn + width, "num"]}
    with open(os.path.join(vdir, _MANIFEST), "w") as fh:
        json.dump(manifest, fh)

    kept, total = prune_files(vdir, {"x": (lo, hi)})
    assert total == len(files)
    kept_names = {os.path.basename(p) for p in kept}
    for name, (mn, mx) in intervals.items():
        overlaps = (lo is None or mx >= lo) and (hi is None or mn <= hi)
        if overlaps:
            assert name in kept_names, (name, (mn, mx), (lo, hi))
        else:
            # with exact numeric stats the pruner is also tight
            assert name not in kept_names, (name, (mn, mx), (lo, hi))


@settings(max_examples=100, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=200
    ),
    fpp=st.sampled_from([0.3, 0.01, 0.001]),
)
def test_bloom_has_no_false_negatives(vals, fpp):
    """Build-side (numpy vectorized) and probe-side (pure python)
    hashing must agree exactly: every inserted value tests positive for
    ANY set of values and fpp."""
    import numpy as np

    from data_warehouse_nhom8_spark.sources.layout import (
        _bloom_build,
        _bloom_maybe_contains,
    )

    bloom = _bloom_build(np.unique(np.array(vals, dtype=np.int64)), fpp)
    for v in vals:
        assert _bloom_maybe_contains(bloom, v), v


# --------------------------------------------- round-6 corpus op invariants

doc_corpora = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),                     # shard
        st.integers(min_value=0, max_value=40),               # n words
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None)
@given(doc_corpora, st.integers(min_value=1, max_value=64))
def test_sequence_packing_conserves_tokens_and_docs(spark, corpus, seq_len):
    """For any corpus and seq_len: every doc attributed exactly once,
    token totals conserved per shard, the first sequence id is 0 (the
    first doc starts at offset 0; LATER ids may legitimately gap when
    one doc spans many sequences), and each sequence's doc span
    [first_doc, last_doc] is non-overlapping and increasing (packing
    follows doc order)."""
    from data_warehouse_nhom8_spark.operators.corpus import sequence_packing_manifest

    rows = [(i, s, " ".join(["w"] * n) if n else "") for i, (s, n) in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = sequence_packing_manifest(df, seq_len=seq_len).collect()

    per_shard_docs: dict[str, int] = {}
    per_shard_tokens: dict[str, int] = {}
    for r in out:
        per_shard_docs[r["shard"]] = per_shard_docs.get(r["shard"], 0) + r["n_docs"]
        per_shard_tokens[r["shard"]] = per_shard_tokens.get(r["shard"], 0) + r["tokens_started"]
    want_docs: dict[str, int] = {}
    want_tokens: dict[str, int] = {}
    for i, (s, n) in enumerate(corpus):
        want_docs[s] = want_docs.get(s, 0) + 1
        want_tokens[s] = want_tokens.get(s, 0) + n
    assert per_shard_docs == want_docs
    assert per_shard_tokens == want_tokens

    for shard in want_docs:
        seqs = sorted((r["seq_id"], r) for r in out if r["shard"] == shard)
        assert seqs[0][0] == 0
        spans = [(r["first_doc"], r["last_doc"]) for _, r in seqs]
        assert all(a <= b for a, b in spans)
        assert all(spans[i][1] < spans[i + 1][0] for i in range(len(spans) - 1))


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=8, unique=True))
def test_temperature_weights_order_preserving_and_normalized(spark, sizes):
    """Weights sum to 1, preserve the source-size order, and never
    invert: a larger source keeps a >= weight but a <= epochs/token
    multiplier (flattening)."""
    from data_warehouse_nhom8_spark.operators.corpus import temperature_mixture_weights

    rows = []
    doc = 0
    for i, n in enumerate(sizes):
        rows.append((doc, f"s{i}", " ".join(["w"] * n)))
        doc += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = sorted(
        temperature_mixture_weights(df, token_budget=10_000).collect(),
        key=lambda r: r["n_tokens"],
    )
    assert abs(sum(r["mix_weight"] for r in out) - 1.0) < 1e-9
    for a, b in zip(out, out[1:]):
        assert a["n_tokens"] < b["n_tokens"]
        assert a["mix_weight"] <= b["mix_weight"] + 1e-12
        # flattening: weight grows SLOWER than size
        assert a["mix_weight"] / a["n_tokens"] >= b["mix_weight"] / b["n_tokens"] - 1e-12


# --------------------------------------------- unigram surprisal spec

@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 6), min_size=1, max_size=12),
        min_size=2,
        max_size=15,
    )
)
def test_unigram_surprisal_matches_python_spec(spark, token_docs):
    """Random corpora vs a pure-Python executable spec of the
    milli-bit contract: mbits = round(1000*log2(N/n)) per vocab entry,
    avg_bits = sum/n/1000 with the same left-associated division."""
    import math

    from data_warehouse_nhom8_spark.operators.text import unigram_surprisal_scores

    docs = [(i, " ".join(f"t{t}" for t in toks)) for i, toks in enumerate(token_docs)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_surprisal_scores(df).collect()}

    counts: dict[str, int] = {}
    for toks in token_docs:
        for t in toks:
            tok = f"t{t}"
            counts[tok] = counts.get(tok, 0) + 1
    n_total = sum(counts.values())
    mbits = {
        tok: int(round(1000 * math.log2(n_total / n))) for tok, n in counts.items()
    }
    for i, toks in enumerate(token_docs):
        s = sum(mbits[f"t{t}"] for t in toks)
        assert got[i]["n_tokens"] == len(toks)
        assert got[i]["sum_mbits"] == s
        assert got[i]["avg_bits"] == s / len(toks) / 1000.0


@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),                # group key
            st.integers(0, 99_999_99),        # price in cents (2-dp fixed point)
            st.integers(0, 10),               # discount in cents
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 6),                        # repartition width
)
@settings(max_examples=20, deadline=None)
def test_exact_money_aggs_matches_decimal_at_any_partitioning(spark, rows, nparts):
    """Random fixed-point money data under random partitioning: the
    two-level integer-cents scheme must equal the single-level
    decimal-staged sums bit-for-bit (the equivalence the q46-class
    conversions rely on), independent of how rows land in partitions
    (spark_partition_id changes, results must not)."""
    from pyspark.sql import functions as F

    from data_warehouse_nhom8_spark.operators.aggregates import (
        cents,
        exact_money_aggs,
    )

    df = spark.createDataFrame(
        [(k, p / 100.0, d / 100.0) for k, p, d in rows],
        "k long, price double, disc double",
    ).repartition(nparts)

    got = {
        r["k"]: (r["rev"], r["n"])
        for r in exact_money_aggs(
            df,
            ["k"],
            {"rev": (cents("price") * (100 - cents("disc")), 1e4)},
            extra_partial={"n": F.count(F.lit(1))},
        ).collect()
    }
    want = {
        r["k"]: (r["rev"], r["n"])
        for r in df.groupBy("k")
        .agg(
            F.sum((F.col("price") * (1 - F.col("disc"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert got == want


def test_exact_money_aggs_empty_global_input_matches_sql_semantics(spark):
    """ADVICE r7 (medium): a global exact_money_aggs over ZERO input
    rows must return one row with COUNT-like extra_partial aggregates
    = 0 and SUM columns = NULL — exactly what single-level SQL (and
    the DuckDB oracle) returns. Before the fix, the two-level split
    returned NULL for the counts too (stage 1 emitted no rows)."""
    from pyspark.sql import functions as F

    from data_warehouse_nhom8_spark.operators.aggregates import (
        cents,
        exact_money_aggs,
    )

    df = spark.createDataFrame([], "k long, price double").where(F.lit(False))
    rows = exact_money_aggs(
        df,
        [],
        {"rev": (cents("price"), 100.0)},
        extra_partial={"n_lines": F.count(F.lit(1))},
    ).collect()
    assert len(rows) == 1
    assert rows[0]["rev"] is None          # SUM over empty = NULL
    assert rows[0]["n_lines"] == 0         # COUNT over empty = 0

    # Grouped empty input still returns zero rows (no groups exist).
    grouped = exact_money_aggs(
        df,
        ["k"],
        {"rev": (cents("price"), 100.0)},
        extra_partial={"n_lines": F.count(F.lit(1))},
    ).collect()
    assert grouped == []


@given(
    st.integers(1, 3),                 # channels
    st.integers(1, 4000),              # samples
    st.sampled_from([8000, 16000, 44100]),
    st.sampled_from([8, 16]),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_wav_roundtrip_property(ch, n, rate, bits, seed):
    """Any float signal in [-1,1] roundtrips through the WAV codec
    within quantization error (1/127 at 8-bit, 1/32767 at 16-bit),
    preserving shape and rate."""
    import numpy as np

    from data_warehouse_nhom8_spark.operators.audio import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    sig = rng.uniform(-1, 1, size=(n, ch))
    out, r = decode_wav(encode_wav(sig, rate, bits=bits))
    assert r == rate and out.shape == (n, ch)
    tol = (1.5 / 127.0) if bits == 8 else (1.5 / 32767.0)
    assert float(np.abs(out - sig).max()) <= tol


@given(st.integers(1, 6), st.integers(1, 30), st.integers(0, 2**31 - 1))
@settings(max_examples=15, deadline=None)
def test_avi_mjpeg_mux_demux_property(n_frames, fps, seed):
    """Mux/demux is byte-exact for any frame count/rate, including
    odd-length JPEG payloads (RIFF word alignment)."""
    import numpy as np

    from data_warehouse_nhom8_spark.operators.jpeg import encode_jpeg
    from data_warehouse_nhom8_spark.operators.video import (
        demux_avi_mjpeg,
        encode_avi_mjpeg,
    )

    rng = np.random.default_rng(seed)
    frames = [
        encode_jpeg(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
        for _ in range(n_frames)
    ]
    out, got_fps, w, h = demux_avi_mjpeg(
        encode_avi_mjpeg(frames, fps=fps, width=8, height=8)
    )
    assert [bytes(f) for f in out] == frames
    assert (got_fps, w, h) == (round(1_000_000 / (1_000_000 // fps)), 8, 8)


@given(
    st.lists(
        st.text(
            alphabet="abcĐđ ÁáàảÃãẠạ ÊêếềùưứXYZ  \t",
            min_size=0,
            max_size=24,
        ),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=20, deadline=None)
def test_canonical_key_equality_matches_icu_on_fold_domain(spark, texts):
    """The bucketed-SCD2 contract: within the fold table's domain
    (Vietnamese + Latin + ASCII + whitespace), binary equality of
    canonical_key must agree with ICU UNICODE_CI_AI equality of
    collation_key for EVERY pair — otherwise two rows the merge
    considers one key could land in different buckets."""
    from pyspark.sql import functions as F

    from data_warehouse_nhom8_spark.functions.cleaning import (
        canonical_key,
        collation_key,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i long, t string")
    a, b = df.alias("a"), df.alias("b")
    pairs = a.crossJoin(b).select(
        (canonical_key(F.col("a.t")) == canonical_key(F.col("b.t"))).alias("canon"),
        (collation_key(F.col("a.t")) == collation_key(F.col("b.t"))).alias("icu"),
        F.col("a.t").alias("ta"),
        F.col("b.t").alias("tb"),
    )
    bad = pairs.filter(F.col("canon") != F.col("icu")).collect()
    assert not bad, [(r["ta"], r["tb"], r["canon"], r["icu"]) for r in bad]


# Vietnamese fold-domain alphabet, PRECOMPOSED (NFC) forms — unicodedata
# derives the NFD/mixed variants inside the property.
_VI_NFC = (
    "aàáảãạăằắẳẵặâầấẩẫậ"
    "eèéẻẽẹêềếểễệ"
    "iìíỉĩị oòóỏõọôồốổỗộơờớởỡợ"
    "uùúủũụưừứửữự yỳýỷỹỵ đĐ"
    "ABCxyz "
)


@given(
    st.lists(
        st.text(alphabet=_VI_NFC, min_size=0, max_size=24),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=20, deadline=None)
def test_canonical_key_is_normalization_form_independent(spark, texts, seed):
    """Round-10 property (VERDICT r9 task 7): for random Vietnamese
    strings, canonical_key(NFC(s)) == canonical_key(NFD(s)) ==
    canonical_key(mixed-form s) — real scraped text arrives in any
    normalization form and one business key must never split into
    two SCD2 rows/buckets. Also pins the ICU side: every form pair
    is UNICODE_CI_AI-equal via collation_key, so the plain-string
    key tracks exactly the equality class the reference's
    utf8mb4_unicode_ci columns would use."""
    import random
    import unicodedata

    from pyspark.sql import functions as F

    from data_warehouse_nhom8_spark.functions.cleaning import (
        canonical_key,
        collation_key,
    )

    rng = random.Random(seed)

    def mixed(s: str) -> str:
        # per-character independent NFC/NFD choice — forms ICU treats
        # as identical but whose byte sequences interleave both ways
        return "".join(
            unicodedata.normalize(rng.choice(("NFC", "NFD")), ch) for ch in s
        )

    rows = [
        (
            i,
            unicodedata.normalize("NFC", t),
            unicodedata.normalize("NFD", t),
            mixed(t),
        )
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, "i long, nfc string, nfd string, mix string")
    bad = df.select(
        "nfc",
        (
            (canonical_key("nfc") == canonical_key("nfd"))
            & (canonical_key("nfc") == canonical_key("mix"))
        ).alias("canon_ok"),
        (
            (collation_key("nfc") == collation_key("nfd"))
            & (collation_key("nfc") == collation_key("mix"))
        ).alias("icu_ok"),
    ).filter(~F.col("canon_ok") | ~F.col("icu_ok")).collect()
    assert not bad, [(r["nfc"], r["canon_ok"], r["icu_ok"]) for r in bad]


_URL_HOST_ALPHA = "aBcD01"
_URL_PATH_ALPHA = "aBcD01-_."


def _ref_canon(u: str) -> tuple[str, str]:
    """Python reference implementation of url_canonical_cols' spec —
    the property's ground truth (the q111 oracle only proves Spark
    and DuckDB agree with EACH OTHER; this pins what they agree ON)."""
    s = u.strip()
    s = re.sub(r"#.*", "", s)
    s = re.sub(r"\?.*", "", s)
    s = re.sub(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "", s)
    m = re.match(r"^[^/]*", s)
    host = m.group(0).lower()
    host = re.sub(r":(80|443)$", "", host)
    domain = re.sub(r"^www\.", "", host)
    path = s[len(m.group(0)):]
    path = re.sub(r"/index\.html$", "/", path)
    path = re.sub(r"/+$", "", path)
    return domain, domain + path


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["http://", "HTTPS://", "hTtP://", "ftp://", ""]),
            st.booleans(),  # www. prefix
            st.text(alphabet=_URL_HOST_ALPHA, min_size=1, max_size=12),
            st.sampled_from(["", ":80", ":443", ":8080"]),
            st.lists(
                st.text(alphabet=_URL_PATH_ALPHA, min_size=1, max_size=8),
                min_size=0,
                max_size=3,
            ),
            st.sampled_from(["", "/", "//", "/index.html"]),
            st.sampled_from(["", "?utm=A&b=C"]),
            st.sampled_from(["", "#Frag-2"]),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=20, deadline=None)
def test_url_canonicalization_properties(spark, parts):
    """Round-11 property (VERDICT r10 task 6): for fuzzed URLs built
    from random scheme-case / www / host-case / default-and-real
    ports / path segments / index.html / trailing slashes / query /
    fragment combinations:
      1. Spark's url_canonical_cols == the Python reference spec
         (path case PRESERVED, host case folded — checked because the
         reference keeps the raw path substring verbatim);
      2. idempotence: canon(canon_url) == canon_url — re-crawling an
         already-canonical URL must be a fixed point;
      3. host-case insensitivity: swapcasing the host (and scheme)
         never changes the output."""
    from data_warehouse_nhom8_spark.operators.corpus import url_canonical_cols

    urls = []
    for scheme, www, host, port, segs, tail, q, frag in parts:
        full_host = ("www." if www else "") + host + ".Example.COM"
        path = "".join("/" + s for s in segs)
        urls.append(scheme + full_host + port + path + tail + q + frag)

    rows = []
    for u in urls:
        dom, canon = _ref_canon(u)
        # host-case variant: swap case up to the first '/' past the
        # scheme (the authority), keep the path bytes untouched
        m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*://)?([^/]*)(.*)$", u, re.S)
        variant = (m.group(1) or "").swapcase() + m.group(2).swapcase() + m.group(3)
        rows.append((u, variant, dom, canon))
    df = spark.createDataFrame(rows, "u string, v string, ref_dom string, ref_canon string")
    c1 = url_canonical_cols("u")
    got = df.select(
        "u", "v", "ref_dom", "ref_canon",
        c1["domain"].alias("dom"),
        c1["canon_url"].alias("canon"),
    )
    c2 = url_canonical_cols("canon")
    c3 = url_canonical_cols("v")
    bad = (
        got.select(
            "u",
            ((F.col("dom") == F.col("ref_dom")) & (F.col("canon") == F.col("ref_canon"))).alias("spec_ok"),
            (c2["canon_url"] == F.col("canon")).alias("idem_ok"),
            (c3["canon_url"] == F.col("canon")).alias("case_ok"),
        )
        .filter(~F.col("spec_ok") | ~F.col("idem_ok") | ~F.col("case_ok"))
        .collect()
    )
    assert not bad, [(r["u"], r["spec_ok"], r["idem_ok"], r["case_ok"]) for r in bad]


# ----------------------------------------------------- decontamination scrub


def _ref_scrub(corpus, bench, w):
    """Python reference of decontaminate_scrub's spec — ground truth
    for the property (the q116 oracle only proves Spark and DuckDB
    agree with EACH OTHER; this pins what they agree ON): windows on
    the lowercased whitespace-split stream (short docs emit one
    whole-doc window), merged spans by the p <= last.e rule, original
    tokens surviving at uncovered positions, single-space joined."""

    def toks(t):
        return re.split(r"\s+", t.strip())

    def windows(tk):
        low = [x.lower() for x in tk]
        return [
            " ".join(low[i : i + w])
            for i in range(max(len(low) - w + 1, 1))
        ]

    bg = {g for _, t in bench for g in windows(toks(t))}
    out = {}
    for i, t in corpus:
        ot = toks(t)
        hit = [p for p, g in enumerate(windows(ot)) if g in bg]
        spans = []
        for p in hit:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + w)
            else:
                spans.append([p, p + w])
        covered = {q for s, e in spans for q in range(s, e)}
        kept = [x for p, x in enumerate(ot) if p not in covered]
        out[i] = (
            len(ot),
            len(kept),
            len(ot) - len(kept),
            len(spans),
            " ".join(kept),
        )
    return out


_SCRUB_WORDS = ["aa", "Bb", "cc", "DD", "e", "ff", "g7"]


@given(
    st.lists(
        st.lists(st.sampled_from(_SCRUB_WORDS), min_size=0, max_size=24),
        min_size=1,
        max_size=6,
    ),
    st.lists(
        st.lists(st.sampled_from(_SCRUB_WORDS), min_size=1, max_size=10),
        min_size=1,
        max_size=2,
    ),
    st.integers(2, 5),
)
@settings(max_examples=15, deadline=None)
def test_decontaminate_scrub_matches_reference(spark, corpus_toks, bench_toks, w):
    """For fuzzed corpora over a tiny shared vocabulary (so benchmark
    collisions actually occur) and gram widths 2..5: Spark's
    decontaminate_scrub == the Python reference on every column —
    token accounting (kept + removed == n), merged span count, and
    the surviving text byte-for-byte (original casing preserved at
    uncovered positions)."""
    from data_warehouse_nhom8_spark.operators.corpus import decontaminate_scrub

    corpus = [(i, " ".join(ts)) for i, ts in enumerate(corpus_toks)]
    bench = [(1000 + i, " ".join(ts)) for i, ts in enumerate(bench_toks)]
    ref = _ref_scrub(corpus, bench, w)
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["kept_tokens"],
            r["removed_tokens"],
            r["n_spans"],
            r["clean_text"],
        )
        for r in decontaminate_scrub(docs, bdf, gram_w=w).collect()
    }
    assert got == ref


# --------------------------------------------------- HTML extraction


def _ref_html_text(h: str) -> tuple[str, str, int]:
    """Python reference of html_text_cols' spec (ground truth for the
    property — the DuckDB twin proves cross-engine agreement, this
    pins what they agree ON): same pipeline, same order, same regex
    dialect subset."""
    s = re.sub(r"(?i)<script[^>]*>[\s\S]*?</script>", " ", h)
    s = re.sub(r"(?i)<style[^>]*>[\s\S]*?</style>", " ", s)
    s = re.sub(r"<!--[\s\S]*?-->", " ", s)
    s = re.sub(r"<[^>]*>", " ", s)
    for ent, ch in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"),
    ):
        s = s.replace(ent, ch)
    text = re.sub(r"\s+", " ", s).strip()
    m = re.search(r"(?i)<title[^>]*>([\s\S]*?)</title>", h)
    title = (m.group(1) if m else "").strip()
    n_links = len(
        re.findall(r"(?i)<a\b[^>]*\bhref\s*=\s*(\"[^\"]*\"|'[^']*')", h)
    )
    return text, title, n_links


_HTML_PIECES = [
    "plain words here",
    "x &amp; y",
    "&amp;lt; double escape",
    "&nbsp;gap&nbsp;",
    "<p>para</p>",
    "<P CLASS='a'>attr tag</P>",
    "<br/>",
    "<script>var q = '<p>not text</p>';</script>",
    "<SCRIPT src='x.js'>ignored()</SCRIPT>",
    "<style>p { color: red }</style>",
    "<!-- a comment <b>with tags</b> -->",
    "<a href=\"https://e.com/1\">link</a>",
    "<a class='z' href='https://e.com/2'>link2</a>",
    "href=\"quoted-not-a-link\"",
    "<title>Inner Title</title>",
    "  spaced   out  ",
]


@given(
    st.lists(st.sampled_from(_HTML_PIECES), min_size=1, max_size=12),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=15, deadline=None)
def test_html_text_cols_matches_reference(spark, pieces, seed):
    """Fuzzed HTML assembled from adversarial pieces (script/style
    blocks wrapping tag-looking text, comments holding tags, double
    escapes, quoted href OUTSIDE an <a> tag, repeated titles): Spark's
    html_text_cols == the Python reference on text, title, and link
    count."""
    import random

    from data_warehouse_nhom8_spark.operators.text import html_text_cols

    rng = random.Random(seed)
    docs = []
    for i in range(4):
        sample = [p for p in pieces if rng.random() < 0.8] or pieces[:1]
        docs.append((i, "<html><body>" + "".join(sample) + "</body></html>"))
    df = spark.createDataFrame(docs, "doc_id long, html string")
    cols = html_text_cols("html")
    got = {
        r["doc_id"]: (r["t"], r["ti"], r["n"])
        for r in df.select(
            "doc_id",
            cols["text"].alias("t"),
            cols["title"].alias("ti"),
            cols["n_links"].alias("n"),
        ).collect()
    }
    want = {i: _ref_html_text(h) for i, h in docs}
    assert got == want


def test_exact_money_sql_form_identical(spark):
    """r15 build-cost rewrite gate: exact_money_aggs' stage-2 merges
    moved from Column chains to parsed SQL strings — this pins the
    SQL form bitwise against the pre-rewrite Column form (including
    the divisor's repr round-trip, the COUNT-over-empty coalesce, and
    the SUM-over-empty NULL), on populated AND empty inputs."""
    from data_warehouse_nhom8_spark.operators.aggregates import (
        cents,
        exact_money_aggs,
    )

    def column_form(df, group_cols, cent_sums, extra_partial, extra_final):
        # the pre-r15 implementation, verbatim
        extra_partial = extra_partial or {}
        partial = df.groupBy(
            *group_cols, F.spark_partition_id().alias("__pid")
        ).agg(
            *[F.sum(c).alias(f"__p_{a}") for a, (c, _s) in cent_sums.items()],
            *[e.alias(f"__p_{a}") for a, e in extra_partial.items()],
        )

        def merge_extra(a, e):
            m = F.sum(F.col(f"__p_{a}"))
            if "count(" in repr(e).lower():
                m = F.coalesce(m, F.lit(0).cast("long"))
            return m.alias(a)

        final_aggs = [
            (
                F.sum(F.col(f"__p_{a}").cast("decimal(38,0)")).cast("double")
                / F.lit(s)
            ).alias(a)
            for a, (_c, s) in cent_sums.items()
        ] + [merge_extra(a, e) for a, e in extra_partial.items()]
        out = partial.groupBy(*group_cols).agg(*final_aggs)
        for a, e in (extra_final or {}).items():
            out = out.withColumn(a, e)
        return out

    rows = [
        ("A", 1.07, 3.0),
        ("A", 2.93, 1.0),
        ("B", 10.555, 2.0),  # 3-decimal edge exercises the rounding
        ("B", -4.20, 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, price double, qty double")
    args = dict(
        group_cols=["k"],
        cent_sums={
            "sum_price": (cents("price", 3), 1000.0),
            "sum_qty": (cents("qty"), 100.0),
        },
        extra_partial={"n": F.count(F.lit(1))},
        extra_final={"avg_price": F.col("sum_price") / F.col("n")},
    )
    for data in (df, df.limit(0)):
        got = {
            tuple(r) for r in exact_money_aggs(data, **args).collect()
        }
        want = {tuple(r) for r in column_form(data, **args).collect()}
        assert got == want, (got, want)
    # global (no keys) over empty input: COUNT coalesces to 0, SUMs
    # stay NULL — the single-level SQL semantics both forms promise
    g = dict(args, group_cols=[])
    got = exact_money_aggs(df.limit(0), **g).collect()
    want = column_form(df.limit(0), **g).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got[0]["n"] == 0 and got[0]["sum_price"] is None


def test_band_table_sql_form_identical(spark):
    """_band_table's parsed-SQL form (r15 build-cost rewrite: one JVM
    round-trip instead of ~300 py4j calls per build) must reproduce
    the Column-form band table exactly — ids, band ordinals, and the
    md5-derived 64-bit bucket hashes — including at a non-default
    (k, bands) split."""
    from data_warehouse_nhom8_spark.operators.neardup import (
        _band_table,
        _band_table_column_form,
    )

    df = spark.createDataFrame(
        [(i, [j * 13 + i * 7 for j in range(64)]) for i in range(23)],
        "id long, sig array<bigint>",
    )
    for k, bands in ((64, 8), (64, 16)):
        a = _band_table(df, k, bands)
        b = _band_table_column_form(df, k, bands)
        assert a.schema == b.schema
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )


def test_signature_sets_sql_form_identical(spark):
    """minhash_signature_sets' parsed-SQL form (r16 build-cost rewrite
    — it sits on q53's per-probe path, where plan construction was
    ~half the probe wall) must reproduce the Column-form staged table
    exactly: ids, deduped 64-bit shingle-hash sets, AND the k-element
    signatures, including at a non-default (k, shingle_w)."""
    from data_warehouse_nhom8_spark.operators.neardup import (
        minhash_signature_sets,
        minhash_signature_sets_column_form,
    )

    df = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy cat"),
            (2, "pack my box with five dozen liquor jugs ok"),
            (3, "short doc"),
            (4, "tabs\tand\nnewlines \x0b mixed   whitespace here now"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    for k, w in ((64, 5), (16, 3)):
        a = minhash_signature_sets(df, "doc_id", "text", k, w)
        b = minhash_signature_sets_column_form(df, "doc_id", "text", k, w)
        assert a.schema == b.schema
        ra = sorted(a.collect(), key=lambda r: r["id"])
        rb = sorted(b.collect(), key=lambda r: r["id"])
        assert [tuple(r) for r in ra] == [tuple(r) for r in rb]
