"""BENCH harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line:

  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q01_...": sec, ...}, "sf": 0.1}

Timing = plan build + execution + Arrow fetch of the full result set
(what a modern client waits for; row-at-a-time collect() pickling
adds 0.5-1s/query of pure Python deserialization that says nothing
about the engine). A small warm-up suite exercises scan/join/window/
sort codegen first so we measure the engine, not JIT bring-up — the
DuckDB baseline likewise records cold vs warm separately
(BASELINE.md).
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

    from data_warehouse_nhom8_spark.plans import QUERIES
    from data_warehouse_nhom8_spark.session import auto_shuffle_partitions, get_spark
    from data_warehouse_nhom8_spark.sources import load_table

    spark = get_spark("bench", shuffle_partitions=auto_shuffle_partitions(sf_dir))

    # warm-up: JVM + whole-stage-codegen JIT across the plan shapes the
    # suite uses (scan, hash join, hash agg, window, sort), plus parquet
    # footer reads
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    li.count()
    li.join(od, li.l_orderkey == od.o_orderkey).count()
    li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")),
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")),
        F.count(F.lit(1)),
    ).count()
    od.select(F.row_number().over(Window.partitionBy("o_custkey").orderBy("o_orderkey"))).count()
    od.orderBy("o_totalprice").limit(10).toArrow()  # warm the Arrow collect path too
    load_table(spark, sf_dir, "events").count()

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).toArrow()
        timings[name] = round(time.perf_counter() - t0, 3)

    # headline value = the DuckDB-comparable set (every oracle-checked
    # query — BASELINE.md's baseline covers exactly these); the
    # approximate/vector extensions (noracle) have no DuckDB twin and
    # are reported separately so the comparison stays apples-to-apples.
    from data_warehouse_nhom8_spark.plans import ORACLES

    oracle_total = round(sum(v for k, v in timings.items() if k in ORACLES), 3)
    ext_total = round(sum(v for k, v in timings.items() if k not in ORACLES), 3)
    print(
        json.dumps(
            {
                "metric": "oracle_queries_total_wall",
                "value": oracle_total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extensions_total_sec": ext_total,
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
