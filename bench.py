"""BENCH harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line:

  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q01_...": sec, ...}, "sf": 0.1}

Timing = plan build + execution + collect of results (what a user
waits for). A one-table count warms the JVM first so we measure the
engine, not session bring-up — the DuckDB baseline likewise records
cold vs warm separately (BASELINE.md).
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
    from data_warehouse_nhom8_spark.session import get_spark
    from data_warehouse_nhom8_spark.sources import load_table

    spark = get_spark("bench")

    # warm-up: JVM/codegen + parquet footer reads
    for t in ("lineitem", "orders", "events"):
        load_table(spark, sf_dir, t).count()

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "declared_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
