"""Round-16 q53 A/B harness: isolate the incremental near-dup probe
and time barrier-structure variants min-of-N, with job counts.

VERDICT r15 task 1: fuse q53's two serial driver barriers (the mx
histogram collect + the eager cands checkpoint). This harness builds
the same session/state bench.py gives q53 (prefit corpus_sig_store,
memoized), then times:

  current    the registry q53 exactly as declared
  (variants are selected inside operators/neardup.py via the
   SPARK_GRAFT_Q53_VARIANT env var while iterating; the winner ships
   as the only path and this harness then shows current == winner)

Timing = fresh DataFrame per sample, full toArrow() (the bench's
client contract), min of N. Job count via the status store delta —
the driver-barrier evidence the verdict asks for.

Usage: python scripts/r16_q53_ab.py [n_samples] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from data_warehouse_nhom8_spark import schemas
    from data_warehouse_nhom8_spark.plans import QUERIES
    from data_warehouse_nhom8_spark.session import (
        auto_aqe,
        auto_shuffle_partitions,
        get_spark,
    )
    from data_warehouse_nhom8_spark.sources import load_table

    spark = get_spark(
        "r16_q53_ab",
        shuffle_partitions=auto_shuffle_partitions(sf_dir),
        extra_conf={"spark.sql.adaptive.enabled": str(auto_aqe(sf_dir)).lower()},
    )
    for t in schemas.TESTDATA_TABLES:
        load_table(spark, sf_dir, t).count()

    from data_warehouse_nhom8_spark.plans.extensions import prefit_stores

    t0 = time.perf_counter()
    prefit_stores(spark, sf_dir)
    print(f"prefit: {time.perf_counter() - t0:.2f}s")

    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()

    def max_job_id() -> int:
        jl = store.jobsList(None)
        return jl.apply(0).jobId() if jl.size() else -1

    fn = QUERIES["q53_incremental_neardup"]
    fn(spark, sf_dir).toArrow()  # codegen warm-up, untimed

    samples, builds, jobs = [], [], []
    rows = None
    for _ in range(n):
        j0 = max_job_id()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        tbl = df.toArrow()
        dt = time.perf_counter() - t0
        samples.append(dt)
        builds.append(t_build)
        jobs.append(max_job_id() - j0)
        rows = tbl.num_rows
    print(
        f"q53 rows={rows} n={n} min={min(samples):.3f}s "
        f"samples={[round(s, 3) for s in samples]} "
        f"build_min={min(builds):.3f}s jobs/run={jobs}"
    )


if __name__ == "__main__":
    main()
