"""Per-query floor decomposition of the sequential-warm headline.

VERDICT r13 task 1: the bucketed headline has sat at ~28 s / 98
oracled queries (~0.29 s/query) for two rounds while DuckDB pays
~0.10 — attribute the per-query constant to NAMED stages with real
instrumentation, not prose. This script runs every oracled query warm
against the bucketed fixture and splits each query's wall into
buckets that SUM EXACTLY to the measured total:

  python_build   wall of QUERIES[name](spark, bdir) — pure client-side
                 plan construction (py4j round trips per Column op)
  catalyst       QueryExecution tracker phases (analysis +
                 optimization + planning), JVM-side Catalyst work
  job_wall       Σ per-job (completionTime − submissionTime) from the
                 AppStatusStore — everything the DAG scheduler ran,
                 further split (within-job, not additive to the top
                 level) into:
                   stage_wall   Σ per-stage (completion − submission)
                   launch_delay Σ per-stage (firstTaskLaunched −
                                submission) — task-launch latency
                   task_time    Σ executorRunTime over tasks (CPU-ish
                                occupancy; divide by parallelism to
                                compare to walls)
                   dag_gap      job_wall − stage_wall — DAG-scheduler
                                bookkeeping between/around stages
  fetch_residual total − python_build − catalyst − job_wall — the
                 py4j submit + Arrow stream read + driver epilogue
                 (collectAsArrowToPython path)

Reference floors measured in the same session: `spark.range(1)
.toArrow()` (the irreducible submit+fetch floor) and a raw py4j
round-trip (`sc.defaultParallelism`), both × 200, min + mean.

Usage: python scripts/floor_profile.py [sf_dir]
Writes scripts/floor_profile.json and prints a markdown table for
SCALE_NOTES.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _opt_ms(o) -> int | None:
    return o.get().getTime() if o.isDefined() else None


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from data_warehouse_nhom8_spark import schemas
    from data_warehouse_nhom8_spark.plans import ORACLES, QUERIES
    from data_warehouse_nhom8_spark.session import (
        auto_aqe,
        auto_shuffle_partitions,
        get_spark,
    )
    from data_warehouse_nhom8_spark.sources import load_table
    from data_warehouse_nhom8_spark.sources.testdata import build_bucketed_fixture

    spark = get_spark(
        "floor_profile",
        shuffle_partitions=auto_shuffle_partitions(sf_dir),
        extra_conf={"spark.sql.adaptive.enabled": str(auto_aqe(sf_dir)).lower()},
    )
    for t in schemas.TESTDATA_TABLES:
        load_table(spark, sf_dir, t).count()
    spark.range(256).mapInPandas(lambda it: it, "id long").count()

    from data_warehouse_nhom8_spark.plans.extensions import prefit_stores

    prefit_stores(spark, sf_dir)
    bdir = os.environ.get(
        "SPARK_GRAFT_BUCKETED_DIR",
        f"/tmp/spark_graft_bench_bucketed_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    build_bucketed_fixture(spark, sf_dir, bdir)

    sc = spark.sparkContext
    jvm = spark._jvm
    store = sc._jsc.sc().statusStore()
    empty_list = jvm.java.util.ArrayList()
    empty_doubles = sc._gateway.new_array(jvm.double, 0)

    def jobs_after(min_job_id: int):
        out = []
        jl = store.jobsList(None)
        for i in range(jl.size()):
            j = jl.apply(i)
            if j.jobId() > min_job_id:
                out.append(j)
        return out

    def max_job_id() -> int:
        jl = store.jobsList(None)
        return jl.apply(0).jobId() if jl.size() else -1

    def stage_metrics(stage_ids: set[int]) -> dict:
        walls = launch = task_ms = 0
        n = 0
        sl = store.stageList(empty_list, False, False, empty_doubles, empty_list)
        for i in range(sl.size()):
            s = sl.apply(i)
            if s.stageId() not in stage_ids:
                continue
            sub, comp = _opt_ms(s.submissionTime()), _opt_ms(s.completionTime())
            first = _opt_ms(s.firstTaskLaunchedTime())
            if sub and comp:
                walls += comp - sub
            if sub and first:
                launch += first - sub
            task_ms += s.executorRunTime()
            n += 1
        return {"stage_wall_ms": walls, "launch_delay_ms": launch,
                "task_time_ms": task_ms, "n_stages": n}

    oracled = [k for k in QUERIES if k in ORACLES]

    # codegen/JIT warm-up pass (what bench.py's layout gate provides)
    for name in oracled:
        QUERIES[name](spark, bdir).toArrow()

    rows: dict[str, dict] = {}
    for name in oracled:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, bdir)
        t_build = time.perf_counter() - t0
        jid0 = max_job_id()
        t1 = time.perf_counter()
        df.toArrow()
        t_total_exec = time.perf_counter() - t1

        phases_ms = 0
        ph = df._jdf.queryExecution().tracker().phases()
        it = ph.iterator()
        phase_detail = {}
        while it.hasNext():
            kv = it.next()
            d = kv._2().durationMs()
            phase_detail[kv._1()] = d
            phases_ms += d
        jobs = jobs_after(jid0)
        job_wall = 0
        stage_ids: set[int] = set()
        for j in jobs:
            sub, comp = _opt_ms(j.submissionTime()), _opt_ms(j.completionTime())
            if sub and comp:
                job_wall += comp - sub
            sid = j.stageIds()
            for i in range(sid.size()):
                stage_ids.add(sid.apply(i))
        sm = stage_metrics(stage_ids)
        total = t_build + t_total_exec
        rows[name] = {
            "total_s": round(total, 4),
            "python_build_s": round(t_build, 4),
            "catalyst_s": round(phases_ms / 1000, 4),
            "job_wall_s": round(job_wall / 1000, 4),
            "fetch_residual_s": round(
                t_total_exec - phases_ms / 1000 - job_wall / 1000, 4
            ),
            "n_jobs": len(jobs),
            "stage_wall_s": round(sm["stage_wall_ms"] / 1000, 4),
            "launch_delay_s": round(sm["launch_delay_ms"] / 1000, 4),
            "task_time_s": round(sm["task_time_ms"] / 1000, 4),
            "dag_gap_s": round((job_wall - sm["stage_wall_ms"]) / 1000, 4),
            "n_stages": sm["n_stages"],
            "phases_ms": phase_detail,
        }

    # reference floors, same session
    def _floor(fn, n=200):
        samples = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        return {"min_ms": round(min(samples) * 1e3, 2),
                "mean_ms": round(statistics.mean(samples) * 1e3, 2)}

    range1 = _floor(lambda: spark.range(1).toArrow())
    py4j_rt = _floor(lambda: sc._jsc.sc().defaultParallelism(), n=2000)

    def tot(key: str) -> float:
        return round(sum(r[key] for r in rows.values()), 2)

    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(rows),
        "total_s": tot("total_s"),
        "python_build_s": tot("python_build_s"),
        "catalyst_s": tot("catalyst_s"),
        "job_wall_s": tot("job_wall_s"),
        "fetch_residual_s": tot("fetch_residual_s"),
        "stage_wall_s": tot("stage_wall_s"),
        "launch_delay_s": tot("launch_delay_s"),
        "task_time_s": tot("task_time_s"),
        "dag_gap_s": tot("dag_gap_s"),
        "n_jobs": sum(r["n_jobs"] for r in rows.values()),
        "n_stages": sum(r["n_stages"] for r in rows.values()),
        "range1_toArrow": range1,
        "py4j_roundtrip": py4j_rt,
    }
    out = {"summary": summary, "queries": rows}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "floor_profile.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)

    t = summary
    print(f"\nFloor decomposition over {t['n_queries']} oracled queries "
          f"(bucketed, warm, {sf_dir}):\n")
    print("| bucket | Σ sec | share | note |")
    print("|---|---|---|---|")
    tt = t["total_s"]
    for k, note in [
        ("python_build_s", "client-side plan construction (py4j)"),
        ("catalyst_s", "JVM analysis+optimization+planning (tracker)"),
        ("job_wall_s", "DAG-scheduled execution (job submit→done)"),
        ("fetch_residual_s", "py4j submit + Arrow fetch + epilogue"),
    ]:
        print(f"| {k} | {t[k]} | {t[k]/tt*100:.0f}% | {note} |")
    print(f"| **total** | {tt} | 100% | sums exactly |")
    print(f"\nwithin job_wall: stage_wall {t['stage_wall_s']} "
          f"(launch_delay {t['launch_delay_s']}, task_time Σ {t['task_time_s']}), "
          f"dag_gap {t['dag_gap_s']}; jobs {t['n_jobs']}, stages {t['n_stages']}")
    print(f"range(1).toArrow floor: {range1}; py4j round-trip: {py4j_rt}")
    top = sorted(rows.items(), key=lambda kv: -kv[1]["python_build_s"])[:12]
    print("\ntop python_build queries:")
    for k, v in top:
        print(f"  {v['python_build_s']:6.3f}s build / {v['total_s']:6.3f}s total  {k}")


if __name__ == "__main__":
    main()
