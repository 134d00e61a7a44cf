"""DuckDB baseline for BASELINE.md: run every oracle SQL at a given
scale dir, cold (fresh connection, first run) and warm (median of 3
repeats on the same connection), per query.

Usage: python scripts/bench_duckdb.py [sf_dir]
Prints one JSON line:
  {"sf_dir": ..., "cold_total": s, "warm_total": s,
   "queries": {name: {"cold": s, "warm": s}}}
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def register(con, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from data_warehouse_nhom8_spark.plans import ORACLES

    results: dict[str, dict[str, float]] = {}
    # cold: one fresh in-memory DB per query (no cached catalogs/buffers)
    for name, sql in ORACLES.items():
        con = duckdb.connect()
        register(con, sf_dir)
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        results[name] = {"cold": round(time.perf_counter() - t0, 4)}
        con.close()
    # warm: shared connection, median of 3
    con = duckdb.connect()
    register(con, sf_dir)
    for name, sql in ORACLES.items():
        con.execute(sql).fetchall()  # warm-up pass
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            reps.append(time.perf_counter() - t0)
        results[name]["warm"] = round(statistics.median(reps), 4)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "cold_total": round(sum(r["cold"] for r in results.values()), 3),
                "warm_total": round(sum(r["warm"] for r in results.values()), 3),
                "queries": results,
            }
        )
    )


if __name__ == "__main__":
    main()
