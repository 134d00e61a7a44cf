"""DuckDB baseline for BASELINE.md and for bench.py's same-run pair:
run every oracle SQL at a given scale dir, cold (fresh connection,
first run) and warm (median of 3 repeats on the same connection), per
query.

Importable: ``run_duckdb_baseline(sf_dir, oracles)`` returns the dict;
bench.py embeds it in the same BENCH JSON as the Spark numbers so the
2x gate ratio is computable from one artifact on one machine-hour
(round-9 verdict task 1 — a Spark-only total on a shared box with
±2x day-to-day drift is uninterpretable alone).

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


def run_duckdb_baseline(
    sf_dir: str, oracles: dict[str, str], cold: bool = True
) -> dict:
    """{"cold_total": s, "warm_total": s, "queries": {...}} for the
    given oracle SQL map. cold = one fresh in-memory DB per query (no
    cached catalogs/buffers; skippable — bench.py's pair only needs
    warm); warm = shared connection, median of 3 after a warm-up."""
    results: dict[str, dict[str, float]] = {}
    if cold:
        for name, sql in oracles.items():
            con = duckdb.connect()
            register(con, sf_dir)
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            results[name] = {"cold": round(time.perf_counter() - t0, 4)}
            con.close()
    con = duckdb.connect()
    register(con, sf_dir)
    for name, sql in oracles.items():
        con.execute(sql).fetchall()  # warm-up pass
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            reps.append(time.perf_counter() - t0)
        results.setdefault(name, {})["warm"] = round(statistics.median(reps), 4)
    con.close()
    out = {
        "warm_total": round(sum(r["warm"] for r in results.values()), 3),
        "queries": results,
    }
    if cold:
        out["cold_total"] = round(sum(r["cold"] for r in results.values()), 3)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from data_warehouse_nhom8_spark.plans import ORACLES

    res = run_duckdb_baseline(sf_dir, ORACLES)
    print(json.dumps({"sf_dir": sf_dir, **res}))


if __name__ == "__main__":
    main()
