"""Pin scripts/midscale_probe's replication builder (r14 refactor:
`_build_replication` generalized so PROBE_X1000 can chain
sf0.1 → x100 → x1000). The semantics the scale lanes depend on:

* fact keys are offset per replica — join fan-out per order key is
  UNCHANGED (each replica is a disjoint key range), so a replicated
  probe measures scale, not artificial key skew;
* dims copy as-is (per-key fan-in grows xN, like a bigger SF);
* a replicated DIR output can serve as the next stage's BASE (the
  x100 → x1000 chain reads `dir/*.parquet`);
* the _READY gate makes rebuilds no-ops.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


def _probe_module():
    spec = importlib.util.spec_from_file_location(
        "midscale_probe", os.path.join(ROOT, "scripts", "midscale_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_build_replication_offsets_keys_and_chains(spark, tmp_path):
    probe = _probe_module()
    x2 = str(tmp_path / "x2")
    probe._build_replication(spark, SF_DIR, x2, 2)

    base_li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    rep_li = spark.read.parquet(os.path.join(x2, "lineitem.parquet"))
    n, rn = base_li.count(), rep_li.count()
    assert rn == 2 * n
    # replicas occupy disjoint key ranges: per-key row counts are
    # preserved exactly (max multiplicity unchanged => no fan-out
    # inflation on the join key)
    from pyspark.sql import functions as F

    base_max = base_li.groupBy("l_orderkey").count().agg(F.max("count")).first()[0]
    rep_max = rep_li.groupBy("l_orderkey").count().agg(F.max("count")).first()[0]
    assert rep_max == base_max
    assert rep_li.select("l_orderkey").distinct().count() == 2 * (
        base_li.select("l_orderkey").distinct().count()
    )
    # dims copied byte-for-byte
    assert os.path.getsize(os.path.join(x2, "nation.parquet")) == os.path.getsize(
        os.path.join(SF_DIR, "nation.parquet")
    )

    # the replicated dir chains as the next stage's base (x100 -> x1000 shape)
    x4 = str(tmp_path / "x4")
    probe._build_replication(spark, x2, x4, 2)
    assert spark.read.parquet(os.path.join(x4, "lineitem.parquet")).count() == 4 * n

    # _READY gate: rebuild is a no-op (mtime unchanged)
    ready = os.path.join(x2, "_READY")
    before = os.path.getmtime(ready)
    probe._build_replication(spark, SF_DIR, x2, 2)
    assert os.path.getmtime(ready) == before
