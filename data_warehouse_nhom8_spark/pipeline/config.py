"""Engine config loader (SURVEY.md §2a S11).

The reference drives every job from one XML file: DB endpoints, paths,
selenium/retry settings, truncate flags, and the datamart aggregate
specs (reference config.xml; parsed at extract/topcv_scraper_v5.py:30-38,
datamart/load_to_dm.py:46-66, loadtowh/LoadToWH.java:41-82).

The engine keeps the same config-driven contract with a storage-layer
twist: "endpoints" become storage paths (bronze/staging/warehouse/
datamart parquet roots) instead of MySQL hosts, because on Spark the
compute goes to the data. The XML aggregate-spec shape is preserved
verbatim so a reference user's config migrates by editing endpoints
only.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from data_warehouse_nhom8_spark.pipeline.datamart import AggSpec


@dataclass(frozen=True)
class RetryPolicy:
    """Mirrors <retry> (reference config.xml: max_attempts=3,
    retry_interval=900s for extract; the loadtowh wrapper uses 3x300s,
    load_to_wh_with_retry.sh:48-49)."""

    max_attempts: int = 3
    retry_interval_sec: int = 900


@dataclass(frozen=True)
class EngineConfig:
    bronze_path: str = "data/bronze"
    staging_path: str = "data/staging"
    warehouse_path: str = "data/warehouse"
    datamart_path: str = "data/datamart"
    dashboard_path: str = ""  # optional: static HTML dashboard (S12)
    ledger_path: str = "data/ledger"
    locks_path: str = "data/locks"
    truncate_before_insert: bool = True
    retry: RetryPolicy = field(default_factory=RetryPolicy)
    aggregates: tuple[AggSpec, ...] = ()
    # declarative data-quality suite over the day's silver rows
    # (operators.expectations.Expect tuples; same config-driven
    # contract as the aggregate specs)
    expectations: tuple = ()
    expectations_enforce: bool = False


def _text(root: ET.Element, path: str, default: str | None = None) -> str | None:
    el = root.find(path)
    return el.text.strip() if el is not None and el.text else default


def load_config(xml_path: str) -> EngineConfig:
    """Parse an engine config XML (same element shapes as the
    reference's config.xml where they carry over)."""
    root = ET.parse(xml_path).getroot()

    aggs = []
    for t in root.findall("./aggregates/table"):
        name = _text(t, "name")
        group_by = _text(t, "groupBy")
        metric = _text(t, "metrics/metric", "COUNT(*) AS total_jobs") or ""
        alias = metric.split(" AS ")[-1].strip() if " AS " in metric else "total_jobs"
        if name and group_by:
            aggs.append(AggSpec(name, group_by, alias))

    retry = RetryPolicy(
        max_attempts=int(_text(root, "./extract/retry/max_attempts", "3") or 3),
        retry_interval_sec=int(_text(root, "./extract/retry/retry_interval", "900") or 900),
    )

    # <expectations enforce="true"><expect name=".." kind=".." col=".."
    #   values="a,b" min=".." max=".." pattern=".." expr=".."/></expectations>
    from data_warehouse_nhom8_spark.operators.expectations import Expect

    exp_el = root.find("./expectations")
    expectations, enforce = [], False
    if exp_el is not None:
        enforce = (exp_el.get("enforce", "false").lower() == "true")
        for e in exp_el.findall("expect"):
            params: dict = {}
            if e.get("values") is not None:
                params["values"] = [v.strip() for v in e.get("values").split(",")]
            for num in ("min", "max"):
                if e.get(num) is not None:
                    raw = e.get(num)
                    params[num] = float(raw) if "." in raw else int(raw)
            for key in ("pattern", "expr"):
                if e.get(key) is not None:
                    params[key] = e.get(key)
            expectations.append(
                Expect(e.get("name"), e.get("kind"), e.get("col"), params)
            )

    return EngineConfig(
        bronze_path=_text(root, "./paths/bronze", "data/bronze") or "data/bronze",
        staging_path=_text(root, "./paths/staging", "data/staging") or "data/staging",
        warehouse_path=_text(root, "./paths/warehouse", "data/warehouse") or "data/warehouse",
        datamart_path=_text(root, "./paths/datamart", "data/datamart") or "data/datamart",
        dashboard_path=_text(root, "./paths/dashboard", "") or "",
        ledger_path=_text(root, "./paths/ledger", "data/ledger") or "data/ledger",
        locks_path=_text(root, "./paths/locks", "data/locks") or "data/locks",
        expectations=tuple(expectations),
        expectations_enforce=enforce,
        truncate_before_insert=(
            (_text(root, "./settings/truncateBeforeInsert", "true") or "true").lower()
            == "true"
        ),
        retry=retry,
        aggregates=tuple(aggs),
    )
