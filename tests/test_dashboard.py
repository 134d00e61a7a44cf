"""S12 chart/HTML sink: datamart aggregates render to a
self-contained SVG-bar-chart dashboard (reference datamart/app.py
twin)."""

from __future__ import annotations

from data_warehouse_nhom8_spark.pipeline.dashboard import render_dashboard
from data_warehouse_nhom8_spark.pipeline.datamart import AggSpec, rebuild_datamart


def _fact(spark):
    rows = (
        [("ACME", "HN") for _ in range(5)]
        + [("Beta<script>", "HCM") for _ in range(3)]
        + [("Gamma", "HN")]
    )
    return spark.createDataFrame(rows, "company_name string, location string")


SPECS = (
    AggSpec("agg_job_by_company", "company_name"),
    AggSpec("agg_job_by_location", "location"),
)


def test_render_dashboard(spark, tmp_path):
    dm = str(tmp_path / "dm")
    rebuild_datamart(_fact(spark), dm, SPECS)
    out = render_dashboard(spark, dm, str(tmp_path / "dash.html"), SPECS, top_n=10)
    page = open(out, encoding="utf-8").read()
    # one section per aggregate table
    assert "agg_job_by_company" in page and "agg_job_by_location" in page
    # bars: 3 companies + 2 locations
    assert page.count('<rect class="bar"') == 5
    # counts rendered; sorted desc -> ACME (5) is the first company bar
    assert ">5</text>" in page
    assert page.index("ACME") < page.index("Gamma")
    # labels are HTML-escaped (no raw script injection from data)
    assert "<script>" not in page
    assert "Beta&lt;script&gt;" in page
    # hover tooltips: every bar carries an SVG-native <title> with
    # "label: value" (Plotly-hover parity, still zero dependencies)
    assert page.count("<title>") == 5 + 1  # 5 bars + the page <title>
    assert "<title>ACME: 5</title>" in page


def test_render_dashboard_before_build(spark, tmp_path):
    out = render_dashboard(
        spark, str(tmp_path / "nope"), str(tmp_path / "dash.html"), SPECS
    )
    page = open(out, encoding="utf-8").read()
    assert page.count("(not built yet)") == 2


def test_render_dashboard_with_ledger_stacks_sources(spark, tmp_path):
    """Per-source breakdown (check_scraper_status.sh twin): stacked
    daily rows by source + the per-source health table."""
    import datetime

    from data_warehouse_nhom8_spark.pipeline.ledger import RunLedger

    dm = str(tmp_path / "dm")
    rebuild_datamart(_fact(spark), dm, SPECS)
    led = RunLedger(spark, str(tmp_path / "ledger"))
    d1, d2 = datetime.date(2025, 3, 10), datetime.date(2025, 3, 11)
    for day, rows_a, rows_b in ((d1, 100, 40), (d2, 120, 0)):
        for proc, n in (("extract_topcv", rows_a), ("extract_jobsgo", rows_b)):
            lid = led.open_run(proc, day)
            led.close_run(lid, proc, day, "Success", rows_processed=n)
    fid = led.open_run("extract_jobsgo", d2)
    led.close_run(fid, "extract_jobsgo", d2, "Failed", error_message="boom")

    out = render_dashboard(
        spark, dm, str(tmp_path / "dash.html"), SPECS, ledger=led
    )
    page = open(out, encoding="utf-8").read()
    # stacked chart section: legend lists both sources, segments carry
    # per-source tooltips, day totals rendered
    assert "rows processed by day &amp; source" in page
    assert "extract_topcv" in page and "extract_jobsgo" in page
    assert "<title>2025-03-10 / extract_topcv: 100</title>" in page
    assert "<title>2025-03-10 / extract_jobsgo: 40</title>" in page
    assert ">140</text>" in page  # d1 stacked total
    # zero-row segments are skipped, not rendered as stray rects
    assert "extract_jobsgo: 0" not in page
    # health table mirrors the reference STATISTICS query
    assert "source health" in page
    assert "<th>n_failed</th>" in page and "<td>1</td>" in page
