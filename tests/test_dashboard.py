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
