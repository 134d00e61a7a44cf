"""Chart/HTML sink (SURVEY.md §2a S12) — the engine twin of the
reference's Flask+Plotly dashboard (reference datamart/app.py:36-66:
one bar chart per datamart aggregate table, sorted by count desc).

Rendered as a single self-contained static HTML file with inline-SVG
bar charts — zero runtime dependencies (this environment ships no
plotly/matplotlib, and a static artifact is the shape a scheduled
pipeline publishes anyway: the reference regenerates its dashboard
data on the same cron as the datamart load).

Scale posture: rendering reads only the datamart aggregate tables
(tiny by construction — one row per group), never the fact table, so
this sink is constant-cost regardless of warehouse size.
"""

from __future__ import annotations

import html
import os

from data_warehouse_nhom8_spark.pipeline.datamart import (
    DEFAULT_SPECS,
    AggSpec,
    serve_datamart,
)

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
 body {{ font-family: sans-serif; margin: 2rem; color: #222; }}
 h1 {{ font-size: 1.4rem; }} h2 {{ font-size: 1.1rem; margin-top: 2rem; }}
 .bar {{ fill: #4472c4; }} .bar:hover {{ fill: #2a4d8f; }}
 text {{ font-size: 12px; }} .count {{ fill: #444; }}
</style></head><body>
<h1>{title}</h1>
{sections}
</body></html>
"""

_BAR_H = 22
_CHART_W = 720
_LABEL_W = 260


def _svg_barchart(labels: list[str], counts: list[int]) -> str:
    """Horizontal bar chart as inline SVG (labels HTML-escaped).

    Hover parity with the reference's Plotly bars (datamart/app.py:
    px.bar → hover shows group + value) comes from a `<title>` child
    on each bar — the SVG-native tooltip, rendered by every browser
    with no script or library — plus the existing :hover fill."""
    if not counts:
        return "<p>(empty)</p>"
    peak = max(counts) or 1
    rows = []
    for i, (lab, n) in enumerate(zip(labels, counts)):
        y = i * _BAR_H
        w = int((_CHART_W - _LABEL_W - 70) * n / peak)
        lab = html.escape(str(lab) if lab is not None else "(null)")
        rows.append(
            f'<text x="{_LABEL_W - 6}" y="{y + 15}" text-anchor="end">{lab}</text>'
            f'<rect class="bar" x="{_LABEL_W}" y="{y + 3}" width="{max(w, 1)}" height="{_BAR_H - 6}">'
            f"<title>{lab}: {n}</title></rect>"
            f'<text class="count" x="{_LABEL_W + max(w, 1) + 6}" y="{y + 15}">{n}</text>'
        )
    height = len(counts) * _BAR_H + 4
    return (
        f'<svg width="{_CHART_W}" height="{height}" role="img">' + "".join(rows) + "</svg>"
    )


# categorical palette for stacked series (cycled when > 6 sources)
_SERIES_COLORS = ("#4472c4", "#ed7d31", "#70ad47", "#ffc000", "#7030a0", "#2aa6a6")


def _svg_stacked_barchart(labels: list[str], series: dict[str, list[int]]) -> str:
    """Horizontal STACKED bar chart: one row per label, one colored
    segment per series key, with a legend and per-segment SVG-native
    tooltips — the per-source breakdown view of the reference's
    status dashboard (extract/check_scraper_status.sh's per-src_id
    queries), rendered the same zero-dependency way as the plain
    bars."""
    if not labels or not series:
        return "<p>(empty)</p>"
    keys = sorted(series)
    colors = {k: _SERIES_COLORS[i % len(_SERIES_COLORS)] for i, k in enumerate(keys)}
    totals = [sum(series[k][i] for k in keys) for i in range(len(labels))]
    peak = max(totals) or 1
    span = _CHART_W - _LABEL_W - 70
    legend = "".join(
        f'<span style="color:{colors[k]}">&#9632;</span> {html.escape(k)} &nbsp; '
        for k in keys
    )
    rows = []
    for i, lab in enumerate(labels):
        y = i * _BAR_H
        lab_esc = html.escape(str(lab) if lab is not None else "(null)")
        rows.append(
            f'<text x="{_LABEL_W - 6}" y="{y + 15}" text-anchor="end">{lab_esc}</text>'
        )
        x = _LABEL_W
        for k in keys:
            n = series[k][i]
            if n <= 0:
                continue
            w = max(int(span * n / peak), 1)
            k_esc = html.escape(k)
            rows.append(
                f'<rect x="{x}" y="{y + 3}" width="{w}" height="{_BAR_H - 6}" '
                f'fill="{colors[k]}"><title>{lab_esc} / {k_esc}: {n}</title></rect>'
            )
            x += w
        rows.append(
            f'<text class="count" x="{x + 6}" y="{y + 15}">{totals[i]}</text>'
        )
    height = len(labels) * _BAR_H + 4
    return (
        f"<p>{legend}</p>"
        f'<svg width="{_CHART_W}" height="{height}" role="img">' + "".join(rows) + "</svg>"
    )


def _ledger_sections(ledger) -> list[str]:
    """Extract-status sections from the run ledger — the engine twin
    of check_scraper_status.sh's per-source breakdown: rows extracted
    per day STACKED by source, plus the per-source health table
    (reference STATISTICS query / v_scraper_stats)."""
    import pandas as pd  # noqa: F401  (toPandas dependency, tiny tables)

    ok = (
        ledger.latest_status()
        .filter("status = 'Success' AND rows_processed IS NOT NULL")
        .select("run_date", "process", "rows_processed")
        .toPandas()
    )
    sections = []
    if len(ok):
        days = sorted({str(d) for d in ok["run_date"]})
        procs = sorted(set(ok["process"]))
        cell = {
            (str(r.run_date), r.process): int(r.rows_processed)
            for r in ok.itertuples()
        }
        series = {p: [cell.get((d, p), 0) for d in days] for p in procs}
        sections.append(
            "<h2>rows processed by day &amp; source</h2>\n"
            + _svg_stacked_barchart(days, series)
        )
    stats = ledger.success_rate_view().toPandas()
    if len(stats):
        head = "".join(f"<th>{html.escape(c)}</th>" for c in stats.columns)
        body = "".join(
            "<tr>"
            + "".join(f"<td>{html.escape(str(v))}</td>" for v in row)
            + "</tr>"
            for row in stats.itertuples(index=False)
        )
        sections.append(
            "<h2>source health</h2>\n"
            f'<table border="1" cellpadding="4"><tr>{head}</tr>{body}</table>'
        )
    # volume drift: the silent-failure monitor — only flagged days
    # render (a healthy fleet shows an empty section header nothing)
    drift = ledger.volume_drift_view().toPandas()
    flagged = drift[drift["drift"]] if len(drift) else drift
    if len(flagged):
        head = "".join(f"<th>{html.escape(c)}</th>" for c in flagged.columns)
        body = "".join(
            "<tr>"
            + "".join(f"<td>{html.escape(str(v))}</td>" for v in row)
            + "</tr>"
            for row in flagged.itertuples(index=False)
        )
        sections.append(
            "<h2>volume drift (flagged days)</h2>\n"
            f'<table border="1" cellpadding="4"><tr>{head}</tr>{body}</table>'
        )
    return sections


def render_dashboard(
    spark,
    dm_dir: str,
    html_path: str,
    specs: tuple[AggSpec, ...] = DEFAULT_SPECS,
    top_n: int = 20,
    title: str = "Job market datamart",
    ledger=None,
) -> str:
    """Render every datamart aggregate as a bar-chart section into one
    static HTML file; returns the path. Tables not built yet render as
    a placeholder (the reference dashboard shows empty charts the same
    way before the first datamart load). Pass a `RunLedger` to append
    the per-source extract-status sections (stacked daily rows +
    health table)."""
    frames = serve_datamart(spark, dm_dir, specs)
    sections = []
    for s in specs:
        pdf = frames.get(s.table_name)
        if pdf is None:
            body = "<p>(not built yet)</p>"
        else:
            head = pdf.head(top_n)
            body = _svg_barchart(
                list(head[s.group_by]), [int(x) for x in head[s.count_alias]]
            )
        sections.append(f"<h2>{html.escape(s.table_name)}</h2>\n{body}")
    if ledger is not None:
        sections.extend(_ledger_sections(ledger))
    page = _PAGE.format(title=html.escape(title), sections="\n".join(sections))
    os.makedirs(os.path.dirname(html_path) or ".", exist_ok=True)
    with open(html_path, "w", encoding="utf-8") as fh:
        fh.write(page)
    return html_path
