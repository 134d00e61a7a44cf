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


def render_dashboard(
    spark,
    dm_dir: str,
    html_path: str,
    specs: tuple[AggSpec, ...] = DEFAULT_SPECS,
    top_n: int = 20,
    title: str = "Job market datamart",
) -> str:
    """Render every datamart aggregate as a bar-chart section into one
    static HTML file; returns the path. Tables not built yet render as
    a placeholder (the reference dashboard shows empty charts the same
    way before the first datamart load)."""
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
    page = _PAGE.format(title=html.escape(title), sections="\n".join(sections))
    os.makedirs(os.path.dirname(html_path) or ".", exist_ok=True)
    with open(html_path, "w", encoding="utf-8") as fh:
        fh.write(page)
    return html_path
