"""Generate bench_report.html — the recall-vs-latency report artifact
the reference emits from its own bench run (examples/bench.rs:334-358,
plotly HTML). Reads the committed grids (BENCH_FULL.json "matched" at
N=10k and BENCH_1M.json at N=1M) and renders a static, dependency-free
HTML file: small multiples (one facet per index family), our ef-sweep
as the primary series, the reference baseline rows as the comparison
series, native per-mark tooltips, and a full data table.

Usage: python tools/bench_report.py [out.html]
"""

from __future__ import annotations

import html
import json
import math
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# validated two-series palette (dataviz skill, slots 1-2; both modes pass
# all six checks — see scripts/validate_palette.js run in round 7)
CSS = """
.viz-root { color-scheme: light;
  --surface-1:#fcfcfb; --text-primary:#0b0b0b; --text-secondary:#52514e;
  --grid:#e4e3e0; --series-ours:#2a78d6; --series-base:#eb6834; }
@media (prefers-color-scheme: dark) {
  :root:where(:not([data-theme="light"])) .viz-root { color-scheme: dark;
    --surface-1:#1a1a19; --text-primary:#ffffff; --text-secondary:#c3c2b7;
    --grid:#3a3936; --series-ours:#3987e5; --series-base:#d95926; } }
body { margin: 0; }
.viz-root { background: var(--surface-1); color: var(--text-primary);
  font: 13px/1.45 system-ui, sans-serif; padding: 24px; }
.viz-root h1 { font-size: 18px; margin: 0 0 4px; }
.viz-root .sub { color: var(--text-secondary); margin: 0 0 16px; }
.legend { display: flex; gap: 18px; margin: 0 0 10px; }
.legend span { display: inline-flex; align-items: center; gap: 6px;
  color: var(--text-secondary); }
.swatch { width: 14px; height: 3px; border-radius: 2px; display: inline-block; }
.grid-wrap { display: grid; grid-template-columns: repeat(auto-fill, minmax(320px, 1fr));
  gap: 20px; }
.facet h3 { font-size: 13px; margin: 0 0 2px; }
.facet .fsub { color: var(--text-secondary); font-size: 12px; margin: 0 0 4px; }
svg text { fill: var(--text-secondary); font: 11px system-ui, sans-serif; }
svg .axis line, svg .axis path { stroke: var(--grid); }
table { border-collapse: collapse; margin-top: 28px; font-size: 12px; }
th, td { padding: 3px 10px; text-align: right;
  border-bottom: 1px solid var(--grid); }
th { color: var(--text-secondary); font-weight: 600; }
td:first-child, th:first-child { text-align: left; }
"""

W, H = 340, 220
ML, MR, MT, MB = 46, 10, 8, 30


def _facet_svg(ours, base, y_max, y_min, x_min):
    """One facet: recall (x, linear) vs ms/query (y, log)."""
    ly0, ly1 = math.log10(y_min), math.log10(y_max)

    def sx(r):
        return ML + (r - x_min) / (1.0 - x_min + 1e-12) * (W - ML - MR)

    def sy(ms):
        f = (math.log10(ms) - ly0) / (ly1 - ly0 + 1e-12)
        return H - MB - f * (H - MT - MB)

    parts = [f'<svg viewBox="0 0 {W} {H}" role="img">']
    # gridlines: log decades on y, 3 ticks on x
    parts.append('<g class="axis">')
    d = math.ceil(ly0)
    while d <= math.floor(ly1 + 1e-9):
        y = sy(10 ** d)
        parts.append(f'<line x1="{ML}" y1="{y:.1f}" x2="{W - MR}" y2="{y:.1f}"/>')
        lab = f"{10 ** d:g}"
        parts.append(f'<text x="{ML - 6}" y="{y + 3:.1f}" text-anchor="end">{lab}</text>')
        d += 1
    for i in range(4):
        r = x_min + (1.0 - x_min) * i / 3
        x = sx(r)
        parts.append(
            f'<line x1="{x:.1f}" y1="{MT}" x2="{x:.1f}" y2="{H - MB}"/>'
            f'<text x="{x:.1f}" y="{H - MB + 14}" text-anchor="middle">{r:.2f}</text>'
        )
    parts.append(
        f'<text x="{(ML + W - MR) / 2:.0f}" y="{H - 4}" text-anchor="middle">recall@10</text>'
        f'<text x="12" y="{(MT + H - MB) / 2:.0f}" transform="rotate(-90 12 '
        f'{(MT + H - MB) / 2:.0f})" text-anchor="middle">ms / query (log)</text>'
    )
    parts.append("</g>")

    for pts, cls, dash in ((base, "series-base", ' stroke-dasharray="5 4"'),
                           (ours, "series-ours", "")):
        if not pts:
            continue
        pl = " ".join(f"{sx(r):.1f},{sy(m):.1f}" for _, r, m in pts)
        if len(pts) > 1:
            parts.append(
                f'<polyline points="{pl}" fill="none" stroke="var(--{cls})" '
                f'stroke-width="2"{dash}/>'
            )
        for ef, r, m in pts:
            who = "spark-graft" if cls == "series-ours" else "reference"
            parts.append(
                f'<circle cx="{sx(r):.1f}" cy="{sy(m):.1f}" r="4" '
                f'fill="var(--{cls})" stroke="var(--surface-1)" stroke-width="2">'
                f"<title>{who} ef={ef}: recall {r:.4f}, {m:.4f} ms/q</title></circle>"
            )
    # selective direct labels: first and last of our sweep
    for ef, r, m in (ours[:1] + ours[-1:] if ours else []):
        parts.append(
            f'<text x="{sx(r) + 6:.1f}" y="{sy(m) - 6:.1f}">ef={ef}</text>'
        )
    parts.append("</svg>")
    return "".join(parts)


def _rows(grid):
    fam = {}
    for g in grid:
        fam.setdefault(g["name"], []).append(g)
    return fam


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "bench_report.html")
    full = json.load(open(os.path.join(ROOT, "BENCH_FULL.json")))
    datasets = []
    if "matched" in full:
        m = full["matched"]
        datasets.append((f"N={m['n']:,} · dim={m['dim']} (matched-scale)", m))
    p1m = os.path.join(ROOT, "BENCH_1M.json")
    if os.path.exists(p1m):
        m = json.load(open(p1m))
        datasets.append((f"N={m['n']:,} · dim={m['dim']}", m))

    facets, table_rows = [], []
    for ds_label, ds in datasets:
        for name, rows in sorted(_rows(ds["grid"]).items()):
            rows = sorted(rows, key=lambda g: g.get("ef", 0))
            ours = [(g.get("ef", "-"), g["recall_at_10"], g["ms_per_query"]) for g in rows]
            base = [(g.get("ef", "-"), g["baseline_recall_at_10"], g["baseline_ms_per_query"])
                    for g in rows if "baseline_ms_per_query" in g]
            all_ms = [m_ for _, _, m_ in ours + base]
            all_r = [r_ for _, r_, _ in ours + base]
            y_max, y_min = max(all_ms) * 1.3, min(all_ms) / 1.3
            x_min = max(0.0, min(all_r) - 0.03)
            ratios = [g["ratio_vs_baseline"] for g in rows if "ratio_vs_baseline" in g]
            fsub = (f"vs baseline ratio {min(ratios):.2f}–{max(ratios):.2f}× (lower is faster)"
                    if ratios else "no baseline rows for this family")
            facets.append(
                f'<div class="facet"><h3>{html.escape(name)}</h3>'
                f'<p class="fsub">{html.escape(ds_label)} — {html.escape(fsub)}</p>'
                f"{_facet_svg(ours, base, y_max, y_min, x_min)}</div>"
            )
            for g in rows:
                table_rows.append(
                    f"<tr><td>{html.escape(name)}</td><td>{html.escape(ds_label)}</td>"
                    f"<td>{g.get('ef', '-')}</td><td>{g['recall_at_10']:.4f}</td>"
                    f"<td>{g['ms_per_query']:.4f}</td>"
                    f"<td>{g.get('baseline_ms_per_query', '')}</td>"
                    f"<td>{g.get('ratio_vs_baseline', '')}</td></tr>"
                )

    doc = f"""<!doctype html><html><head><meta charset="utf-8">
<title>spark-graft ANN bench report</title><style>{CSS}</style></head>
<body><div class="viz-root">
<h1>ANN serving: recall@10 vs latency</h1>
<p class="sub">ef-sweeps per index family; reference baseline (BASELINE.md, same
data/scale) overlaid where its grid rows align. Down and to the right is better.</p>
<div class="legend">
<span><span class="swatch" style="background:var(--series-ours)"></span>spark-graft</span>
<span><span class="swatch" style="background:var(--series-base)"></span>reference baseline</span>
</div>
<div class="grid-wrap">{''.join(facets)}</div>
<table><thead><tr><th>index</th><th>dataset</th><th>ef</th><th>recall@10</th>
<th>ms/q</th><th>baseline ms/q</th><th>ratio</th></tr></thead>
<tbody>{''.join(table_rows)}</tbody></table>
</div></body></html>"""
    with open(out_path, "w") as f:
        f.write(doc)
    print(f"wrote {out_path} ({len(facets)} facets, {len(table_rows)} table rows)")


if __name__ == "__main__":
    main()
