"""Self-contained HTML report renderer (S4) — the profiler's product surface.

Mirrors the reference's report structure (reference:
report/structure/report.py:229-314 builds Overview / Alerts / Variables /
Interactions / Correlations / Missing values / Sample / Duplicate rows;
per-variable toggleable detail tabs come from the per-type renderers under
report/structure/variables/). The reference renders a jinja2 widget tree with
bundled JS/CSS; this renderer is dependency-free — the stats dict becomes one
inline-styled HTML document with CSS-only tabs (radio inputs) and real SVG
charts. Pure driver-side string building over the already-aggregated
(bounded) profile result: nothing here touches Spark.
"""

from __future__ import annotations

import datetime as _dt
import html
import itertools as _itertools
import math
import warnings as _warnings
from typing import Any

_CSS = """
body{font-family:system-ui,sans-serif;margin:0;background:#f6f7f9;color:#1c2330}
.wrap{max-width:1150px;margin:0 auto;padding:24px}
h1{font-size:22px}h2{font-size:17px;margin:30px 0 10px;border-bottom:2px solid #e3e6eb;padding-bottom:4px}
h3{font-size:14px;margin:0 0 6px}
nav{position:sticky;top:0;background:#fff;border-bottom:1px solid #e3e6eb;padding:8px 24px;z-index:5}
nav a{margin-right:14px;font-size:13px;color:#1c4e9b;text-decoration:none}
.cards{display:grid;grid-template-columns:repeat(auto-fill,minmax(330px,1fr));gap:14px}
.card{background:#fff;border:1px solid #e3e6eb;border-radius:8px;padding:14px}
.varsec{background:#fff;border:1px solid #e3e6eb;border-radius:8px;padding:14px;margin-bottom:14px}
.vargrid{display:grid;grid-template-columns:minmax(240px,1fr) 2fr;gap:16px}
table.kv{border-collapse:collapse;width:100%;font-size:12.5px}
table.kv td,table.kv th{padding:2px 6px;border-bottom:1px solid #f0f1f4;text-align:left}
table.kv td:last-child{text-align:right;font-variant-numeric:tabular-nums}
.bar{background:#dbe4f0;height:12px;display:inline-block;vertical-align:middle}
.alert{display:inline-block;background:#fde8e8;color:#9b1c1c;border-radius:4px;
padding:2px 8px;margin:2px;font-size:12px}
.alert.info{background:#e8f0fd;color:#1c4e9b}
.type{color:#667085;font-size:12px}
.badge{display:inline-block;background:#eef1f5;color:#41516b;border-radius:4px;
padding:1px 7px;font-size:11px;margin-left:6px}
.matrix td{font-size:11px;padding:2px 5px;text-align:right}
.matrix th{font-size:11px;padding:2px 5px}
.tabs{margin-top:10px}
.tabs>input{display:none}
.tabs>label{display:inline-block;padding:5px 12px;font-size:12.5px;cursor:pointer;
border:1px solid #e3e6eb;border-bottom:none;border-radius:6px 6px 0 0;background:#f0f2f5;
color:#41516b;margin-right:2px}
.tabs>input:checked+label{background:#fff;font-weight:600;color:#1c2330}
.tabs .pane{display:none;border:1px solid #e3e6eb;border-radius:0 6px 6px 6px;
padding:12px;background:#fff}
svg.chart{background:#fbfcfe;border:1px solid #eef1f5;border-radius:4px}
.vardesc{color:#41516b;font-size:12.5px;font-style:italic;margin:4px 0}
h1 img.logo{height:28px;vertical-align:middle;margin-right:10px}
"""

# dark theme (html_theme="dark"): same structure, inverted surfaces — the
# dependency-free analogue of the reference's bootswatch themes
# (config_default.yaml:176-178). Appended after the base sheet, so every
# rule here shadows its light counterpart at equal specificity.
_DARK_CSS = """
body{background:#14181f;color:#d7dce4}
nav{background:#1b212b;border-bottom-color:#2a3342}
nav a{color:#7aa7e8}
h2{border-bottom-color:#2a3342}
.card,.varsec,.tabs .pane{background:#1b212b;border-color:#2a3342}
.tabs>label{background:#222a37;border-color:#2a3342;color:#9aa6b8}
.tabs>input:checked+label{background:#1b212b;color:#d7dce4}
table.kv td,table.kv th{border-bottom-color:#242c39}
.alert{background:#3a1d1d;color:#f1a0a0}
.alert.info{background:#1d2a3f;color:#8ab4f8}
.type{color:#8b96a8}
.badge{background:#242c39;color:#9aa6b8}
.vardesc{color:#9aa6b8}
svg.chart{background:#171c25;border-color:#242c39}
.bar{background:#2b3a52}
"""

# each tab group needs its panes toggled by its own radio set; generated rules
_TAB_RULE = (
    ".tabs>input:nth-of-type({i}):checked~.pane:nth-of-type({i})"
    "{{display:block}}"
)
_MAX_TABS = 8
_CSS += "".join(_TAB_RULE.format(i=i) for i in range(1, _MAX_TABS + 1))


def _fmt(v: Any) -> str:
    if v is None:
        return "—"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        return f"{v:,.4g}"
    if isinstance(v, int):
        return f"{v:,}"
    return html.escape(str(v))


def _kv_table(pairs: list[tuple[str, Any]]) -> str:
    rows = "".join(
        f"<tr><td>{html.escape(str(k))}</td><td>{_fmt(v)}</td></tr>"
        for k, v in pairs
    )
    return f"<table class='kv'>{rows}</table>"


# radio-group names must be unique document-wide; itertools.count is a
# GIL-atomic id source (the old mutable-list counter raced under threads)
_tab_counter = _itertools.count(1)


def _tabs(entries: list[tuple[str, str]]) -> str:
    """CSS-only tab group (radio inputs; no JS). ``entries`` = [(label, html)]."""
    nonempty = [e for e in entries if e[1]]
    if len(nonempty) > _MAX_TABS:
        _warnings.warn(
            f"_tabs: {len(nonempty)} entries, rendering only the first "
            f"{_MAX_TABS} ({[e[0] for e in nonempty[_MAX_TABS:]]} dropped)",
            stacklevel=2,
        )
    entries = nonempty[:_MAX_TABS]
    if not entries:
        return ""
    g = f"tg{next(_tab_counter)}"
    inputs, panes = [], []
    for i, (label, content) in enumerate(entries):
        tid = f"{g}_{i}"
        checked = " checked" if i == 0 else ""
        inputs.append(
            f"<input type='radio' name='{g}' id='{tid}'{checked}>"
            f"<label for='{tid}'>{html.escape(label)}</label>"
        )
        panes.append(f"<div class='pane'>{content}</div>")
    return f"<div class='tabs'>{''.join(inputs)}{''.join(panes)}</div>"


# --------------------------------------------------------------------------------
# SVG charts (reference renders matplotlib images; these are equivalent vector
# marks built from the same bounded aggregates)
# --------------------------------------------------------------------------------


def _svg_histogram(hist: dict, width: int = 420, height: int = 110,
                   datetime_axis: bool = False) -> str:
    counts = hist.get("counts") or []
    edges = hist.get("bin_edges") or []
    if not counts:
        return ""
    peak = max(counts) or 1
    n = len(counts)
    pad, axis_h = 4, 14
    bw = (width - 2 * pad) / n
    bars = []
    for i, c in enumerate(counts):
        bh = max(1.0, (height - axis_h - 2 * pad) * c / peak)
        x = pad + i * bw
        y = height - axis_h - pad - bh
        bars.append(
            f"<rect x='{x:.1f}' y='{y:.1f}' width='{max(bw - 1, 0.5):.1f}'"
            f" height='{bh:.1f}' fill='#5b8def'><title>{c:,}</title></rect>"
        )

    def _edge(v: Any) -> str:
        if datetime_axis:
            try:
                return _dt.datetime.utcfromtimestamp(float(v)).strftime(
                    "%Y-%m-%d"
                )
            except (OverflowError, OSError, ValueError):
                return _fmt(v)
        return _fmt(float(v)) if isinstance(v, (int, float)) else _fmt(v)

    labels = ""
    if len(edges) >= 2:
        labels = (
            f"<text x='{pad}' y='{height - 2}' font-size='9'"
            f" fill='#667085'>{_edge(edges[0])}</text>"
            f"<text x='{width - pad}' y='{height - 2}' font-size='9'"
            f" fill='#667085' text-anchor='end'>{_edge(edges[-1])}</text>"
        )
    return (
        f"<svg class='chart' data-chart='histogram' width='{width}'"
        f" height='{height}' viewBox='0 0 {width} {height}'"
        f" xmlns='http://www.w3.org/2000/svg'>{''.join(bars)}{labels}</svg>"
    )


def _svg_missing_bar(counts: dict[str, int], n_rows: int,
                     width: int = 640) -> str:
    if not counts:
        return ""
    row_h, gap, label_w = 16, 3, 170
    height = (row_h + gap) * len(counts) + 6
    bars = []
    for i, (col, miss) in enumerate(counts.items()):
        present = (n_rows - miss) / n_rows if n_rows else 0
        y = 3 + i * (row_h + gap)
        bw = (width - label_w - 60) * present
        bars.append(
            f"<text x='{label_w - 6}' y='{y + 12}' font-size='11'"
            f" text-anchor='end' fill='#41516b'>"
            f"{html.escape(str(col)[:24])}</text>"
            f"<rect x='{label_w}' y='{y}' width='{bw:.1f}' height='{row_h}'"
            f" fill='#5b8def'/>"
            f"<text x='{label_w + bw + 4:.1f}' y='{y + 12}' font-size='10'"
            f" fill='#667085'>{n_rows - miss:,}</text>"
        )
    return (
        f"<svg class='chart' data-chart='missing-bar' width='{width}'"
        f" height='{height}' viewBox='0 0 {width} {height}'"
        f" xmlns='http://www.w3.org/2000/svg'>{''.join(bars)}</svg>"
    )


def _svg_scatter(grid: list[dict], bins: int, size: int = 170) -> str:
    if not grid:
        return ""
    peak = max(g["cnt"] for g in grid) or 1
    cell = size / bins
    rects = []
    for g in grid:
        # y axis flipped so larger y is up
        x = g["x_bucket"] * cell
        y = (bins - 1 - g["y_bucket"]) * cell
        alpha = 0.15 + 0.85 * (g["cnt"] / peak)
        rects.append(
            f"<rect x='{x:.1f}' y='{y:.1f}' width='{cell:.1f}'"
            f" height='{cell:.1f}' fill='#5b8def' fill-opacity='{alpha:.2f}'>"
            f"<title>{g['cnt']:,}</title></rect>"
        )
    return (
        f"<svg class='chart' data-chart='scatter' width='{size}'"
        f" height='{size}' viewBox='0 0 {size} {size}'"
        f" xmlns='http://www.w3.org/2000/svg'>{''.join(rects)}</svg>"
    )


# --------------------------------------------------------------------------------
# frequency / extreme tables (reference: frequency_table_utils.py:4-117)
# --------------------------------------------------------------------------------


#: categorical palette for the composition donut — chosen to read on both
#: the light and dark theme surfaces (like the fixed #5b8def mark color)
_PIE_COLORS = [
    "#5b8def", "#e8743b", "#19a979", "#945ecf", "#13a4b4",
    "#d82c6b", "#6c8893", "#e0b500", "#2f6497", "#bd49c6",
]

#: the reference renders a pie for categoricals with at most this many
#: distinct values (config_default.yaml plot.pie.max_unique: 10,
#: visualisation/plot.py:191-216); beyond it only the frequency table
_PIE_MAX_UNIQUE = 10


def _svg_pie(v: dict, size: int = 130, legend_w: int = 220) -> str:
    """Composition donut for a low-cardinality column: one slice per
    value from ``top_values`` (complete when n_distinct ≤ the gate) plus
    a muted missing slice, with a value/percent legend. Pure SVG circle
    strokes — no plotting dependency."""
    top = v.get("top_values") or []
    n_missing = v.get("n_missing") or 0
    count = v.get("count") or 0
    total = count + n_missing
    if not top or not total:
        return ""
    slices = [(str(t["value"]), int(t["count"])) for t in top]
    covered = sum(c for _, c in slices)
    if count - covered > 0:  # defensive: truncated top list
        slices.append(("(Other)", count - covered))
    if n_missing:
        slices.append(("(Missing)", n_missing))
    r = size * 0.32
    cx = cy = size / 2
    circ = 2 * math.pi * r
    parts, cum = [], 0.0
    height = max(size, 16 * len(slices) + 8)
    for i, (label, cnt) in enumerate(slices):
        frac = cnt / total
        color = (
            "#98a2b3" if label == "(Missing)"
            else _PIE_COLORS[i % len(_PIE_COLORS)]
        )
        parts.append(
            f"<circle r='{r:.1f}' cx='{cx}' cy='{cy}' fill='none'"
            f" stroke='{color}' stroke-width='{size * 0.18:.1f}'"
            f" stroke-dasharray='{frac * circ:.2f} {circ:.2f}'"
            f" stroke-dashoffset='{-cum * circ:.2f}'"
            f" transform='rotate(-90 {cx} {cy})'>"
            f"<title>{html.escape(label)[:60]}: {cnt:,}</title></circle>"
        )
        ly = 12 + 16 * i
        parts.append(
            f"<rect x='{size + 8}' y='{ly - 8}' width='9' height='9'"
            f" fill='{color}'/>"
            f"<text x='{size + 22}' y='{ly}' font-size='11'"
            f" fill='#667085'>{html.escape(label)[:24]}"
            f" — {100 * frac:.1f}%</text>"
        )
        cum += frac
    width = size + legend_w
    return (
        f"<svg class='chart' data-chart='pie' width='{width}'"
        f" height='{height}' viewBox='0 0 {width} {height}'"
        f" xmlns='http://www.w3.org/2000/svg'>{''.join(parts)}</svg>"
    )


def _freq_table(v: dict, max_rows: int = 10) -> str:
    top = v.get("top_values") or []
    count = v.get("count") or 0
    if not top:
        return ""
    shown = top[:max_rows]
    shown_total = sum(t["count"] for t in shown)
    rows = []
    for tv in shown:
        frac = tv["count"] / count if count else 0
        rows.append(
            f"<tr><td style='max-width:220px;overflow:hidden;"
            f"text-overflow:ellipsis'>{html.escape(str(tv['value']))[:60]}</td>"
            f"<td>{tv['count']:,}</td><td>{100 * frac:.1f}%</td>"
            f"<td><span class='bar' style='width:{int(120 * frac)}px'></span>"
            f"</td></tr>"
        )
    n_distinct = v.get("n_distinct") or 0
    other = count - shown_total
    if n_distinct > len(shown) and other > 0:
        rows.append(
            f"<tr><td>Other values ({n_distinct - len(shown):,})</td>"
            f"<td>{other:,}</td>"
            f"<td>{100 * other / count if count else 0:.1f}%</td><td></td></tr>"
        )
    n_missing = v.get("n_missing") or 0
    if n_missing:
        n = v.get("n") or (count + n_missing)
        rows.append(
            f"<tr><td>(Missing)</td><td>{n_missing:,}</td>"
            f"<td>{100 * n_missing / n if n else 0:.1f}%</td><td></td></tr>"
        )
    return (
        "<table class='kv' data-table='frequency'>"
        "<tr><th>Value</th><th>Count</th><th>Freq</th><th></th></tr>"
        + "".join(rows) + "</table>"
    )


def _extreme_table(rows: list[dict]) -> str:
    if not rows:
        return ""
    body = "".join(
        f"<tr><td>{html.escape(str(r['value']))[:60]}</td>"
        f"<td>{r['count']:,}</td></tr>"
        for r in rows
    )
    return (
        "<table class='kv' data-table='extreme'>"
        f"<tr><th>Value</th><th>Count</th></tr>{body}</table>"
    )


# --------------------------------------------------------------------------------
# per-variable sections (reference: report/structure/variables/render_*.py)
# --------------------------------------------------------------------------------

_COMMON = ["n_distinct", "p_distinct", "n_missing", "p_missing", "n_unique",
           "is_unique", "mode", "mode_count"]
_NUMERIC_Q = [("Minimum", "min"), ("5th percentile", "q_0_05"),
              ("Q1", "q_0_25"), ("Median", "q_0_5"), ("Q3", "q_0_75"),
              ("95th percentile", "q_0_95"), ("Maximum", "max"),
              ("Range", "range"), ("IQR", "iqr")]
_NUMERIC_D = [("Mean", "mean"), ("Standard deviation", "std"),
              ("Variance", "variance"), ("CV", "cv"), ("MAD", "mad"),
              ("Skewness", "skewness"), ("Kurtosis", "kurtosis"),
              ("Sum", "sum"), ("Zeros", "n_zeros"), ("Zeros %", "p_zeros"),
              ("Negative", "n_negative"), ("Infinite", "n_infinite"),
              ("NaN", "n_nan"), ("Monotonic", "monotonic"),
              ("χ² (uniformity)", "chi_squared")]
_CAT_STATS = [("Max length", "max_length"), ("Mean length", "mean_length"),
              ("Min length", "min_length"), ("Empty strings", "n_empty"),
              ("Date-like", "date_like"), ("χ² (uniformity)", "chi_squared")]


def _var_section(
    name: str, v: dict, alerts: list[dict], description: "str | None" = None
) -> str:
    vtype = str(v.get("type"))
    own_alerts = "".join(
        f"<span class='alert{' info' if a['type'] in ('UNIQUE', 'UNIFORM') else ''}'>"
        f"{a['type']}</span>"
        for a in alerts
        if a.get("column") == name
    )
    overview = _kv_table(
        [("Distinct", v.get("n_distinct")),
         ("Distinct %", v.get("p_distinct")),
         ("Missing", v.get("n_missing")),
         ("Missing %", v.get("p_missing")),
         ("Unique (occur once)", v.get("n_unique")),
         ("Mode", v.get("mode")),
         ("Count", v.get("count"))]
    )

    tabs: list[tuple[str, str]] = []
    if vtype == "Numeric":
        tabs.append((
            "Statistics",
            "<div class='vargrid'>"
            + _kv_table([(lbl, v.get(k)) for lbl, k in _NUMERIC_Q
                         if v.get(k) is not None])
            + _kv_table([(lbl, v.get(k)) for lbl, k in _NUMERIC_D
                         if v.get(k) is not None])
            + "</div>",
        ))
        if v.get("histogram"):
            tabs.append(("Histogram", _svg_histogram(v["histogram"])))
        tabs.append(("Common values", _freq_table(v)))
        ext = v.get("extreme_obs") or {}
        if ext.get("min"):
            tabs.append(("Minimum values", _extreme_table(ext["min"])))
        if ext.get("max"):
            tabs.append(("Maximum values", _extreme_table(ext["max"])))
    elif vtype == "Categorical":
        tabs.append(("Common values", _freq_table(v)))
        # compact composition donut for low-cardinality columns (reference
        # plot.pie.max_unique gate) — top_values is complete under the gate
        if 0 < (v.get("n_distinct") or 0) <= _PIE_MAX_UNIQUE:
            pie = _svg_pie(v)
            if pie:
                tabs.append(("Composition", pie))
        tabs.append((
            "Length & content",
            _kv_table([(lbl, v.get(k)) for lbl, k in _CAT_STATS
                       if v.get(k) is not None]),
        ))
        # complex-refined strings: numeric view + re×im density (the
        # reference's scatter_complex — visualisation/plot.py:191-216)
        if v.get("complex_stats"):
            cs = v["complex_stats"]
            body = _kv_table([
                ("Mean (re)", cs.get("mean_re")),
                ("Mean (im)", cs.get("mean_im")),
                ("Mean |z|", cs.get("mean_abs")),
                ("Min |z|", cs.get("min_abs")),
                ("Max |z|", cs.get("max_abs")),
                ("Invalid", cs.get("n_invalid")),
                ("Zeros", cs.get("n_zero")),
            ])
            if v.get("complex_scatter"):
                body += _svg_scatter(v["complex_scatter"], bins=16)
            tabs.append(("Complex", body))
        # path columns whose values are existing files: size/mtime rollup
        # (reference File type, summary_algorithms.py:384-405)
        if v.get("file_stats"):
            fsv = v["file_stats"]
            tabs.append((
                "File",
                _kv_table([
                    ("Paths", fsv.get("n_paths")),
                    ("Existing", fsv.get("n_existing")),
                    ("Min size", fsv.get("min_size")),
                    ("Mean size", fsv.get("mean_size")),
                    ("Max size", fsv.get("max_size")),
                    ("Total size", fsv.get("total_size")),
                ]),
            ))
        # image-path columns: dimension/format rollup (reference Image type,
        # summary_algorithms.py:407-428)
        if v.get("image_stats"):
            isv = v["image_stats"]
            body = _kv_table([
                ("Decoded", isv.get("n_decoded")),
                ("Min width", isv.get("min_width")),
                ("Max width", isv.get("max_width")),
                ("Min height", isv.get("min_height")),
                ("Max height", isv.get("max_height")),
            ])
            dist = isv.get("format_dist") or {}
            if dist:
                body += _kv_table(sorted(dist.items(), key=lambda kv: -kv[1]))
            tabs.append(("Image", body))
        # long-text columns: corpus-level language/quality rollup
        if v.get("text_stats"):
            ts = v["text_stats"]
            body = _kv_table([
                ("Mean quality", ts.get("mean_quality_score")),
                ("Mean tokens/doc", ts.get("mean_tokens")),
                ("Total tokens", ts.get("total_tokens")),
                ("Distinct-token ratio", ts.get("mean_distinct_token_ratio")),
            ])
            dist = v.get("language_dist") or {}
            if dist:
                body += _kv_table(
                    sorted(dist.items(), key=lambda kv: -kv[1])
                )
            tabs.append(("Text", body))
    elif vtype == "Boolean":
        tabs.append((
            "Values",
            _kv_table([("True", v.get("n_true")), ("False", v.get("n_false"))])
            + _freq_table(v)
            + _svg_pie(v),
        ))
    elif vtype == "DateTime":
        tabs.append((
            "Statistics",
            _kv_table([("Minimum", v.get("min")), ("Maximum", v.get("max")),
                       ("Range", v.get("range"))]),
        ))
        if v.get("histogram"):
            tabs.append(
                ("Histogram", _svg_histogram(v["histogram"],
                                             datetime_axis=True))
            )
        ext = v.get("extreme_obs") or {}
        if ext.get("min"):
            tabs.append(("Minimum values", _extreme_table(ext["min"])))
        if ext.get("max"):
            tabs.append(("Maximum values", _extreme_table(ext["max"])))
    else:
        tabs.append(("Common values", _freq_table(v)))

    # constant-dimension float-array columns (Array vtype): embedding
    # health profile (ragged dims / zero vectors / non-finite components /
    # norms) from the explorative embedding refinement
    if v.get("embedding_stats"):
        es = v["embedding_stats"]
        # a ragged column (dim_min != dim_max) is exactly what these stats
        # exist to surface — render the RANGE, not a misleading single value
        dim_lo, dim_hi = es.get("dim_min"), es.get("dim_max")
        dim_disp = (
            f"{dim_lo}–{dim_hi} (ragged)"
            if dim_lo is not None and dim_hi is not None and dim_lo != dim_hi
            else dim_lo
        )
        tabs.append((
            "Embedding",
            _kv_table([
                ("Dimension", dim_disp),
                ("Vectors", es.get("n")),
                ("Null vectors", es.get("n_null")),
                ("Zero vectors", es.get("n_zero_vectors")),
                ("Non-finite vectors", es.get("n_nonfinite_vectors")),
                ("Norm min", es.get("norm_min")),
                ("Norm mean", es.get("norm_mean")),
                ("Norm median", es.get("norm_p50")),
                ("Norm max", es.get("norm_max")),
            ]),
        ))

    # binary payload columns: full-data format mix + byte sizes, and the
    # sampled per-modality header stats when a media family dominates
    # (explorative binary refinement)
    if v.get("binary_stats"):
        bs = v["binary_stats"]
        body = _kv_table([
            ("Min bytes", bs.get("min_bytes")),
            ("Mean bytes", bs.get("mean_bytes")),
            ("Max bytes", bs.get("max_bytes")),
        ])
        dist = bs.get("format_dist") or {}
        if dist:
            body += _kv_table(
                sorted(dist.items(), key=lambda kv: (-kv[1], kv[0]))
            )
        ms = v.get("media_stats")
        if ms:
            body += _kv_table(
                [("Sampled", ms.get("n_sampled")),
                 ("Parsed", ms.get("n_parsed"))]
                + [
                    (k.replace("_", " ").capitalize(), val)
                    for k, val in sorted(ms.items())
                    if k.startswith(("min_", "max_")) and val is not None
                ]
            )
        tabs.append((
            (v.get("type_refined") or "binary").capitalize()
            if v.get("media_stats")
            else "Binary",
            body,
        ))

    desc_html = (
        f"<p class='vardesc' data-section='description'>"
        f"{html.escape(description)}</p>"
        if description
        else ""
    )
    return (
        f"<div class='varsec' data-section='variable'"
        f" data-var-type='{html.escape(vtype)}' id='var-{html.escape(name)}'>"
        f"<h3>{html.escape(name)}<span class='badge'>{html.escape(vtype)}"
        f"</span></h3><div class='type'>n={_fmt(v.get('n'))}"
        f" · missing={_fmt(v.get('n_missing'))}</div>{desc_html}{own_alerts}"
        f"<div class='vargrid'><div>{overview}</div><div>{_tabs(tabs)}</div>"
        f"</div></div>"
    )


# --------------------------------------------------------------------------------
# page assembly
# --------------------------------------------------------------------------------


def _matrix_table(matrix: dict[str, dict[str, Any]]) -> str:
    cols = sorted(matrix.keys())
    head = "".join(f"<th>{html.escape(c)}</th>" for c in cols)
    rows = []
    for a in cols:
        cells = []
        for b in cols:
            val = 1.0 if a == b else matrix.get(a, {}).get(b)
            if val is None:
                cells.append("<td>—</td>")
            else:
                shade = int(255 - min(abs(val), 1.0) * 120)
                cells.append(
                    f"<td style='background:rgb({shade},{shade},255)'>"
                    f"{val:.2f}</td>"
                )
        rows.append(f"<tr><th>{html.escape(a)}</th>{''.join(cells)}</tr>")
    return (
        "<div class='card' style='overflow-x:auto'><table class='matrix'>"
        f"<tr><th></th>{head}</tr>{''.join(rows)}</table></div>"
    )


def _sample_table(rows: list[dict]) -> str:
    if not rows:
        return ""
    cols = list(rows[0].keys())
    head = "".join(f"<th>{html.escape(c)}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{_fmt(r.get(c))}</td>" for c in cols) + "</tr>"
        for r in rows
    )
    return (
        "<div style='overflow-x:auto'>"
        f"<table class='kv'><tr>{head}</tr>{body}</table></div>"
    )


def render_html(result: "Any", title: "str | None" = None) -> str:
    """ProfileResult (or its as_dict()) -> standalone HTML string.

    ``title`` falls back to ``metadata["title"]`` (the config's ``title``
    field). Dataset metadata, per-variable descriptions, and the style
    surface (``html_primary_color`` / ``html_logo`` / ``html_navbar`` /
    ``html_full_width``) ride ``metadata`` — reference:
    config_default.yaml:1-17,172-194, report/structure/overview.py:73-114."""
    d = result.as_dict() if hasattr(result, "as_dict") else result
    table = d["table"]
    variables = d["variables"]
    alerts = d.get("alerts") or []
    missing = d.get("missing") or {}
    scatter = d.get("scatter") or {}
    duplicates = d.get("duplicates") or []
    meta = d.get("metadata") or {}
    style = meta.get("style") or {}
    if title is None:
        title = str(meta.get("title") or "Data profile")
    var_desc = (
        (meta.get("variable_descriptions") or {})
        if meta.get("show_variable_description", True)
        else {}
    )

    nav_items = [("overview", "Overview"), ("alerts", "Alerts"),
                 ("variables", "Variables")]
    if scatter:
        nav_items.append(("interactions", "Interactions"))
    if d.get("correlations"):
        nav_items.append(("correlations", "Correlations"))
    nav_items += [("missing", "Missing values"), ("sample", "Sample")]
    if duplicates:
        nav_items.append(("duplicates", "Duplicate rows"))
    segments = d.get("segments") or {}
    if segments.get("segments"):
        nav_items.append(("segments", "Segments"))
    timeseries = d.get("timeseries") or {}
    if timeseries.get("columns"):
        nav_items.append(("timeseries", "Time series"))
    layout = d.get("layout") or {}
    if layout:
        nav_items.append(("layout", "Layout"))
    relevance = d.get("relevance") or []
    if relevance:
        nav_items.append(("relevance", "Target relevance"))
    relationships = d.get("relationships") or []
    key_candidates = d.get("key_candidates") or []
    if relationships or key_candidates:
        nav_items.append(("relationships", "Relationships"))
    nav = (
        "<nav data-section='nav'>" + "".join(
            f"<a href='#{anchor}'>{label}</a>" for anchor, label in nav_items
        ) + "</nav>"
        if style.get("navbar", True)
        else ""
    )

    # style overrides appended AFTER the base sheet so they win on equal
    # specificity (reference html.style.{theme, primary_color, full_width},
    # config_default.yaml:176-186)
    extra_css = ""
    theme = style.get("theme")
    if theme not in (None, "", "dark"):
        raise ValueError(
            f"unknown html theme {theme!r}; supported: None (light), 'dark'"
        )
    if theme == "dark":
        extra_css += _DARK_CSS
    color = style.get("primary_color")
    if color:
        c = html.escape(str(color))
        # chrome only — chart rects keep their per-cell computed fills
        # (a blanket svg rect{fill:} rule would override the scatter
        # heatmap's presentation attributes)
        extra_css += (
            f"nav a{{color:{c}}}.alert.info{{color:{c}}}"
            f"h2{{border-bottom-color:{c}}}"
        )
    if style.get("full_width"):
        extra_css += ".wrap{max-width:none}"
    logo = style.get("logo")
    logo_html = (
        f"<img class='logo' src='{html.escape(str(logo), quote=True)}'"
        f" alt='logo'>"
        if logo
        else ""
    )

    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        f"<title>{html.escape(title)}</title>"
        f"<style>{_CSS}{extra_css}</style></head>",
        f"<body>{nav}<div class='wrap'>",
        f"<h1>{logo_html}{html.escape(title)}</h1>",
        # overview (reference: get_dataset_overview, report.py:40-90)
        "<h2 id='overview' data-section='overview'>Overview</h2>"
        "<div class='cards'><div class='card'><h3>Dataset statistics</h3>",
        _kv_table(
            [("Number of rows", table.get("n")),
             ("Number of variables", table.get("n_var")),
             ("Missing cells", table.get("n_cells_missing")),
             ("Missing cells (%)", table.get("p_cells_missing")),
             ("Duplicate rows", table.get("n_duplicates")),
             ("Duplicate rows (%)", table.get("p_duplicates")),
             ("Variables with missing", table.get("n_vars_with_missing"))]
        ),
        "</div><div class='card'><h3>Variable types</h3>",
        _kv_table(sorted((table.get("types") or {}).items())),
        "</div><div class='card'><h3>Reproduction</h3>",
        _kv_table(
            [("Engine", (d.get("package") or {}).get("engine")),
             ("Version", (d.get("package") or {}).get("version")),
             ("Duration (s)", (d.get("analysis") or {}).get("duration_sec")),
             ("Exact tier", (d.get("analysis") or {}).get("exact"))]
        ),
        "</div>",
    ]

    # user-supplied dataset metadata (reference: get_dataset_schema,
    # report/structure/overview.py:73-114 — Description/Creator/Author/
    # URL/Copyright as an overview "Dataset" card)
    ds = meta.get("dataset") or {}
    if ds:
        rows: list[tuple] = [
            (key.capitalize(), ds[key])
            for key in ("description", "creator", "author")
            if ds.get(key)
        ]
        if ds.get("url"):
            u = html.escape(str(ds["url"]), quote=True)
            rows.append(
                ("URL", f"<a href='{u}'>{u}</a>")
            )
        if ds.get("copyright_holder"):
            holder = str(ds["copyright_holder"])
            year = str(ds.get("copyright_year") or "")
            rows.append(
                ("Copyright", f"(c) {holder} {year}".rstrip())
            )
        # the URL row is pre-escaped markup; _fmt escapes the rest
        body = "".join(
            f"<tr><td>{html.escape(str(k))}</td><td>"
            + (v if k == "URL" else _fmt(v))
            + "</td></tr>"
            for k, v in rows
        )
        parts.append(
            "<div class='card' data-section='dataset'><h3>Dataset</h3>"
            f"<table class='kv'>{body}</table></div>"
        )
    parts.append("</div>")

    # alerts (reference: get_dataset_warnings)
    parts.append("<h2 id='alerts' data-section='alerts'>Alerts"
                 f" <span class='badge'>{len(alerts)}</span></h2>"
                 "<div class='card'>")
    if alerts:
        for a in alerts:
            col = f" · {a['column']}" if a.get("column") else ""
            cls = "alert info" if a["type"] in ("UNIQUE", "UNIFORM") else "alert"
            parts.append(
                f"<span class='{cls}'>{a['type']}{html.escape(col)}</span>"
            )
    else:
        parts.append("<span class='type'>No alerts.</span>")
    parts.append("</div>")

    # variables — one full section per column with per-type detail tabs
    parts.append("<h2 id='variables' data-section='variables'>Variables</h2>")
    for name, v in variables.items():
        parts.append(_var_section(name, v, alerts, var_desc.get(name)))

    # interactions (reference: get_interactions; aggregate-then-plot)
    if scatter:
        parts.append("<h2 id='interactions' data-section='interactions'>"
                     "Interactions</h2><div class='cards'>")
        for a, inner in scatter.items():
            for b, spec in inner.items():
                parts.append(
                    f"<div class='card'><h3>{html.escape(a)} ×"
                    f" {html.escape(b)}</h3>"
                    + _svg_scatter(spec.get("grid") or [],
                                   spec.get("bins") or 24)
                    + "</div>"
                )
        parts.append("</div>")

    # correlations — one tab per measure (reference: get_correlation_items)
    correlations = d.get("correlations") or {}
    if correlations:
        parts.append("<h2 id='correlations' data-section='correlations'>"
                     "Correlations</h2>")
        parts.append(_tabs([
            (measure, _matrix_table(matrix))
            for measure, matrix in correlations.items()
        ]))

    # missing values (reference: get_missing_items — bar/matrix/heatmap/dendro)
    parts.append("<h2 id='missing' data-section='missing'>Missing values</h2>")
    miss_tabs: list[tuple[str, str]] = []
    if missing.get("counts"):
        miss_tabs.append(
            ("Count", _svg_missing_bar(missing["counts"], table.get("n") or 0))
        )
    if missing.get("nullity_correlation"):
        miss_tabs.append(
            ("Heatmap", _matrix_table(missing["nullity_correlation"]))
        )
    dendro = missing.get("dendrogram") or {}
    if dendro.get("merges"):
        cols = dendro.get("columns") or []
        labels = {i: str(c) for i, c in enumerate(cols)}
        rows = []
        for step, m in enumerate(dendro["merges"]):
            a, b, dist = m[0], m[1], m[2]
            merged = f"{labels.get(a, f'cluster {a}')} + {labels.get(b, f'cluster {b}')}"
            labels[len(cols) + step] = f"({merged})"
            rows.append((merged, round(float(dist), 4)))
        miss_tabs.append((
            "Dendrogram",
            "<table class='kv' data-table='dendrogram'>"
            "<tr><th>Merge</th><th>Distance</th></tr>"
            + "".join(
                f"<tr><td>{html.escape(m)}</td><td>{d_}</td></tr>"
                for m, d_ in rows
            )
            + "</table>",
        ))
    parts.append(_tabs(miss_tabs) or "<div class='card'>"
                 "<span class='type'>No missing-value data.</span></div>")

    # samples (reference: get_sample_items — head/tail/random tabs)
    sample = d.get("sample") or {}
    parts.append("<h2 id='sample' data-section='sample'>Sample</h2>")
    parts.append(_tabs([
        ("First rows", _sample_table(sample.get("head") or [])),
        ("Random sample", _sample_table(sample.get("random") or [])),
        ("Last rows", _sample_table(sample.get("tail") or [])),
    ]) or "<div class='card'><span class='type'>No sample.</span></div>")

    # duplicates (reference: get_duplicates_items)
    if duplicates:
        parts.append("<h2 id='duplicates' data-section='duplicates'>"
                     "Duplicate rows</h2><div class='card'>")
        parts.append(_sample_table(duplicates))
        parts.append("</div>")

    # per-segment tier (segment_by= config; beyond the reference): numeric
    # summaries and top values per segment of the chosen column
    if segments.get("segments"):
        by = segments.get("by") or ""
        parts.append(
            f"<h2 id='segments' data-section='segments'>Segments"
            f" <span class='badge'>by {html.escape(str(by))}</span></h2>"
        )
        seg_tabs: list[tuple[str, str]] = []
        if segments.get("summary"):
            seg_tabs.append(
                ("Numeric summary", _sample_table(segments["summary"]))
            )
        if segments.get("top_values"):
            seg_tabs.append(
                ("Top values", _sample_table(segments["top_values"]))
            )
        parts.append(
            _tabs(seg_tabs)
            or "<div class='card'><span class='type'>No segments.</span></div>"
        )

    # time-series tier (timeseries_ts_col= config; beyond the reference):
    # per-column ACF / trend / calendar seasonality from the bounded grid
    if timeseries.get("columns"):
        tsc = timeseries.get("ts_col") or ""
        parts.append(
            f"<h2 id='timeseries' data-section='timeseries'>Time series"
            f" <span class='badge'>by {html.escape(str(tsc))} / "
            f"{html.escape(str(timeseries.get('granularity') or ''))}"
            f"</span></h2>"
        )
        ov_rows = []
        season_rows = []
        for cname, ts in timeseries["columns"].items():
            ov_rows.append(
                {
                    "column": cname,
                    "buckets": ts.get("n_buckets"),
                    "acf_lag1": _fmt(ts.get("acf1")),
                    "trend_r": _fmt(ts.get("trend_r")),
                    "seasonal_strength": _fmt(
                        ts.get("seasonal_strength")
                    ),
                }
            )
            for s in ts.get("seasonal") or []:
                season_rows.append(
                    {
                        "column": cname,
                        "period": s["period"],
                        "n": s["n"],
                        "mean": _fmt(s["mean"]),
                    }
                )
        ts_tabs = [("Overview", _sample_table(ov_rows))]
        acf_rows = [
            {
                "column": cname,
                "lag": a["lag"],
                "n_pairs": a["n_pairs"],
                "acf": _fmt(a["value"]),
            }
            for cname, ts in timeseries["columns"].items()
            for a in (ts.get("acf") or [])[:6]
        ]
        if acf_rows:
            ts_tabs.append(("Autocorrelation", _sample_table(acf_rows)))
        if season_rows:
            ts_tabs.append(
                (
                    "Seasonality ("
                    + str(timeseries.get("seasonal_period") or "")
                    + ")",
                    _sample_table(season_rows),
                )
            )
        anom_rows = [
            {
                "column": cname,
                "t": str(a.get("t")),
                "value": _fmt(a.get("value")),
                "baseline_mean": _fmt(a.get("baseline_mean")),
            }
            for cname, ts in timeseries["columns"].items()
            for a in (ts.get("anomalies") or [])
        ]
        if anom_rows:
            ts_tabs.append(("Anomalies", _sample_table(anom_rows)))
        parts.append(_tabs(ts_tabs))

    # feature-vs-target relevance (relevance_target= config)
    if relevance:
        parts.append(
            "<h2 id='relevance' data-section='relevance'>"
            "Target relevance</h2><div class='card'>"
        )
        parts.append(_sample_table([
            {"feature": r.get("feature"), "method": r.get("method"),
             "score": _fmt(r.get("score")),
             **({"reason": r["reason"]} if r.get("reason") else {})}
            for r in relevance
        ]))
        parts.append("</div>")

    # mined functional dependencies (discover_fds= config) and key
    # candidates (discover_keys= config) — column names and counts only,
    # so redact-safe
    if relationships or key_candidates:
        parts.append(
            "<h2 id='relationships' data-section='relationships'>"
            "Relationships</h2>"
        )
    if relationships:
        parts.append("<div class='card'>")
        parts.append(_sample_table([
            {"determinant": r.get("determinant"),
             "dependent": r.get("dependent"),
             "ratio": _fmt(r.get("dependency_ratio")),
             "holds": r.get("holds"),
             "tier": "exact" if r.get("exact") else "screened"}
            for r in relationships
        ]))
        parts.append("</div>")
    if key_candidates:
        parts.append(
            "<h3 data-section='key-candidates'>Key candidates</h3>"
            "<div class='card'>"
        )
        # 'skipped' marks a lattice-refusal sentinel (profile falls back to
        # max_arity=1); surface the reason in the table, not just the JSON
        _any_skip = any(r.get("skipped") for r in key_candidates)
        parts.append(_sample_table([
            {"key": r.get("key"),
             "arity": r.get("arity"),
             "uniqueness": _fmt(r.get("uniqueness_ratio")),
             "is_key": r.get("is_key"),
             "null_free": r.get("null_free"),
             "tier": (
                 "skipped" if r.get("skipped")
                 else ("exact" if r.get("exact") else "screened")
             ),
             **({"note": r.get("skipped") or ""} if _any_skip else {})}
            for r in key_candidates
        ]))
        parts.append("</div>")

    # write-layout advice (layout_advice= config; operators/layout.py —
    # zero extra jobs, derived from the stats above)
    if layout:
        parts.append(
            "<h2 id='layout' data-section='layout'>Layout advice</h2>"
        )
        lay_tabs: list[tuple[str, str]] = []
        cand_rows = [
            {"column": e.get("column"), "n_distinct": e.get("n_distinct"),
             "null_frac": _fmt(e.get("null_frac")),
             "skew_ratio": _fmt(e.get("skew_ratio")),
             "reason": e.get("reason")}
            for e in (layout.get("partition_by") or [])
        ]
        rej_rows = [
            {"column": e.get("column"), "reason": e.get("reason")}
            for e in (layout.get("rejected_partition") or [])
        ]
        lay_tabs.append((
            "Partition",
            (_sample_table(cand_rows)
             or "<span class='type'>No partition candidates.</span>")
            + (("<h3>Rejected</h3>" + _sample_table(rej_rows))
               if rej_rows else ""),
        ))
        bucket = layout.get("bucket_by")
        salt = layout.get("salt") or []
        bk_body = (
            _kv_table([("Column", bucket["column"]),
                       ("Buckets", bucket["n_buckets"]),
                       ("Why", bucket["reason"])])
            if bucket
            else "<span class='type'>No bucket recommendation.</span>"
        )
        if salt:
            bk_body += "<h3>Skewed join keys</h3>" + _sample_table([
                {"column": s["column"], "skew_ratio": _fmt(s["skew_ratio"]),
                 "salt_factor": s["salt_factor"], "reason": s["reason"]}
                for s in salt
            ])
        lay_tabs.append(("Bucket & salt", bk_body))
        if layout.get("notes"):
            lay_tabs.append((
                "Notes",
                "".join(f"<p class='type'>{html.escape(str(n))}</p>"
                        for n in layout["notes"]),
            ))
        parts.append(_tabs(lay_tabs))

    parts.append("</div></body></html>")
    return "".join(parts)


def minify_html(page: str) -> str:
    """Dependency-free HTML minify: drop comments, collapse inter-tag and
    runs of whitespace (reference minifies via htmlmin when
    ``html.minify_html`` is set, profile_report.py:257-279). Safe here
    because the report emits no <pre>/whitespace-sensitive content."""
    import re

    page = re.sub(r"<!--.*?-->", "", page, flags=re.S)
    page = re.sub(r">\s+<", "><", page)

    def _css(m: "re.Match[str]") -> str:
        return (
            "<style>"
            + re.sub(r"\s*([{};:,>])\s*", r"\1", m.group(1))
            + "</style>"
        )

    page = re.sub(r"<style>(.*?)</style>", _css, page, flags=re.S)
    return re.sub(r"[ \t\r\n]+", " ", page).strip()


def to_file(
    result: "Any",
    path: str,
    title: "str | None" = None,
    minify: bool = False,
    assets_dir: "str | None" = None,
) -> None:
    """Write the report. ``minify=True`` collapses whitespace/comments;
    ``assets_dir`` externalizes the stylesheet next to the page instead of
    inlining it (reference: profile_report.py:257-330 supports htmlmin and
    an assets directory; inline-single-file remains the default)."""
    page = render_html(result, title)
    if assets_dir is not None:
        import os

        os.makedirs(assets_dir, exist_ok=True)
        css_path = os.path.join(assets_dir, "profile.css")
        with open(css_path, "w", encoding="utf-8") as fh:
            fh.write(_CSS)
        rel = os.path.relpath(css_path, os.path.dirname(path) or ".")
        page = page.replace(
            f"<style>{_CSS}</style>",
            f"<link rel='stylesheet' href='{html.escape(rel)}'>",
        )
    if minify:
        page = minify_html(page)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(page)
