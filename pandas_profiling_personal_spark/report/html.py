"""Self-contained HTML report renderer (S4).

The reference renders a jinja2 widget tree with bundled JS/CSS assets
(reference: report/structure/report.py:229-314, profile_report.py:257-330).
This renderer is dependency-free: the stats dict -> a single inline-styled HTML
document (overview, per-variable cards with frequency bars and histogram
sparklines, correlation matrices, alerts, samples). Pure driver-side string
building over the already-aggregated (bounded) profile result.
"""

from __future__ import annotations

import html
from typing import Any

_CSS = """
body{font-family:system-ui,sans-serif;margin:0;background:#f6f7f9;color:#1c2330}
.wrap{max-width:1100px;margin:0 auto;padding:24px}
h1{font-size:22px}h2{font-size:17px;margin:28px 0 10px}h3{font-size:14px;margin:0 0 6px}
.cards{display:grid;grid-template-columns:repeat(auto-fill,minmax(330px,1fr));gap:14px}
.card{background:#fff;border:1px solid #e3e6eb;border-radius:8px;padding:14px}
table.kv{border-collapse:collapse;width:100%;font-size:12.5px}
table.kv td{padding:2px 6px;border-bottom:1px solid #f0f1f4}
table.kv td:last-child{text-align:right;font-variant-numeric:tabular-nums}
.bar{background:#dbe4f0;height:12px;display:inline-block;vertical-align:middle}
.hist{display:flex;align-items:flex-end;gap:1px;height:48px;margin-top:6px}
.hist div{background:#5b8def;flex:1 1 0}
.alert{display:inline-block;background:#fde8e8;color:#9b1c1c;border-radius:4px;
padding:2px 8px;margin:2px;font-size:12px}
.alert.info{background:#e8f0fd;color:#1c4e9b}
.type{color:#667085;font-size:12px}
.matrix td{font-size:11px;padding:2px 5px;text-align:right}
.matrix th{font-size:11px;padding:2px 5px}
"""


def _fmt(v: Any) -> str:
    if v is None:
        return "—"
    if isinstance(v, float):
        return f"{v:,.4g}"
    if isinstance(v, int):
        return f"{v:,}"
    return html.escape(str(v))


def _kv_table(pairs: list[tuple[str, Any]]) -> str:
    rows = "".join(
        f"<tr><td>{html.escape(k)}</td><td>{_fmt(v)}</td></tr>" for k, v in pairs
    )
    return f"<table class='kv'>{rows}</table>"


def _histogram(hist: dict) -> str:
    counts = hist.get("counts") or []
    if not counts:
        return ""
    peak = max(counts) or 1
    bars = "".join(
        f"<div style='height:{max(2, int(46 * c / peak))}px' title='{c}'></div>"
        for c in counts
    )
    return f"<div class='hist'>{bars}</div>"


def _freq_bars(top_values: list[dict], count: int) -> str:
    if not top_values:
        return ""
    rows = []
    for tv in top_values[:6]:
        frac = tv["count"] / count if count else 0
        rows.append(
            f"<tr><td style='max-width:160px;overflow:hidden;text-overflow:ellipsis'>"
            f"{html.escape(str(tv['value']))[:40]}</td>"
            f"<td><span class='bar' style='width:{int(100 * frac)}px'></span>"
            f" {tv['count']:,}</td></tr>"
        )
    return "<table class='kv'>" + "".join(rows) + "</table>"


_VAR_STATS = [
    "n_distinct", "n_unique", "n_missing", "p_missing", "mean", "std", "min",
    "max", "median", "mad", "iqr", "skewness", "kurtosis", "sum", "n_zeros",
    "n_infinite", "range", "cv", "min_length", "mean_length", "max_length",
    "n_true", "n_false",
]


def render_html(result: "Any", title: str = "Data profile") -> str:
    """ProfileResult (or its as_dict()) -> standalone HTML string."""
    d = result.as_dict() if hasattr(result, "as_dict") else result
    table = d["table"]
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        f"<title>{html.escape(title)}</title><style>{_CSS}</style></head>",
        "<body><div class='wrap'>",
        f"<h1>{html.escape(title)}</h1>",
        "<h2>Overview</h2><div class='cards'><div class='card'>",
        _kv_table(
            [
                ("Rows", table.get("n")),
                ("Variables", table.get("n_var")),
                ("Missing cells", table.get("n_cells_missing")),
                ("Missing cells %", table.get("p_cells_missing")),
                ("Duplicate rows", table.get("n_duplicates")),
                ("Duplicate rows %", table.get("p_duplicates")),
            ]
        ),
        "</div><div class='card'><h3>Variable types</h3>",
        _kv_table(sorted((table.get("types") or {}).items())),
        "</div></div>",
    ]

    alerts = d.get("alerts") or []
    if alerts:
        parts.append("<h2>Alerts</h2><div class='card'>")
        for a in alerts:
            col = f" · {a['column']}" if a.get("column") else ""
            cls = "alert info" if a["type"] in ("UNIQUE", "UNIFORM") else "alert"
            parts.append(f"<span class='{cls}'>{a['type']}{html.escape(col)}</span>")
        parts.append("</div>")

    parts.append("<h2>Variables</h2><div class='cards'>")
    for name, v in d["variables"].items():
        pairs = [(k, v[k]) for k in _VAR_STATS if v.get(k) is not None]
        parts.append(
            f"<div class='card'><h3>{html.escape(name)}</h3>"
            f"<div class='type'>{html.escape(str(v.get('type')))}"
            f" · n={_fmt(v.get('count'))}</div>"
            + _kv_table(pairs[:12])
            + (_histogram(v["histogram"]) if v.get("histogram") else "")
            + _freq_bars(v.get("top_values") or [], v.get("count") or 0)
            + "</div>"
        )
    parts.append("</div>")

    for measure, matrix in (d.get("correlations") or {}).items():
        cols = sorted(matrix.keys())
        parts.append(f"<h2>Correlation — {html.escape(measure)}</h2>")
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
        parts.append(
            "<div class='card' style='overflow-x:auto'><table class='matrix'>"
            f"<tr><th></th>{head}</tr>{''.join(rows)}</table></div>"
        )

    sample = (d.get("sample") or {}).get("head") or []
    if sample:
        cols = list(sample[0].keys())
        head = "".join(f"<th>{html.escape(c)}</th>" for c in cols)
        rows = "".join(
            "<tr>" + "".join(f"<td>{_fmt(r.get(c))}</td>" for c in cols) + "</tr>"
            for r in sample
        )
        parts.append(
            "<h2>Sample</h2><div class='card' style='overflow-x:auto'>"
            f"<table class='kv'><tr>{head}</tr>{rows}</table></div>"
        )

    parts.append("</div></body></html>")
    return "".join(parts)


def to_file(result: "Any", path: str, title: str = "Data profile") -> None:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(render_html(result, title))
