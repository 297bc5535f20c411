"""ipywidgets report surface (reference: profile_report.py:433-451
``to_widgets`` renders the report as an ipywidgets tree; its widget assembly
lives in report/presentation/flavours/widget/*).

Two layers so the surface is testable without the dependency:

* :func:`widget_spec` — a PURE-DATA tree (dicts: tab/html/accordion nodes)
  describing the widget layout, built from a :class:`ProfileResult` only.
* :func:`to_widgets` — materializes the spec with ipywidgets when importable
  (and displays it inside a running notebook); otherwise falls back to the
  iframe/HTML string like ``to_notebook_iframe`` does (report/notebook.py).
"""

from __future__ import annotations

from typing import Any

from pandas_profiling_personal_spark.report import html as H


def _kv_html(pairs: list[tuple[str, Any]]) -> str:
    return H._kv_table(pairs)


def _rows_table(rows: list[dict]) -> str:
    """Row dicts -> a plain table (header from the first row's keys)."""
    if not rows:
        return "<div>—</div>"
    cols = list(rows[0].keys())
    head = "".join(f"<th>{H._fmt(c)}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{H._fmt(r.get(c))}</td>" for c in cols) + "</tr>"
        for r in rows
    )
    return f"<table><tr>{head}</tr>{body}</table>"


def widget_spec(result: Any, title: str = "Data profile") -> dict:
    """Widget-tree spec: {type: tab, title, children: [...]}.

    Sections mirror the HTML report (and the reference's widget flavour):
    Overview / Variables (accordion, one child per column) / Correlations /
    Missing / Samples / Alerts / Duplicates.
    """
    table = result.table
    overview = {
        "type": "html",
        "title": "Overview",
        "html": _kv_html(sorted(table.items())),
    }
    variables = {
        "type": "accordion",
        "title": "Variables",
        "children": [
            {
                "type": "html",
                "title": f"{name} ({v.get('type', '?')})",
                "html": _kv_html(
                    [
                        (k, val)
                        for k, val in sorted(v.items())
                        if not isinstance(val, (dict, list))
                    ]
                ),
            }
            for name, v in result.variables.items()
        ],
    }
    children = [overview, variables]
    if result.correlations:
        children.append(
            {
                "type": "html",
                "title": "Correlations",
                "html": "".join(
                    f"<h4>{m}</h4>" + H._matrix_table(mat)
                    for m, mat in result.correlations.items()
                ),
            }
        )
    if result.missing:
        children.append(
            {
                "type": "html",
                "title": "Missing",
                "html": _kv_html(sorted(result.missing["counts"].items())),
            }
        )
    if result.sample:
        children.append(
            {
                "type": "html",
                "title": "Samples",
                "html": "".join(
                    f"<h4>{k}</h4>" + _rows_table(rows)
                    for k, rows in result.sample.items()
                ),
            }
        )
    children.append(
        {
            "type": "html",
            "title": f"Alerts ({len(result.alerts)})",
            "html": "".join(
                f"<div>{a['type']}: {a['column']}</div>"
                for a in result.alerts
            )
            or "<div>No alerts.</div>",
        }
    )
    if result.duplicates:
        children.append(
            {
                "type": "html",
                "title": "Duplicates",
                "html": _rows_table(result.duplicates),
            }
        )
    ts = getattr(result, "timeseries", None) or {}
    if ts.get("columns"):
        children.append(
            {
                "type": "html",
                "title": f"Time series (by {ts.get('ts_col')})",
                "html": _rows_table(
                    [
                        {
                            "column": c,
                            "buckets": d.get("n_buckets"),
                            "acf1": d.get("acf1"),
                            "trend_r": d.get("trend_r"),
                            "seasonal_strength": d.get(
                                "seasonal_strength"
                            ),
                        }
                        for c, d in ts["columns"].items()
                    ]
                ),
            }
        )
    return {"type": "tab", "title": title, "children": children}


def _materialize(spec: dict):
    """Spec node -> ipywidgets widget (caller guarantees ipywidgets)."""
    import ipywidgets as W  # type: ignore

    t = spec["type"]
    if t == "html":
        return W.HTML(value=spec["html"])
    kids = [_materialize(c) for c in spec["children"]]
    if t == "accordion":
        acc = W.Accordion(children=kids)
        for i, c in enumerate(spec["children"]):
            acc.set_title(i, c["title"])
        return acc
    tab = W.Tab(children=kids)
    for i, c in enumerate(spec["children"]):
        tab.set_title(i, c["title"])
    return tab


def to_widgets(result: Any, title: str = "Data profile"):
    """Render the profile as an ipywidgets tree in the current cell
    (reference: profile_report.py:433-451). Without ipywidgets, degrades to
    the iframe embed (IPython present) or the raw HTML string — same
    graceful-fallback contract as ``to_notebook_iframe``."""
    try:
        import ipywidgets  # noqa: F401
    except ImportError:
        from pandas_profiling_personal_spark.report.notebook import (
            to_notebook_iframe,
        )

        return to_notebook_iframe(result, title=title)
    widget = _materialize(widget_spec(result, title))
    try:
        from IPython.display import display  # type: ignore

        display(widget)
    except Exception:
        pass
    return widget
