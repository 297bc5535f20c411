"""Tiny shared pieces for the standalone single-file HTML renderers
(comparison report, corpus report) — one escaping helper and one base
stylesheet, so a style or escaping fix lands everywhere at once. The main
profile report (report/html.py) has its own full template; these are for
the lightweight auxiliary pages only."""

from __future__ import annotations

import html as _html
from typing import Any

#: shared stylesheet for the auxiliary single-file reports
BASE_CSS = (
    "body{font-family:sans-serif;margin:2rem;max-width:60rem}"
    "table{border-collapse:collapse;margin:.5rem 0}"
    "th,td{border:1px solid #ccc;padding:.25rem .6rem;text-align:left}"
    "th{background:#f5f5f5}h2{margin-top:1.5rem}"
)


def esc(x: Any) -> str:
    return _html.escape(str(x))


def kv_table(d: dict, keys: list[str] | None = None) -> str:
    """Two-column key/value table."""
    items = [(k, d[k]) for k in (keys or d)]
    rows = "".join(
        f"<tr><th>{esc(k)}</th><td>{esc(v)}</td></tr>" for k, v in items
    )
    return f"<table>{rows}</table>"


def page(title: str, body: str) -> str:
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{esc(title)}</title><style>{BASE_CSS}</style></head>"
        f"<body><h1>{esc(title)}</h1>{body}</body></html>"
    )
