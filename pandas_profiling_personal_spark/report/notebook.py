"""Notebook embedding for profile reports (reference:
profile_report.py:332-343 ``to_notebook_iframe`` renders the HTML report into
an ``<iframe srcdoc=...>`` so the report's own CSS cannot leak into the
notebook).

IPython is optional: ``to_notebook_iframe`` returns an
``IPython.display.HTML`` (and displays it when inside a running notebook)
when IPython is importable, else the raw iframe HTML string — callers can
embed it however they like.
"""

from __future__ import annotations

import html as _html
from typing import Any

from pandas_profiling_personal_spark.report.html import render_html


def iframe_html(
    result: Any,
    title: str = "Data profile",
    width: str = "100%",
    height: str = "800px",
) -> str:
    """Self-contained ``<iframe srcdoc=...>`` wrapping the rendered report."""
    page = render_html(result, title=title)
    return (
        f"<iframe width='{_html.escape(width)}' height='{_html.escape(height)}'"
        f" srcdoc=\"{_html.escape(page, quote=True)}\""
        f" frameborder='0' data-report='profile'></iframe>"
    )


def to_notebook_iframe(
    result: Any,
    title: str = "Data profile",
    width: str = "100%",
    height: str = "800px",
):
    """Render the report inside the current notebook cell (reference:
    profile_report.py:332-343). Returns the displayable object."""
    frame = iframe_html(result, title=title, width=width, height=height)
    try:
        from IPython.display import HTML, display  # type: ignore
    except ImportError:
        return frame
    obj = HTML(frame)
    try:
        display(obj)
    except Exception:
        pass
    return obj
