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


def to_app(
    result: Any,
    title: str = "Data profile",
    open_browser: bool = True,
) -> str:
    """Desktop report window (reference ``to_app``,
    profile_report.py:433-451 — an experimental PyQt5 surface the reference
    itself marks "not ready to be used").

    Tier 1: if PyQt5 + QtWebEngine are importable, open the rendered report
    in a native window. Tier 2 (this container — no Qt): write the report
    to a temp file and open it in the default browser via ``webbrowser``
    (suppressed with ``open_browser=False`` for headless use). Either way
    the path of the written HTML file is returned, so the caller always
    gets a usable artifact — unlike the reference, which renders nothing
    without PyQt5 installed."""
    import tempfile
    import webbrowser

    page = render_html(result, title=title)
    out = tempfile.NamedTemporaryFile(
        mode="w", suffix=".html", prefix="profile_", delete=False
    )
    with out:
        out.write(page)
    try:
        from PyQt5.QtCore import QUrl  # type: ignore
        from PyQt5.QtWebEngineWidgets import QWebEngineView  # type: ignore
        from PyQt5.QtWidgets import QApplication  # type: ignore

        app = QApplication.instance() or QApplication([])
        view = QWebEngineView()
        view.setWindowTitle(title)
        view.load(QUrl.fromLocalFile(out.name))
        view.show()
        app.exec_()
    except Exception:
        # not just ImportError: Qt can import fine yet fail at runtime
        # (headless host, no DISPLAY — QApplication/QWebEngineView raise or
        # abort construction). The caller must still receive the written
        # HTML path, so ANY Qt failure falls through to the browser tier.
        if open_browser:
            try:
                webbrowser.open(f"file://{out.name}")
            except Exception:
                pass
    return out.name
