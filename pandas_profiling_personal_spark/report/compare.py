"""Profile comparison: diff two :class:`ProfileResult` snapshots of the
"same" dataset (two crawls, two releases, before/after a filter) into a
compact, render-able report.

Beyond the reference (pandas-profiling v2.9 has no comparison surface; the
idea appears in later forks). This diff is DRIVER-SIDE ONLY — it consumes
two already-computed profiles, so comparing 100 TB snapshots costs two
profiles, not a third pass. For *distributional* drift (bucket-level PSI),
use ``operators.drift.drift_profile`` / ``drift_profile_categorical`` —
two independent profiles bin independently, so their histograms are not
comparable bucket-by-bucket and this module does not pretend they are.
"""

from __future__ import annotations

from typing import Any

#: numeric per-variable fields worth diffing, in render order
_NUM_FIELDS = (
    "mean", "std", "min", "max", "n_missing", "p_missing",
    "n_distinct", "n_zeros", "n_infinite",
)
_CAT_FIELDS = ("n_missing", "p_missing", "n_distinct", "mode")
_TABLE_FIELDS = (
    "n", "n_var", "n_cells_missing", "p_cells_missing",
    "n_duplicates", "p_duplicates",
)


def _as_dict(result: Any) -> dict:
    return result.as_dict() if hasattr(result, "as_dict") else dict(result)


def _delta(a, b):
    if a is None or b is None:
        return None
    try:
        return round(b - a, 6)
    except TypeError:
        return None


def _rel(a, b):
    d = _delta(a, b)
    if d is None or not a:
        return None
    return round(d / abs(a), 6)


def compare_profiles(
    a: Any,
    b: Any,
    labels: tuple[str, str] = ("baseline", "candidate"),
) -> dict[str, Any]:
    """Structured diff of two profiles:

    ``table`` — per-field (baseline, candidate, delta) for row/missing/
    duplicate rollups; ``variables`` — added / removed / type-changed
    column lists plus per-common-column field diffs (numeric fields with
    relative deltas); ``alerts`` — alerts new in the candidate and alerts
    resolved since the baseline (keyed by (type, column))."""
    da, db = _as_dict(a), _as_dict(b)
    va, vb = da.get("variables") or {}, db.get("variables") or {}

    out: dict[str, Any] = {"labels": list(labels)}
    out["table"] = {
        f: {
            labels[0]: (da.get("table") or {}).get(f),
            labels[1]: (db.get("table") or {}).get(f),
            "delta": _delta(
                (da.get("table") or {}).get(f), (db.get("table") or {}).get(f)
            ),
        }
        for f in _TABLE_FIELDS
    }

    added = sorted(set(vb) - set(va))
    removed = sorted(set(va) - set(vb))
    common = [c for c in va if c in vb]
    type_changed = {
        c: {labels[0]: va[c].get("type"), labels[1]: vb[c].get("type")}
        for c in common
        if va[c].get("type") != vb[c].get("type")
    }
    per_var: dict[str, dict[str, Any]] = {}
    for c in common:
        fields = (
            _NUM_FIELDS if va[c].get("type") == "Numeric" else _CAT_FIELDS
        )
        diffs: dict[str, Any] = {}
        for f in fields:
            x, y = va[c].get(f), vb[c].get(f)
            if x is None and y is None:
                continue
            if f == "mode":
                if x != y:
                    diffs[f] = {labels[0]: x, labels[1]: y}
                continue
            d = _delta(x, y)
            if d:
                diffs[f] = {
                    labels[0]: x,
                    labels[1]: y,
                    "delta": d,
                    "rel": _rel(x, y),
                }
        if diffs:
            per_var[c] = diffs
    out["variables"] = {
        "added": added,
        "removed": removed,
        "type_changed": type_changed,
        "changed": per_var,
    }

    def akey(al: dict) -> tuple:
        return (al.get("type"), al.get("column"))

    alerts_a = {akey(al) for al in (da.get("alerts") or [])}
    alerts_b = {akey(al) for al in (db.get("alerts") or [])}
    out["alerts"] = {
        "new": sorted(
            f"{t} · {c}" if c else str(t) for t, c in alerts_b - alerts_a
        ),
        "resolved": sorted(
            f"{t} · {c}" if c else str(t) for t, c in alerts_a - alerts_b
        ),
    }
    return out


def comparison_to_html(
    cmp: dict[str, Any], title: str = "Profile comparison"
) -> str:
    """Standalone HTML for a :func:`compare_profiles` diff."""
    from pandas_profiling_personal_spark.report.htmlbits import BASE_CSS, esc

    la, lb = cmp.get("labels") or ("baseline", "candidate")

    def row3(name, rec) -> str:
        return (
            f"<tr><td>{esc(name)}</td><td>{esc(rec.get(la))}</td>"
            f"<td>{esc(rec.get(lb))}</td>"
            f"<td>{esc(rec.get('delta', ''))}</td></tr>"
        )

    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        f"<title>{esc(title)}</title>",
        f"<style>{BASE_CSS}</style>",
        f"</head><body><h1>{esc(title)}</h1>",
        f"<p>{esc(la)} → {esc(lb)}</p>",
        "<h2>Dataset</h2><table><tr><th>field</th>"
        f"<th>{esc(la)}</th><th>{esc(lb)}</th><th>Δ</th></tr>",
    ]
    for f, rec in (cmp.get("table") or {}).items():
        parts.append(row3(f, rec))
    parts.append("</table>")

    v = cmp.get("variables") or {}
    for key in ("added", "removed"):
        if v.get(key):
            parts.append(
                f"<h2>Columns {key}</h2><p>{esc(', '.join(v[key]))}</p>"
            )
    if v.get("type_changed"):
        parts.append("<h2>Type changes</h2><ul>")
        for c, rec in v["type_changed"].items():
            parts.append(
                f"<li>{esc(c)}: {esc(rec.get(la))} → {esc(rec.get(lb))}</li>"
            )
        parts.append("</ul>")
    if v.get("changed"):
        parts.append(
            "<h2>Changed variables</h2><table><tr><th>column</th>"
            f"<th>field</th><th>{esc(la)}</th><th>{esc(lb)}</th><th>Δ</th>"
            "<th>Δ rel</th></tr>"
        )
        for c, diffs in v["changed"].items():
            for f, rec in diffs.items():
                if "delta" in rec:
                    parts.append(
                        f"<tr><td>{esc(c)}</td><td>{esc(f)}</td>"
                        f"<td>{esc(rec.get(la))}</td><td>{esc(rec.get(lb))}"
                        f"</td><td>{esc(rec['delta'])}</td>"
                        f"<td>{esc(rec.get('rel', ''))}</td></tr>"
                    )
                else:
                    parts.append(
                        f"<tr><td>{esc(c)}</td><td>{esc(f)}</td>"
                        f"<td>{esc(rec.get(la))}</td><td>{esc(rec.get(lb))}"
                        f"</td><td></td><td></td></tr>"
                    )
        parts.append("</table>")

    al = cmp.get("alerts") or {}
    parts.append("<h2>Alerts</h2>")
    parts.append(
        f"<p>New: {esc(', '.join(al.get('new') or []) or '—')}</p>"
        f"<p>Resolved: {esc(', '.join(al.get('resolved') or []) or '—')}</p>"
    )
    parts.append("</body></html>")
    return "".join(parts)
