"""Markdown dataset card — the artifact a published training set ships with.

The HTML report answers "what is in this table" interactively; the card is
the same evidence compressed into a committable Markdown document (the
HuggingFace dataset-card habit): dataset metadata, headline statistics, a
per-variable table with descriptions, alerts, and the write-layout advice
when present. Pure driver-side string building over the already-aggregated
ProfileResult — no Spark.
"""

from __future__ import annotations

from typing import Any


def _esc(v: Any) -> str:
    """Markdown-table-safe cell: pipes and newlines break row structure."""
    return str(v).replace("|", "\\|").replace("\n", " ")


def _fmt(v: Any) -> str:
    if v is None:
        return "—"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        return f"{v:,.4g}"
    if isinstance(v, int):
        return f"{v:,}"
    return _esc(v)


def dataset_card(result: Any) -> str:
    """ProfileResult (or its ``as_dict()``) -> Markdown dataset card."""
    d = result.as_dict() if hasattr(result, "as_dict") else result
    meta = d.get("metadata") or {}
    table = d.get("table") or {}
    variables = d.get("variables") or {}
    desc_map = meta.get("variable_descriptions") or {}
    lines: list[str] = [f"# {_esc(meta.get('title') or 'Data profile')}", ""]

    ds = meta.get("dataset") or {}
    if ds.get("description"):
        lines += [_esc(ds["description"]), ""]
    facts = [
        (label, ds[key])
        for label, key in (
            ("Creator", "creator"), ("Author", "author"), ("URL", "url"),
        )
        if ds.get(key)
    ]
    if ds.get("copyright_holder"):
        year = ds.get("copyright_year") or ""
        facts.append(("Copyright", f"(c) {ds['copyright_holder']} {year}".rstrip()))
    for label, val in facts:
        lines.append(f"- **{label}:** {_esc(val)}")
    if facts:
        lines.append("")

    lines += [
        "## Dataset statistics", "",
        "| statistic | value |", "|---|---|",
        f"| Rows | {_fmt(table.get('n'))} |",
        f"| Variables | {_fmt(table.get('n_var'))} |",
        f"| Missing cells | {_fmt(table.get('n_cells_missing'))} "
        f"({_fmt(table.get('p_cells_missing'))}) |",
        f"| Duplicate rows | {_fmt(table.get('n_duplicates'))} "
        f"({_fmt(table.get('p_duplicates'))}) |",
        "",
    ]
    types = table.get("types") or {}
    if types:
        lines += ["| type | columns |", "|---|---|"]
        lines += [f"| {_esc(t)} | {_fmt(c)} |" for t, c in sorted(types.items())]
        lines.append("")

    lines += [
        "## Variables", "",
        "| column | type | distinct | missing | description |",
        "|---|---|---|---|---|",
    ]
    for name, v in variables.items():
        n = v.get("n") or 0
        miss = v.get("n_missing")
        p_miss = f"{miss / n:.1%}" if n and miss is not None else "—"
        lines.append(
            f"| {_esc(name)} | {_esc(v.get('type'))} |"
            f" {_fmt(v.get('n_distinct'))} | {p_miss} |"
            f" {_esc(desc_map.get(name, ''))} |"
        )
    lines.append("")

    alerts = d.get("alerts") or []
    if alerts:
        lines += ["## Alerts", ""]
        lines += [
            f"- **{_esc(a.get('type'))}**"
            + (f" — {_esc(a['column'])}" if a.get("column") else "")
            for a in alerts
        ]
        lines.append("")

    layout = d.get("layout") or {}
    if layout:
        lines += ["## Suggested write layout", ""]
        parts_ = layout.get("partition_by") or []
        if parts_:
            lines.append(
                f"- **partitionBy:** `{parts_[0]['column']}`"
                f" ({_esc(parts_[0]['reason'])})"
            )
        bucket = layout.get("bucket_by")
        if bucket:
            lines.append(
                f"- **bucketBy:** `{bucket['column']}` x"
                f" {bucket['n_buckets']} ({_esc(bucket['reason'])})"
            )
        for s in layout.get("salt") or []:
            lines.append(
                f"- **salt** `{s['column']}` x {s['salt_factor']}:"
                f" {_esc(s['reason'])}"
            )
        lines.append("")

    pkg = d.get("package") or {}
    ana = d.get("analysis") or {}
    lines += [
        "---",
        f"*Profiled by {_esc(pkg.get('engine') or 'spark-profiler')}"
        f" v{_esc(pkg.get('version') or '?')}"
        + (f" in {_fmt(ana.get('duration_sec'))} s" if ana.get("duration_sec")
           else "")
        + ".*",
        "",
    ]
    return "\n".join(lines)


def card_to_file(result: Any, path: str) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(dataset_card(result))
