"""Corpus-level profile: what ``profile()`` is for a table, this is for a
TEXT CORPUS — one call that answers the questions a training-data engineer
asks before spending compute on it: what languages, how much duplication,
how much PII, how repetitive/boilerplate, how will it pack into context
windows, and how much would the standard filters drop.

One dict (JSON-ready) + a standalone HTML renderer. Built entirely from
the existing bounded operators — every section is either a 1-row
partial-aggregated collapse or a bounded groupBy — so the whole report is
a handful of scan-shaped jobs regardless of corpus size:

* table / quality / language mix / duplication — ONE persisted
  text_profile projection feeds three small aggregates (lang groupBy is
  bounded by |languages|, the fingerprint rollup is the exact-dedup
  exchange, the scalar quality rollup is a 1-row collapse);
* PII — ``pii_summary``'s 1-row collapse;
* repetition — 1-row means over ``repetition_profile``'s per-doc signals
  (one bounded (doc, gram) exchange);
* packing — ``packing_stats_from_counts`` over the token counts the
  persisted text_profile already holds (no extra scan).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

from pandas_profiling_personal_spark.operators import (
    pii as PII,
    text as TX,
)


def corpus_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    context_len: int = 2048,
    ngram: int = 2,
    quality_threshold: float = 0.5,
    segment_by: str | None = None,
    max_segments: int = 50,
    domain_from: str | None = None,
    media_col: str | None = None,
    media_decoder: str = "auto",
) -> dict[str, Any]:
    """Corpus report dict: ``table`` (docs/tokens/chars), ``language_mix``,
    ``quality`` (score distribution + share below threshold),
    ``duplication`` (exact-dup docs/rate via content fingerprints),
    ``pii`` (per-kind totals + doc rate), ``repetition`` (mean Gopher
    signals), ``packing`` (context-window planner at ``context_len``).

    ``segment_by`` names a column of ``df`` (source, crawl, license, …)
    and adds a ``segments`` section — the per-segment docs/tokens/quality/
    duplication/language view a mixture decision reads. Cost: the
    persisted text_profile joins the (id, segment) projection once, then
    each rollup is ONE bounded exchange reusing the segment operators
    (``grouped_summary`` for the scalar block, ``grouped_top_k`` for the
    per-segment language mix, a two-stage (segment, fingerprint) rollup
    for duplication). Reports the ``max_segments`` largest segments by
    doc count and says so (``truncated``) rather than silently dropping
    the tail.

    ``domain_from`` names a URL column and derives the standard web-corpus
    curation segment from it — the REGISTERED DOMAIN
    (``operators.strings.registered_domain``: ``parse_url(HOST)`` +
    public-suffix-lite collapse, pure codegen) — as a ``domain`` column
    that becomes the default ``segment_by``. The C4/RefinedWeb-style
    per-domain docs/tokens/quality/duplication view is then just the
    ordinary segment rollup; unparsable URLs land in the NULL segment.

    ``media_col`` names an opaque binary column (images/audio/video) and
    adds a ``media`` section — ``operators.multimodal.media_profile``'s
    byte/format/dimension rollup including BOTH duplicate counts: exact
    (``n_duplicate_contents``, byte-identical) and perceptual
    (``n_duplicate_perceptual``, phash groups — the reference's image
    duplicate semantics, which catches re-encoded copies). One extra
    Arrow-batched decode pass over that column; ``media_decoder`` picks
    the tier (default ``"auto"``: PIL when importable, else the
    deterministic fake tier)."""
    if domain_from is not None:
        from pandas_profiling_personal_spark.functions import stats as S
        from pandas_profiling_personal_spark.operators.strings import (
            registered_domain,
        )

        df = df.withColumn("domain", registered_domain(S.col(domain_from)))
        if segment_by is None:
            segment_by = "domain"
    tp = TX.text_profile(df, text_col, id_col).persist()
    try:
        scalars = tp.agg(
            F.count(F.lit(1)).alias("n_docs"),
            # n_tokens is NULL exactly for null documents (size_or_null)
            F.sum(F.col("n_tokens").isNull().cast("long")).alias(
                "n_null_docs"
            ),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("quality_score"), 4).alias("mean_quality"),
            F.round(
                F.percentile_approx("quality_score", 0.5, 10000), 4
            ).alias("p50_quality"),
            F.sum(
                (F.col("quality_score") < quality_threshold).cast("long")
            ).alias("n_low_quality"),
            F.round(F.avg("stopword_ratio"), 4).alias("mean_stopword_ratio"),
            F.round(F.avg("distinct_token_ratio"), 4).alias(
                "mean_distinct_token_ratio"
            ),
        ).collect()[0]

        lang_rows = (
            tp.groupBy("language").agg(F.count(F.lit(1)).alias("n")).collect()
        )
        n_docs = int(scalars["n_docs"])
        language_mix = {
            r["language"]: {
                "n": int(r["n"]),
                "share": round(int(r["n"]) / n_docs, 4) if n_docs else 0.0,
            }
            for r in sorted(lang_rows, key=lambda r: -r["n"])
        }

        # exact duplication from the fingerprints text_profile already
        # computed: one (fingerprint, count) exchange, collapsed to 2 scalars
        dup = (
            tp.where(F.col("fingerprint").isNotNull())
            .groupBy("fingerprint")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.sum(F.when(F.col("c") > 1, F.col("c") - 1).otherwise(0)).alias(
                    "n_dup_docs"
                ),
                F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias(
                    "n_dup_groups"
                ),
            )
            .collect()[0]
        )

        # packing plan from the token counts the persisted text_profile
        # already holds — no fourth corpus scan / re-tokenization
        packing = (
            TX.packing_stats_from_counts(
                tp.select("n_tokens"), "n_tokens", context_len
            )
            .collect()[0]
            .asDict()
        )

        segments: dict[str, Any] | None = None
        if segment_by is not None:
            segments = _segment_rollups(
                df, tp, id_col, segment_by, quality_threshold, max_segments
            )
    finally:
        tp.unpersist()

    pii_row = PII.pii_summary(df, text_col).collect()[0].asDict()
    rep = (
        TX.repetition_profile(df, text_col, id_col, ngram=ngram)
        .agg(
            F.round(F.avg("dup_line_frac"), 4).alias("mean_dup_line_frac"),
            F.round(F.avg("dup_ngram_frac"), 4).alias("mean_dup_ngram_frac"),
            F.round(F.avg("top_ngram_frac"), 4).alias("mean_top_ngram_frac"),
        )
        .collect()[0]
    )
    n_dup_docs = int(dup["n_dup_docs"] or 0)
    out: dict[str, Any] = {
        "table": {
            "n_docs": n_docs,
            "n_null_docs": int(scalars["n_null_docs"] or 0),
            "total_tokens": int(scalars["total_tokens"] or 0),
            "total_chars": int(scalars["total_chars"] or 0),
        },
        "language_mix": language_mix,
        "quality": {
            "mean": scalars["mean_quality"],
            "p50": scalars["p50_quality"],
            "n_below_threshold": int(scalars["n_low_quality"] or 0),
            "threshold": quality_threshold,
            "mean_stopword_ratio": scalars["mean_stopword_ratio"],
            "mean_distinct_token_ratio": scalars[
                "mean_distinct_token_ratio"
            ],
        },
        "duplication": {
            "n_duplicate_docs": n_dup_docs,
            "n_duplicate_groups": int(dup["n_dup_groups"] or 0),
            "p_duplicates": round(n_dup_docs / n_docs, 4) if n_docs else 0.0,
        },
        "pii": pii_row,
        "repetition": rep.asDict(),
        "packing": packing,
    }
    if segments is not None:
        out["segments"] = segments
    if media_col is not None:
        from pandas_profiling_personal_spark.operators.multimodal import (
            media_profile,
        )

        out["media"] = media_profile(df, media_col, decoder=media_decoder)
    return out


def _segment_rollups(
    df: DataFrame,
    tp: DataFrame,
    id_col: str,
    segment_by: str,
    quality_threshold: float,
    max_segments: int,
) -> dict[str, Any]:
    """Per-segment corpus rollups over the persisted text_profile: one
    (id, segment) join, then three bounded exchanges — grouped_summary
    (scalars), grouped_top_k (languages), a (segment, fingerprint)
    two-stage rollup (exact duplication). When the segment column has
    more than ``max_segments`` values, the largest segments are ELECTED
    FIRST (distributed top-N on the bounded size aggregate, broadcast
    back as a semi-join) so neither the rollup exchanges nor the driver
    collect ever scale with segment cardinality (review r6 — a URL-depth
    segment column must not pull millions of rows to the driver)."""
    from pandas_profiling_personal_spark.functions import stats as S
    from pandas_profiling_personal_spark.operators import (
        frequencies as FQ,
        summary as SU,
    )

    seg = df.select(
        S.col(id_col).alias("__seg_id"),
        # null segments render as the literal "null" (the shuffle
        # diagnostics' convention) so the election filter below — a
        # literal IN — can never silently drop them
        F.coalesce(
            S.col(segment_by).cast("string"), F.lit("null")
        ).alias("__seg"),
    )
    # text_profile keeps the CALLER's id column name — join on it, never
    # on a hardcoded "doc_id" (review r6)
    tp2 = tp.join(seg, S.col(id_col) == F.col("__seg_id")).drop("__seg_id")

    # election in ONE TakeOrderedAndProject over the bounded size
    # aggregate: fetch max_segments+1 heads — the common non-truncated
    # case learns n_segments from the same action; only a truncated call
    # pays one extra bounded count for the exact total (review r6: no
    # unconditional second pass)
    seg_sizes = tp2.groupBy("__seg").agg(F.count(F.lit(1)).alias("__n"))
    head = (
        seg_sizes.orderBy(F.desc("__n"), F.asc("__seg"))
        .limit(max_segments + 1)
        .collect()
    )
    truncated = len(head) > max_segments
    if truncated:
        n_segments = seg_sizes.count()
        keep = [r["__seg"] for r in head[:max_segments]]
        tp2 = tp2.where(F.col("__seg").isin(keep))
    else:
        n_segments = len(head)

    # scalar block: count/mean/sum per (segment, metric) in ONE melt +
    # ONE exchange; the low-quality flag rides as a 0/1 metric whose sum
    # is the below-threshold count
    summ = SU.grouped_summary(
        tp2.withColumn(
            "low_q",
            (F.col("quality_score") < F.lit(quality_threshold))
            .cast("double"),
        ),
        "__seg",
        ["quality_score", "n_tokens", "low_q"],
    ).collect()
    rows: dict[str, dict[str, Any]] = {}
    for r in summ:
        s = rows.setdefault(r["group"], {})
        if r["column"] == "quality_score":
            s["n_docs"] = int(r["count"]) + int(r["n_null"])
            s["mean_quality"] = r["mean"]
        elif r["column"] == "n_tokens":
            s["total_tokens"] = int(r["sum"] or 0)
        elif r["column"] == "low_q":
            n_low = int(r["sum"] or 0)
            s["n_below_threshold"] = n_low
    for s in rows.values():
        nd = s.get("n_docs") or 0
        s["p_below_threshold"] = (
            round(s.get("n_below_threshold", 0) / nd, 4) if nd else 0.0
        )

    # per-segment language mix: the salted segment top-K operator
    for r in FQ.grouped_top_k(tp2, "__seg", ["language"], k=5).collect():
        s = rows.get(r["group"])
        if s is not None:
            s.setdefault("languages", {})[r["value"]] = int(r["count"])

    # exact duplication WITHIN each segment: (segment, fingerprint)
    # counts collapsed to |segments| rows
    for r in (
        tp2.where(F.col("fingerprint").isNotNull())
        .groupBy("__seg", "fingerprint")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("__seg")
        .agg(
            F.sum(
                F.when(F.col("c") > 1, F.col("c") - 1).otherwise(0)
            ).alias("n_dup_docs")
        )
        .collect()
    ):
        s = rows.get(r["__seg"])
        if s is not None:
            nd = s.get("n_docs") or 0
            n_dup = int(r["n_dup_docs"] or 0)
            s["n_duplicate_docs"] = n_dup
            s["p_duplicates"] = round(n_dup / nd, 4) if nd else 0.0
    for s in rows.values():
        s.setdefault("n_duplicate_docs", 0)
        s.setdefault("p_duplicates", 0.0)

    return {
        "by": segment_by,
        "n_segments": n_segments,
        "truncated": truncated,
        "rows": rows,
    }


def corpus_report_html(report: dict[str, Any], title: str = "Corpus report") -> str:
    """Standalone single-file HTML for a :func:`corpus_profile` dict."""
    from pandas_profiling_personal_spark.report.htmlbits import (
        esc,
        kv_table as table,
        page,
    )

    lang_rows = "".join(
        f"<tr><th>{esc(lang)}</th><td>{m['n']}</td>"
        f"<td>{m['share'] * 100:.2f}%</td></tr>"
        for lang, m in report["language_mix"].items()
    )
    sections = [
        ("Corpus", table(report["table"])),
        (
            "Language mix",
            f"<table><tr><th>language</th><th>docs</th><th>share</th></tr>"
            f"{lang_rows}</table>",
        ),
        ("Quality", table(report["quality"])),
        ("Duplication (exact)", table(report["duplication"])),
        ("PII", table(report["pii"])),
        ("Repetition (Gopher signals)", table(report["repetition"])),
        ("Context-window packing", table(report["packing"])),
    ]
    if report.get("media"):
        m = dict(report["media"])
        fmts = m.pop("formats", {}) or {}
        m["formats"] = ", ".join(
            f"{k}: {v}" for k, v in sorted(fmts.items(), key=lambda kv: -kv[1])
        )
        # exif sub-dicts are per-key tables — too wide for the rollup page
        m.pop("exif_values", None)
        ek = m.pop("exif_keys", None)
        if ek:
            m["exif_keys"] = ", ".join(
                f"{k}: {v}" for k, v in sorted(ek.items(), key=lambda kv: -kv[1])
            )
        sections.append(("Media", table(m)))
    if report.get("segments"):
        sg = report["segments"]
        seg_rows = "".join(
            f"<tr><th>{esc(str(name))}</th><td>{m.get('n_docs')}</td>"
            f"<td>{m.get('total_tokens')}</td>"
            f"<td>{m.get('mean_quality')}</td>"
            f"<td>{(m.get('p_below_threshold') or 0) * 100:.2f}%</td>"
            f"<td>{(m.get('p_duplicates') or 0) * 100:.2f}%</td>"
            f"<td>{esc(', '.join(list(m.get('languages') or [])[:3]))}</td>"
            f"</tr>"
            for name, m in sg["rows"].items()
        )
        note = (
            f" (largest {len(sg['rows'])} of {sg['n_segments']})"
            if sg.get("truncated")
            else ""
        )
        sections.append((
            f"Segments by {sg['by']}{note}",
            "<table><tr><th>segment</th><th>docs</th><th>tokens</th>"
            "<th>mean quality</th><th>low quality</th><th>dup rate</th>"
            f"<th>top languages</th></tr>{seg_rows}</table>",
        ))
    body = "".join(
        f"<section><h2>{esc(h)}</h2>{t}</section>" for h, t in sections
    )
    return page(title, body)
