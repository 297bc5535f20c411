"""PII detection and redaction for training-data pipelines.

A 100 TB pretraining corpus pass needs a cheap, deterministic PII sweep before
anything ships: find documents carrying emails / phone numbers / IP addresses /
SSN-style ids / long card-like digit runs, count them, and optionally redact
them in place. (The reference has no PII surface; this extends its text stats
— A13/A14, reference: src/pandas_profiling/model/summary_helpers.py — the way
its URL/path types extend plain strings.)

Everything is built-in regex expressions (``regexp_count`` /
``regexp_replace``) evaluated JVM-side inside whole-stage codegen — the scan
runs at parquet-read speed with zero shuffles; aggregation is one
combine-friendly 1-row collapse. Patterns are anchored to ASCII and
RE2-compatible (no lookarounds, no backrefs) so a DuckDB oracle runs the SAME
patterns; they are deliberately high-precision / moderate-recall — the shape a
corpus filter wants (false positives redact good text forever; false negatives
get another pass). A learned NER redactor would slot in behind the same column
contract as a Pandas UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from pandas_profiling_personal_spark.functions import stats as S
from pandas_profiling_personal_spark.functions.partitioning import (
    parallelize_narrow,
)

#: detection patterns, ordered — redaction applies them in THIS order, so
#: supersets must precede subsets (e.g. emails before bare digit runs). The
#: card pattern guards against a preceding '+' WITHOUT lookbehind (RE2 has
#: none): it consumes one prefix char, so its redaction template re-emits it.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "card": r"(?:^|[^+\d])\d{13,16}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+\d{9,14}\b",
}

#: redaction (pattern, replacement) per kind — card re-emits its guard char
_REDACT: dict[str, tuple[str, str]] = {
    kind: (pat, f"<{kind.upper()}>") for kind, pat in PII_PATTERNS.items()
}
_REDACT["card"] = (r"(^|[^+\d])\d{13,16}\b", "$1<CARD>")


def pii_counts(c: Column) -> dict[str, Column]:
    """Per-kind match counts for one text column (all codegen'd)."""
    return {
        kind: F.regexp_count(c, F.lit(pat))
        for kind, pat in PII_PATTERNS.items()
    }


def pii_scan(
    df: DataFrame, text_col: str, id_col: str | None = None
) -> DataFrame:
    """Per-document PII counts: (id?, n_email, n_ssn, n_card, n_ipv4,
    n_phone, n_pii, has_pii). Narrow — no shuffle; feed it into filters,
    keep-lists, or the 1-row :func:`pii_summary`. This is the regex tier
    (RE2-safe, zero Python); an NER model plugs in behind the same
    n_pii/has_pii gating semantics via
    ``operators.models.pii_entities_model`` (adds exact entity spans)."""
    df = parallelize_narrow(df)
    c = S.col(text_col)
    counts = pii_counts(c)
    cols = [S.col(id_col)] if id_col else []
    total = None
    for kind in PII_PATTERNS:
        term = counts[kind]
        total = term if total is None else total + term
    return df.select(
        *cols,
        *[counts[k].alias(f"n_{k}") for k in PII_PATTERNS],
        total.alias("n_pii"),
        (total > 0).alias("has_pii"),
    )


def pii_summary(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus-level 1-row rollup: per-kind total matches + documents affected
    + overall document rate. ONE partial-aggregated collapse — at 1000
    executors this is a scan plus a 1-row exchange."""
    scan = pii_scan(df, text_col)
    aggs = []
    for kind in PII_PATTERNS:
        aggs.append(F.sum(F.col(f"n_{kind}")).alias(f"total_{kind}"))
        aggs.append(
            F.sum((F.col(f"n_{kind}") > 0).cast("long")).alias(f"docs_{kind}")
        )
    aggs.append(F.count(F.lit(1)).alias("n_docs"))
    aggs.append(F.sum(F.col("has_pii").cast("long")).alias("docs_pii"))
    out = scan.agg(*aggs)
    return out.withColumn(
        "pii_doc_rate",
        F.round(F.col("docs_pii") / F.col("n_docs"), 4),
    )


def redact_pii(
    c: Column, kinds: tuple[str, ...] | None = None
) -> Column:
    """Replace each PII match with a typed placeholder (``<EMAIL>``, ...).

    Order follows ``PII_PATTERNS`` so e.g. the digits inside an email aren't
    first mangled by the card pattern. Chained ``regexp_replace`` stays inside
    codegen — a redaction pass over a corpus is a pure map, no shuffle."""
    out = c
    for kind in kinds or tuple(PII_PATTERNS):
        pat, repl = _REDACT[kind]
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_documents(
    df: DataFrame, text_col: str, kinds: tuple[str, ...] | None = None
) -> DataFrame:
    """The same frame with ``text_col`` redacted in place."""
    return df.withColumn(text_col, redact_pii(S.col(text_col), kinds))
