"""String-content analysis: characters/unicode (A14), URLs (A17), paths (A18).

The reference computes character counts with exactly the explode/groupBy this
module uses (reference: summary_helpers.py:331-354) but does unicode
category/script/block rollups on the driver through the tangled_up_in_unicode
package (:366-435). Here the char counts stay distributed and the rollups use
Python's stdlib ``unicodedata`` on the (small, <= alphabet-size) driver-side
result. URL/path decomposition exist only on the reference's pandas path
(summary_algorithms.py:360-417); this engine makes them distributed one-pass
aggregations via ``parse_url`` / ``regexp_extract``.
"""

from __future__ import annotations

import unicodedata
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

from pandas_profiling_personal_spark.functions import stats as S


def char_counts(df: DataFrame, column: str) -> DataFrame:
    """(char, count) frequency of every character in the column — one explode +
    combine-friendly groupBy (shuffle size bounded by the alphabet)."""
    c = S.col(column)
    return (
        df.where(c.isNotNull())
        .select(F.explode(F.split(c, "")).alias("char"))
        .where(F.col("char") != "")
        .groupBy("char")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def unicode_summary(df: DataFrame, column: str, top_k: int = 10) -> dict[str, Any]:
    """Distributed char counts + driver-side unicode rollups.

    Returns {n_characters, n_distinct_characters, top_chars, categories, scripts}
    where categories/scripts map name -> char count (reference: A14 rollups)."""
    rows = char_counts(df, column).collect()
    total = sum(r["count"] for r in rows)
    cats: dict[str, int] = {}
    blocks: dict[str, int] = {}
    for r in rows:
        ch, n = r["char"], r["count"]
        cat = unicodedata.category(ch)
        cats[cat] = cats.get(cat, 0) + n
        try:
            name = unicodedata.name(ch)
            block = name.split(" ")[0]
        except ValueError:
            block = "UNKNOWN"
        blocks[block] = blocks.get(block, 0) + n
    top = sorted(rows, key=lambda r: (-r["count"], r["char"]))[:top_k]
    return {
        "n_characters": total,
        "n_distinct_characters": len(rows),
        "top_chars": [(r["char"], r["count"]) for r in top],
        "categories": dict(sorted(cats.items(), key=lambda kv: -kv[1])),
        "blocks": dict(sorted(blocks.items(), key=lambda kv: -kv[1])),
    }


# --- URLs ---------------------------------------------------------------------------

_URL_PARTS = ("PROTOCOL", "HOST", "PATH", "QUERY", "REF")


def url_parts(df: DataFrame, column: str) -> DataFrame:
    """(part, value, count) for scheme/netloc/path/query/fragment — ONE pass:
    project the five parse_url() extractions, melt, groupBy.

    reference: summary_algorithms.py:360-381 (pandas-only urlsplit + value_counts
    per part); Spark's parse_url is codegen'd and distributed."""
    c = S.col(column)
    structs = [
        F.struct(
            F.lit(part.lower()).alias("part"),
            F.parse_url(c, F.lit(part)).alias("value"),
        )
        for part in _URL_PARTS
    ]
    return (
        df.where(c.isNotNull())
        .select(F.explode(F.array(*structs)).alias("kv"))
        .select("kv.part", "kv.value")
        .where(F.col("value").isNotNull())
        .groupBy("part", "value")
        .agg(F.count(F.lit(1)).alias("count"))
    )


#: second-level labels that act as public suffixes under a 2-letter ccTLD
#: ("public-suffix-lite": the handful that covers the overwhelming mass of
#: real multi-part registries — co.uk, com.au, ac.jp, gov.br, … — without
#: shipping the full Mozilla list; wrong only for exotic registries, where
#: it degrades to grouping one level too coarse, never to an error)
_SECOND_LEVEL_SUFFIXES = (
    "co", "com", "net", "org", "gov", "edu", "ac", "mil", "or", "ne", "go",
)


def registered_domain(url: Column) -> Column:
    """Registered domain of a URL — the standard web-corpus curation key
    (C4/RefinedWeb-style per-domain rollups group on this, not the raw
    host, so ``a.blogspot.co.uk`` and ``www.blogspot.co.uk`` meet).

    Pure string/built-in ops (codegen, no UDF): lowercase
    ``parse_url(HOST)``, then collapse to the last two labels — or three
    when the TLD is a 2-letter country code and the second level is a
    known public-suffix label (``co.uk``, ``com.au``, ``ac.jp``, …).
    IPv4 hosts and one-label hosts pass through whole; null/unparsable
    URLs yield NULL (``try_parse_url`` — plain ``parse_url`` THROWS on
    invalid input under ANSI mode, the driver's session default). A
    trailing dot (the legal absolute-FQDN form, ``example.com.``) is
    trimmed first — otherwise every such host would collapse into one
    junk empty-TLD segment (review r7)."""
    host = F.regexp_replace(
        F.lower(F.try_parse_url(url, F.lit("HOST"))), r"\.+$", ""
    )
    labels = F.split(host, r"\.")
    n = F.size(labels)
    tld = F.element_at(labels, -1)
    sld = F.element_at(labels, -2)
    is_ip = host.rlike(r"^\d+\.\d+\.\d+\.\d+$")
    two_part_suffix = (
        (F.length(tld) == 2)
        & sld.isin(*_SECOND_LEVEL_SUFFIXES)
        & (n >= 3)
    )
    take = F.when(two_part_suffix, F.lit(3)).otherwise(F.lit(2))
    collapsed = F.array_join(F.slice(labels, n - take + 1, take), ".")
    return F.when(host.isNull() | (host == ""), F.lit(None)).otherwise(
        F.when(is_ip | (n <= 2), host).otherwise(collapsed)
    )


#: query parameters that are pure click-tracking noise — the standard strip
#: list URL-level dedup applies before comparing (utm_* campaign tags plus
#: the big ad/social click ids)
_TRACKER_PARAM_RE = (
    r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid|ref_src|yclid)="
)


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL — the normalization URL-level dedup and
    per-URL rollups need before two spellings of the same resource can
    meet: scheme and host lowercased, default ports dropped (``:443`` on
    https, ``:80`` on http — other ports kept), tracker query parameters
    stripped (``utm_*``, ``fbclid``, ``gclid``, …), remaining parameters
    SORTED, trailing path slashes removed, fragment dropped. NULL for
    null/unparsable input (``try_parse_url`` — ANSI-safe on junk).

    Pure built-ins (regex + array HOFs, codegen): rebuilds
    ``scheme://host[:port][path][?sorted_query]``. Simplification stated
    honestly: userinfo (``user:pass@host``) is not preserved — URLs
    carrying credentials canonicalize to their host form."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    authority = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    port_part = F.when(
        (port == "")
        | ((scheme == "https") & (port == "443"))
        | ((scheme == "http") & (port == "80")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_replace(
        F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")), r"/+$", ""
    )
    params = F.array_sort(
        F.filter(
            F.split(F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit("")), "&"),
            lambda p: (p != "") & ~F.lower(p).rlike(_TRACKER_PARAM_RE),
        )
    )
    qs = F.array_join(params, "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        port_part,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when(
        scheme.isNotNull() & host.isNotNull() & (host != ""), rebuilt
    )


# --- filesystem-style paths -----------------------------------------------------------

_PATH_EXPRS = {
    # dirname: everything before the last '/'
    "parent": lambda c: F.when(
        c.contains("/"), F.regexp_extract(c, r"^(.*)/[^/]*$", 1)
    ).otherwise(F.lit("")),
    "name": lambda c: F.element_at(F.split(c, "/"), -1),
    "stem": lambda c: F.regexp_extract(
        F.element_at(F.split(c, "/"), -1), r"^(.*?)(?:\.[^.]*)?$", 1
    ),
    "suffix": lambda c: F.regexp_extract(
        F.element_at(F.split(c, "/"), -1), r"(\.[^.]*)$", 1
    ),
    "anchor": lambda c: F.when(c.startswith("/"), F.lit("/")).otherwise(F.lit("")),
}


def path_parts(df: DataFrame, column: str) -> DataFrame:
    """(part, value, count) for parent/name/stem/suffix/anchor — one melted pass
    (reference: summary_algorithms.py:400-417, pandas-only)."""
    c = S.col(column)
    structs = [
        F.struct(F.lit(part).alias("part"), expr(c).alias("value"))
        for part, expr in _PATH_EXPRS.items()
    ]
    return (
        df.where(c.isNotNull())
        .select(F.explode(F.array(*structs)).alias("kv"))
        .select("kv.part", "kv.value")
        .groupBy("part", "value")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def common_prefix(df: DataFrame, column: str) -> str:
    """Longest common prefix of all non-null values: min and max of the column
    bound it, so ONE tiny aggregate + driver compare (no distinct transfer)."""
    c = S.col(column)
    row = df.agg(F.min(c).alias("lo"), F.max(c).alias("hi")).collect()[0]
    lo, hi = row["lo"], row["hi"]
    if lo is None or hi is None:
        return ""
    i = 0
    while i < min(len(lo), len(hi)) and lo[i] == hi[i]:
        i += 1
    return lo[:i]
