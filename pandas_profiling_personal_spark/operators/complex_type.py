"""Complex-number columns: parse, summarize, scatter.

The reference has a first-class ``Complex`` visions type (an identity relation
to Numeric — reference: src/pandas_profiling/model/typeset.py:186-194) and a
real-vs-imaginary scatter/hexbin render
(reference: src/pandas_profiling/visualisation/plot.py:191-216); its pandas
path profiles complex columns as numeric. Spark has no complex primitive
(SURVEY §1.3), so this engine models complex values the two ways they actually
arrive in a lake:

* a **string column** in Python literal form — ``"(1+2j)"``, ``"-3.5j"``,
  ``"1e3-2.5e-2j"`` — parsed JVM-side with ``regexp_extract`` into
  ``struct<re double, im double>``;
* a **struct<re,im>** column used as-is.

Everything downstream is declarative: one aggregate for the per-column summary
(mean is the complex mean = (mean re, mean im), plus modulus stats the
reference's numeric treatment implies), and the re×im density grid reuses the
bounded ``scatter_counts`` machinery (one combine-friendly shuffle, driver
transfer ≤ bins²) instead of the reference's collect-and-matplotlib scatter.

Parsing is RE2-compatible (no lookahead/backrefs) so a DuckDB oracle can run
the SAME patterns — the parity spec mirrors every branch. ``inf``/``nan``
components are counted as unparseable by design (the oracle must stay
engine-independent and IEEE printing of specials is not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from pandas_profiling_personal_spark.functions import stats as S

#: one float literal: 1  1.  .5  1.5  1e3  1.5E-2  (sign included)
FLOAT_RE = r"[+-]?(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d+)?"
#: unsigned magnitude for the imaginary coefficient after its mandatory sign
_MAG_RE = r"(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d+)?"
#: "re±imj" — group 1 = real, group 2 = signed imaginary coefficient whose
#: magnitude may be absent ("1+j" == 1+1j, matching Python's parser)
BOTH_RE = rf"^({FLOAT_RE})([+-](?:{_MAG_RE})?)j$"
#: "imj" — pure imaginary; group 1 may be a float, a bare sign, or empty
IMAG_RE = rf"^({FLOAT_RE}|[+-]?)j$"
#: "re" — pure real
REAL_RE = rf"^({FLOAT_RE})$"


def _coef(g: Column) -> Column:
    """Imaginary coefficient: bare ``+``/``-``/empty mean ±1 (as in Python)."""
    return (
        F.when((g == "") | (g == "+"), F.lit(1.0))
        .when(g == "-", F.lit(-1.0))
        .otherwise(g.cast("double"))
    )


def parse_complex(c: Column) -> Column:
    """``struct<re double, im double>`` from a Python-style complex literal
    string; NULL struct when the value is NULL or unparseable.

    Whitespace and one layer of surrounding parens (Python's repr form
    ``(1+2j)``) are stripped first. All regex work happens JVM-side inside
    whole-stage codegen — no UDF."""
    s = F.regexp_replace(F.trim(c), r"^\((.*)\)$", "$1")
    re_part = (
        F.when(s.rlike(BOTH_RE), F.regexp_extract(s, BOTH_RE, 1).cast("double"))
        .when(s.rlike(IMAG_RE), F.lit(0.0))
        .when(s.rlike(REAL_RE), s.cast("double"))
    )
    im_part = (
        F.when(s.rlike(BOTH_RE), _coef(F.regexp_extract(s, BOTH_RE, 2)))
        .when(s.rlike(IMAG_RE), _coef(F.regexp_extract(s, IMAG_RE, 1)))
        .when(s.rlike(REAL_RE), F.lit(0.0))
    )
    return F.when(
        re_part.isNotNull() & im_part.isNotNull(),
        F.struct(re_part.alias("re"), im_part.alias("im")),
    )


def _as_struct(df: DataFrame, column: str) -> Column:
    dtype = df.schema[column].dataType.simpleString()
    c = S.col(column)
    if dtype.startswith("struct"):
        return F.when(
            c["re"].isNotNull() & c["im"].isNotNull(),
            F.struct(
                c["re"].cast("double").alias("re"),
                c["im"].cast("double").alias("im"),
            ),
        )
    return parse_complex(c)


def complex_summary(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """One row per column: ``(column, n, n_missing, n_invalid, n_zero,
    mean_re, mean_im, mean_abs, min_abs, max_abs, max_re, min_re, max_im,
    min_im)``.

    ``n_missing`` counts NULL inputs, ``n_invalid`` non-NULL values that failed
    to parse; the reference's numeric treatment of complex (typeset.py:186-194)
    maps to: mean = complex(mean_re, mean_im), plus modulus extrema for the
    magnitude view. All columns ride ONE melted aggregate — a single
    combine-friendly shuffle of ≤ columns × partitions partial rows; the usual
    ``None`` = all string/struct-re-im columns, ``[]`` = none contract."""
    if columns is None:
        columns = [
            f.name
            for f in df.schema.fields
            if f.dataType.simpleString() == "string"
            or f.dataType.simpleString().startswith("struct<re:")
        ]
    if not columns:
        return df.sparkSession.createDataFrame(
            [],
            "column string, n bigint, n_missing bigint, n_invalid bigint, "
            "n_zero bigint, mean_re double, mean_im double, mean_abs double, "
            "min_abs double, max_abs double, min_re double, max_re double, "
            "min_im double, max_im double",
        )
    structs = [
        F.struct(
            F.lit(name).alias("column"),
            S.col(name).isNull().alias("is_null"),
            _as_struct(df, name).alias("v"),
        )
        for name in columns
    ]
    melted = df.select(F.explode(F.array(*structs)).alias("kv")).select("kv.*")
    v, re_, im_ = F.col("v"), F.col("v.re"), F.col("v.im")
    mod = F.sqrt(re_ * re_ + im_ * im_)
    return (
        melted.groupBy("column")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_null").cast("long")).alias("n_missing"),
            F.sum((~F.col("is_null") & v.isNull()).cast("long")).alias(
                "n_invalid"
            ),
            F.sum(((re_ == 0.0) & (im_ == 0.0)).cast("long")).alias("n_zero"),
            F.round(F.avg(re_), 4).alias("mean_re"),
            F.round(F.avg(im_), 4).alias("mean_im"),
            F.round(F.avg(mod), 4).alias("mean_abs"),
            F.round(F.min(mod), 4).alias("min_abs"),
            F.round(F.max(mod), 4).alias("max_abs"),
            F.round(F.min(re_), 4).alias("min_re"),
            F.round(F.max(re_), 4).alias("max_re"),
            F.round(F.min(im_), 4).alias("min_im"),
            F.round(F.max(im_), 4).alias("max_im"),
        )
        .orderBy("column")
    )


def complex_scatter(
    df: DataFrame, column: str, bins: int = 32
) -> DataFrame:
    """Re×im density grid ``(x_bucket, y_bucket, cnt)`` — the distributed
    equivalent of the reference's real/imaginary scatter
    (visualisation/plot.py:191-216): one bounded aggregate instead of
    collecting raw points; ranges from a first 1-row min/max aggregate."""
    from pandas_profiling_personal_spark.operators.interactions import (
        scatter_counts,
    )

    parsed = df.select(_as_struct(df, column).alias("v")).where(
        F.col("v").isNotNull()
    )
    flat = parsed.select(
        F.col("v.re").alias("__re"), F.col("v.im").alias("__im")
    )
    rng = flat.agg(
        F.min("__re"), F.max("__re"), F.min("__im"), F.max("__im")
    ).first()
    if rng is None or rng[0] is None:
        return flat.sparkSession.createDataFrame(
            [], "x_bucket long, y_bucket long, cnt bigint"
        )
    return scatter_counts(
        flat,
        "__re",
        "__im",
        (float(rng[0]), float(rng[1])),
        (float(rng[2]), float(rng[3])),
        bins,
    )
