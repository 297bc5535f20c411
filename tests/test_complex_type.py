"""Complex-type operator: parse parity with Python's complex(), summary
aggregates, scatter grid, and profile() refinement (reference
typeset.py:186-194, visualisation/plot.py:191-216)."""

import math

import pytest
from pyspark.sql import functions as F

from pandas_profiling_personal_spark.operators.complex_type import (
    complex_scatter,
    complex_summary,
    parse_complex,
)

PARSE_CASES = [
    "(1+2j)",
    "1+2j",
    "1-2j",
    "-1.5+2.5j",
    "-1.5-2.5j",
    "2j",
    "-2j",
    "+2j",
    "j",
    "+j",
    "-j",
    "1+j",
    "1-j",
    "5",
    "-5.25",
    ".5",
    "1.",
    "1e3",
    "1.5E-2",
    "1e+2j",
    "1.5e2+2.5e-1j",
    "(0+0j)",
    "0",
    "  1+2j  ",
]

INVALID_CASES = ["", "x", "1+2", "j1", "1jj", "1+2i", "--1j", "1 + 2j", "(1+2j"]


def test_parse_matches_python_complex(spark):
    rows = [(s,) for s in PARSE_CASES + INVALID_CASES]
    df = spark.createDataFrame(rows, "s string")
    got = {
        r["s"]: (None if r["v"] is None else (r["v"]["re"], r["v"]["im"]))
        for r in df.select("s", parse_complex(F.col("s")).alias("v")).collect()
    }
    for s in PARSE_CASES:
        expected = complex(s.strip())
        assert got[s] is not None, f"{s!r} should parse"
        assert got[s][0] == pytest.approx(expected.real), s
        assert got[s][1] == pytest.approx(expected.imag), s
    for s in INVALID_CASES:
        assert got[s] is None, f"{s!r} should NOT parse"


def test_complex_summary_small_frame(spark):
    df = spark.createDataFrame(
        [("1+2j",), ("3-4j",), ("5",), ("2j",), ("bogus",), (None,)],
        "c string",
    )
    row = complex_summary(df, ["c"]).collect()[0]
    assert row["n"] == 6
    assert row["n_missing"] == 1
    assert row["n_invalid"] == 1
    assert row["n_zero"] == 0
    # values: 1+2j, 3-4j, 5+0j, 0+2j
    assert row["mean_re"] == pytest.approx((1 + 3 + 5 + 0) / 4)
    assert row["mean_im"] == pytest.approx((2 - 4 + 0 + 2) / 4)
    assert row["max_abs"] == pytest.approx(5.0)
    assert row["min_abs"] == pytest.approx(2.0)
    mods = [abs(complex(1, 2)), abs(complex(3, -4)), 5.0, 2.0]
    assert row["mean_abs"] == pytest.approx(
        round(sum(mods) / 4, 4), abs=1e-9
    )


def test_complex_summary_struct_input(spark):
    df = spark.createDataFrame(
        [((1.0, 2.0),), ((3.0, -4.0),), (None,)],
        "c struct<re double, im double>",
    )
    row = complex_summary(df, ["c"]).collect()[0]
    assert row["n"] == 3
    assert row["n_missing"] == 1
    assert row["n_invalid"] == 0
    assert row["mean_re"] == pytest.approx(2.0)
    assert row["mean_im"] == pytest.approx(-1.0)


def test_complex_summary_empty_columns_contract(spark):
    df = spark.createDataFrame([("1+2j",)], "c string")
    assert complex_summary(df, []).count() == 0


def test_complex_scatter_grid(spark):
    vals = [complex(x, y) for x in range(-2, 3) for y in range(-2, 3)]
    df = spark.createDataFrame(
        [(str(v).strip("()"),) for v in vals] + [("bogus",), (None,)],
        "c string",
    )
    grid = complex_scatter(df, "c", bins=4).collect()
    assert sum(r["cnt"] for r in grid) == len(vals)
    assert all(0 <= r["x_bucket"] < 4 and 0 <= r["y_bucket"] < 4 for r in grid)


def test_profile_refines_complex_strings(spark):
    from pandas_profiling_personal_spark import ProfileConfig, profile

    vals = [complex(i % 7 - 3, i % 5 - 2) for i in range(50)]
    df = spark.createDataFrame(
        [
            (i, str(v).strip("()"), str(i * 3 + 1))
            for i, v in enumerate(vals)
        ],
        "id bigint, signal string, plain string",
    )
    res = profile(
        df,
        ProfileConfig(
            string_refinement=True, correlations=(), duplicates=False
        ),
    )
    v = res.variables["signal"]
    assert v["type_refined"] == "complex"
    st = v["complex_stats"]
    assert st["n_invalid"] == 0
    assert st["mean_re"] == pytest.approx(
        round(sum(c.real for c in vals) / len(vals), 4), abs=1e-9
    )
    assert "complex_scatter" in v
    assert sum(d["cnt"] for d in v["complex_scatter"]) == len(vals)
    # numeric strings must NOT be claimed by the complex refiner
    assert res.variables["plain"].get("type_refined") != "complex"

    from pandas_profiling_personal_spark.report.html import render_html

    page = render_html(res)
    assert "Complex" in page
    assert "data-chart='scatter'" in page


def test_profile_refines_long_text(spark):
    from pandas_profiling_personal_spark import ProfileConfig, profile

    base = (
        "the quick brown fox and the lazy dog are in the yard with you for "
        "this is a fine day and it is good to have words that flow onward "
    )
    df = spark.createDataFrame(
        [(i, base + f"doc number {i}") for i in range(40)],
        "doc_id bigint, body string",
    )
    res = profile(
        df,
        ProfileConfig(
            string_refinement=True, correlations=(), duplicates=False
        ),
    )
    v = res.variables["body"]
    assert v["type_refined"] == "text"
    ts = v["text_stats"]
    assert ts["total_tokens"] == 40 * (len(base.split()) + 3)
    assert 0.0 < ts["mean_quality_score"] <= 1.0
    assert v["language_dist"].get("en") == 40

    from pandas_profiling_personal_spark.report.html import render_html

    page = render_html(res)
    assert "Mean quality" in page
