"""VERDICT r3 #3: an explicit ``columns=[]`` must mean "no columns" (empty
result), never a silent fall-through to profiling the full table — the
near-unique gate made "gate everything -> [] -> full-table melt" reachable.
``columns=None`` keeps meaning "all columns"."""

from pyspark.sql import functions as F


def _df(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, None)], "x int, s string"
    )


def test_melt_empty_columns(spark):
    from pandas_profiling_personal_spark.operators.frequencies import melt

    assert melt(_df(spark), []).count() == 0
    assert melt(_df(spark), None).count() == 5  # 6 cells - 1 null


def test_value_counts_all_empty_columns(spark):
    from pandas_profiling_personal_spark.operators.frequencies import (
        value_counts_all,
    )

    assert value_counts_all(_df(spark), []).count() == 0
    assert value_counts_all(_df(spark)).count() > 0


def test_distinct_unique_counts_empty_columns(spark):
    from pandas_profiling_personal_spark.operators.frequencies import (
        distinct_unique_counts,
    )

    assert distinct_unique_counts(_df(spark), []).count() == 0


def test_top_k_all_empty_columns(spark):
    from pandas_profiling_personal_spark.operators.frequencies import top_k_all

    assert top_k_all(_df(spark), 5, []).count() == 0


def test_frequency_summary_empty_columns(spark):
    from pandas_profiling_personal_spark.operators.frequencies import (
        frequency_summary,
    )

    scalars, tops, extremes = frequency_summary(_df(spark), [])
    assert scalars == {} and tops == {} and extremes == {}


def test_null_counts_empty_columns(spark):
    from pandas_profiling_personal_spark.operators.missing import null_counts

    assert null_counts(_df(spark), []) == {}
    assert null_counts(_df(spark))["s"] == 1


def test_nullity_correlation_empty_columns(spark):
    from pandas_profiling_personal_spark.operators.missing import (
        nullity_correlation,
    )

    assert nullity_correlation(_df(spark), []) == {}


def test_sketches_empty_columns(spark):
    from pandas_profiling_personal_spark.operators.sketches import (
        cms_top_k,
        hll_distinct_counts,
    )

    assert cms_top_k(_df(spark), []) == {}
    assert hll_distinct_counts(_df(spark), []) == {}


def test_profile_empty_columns(spark):
    from pandas_profiling_personal_spark import profile

    res = profile(_df(spark), columns=[])
    assert res.variables == {}
    # None still profiles everything
    res_all = profile(_df(spark))
    assert set(res_all.variables) == {"x", "s"}
