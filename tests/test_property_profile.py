"""Property-based robustness: profile() must never crash and must satisfy
counting invariants on arbitrary (small) frames — including NaN/±inf doubles,
empty strings, all-null columns, and single-row frames. The reference's test
suite has no property-based layer (SURVEY.md §5); this is the engine's."""

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

# module-scoped frames are rebuilt per example; keep the search small — each
# profile run is a real multi-pass Spark pipeline
N_EXAMPLES = 6

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)
weird_doubles = st.one_of(
    finite_doubles,
    st.just(float("nan")),
    st.just(float("inf")),
    st.just(-float("inf")),
    st.none(),
)
small_strings = st.one_of(
    st.text(alphabet="abπ☃ ", min_size=0, max_size=6), st.none()
)
bools = st.one_of(st.booleans(), st.none())

rows_strategy = st.lists(
    st.tuples(weird_doubles, small_strings, bools, st.integers(-5, 5)),
    min_size=1,
    max_size=40,
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_profile_invariants_random_frames(spark, rows):
    from pandas_profiling_personal_spark import ProfileConfig, profile

    schema = T.StructType(
        [
            T.StructField("d", T.DoubleType()),
            T.StructField("s", T.StringType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("i", T.LongType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    r = profile(df, ProfileConfig(exact=True, correlations=()))
    n = r.table["n"]
    assert n == len(rows)
    for name, v in r.variables.items():
        assert v["count"] + v["n_missing"] == n, name
        assert 0.0 <= v["p_missing"] <= 1.0, name
        if v.get("n_distinct") is not None and v["count"]:
            assert 1 <= v["n_distinct"] <= v["count"], name
        if v.get("n_unique") is not None:
            assert 0 <= v["n_unique"] <= (v.get("n_distinct") or 0), name
        if v.get("top_values"):
            assert sum(t["count"] for t in v["top_values"]) <= v["count"], name
        mean = v.get("mean")
        mn, mx = v.get("min"), v.get("max")
        if (
            name == "d"
            and mean is not None
            and not (isinstance(mean, float) and math.isnan(mean))
            and mn is not None
            and mx is not None
            and not any(math.isinf(x) for x in (mn, mx))
        ):
            assert mn - 1e-6 <= mean <= mx + 1e-6
    # the result must serialize
    assert len(r.to_json()) > 2


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(finite_doubles, min_size=2, max_size=60),
    n_shards=st.integers(2, 4),
    bins=st.integers(1, 9),
)
def test_histogram_merge_equals_batch_random(spark, vals, n_shards, bins):
    """Property: for ANY values, shard split and bin count, sharded
    histograms over shared first-shard edges merge (vector add) to
    exactly the batch histogram at the same spec — including values
    outside the first shard's range (clamped identically)."""
    from pandas_profiling_personal_spark.operators.histogram import (
        histogram_all,
    )
    from pandas_profiling_personal_spark.plans.incremental import (
        histogram_specs_of,
        merge_partials,
        partial_profile,
    )

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i bigint, x double")
    shards = [df.where(f"i % {n_shards} = {s}") for s in range(n_shards)]
    # first non-empty shard derives the edges
    first = next(s for s in shards if s.count() > 0)
    p0 = partial_profile(first, columns=["x"], histograms=bins)
    specs = histogram_specs_of(p0)
    if not specs:  # constant/degenerate first shard still has lo==hi specs
        return
    parts = [p0] + [
        # allow_disjoint: this property deliberately exercises the raw
        # clamp algebra for ANY values — a random shard may lie entirely
        # outside the first shard's edges, which the default refuses
        # (alignment honesty guard: a drift PSI over such a state lies)
        partial_profile(
            s, columns=["x"], histograms=specs, allow_disjoint=True
        )
        for s in shards
        if s is not first
    ]
    merged = merge_partials(parts)
    batch = histogram_all(df, specs)
    assert merged.columns["x"].hist_counts == batch["x"]["counts"]
    assert sum(merged.columns["x"].hist_counts) == len(vals)
