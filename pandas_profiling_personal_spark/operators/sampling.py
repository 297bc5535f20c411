"""Row samples for the report (reference: model/sample.py, dataframe_wrappers.py:476-482).

All samples are bounded driver transfers (limit/sample-then-limit). ``head`` on an
unordered Spark DataFrame is nondeterministic across runs/engines; ``head`` here
optionally orders by key columns first so tests and oracles are stable (the
reference's samples are unseeded and unstable — K4 note in SURVEY.md §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pandas_profiling_personal_spark.functions import stats as S


def head(df: DataFrame, n: int, order_by: list[str] | None = None) -> DataFrame:
    out = df
    if order_by:
        out = out.orderBy(*[S.col(c) for c in order_by])
    return out.limit(n)


def tail(df: DataFrame, n: int, order_by: list[str] | None = None) -> list:
    """Last ``n`` rows (K3 — the reference has no Spark tail,
    dataframe_wrappers.py:331-342; Spark >= 3.0 provides ``df.tail``). A
    driver-heavy action: the scan runs to the end and ``n`` rows return to the
    driver, so callers must keep ``n`` report-sized. With ``order_by`` the
    frame is sorted first so "last" is well-defined across engines (an
    unordered Spark frame has no stable row order)."""
    out = df
    if order_by:
        out = out.orderBy(*[S.col(c) for c in order_by])
    return out.tail(n)


def random_sample(
    df: DataFrame, n: int, seed: int = 42, total: int | None = None
) -> DataFrame:
    """Seeded random sample of ~n rows (fraction-free: sample a generous fraction
    then limit; exact-n semantics are not needed for a report preview).
    Pass ``total`` when the row count is already known (the profile pipeline
    knows it from pass 1) to skip the count job."""
    if total is None:
        total = df.count()
    if total <= n:
        return df
    fraction = min(1.0, (n * 2.0) / total)
    return df.sample(fraction=fraction, seed=seed).limit(n)


def deterministic_sample(
    df: DataFrame, key: str, mod: int = 20, bucket: int = 0
) -> DataFrame:
    """Engine-independent pseudo-random sample: keep rows where
    md5(key) mod ``mod`` == ``bucket``. Unlike ``df.sample``, any engine computing
    the same expression selects the same rows — used for oracle-checkable sampling
    and for cheap stable subsamples at scale."""
    h = F.conv(F.substring(F.md5(S.col(key).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return df.where(h % mod == bucket)
