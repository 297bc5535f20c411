"""Opt-in ``DataFrame.profile_report()`` attach for PySpark DataFrames.

The reference monkey-patches pandas at import time
(reference: src/pandas_profiling/controller/pandas_decorator.py:1-20 —
``DataFrame.profile_report = profile_report`` as an import side effect).
This is the PySpark equivalent, but OPT-IN: importing the package never
mutates ``pyspark.sql.DataFrame``; call :func:`attach` (or import this
module's :data:`auto` submodule-style helper) to install the method.
Import-side-effect patching breaks other libraries' expectations of the
shared DataFrame class, so the side effect is the caller's explicit choice.

Usage::

    from pandas_profiling_personal_spark.decorator import attach
    attach()
    report = spark.read.parquet(...).profile_report(preset="minimal")
    report.to_json()
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from pandas_profiling_personal_spark.config import ProfileConfig
from pandas_profiling_personal_spark.plans.profile import (
    ProfileResult,
    profile,
)


def profile_report(
    df: DataFrame,
    config: ProfileConfig | None = None,
    columns: list[str] | None = None,
    **kwargs: Any,
) -> ProfileResult:
    """Profile this DataFrame (method form of
    :func:`pandas_profiling_personal_spark.profile`).

    ``config`` takes a ready :class:`ProfileConfig`; bare ``**kwargs`` are
    config-field overrides built via :meth:`ProfileConfig.from_dict` (so
    ``preset="minimal"`` and any config field name work, and unknown keys
    raise the reference's 'Config parameter "x" does not exist' error).
    Passing both is rejected — silently merging them would make precedence
    ambiguous."""
    if config is not None and kwargs:
        raise ValueError(
            "pass either config= or field overrides as keyword arguments, "
            "not both"
        )
    if config is None:
        config = ProfileConfig.from_dict(kwargs) if kwargs else None
    return profile(df, config, columns=columns)


def attach() -> None:
    """Install ``profile_report`` as a method on ``pyspark.sql.DataFrame``
    (idempotent). After this, ``df.profile_report(**config)`` works exactly
    like the reference's pandas decorator."""
    DataFrame.profile_report = profile_report


def detach() -> None:
    """Remove the attached method (no-op if not attached) — keeps test
    environments clean."""
    if getattr(DataFrame, "profile_report", None) is profile_report:
        del DataFrame.profile_report
