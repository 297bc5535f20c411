"""pandas_profiling_personal_spark — a PySpark-native data profiling / EDA engine.

A from-scratch rebuild of the capabilities of chanedwin/pandas-profiling-personal
(pandas-profiling v2.9 fork with a Spark backend) as an idiomatic Spark DataFrame
application. Unlike the reference, which issues ~5-10 Spark jobs *per column*
(reference: src/pandas_profiling/model/summary.py:135-193 drives one describe per
column, each with several actions), this engine folds all scalar per-column
statistics into a handful of whole-table aggregation passes, so a full profile of a
1,000-column table is still a constant number of Spark jobs.

Public API:
    profile(df, config=None) -> ProfileResult      # full EDA profile
    ProfileConfig                                   # explicit config (no global singleton)
"""

from pandas_profiling_personal_spark.config import (
    EXACT,
    EXPLORATIVE,
    MINIMAL,
    SENSITIVE,
    ProfileConfig,
)
from pandas_profiling_personal_spark.decorator import attach, detach
from pandas_profiling_personal_spark.plans.incremental import (
    PartialProfile,
    finalize_partial,
    merge_partials,
    partial_profile,
)
from pandas_profiling_personal_spark.plans.profile import (
    ProfileResult,
    profile,
    profile_column,
)
from pandas_profiling_personal_spark.report.compare import (
    compare_profiles,
    comparison_to_html,
)
from pandas_profiling_personal_spark.report.card import (
    card_to_file,
    dataset_card,
)
from pandas_profiling_personal_spark.report.html import render_html, to_file
from pandas_profiling_personal_spark.operators.layout import (
    apply_layout,
    layout_stats,
    suggest_layout,
    suggest_layout_from_profile,
    suggest_layout_from_state,
)
from pandas_profiling_personal_spark.report.notebook import to_notebook_iframe
from pandas_profiling_personal_spark.report.widgets import to_widgets, widget_spec
from pandas_profiling_personal_spark.types import VariableType, variable_types

__version__ = "0.1.0"

__all__ = [
    "EXACT",
    "EXPLORATIVE",
    "MINIMAL",
    "SENSITIVE",
    "ProfileConfig",
    "attach",
    "detach",
    "PartialProfile",
    "ProfileResult",
    "finalize_partial",
    "merge_partials",
    "partial_profile",
    "apply_layout",
    "card_to_file",
    "dataset_card",
    "layout_stats",
    "suggest_layout",
    "suggest_layout_from_profile",
    "suggest_layout_from_state",
    "profile",
    "profile_column",
    "VariableType",
    "variable_types",
    "compare_profiles",
    "comparison_to_html",
    "render_html",
    "to_file",
    "to_notebook_iframe",
    "to_widgets",
    "widget_spec",
]
