"""Variable-type system: Spark schema -> profiling variable type.

The reference has two typing paths: a content-inferring visions typeset on pandas
(reference: src/pandas_profiling/model/typeset.py:237-259) and a fixed schema-driven
bucketing on Spark (typeset.py:197-234, dispatch at summary.py:108-112). This engine
is schema-driven first (cheap, exact at any scale) with an *optional* content
inference pass restoring the pandas-path semantics the reference's Spark path dropped
(string->bool, string->numeric, low-cardinality numeric->categorical;
reference: typeset_relations.py:39-101).

Fixes a reference inconsistency: DecimalType/ByteType counted as numeric for
correlations (dataframe_wrappers.py:402-416) but not in SparkNumeric.contains_op
(typeset.py:201-214). Here Decimal/Byte are numeric everywhere.
"""

from __future__ import annotations

import enum

from pyspark.sql import DataFrame, functions as F, types as T


class VariableType(str, enum.Enum):
    NUMERIC = "Numeric"
    CATEGORICAL = "Categorical"
    BOOLEAN = "Boolean"
    DATETIME = "DateTime"
    ARRAY = "Array"
    MAP = "Map"
    STRUCT = "Struct"
    BINARY = "Binary"
    UNSUPPORTED = "Unsupported"

    def __str__(self) -> str:  # pragma: no cover
        return self.value


_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)

_DATETIME_TYPES = (T.TimestampType, T.DateType)
try:  # Spark >= 3.4
    _DATETIME_TYPES = _DATETIME_TYPES + (T.TimestampNTZType,)
except AttributeError:  # pragma: no cover
    pass


def variable_type(dtype: T.DataType) -> VariableType:
    """Bucket one Spark DataType into a profiling variable type."""
    if isinstance(dtype, _NUMERIC_TYPES):
        return VariableType.NUMERIC
    if isinstance(dtype, T.BooleanType):
        return VariableType.BOOLEAN
    if isinstance(dtype, T.StringType):
        return VariableType.CATEGORICAL
    if isinstance(dtype, _DATETIME_TYPES):
        return VariableType.DATETIME
    if isinstance(dtype, T.ArrayType):
        return VariableType.ARRAY
    if isinstance(dtype, T.MapType):
        return VariableType.MAP
    if isinstance(dtype, T.StructType):
        return VariableType.STRUCT
    if isinstance(dtype, T.BinaryType):
        return VariableType.BINARY
    return VariableType.UNSUPPORTED


def variable_types(df: DataFrame) -> dict[str, VariableType]:
    """Schema-driven variable type for every column (no Spark job)."""
    return {f.name: variable_type(f.dataType) for f in df.schema.fields}


def is_float_type(dtype: T.DataType) -> bool:
    """Float/double can hold NaN and +/-inf (null != NaN in Spark, unlike pandas)."""
    return isinstance(dtype, (T.FloatType, T.DoubleType))


# --- optional content inference (one extra aggregation pass) ----------------------

_BOOL_TOKENS = {"true", "false", "t", "f", "yes", "no", "y", "n", "1", "0"}
_TRUE_TOKENS = {"true", "t", "yes", "y", "1"}


def infer_variable_types(
    df: DataFrame,
    base: dict[str, VariableType],
    low_categorical_threshold: int = 5,
    coerce_str_to_date: bool = False,
) -> dict[str, VariableType]:
    """Content-based refinement in ONE aggregation pass over the table.

    Mirrors the reference pandas-path inference rules
    (reference: typeset_relations.py:39-101):
      * string col whose non-null values are all boolean-ish tokens -> BOOLEAN
      * string col fully castable to double -> NUMERIC
      * string col fully castable to timestamp -> DATETIME (opt-in
        ``coerce_str_to_date``, the reference's vars.cat.coerce_str_to_date,
        config_default.yaml:45 — opt-in there too; numeric wins over date so
        a year-only column like "2023" stays NUMERIC, since Spark casts bare
        years to Jan-1 timestamps)
      * numeric col with 1 <= n_distinct <= low_categorical_threshold -> CATEGORICAL

    All checks are aggregate expressions folded into a single ``df.agg`` so the cost
    is one scan regardless of column count.
    """
    exprs = []
    for i, (name, vt) in enumerate(base.items()):
        c = F.col(f"`{name}`")
        if vt is VariableType.CATEGORICAL:
            lowered = F.lower(F.trim(c))
            all_bool = (F.count(c) > 0) & (
                F.count(F.when(lowered.isin(*sorted(_BOOL_TOKENS)), 1)) == F.count(c)
            )
            all_num = (F.count(c) > 0) & (
                F.count(c.try_cast("double")) == F.count(c)
            )
            exprs.append(all_bool.alias(f"c{i}__all_bool"))
            exprs.append(all_num.alias(f"c{i}__all_num"))
            if coerce_str_to_date:
                all_date = (F.count(c) > 0) & (
                    F.count(c.try_cast("timestamp")) == F.count(c)
                )
                exprs.append(all_date.alias(f"c{i}__all_date"))
        elif vt is VariableType.NUMERIC:
            exprs.append(
                F.approx_count_distinct(c).alias(f"c{i}__n_distinct_approx")
            )
    if not exprs:
        return dict(base)
    row = df.agg(*exprs).collect()[0].asDict()
    out: dict[str, VariableType] = {}
    for i, (name, vt) in enumerate(base.items()):
        if vt is VariableType.CATEGORICAL:
            if row.get(f"c{i}__all_bool"):
                out[name] = VariableType.BOOLEAN
            elif row.get(f"c{i}__all_num"):
                out[name] = VariableType.NUMERIC
            elif row.get(f"c{i}__all_date"):
                out[name] = VariableType.DATETIME
            else:
                out[name] = vt
        elif vt is VariableType.NUMERIC:
            nd = row.get(f"c{i}__n_distinct_approx") or 0
            out[name] = (
                VariableType.CATEGORICAL
                if 1 <= nd <= low_categorical_threshold
                else vt
            )
        else:
            out[name] = vt
    return out


def apply_inferred_types(
    df: DataFrame,
    base: dict[str, VariableType],
    inferred: dict[str, VariableType],
) -> DataFrame:
    """Materialize content-inferred types as typed columns.

    Downstream aggregates assume the column's Spark type matches its variable
    type (``n_true`` casts to int, ``n_empty`` compares to ``''``): feeding a
    raw string column reclassified as BOOLEAN/NUMERIC into them throws
    CAST_INVALID_INPUT under ANSI mode (the Spark 4 default) or silently
    miscounts with ANSI off. This projection rewrites exactly the reclassified
    columns — the analogue of the reference pandas path, where visions
    relations physically cast the series on inference
    (reference: typeset_relations.py:39-101):

      * string -> BOOLEAN: token map (null-preserving; inference already
        proved every non-null value is a bool token)
      * string -> NUMERIC: ``try_cast('double')`` (never raises, null on the
        impossible-by-construction stragglers)
      * numeric -> CATEGORICAL: ``cast('string')`` so empty/length/frequency
        semantics apply cleanly
    """
    replaced = []
    changed = False
    for f in df.schema.fields:
        name = f.name
        c = F.col(f"`{name}`")
        b, v = base.get(name), inferred.get(name)
        if b is VariableType.CATEGORICAL and v is VariableType.BOOLEAN:
            c = F.when(
                c.isNotNull(), F.lower(F.trim(c)).isin(*sorted(_TRUE_TOKENS))
            ).alias(name)
            changed = True
        elif b is VariableType.CATEGORICAL and v is VariableType.NUMERIC:
            c = c.try_cast("double").alias(name)
            changed = True
        elif b is VariableType.CATEGORICAL and v is VariableType.DATETIME:
            c = c.try_cast("timestamp").alias(name)
            changed = True
        elif b is VariableType.NUMERIC and v is VariableType.CATEGORICAL:
            c = c.cast("string").alias(name)
            changed = True
        else:
            c = c.alias(name)
        replaced.append(c)
    return df.select(*replaced) if changed else df
