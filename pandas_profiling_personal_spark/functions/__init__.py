from pandas_profiling_personal_spark.functions import stats  # noqa: F401
