"""Oracle-parity queries: each engine operator as a (Spark plan, DuckDB SQL) pair.

These back ``__spark_entry__.queries()`` / ``oracle_sql()``. Both sides are generated
from the same spec so column names, rounding, and tie-breaks line up exactly:

* floats rounded to ``ROUND=4`` decimals on BOTH sides (absorbs partition-order
  FP noise; magnitudes in the testdata keep the boundary-collision risk ~1e-5);
* sums aggregated as exact DECIMAL and cast back to double (order-independent,
  bit-identical across engines — see functions/stats.stable_sum);
* skew/kurt: Spark population estimators corrected to the sample (Fisher)
  estimators DuckDB/pandas use (functions/stats.skewness_sample);
* quantiles: exact ``percentile`` vs DuckDB ``quantile_cont`` (same linear
  interpolation);
* top-K / LIMIT queries: fully deterministic ORDER BY (count desc, then keys);
* histogram buckets: explicit IEEE arithmetic identical on both sides.
"""

from __future__ import annotations

from itertools import combinations
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from pandas_profiling_personal_spark.functions import stats as S
from pandas_profiling_personal_spark.operators import frequencies as FQ

ROUND = 4

QueryFn = Callable[[SparkSession, str], DataFrame]


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    from pandas_profiling_personal_spark.functions.partitioning import (
        parallelize_narrow,
    )
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    # testdata files are single small parquet files — widen so compute-dense
    # aggregates (exact percentile, rank windows) use every core, not one
    return parallelize_narrow(read_parquet(spark, f"{sf_dir}/{table}.parquet"))


def _r(c, nd: int = ROUND):
    return F.round(c, nd)


def _long(one_row_df: DataFrame, triples: list[tuple[str, str, str]]) -> DataFrame:
    """Explode a 1-row wide aggregate into (col_name, stat, value double) rows."""
    structs = [
        F.struct(
            F.lit(col).alias("col_name"),
            F.lit(stat).alias("stat"),
            F.col(alias).cast("double").alias("value"),
        )
        for col, stat, alias in triples
    ]
    return one_row_df.select(F.explode(F.array(*structs)).alias("kv")).select("kv.*")


# --------------------------------------------------------------------------------
# numeric scalar summary (A4-A9 of SURVEY §2.4) — long format
# --------------------------------------------------------------------------------

_NUM_STATS_SQL = {
    "count": "CAST(count({c}) AS DOUBLE)",
    "n_missing": "CAST(count(*) - count({c}) AS DOUBLE)",
    "mean": "round(avg({c}), 4)",
    "std": "round(stddev_samp({c}), 4)",
    "min": "CAST(min({c}) AS DOUBLE)",
    "max": "CAST(max({c}) AS DOUBLE)",
    "sum": "CAST(sum(CAST({c} AS DECIMAL(30,4))) AS DOUBLE)",
    "skewness": "round(skewness({c}), 4)",
    "kurtosis": "round(kurtosis({c}), 4)",
    "n_zeros": "CAST(sum(CASE WHEN {c} = 0 THEN 1 ELSE 0 END) AS DOUBLE)",
    "q05": "round(quantile_cont({c}, 0.05), 4)",
    "q25": "round(quantile_cont({c}, 0.25), 4)",
    "median": "round(quantile_cont({c}, 0.5), 4)",
    "q75": "round(quantile_cont({c}, 0.75), 4)",
    "q95": "round(quantile_cont({c}, 0.95), 4)",
    "iqr": "round(quantile_cont({c}, 0.75) - quantile_cont({c}, 0.25), 4)",
    "range": "CAST(max({c}) - min({c}) AS DOUBLE)",
    "cv": "round(stddev_samp({c}) / avg({c}), 4)",
}


def _num_raw_exprs(col: str, p: str) -> tuple[list, list]:
    """RAW aggregates split into (declarative, percentile) groups.

    Mixing TypedImperativeAggregate (percentile) with declarative aggregates
    forces ObjectHashAggregateExec to evaluate EVERYTHING interpreted — measured
    2x wall-clock at sf0.1 vs running the two groups as separate aggregations.
    The query joins the two 1-row branches (each compiled optimally) instead.
    Derived statistics (bias corrections, rounding, iqr/range/cv, percentile
    indexing) happen in a projection over the joined 1-row result."""
    c = S.col(col)
    decl = [
        F.count(c).alias(f"{p}__cnt"),
        S.n_missing(c).alias(f"{p}__n_missing_raw"),
        S.mean(c).alias(f"{p}__mean_raw"),
        S.stddev(c).alias(f"{p}__std_raw"),
        F.min(c).cast("double").alias(f"{p}__min_raw"),
        F.max(c).cast("double").alias(f"{p}__max_raw"),
        S.stable_sum(c).alias(f"{p}__sum_raw"),
        F.skewness(c).alias(f"{p}__g1"),
        F.kurtosis(c).alias(f"{p}__g2"),
        S.n_zeros(c).alias(f"{p}__zeros_raw"),
    ]
    pct = [
        S.quantile_array(c, (0.05, 0.25, 0.5, 0.75, 0.95), exact=True).alias(
            f"{p}__qarr"
        )
    ]
    return decl, pct


def _num_post_exprs(p: str) -> dict[str, "F.Column"]:
    """Projection over the raw 1-row aggregate: corrections + rounding."""
    n = F.col(f"{p}__cnt").cast("double")
    g1, g2 = F.col(f"{p}__g1"), F.col(f"{p}__g2")
    q = lambda j: F.col(f"{p}__qarr")[j]  # noqa: E731
    return {
        "count": F.col(f"{p}__cnt").cast("double"),
        "n_missing": F.col(f"{p}__n_missing_raw").cast("double"),
        "mean": _r(F.col(f"{p}__mean_raw")),
        "std": _r(F.col(f"{p}__std_raw")),
        "min": F.col(f"{p}__min_raw"),
        "max": F.col(f"{p}__max_raw"),
        "sum": F.col(f"{p}__sum_raw"),
        "skewness": _r(
            F.when(n > 2, g1 * F.sqrt(n * (n - 1)) / (n - 2))
        ),
        "kurtosis": _r(
            F.when(n > 3, (n - 1) / ((n - 2) * (n - 3)) * ((n + 1) * g2 + 6))
        ),
        "n_zeros": F.col(f"{p}__zeros_raw").cast("double"),
        "q05": _r(q(0)),
        "q25": _r(q(1)),
        "median": _r(q(2)),
        "q75": _r(q(3)),
        "q95": _r(q(4)),
        "iqr": _r(q(3) - q(1)),
        "range": F.col(f"{p}__max_raw") - F.col(f"{p}__min_raw"),
        "cv": _r(F.try_divide(F.col(f"{p}__std_raw"), F.col(f"{p}__mean_raw"))),
    }


def numeric_summary_query(table: str, cols: list[str]) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load(spark, sf_dir, table)
        decl, pct = [], []
        for i, col in enumerate(cols):
            d, p = _num_raw_exprs(col, f"c{i}")
            decl += d
            pct += p
        agg = df.agg(*decl).crossJoin(df.agg(*pct))
        structs = []
        for i, col in enumerate(cols):
            post = _num_post_exprs(f"c{i}")
            for stat in _NUM_STATS_SQL:
                structs.append(
                    F.struct(
                        F.lit(col).alias("col_name"),
                        F.lit(stat).alias("stat"),
                        post[stat].cast("double").alias("value"),
                    )
                )
        return agg.select(F.explode(F.array(*structs)).alias("kv")).select("kv.*")

    return fn


def numeric_summary_sql(table: str, cols: list[str]) -> str:
    aggs, selects = [], []
    for i, col in enumerate(cols):
        for stat, tmpl in _NUM_STATS_SQL.items():
            aggs.append(f"{tmpl.format(c=col)} AS c{i}__{stat}")
            selects.append(
                f"SELECT '{col}' AS col_name, '{stat}' AS stat,"
                f" c{i}__{stat} AS value FROM agg"
            )
    return (
        f"WITH agg AS (SELECT {', '.join(aggs)} FROM {table})\n"
        + "\nUNION ALL ".join(selects)
    )


# --------------------------------------------------------------------------------
# MAD (A8) — self-contained plan: median via broadcast cross join
# --------------------------------------------------------------------------------


def mad_query(table: str, cols: list[str]) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load(spark, sf_dir, table)
        med = df.agg(
            *[
                S.quantile(S.col(c), 0.5, exact=True).alias(f"med_{i}")
                for i, c in enumerate(cols)
            ]
        )
        joined = df.crossJoin(F.broadcast(med))
        exprs = [
            _r(
                S.quantile(
                    F.abs(S.col(c) - F.col(f"med_{i}")), 0.5, exact=True
                )
            ).alias(f"mad_{i}")
            for i, c in enumerate(cols)
        ]
        return _long(
            joined.agg(*exprs), [(c, "mad", f"mad_{i}") for i, c in enumerate(cols)]
        )

    return fn


def mad_sql(table: str, cols: list[str]) -> str:
    selects = [
        f"SELECT '{c}' AS col_name, 'mad' AS stat, round(quantile_cont(abs({c} - "
        f"(SELECT quantile_cont({c}, 0.5) FROM {table})), 0.5), 4) AS value"
        f" FROM {table}"
        for c in cols
    ]
    return "\nUNION ALL ".join(selects)


# --------------------------------------------------------------------------------
# frequencies (A1-A3, A15, K1)
# --------------------------------------------------------------------------------


def value_counts_query(table: str, col: str) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return FQ.value_counts(load(spark, sf_dir, table), col).select(
            F.col("value").alias(col), F.col("count").alias("cnt")
        )

    return fn


def value_counts_sql(table: str, col: str) -> str:
    return (
        f"SELECT {col}, count(*) AS cnt FROM {table}"
        f" WHERE {col} IS NOT NULL GROUP BY {col}"
    )


def top_k_query(table: str, col: str, k: int) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        vc = FQ.value_counts(load(spark, sf_dir, table), col)
        return (
            vc.orderBy(F.desc("count"), F.asc("value"))
            .limit(k)
            .select(F.col("value").alias(col), F.col("count").alias("cnt"))
        )

    return fn


def top_k_sql(table: str, col: str, k: int) -> str:
    return (
        f"SELECT {col}, count(*) AS cnt FROM {table} WHERE {col} IS NOT NULL"
        f" GROUP BY {col} ORDER BY cnt DESC, {col} ASC LIMIT {k}"
    )


def distinct_unique_query(table: str, cols: list[str]) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load(spark, sf_dir, table)
        return FQ.distinct_unique_counts(df, cols).select(
            F.col("column").alias("col_name"), "n_distinct", "n_unique"
        )

    return fn


def distinct_unique_sql(table: str, cols: list[str]) -> str:
    selects = [
        f"SELECT '{c}' AS col_name,"
        f" (SELECT count(DISTINCT {c}) FROM {table}) AS n_distinct,"
        f" (SELECT count(*) FROM (SELECT {c} FROM {table} WHERE {c} IS NOT NULL"
        f" GROUP BY {c} HAVING count(*) = 1)) AS n_unique"
        for c in cols
    ]
    return "\nUNION ALL ".join(selects)


# --------------------------------------------------------------------------------
# missing counts (P6 / M1)
# --------------------------------------------------------------------------------


def missing_counts_query(table: str, cols: list[str]) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load(spark, sf_dir, table)
        agg = df.agg(
            *[S.n_missing(S.col(c)).alias(f"m{i}") for i, c in enumerate(cols)]
        )
        return _long(agg, [(c, "n_missing", f"m{i}") for i, c in enumerate(cols)])

    return fn


def missing_counts_sql(table: str, cols: list[str]) -> str:
    aggs = [
        f"CAST(count(*) - count({c}) AS DOUBLE) AS m{i}" for i, c in enumerate(cols)
    ]
    selects = [
        f"SELECT '{c}' AS col_name, 'n_missing' AS stat, m{i} AS value FROM agg"
        for i, c in enumerate(cols)
    ]
    return (
        f"WITH agg AS (SELECT {', '.join(aggs)} FROM {table})\n"
        + "\nUNION ALL ".join(selects)
    )


# --------------------------------------------------------------------------------
# histogram (A11) — fixed bin count, range from the data, explicit arithmetic
# --------------------------------------------------------------------------------


def histogram_query(table: str, col: str, bins: int) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load(spark, sf_dir, table)
        mm = df.agg(
            F.min(S.col(col)).cast("double").alias("lo"),
            F.max(S.col(col)).cast("double").alias("hi"),
        )
        joined = df.crossJoin(F.broadcast(mm))
        b = S.bucket_index(
            S.col(col).cast("double"), F.col("lo"), F.col("hi"), bins
        )
        return (
            joined.where(S.col(col).isNotNull())
            .groupBy(b.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    return fn


def histogram_sql(table: str, col: str, bins: int) -> str:
    # same IEEE arithmetic as functions/stats.bucket_index, including its
    # hi==lo guard: a constant column must land in bucket 0, not floor(x/0)
    return f"""
WITH mm AS (SELECT CAST(min({col}) AS DOUBLE) AS lo, CAST(max({col}) AS DOUBLE) AS hi FROM {table})
SELECT CASE WHEN hi = lo THEN 0 ELSE CAST(least(greatest(floor((CAST({col} AS DOUBLE) - lo) / ((hi - lo) / {bins}.0)), 0), {bins - 1}) AS BIGINT) END AS bucket,
       count(*) AS cnt
FROM {table}, mm
WHERE {col} IS NOT NULL
GROUP BY 1
"""


# --------------------------------------------------------------------------------
# duplicates (D1/D2)
# --------------------------------------------------------------------------------


def top_duplicates_query(table: str, subset: list[str], n: int) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators import duplicates as D

        return D.top_duplicates(load(spark, sf_dir, table), subset, n)

    return fn


def top_duplicates_sql(table: str, subset: list[str], n: int) -> str:
    cols = ", ".join(subset)
    order = ", ".join(f"{c} ASC" for c in subset)
    return (
        f"SELECT {cols}, count(*) AS n_dup FROM {table} GROUP BY {cols}"
        f" HAVING count(*) > 1 ORDER BY n_dup DESC, {order} LIMIT {n}"
    )


def duplicate_stats_query(table: str) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load(spark, sf_dir, table)
        grouped = df.groupBy(*df.columns).agg(F.count(F.lit(1)).alias("n_dup"))
        return grouped.agg(
            F.coalesce(F.sum("n_dup"), F.lit(0)).alias("n_rows"),
            F.count(F.lit(1)).alias("n_distinct_rows"),
            (F.coalesce(F.sum("n_dup"), F.lit(0)) - F.count(F.lit(1))).alias(
                "n_duplicate_rows"
            ),
        )

    return fn


def duplicate_stats_sql(table: str) -> str:
    return (
        f"SELECT count(*) AS n_rows,"
        f" (SELECT count(*) FROM (SELECT DISTINCT * FROM {table})) AS n_distinct_rows,"
        f" count(*) - (SELECT count(*) FROM (SELECT DISTINCT * FROM {table}))"
        f" AS n_duplicate_rows FROM {table}"
    )


# --------------------------------------------------------------------------------
# string length stats (A13)
# --------------------------------------------------------------------------------


def string_lengths_query(table: str, cols: list[str]) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load(spark, sf_dir, table)
        exprs = []
        triples = []
        for i, c in enumerate(cols):
            ln = F.length(S.col(c))
            exprs += [
                F.min(ln).alias(f"c{i}__min_length"),
                _r(F.avg(ln)).alias(f"c{i}__mean_length"),
                F.max(ln).alias(f"c{i}__max_length"),
                _r(S.quantile(ln, 0.5, exact=True)).alias(f"c{i}__median_length"),
            ]
            triples += [
                (c, s, f"c{i}__{s}")
                for s in ("min_length", "mean_length", "max_length", "median_length")
            ]
        return _long(df.agg(*exprs), triples)

    return fn


def string_lengths_sql(table: str, cols: list[str]) -> str:
    aggs, selects = [], []
    for i, c in enumerate(cols):
        aggs += [
            f"CAST(min(length({c})) AS DOUBLE) AS c{i}__min_length",
            f"round(avg(length({c})), 4) AS c{i}__mean_length",
            f"CAST(max(length({c})) AS DOUBLE) AS c{i}__max_length",
            f"round(quantile_cont(length({c}), 0.5), 4) AS c{i}__median_length",
        ]
        selects += [
            f"SELECT '{c}' AS col_name, '{s}' AS stat, c{i}__{s} AS value FROM agg"
            for s in ("min_length", "mean_length", "max_length", "median_length")
        ]
    return (
        f"WITH agg AS (SELECT {', '.join(aggs)} FROM {table})\n"
        + "\nUNION ALL ".join(selects)
    )


# --------------------------------------------------------------------------------
# datetime stats (A16)
# --------------------------------------------------------------------------------


def date_stats_query(table: str, cols: list[str]) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load(spark, sf_dir, table)
        parts = []
        for c in cols:
            cc = S.col(c)
            parts.append(
                df.agg(
                    F.lit(c).alias("col_name"),
                    F.min(cc).cast("string").alias("min_ts"),
                    F.max(cc).cast("string").alias("max_ts"),
                    F.datediff(F.max(cc), F.min(cc)).cast("long").alias("range_days"),
                    F.count(cc).alias("cnt"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out

    return fn


def date_stats_sql(table: str, cols: list[str]) -> str:
    selects = [
        f"SELECT '{c}' AS col_name, CAST(min({c}) AS VARCHAR) AS min_ts,"
        f" CAST(max({c}) AS VARCHAR) AS max_ts,"
        f" CAST(date_diff('day', CAST(min({c}) AS DATE), CAST(max({c}) AS DATE))"
        f" AS BIGINT) AS range_days, count({c}) AS cnt FROM {table}"
        for c in cols
    ]
    return "\nUNION ALL ".join(selects)


# --------------------------------------------------------------------------------
# Pearson correlation matrix (C1)
# --------------------------------------------------------------------------------


def pearson_query(table: str, cols: list[str]) -> QueryFn:
    pairs = list(combinations(cols, 2))

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load(spark, sf_dir, table)
        exprs = [
            _r(F.corr(S.col(a), S.col(b))).alias(f"p{i}")
            for i, (a, b) in enumerate(pairs)
        ]
        agg = df.agg(*exprs)
        structs = [
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"p{i}").cast("double").alias("corr"),
            )
            for i, (a, b) in enumerate(pairs)
        ]
        return agg.select(F.explode(F.array(*structs)).alias("kv")).select("kv.*")

    return fn


def pearson_sql(table: str, cols: list[str]) -> str:
    pairs = list(combinations(cols, 2))
    aggs = [
        f"round(corr({a}, {b}), 4) AS p{i}" for i, (a, b) in enumerate(pairs)
    ]
    selects = [
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, p{i} AS corr FROM agg"
        for i, (a, b) in enumerate(pairs)
    ]
    return (
        f"WITH agg AS (SELECT {', '.join(aggs)} FROM {table})\n"
        + "\nUNION ALL ".join(selects)
    )


# --------------------------------------------------------------------------------
# Kendall tau-b (C3) — Knight-algorithm kernel vs a literal O(n²) pair-count SQL
# --------------------------------------------------------------------------------


def kendall_query(table: str, cols: list[str]) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.correlations import (
            kendall_matrix_df,
        )

        out = kendall_matrix_df(load(spark, sf_dir, table), cols)
        return out.select("col_a", "col_b", _r(F.col("tau")).alias("tau"))

    return fn


def kendall_sql(table: str, cols: list[str]) -> str:
    """tau_b = (C - D) / sqrt((n0 - tx)(n0 - ty)) from a literal i<j self-join —
    only viable at oracle scale (n² pairs), which is exactly what makes it an
    independent check of the O(n log n) merge-sort kernel."""
    pairs = list(combinations(cols, 2))
    ctes, selects = [], []
    for i, (a, b) in enumerate(pairs):
        ctes.append(
            f"pts_{i} AS (SELECT {a} AS x, {b} AS y, row_number() OVER () AS i"
            f" FROM {table} WHERE {a} IS NOT NULL AND {b} IS NOT NULL)"
        )
        ctes.append(
            f"""agg_{i} AS (
  SELECT count(*) AS n0,
         sum(CASE WHEN (p.x1 < p.x2 AND p.y1 < p.y2) OR (p.x1 > p.x2 AND p.y1 > p.y2) THEN 1 ELSE 0 END) AS c,
         sum(CASE WHEN (p.x1 < p.x2 AND p.y1 > p.y2) OR (p.x1 > p.x2 AND p.y1 < p.y2) THEN 1 ELSE 0 END) AS d,
         sum(CASE WHEN p.x1 = p.x2 THEN 1 ELSE 0 END) AS tx,
         sum(CASE WHEN p.y1 = p.y2 THEN 1 ELSE 0 END) AS ty
  FROM (SELECT l.x AS x1, l.y AS y1, r.x AS x2, r.y AS y2
        FROM pts_{i} l JOIN pts_{i} r ON l.i < r.i) p)"""
        )
        selects.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b,\n"
            f"       round((c - d) / sqrt((n0 - tx) * 1.0 * (n0 - ty)), 4) AS tau"
            f" FROM agg_{i}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


# --------------------------------------------------------------------------------
# Cramér's V (C4) — fully distributed plan mirrored in SQL
# --------------------------------------------------------------------------------


def cramers_v_query(table: str, col_a: str, col_b: str) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.correlations import (
            cramers_v_df,
        )

        return cramers_v_df(load(spark, sf_dir, table), col_a, col_b)

    return fn


def cramers_v_sql(table: str, col_a: str, col_b: str) -> str:
    return f"""
WITH ct AS (SELECT {col_a} AS a, {col_b} AS b, count(*) AS n FROM {table}
            WHERE {col_a} IS NOT NULL AND {col_b} IS NOT NULL GROUP BY 1, 2),
cells AS (SELECT n, sum(n) OVER (PARTITION BY a) AS ra,
                 sum(n) OVER (PARTITION BY b) AS cb FROM ct),
agg AS (SELECT sum(n) AS N, sum(n * n / (ra * cb)) AS s FROM cells),
rk AS (SELECT count(DISTINCT a) AS r, count(DISTINCT b) AS k FROM ct)
SELECT round(sqrt(
         greatest((N * s - N) / N - (k - 1) * (r - 1) / (N - 1), 0.0)
         / least(k - (k - 1) * (k - 1) / (N - 1) - 1,
                 r - (r - 1) * (r - 1) / (N - 1) - 1)), 4) AS cramers_v
FROM agg, rk
"""


def phik_contingency_query(
    table: str, num_col: str, cat_col: str, bins: int = 10
) -> QueryFn:
    """The distributed core of mixed-type φk (C5): quantile-bin the interval
    column (exact deciles) and produce the (bucket, category, n) contingency
    the driver-side χ²/inversion consumes. The φk VALUE itself is a bisection
    over a bivariate-normal integral — not SQL-expressible — so the oracle
    checks the contingency, which is where all the distributed work happens
    (reference mixed-type semantics: correlations.py:423-521)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.correlations import (
            quantile_bin_exprs,
        )

        df = load(spark, sf_dir, table)
        nc, cc = S.col(num_col), S.col(cat_col)
        bucket = quantile_bin_exprs(df, [num_col], bins, exact=True)[num_col]
        return (
            df.where(nc.isNotNull() & cc.isNotNull())
            .groupBy(
                bucket.cast("bigint").alias("bucket"),
                cc.alias("category"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )

    return fn


def phik_contingency_sql(
    table: str, num_col: str, cat_col: str, bins: int = 10
) -> str:
    # bucket j = number of DISTINCT edges strictly below the value — identical
    # to the Spark when-chain (first edge with value <= edge). quantile_cont
    # and Spark's exact `percentile` share the same interpolation definition.
    qs = ", ".join(str(i / bins) for i in range(1, bins))
    return f"""
WITH edges AS (
  SELECT DISTINCT unnest(quantile_cont({num_col}, [{qs}])) AS e FROM {table}
  WHERE {num_col} IS NOT NULL
),
b AS (
  SELECT {cat_col} AS category,
         (SELECT count(*) FROM edges WHERE e < t.{num_col}) AS bucket
  FROM {table} t
  WHERE {num_col} IS NOT NULL AND {cat_col} IS NOT NULL
)
SELECT bucket, category, count(*) AS n FROM b GROUP BY 1, 2
"""


def phik_mixed_query(
    table: str, num_cols: list[str], cat_cols: list[str], bins: int = 10
) -> QueryFn:
    """Full mixed-type φk matrix as (col_a, col_b, phik) rows — batched
    contingency + driver inversion; rows-only check (value is iterative)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.correlations import (
            phik_matrix,
        )

        m = phik_matrix(load(spark, sf_dir, table), num_cols, cat_cols, bins)
        rows = [
            (a, b, float(v) if v is not None else None)
            for (a, b), v in sorted(m.items())
        ]
        raw = spark.createDataFrame(
            rows, "col_a string, col_b string, phik double"
        )
        return raw.select("col_a", "col_b", _r(F.col("phik")).alias("phik"))

    return fn


def target_relevance_query(
    table: str = "lineitem",
    target: str = "l_extendedprice",
    num_feats: tuple[str, ...] = ("l_quantity", "l_discount", "l_tax"),
    cat_feats: tuple[str, ...] = ("l_returnflag", "l_linestatus"),
) -> QueryFn:
    """Feature-vs-target relevance ranking (operators/correlations.py:
    target_relevance): |Pearson| for numeric features in ONE agg, η²
    (correlation ratio) for categorical features in ONE melt — never a
    per-feature job loop. The reference's successors attach this to
    interactions.targets; the reference itself has no target analysis."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.correlations import (
            target_relevance,
        )

        rows = target_relevance(
            load(spark, sf_dir, table), target,
            numeric_cols=list(num_feats),
            categorical_cols=list(cat_feats),
        )
        return spark.createDataFrame(
            [(r["feature"], r["method"], r["score"]) for r in rows],
            "feature string, method string, score double",
        )

    return fn


def target_relevance_sql(
    table: str = "lineitem",
    target: str = "l_extendedprice",
    num_feats: tuple[str, ...] = ("l_quantity", "l_discount", "l_tax"),
    cat_feats: tuple[str, ...] = ("l_returnflag", "l_linestatus"),
) -> str:
    parts = [
        f"SELECT '{c}' AS feature, 'pearson_abs' AS method,"
        f" round(abs(corr({target}, {c})), 4) AS score FROM {table}"
        for c in num_feats
    ]
    for c in cat_feats:
        parts.append(f"""
SELECT '{c}' AS feature, 'eta_squared' AS method,
       round(greatest(0.0, least(1.0, 1.0 - sw / st)), 4) AS score
FROM (
  SELECT sum(ssg - sg * sg / ng) AS sw,
         sum(ssg) - sum(sg) * sum(sg) / sum(ng) AS st
  FROM (
    SELECT count(*) AS ng, sum(y) AS sg, sum(y * y) AS ssg
    FROM (SELECT {c} AS g, CAST({target} AS DOUBLE) AS y FROM {table}
          WHERE {c} IS NOT NULL AND {target} IS NOT NULL)
    GROUP BY g))""")
    return "\nUNION ALL\n".join(parts)


def phik_mixed_contingency_query(
    table: str, num_cols: list[str], cat_cols: list[str], bins: int = 10
) -> QueryFn:
    """Hash gate for the mixed-type φk matrix (C5): per pair, the Pearson χ²
    over the dense binned contingency plus its geometry — the EXACT inputs the
    driver-side bisection consumes (``chi2_corrected`` = the noise-corrected
    χ² that is inverted, Baak et al. §3.3). Exercises the real operator path:
    one exact-edges pass (:func:`quantile_bin_exprs`), ONE all-pairs
    contingency shuffle (:func:`contingency_all_pairs`), then
    :func:`chi2_of_contingency` — the same code φk itself runs up to the
    inversion (reference mixed-type semantics: correlations.py:423-521). The
    inversion stays rows-only in ``phik_mixed_lineitem`` by documented design;
    this row pins everything distributed about it."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.correlations import (
            chi2_of_contingency,
            contingency_all_pairs,
            quantile_bin_exprs,
        )

        df = load(spark, sf_dir, table)
        exprs = quantile_bin_exprs(df, num_cols, bins, exact=True)
        for c in cat_cols:
            exprs[c] = S.col(c).cast("string")
        pairs = list(combinations([*num_cols, *cat_cols], 2))
        tables = contingency_all_pairs(df, exprs, pairs)
        rows = []
        for a, b in pairs:
            stats = chi2_of_contingency(tables[(a, b)])
            if stats is None:
                continue
            chi2, ra, kb, n, _, _ = stats
            corrected = max(0.0, chi2 - (ra - 1) * (kb - 1))
            rows.append((a, b, int(n), ra, kb, chi2, corrected))
        raw = spark.createDataFrame(
            rows,
            "col_a string, col_b string, n_pairs bigint, n_bins_a bigint,"
            " n_bins_b bigint, chi2 double, chi2_corrected double",
        )
        return raw.select(
            "col_a",
            "col_b",
            "n_pairs",
            "n_bins_a",
            "n_bins_b",
            _r(F.col("chi2")).alias("chi2"),
            _r(F.col("chi2_corrected")).alias("chi2_corrected"),
        )

    return fn


def phik_mixed_contingency_sql(
    table: str, num_cols: list[str], cat_cols: list[str], bins: int = 10
) -> str:
    """Dense-matrix χ² via the identity Σ_present n²·N/(rn·cn) − N (absent
    cells contribute their expectation, which the identity absorbs), with the
    same strictly-below-edge bucket definition as ``quantile_bin_exprs``.
    All window sums feed arithmetic only — outputs are CAST to BIGINT/DOUBLE
    (DuckDB types integer sums as HUGEINT, which breaks the driver hash)."""
    qs = ", ".join(str(i / bins) for i in range(1, bins))
    edge_ctes = ",\n".join(
        f"e{i} AS (SELECT DISTINCT unnest(quantile_cont({c}, [{qs}])) AS e"
        f" FROM {table} WHERE {c} IS NOT NULL)"
        for i, c in enumerate(num_cols)
    )
    bucket_exprs = [
        f"CASE WHEN {c} IS NULL THEN NULL ELSE CAST("
        f"(SELECT count(*) FROM e{i} WHERE e < t.{c}) AS VARCHAR) END AS c{i}"
        for i, c in enumerate(num_cols)
    ]
    bucket_exprs += [
        f"CAST({c} AS VARCHAR) AS c{len(num_cols) + j}"
        for j, c in enumerate(cat_cols)
    ]
    cols = [*num_cols, *cat_cols]
    pair_selects = []
    for i, j in combinations(range(len(cols)), 2):
        pair_selects.append(
            f"SELECT '{cols[i]}' AS col_a, '{cols[j]}' AS col_b,"
            f" c{i} AS va, c{j} AS vb, count(*) AS n FROM b"
            f" WHERE c{i} IS NOT NULL AND c{j} IS NOT NULL GROUP BY 3, 4"
        )
    union = "\nUNION ALL\n".join(pair_selects)
    return f"""
WITH {edge_ctes},
b AS (SELECT {', '.join(bucket_exprs)} FROM {table} t),
ct AS ({union}),
m AS (
  SELECT col_a, col_b, va, vb, CAST(n AS DOUBLE) AS n,
         CAST(sum(n) OVER (PARTITION BY col_a, col_b) AS DOUBLE) AS tot,
         CAST(sum(n) OVER (PARTITION BY col_a, col_b, va) AS DOUBLE) AS rn,
         CAST(sum(n) OVER (PARTITION BY col_a, col_b, vb) AS DOUBLE) AS cn
  FROM ct)
SELECT col_a, col_b,
       CAST(max(tot) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT va) AS BIGINT) AS n_bins_a,
       CAST(count(DISTINCT vb) AS BIGINT) AS n_bins_b,
       round(sum(n * n * tot / (rn * cn)) - max(tot), 4) AS chi2,
       round(greatest(0.0, sum(n * n * tot / (rn * cn)) - max(tot)
             - (count(DISTINCT va) - 1) * (count(DISTINCT vb) - 1)), 4)
         AS chi2_corrected
FROM m GROUP BY 1, 2
"""


# --------------------------------------------------------------------------------
# Spearman rank correlation (C2) — average ranks via windows, then Pearson
# --------------------------------------------------------------------------------


def spearman_query(table: str, cols: list[str]) -> QueryFn:
    pairs = list(combinations(cols, 2))

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.correlations import (
            spearman_matrix,
        )

        m = spearman_matrix(load(spark, sf_dir, table), cols, method="window")
        rows = [(a, b, m[(a, b)]) for a, b in pairs]
        raw = spark.createDataFrame(rows, "col_a string, col_b string, corr double")
        # round in Spark (HALF_UP) to match the oracle's round(), not Python's
        # banker's rounding
        return raw.select("col_a", "col_b", _r(F.col("corr")).alias("corr"))

    return fn


def spearman_sql(table: str, cols: list[str]) -> str:
    pairs = list(combinations(cols, 2))
    # null values must yield a NULL rank (as the Spark window path does) so
    # corr() drops the same rows on both sides — otherwise DuckDB ranks the
    # NULLs last and corr() keeps them, silently diverging on null-bearing
    # columns
    ranks = ", ".join(
        f"CASE WHEN {c} IS NULL THEN NULL ELSE"
        f" rank() OVER (ORDER BY {c}) + (count(*) OVER (PARTITION BY {c}) - 1) / 2.0"
        f" END AS rk_{i}"
        for i, c in enumerate(cols)
    )
    corrs = ", ".join(
        f"round(corr(rk_{cols.index(a)}, rk_{cols.index(b)}), 4) AS p{i}"
        for i, (a, b) in enumerate(pairs)
    )
    selects = [
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, p{i} AS corr FROM agg"
        for i, (a, b) in enumerate(pairs)
    ]
    return (
        f"WITH rk AS (SELECT {ranks} FROM {table}),\n"
        f"agg AS (SELECT {corrs} FROM rk)\n" + "\nUNION ALL ".join(selects)
    )


# --------------------------------------------------------------------------------
# URL / path decomposition (A17 / A18) — synthesized deterministic columns
# (testdata has no URL column; both sides build the same string from events)
# --------------------------------------------------------------------------------

_URL_SPARK = (
    "concat('https://', coalesce(event_type, 'none'), '.example.com/u/', "
    "cast(coalesce(user_id, -1) as string), '/e?id=', "
    "cast(coalesce(event_id, -9) as string), '#s', "
    "cast(coalesce(event_id, -9) % 7 as string))"
)
_URL_DUCK = (
    "'https://' || coalesce(event_type, 'none') || '.example.com/u/' || "
    "CAST(coalesce(user_id, -1) AS VARCHAR) || '/e?id=' || "
    "CAST(coalesce(event_id, -9) AS VARCHAR) || '#s' || "
    "CAST(coalesce(event_id, -9) % 7 AS VARCHAR)"
)


def url_parts_query(table: str = "events") -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.strings import url_parts

        df = load(spark, sf_dir, table).withColumn("url", F.expr(_URL_SPARK))
        return url_parts(df, "url").select(
            "part", "value", F.col("count").alias("cnt")
        )

    return fn


def url_parts_sql(table: str = "events") -> str:
    return f"""
WITH u AS (SELECT {_URL_DUCK} AS url FROM {table}),
parts AS (
  SELECT 'protocol' AS part, regexp_extract(url, '^([a-z]+)://', 1) AS value FROM u
  UNION ALL
  SELECT 'host', regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) FROM u
  UNION ALL
  SELECT 'path', regexp_extract(url, '^[a-z]+://[^/?#]*(/[^?#]*)', 1) FROM u
  UNION ALL
  SELECT 'query', regexp_extract(url, '\\?([^#]*)', 1) FROM u
  UNION ALL
  SELECT 'ref', regexp_extract(url, '#(.*)$', 1) FROM u
)
SELECT part, value, count(*) AS cnt FROM parts GROUP BY 1, 2
"""


_PATH_SPARK = (
    "concat('/data/', coalesce(event_type, 'none'), '/', "
    "cast(coalesce(user_id, -1) as string), '/', "
    "cast(coalesce(event_id, -9) as string), '.json')"
)
_PATH_DUCK = (
    "'/data/' || coalesce(event_type, 'none') || '/' || "
    "CAST(coalesce(user_id, -1) AS VARCHAR) || '/' || "
    "CAST(coalesce(event_id, -9) AS VARCHAR) || '.json'"
)


def path_parts_query(table: str = "events") -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.strings import path_parts

        df = load(spark, sf_dir, table).withColumn("path", F.expr(_PATH_SPARK))
        return path_parts(df, "path").select(
            "part", "value", F.col("count").alias("cnt")
        )

    return fn


def path_parts_sql(table: str = "events") -> str:
    return f"""
WITH p AS (SELECT {_PATH_DUCK} AS path FROM {table}),
named AS (SELECT path, regexp_extract(path, '([^/]*)$', 1) AS name FROM p),
parts AS (
  SELECT 'parent' AS part, regexp_extract(path, '^(.*)/[^/]*$', 1) AS value FROM named
  UNION ALL
  SELECT 'name', name FROM named
  UNION ALL
  SELECT 'stem', regexp_extract(name, '^(.*?)(?:\\.[^.]*)?$', 1) FROM named
  UNION ALL
  SELECT 'suffix', regexp_extract(name, '(\\.[^.]*)$', 1) FROM named
  UNION ALL
  SELECT 'anchor', CASE WHEN path LIKE '/%' THEN '/' ELSE '' END FROM named
)
SELECT part, value, count(*) AS cnt FROM parts GROUP BY 1, 2
"""


# --------------------------------------------------------------------------------
# character counts (A14) — explode/groupBy both sides
# --------------------------------------------------------------------------------


def char_counts_query(table: str, col: str) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.strings import char_counts

        return char_counts(load(spark, sf_dir, table), col).select(
            F.col("char"), F.col("count").alias("cnt")
        )

    return fn


def char_counts_sql(table: str, col: str) -> str:
    return f"""
SELECT ch AS char, count(*) AS cnt
FROM (SELECT unnest(string_split({col}, '')) AS ch FROM {table} WHERE {col} IS NOT NULL)
WHERE ch <> '' GROUP BY ch
"""


# --------------------------------------------------------------------------------
# scatter / interaction grid (C7) — bucketed 2-D density
# --------------------------------------------------------------------------------


def scatter_query(table: str, x: str, y: str, bins: int) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.interactions import (
            scatter_counts,
        )

        df = load(spark, sf_dir, table)
        mm = df.agg(
            F.min(S.col(x)).cast("double").alias("xlo"),
            F.max(S.col(x)).cast("double").alias("xhi"),
            F.min(S.col(y)).cast("double").alias("ylo"),
            F.max(S.col(y)).cast("double").alias("yhi"),
        ).collect()[0]
        return scatter_counts(
            df, x, y, (mm["xlo"], mm["xhi"]), (mm["ylo"], mm["yhi"]), bins
        )

    return fn


def scatter_sql(table: str, x: str, y: str, bins: int) -> str:
    b = f"{bins}.0"
    return f"""
WITH mm AS (SELECT CAST(min({x}) AS DOUBLE) AS xlo, CAST(max({x}) AS DOUBLE) AS xhi,
                   CAST(min({y}) AS DOUBLE) AS ylo, CAST(max({y}) AS DOUBLE) AS yhi
            FROM {table})
SELECT CAST(least(greatest(floor((CAST({x} AS DOUBLE) - xlo) / ((xhi - xlo) / {b})), 0), {bins - 1}) AS BIGINT) AS x_bucket,
       CAST(least(greatest(floor((CAST({y} AS DOUBLE) - ylo) / ((yhi - ylo) / {b})), 0), {bins - 1}) AS BIGINT) AS y_bucket,
       count(*) AS cnt
FROM {table}, mm
WHERE {x} IS NOT NULL AND {y} IS NOT NULL
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------------
# monotonicity (A10) relative to an explicit order column
# --------------------------------------------------------------------------------


def monotonicity_query(table: str, col: str, order_col: str) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.order_stats import (
            monotonicity_df,
        )

        return monotonicity_df(load(spark, sf_dir, table), col, order_col)

    return fn


def monotonicity_sql(table: str, col: str, order_col: str) -> str:
    return f"""
WITH s AS (SELECT {col} AS v, lag({col}) OVER (ORDER BY {order_col}) AS p
           FROM {table} WHERE {col} IS NOT NULL)
SELECT bool_and(coalesce(v >= p, true)) AS increasing,
       bool_and(coalesce(v > p, true)) AS strictly_increasing,
       bool_and(coalesce(v <= p, true)) AS decreasing,
       bool_and(coalesce(v < p, true)) AS strictly_decreasing
FROM s
"""


# --------------------------------------------------------------------------------
# event-stream batch ops: hourly rollup + sessionization (window functions)
# --------------------------------------------------------------------------------


def time_rollup_query(table: str, ts_col: str, group_col: str, value_col: str) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.sessions import time_rollup

        out = time_rollup(
            load(spark, sf_dir, table), ts_col, "hour", [group_col], value_col
        )
        return out.select(
            F.col("bucket").cast("string").alias("bucket"),
            F.col(group_col),
            "n",
            "value_sum",
        )

    return fn


def time_rollup_sql(table: str, ts_col: str, group_col: str, value_col: str) -> str:
    return f"""
SELECT CAST(date_trunc('hour', {ts_col}) AS VARCHAR) AS bucket, {group_col},
       count(*) AS n,
       CAST(sum(CAST({value_col} AS DECIMAL(30,4))) AS DOUBLE) AS value_sum
FROM {table} GROUP BY 1, 2
"""


def session_stats_query(
    table: str, user_col: str, ts_col: str, gap_minutes: int
) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.sessions import session_stats

        return session_stats(load(spark, sf_dir, table), user_col, ts_col, gap_minutes)

    return fn


def session_stats_sql(
    table: str, user_col: str, ts_col: str, gap_minutes: int
) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH t AS (SELECT {user_col} AS u, epoch_us({ts_col}) AS e,
                  lag(epoch_us({ts_col})) OVER (PARTITION BY {user_col} ORDER BY {ts_col}) AS p
           FROM {table})
SELECT u AS user_key,
       CAST(sum(CASE WHEN p IS NULL OR e - p > {gap_us} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions,
       count(*) AS n_events
FROM t GROUP BY u
"""


# --------------------------------------------------------------------------------
# scalar-function probe: regexp extraction over the events JSON props (§2.11)
# --------------------------------------------------------------------------------


def json_props_query(table: str = "events") -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load(spark, sf_dir, table)
        k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("long")
        return (
            df.select(k.alias("k"))
            .where(F.col("k").isNotNull())
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    return fn


def json_props_sql(table: str = "events") -> str:
    return (
        f"SELECT CAST(regexp_extract(props, '\"k\":\\s*(\\d+)', 1) AS BIGINT) AS k,"
        f" count(*) AS cnt FROM {table}"
        f" WHERE regexp_extract(props, '\"k\":\\s*(\\d+)', 1) <> ''"
        f" GROUP BY 1"
    )


# --------------------------------------------------------------------------------
# tail sample (K3) — last n rows of an explicitly-ordered frame
# --------------------------------------------------------------------------------


def tail_sample_query(table: str, cols: list[str], order_col: str, n: int) -> QueryFn:
    """K3: ``df.tail(n)`` over an ordered frame (the reference has no Spark
    tail — dataframe_wrappers.py:331-342). Driver-bounded: exactly ``n`` rows
    return; the oracle is the same rows selected as ORDER BY DESC LIMIT n."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.sampling import tail

        df = load(spark, sf_dir, table).select(*[S.col(c) for c in cols])
        rows = tail(df, n, order_by=[order_col])
        return spark.createDataFrame(rows, df.schema)

    return fn


def tail_sample_sql(table: str, cols: list[str], order_col: str, n: int) -> str:
    collist = ", ".join(cols)
    return (
        f"SELECT {collist} FROM "
        f"(SELECT {collist} FROM {table} ORDER BY {order_col} DESC LIMIT {n})"
    )


# --------------------------------------------------------------------------------
# complex type — parse + numeric treatment (reference typeset.py:186-194,
# visualisation/plot.py:191-216). Spark has no complex primitive, so the query
# BUILDS Python-style complex literals from integer-derived lineitem columns
# (integer->string formatting is engine-identical; double formatting is not),
# then both engines parse them with the SAME RE2-compatible regexes and
# aggregate. Exercises every parse branch: (a+bj), a±bj, bj, a, invalid, NULL.
# --------------------------------------------------------------------------------


def complex_stats_query(table: str = "lineitem") -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.complex_type import (
            complex_summary,
        )

        df = load(spark, sf_dir, table)
        re_i = (S.col("l_partkey") % 201 - 100).cast("long")
        im_i = (S.col("l_suppkey") % 101 - 50).cast("long")
        m = (S.col("l_orderkey") * 7 + S.col("l_linenumber")) % 6
        sign = F.when(im_i >= 0, F.lit("+")).otherwise(F.lit("-"))
        absim = F.abs(im_i).cast("string")
        res = re_i.cast("string")
        ims = im_i.cast("string")
        cval = (
            F.when(m == 0, F.concat(F.lit("("), res, sign, absim, F.lit("j)")))
            .when(m == 1, F.concat(res, sign, absim, F.lit("j")))
            .when(m == 2, F.concat(ims, F.lit("j")))
            .when(m == 3, res)
            .when(m == 4, F.concat(F.lit("x"), res))
        )
        return complex_summary(df.select(cval.alias("cval")), ["cval"])

    return fn


def complex_stats_sql(table: str = "lineitem") -> str:
    from pandas_profiling_personal_spark.operators.complex_type import (
        BOTH_RE,
        IMAG_RE,
        REAL_RE,
    )

    def coef(g: str) -> str:
        return (
            f"CASE WHEN {g} IN ('', '+') THEN 1.0"
            f" WHEN {g} = '-' THEN -1.0"
            f" ELSE CAST({g} AS DOUBLE) END"
        )

    both_1 = f"regexp_extract(s, '{BOTH_RE}', 1)"
    both_2 = f"regexp_extract(s, '{BOTH_RE}', 2)"
    imag_1 = f"regexp_extract(s, '{IMAG_RE}', 1)"
    return f"""
WITH base AS (
  SELECT (l_partkey % 201 - 100) AS re_i, (l_suppkey % 101 - 50) AS im_i,
         (l_orderkey * 7 + l_linenumber) % 6 AS m
  FROM {table}
), src AS (
  SELECT CASE m
    WHEN 0 THEN '(' || re_i || (CASE WHEN im_i >= 0 THEN '+' ELSE '-' END)
                || abs(im_i) || 'j)'
    WHEN 1 THEN re_i || (CASE WHEN im_i >= 0 THEN '+' ELSE '-' END)
                || abs(im_i) || 'j'
    WHEN 2 THEN im_i || 'j'
    WHEN 3 THEN CAST(re_i AS VARCHAR)
    WHEN 4 THEN 'x' || re_i
    ELSE NULL END AS cval
  FROM base
), stripped AS (
  SELECT cval, regexp_replace(trim(cval), '^\\((.*)\\)$', '\\1') AS s FROM src
), parsed AS (
  SELECT cval,
    CASE WHEN regexp_matches(s, '{BOTH_RE}') THEN CAST({both_1} AS DOUBLE)
         WHEN regexp_matches(s, '{IMAG_RE}') THEN 0.0
         WHEN regexp_matches(s, '{REAL_RE}') THEN CAST(s AS DOUBLE)
    END AS re,
    CASE WHEN regexp_matches(s, '{BOTH_RE}') THEN {coef(both_2)}
         WHEN regexp_matches(s, '{IMAG_RE}') THEN {coef(imag_1)}
         WHEN regexp_matches(s, '{REAL_RE}') THEN 0.0
    END AS im
  FROM stripped
)
SELECT 'cval' AS "column",
  COUNT(*) AS n,
  CAST(SUM(CASE WHEN cval IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
  CAST(SUM(CASE WHEN cval IS NOT NULL AND re IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_invalid,
  CAST(SUM(CASE WHEN re = 0.0 AND im = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
  round(avg(re), 4) AS mean_re,
  round(avg(im), 4) AS mean_im,
  round(avg(sqrt(re * re + im * im)), 4) AS mean_abs,
  round(min(sqrt(re * re + im * im)), 4) AS min_abs,
  round(max(sqrt(re * re + im * im)), 4) AS max_abs,
  round(min(re), 4) AS min_re,
  round(max(re), 4) AS max_re,
  round(min(im), 4) AS min_im,
  round(max(im), 4) AS max_im
FROM parsed
"""


# --------------------------------------------------------------------------------
# deterministic train/val/test split — md5-bucket assignment (engine-portable
# by the same conv(substring(md5)) idiom the dedup oracles already prove);
# verified as the (split, stratum) count rollup
# --------------------------------------------------------------------------------


def split_counts_query(
    table: str = "orders", key: str = "o_orderkey", strata: str = "o_orderstatus"
) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.sampling import (
            split_counts,
        )

        return split_counts(load(spark, sf_dir, table), key, strata)

    return fn


def split_counts_sql(
    table: str = "orders", key: str = "o_orderkey", strata: str = "o_orderstatus"
) -> str:
    return f"""
WITH assigned AS (
  SELECT {strata},
    CASE
      WHEN CAST(('0x' || substring(md5(CAST({key} AS VARCHAR)), 1, 8)) AS UBIGINT)
           % 10000 < 9000 THEN 'train'
      WHEN CAST(('0x' || substring(md5(CAST({key} AS VARCHAR)), 1, 8)) AS UBIGINT)
           % 10000 < 9500 THEN 'val'
      ELSE 'test' END AS split
  FROM {table}
)
SELECT split, {strata}, count(*) AS n
FROM assigned GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------------
# segment-wise numeric summaries (operators/summary.grouped_summary) — the
# group-by analytics surface the reference lacks entirely
# --------------------------------------------------------------------------------


def grouped_summary_query(
    table: str = "lineitem",
    group: str = "l_returnflag",
    cols: tuple[str, ...] = ("l_quantity", "l_extendedprice", "l_discount"),
) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.summary import (
            grouped_summary,
        )

        return grouped_summary(load(spark, sf_dir, table), group, list(cols))

    return fn


def grouped_summary_sql(
    table: str = "lineitem",
    group: str = "l_returnflag",
    cols: tuple[str, ...] = ("l_quantity", "l_extendedprice", "l_discount"),
) -> str:
    parts = [
        f"""SELECT {group} AS "group", '{c}' AS "column",
  count(CAST({c} AS DOUBLE)) AS count,
  count(*) - count(CAST({c} AS DOUBLE)) AS n_null,
  round(avg(CAST({c} AS DOUBLE)), 4) AS mean,
  round(stddev_samp(CAST({c} AS DOUBLE)), 4) AS std,
  round(min(CAST({c} AS DOUBLE)), 4) AS min,
  round(max(CAST({c} AS DOUBLE)), 4) AS max,
  round(sum(CAST({c} AS DOUBLE)), 4) AS sum
FROM {table} GROUP BY 1"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts) + '\nORDER BY "group", "column"'


# --------------------------------------------------------------------------------
# distribution drift (operators/drift.drift_profile) — PSI between snapshots
# --------------------------------------------------------------------------------


def drift_query(
    cols: tuple[str, ...] = ("l_quantity", "l_extendedprice", "l_discount"),
    bins: int = 10,
) -> QueryFn:
    """Baseline = full lineitem; candidate = the l_quantity > 10 slice — a
    deliberately shifted snapshot so PSI is large on l_quantity and ~0 on
    the (independent) discount column."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.drift import (
            drift_profile,
        )

        li = load(spark, sf_dir, "lineitem")
        return drift_profile(
            li, li.where(F.col("l_quantity") > 10), list(cols), bins=bins
        )

    return fn


def drift_sql(
    cols: tuple[str, ...] = ("l_quantity", "l_extendedprice", "l_discount"),
    bins: int = 10,
    eps: float = 1e-6,
) -> str:
    epsb = eps * bins
    ctes, selects = [], []
    for i, c in enumerate(cols):
        v = f"CAST({c} AS DOUBLE)"
        mask = f"{c} IS NOT NULL AND NOT isnan({v})"
        bucket = (
            f"CASE WHEN e.hi = e.lo THEN 0 ELSE CAST(least(greatest("
            f"floor((v - e.lo) / ((e.hi - e.lo) / {float(bins)!r})), 0), {bins - 1}) "
            f"AS BIGINT) END"
        )
        ctes.append(f"a_{i} AS (SELECT {v} AS v FROM lineitem WHERE {mask})")
        ctes.append(
            f"b_{i} AS (SELECT {v} AS v FROM lineitem WHERE l_quantity > 10 AND {mask})"
        )
        ctes.append(
            f"e_{i} AS (SELECT least((SELECT min(v) FROM a_{i}), (SELECT min(v) FROM b_{i})) AS lo,"
            f" greatest((SELECT max(v) FROM a_{i}), (SELECT max(v) FROM b_{i})) AS hi)"
        )
        ctes.append(
            f"ca_{i} AS (SELECT bucket, count(*) AS c FROM (SELECT {bucket} AS bucket FROM a_{i}, e_{i} e) GROUP BY 1)"
        )
        ctes.append(
            f"cb_{i} AS (SELECT bucket, count(*) AS c FROM (SELECT {bucket} AS bucket FROM b_{i}, e_{i} e) GROUP BY 1)"
        )
        ctes.append(
            f"p_{i} AS (SELECT r.bucket, coalesce(ca.c, 0) AS c_a, coalesce(cb.c, 0) AS c_b"
            f" FROM range(0, {bins}) r(bucket)"
            f" LEFT JOIN ca_{i} ca ON r.bucket = ca.bucket"
            f" LEFT JOIN cb_{i} cb ON r.bucket = cb.bucket)"
        )
        ctes.append(
            f"t_{i} AS (SELECT bucket, c_a, c_b,"
            f" sum(c_a) OVER () AS n_a, sum(c_b) OVER () AS n_b FROM p_{i})"
        )
        ctes.append(
            f"s_{i} AS (SELECT bucket, n_a, n_b,"
            f" ((c_a + {eps!r}) / (n_a + {epsb!r}) - (c_b + {eps!r}) / (n_b + {epsb!r}))"
            f" * ln(((c_a + {eps!r}) / (n_a + {epsb!r})) / ((c_b + {eps!r}) / (n_b + {epsb!r}))) AS term,"
            f" abs((c_a + {eps!r}) / (n_a + {epsb!r}) - (c_b + {eps!r}) / (n_b + {epsb!r})) AS shift"
            f" FROM t_{i})"
        )
        selects.append(
            f"SELECT '{c}' AS \"column\", CAST(max(n_a) AS BIGINT) AS n_a,"
            f" CAST(max(n_b) AS BIGINT) AS n_b, round(sum(term), 6) AS psi,"
            f" (SELECT bucket FROM s_{i} ORDER BY shift DESC, bucket DESC LIMIT 1)"
            f" AS max_shift_bucket FROM s_{i}"
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL\n".join(selects)
        + '\nORDER BY "column"'
    )


def drift_categorical_query(
    cols: tuple[str, ...] = ("lang", "source"),
    top_n: int = 8,
) -> QueryFn:
    """Baseline = full documents; candidate = the lang <> 'de' slice — the
    language mix shifts hard (de vanishes), the source mix barely moves.
    top_n=8 exercises the __other__ fold on source (20 values) and the
    no-fold path on lang (5 values)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.drift import (
            drift_profile_categorical,
        )

        docs = load(spark, sf_dir, "documents")
        cand = docs.where(
            F.col("lang").isNull() | (F.col("lang") != "de")
        )
        return drift_profile_categorical(docs, cand, list(cols), top_n=top_n)

    return fn


def drift_categorical_sql(
    cols: tuple[str, ...] = ("lang", "source"),
    top_n: int = 8,
    eps: float = 1e-6,
) -> str:
    cand = "lang IS NULL OR lang <> 'de'"
    melts = []
    for c in cols:
        melts.append(
            f"SELECT '{c}' AS \"column\", CAST({c} AS VARCHAR) AS value,"
            f" 'a' AS side FROM documents"
        )
        melts.append(
            f"SELECT '{c}', CAST({c} AS VARCHAR), 'b' FROM documents WHERE {cand}"
        )
    union = "\nUNION ALL\n".join(melts)
    e = repr(eps)
    return f"""
WITH m AS (
{union}
),
counts AS (
  SELECT "column", value,
    count(*) FILTER (side = 'a') AS c_a,
    count(*) FILTER (side = 'b') AS c_b
  FROM m WHERE value IS NOT NULL GROUP BY 1, 2
),
folded0 AS (
  SELECT "column",
    CASE WHEN row_number() OVER (PARTITION BY "column"
           ORDER BY c_a + c_b DESC, value ASC) <= {top_n}
         THEN value ELSE '__other__' END AS value,
    c_a, c_b
  FROM counts
),
folded AS (
  SELECT "column", value, sum(c_a) AS c_a, sum(c_b) AS c_b
  FROM folded0 GROUP BY 1, 2
),
t AS (
  SELECT "column", value, c_a, c_b,
    sum(c_a) OVER (PARTITION BY "column") AS n_a,
    sum(c_b) OVER (PARTITION BY "column") AS n_b,
    count(*) OVER (PARTITION BY "column") AS nb
  FROM folded
),
s AS (
  SELECT "column", value, n_a, n_b,
    ((c_a + {e}) / (n_a + {e} * nb) - (c_b + {e}) / (n_b + {e} * nb))
      * ln(((c_a + {e}) / (n_a + {e} * nb)) / ((c_b + {e}) / (n_b + {e} * nb))) AS term,
    abs((c_a + {e}) / (n_a + {e} * nb) - (c_b + {e}) / (n_b + {e} * nb)) AS shift
  FROM t
),
msv AS (
  SELECT *, first_value(value) OVER (PARTITION BY "column"
    ORDER BY shift DESC, value DESC) AS max_shift_value
  FROM s
)
SELECT "column", CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
  round(sum(term), 6) AS psi, max(max_shift_value) AS max_shift_value
FROM msv GROUP BY 1 ORDER BY 1
"""


def grouped_top_k_query(
    table: str = "documents",
    group: str = "lang",
    cols: tuple[str, ...] = ("source",),
    k: int = 3,
) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.frequencies import (
            grouped_top_k,
        )

        return grouped_top_k(load(spark, sf_dir, table), group, list(cols), k)

    return fn


def grouped_top_k_sql(
    table: str = "documents",
    group: str = "lang",
    cols: tuple[str, ...] = ("source",),
    k: int = 3,
) -> str:
    parts = [
        f"""SELECT {group} AS "group", '{c}' AS "column",
  CAST({c} AS VARCHAR) AS value, count(*) AS count
FROM {table} WHERE {c} IS NOT NULL GROUP BY 1, 3"""
        for c in cols
    ]
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH vc AS ({union})
SELECT "group", "column", value, count,
  CAST(row_number() OVER (PARTITION BY "group", "column"
       ORDER BY count DESC, value ASC) AS BIGINT) AS rank
FROM vc
QUALIFY rank <= {k}
ORDER BY "group", "column", rank
"""


# --- shuffle-key skew diagnostics (operators/frequencies.key_skew_profile) -----


def key_skew_query(table: str, key_cols: list[str], top_n: int = 10) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.frequencies import (
            key_skew_profile,
        )

        return key_skew_profile(
            load(spark, sf_dir, table), key_cols, top_n=top_n
        )

    return fn


def key_skew_sql(table: str, key_cols: list[str], top_n: int = 10) -> str:
    k = " || '|' || ".join(
        f"coalesce(CAST({c} AS VARCHAR), 'null')" for c in key_cols
    )
    return f"""
WITH c AS (SELECT {k} AS k, count(*) AS c FROM {table} GROUP BY 1),
s AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(c) AS BIGINT) AS max_count,
             round(quantile_cont(c, 0.5), 4) AS p50_count,
             round(quantile_cont(c, 0.95), 4) AS p95_count
      FROM c),
t AS (SELECT string_agg(k || ':' || c, ',' ORDER BY c DESC, k ASC) AS top_keys
      FROM (SELECT * FROM c ORDER BY c DESC, k ASC LIMIT {top_n}))
SELECT s.n_rows, s.n_keys, s.max_count, s.p50_count, s.p95_count,
  round(s.n_rows * 1.0 / s.n_keys, 4) AS mean_count,
  round(s.max_count * 1.0 / s.n_rows * s.n_keys, 4) AS skew_ratio,
  round(s.max_count * 1.0 / s.n_rows, 4) AS top_share,
  t.top_keys
FROM s, t
"""


def layout_stats_query(table: str, cols: list[str]) -> QueryFn:
    """Layout-advisor inputs (operators/layout.py): per-column cardinality /
    null mass / group skew for ALL candidate columns in ONE melt exchange.
    The driver row certifies exactly the numbers suggest_layout's
    partition/bucket/salt rules consume. (The reference computes none of
    this; its Spark describe loop is per-column jobs —
    model/summary_spark.py.)"""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.layout import (
            layout_stats,
        )

        out = layout_stats(load(spark, sf_dir, table), cols)
        # "column" needs quoting as a DuckDB identifier — neutral alias
        return out.select(
            F.col("column").alias("col_name"),
            "n_rows",
            "n_null",
            "n_distinct",
            "max_group",
            "mean_group",
            "skew_ratio",
            "top_share",
        )

    return fn


def layout_stats_sql(table: str, cols: list[str]) -> str:
    per_col = []
    for c in cols:
        per_col.append(f"""
SELECT '{c}' AS col_name,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN v IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_null,
       count(CASE WHEN v IS NOT NULL THEN 1 END) AS n_distinct,
       max(CASE WHEN v IS NOT NULL THEN c END) AS max_group,
       round((sum(c) - sum(CASE WHEN v IS NULL THEN c ELSE 0 END)) * 1.0
             / nullif(count(CASE WHEN v IS NOT NULL THEN 1 END), 0), 4)
         AS mean_group,
       round(max(CASE WHEN v IS NOT NULL THEN c END) * 1.0
             / nullif(sum(c) - sum(CASE WHEN v IS NULL THEN c ELSE 0 END), 0)
             * count(CASE WHEN v IS NOT NULL THEN 1 END), 4) AS skew_ratio,
       round(max(CASE WHEN v IS NOT NULL THEN c END) * 1.0
             / nullif(sum(c) - sum(CASE WHEN v IS NULL THEN c ELSE 0 END), 0),
             4) AS top_share
FROM (SELECT CAST({c} AS VARCHAR) AS v, count(*) AS c
      FROM {table} GROUP BY 1)""")
    return "\nUNION ALL\n".join(per_col)


def join_fanout_query(
    left_table: str,
    right_table: str,
    left_key: list[str],
    right_key: list[str] | None = None,
) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.frequencies import (
            join_fanout_profile,
        )

        return join_fanout_profile(
            load(spark, sf_dir, left_table),
            load(spark, sf_dir, right_table),
            left_key,
            right_key,
        )

    return fn


def join_fanout_sql(
    left_table: str,
    right_table: str,
    left_key: list[str],
    right_key: list[str] | None = None,
) -> str:
    right_key = right_key or left_key

    def ks(keys: list[str]) -> str:
        return " || '|' || ".join(
            f"coalesce(CAST({c} AS VARCHAR), 'null')" for c in keys
        )

    return f"""
WITH lc AS (SELECT {ks(left_key)} AS k, count(*) AS cl
            FROM {left_table} GROUP BY 1),
rc AS (SELECT {ks(right_key)} AS k, count(*) AS cr
       FROM {right_table} GROUP BY 1),
j AS (SELECT lc.cl, rc.cr FROM lc FULL OUTER JOIN rc ON lc.k = rc.k)
SELECT CAST(sum(cl) AS BIGINT) AS left_rows,
  CAST(sum(cr) AS BIGINT) AS right_rows,
  CAST(count(cl) AS BIGINT) AS n_left_keys,
  CAST(count(cr) AS BIGINT) AS n_right_keys,
  CAST(sum(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL THEN 1 ELSE 0 END)
       AS BIGINT) AS n_matched_keys,
  round(sum(CASE WHEN cr IS NOT NULL THEN cl ELSE 0 END) * 1.0 / sum(cl), 4)
    AS left_match_share,
  round(sum(CASE WHEN cl IS NOT NULL THEN cr ELSE 0 END) * 1.0 / sum(cr), 4)
    AS right_match_share,
  round(coalesce(sum(cl * 1.0 * cr), 0), 4) AS inner_rows,
  round(coalesce(max(cl * 1.0 * cr), 0), 4) AS max_fanout,
  round(coalesce(sum(cl * 1.0 * cr), 0) / sum(cl), 4) AS fanout_ratio
FROM j
"""


def stratified_sample_query(
    table: str, group_col: str, n: int, key: str
) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.sampling import (
            stratified_sample,
        )

        out = stratified_sample(load(spark, sf_dir, table), group_col, n, key)
        return out.select(group_col, key, "sample_rank")

    return fn


def stratified_sample_sql(
    table: str, group_col: str, n: int, key: str
) -> str:
    # NULLS FIRST matches Spark's ASC default (DuckDB defaults NULLS
    # LAST). Cross-engine caveat for REGISTERING this generator: float
    # keys are out — Spark and DuckDB format doubles differently
    # ('1.0E12' vs '1e+12') so md5 ranks diverge; use string/integer
    # keys (documents.doc_id here is a non-null BIGINT).
    return f"""
SELECT {group_col}, {key},
  CAST(row_number() OVER (PARTITION BY {group_col}
       ORDER BY md5(CAST({key} AS VARCHAR)) ASC NULLS FIRST,
                {key} ASC NULLS FIRST) AS BIGINT)
    AS sample_rank
FROM {table}
QUALIFY sample_rank <= {n}
"""


# --------------------------------------------------------------------------------
# temporal alignment + time-series ops (operators/temporal.py, timeseries.py):
# as-of join / bucketized range join / grid ACF / rolling trend / seasonality.
# The reference has none of these (single-table profiler, no window functions
# — SURVEY.md §2.8); DuckDB's native ASOF JOIN and window frames are the
# independent oracles.
# --------------------------------------------------------------------------------


def asof_state_query(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> QueryFn:
    """Attach the latest per-user hourly state snapshot to every event via
    asof_join (union-tag window plan: ONE shuffle on the key, no join, no
    global sort). The snapshot table is derived in-query (hourly
    max(value) per user) so the spec is self-contained and deterministic."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.temporal import asof_join

        ev = load(spark, sf_dir, table).where(S.col(ts_col).isNotNull())
        snaps = ev.groupBy(
            S.col(user_col),
            F.date_trunc("hour", S.col(ts_col)).alias(ts_col),
        ).agg(F.max(S.col(value_col)).alias("state"))
        out = asof_join(
            ev.select("event_id", user_col, ts_col),
            snaps,
            on=ts_col,
            by=[user_col],
            value_cols=["state"],
        )
        return out.select(
            "event_id",
            "state",
            F.col(f"matched_{ts_col}").cast("string").alias("matched_ts"),
        )

    return fn


def asof_state_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    return f"""
WITH ev AS (SELECT * FROM {table} WHERE {ts_col} IS NOT NULL),
snaps AS (SELECT {user_col}, date_trunc('hour', {ts_col}) AS {ts_col},
                 max({value_col}) AS state
          FROM ev GROUP BY 1, 2)
SELECT e.event_id, s.state, CAST(s.{ts_col} AS VARCHAR) AS matched_ts
FROM ev e ASOF LEFT JOIN snaps s
  ON e.{user_col} = s.{user_col} AND e.{ts_col} >= s.{ts_col}
"""


def range_join_query(
    table: str = "events",
    ts_col: str = "ts",
    every_hours: int = 6,
    window_minutes: int = 90,
) -> QueryFn:
    """Land events inside synthetic maintenance windows ([every Nth hour,
    +M minutes)) via range_join — the bucketized equi-join plan, with the
    exact bound predicate as a residual; the oracle is the literal
    inequality join, so a hash match also proves the bucketing drops and
    duplicates nothing."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.temporal import range_join

        ev = load(spark, sf_dir, table).where(S.col(ts_col).isNotNull())
        wins = (
            ev.select(F.date_trunc("hour", S.col(ts_col)).alias("h"))
            .where(F.hour(F.col("h")) % every_hours == 0)
            .distinct()
            .select(
                F.col("h").alias("lo"),
                (
                    F.col("h")
                    + F.expr(f"interval {window_minutes} minutes")
                ).alias("hi"),
                F.unix_micros(F.col("h")).alias("win_id"),
            )
        )
        return range_join(
            ev.select("event_id", ts_col), wins, ts_col, "lo", "hi"
        ).select("event_id", "win_id")

    return fn


def range_join_sql(
    table: str = "events",
    ts_col: str = "ts",
    every_hours: int = 6,
    window_minutes: int = 90,
) -> str:
    return f"""
WITH ev AS (SELECT * FROM {table} WHERE {ts_col} IS NOT NULL),
wins AS (SELECT DISTINCT date_trunc('hour', {ts_col}) AS lo,
                date_trunc('hour', {ts_col})
                  + INTERVAL {window_minutes} MINUTE AS hi,
                epoch_us(date_trunc('hour', {ts_col})) AS win_id
         FROM ev
         WHERE hour(date_trunc('hour', {ts_col})) % {every_hours} = 0)
SELECT e.event_id, w.win_id
FROM ev e JOIN wins w ON e.{ts_col} >= w.lo AND e.{ts_col} < w.hi
"""


def acf_query(
    table: str = "events",
    ts_col: str = "ts",
    value_col: str = "value",
    lags: tuple = (1, 2, 3, 6, 12, 24),
) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.timeseries import acf

        out = acf(
            load(spark, sf_dir, table), ts_col, value_col, list(lags)
        )
        return out.select(
            "lag", "n_pairs", _r(F.col("acf_value")).alias("acf_value")
        )

    return fn


def acf_sql(
    table: str = "events",
    ts_col: str = "ts",
    value_col: str = "value",
    lags: tuple = (1, 2, 3, 6, 12, 24),
) -> str:
    lag_list = ", ".join(str(int(k)) for k in lags)
    return f"""
WITH grid AS (SELECT date_trunc('hour', {ts_col}) AS t, avg({value_col}) AS v
              FROM {table} WHERE {ts_col} IS NOT NULL GROUP BY 1),
g AS (SELECT * FROM grid WHERE v IS NOT NULL),
lags AS (SELECT unnest([{lag_list}]) AS lag)
SELECT l.lag, count(*) AS n_pairs, round(corr(a.v, b.v), 4) AS acf_value
FROM g a JOIN lags l ON true
JOIN g b ON epoch_us(a.t) = epoch_us(b.t) + l.lag * 3600000000
GROUP BY 1
"""


def rolling_trend_query(
    table: str = "events",
    ts_col: str = "ts",
    value_col: str = "value",
    window_buckets: int = 24,
) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.timeseries import (
            rolling_trend,
        )

        out = rolling_trend(
            load(spark, sf_dir, table),
            ts_col,
            value_col,
            window_buckets,
            stable_sums=True,
            stable=True,
        )
        # the oracle row carries trend_sum_x1e4 (window sum of the
        # rounded grid, scaled to BIGINT — integer frame arithmetic is
        # exact in both engines), not the double trend average, whose
        # last ulp legitimately differs; even DECIMAL frame sums deviate
        # in DuckDB 1.0 (measured, operators/timeseries.py). Unit tests
        # pin the average itself.
        return out.select(
            F.col("t").cast("string").alias("t"),
            _r(F.col("v")).alias("v"),
            "n",
            "trend_sum_x1e4",
            "trend_support",
        )

    return fn


def rolling_trend_sql(
    table: str = "events",
    ts_col: str = "ts",
    value_col: str = "value",
    window_buckets: int = 24,
) -> str:
    half = window_buckets // 2
    after = window_buckets - half - 1
    return f"""
WITH g0 AS (SELECT date_trunc('hour', {ts_col}) AS t,
                   CAST(sum(CAST({value_col} AS DECIMAL(30,6))) AS DOUBLE)
                     AS s,
                   count({value_col}) AS n
            FROM {table} WHERE {ts_col} IS NOT NULL GROUP BY 1),
grid AS (SELECT t, CASE WHEN n > 0 THEN s / n END AS v, n,
                CAST(CAST(round(CASE WHEN n > 0 THEN s / n END, 4)
                          AS DECIMAL(20,4)) * 10000 AS BIGINT) AS vi
         FROM g0)
SELECT CAST(t AS VARCHAR) AS t, round(v, 4) AS v, n,
       CAST(sum(vi) OVER w AS BIGINT) AS trend_sum_x1e4,
       count(v) OVER w AS trend_support
FROM grid
WINDOW w AS (ORDER BY t ROWS BETWEEN {half} PRECEDING AND {after} FOLLOWING)
"""


def seasonal_decompose_query(
    table: str = "events",
    ts_col: str = "ts",
    value_col: str = "value",
    window_buckets: int = 24,
) -> QueryFn:
    """Per-period exact-integer invariants of the classical decomposition
    (operators/timeseries.py:seasonal_decompose): the grid, the scaled
    window sums, and the period grouping are pinned bit-exactly; the
    double seasonal/resid values derive from these by rational arithmetic
    (unit tests pin the identity v = trend + seasonal + resid)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.timeseries import (
            seasonal_decompose,
        )

        out = seasonal_decompose(
            load(spark, sf_dir, table), ts_col, value_col, window_buckets,
            stable=True, stable_sums=True,
        )
        vi = (
            F.round(F.col("v"), 4).cast("decimal(20,4)") * F.lit(10000)
        ).cast("long")
        return out.groupBy("period_pos").agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(vi).alias("v_sum_x1e4"),
            F.sum("trend_sum_x1e4").alias("trend_win_sum_x1e4"),
            F.sum("trend_support").alias("trend_support_sum"),
        )

    return fn


def seasonal_decompose_sql(
    table: str = "events",
    ts_col: str = "ts",
    value_col: str = "value",
    window_buckets: int = 24,
) -> str:
    half = window_buckets // 2
    after = window_buckets - half - 1
    return f"""
WITH g0 AS (SELECT date_trunc('hour', {ts_col}) AS t,
                   CAST(sum(CAST({value_col} AS DECIMAL(30,6))) AS DOUBLE)
                     AS s,
                   count({value_col}) AS n
            FROM {table} WHERE {ts_col} IS NOT NULL GROUP BY 1),
grid AS (SELECT t, CASE WHEN n > 0 THEN s / n END AS v,
                CAST(CAST(round(CASE WHEN n > 0 THEN s / n END, 4)
                          AS DECIMAL(20,4)) * 10000 AS BIGINT) AS vi
         FROM g0),
w AS (SELECT t, vi,
             sum(vi) OVER fr AS tsum,
             count(vi) OVER fr AS tsupp
      FROM grid
      WINDOW fr AS (ORDER BY t
                    ROWS BETWEEN {half} PRECEDING AND {after} FOLLOWING))
SELECT hour(t) AS period_pos,
       count(*) AS n_buckets,
       CAST(sum(vi) AS BIGINT) AS v_sum_x1e4,
       CAST(sum(tsum) AS BIGINT) AS trend_win_sum_x1e4,
       CAST(sum(tsupp) AS BIGINT) AS trend_support_sum
FROM w GROUP BY 1
"""


def seasonal_profile_query(
    table: str = "events", ts_col: str = "ts", value_col: str = "value"
) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.timeseries import (
            seasonal_profile,
        )

        out = seasonal_profile(
            load(spark, sf_dir, table), ts_col, value_col, "hour_of_day"
        )
        return out.select(
            "period",
            "n",
            _r(F.col("mean_value")).alias("mean_value"),
            _r(F.col("std_value")).alias("std_value"),
        )

    return fn


def seasonal_profile_sql(
    table: str = "events", ts_col: str = "ts", value_col: str = "value"
) -> str:
    return f"""
SELECT hour({ts_col}) AS period, count({value_col}) AS n,
       round(avg({value_col}), 4) AS mean_value,
       round(stddev_samp({value_col}), 4) AS std_value
FROM {table} WHERE {ts_col} IS NOT NULL GROUP BY 1
"""


def ts_anomaly_query(
    table: str = "events",
    ts_col: str = "ts",
    value_col: str = "value",
    window_buckets: int = 24,
    k: float = 3.0,
    min_support: int = 8,
) -> QueryFn:
    """Grid anomaly flags through the EXACT integer threshold tier
    (stable=True): the boolean is evaluated in scaled-integer arithmetic
    on both engines, so the flag itself — not a rounded float — is the
    hash-matched quantity."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.timeseries import (
            detect_anomalies,
        )

        out = detect_anomalies(
            load(spark, sf_dir, table),
            ts_col,
            value_col,
            window_buckets,
            k,
            min_support,
            stable=True,
        )
        return out.select(
            F.col("t").cast("string").alias("t"),
            _r(F.col("v")).alias("v"),
            "baseline_n",
            "flagged",
        )

    return fn


def ts_anomaly_sql(
    table: str = "events",
    ts_col: str = "ts",
    value_col: str = "value",
    window_buckets: int = 24,
    k: float = 3.0,
    min_support: int = 8,
) -> str:
    half = window_buckets // 2
    k2 = int(round(k * k * 1000))
    return f"""
WITH g0 AS (SELECT date_trunc('hour', {ts_col}) AS t,
                   CAST(sum(CAST({value_col} AS DECIMAL(30,6))) AS DOUBLE)
                     AS s6,
                   count({value_col}) AS n
            FROM {table} WHERE {ts_col} IS NOT NULL GROUP BY 1),
grid AS (SELECT t, CASE WHEN n > 0 THEN s6 / n END AS v, n,
                CAST(CAST(round(CASE WHEN n > 0 THEN s6 / n END, 4)
                          AS DECIMAL(20,4)) * 10000 AS BIGINT) AS vi
         FROM g0),
w AS (SELECT t, v, vi,
             coalesce(sum(vi) OVER wl, 0) + coalesce(sum(vi) OVER wr, 0)
               AS s,
             coalesce(sum(vi * vi) OVER wl, 0)
               + coalesce(sum(vi * vi) OVER wr, 0) AS q,
             coalesce(count(vi) OVER wl, 0)
               + coalesce(count(vi) OVER wr, 0) AS nw
      FROM grid
      WINDOW wl AS (ORDER BY t ROWS BETWEEN {half} PRECEDING
                    AND 1 PRECEDING),
             wr AS (ORDER BY t ROWS BETWEEN 1 FOLLOWING
                    AND {half} FOLLOWING))
SELECT CAST(t AS VARCHAR) AS t, round(v, 4) AS v,
       CAST(nw AS BIGINT) AS baseline_n,
       CASE WHEN nw >= {min_support} AND vi IS NOT NULL THEN
            CAST(nw * vi - s AS HUGEINT) * (nw * vi - s) * (nw - 1) * 1000
            > CAST({k2} AS HUGEINT) * nw * (nw * q - s * s)
       END AS flagged
FROM w
"""


# --------------------------------------------------------------------------------
# declarative data-quality checks (operators/checks.py) — the validation surface
# the reference lacks (model/messages.py only reports AFTER profiling; these
# DECLARE the contract up front and gate the load). Both sides are generated
# from the same Check list so names / rounding / pass rules line up exactly.
# --------------------------------------------------------------------------------

_ORDERS_RANGE_HI = 1000000000.0


def _orders_suite():
    from pandas_profiling_personal_spark.operators import checks as C

    return [
        C.completeness("o_custkey"),
        C.in_range("o_totalprice", 0.0, _ORDERS_RANGE_HI),
        C.is_in_set("o_orderstatus", ["F", "O", "P"]),
        C.matches("o_orderpriority", "^[1-5]-"),
        C.mean_between("o_totalprice", 0.0, _ORDERS_RANGE_HI),
        C.sum_between("o_totalprice", 0.0, None),
        C.quantile_between("o_totalprice", 0.5, 0.0, _ORDERS_RANGE_HI),
        C.row_count_between(1.0, None),
        C.uniqueness("o_orderkey"),
        C.distinctness("o_orderstatus"),
        C.primary_key("o_orderkey"),
        C.satisfies("o_totalprice > 0", "positive_total"),
    ]


def _sql_check_row(name: str, kind: str, column: str, metric: str,
                   raw: str, lo: float | None, hi: float | None) -> str:
    """One result row; ``passed`` compares the UNROUNDED metric (the
    engine's _ratio_row rule), ``value`` reports round(raw, 4)."""
    lo_s = "CAST(NULL AS DOUBLE)" if lo is None else f"CAST({lo!r} AS DOUBLE)"
    hi_s = "CAST(NULL AS DOUBLE)" if hi is None else f"CAST({hi!r} AS DOUBLE)"
    conds = ["TRUE"]
    if lo is not None:
        conds.append(f"({raw}) >= {lo!r}")
    if hi is not None:
        conds.append(f"({raw}) <= {hi!r}")
    passed = f"(({raw}) IS NULL OR ({' AND '.join(conds)}))"
    return (
        f"SELECT '{name}' AS check_name, '{kind}' AS kind, "
        f"'{column}' AS \"column\", "
        f"'{metric}' AS metric, round(({raw}), 4) AS value, {lo_s} AS lower, "
        f"{hi_s} AS upper, {passed} AS passed FROM agg a, okeys k, skeys s"
    )


def check_suite_query(table: str = "orders") -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators import checks as C

        return C.check_suite(load(spark, sf_dir, table), _orders_suite())

    return fn


def check_suite_sql(table: str = "orders") -> str:
    hi = _ORDERS_RANGE_HI
    rows = [
        _sql_check_row("completeness(o_custkey)", "completeness", "o_custkey",
                       "completeness", "a.comp_n / a.n", 1.0, None),
        _sql_check_row("in_range(o_totalprice)", "in_range", "o_totalprice",
                       "compliance", "a.rng_s / a.rng_d", 1.0, None),
        _sql_check_row("is_in_set(o_orderstatus)", "is_in_set", "o_orderstatus",
                       "compliance", "a.set_s / a.set_d", 1.0, None),
        _sql_check_row("matches(o_orderpriority)", "matches", "o_orderpriority",
                       "compliance", "a.re_s / a.re_d", 1.0, None),
        _sql_check_row("mean_between(o_totalprice)", "mean_between",
                       "o_totalprice", "mean", "a.mean_v", 0.0, hi),
        _sql_check_row("sum_between(o_totalprice)", "sum_between",
                       "o_totalprice", "sum", "a.sum_v", 0.0, None),
        _sql_check_row("quantile_between(o_totalprice,0.5)", "quantile_between",
                       "o_totalprice", "q0.5", "a.med_v", 0.0, hi),
        _sql_check_row("row_count", "row_count_between", "", "row_count",
                       "CAST(a.n AS DOUBLE)", 1.0, None),
        _sql_check_row("uniqueness(o_orderkey)", "uniqueness", "o_orderkey",
                       "uniqueness", "k.singles_ / k.rows_", 1.0, None),
        _sql_check_row("distinctness(o_orderstatus)", "distinctness",
                       "o_orderstatus", "distinctness",
                       "s.groups_ / s.rows_", 0.0, None),
        _sql_check_row("primary_key(o_orderkey)", "primary_key", "o_orderkey",
                       "primary_key",
                       "CASE WHEN k.nulls_ > 0 THEN 0.0 "
                       "ELSE k.singles_ / k.rows_ END", 1.0, None),
        _sql_check_row("positive_total", "satisfies", "", "compliance",
                       "a.sat_s / a.n", 1.0, None),
    ]
    selects = "\nUNION ALL ".join(rows)
    return f"""
WITH agg AS (
  SELECT count(*) AS n,
         count(o_custkey) AS comp_n,
         sum(CASE WHEN o_totalprice >= 0.0 AND o_totalprice <= {hi!r}
                  THEN 1 ELSE 0 END) AS rng_s,
         count(o_totalprice) AS rng_d,
         sum(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 ELSE 0 END)
           AS set_s,
         count(o_orderstatus) AS set_d,
         sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                  THEN 1 ELSE 0 END) AS re_s,
         count(o_orderpriority) AS re_d,
         avg(o_totalprice) AS mean_v,
         CAST(sum(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_v,
         quantile_cont(o_totalprice, 0.5) AS med_v,
         sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS sat_s
  FROM {table}
),
okeys AS (
  SELECT sum(c) AS rows_, count(*) AS groups_,
         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS singles_,
         sum(nulls_) AS nulls_
  FROM (SELECT count(*) AS c,
               sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nulls_
        FROM {table} GROUP BY o_orderkey)
),
skeys AS (
  SELECT sum(c) AS rows_, count(*) AS groups_
  FROM (SELECT count(*) AS c FROM {table} GROUP BY o_orderstatus)
)
{selects}
ORDER BY check_name
"""


def check_violations_query(table: str = "lineitem", limit: int = 10) -> QueryFn:
    """Row-level violation sampling (operators/checks.py:check_violations —
    Deequ's row-level results, VLDB'18 §4.3): WHICH values break each gate,
    the `limit` heaviest per check, deterministic (count desc, value asc).
    Exercises the predicate, uniqueness, and FD violation paths."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators import checks as C

        df = load(spark, sf_dir, table)
        return C.check_violations(
            df,
            [
                C.in_range("l_quantity", 1, 45, name="qty_range"),
                C.is_in_set("l_returnflag", ["A", "N"], name="flag_set"),
                C.uniqueness("l_linenumber", name="line_unique"),
                C.functional_dependency(
                    ["l_orderkey"], "l_linestatus", name="order_status_fd"
                ),
            ],
            limit=limit,
        )

    return fn


def check_violations_sql(table: str = "lineitem", limit: int = 10) -> str:
    return f"""
SELECT * FROM (
  SELECT 'qty_range' AS check_name, 'in_range' AS kind,
         'l_quantity' AS "column",
         CAST(l_quantity AS VARCHAR) AS violation, count(*) AS n_rows
  FROM {table}
  WHERE l_quantity IS NOT NULL
    AND NOT (l_quantity >= 1.0 AND l_quantity <= 45.0)
  GROUP BY 4 ORDER BY n_rows DESC, violation ASC LIMIT {limit})
UNION ALL
SELECT * FROM (
  SELECT 'flag_set', 'is_in_set', 'l_returnflag',
         CAST(l_returnflag AS VARCHAR), count(*) AS n_rows
  FROM {table}
  WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A', 'N')
  GROUP BY 4 ORDER BY n_rows DESC, 4 ASC LIMIT {limit})
UNION ALL
SELECT * FROM (
  SELECT 'line_unique', 'uniqueness', 'l_linenumber',
         violation, n_rows FROM (
    SELECT coalesce(CAST(l_linenumber AS VARCHAR), 'NULL') AS violation,
           count(*) AS n_rows
    FROM {table} GROUP BY l_linenumber)
  WHERE n_rows > 1
  ORDER BY n_rows DESC, violation ASC LIMIT {limit})
UNION ALL
SELECT * FROM (
  SELECT 'order_status_fd', 'functional_dependency',
         'l_orderkey,l_linestatus',
         violation, n_rows FROM (
    SELECT coalesce(CAST(l_orderkey AS VARCHAR), 'NULL') AS violation,
           count(DISTINCT coalesce(CAST(l_linestatus AS VARCHAR),
                                   chr(30) || 'N')) AS n_rows
    FROM {table} GROUP BY l_orderkey)
  WHERE n_rows > 1
  ORDER BY n_rows DESC, violation ASC LIMIT {limit})
"""


def referential_integrity_query() -> QueryFn:
    """lineitem FKs: l_orderkey ⊆ orders.o_orderkey, l_partkey ⊆ part.p_partkey."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators import checks as C

        lineitem = load(spark, sf_dir, "lineitem")
        refs = {
            "orders": load(spark, sf_dir, "orders"),
            "part": load(spark, sf_dir, "part"),
        }
        return C.check_suite(
            lineitem,
            [
                C.foreign_key("l_orderkey", "orders", "o_orderkey"),
                C.foreign_key("l_partkey", "part", "p_partkey"),
            ],
            refs=refs,
        )

    return fn


def referential_integrity_sql() -> str:
    def fk(child_col: str, parent: str, parent_col: str) -> str:
        name = f"foreign_key({child_col}->{parent})"
        return f"""
SELECT '{name}' AS check_name, 'foreign_key' AS kind,
       '{child_col}' AS "column", 'violation_ratio' AS metric,
       round(v.viol / v.n_child, 4) AS value,
       CAST(NULL AS DOUBLE) AS lower, CAST(0.0 AS DOUBLE) AS upper,
       ((v.viol / v.n_child) IS NULL
        OR (v.viol / v.n_child) <= 0.0) AS passed
FROM (
  SELECT count(*) AS n_child,
         sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS viol
  FROM (SELECT {child_col} AS k FROM lineitem
        WHERE {child_col} IS NOT NULL) c
  LEFT JOIN (SELECT DISTINCT {parent_col} AS k FROM {parent}) p USING (k)
) v"""

    return (
        fk("l_orderkey", "orders", "o_orderkey")
        + "\nUNION ALL "
        + fk("l_partkey", "part", "p_partkey")
        + "\nORDER BY check_name"
    )


def functional_dependency_query() -> QueryFn:
    """FDs inside lineitem: a holding key FD and two data-dependent ones."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators import checks as C

        return C.check_suite(
            load(spark, sf_dir, "lineitem"),
            [
                C.functional_dependency(["l_orderkey", "l_linenumber"],
                                        "l_quantity"),
                C.functional_dependency("l_orderkey", "l_returnflag"),
                C.functional_dependency("l_partkey", "l_suppkey"),
            ],
        )

    return fn


def functional_dependency_sql() -> str:
    def fd(det: list[str], dep: str) -> str:
        name = f"fd({','.join(det)}->{dep})"
        col = ",".join(det + [dep])
        det_sql = ", ".join(det)
        return f"""
SELECT '{name}' AS check_name, 'functional_dependency' AS kind,
       '{col}' AS "column", 'dependency_ratio' AS metric,
       round((f.groups_ - f.viol) / f.groups_, 4) AS value,
       CAST(1.0 AS DOUBLE) AS lower, CAST(NULL AS DOUBLE) AS upper,
       (((f.groups_ - f.viol) / f.groups_) IS NULL
        OR ((f.groups_ - f.viol) / f.groups_) >= 1.0) AS passed
FROM (
  SELECT count(*) AS groups_,
         sum(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS viol
  FROM (SELECT {det_sql},
               count(DISTINCT {dep})
                 + max(CASE WHEN {dep} IS NULL THEN 1 ELSE 0 END) AS ndep
        FROM lineitem GROUP BY {det_sql})
) f"""

    return (
        fd(["l_orderkey", "l_linenumber"], "l_quantity")
        + "\nUNION ALL "
        + fd(["l_orderkey"], "l_returnflag")
        + "\nUNION ALL "
        + fd(["l_partkey"], "l_suppkey")
        + "\nORDER BY check_name"
    )


#: fd_discovery candidates: a derived exact FD (qty_int -> qty_bucket,
#: bucket is a function of the integer quantity), its failing inverse,
#: a failing derived pair, and a partial real-column pair — both verdicts
#: and the full ratio range exercised
_FD_DISC_PAIRS = [
    ("qty_int", "qty_bucket"),
    ("qty_bucket", "qty_int"),
    ("qty_mod7", "qty_bucket"),
    ("l_returnflag", "l_linestatus"),
]


def _fd_disc_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        S.col("l_quantity").cast("int").alias("qty_int"),
        F.floor(S.col("l_quantity") / 10).cast("int").alias("qty_bucket"),
        F.pmod(S.col("l_quantity").cast("long"), F.lit(7))
        .cast("int")
        .alias("qty_mod7"),
    )


def fd_discovery_query() -> QueryFn:
    """FD DISCOVERY (operators/checks.py:discover_fds — the relationship
    mining step before functional_dependency declares a contract): score
    explicit candidate pairs (the deterministic oracle tier; production
    enumerates + HLL-prunes the quadratic space) through the shared
    one-melt two-level-groupBy kernel."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.checks import (
            discover_fds,
        )

        return discover_fds(
            _fd_disc_frame(spark, sf_dir), candidates=_FD_DISC_PAIRS
        )

    return fn


def fd_discovery_sql() -> str:
    derived = (
        "SELECT l_returnflag, l_linestatus,"
        " CAST(l_quantity AS INT) AS qty_int,"
        " CAST(floor(l_quantity / 10) AS INT) AS qty_bucket,"
        " CAST(CAST(l_quantity AS BIGINT) % 7 AS INT) AS qty_mod7"
        " FROM lineitem"
    )

    def pair(a: str, b: str) -> str:
        return f"""
SELECT '{a}' AS determinant, '{b}' AS dependent,
       round((f.g - f.v) / f.g, 4) AS dependency_ratio,
       f.v = 0 AS holds,
       CAST(f.g AS BIGINT) AS n_groups, CAST(f.v AS BIGINT) AS n_violating,
       TRUE AS exact
FROM (
  SELECT count(*) AS g, sum(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS v
  FROM (SELECT {a},
               count(DISTINCT {b})
                 + max(CASE WHEN {b} IS NULL THEN 1 ELSE 0 END) AS ndep
        FROM t GROUP BY {a})
) f"""

    body = "\nUNION ALL ".join(pair(a, b) for a, b in _FD_DISC_PAIRS)
    return (
        f"WITH t AS ({derived})\n" + body
        + "\nORDER BY dependency_ratio DESC, determinant, dependent"
    )


#: fk_discovery candidates: a holding reference (every order names a
#: customer) and a failing same-family pair (order keys are not customer
#: keys) — both verdicts + a real fractional ratio
_IND_PAIRS = [
    ("o_custkey", "c_custkey"),
    ("o_orderkey", "c_custkey"),
]


def fk_discovery_query() -> QueryFn:
    """Inclusion-dependency / FK discovery (operators/checks.py:
    discover_inclusions — the cross-table complement of discover_fds):
    explicit candidate pairs (production generates + min/max/HLL-screens
    the type-compatible space) through the shared distinct-values
    anti-join — the declared foreign_key check's machinery generalized
    to every pair in ONE join."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.checks import (
            discover_inclusions,
        )

        return discover_inclusions(
            load(spark, sf_dir, "orders"),
            load(spark, sf_dir, "customer"),
            candidates=_IND_PAIRS,
        )

    return fn


def fk_discovery_sql() -> str:
    def pair(a: str, b: str) -> str:
        return f"""
SELECT '{a}' AS child_column, '{b}' AS parent_column,
       round((c.n - m.miss) / c.n, 4) AS containment_ratio,
       m.miss = 0 AS contained,
       CAST(c.n AS BIGINT) AS n_child_distinct,
       CAST(m.miss AS BIGINT) AS n_missing_distinct,
       TRUE AS exact
FROM (SELECT count(DISTINCT {a}) AS n FROM orders WHERE {a} IS NOT NULL) c,
     (SELECT count(*) AS miss FROM
        (SELECT DISTINCT {a} AS cv FROM orders WHERE {a} IS NOT NULL) c2
        LEFT JOIN (SELECT DISTINCT {b} AS pv FROM customer) p2
          ON c2.cv = p2.pv
      WHERE p2.pv IS NULL) m"""

    body = "\nUNION ALL ".join(pair(a, b) for a, b in _IND_PAIRS)
    return (
        body
        + "\nORDER BY containment_ratio DESC, child_column, parent_column"
    )


#: fk_catalog tables: narrow integer-key projections of three TPC-H
#: tables — prune=False keeps EVERY type-compatible ordered pair
#: exact-verified (the HLL screen is not oracle-reproducible), so the
#: whole catalog result is SQL-rebuildable
_FK_CATALOG_TABLES = {
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "orders": ["o_custkey"],
}


def fk_catalog_query() -> QueryFn:
    """Catalog-level inclusion/FK mining (operators/checks.py:
    discover_inclusions_catalog — the N-table warehouse hunt, VERDICT
    r12 #4): every ordered pair of three TPC-H tables in ONE call; one
    stats scan per table in the pruned production path (prune=False
    here so every row is exact and the DuckDB oracle can rebuild it)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.checks import (
            discover_inclusions_catalog,
        )

        tabs = {
            nm: load(spark, sf_dir, nm).select(*cols)
            for nm, cols in _FK_CATALOG_TABLES.items()
        }
        return discover_inclusions_catalog(tabs, prune=False)

    return fn


def fk_catalog_sql() -> str:
    def pair(ct: str, a: str, pt: str, b: str) -> str:
        return f"""
SELECT '{ct}' AS child_table, '{a}' AS child_column,
       '{pt}' AS parent_table, '{b}' AS parent_column,
       round((c.n - m.miss) / c.n, 4) AS containment_ratio,
       m.miss = 0 AS contained,
       CAST(c.n AS BIGINT) AS n_child_distinct,
       CAST(m.miss AS BIGINT) AS n_missing_distinct,
       TRUE AS exact
FROM (SELECT count(DISTINCT {a}) AS n FROM {ct} WHERE {a} IS NOT NULL) c,
     (SELECT count(*) AS miss FROM
        (SELECT DISTINCT {a} AS cv FROM {ct} WHERE {a} IS NOT NULL) c2
        LEFT JOIN (SELECT DISTINCT {b} AS pv FROM {pt}) p2
          ON c2.cv = p2.pv
      WHERE p2.pv IS NULL) m"""

    blocks = []
    names = sorted(_FK_CATALOG_TABLES)
    for ct in names:
        for pt in names:
            if ct == pt:
                continue
            for a in _FK_CATALOG_TABLES[ct]:
                for b in _FK_CATALOG_TABLES[pt]:
                    blocks.append(pair(ct, a, pt, b))
    return (
        "\nUNION ALL ".join(blocks)
        + "\nORDER BY containment_ratio DESC, child_table, child_column,"
          " parent_table, parent_column"
    )


#: key_discovery candidates: a unary key, a repeating non-key, a
#: NULL-bearing non-key (NULL keys are sentinel VALUES), a null-bearing
#: composite KEY (null_free=false — unique but not primary-key
#: eligible), and a tiny-ratio categorical pair — both verdicts, the
#: full ratio range, and the NULL-component path all exercised
_KEY_DISC_SETS = [
    ("o_orderkey",),
    ("o_custkey",),
    ("cust_n",),
    ("cust_n", "o_orderkey"),
    ("o_orderstatus", "o_orderpriority"),
]


def _key_disc_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        F.when(S.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(S.col("o_custkey"))
        .alias("cust_n"),
    )


def key_discovery_query() -> QueryFn:
    """KEY DISCOVERY (operators/checks.py:discover_keys — the
    unique-column-combination miner completing the FD/inclusion triad;
    the reference only alerts per-column UNIQUE after the fact,
    model/messages.py:204-257): score explicit candidate column sets
    (the deterministic oracle tier; production enumerates the
    bounded lattice with TANE minimality pruning + HLL screens) through
    the declared uniqueness check's one-melt two-level-groupBy kernel."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.checks import (
            discover_keys,
        )

        return discover_keys(
            _key_disc_frame(spark, sf_dir), candidates=_KEY_DISC_SETS
        )

    return fn


def key_discovery_sql() -> str:
    derived = (
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,"
        " CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END"
        " AS cust_n FROM orders"
    )

    def keyset(cols: "tuple[str, ...]") -> str:
        name = ",".join(cols)
        grp = ", ".join(cols)
        nulls = " + ".join(
            f"(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)" for c in cols
        )
        return f"""
SELECT '{name}' AS key, CAST({len(cols)} AS INT) AS arity,
       CAST(t.n AS BIGINT) AS n_rows,
       CAST(g.groups AS BIGINT) AS n_groups,
       round(g.singles / t.n, 4) AS uniqueness_ratio,
       t.null_parts = 0 AS null_free,
       g.groups = t.n AS is_key,
       TRUE AS exact
FROM (SELECT count(*) AS n, coalesce(sum({nulls}), 0) AS null_parts
      FROM t) t,
     (SELECT count(*) AS groups,
             sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS singles
      FROM (SELECT count(*) AS cnt FROM t GROUP BY {grp})) g"""

    body = "\nUNION ALL ".join(keyset(ks) for ks in _KEY_DISC_SETS)
    return (
        f"WITH t AS ({derived})\n" + body
        + "\nORDER BY uniqueness_ratio DESC, arity, key"
    )


def benford_query(table: str = "lineitem",
                  cols: list[str] | None = None) -> QueryFn:
    cols = cols or ["l_extendedprice", "l_quantity", "l_discount"]

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.checks import (
            benford_profile,
        )

        return benford_profile(load(spark, sf_dir, table), cols)

    return fn


def benford_sql(table: str = "lineitem", cols: list[str] | None = None) -> str:
    """First-digit mix via the printf scientific form (engine-identical
    for IEEE doubles — the log10/pow arithmetic is NOT, see _first_digit)."""
    cols = cols or ["l_extendedprice", "l_quantity", "l_discount"]
    vals = "\nUNION ALL ".join(
        f"SELECT '{c}' AS col_name, CAST(nullif(regexp_extract(printf("
        f"'%.9e', abs(CAST({c} AS DOUBLE))), '[1-9]'), '') AS INT) AS digit "
        f"FROM {table} WHERE {c} IS NOT NULL "
        f"AND CAST({c} AS DOUBLE) <> 0 AND isfinite(CAST({c} AS DOUBLE))"
        for c in cols
    )
    return f"""
WITH vals AS (
{vals}
),
counts AS (SELECT col_name, digit, count(*) AS n FROM vals
           WHERE digit IS NOT NULL GROUP BY 1, 2),
totals AS (SELECT col_name, count(*) AS t FROM vals
           WHERE digit IS NOT NULL GROUP BY 1),
grid AS (SELECT t.col_name, d.d AS digit, t.t
         FROM totals t, (SELECT unnest(range(1, 10)) AS d) d)
SELECT g.col_name AS col_name, CAST(g.digit AS INT) AS digit,
       CAST(coalesce(c.n, 0) AS DOUBLE) AS n,
       round(coalesce(c.n, 0) * 1.0 / g.t, 4) AS observed_p,
       round(log10(1 + 1.0 / g.digit), 4) AS expected_p
FROM grid g LEFT JOIN counts c
  ON g.col_name = c.col_name AND g.digit = c.digit
ORDER BY 1, 2
"""


def grouped_checks_query(table: str = "documents",
                         by: str = "lang") -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators import checks as C

        suite = [
            C.completeness("text"),
            C.in_range("n_chars", 0.0, 1000000000.0),
            C.mean_between("n_chars", 0.0, 1000000000.0),
            C.quantile_between("n_chars", 0.5, 0.0, 1000000000.0),
            C.row_count_between(1.0, None),
            C.satisfies("n_chars >= 0", "nonneg_chars"),
        ]
        return C.check_suite_by(load(spark, sf_dir, table), suite, by)

    return fn


def grouped_checks_sql(table: str = "documents", by: str = "lang") -> str:
    hi = 1000000000.0

    def row(name, kind, column, metric, raw, lo, hi_):
        lo_s = ("CAST(NULL AS DOUBLE)" if lo is None
                else f"CAST({lo!r} AS DOUBLE)")
        hi_s = ("CAST(NULL AS DOUBLE)" if hi_ is None
                else f"CAST({hi_!r} AS DOUBLE)")
        conds = ["TRUE"]
        if lo is not None:
            conds.append(f"({raw}) >= {lo!r}")
        if hi_ is not None:
            conds.append(f"({raw}) <= {hi_!r}")
        passed = f"(({raw}) IS NULL OR ({' AND '.join(conds)}))"
        return (
            f"SELECT {by}, '{name}' AS check_name, '{kind}' AS kind, "
            f"'{column}' AS \"column\", '{metric}' AS metric, "
            f"round(({raw}), 4) AS value, {lo_s} AS lower, {hi_s} AS upper, "
            f"{passed} AS passed FROM agg"
        )

    rows = [
        row("completeness(text)", "completeness", "text", "completeness",
            "comp_n / n", 1.0, None),
        row("in_range(n_chars)", "in_range", "n_chars", "compliance",
            "rng_s / rng_d", 1.0, None),
        row("mean_between(n_chars)", "mean_between", "n_chars", "mean",
            "mean_v", 0.0, hi),
        row("quantile_between(n_chars,0.5)", "quantile_between", "n_chars",
            "q0.5", "med_v", 0.0, hi),
        row("row_count", "row_count_between", "", "row_count",
            "CAST(n AS DOUBLE)", 1.0, None),
        row("nonneg_chars", "satisfies", "", "compliance",
            "sat_s / n", 1.0, None),
    ]
    selects = "\nUNION ALL ".join(rows)
    return f"""
WITH agg AS (
  SELECT {by}, count(*) AS n, count(text) AS comp_n,
         sum(CASE WHEN n_chars >= 0.0 AND n_chars <= {hi!r}
                  THEN 1 ELSE 0 END) AS rng_s,
         count(n_chars) AS rng_d,
         avg(n_chars) AS mean_v,
         quantile_cont(n_chars, 0.5) AS med_v,
         sum(CASE WHEN n_chars >= 0 THEN 1 ELSE 0 END) AS sat_s
  FROM {table} GROUP BY {by}
)
{selects}
ORDER BY {by} NULLS FIRST, check_name
"""
