"""Frequency tables, distinct/unique counts, top-K values.

The reference runs ``dropna.groupBy(col).count()`` + ``orderBy.limit(250).toPandas()``
once per column (reference: series_wrappers.py:104-131, summary_algorithms.py:449-480)
— N shuffles for N columns. This engine *melts* all requested columns into
``(column, value)`` pairs with one ``explode`` and aggregates them in ONE shuffle:
map-side partial aggregation compresses each partition to its distinct values before
the exchange, so the explode factor never hits the wire. Per-column helpers are also
provided for single-column use.

Unique-value semantics: ``n_unique`` = number of values occurring exactly once —
the reference's Spark backend gets this wrong (``dropDuplicates().count()``, which
is just distinct count; reference: series_wrappers.py:170-171). We implement the
documented pandas semantics (summary_algorithms.py:93-94).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pandas_profiling_personal_spark.functions import stats as S


def melt(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long form ``(column, value)`` with values cast to string, nulls dropped.

    One narrow projection + explode; no shuffle by itself.

    ``columns=None`` melts every column; an explicit ``[]`` yields an EMPTY
    result (never a silent all-columns fallback — the near-unique gate made
    "gate everything -> [] -> full-table melt" a reachable bug)."""
    columns = df.columns if columns is None else columns
    if not columns:
        return df.sparkSession.createDataFrame(
            [], "column string, value string"
        )
    structs = [
        F.struct(
            F.lit(c).alias("column"), S.col(c).cast("string").alias("value")
        )
        for c in columns
    ]
    return (
        df.select(F.explode(F.array(*structs)).alias("kv"))
        .select("kv.column", "kv.value")
        .where(F.col("value").isNotNull())
    )


def value_counts(df: DataFrame, column: str) -> DataFrame:
    """Per-column frequency table (NaN/null excluded), native value type.

    reference: series_wrappers.py:104-131."""
    c = S.col(column)
    return df.where(c.isNotNull()).groupBy(c.alias("value")).agg(
        F.count(F.lit(1)).alias("count")
    )


def value_counts_all(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Frequency tables for ALL columns in one shuffle: (column, value, count)."""
    return melt(df, columns).groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("count")
    )


def distinct_unique_counts(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Exact ``(column, n_distinct, n_unique)`` for all columns in one shuffle."""
    vc = value_counts_all(df, columns)
    return vc.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.coalesce(
            F.sum(F.when(F.col("count") == 1, 1).otherwise(0)), F.lit(0)
        ).alias("n_unique"),
    )


def top_k_counts(vc: DataFrame, k: int, salt_buckets: int = 64) -> DataFrame:
    """Top-K rows of a (column, value, count) frequency table per column, with a
    deterministic tie-break (count desc, value asc).

    Two-phase to avoid the single-partition sort a plain
    ``Window.partitionBy(column)`` would do for a high-cardinality column: first
    top-K within (column, salt) — ``salt_buckets``-way parallel — then top-K of the
    ≤ k*salt_buckets survivors per column."""
    salted = Window.partitionBy("column", "__salt").orderBy(
        F.desc("count"), F.asc("value")
    )
    final = Window.partitionBy("column").orderBy(F.desc("count"), F.asc("value"))
    return (
        vc.withColumn("__salt", F.abs(F.hash("value")) % salt_buckets)
        .withColumn("__r1", F.row_number().over(salted))
        .where(F.col("__r1") <= k)
        .withColumn("rank", F.row_number().over(final))
        .where(F.col("rank") <= k)
        .drop("__salt", "__r1")
    )


def top_k_all(
    df: DataFrame, k: int, columns: list[str] | None = None
) -> DataFrame:
    """Top-K most frequent values per column (column, value, count, rank).

    One shuffle for the counts + the salted two-phase top-K (reference transfers
    top-250 per column — K1, summary_algorithms.py:462-468)."""
    return top_k_counts(value_counts_all(df, columns), k)


def top_k_with_totals(vc: DataFrame, k: int, salt_buckets: int = 64) -> DataFrame:
    """:func:`top_k_counts` plus exact per-column ``n_distinct``/``n_unique``
    riding the SAME two shuffles — no separate groupBy job.

    Phase 1 computes, per (column, salt) group, partial distinct/unique totals
    as unbounded window aggregates over the same partitioning the ranking
    window already shuffled by; phase 2 sums the partials of each group's
    rank-1 survivor (every non-empty salt group keeps its rank-1 row for any
    k ≥ 1, so the sum over survivors is the exact column total)."""
    salted = Window.partitionBy("column", "__salt").orderBy(
        F.desc("count"), F.asc("value")
    )
    salted_all = Window.partitionBy("column", "__salt")
    final = Window.partitionBy("column").orderBy(F.desc("count"), F.asc("value"))
    final_all = Window.partitionBy("column")
    return (
        vc.withColumn("__salt", F.abs(F.hash("value")) % salt_buckets)
        .withColumn("__r1", F.row_number().over(salted))
        .withColumn("__pd", F.count(F.lit(1)).over(salted_all))
        .withColumn(
            "__pu",
            F.sum(F.when(F.col("count") == 1, 1).otherwise(0)).over(salted_all),
        )
        .where(F.col("__r1") <= k)
        .withColumn("rank", F.row_number().over(final))
        .withColumn(
            "n_distinct",
            F.sum(F.when(F.col("__r1") == 1, F.col("__pd"))).over(final_all),
        )
        .withColumn(
            "n_unique",
            F.coalesce(
                F.sum(F.when(F.col("__r1") == 1, F.col("__pu"))).over(final_all),
                F.lit(0),
            ),
        )
        .where(F.col("rank") <= k)
        .drop("__salt", "__r1", "__pd", "__pu")
    )


def extreme_counts(
    vc: DataFrame, n: int, numeric_columns: list[str], salt_buckets: int = 64
) -> DataFrame:
    """Bottom-N / top-N values *by value* per column from a (column, value, count)
    frequency table (K5 — reference: frequency_table_utils.py:82-117 slices the
    sorted value_counts index).

    ``numeric_columns`` are ranked on ``cast(value as double)``; everything else
    ranks lexically (ISO dates/timestamps sort chronologically as strings). NaN
    is excluded from numeric ranking — Spark sorts NaN above every finite, so it
    would otherwise surface as the rank-1 "max"; the reference computes extremes
    from value_counts_without_nan. Same salted two-phase shape as
    :func:`top_k_counts` so no column ever funnels its whole frequency table
    through one partition. Output: (column, value, count, end ∈ {'min','max'},
    rank)."""
    num_set = set(numeric_columns)
    if num_set:
        # values are strings post-melt; try_cast is NaN for 'NaN' and null for
        # non-numeric strings (isnan(null) -> false, so other columns pass)
        vc = vc.where(
            ~(
                F.col("column").isin(*num_set)
                & F.coalesce(
                    F.isnan(F.col("value").try_cast("double")), F.lit(False)
                )
            )
        )
    sort_key = F.when(
        F.col("column").isin(*num_set) if num_set else F.lit(False),
        F.col("value").cast("double"),
    )
    ranked = vc.withColumn("__num", sort_key).withColumn(
        "__salt", F.abs(F.hash("value")) % salt_buckets
    )
    # BOTH ends from ONE ascending pass per phase: over a total order the
    # descending rank is cnt - rn + 1, so the min-end (rn <= n) and max-end
    # (rn > cnt - n) survivors come out of a single window shuffle — this
    # halves the salted window passes over the (potentially huge) frequency
    # table. Null-ordering note: within one column partition __num is either
    # uniformly null (lexical ranking) or uniformly non-null (numeric), so
    # asc-nulls-first vs desc-nulls-last never reorders across the null
    # boundary and the reversal identity is exact.
    order = [F.asc("__num"), F.asc("value")]
    salted_w = Window.partitionBy("column", "__salt").orderBy(*order)
    salted_all = Window.partitionBy("column", "__salt")
    phase1 = (
        ranked.withColumn("__r1", F.row_number().over(salted_w))
        .withColumn("__c1", F.count(F.lit(1)).over(salted_all))
        .where((F.col("__r1") <= n) | (F.col("__r1") > F.col("__c1") - n))
    )
    final_w = Window.partitionBy("column").orderBy(*order)
    final_all = Window.partitionBy("column")
    both = phase1.withColumn("__r2", F.row_number().over(final_w)).withColumn(
        "__c2", F.count(F.lit(1)).over(final_all)
    )
    mins = both.where(F.col("__r2") <= n).select(
        "column", "value", "count", F.lit("min").alias("end"),
        F.col("__r2").alias("rank"),
    )
    maxs = both.where(F.col("__r2") > F.col("__c2") - n).select(
        "column", "value", "count", F.lit("max").alias("end"),
        (F.col("__c2") - F.col("__r2") + 1).alias("rank"),
    )
    return mins.unionByName(maxs)


def _topk_extremes_fused(
    vc: DataFrame,
    k: int,
    n: int,
    numeric_cols: list[str],
    ext_cols: list[str],
    salt_buckets: int = 64,
) -> DataFrame:
    """:func:`top_k_with_totals` and :func:`extreme_counts` as TWO branches
    of ONE plan over the SAME salted exchange, so the (column, value)
    frequency table is shuffled once — not once per job (r14, guide §2.4).

    Both branches window over identical ``hashpartitioning(column,
    __salt)`` children, so Catalyst's ReuseExchange executes the melt ->
    count shuffle and the salted exchange ONCE (plan-gated in
    test_plan_quality). Equivalence with the two-job path (pinned by
    test_semantics.py::test_fused_pass2_matches_two_job_path):

    * top-k + totals: branch T is literally the :func:`top_k_with_totals`
      pipeline; the extreme branch never feeds it.
    * extremes: instead of PRE-filtering NaN rows and non-extreme columns
      (which would change the exchange and break reuse), branch E ranks
      everything and reproduces the filter inside the window arithmetic —
      NaN sorts above every finite double in Spark's asc order, so the
      non-NaN rows occupy ranks 1..count(non-NaN) exactly as they would
      after the pre-filter; the survivor predicate adds ``NOT isnan`` and
      the extreme-column membership. Output: one long frame, ``end`` in
      ('top', 'min', 'max'); 'top' rows carry the exact totals.
    """
    num_set = set(numeric_cols)
    ext_set = set(ext_cols)
    in_num = (
        F.col("column").isin(*num_set) if num_set else F.lit(False)
    )
    base = (
        vc.withColumn("__salt", F.abs(F.hash("value")) % salt_buckets)
        .withColumn(
            "__num", F.when(in_num, F.col("value").cast("double"))
        )
        .withColumn(
            "__nan",
            F.coalesce(
                F.isnan(F.col("value").try_cast("double")), F.lit(False)
            )
            & in_num,
        )
    )
    # branch T — top_k_with_totals verbatim over the shared exchange
    salted_top = Window.partitionBy("column", "__salt").orderBy(
        F.desc("count"), F.asc("value")
    )
    salted_all = Window.partitionBy("column", "__salt")
    final_top = Window.partitionBy("column").orderBy(
        F.desc("count"), F.asc("value")
    )
    final_all = Window.partitionBy("column")
    tops = (
        base.withColumn("__r1", F.row_number().over(salted_top))
        .withColumn("__pd", F.count(F.lit(1)).over(salted_all))
        .withColumn(
            "__pu",
            F.sum(F.when(F.col("count") == 1, 1).otherwise(0)).over(salted_all),
        )
        .where(F.col("__r1") <= k)
        .withColumn("rank", F.row_number().over(final_top))
        .withColumn(
            "n_distinct",
            F.sum(F.when(F.col("__r1") == 1, F.col("__pd"))).over(final_all),
        )
        .withColumn(
            "n_unique",
            F.coalesce(
                F.sum(F.when(F.col("__r1") == 1, F.col("__pu"))).over(final_all),
                F.lit(0),
            ),
        )
        .where(F.col("rank") <= k)
        .select(
            "column", "value", "count", F.lit("top").alias("end"), "rank",
            "n_distinct", "n_unique",
        )
    )
    if not ext_set or n <= 0:
        return tops
    # branch E — extreme_counts with the pre-filters folded into the
    # window arithmetic (NaN-last ordering + non-NaN count bounds)
    order = [F.asc("__num"), F.asc("value")]
    salted_ext = Window.partitionBy("column", "__salt").orderBy(*order)
    e1 = (
        base.withColumn("__r1", F.row_number().over(salted_ext))
        .withColumn(
            "__cok", F.sum((~F.col("__nan")).cast("int")).over(salted_all)
        )
        .where(
            F.col("column").isin(*ext_set)
            & ~F.col("__nan")
            & (
                (F.col("__r1") <= n)
                | (F.col("__r1") > F.col("__cok") - n)
            )
        )
    )
    final_ext = Window.partitionBy("column").orderBy(*order)
    both = e1.withColumn("__r2", F.row_number().over(final_ext)).withColumn(
        "__c2", F.count(F.lit(1)).over(final_all)
    )
    mins = both.where(F.col("__r2") <= n).select(
        "column", "value", "count", F.lit("min").alias("end"),
        F.col("__r2").alias("rank"),
        F.lit(None).cast("long").alias("n_distinct"),
        F.lit(None).cast("long").alias("n_unique"),
    )
    maxs = both.where(F.col("__r2") > F.col("__c2") - n).select(
        "column", "value", "count", F.lit("max").alias("end"),
        (F.col("__c2") - F.col("__r2") + 1).alias("rank"),
        F.lit(None).cast("long").alias("n_distinct"),
        F.lit(None).cast("long").alias("n_unique"),
    )
    return tops.unionByName(mins).unionByName(maxs)


def frequency_summary(
    df: DataFrame,
    columns: list[str] | None = None,
    k: int = 10,
    n_extreme: int = 0,
    extreme_numeric: list[str] | None = None,
    extreme_cols: list[str] | None = None,
) -> tuple[
    dict[str, dict],
    dict[str, list[tuple[str, int]]],
    dict[str, dict[str, list[tuple[str, int]]]],
]:
    """Driver-side convenience: per column, exact ``n_distinct``/``n_unique``,
    the top-K value list, and (when ``n_extreme`` > 0) the bottom/top-``n_extreme``
    values by magnitude — all off ONE raw-table scan, in ONE action (r14:
    the top-k and extreme branches share their exchanges via runtime
    ReuseExchange, so the frequency table is shuffled once).

    ``extreme_cols`` semantics: ``None`` means rank every column; an empty list
    means the caller has no rankable (numeric/datetime) columns, so the extremes
    job is skipped entirely rather than ranking every categorical column and
    discarding the result.

    Returns ``({column: {n_distinct, n_unique}},
    {column: [(value, count), ...]},
    {column: {'min': [(value, count), ...], 'max': [...]}})``.
    """
    columns = df.columns if columns is None else columns
    # ONE raw-table scan producing the per-column counts, then ONE action:
    # the salted two-phase top-K (exact distinct/unique totals riding its
    # window shuffles) and the extreme-observation ranks run as two
    # branches over the SAME salted exchange (ReuseExchange), so the
    # frequency table is shuffled once — not once per job — and needs no
    # persist (r14; the two-job path equivalence is pinned in
    # test_semantics.py).
    #
    # Runtime guard (VERDICT r14 #4): the fusion's entire premise is
    # exchange reuse — with ``spark.sql.exchange.reuse=false`` the
    # un-persisted frequency table would be computed once PER BRANCH,
    # strictly worse than the persist+two-job shape. Detect that
    # configuration up front and fall back (bit-equal output both ways,
    # pinned by test_semantics.py::test_fused_pass2_fallback_without_reuse).
    skip_extremes = extreme_cols is not None and len(extreme_cols) == 0
    want_ext = n_extreme > 0 and not skip_extremes
    try:
        _reuse_ok = (
            str(
                df.sparkSession.conf.get("spark.sql.exchange.reuse", "true")
            ).lower()
            == "true"
        )
    except Exception:
        _reuse_ok = True
    if not _reuse_ok and want_ext:
        # persist + two jobs: the pre-r14 shape (one extra cache
        # materialization, but each branch reads the counts once)
        from pyspark import StorageLevel

        vc = value_counts_all(df, columns).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        try:
            top_rows = top_k_with_totals(vc, k).collect()
            evc = (
                vc.where(F.col("column").isin(*extreme_cols))
                if extreme_cols
                else vc
            )
            ext_rows = extreme_counts(
                evc, n_extreme, extreme_numeric or []
            ).collect()
        finally:
            vc.unpersist()
    else:
        vc = value_counts_all(df, columns)
        fused = _topk_extremes_fused(
            vc, k, n_extreme if want_ext else 0,
            extreme_numeric or [],
            (extreme_cols if extreme_cols is not None else columns)
            if want_ext else [],
        )
        all_rows = fused.collect()
        top_rows = [r for r in all_rows if r["end"] == "top"]
        ext_rows = [r for r in all_rows if r["end"] != "top"]
    scalars: dict[str, dict] = {
        c: {"n_distinct": 0, "n_unique": 0} for c in columns
    }
    tops: dict[str, list[tuple[str, int]]] = {c: [] for c in columns}
    for r in sorted(top_rows, key=lambda r: (r["column"], r["rank"])):
        tops[r["column"]].append((r["value"], r["count"]))
        scalars[r["column"]] = {
            "n_distinct": r["n_distinct"],
            "n_unique": r["n_unique"],
        }
    extremes: dict[str, dict[str, list[tuple[str, int]]]] = {}
    for r in sorted(ext_rows, key=lambda r: (r["column"], r["end"], r["rank"])):
        extremes.setdefault(r["column"], {"min": [], "max": []})[r["end"]].append(
            (r["value"], r["count"])
        )
    return scalars, tops, extremes


def grouped_top_k(
    df: DataFrame,
    group_col: str,
    columns: list[str],
    k: int = 5,
    salt_buckets: int = 64,
) -> DataFrame:
    """Top-K frequent values per (group, column) — the segment twin of
    :func:`top_k_all`: what are the most common event types per source, the
    dominant languages per domain, the top licenses per crawl snapshot.

    Shape: ONE melt + ONE (group, column, value) count exchange (map-side
    combined), then the same salted two-phase top-K as the global operator —
    first within (group, column, salt) so a hot segment cannot serialize on
    one partition, then among the ≤ k x salt_buckets survivors. Deterministic
    tie-break (count desc, value asc). Returns
    ``(group, column, value, count, rank)``."""
    if not columns:
        raise ValueError("columns must name at least one column")
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            S.col(c).cast("string").alias("value"),
        )
        for c in columns
    ]
    vc = (
        df.select(
            S.col(group_col).alias("group"),
            F.explode(F.array(*structs)).alias("kv"),
        )
        .select("group", "kv.column", "kv.value")
        .where(F.col("value").isNotNull())
        .groupBy("group", "column", "value")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    salted = Window.partitionBy("group", "column", "__salt").orderBy(
        F.desc("count"), F.asc("value")
    )
    final = Window.partitionBy("group", "column").orderBy(
        F.desc("count"), F.asc("value")
    )
    return (
        vc.withColumn("__salt", F.abs(F.hash("value")) % salt_buckets)
        .withColumn("__r1", F.row_number().over(salted))
        .where(F.col("__r1") <= k)
        .withColumn("rank", F.row_number().over(final))
        .where(F.col("rank") <= k)
        .drop("__salt", "__r1")
        .orderBy("group", "column", "rank")
    )


def _key_string(key_cols: list[str]):
    """The ONE key-canonicalization rule the shuffle diagnostics share
    (and their oracle SQL mirrors): cast to string, nulls render as the
    literal ``"null"``, composite keys join on ``"|"``."""
    return F.concat_ws(
        "|",
        *[
            F.coalesce(S.col(c).cast("string"), F.lit("null"))
            for c in key_cols
        ],
    )


def key_skew_profile(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 10,
    exact_quantiles: bool = True,
) -> DataFrame:
    """ONE-row shuffle-key diagnostics — the question every 100 TB
    join/groupBy plan should answer first: is this key skewed, and by how
    much? ``(n_rows, n_keys, max_count, p50_count, p95_count, mean_count,
    skew_ratio, top_share, top_keys)`` where ``skew_ratio`` =
    max group size / mean group size (1.0 = perfectly uniform; the
    factor by which the hottest task outweighs the average under hash
    partitioning), ``top_share`` = the hottest key's row fraction, and
    ``top_keys`` the ``top_n`` heaviest keys as a deterministic
    ``"key:count,..."`` string (string-typed so the driver's sort-based
    canonicalizer can hash it; nulls render as ``"null"``).

    Shape: one combine-friendly (key) count exchange — the same exchange
    the diagnosed groupBy would pay — then a 1-row stats collapse and a
    distributed top-N (TakeOrderedAndProject), crossJoined as two 1-row
    frames. ``exact_quantiles=False`` switches the group-size percentiles
    to GK sketches for corpora where |keys| itself is huge (the
    engine-wide exact/approx tier convention)."""
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    counts = (
        df.groupBy(_key_string(key_cols).alias("__k"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    if exact_quantiles:
        p50 = F.expr("percentile(__c, 0.5)")
        p95 = F.expr("percentile(__c, 0.95)")
    else:
        p50 = F.expr("approx_percentile(__c, 0.5, 10000)").cast("double")
        p95 = F.expr("approx_percentile(__c, 0.95, 10000)").cast("double")
    stats = counts.agg(
        F.sum("__c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("__c").alias("max_count"),
        F.round(p50, 4).alias("p50_count"),
        F.round(p95, 4).alias("p95_count"),
    )
    # deterministic top-N string: per-partition heads + one driver merge
    # (limit after orderBy = TakeOrderedAndProject, never a global sort),
    # then a sort_array fold so the rendering order is (count desc, key
    # asc) regardless of collect_list's partition order
    top = (
        counts.orderBy(F.desc("__c"), F.asc("__k"))
        .limit(top_n)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                (-F.col("__c")).alias("nc"),
                                F.col("__k").alias("k"),
                                F.col("__c").alias("c"),
                            )
                        )
                    ),
                    lambda s: F.concat_ws(
                        ":", s["k"], s["c"].cast("string")
                    ),
                ),
                ",",
            ).alias("top_keys")
        )
    )
    return stats.crossJoin(top).select(
        "n_rows",
        "n_keys",
        "max_count",
        "p50_count",
        "p95_count",
        F.round(F.col("n_rows") / F.col("n_keys"), 4).alias("mean_count"),
        # divide BEFORE multiplying: max_count * n_keys as long*long
        # overflows exactly on the pathological corpora this diagnostic
        # exists for (ANSI throws, legacy wraps negative); division first
        # moves the arithmetic to double
        F.round(
            F.col("max_count") / F.col("n_rows") * F.col("n_keys"), 4
        ).alias("skew_ratio"),
        F.round(F.col("max_count") / F.col("n_rows"), 4).alias("top_share"),
        "top_keys",
    )


def join_fanout_profile(
    left: DataFrame,
    right: DataFrame,
    left_key: list[str],
    right_key: list[str] | None = None,
) -> DataFrame:
    """ONE-row pre-join diagnostics — the other question a 100 TB join
    plan should answer first: how many rows will this join PRODUCE, and
    is any key explosive? ``(left_rows, right_rows, n_left_keys,
    n_right_keys, n_matched_keys, left_match_share, right_match_share,
    inner_rows, max_fanout, fanout_ratio)`` where ``inner_rows`` is the
    EXACT inner-join output size (Σ over matched keys of
    left_count × right_count — computed from the two bounded key-count
    tables, never by running the join), ``max_fanout`` the largest
    single-key contribution, and ``fanout_ratio`` = inner_rows /
    left_rows (how much the join multiplies the probe side; > 1 means
    row explosion).

    Shape: one combine-friendly count exchange per side — each the same
    exchange the real join would pay — then a key-count × key-count
    equi-join (cardinality = |keys|, not |rows|) collapsed to one row.
    Nulls render as the literal key ``"null"`` and therefore MATCH each
    other here, unlike a SQL equi-join — this operator reports key
    distribution overlap; a null-keyed row never matching in the real
    join is the first thing ``left_match_share`` tells you to check."""
    if not left_key:
        raise ValueError("left_key must name at least one column")
    if right_key is not None and not right_key:
        raise ValueError(
            "right_key must name at least one column (or None to reuse "
            "left_key)"
        )
    right_key = right_key or left_key

    def kc(df: DataFrame, keys: list[str], cname: str) -> DataFrame:
        return df.groupBy(_key_string(keys).alias("__k")).agg(
            F.count(F.lit(1)).alias(cname)
        )

    lc, rc = kc(left, left_key, "__cl"), kc(right, right_key, "__cr")
    j = lc.join(rc, "__k", "full_outer")
    both = F.col("__cl").isNotNull() & F.col("__cr").isNotNull()
    # products in DOUBLE: a 4B-row hot key on each side puts cl*cr past
    # Long.MAX (ANSI throws, legacy wraps negative) — exactly the
    # explosive join this diagnostic exists to catch. Double is exact to
    # 2^53 and degrades gracefully past it.
    prod = F.col("__cl").cast("double") * F.col("__cr")
    return j.agg(
        F.sum("__cl").alias("left_rows"),
        F.sum("__cr").alias("right_rows"),
        F.count("__cl").alias("n_left_keys"),
        F.count("__cr").alias("n_right_keys"),
        F.sum(both.cast("long")).alias("n_matched_keys"),
        F.sum(F.when(both, F.col("__cl")).otherwise(0)).alias(
            "__l_matched"
        ),
        F.sum(F.when(both, F.col("__cr")).otherwise(0)).alias(
            "__r_matched"
        ),
        F.round(
            F.coalesce(F.sum(F.when(both, prod)), F.lit(0.0)), 4
        ).alias("inner_rows"),
        F.round(
            F.coalesce(F.max(F.when(both, prod)), F.lit(0.0)), 4
        ).alias("max_fanout"),
    ).select(
        "left_rows",
        "right_rows",
        "n_left_keys",
        "n_right_keys",
        "n_matched_keys",
        F.round(F.col("__l_matched") / F.col("left_rows"), 4).alias(
            "left_match_share"
        ),
        F.round(F.col("__r_matched") / F.col("right_rows"), 4).alias(
            "right_match_share"
        ),
        "inner_rows",
        "max_fanout",
        F.round(F.col("inner_rows") / F.col("left_rows"), 4).alias(
            "fanout_ratio"
        ),
    )
