"""Sinks for pipeline outputs (deduplicated corpora, profile tables, pair
lists) with the layout controls that matter at scale.

The reference's only sinks are report artifacts (HTML/JSON/pickle — covered in
``report/``; reference: src/pandas_profiling/profile_report.py:345-430). A
corpus-scale engine also needs to MATERIALIZE results: these writers are thin,
declarative wrappers over ``DataFrameWriter`` that make the three
scale-critical choices explicit instead of implicit:

* **partition_by** — hive-style directory partitioning for downstream
  partition pruning (date/language/source buckets).
* **target_file_rows** — bounds output file count and size via
  ``maxRecordsPerFile`` so a 1000-executor write neither emits a million tiny
  files nor single multi-GB ones.
* **sort_within_partitions** — clusters rows inside each file so parquet
  min/max page stats actually prune (e.g. sort by doc_id for point lookups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pandas_profiling_personal_spark.functions import stats as S

_FORMATS = {"parquet", "orc", "json", "csv"}


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",
    partition_by: list[str] | None = None,
    sort_within_partitions: list[str] | None = None,
    target_file_rows: int | None = None,
    compression: str | None = None,
    **options,
) -> None:
    """Write ``df`` to ``path`` in ``fmt`` with explicit scale layout.

    ``partition_by`` columns become directory partitions; when given, the data
    is repartitioned on them first so each task writes to one directory
    (otherwise every task can open a file in every partition — the classic
    small-files explosion)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported sink format {fmt!r}; one of {sorted(_FORMATS)}")
    out = df
    if partition_by:
        out = out.repartition(*[S.col(c) for c in partition_by])
    if sort_within_partitions:
        out = out.sortWithinPartitions(*[S.col(c) for c in sort_within_partitions])
    writer = out.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if target_file_rows:
        writer = writer.option("maxRecordsPerFile", int(target_file_rows))
    if compression:
        writer = writer.option("compression", compression)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "error",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Persist ``df`` as a Hive-bucketed table (``bucketBy`` + optional
    ``sortBy`` via ``saveAsTable`` — bucketing metadata only exists for
    catalog tables, not path writes).

    This is THE Spark mechanism for amortizing a big join's shuffle across
    many downstream queries: two tables bucketed on the same key with the
    same bucket count join with ZERO exchange on either side (SortMergeJoin
    reads co-located buckets directly; asserted in
    tests/test_plan_quality.py::test_bucketed_join_has_no_exchange). At
    100 TB the fact-table shuffle is usually the single largest cost in the
    pipeline — bucketing the corpus once on ``doc_id`` makes every later
    dedup/keep-list/decontamination join shuffle-free on that side.

    ``sort_by`` additionally orders rows inside each bucket file so
    merge-joins skip their sort and parquet min/max pages prune point
    lookups."""
    if not bucket_by:
        raise ValueError("bucket_by must name at least one column")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    # one output task per bucket: without this every task writes a file per
    # bucket it sees — n_tasks x n_buckets small files. With directory
    # partitions on top, cluster by (partitions, buckets) so a task owns one
    # (directory, bucket) cell.
    cluster = [S.col(c) for c in (*(partition_by or ()), *bucket_by)]
    out = df.repartition(n_buckets, *cluster)
    writer = (
        out.write.format(fmt)
        .mode(mode)
        .bucketBy(n_buckets, *bucket_by)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.saveAsTable(table)


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str,
    n_shards: int,
    fmt: str = "parquet",
    mode: str = "error",
    **options,
) -> None:
    """Materialize a training-ready corpus: one global DETERMINISTIC shuffle
    (order and shard assignment are pure functions of ``md5(key)``) into
    exactly ``n_shards`` files.

    Training loaders want (a) documents in an order uncorrelated with
    ingestion order — md5 ordering is a seeded global shuffle that any
    engine reproduces, unlike ``df.orderBy(rand())`` whose result depends
    on partitioning; (b) a fixed shard count so epoch iteration and
    data-parallel assignment are stable. Cost: ONE hash-partitioned
    exchange + per-shard sort (``repartition(hash).sortWithinPartitions``
    — no global range sort; shard membership is already deterministic, so
    a total order across shards is unnecessary)."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = F.conv(
        F.substring(F.md5(S.col(key).cast("string")), 1, 15), 16, 10
    ).cast("long")
    # leading __shard in the sort satisfies the dynamic-partition writer's
    # required ordering, so it does NOT insert its own (order-destroying)
    # sort on the partition column
    out = (
        df.withColumn("__shard", (h % n_shards).cast("int"))
        .withColumn("__ord", h)
        .repartition(n_shards, F.col("__shard"))
        .sortWithinPartitions("__shard", "__ord")
        .drop("__ord")
    )
    writer = out.write.format(fmt).mode(mode).partitionBy("__shard")
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_deduplicated(
    df: DataFrame,
    keep_list: DataFrame,
    id_col: str,
    path: str,
    fmt: str = "parquet",
    **kwargs,
) -> None:
    """Materialize the deduplicated corpus: inner-join ``df`` against the
    ``keep=true`` rows of a :func:`~pandas_profiling_personal_spark.operators.
    dedup.dedup_keep_list` result and write it. The keep side is projected to
    the bare id (narrowest possible shuffle); the join strategy is left to
    AQE — the keep list is corpus-cardinality, so forcing a broadcast would be
    wrong at scale."""
    from pyspark.sql import functions as F

    keep = keep_list.where(F.col("keep")).select(
        S.col(id_col).alias("__keep_id")
    )
    kept = df.join(
        keep, S.col(id_col) == F.col("__keep_id"), "inner"
    ).drop("__keep_id")
    write_table(kept, path, fmt=fmt, **kwargs)
