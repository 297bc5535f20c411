"""Data-layout advisor: turn profile statistics into partition / bucket /
salt recommendations for writing this table at scale.

The reference stops at describing data (its report never says what to DO
with a 100 TB table); every number this module consumes is exactly what the
profiler already measures — cardinality, null fraction, group skew — so the
advice tier costs ONE melt exchange for any number of candidate columns
(:func:`layout_stats`, the same shape as the all-column value_counts pass,
reference Spark path: model/summary_spark.py describe loop) and the rules
themselves are driver arithmetic over one row per column
(:func:`suggest_layout`).

Rule rationale (each is a documented scale failure mode):

* **partitionBy** wants a LOW-cardinality, rarely-null, unskewed column:
  every distinct value becomes a directory, so 10^6 distinct values is
  10^6 directories of tiny files (the small-file problem), nulls land in a
  default partition, and a dominant value makes one directory hold the
  table. Candidates are ranked by distance from an ideal partition count.
* **bucketBy** wants a HIGH-cardinality equi-join/groupBy key: bucketing
  pre-shuffles the table once at write time so later joins on that key are
  exchange-free; a low-cardinality key leaves buckets empty or lumpy.
  Bucket counts are powers of two sized from a target rows-per-bucket.
* **salting** is advised when a declared join key's max group outweighs the
  mean by more than ``salt_threshold``: under hash partitioning the hottest
  key's rows all land on one task, and AQE's skew-join split only rescues
  sort-merge joins — pre-salting (key, salt % N) is the portable fix.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from pandas_profiling_personal_spark.functions import stats as S


def layout_stats(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Per-column layout diagnostics in ONE exchange for ALL columns:
    ``(column, n_rows, n_null, n_distinct, max_group, mean_group,
    skew_ratio, top_share)``.

    ``n_distinct``/``max_group`` cover NON-NULL groups (nulls are reported
    separately — a partition column's nulls become the default partition,
    which the advisor penalizes explicitly). ``skew_ratio`` = max group /
    mean non-null group (1.0 = uniform); ``top_share`` = hottest value's
    fraction of non-null rows. All-null columns yield NULL skew fields
    rather than division errors.

    Shape: one explode melt (column_id, value) -> groupBy count with
    map-side combine — the value_counts exchange (operators/frequencies.py
    A1), reused because the advisor's inputs ARE frequency statistics —
    then a per-column rollup whose exchange carries only partial aggregates
    (|cols| keys, bytes not data). Exact counts by design: layout advice
    flips on order-of-magnitude boundaries, not ulps, but the oracle tier
    needs determinism and the data exchange is combine-friendly either
    way."""
    cols = columns if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("layout_stats: no columns")
    structs = [
        F.struct(
            F.lit(i).alias("cid"),
            S.col(c).cast("string").alias("v"),
        )
        for i, c in enumerate(cols)
    ]
    per_value = (
        df.select(F.explode(F.array(*structs)).alias("kv"))
        .select("kv.cid", "kv.v")
        .groupBy("cid", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_col = per_value.groupBy("cid").agg(
        F.sum("c").alias("n_rows"),
        F.sum(F.when(F.col("v").isNull(), F.col("c")).otherwise(0)).alias(
            "n_null"
        ),
        F.count(F.when(F.col("v").isNotNull(), 1)).alias("n_distinct"),
        F.max(F.when(F.col("v").isNotNull(), F.col("c"))).alias("max_group"),
    )
    name_expr = F.element_at(
        F.array(*[F.lit(c) for c in cols]), F.col("cid") + 1
    )
    nn = F.col("n_rows") - F.col("n_null")
    mean_group = F.when(
        F.col("n_distinct") > 0, nn / F.col("n_distinct")
    )
    return per_col.select(
        name_expr.cast("string").alias("column"),
        "n_rows",
        "n_null",
        "n_distinct",
        "max_group",
        F.round(mean_group, 4).alias("mean_group"),
        # divide before multiplying (the key_skew overflow note): max_group
        # * n_distinct can exceed long range exactly on the corpora this
        # diagnostic exists for
        F.round(
            F.col("max_group") / nn * F.col("n_distinct"), 4
        ).alias("skew_ratio"),
        F.round(F.col("max_group") / nn, 4).alias("top_share"),
    )


def _pow2_clamp(x: float, lo: int, hi: int) -> int:
    if x <= lo:
        return lo
    return int(min(hi, 2 ** round(math.log2(max(x, 1)))))


def suggest_layout(
    df: DataFrame,
    columns: list[str] | None = None,
    join_keys: list[str] | None = None,
    *,
    ideal_partitions: int = 1000,
    max_partitions: int = 10_000,
    partition_null_frac_max: float = 0.10,
    partition_skew_max: float = 10.0,
    target_rows_per_bucket: int = 1_000_000,
    target_bucket_mb: float | None = None,
    min_buckets: int = 4,
    max_buckets: int = 4096,
    salt_threshold: float = 4.0,
    max_salt: int = 64,
) -> dict:
    """Actionable write-layout advice from ONE :func:`layout_stats` pass
    (bounded driver transfer: one row per candidate column).

    ``target_bucket_mb`` sizes buckets by BYTES instead of rows — the unit
    that actually matters for file sizing at 100 TB (a 10-column table and
    a 500-column table at the same row count differ 50x in bytes/row):
    bytes-per-row comes free from Catalyst's optimizer statistics
    (:func:`...order_stats.size_estimate`, column-pruning aware, zero
    jobs). Falls back to the row target when the estimate is unavailable.

    Returns ``{"n_rows", "partition_by": [{column, n_distinct, null_frac,
    skew_ratio, reason}...], "rejected_partition": [...], "bucket_by":
    {column, n_buckets, reason} | None, "salt": [{column, skew_ratio,
    salt_factor, reason}...], "stats": [...], "notes": [...]}``.

    The rules are deterministic and documented (module docstring); the
    result is a recommendation artifact, not a side effect — feed it to
    ``sources.writers.write_table(partition_by=..., bucket_by=...)``.

    Already profiled the table? :func:`suggest_layout_from_profile` runs
    the same rules over a ``ProfileResult`` with ZERO additional scans;
    :func:`suggest_layout_from_state` over a saved ``PartialProfile``."""
    rows = [r.asDict() for r in layout_stats(df, columns).collect()]
    if target_bucket_mb is not None:
        from pandas_profiling_personal_spark.operators.order_stats import (
            size_estimate,
        )

        n_rows = max((r["n_rows"] for r in rows), default=0)
        total = size_estimate(df)
        if total and n_rows:
            bytes_per_row = total / n_rows
            target_rows_per_bucket = max(
                1, int(target_bucket_mb * 1024 * 1024 / bytes_per_row)
            )
    return _advise(
        rows,
        join_keys,
        ideal_partitions=ideal_partitions,
        max_partitions=max_partitions,
        partition_null_frac_max=partition_null_frac_max,
        partition_skew_max=partition_skew_max,
        target_rows_per_bucket=target_rows_per_bucket,
        min_buckets=min_buckets,
        max_buckets=max_buckets,
        salt_threshold=salt_threshold,
        max_salt=max_salt,
    )


def suggest_layout_from_profile(
    result,
    join_keys: list[str] | None = None,
    **thresholds,
) -> dict:
    """The same advice rules over an existing ``ProfileResult`` — ZERO
    additional Spark jobs: the profile already measured cardinality
    (``n_distinct``), null mass (``n_missing``), and the hottest group
    (``top_values[0].count`` — top-K is sorted by count, so its head IS the
    max group). Columns whose profile withholds top values (redact tier,
    or the near-unique frequency gate) get ``skew_ratio=None``; they are
    near-unique or redacted, so the partition rules reject or accept them
    on cardinality/nulls alone and the limitation is confined to columns
    that could not be partition keys anyway."""
    d = result.as_dict() if hasattr(result, "as_dict") else result
    n_rows = int(d["table"].get("n") or 0)
    rows = []
    for name, v in d["variables"].items():
        n_missing = int(v.get("n_missing") or 0)
        nn = n_rows - n_missing
        nd = v.get("n_distinct")
        top = v.get("top_values") or []
        max_group = None
        if top and top[0].get("count") is not None:
            max_group = int(top[0]["count"])
        rows.append({
            "column": name,
            "n_rows": n_rows,
            "n_null": n_missing,
            "n_distinct": int(nd) if nd is not None else None,
            "max_group": max_group,
            "mean_group": (
                round(nn / nd, 4) if nd else None
            ),
            "skew_ratio": (
                round(max_group / nn * nd, 4)
                if max_group is not None and nd and nn
                else None
            ),
            "top_share": (
                round(max_group / nn, 4)
                if max_group is not None and nn
                else None
            ),
        })
    return _advise(rows, join_keys, **thresholds)


def suggest_layout_from_state(
    part,
    join_keys: list[str] | None = None,
    spark=None,
    **thresholds,
) -> dict:
    """The advice rules over a saved ``PartialProfile`` — completes the
    advisor's operating-mode matrix (scan / profile / STATE, the checks_of
    pattern): yesterday's persisted state prices today's write layout
    without touching the data.

    Cardinality comes from each column's HLL sketch (one tiny ``spark``
    job over sketch literals, rows never rescanned; columns without a
    sketch fall back to ``len(top_values)`` as a lower bound when the
    tracked top list is the whole support, else unknown). ``max_group``
    is the head of the state's mergeable ``top_values`` — approximate
    after merges (a shard-local tail value can be undercounted), which
    only softens the skew gates, never the cardinality/null gates."""
    sketch_cols = [
        c for c, cs in part.columns.items()
        if cs.hll or (part._pending.get(c) or {}).get("hll")
    ]
    estimates: dict[str, float] = {}
    if sketch_cols:
        if spark is None:
            raise ValueError(
                "suggest_layout_from_state: cardinality evaluates from "
                "HLL sketches — pass the SparkSession"
            )
        exprs = []
        for i, c in enumerate(sketch_cols):
            cs = part.columns[c]
            hlls = list((part._pending.get(c) or {}).get("hll") or [])
            if cs.hll:
                hlls.append(cs.hll)
            e = F.lit(hlls[0])
            for x in hlls[1:]:
                e = F.hll_union(e, F.lit(x))
            exprs.append(F.hll_sketch_estimate(e).alias(f"s{i}"))
        row = spark.range(1).select(*exprs).collect()[0]
        estimates = {c: row[i] for i, c in enumerate(sketch_cols)}
    rows = []
    for name, cs in part.columns.items():
        nn = cs.count
        nd = estimates.get(name)
        if nd is None:
            # no sketch: an all-null column has 0 distinct; a tracked top
            # list that accounts for EVERY non-null row is the complete
            # support, so its length is the exact count (the
            # drift_between_partials completeness rule) — anything else
            # stays unknown rather than guessing a lower bound
            nd = 0 if nn == 0 else (
                len(cs.top_values)
                if cs.top_values and sum(cs.top_values.values()) == nn
                else None
            )
        else:
            nd = int(round(nd))
        max_group = max(cs.top_values.values()) if cs.top_values else None
        rows.append({
            "column": name,
            "n_rows": cs.n_rows,
            "n_null": cs.n_missing,
            "n_distinct": nd,
            "max_group": max_group,
            "mean_group": round(nn / nd, 4) if nd else None,
            "skew_ratio": (
                round(max_group / nn * nd, 4)
                if max_group is not None and nd and nn
                else None
            ),
            "top_share": (
                round(max_group / nn, 4)
                if max_group is not None and nn
                else None
            ),
        })
    return _advise(rows, join_keys, **thresholds)


def _advise(
    rows: list[dict],
    join_keys: list[str] | None,
    *,
    ideal_partitions: int = 1000,
    max_partitions: int = 10_000,
    partition_null_frac_max: float = 0.10,
    partition_skew_max: float = 10.0,
    target_rows_per_bucket: int = 1_000_000,
    min_buckets: int = 4,
    max_buckets: int = 4096,
    salt_threshold: float = 4.0,
    max_salt: int = 64,
) -> dict:
    rows = sorted(rows, key=lambda r: r["column"])
    n_rows = max((r["n_rows"] for r in rows), default=0)
    join_keys = list(join_keys or [])
    known = {r["column"] for r in rows}
    missing = [k for k in join_keys if k not in known]
    if missing:
        raise ValueError(
            f"suggest_layout: join_keys not in profiled columns: {missing}"
        )

    candidates, rejected = [], []
    for r in rows:
        nn = r["n_rows"] - r["n_null"]
        null_frac = (r["n_null"] / r["n_rows"]) if r["n_rows"] else None
        nd = r["n_distinct"]
        why = None
        if nd is None:
            why = "cardinality unavailable"
        elif nn == 0 or nd == 0:
            why = "all null"
        elif nd < 2:
            why = "constant"
        elif nd > max_partitions:
            why = (
                f"{nd} distinct values -> {nd} directories "
                f"(> max_partitions={max_partitions}: small-file problem)"
            )
        elif null_frac is not None and null_frac > partition_null_frac_max:
            why = (
                f"{null_frac:.1%} null -> oversized default partition"
            )
        elif (r["skew_ratio"] or 0) > partition_skew_max:
            why = (
                f"skew_ratio {r['skew_ratio']} -> dominant value owns "
                "one directory"
            )
        entry = {
            "column": r["column"],
            "n_distinct": nd,
            "null_frac": round(null_frac, 4) if null_frac is not None else None,
            "skew_ratio": r["skew_ratio"],
        }
        if why is None:
            # skew_ratio is None on the profile path when top_values were
            # withheld/redacted — still a candidate (documented limitation)
            # but say so instead of rendering a misleading "skew None"
            skew_note = (
                "skew unknown (top values withheld)"
                if r["skew_ratio"] is None
                else f"skew {r['skew_ratio']}"
            )
            entry["reason"] = (
                f"{nd} distinct, {entry['null_frac']:.1%} null, "
                f"{skew_note}"
            )
            candidates.append(entry)
        else:
            entry["reason"] = why
            rejected.append(entry)
    # rank by closeness (in decades) to the ideal partition count
    candidates.sort(
        key=lambda e: (
            abs(math.log10(e["n_distinct"]) - math.log10(ideal_partitions)),
            e["column"],
        )
    )

    bucket = None
    bucket_pool = join_keys or [
        r["column"]
        for r in rows
        if r["n_distinct"] and r["n_distinct"] >= 100
    ]
    bucket_rows = [r for r in rows if r["column"] in bucket_pool]
    # highest-cardinality key buckets best (ties: name, for determinism)
    bucket_rows.sort(key=lambda r: (-(r["n_distinct"] or 0), r["column"]))
    if bucket_rows and (bucket_rows[0]["n_distinct"] or 0) >= min_buckets:
        b = bucket_rows[0]
        n_buckets = _pow2_clamp(
            n_rows / target_rows_per_bucket, min_buckets, max_buckets
        )
        bucket = {
            "column": b["column"],
            "n_buckets": n_buckets,
            "reason": (
                f"{b['n_distinct']} distinct"
                + (" (declared join key)" if join_keys else "")
                + f"; {n_rows} rows / {target_rows_per_bucket}/bucket "
                f"-> {n_buckets} buckets (pow2): equi-joins on it become "
                "exchange-free"
            ),
        }

    salts = []
    for k in join_keys:
        r = next(x for x in rows if x["column"] == k)
        sr = r["skew_ratio"]
        if sr is not None and sr > salt_threshold:
            factor = int(min(max_salt, max(2, math.ceil(sr))))
            salts.append({
                "column": k,
                "skew_ratio": sr,
                "salt_factor": factor,
                "reason": (
                    f"hottest key x{sr} the mean group: shuffle on "
                    f"(key, rand % {factor}) + two-phase aggregate, or "
                    "rely on AQE skew-join for sort-merge joins"
                ),
            })

    notes = [
        "enable spark.sql.adaptive.enabled (AQE) — runtime coalescing "
        "fixes partition-count estimates this advice gets wrong",
        "target 128-1024 MiB per written file "
        "(spark.sql.files.maxRecordsPerFile caps rows per file)",
    ]
    return {
        "n_rows": n_rows,
        "partition_by": candidates,
        "rejected_partition": rejected,
        "bucket_by": bucket,
        "salt": salts,
        "stats": rows,
        "notes": notes,
    }


def apply_layout(
    df: DataFrame,
    advice: dict,
    *,
    path: str | None = None,
    table: str | None = None,
    fmt: str = "parquet",
    mode: str = "error",
    **options,
) -> dict:
    """Execute a :func:`suggest_layout` recommendation: the glue between the
    advisor artifact and the scale-aware writers.

    Exactly one of ``path`` / ``table`` must be given — bucketing metadata
    only exists for catalog tables (``saveAsTable``), so a ``table``
    destination applies BOTH the partition and bucket advice while a
    ``path`` destination applies the partition advice only (and says so in
    the returned summary, rather than silently dropping the bucket half).
    Salting advice is never auto-applied: it rewrites the key column, which
    is a query-side contract the caller must opt into.

    Returns ``{"destination", "partition_by", "bucket_by", "n_buckets",
    "skipped"}`` — the layout actually written."""
    from pandas_profiling_personal_spark.sources.writers import (
        write_bucketed_table,
        write_table,
    )

    if (path is None) == (table is None):
        raise ValueError("apply_layout: give exactly one of path= / table=")
    part = [advice["partition_by"][0]["column"]] if advice.get(
        "partition_by") else None
    bucket = advice.get("bucket_by")
    skipped: list[str] = []
    if advice.get("salt"):
        skipped.append(
            "salt advice for "
            + ", ".join(s["column"] for s in advice["salt"])
            + " (rewrites the key column — apply in the consuming query)"
        )
    if table is not None:
        if bucket:
            write_bucketed_table(
                df, table, [bucket["column"]], bucket["n_buckets"],
                sort_by=[bucket["column"]], fmt=fmt, mode=mode,
                partition_by=part, **options,
            )
        else:
            df.write.format(fmt).mode(mode).partitionBy(
                *(part or [])).saveAsTable(table, **options)
        return {
            "destination": table, "partition_by": part,
            "bucket_by": [bucket["column"]] if bucket else None,
            "n_buckets": bucket["n_buckets"] if bucket else None,
            "skipped": skipped,
        }
    if bucket:
        skipped.append(
            f"bucket advice ({bucket['column']} x {bucket['n_buckets']}) — "
            "bucketing needs a catalog table; pass table= to apply it"
        )
    write_table(df, path, fmt=fmt, mode=mode, partition_by=part, **options)
    return {
        "destination": path, "partition_by": part,
        "bucket_by": None, "n_buckets": None, "skipped": skipped,
    }
