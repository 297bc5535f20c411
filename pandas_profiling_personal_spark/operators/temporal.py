"""Temporal alignment operators: as-of join and interval (range) join.

The reference is a single-table profiler and has neither (SURVEY.md §2.8 —
no window functions at all, `model/` has no join of any kind); these are
the two standard temporal operators a training-data pipeline needs:
attach the latest feature/state snapshot to each event (as-of), and land
points inside validity/session/maintenance windows (range). Both are
built to avoid the plan Catalyst would pick for the naive formulation —
an inequality-only join condition compiles to BroadcastNestedLoopJoin,
which is quadratic and does not survive 100 TB.

* ``asof_join`` — the union-tag trick: NO join at all. Tag right rows as
  snapshots, union them with the left rows, and carry the latest snapshot
  forward with ``last(ignorenulls=True)`` over a per-key (ts, side)
  window. ONE shuffle on the key, each key's timeline sorts within its
  partition (no global sort), zero row explosion no matter how many
  events share a key or how many snapshots precede one event. Matches
  DuckDB/pandas ``merge_asof`` semantics: backward = latest right ts
  <= left ts (inclusive), forward = earliest right ts >= left ts,
  nearest = closer of the two with ties going backward (the pandas
  rule; both fills reuse the one exchange).

* ``range_join`` — bucketize the point axis: explode each right interval
  over the fixed-width buckets it covers, equi-join on (keys..., bucket),
  then apply the exact bound predicate as a residual filter. The join is
  a plain shuffled/broadcast hash join; per-pair output is exact with NO
  dedup pass because a (point, interval) pair can only meet in one bucket
  — the point's own. Bucket width defaults to the widest interval (one
  cheap 1-row aggregate), so every interval explodes to at most 2 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def _is_ts(df: DataFrame, col: str) -> bool:
    f = df.schema[col].dataType
    return isinstance(f, (T.TimestampType, T.TimestampNTZType, T.DateType))


def _as_num(df: DataFrame, col: str):
    """Order-preserving numeric view of a point/bound column: epoch
    microseconds for timestamps/dates, the value itself for numerics."""
    c = F.col(col)
    if _is_ts(df, col):
        return F.unix_micros(c.cast("timestamp"))
    return c


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Attach the nearest preceding (``backward``), following
    (``forward``), or closest-either-way (``nearest``, ties backward —
    the pandas merge_asof rule) right-side row to every left row, per
    ``by`` key.

    Contract (same as DuckDB ASOF JOIN / pandas merge_asof):
    equality on ``by``, inclusive inequality on ``on``; left rows with no
    eligible snapshot keep NULL value columns (left-join shape). The right
    side should be unique per (by, on) — with duplicates, the row ordered
    last among the ties wins, deterministically only if the value columns
    are functionally dependent on (by, on).

    ``by`` is required: the per-key window is what makes this ONE shuffle
    with no global sort. For a keyless as-of against a SMALL snapshot
    table, add a constant key to both sides — the single partition it
    produces is then a deliberate, visible choice.

    ``tolerance_s``: maximum allowed |left.on - right.on|, in seconds for
    timestamp columns and in the column's own units for numerics; matches
    beyond it are nulled (the row survives, left-join shape).
    """
    if isinstance(by, str):
        by = [by]
    if not by:
        raise ValueError(
            "asof_join: 'by' must name at least one equality key — a "
            "keyless as-of would be a single-partition global sort; add "
            "a constant key explicitly if the right side is small"
        )
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "asof_join: direction must be backward|forward|nearest"
        )
    vals = value_cols or [c for c in right.columns if c not in [*by, on]]
    missing = [c for c in [*by, on, *vals] if c not in right.columns]
    if missing:
        raise ValueError(f"asof_join: right side lacks {missing}")
    reserved = {"__snap", "__side", "__ts"}
    clash = reserved & set(left.columns) | reserved & set(vals)
    if clash:
        raise ValueError(
            f"asof_join: column names {sorted(clash)} are reserved by the "
            "union-tag plan — rename them first"
        )

    # the snapshot payload rides the union as ONE struct column so the
    # window carries it forward atomically (value cols + the matched ts,
    # which the tolerance check and `matched_ts` output need)
    snap = F.struct(
        F.col(on).alias("__ts"), *[F.col(c) for c in vals]
    ).alias("__snap")
    # null-ts and null-key rows must not participate in matching (DuckDB
    # ASOF / pandas merge_asof semantics: a NULL comparison is no match,
    # and NULL by-keys match nothing — whereas a Spark window PARTITIONS
    # null keys together): null-ts snapshots would sort FIRST under
    # ascending order and be carried into every later event; null-ts /
    # null-key left rows get their snap nulled below
    r_ok = F.col(on).isNotNull()
    for c in by:
        r_ok = r_ok & F.col(c).isNotNull()
    r = (
        right.where(r_ok)
        .select(*[F.col(c) for c in by], F.col(on), snap)
        .withColumn("__side", F.lit(0))
    )
    l = left.withColumn("__side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    ts = F.col(on)

    def _w(desc: bool):
        order = (
            [ts.desc(), F.col("__side").asc()]
            if desc
            else [ts.asc(), F.col("__side").asc()]
        )
        return (
            Window.partitionBy(*[F.col(c) for c in by])
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    if direction in ("backward", "forward"):
        w = _w(desc=direction == "forward")
        filled = u.withColumn(
            "__snap", F.last("__snap", ignorenulls=True).over(w)
        )
    else:
        # nearest: both fills over the SAME hash partitioning (Catalyst
        # reuses the exchange; the second ordering adds one sort, not a
        # second shuffle), then pick the closer; ties go backward — the
        # pandas merge_asof rule
        here = _as_num(u, on)
        back = F.last("__snap", ignorenulls=True).over(_w(desc=False))
        fwd = F.last("__snap", ignorenulls=True).over(_w(desc=True))
        u = u.withColumn("__b", back).withColumn("__f", fwd)

        def _dist(snap_col):
            there = (
                F.unix_micros(snap_col["__ts"].cast("timestamp"))
                if _is_ts(left, on)
                else snap_col["__ts"]
            )
            return F.abs(here - there)

        chosen = (
            F.when(F.col("__b").isNull(), F.col("__f"))
            .when(F.col("__f").isNull(), F.col("__b"))
            .when(
                _dist(F.col("__b")) <= _dist(F.col("__f")), F.col("__b")
            )
            .otherwise(F.col("__f"))
        )
        filled = u.withColumn("__snap", chosen).drop("__b", "__f")
    l_ok = ts.isNotNull()
    for c in by:
        l_ok = l_ok & F.col(c).isNotNull()
    filled = filled.where(F.col("__side") == 1).withColumn(
        "__snap", F.when(l_ok, F.col("__snap"))
    )

    if tolerance_s is not None:
        here = _as_num(filled, on)
        there = (
            F.unix_micros(F.col("__snap.__ts").cast("timestamp"))
            if _is_ts(left, on)
            else F.col("__snap.__ts")
        )
        unit = 1_000_000 if _is_ts(left, on) else 1
        filled = filled.withColumn(
            "__snap",
            F.when(
                F.abs(here - there) <= F.lit(tolerance_s * unit),
                F.col("__snap"),
            ),
        )

    out_names = set(left.columns)
    keep = [F.col(c) for c in left.columns]
    for c in vals:
        name = c + suffix if c in out_names else c
        keep.append(F.col(f"__snap.{c}").alias(name))
    keep.append(
        F.col("__snap.__ts").alias(
            "matched_" + on if on in out_names else "matched_ts"
        )
    )
    return filled.select(*keep)


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    by: list[str] | None = None,
    bucket_width: float | None = None,
    closed: str = "[)",
    how: str = "inner",
    max_buckets_per_interval: int = 4096,
) -> DataFrame:
    """Join left points into right intervals: ``lo <= point < hi`` (bounds
    per ``closed``: one of ``[)``, ``[]``, ``()``, ``(]``), plus equality
    on the optional ``by`` keys.

    Bucketization makes the inequality join an EQUI-join: each interval
    is exploded over the fixed-width buckets it covers, each point joins
    on its single bucket, and the exact bound predicate runs as a residual
    filter on the hash-join output. No dedup pass is needed — a
    (point, interval) pair can only meet in the point's own bucket.

    ``bucket_width`` (point-column units; microseconds for timestamps)
    defaults to the widest right interval, computed with one 1-row
    aggregate — every interval then covers at most 2 buckets. Pass it
    explicitly when one outlier interval would coarsen the buckets for
    everyone. Intervals wider than ``max_buckets_per_interval`` buckets
    raise (naming the fix) instead of silently exploding the right side.
    """
    if closed not in ("[)", "[]", "()", "(]"):
        raise ValueError("range_join: closed must be one of [) [] () (]")
    if how not in ("inner", "left"):
        raise ValueError("range_join: how must be inner|left")
    by = list(by or [])
    if "__bucket" in left.columns or "__bucket" in right.columns:
        raise ValueError(
            "range_join: the column name __bucket is reserved by the "
            "bucketized plan — rename it first"
        )

    p = _as_num(left, point_col)
    lo = _as_num(right, lo_col)
    hi = _as_num(right, hi_col)

    auto_width = bucket_width is None
    if auto_width:
        row = right.agg(
            F.max(hi - lo).alias("w"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        if row["n"] == 0 or row["w"] is None or row["w"] <= 0:
            bucket_width = 1
        else:
            bucket_width = int(row["w"])
    width = F.lit(bucket_width)

    lb = F.floor(lo / width)
    hb = F.floor(hi / width)
    if not auto_width:
        # loud guard, not a silent explosion: one huge interval at a small
        # EXPLICIT width would fan out to millions of bucket rows. The
        # auto width is the widest interval, so fan-out <= 2 by
        # construction — no guard job needed there.
        guard = right.agg(F.max(hb - lb).alias("m")).collect()[0]["m"]
        if guard is not None and guard + 1 > max_buckets_per_interval:
            raise ValueError(
                f"range_join: an interval covers {int(guard) + 1} buckets "
                f"of width {bucket_width} (cap {max_buckets_per_interval})"
                " — raise bucket_width, split the outlier interval, or "
                "raise max_buckets_per_interval explicitly"
            )

    rexp = right.withColumn(
        "__bucket", F.explode(F.sequence(lb.cast("long"), hb.cast("long")))
    )
    lpt = left.withColumn("__bucket", F.floor(p / width).cast("long"))

    def _num(dfref, base_df, col):
        c = dfref[col]
        if _is_ts(base_df, col):
            return F.unix_micros(c.cast("timestamp"))
        return c

    # residual bound predicate on UNAMBIGUOUS refs (left and right may
    # legitimately share column names)
    pj = _num(lpt, left, point_col)
    loj = _num(rexp, right, lo_col)
    hij = _num(rexp, right, hi_col)
    lo_ok = pj >= loj if closed[0] == "[" else pj > loj
    hi_ok = pj <= hij if closed[1] == "]" else pj < hij
    cond = [lpt["__bucket"] == rexp["__bucket"]] + [
        lpt[c] == rexp[c] for c in by
    ]
    joined = lpt.join(rexp, cond, "inner").where(lo_ok & hi_ok)

    # right payload columns: collisions with left names get suffixed,
    # never silently dropped
    rpairs = []
    for c in right.columns:
        if c in by:
            continue
        rpairs.append((c, c + "_right" if c in left.columns else c))
    out = joined.select(
        *[lpt[c] for c in left.columns],
        *[rexp[c].alias(name) for c, name in rpairs],
    )
    if how == "left":
        matched_keys = out.select(*[F.col(c) for c in left.columns])
        unmatched = left.exceptAll(matched_keys)
        for c, name in rpairs:
            unmatched = unmatched.withColumn(
                name, F.lit(None).cast(right.schema[c].dataType)
            )
        out = out.unionByName(unmatched)
    return out
