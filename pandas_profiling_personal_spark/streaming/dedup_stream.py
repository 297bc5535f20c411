"""Streaming deduplication — the training-data dedup operators on unbounded
input.

The reference is strictly batch (SURVEY.md §2.12). Structured Streaming gives
the pieces a first-seen-wins corpus dedup needs:

* fingerprints and MinHash signatures are STATELESS per-row expressions here —
  the signature is folded over the document's own shingle array with
  higher-order functions instead of the batch engine's explode + groupBy
  (:func:`...operators.dedup.minhash_signatures`), so no shuffle and no state
  store is involved in computing them. Values are bit-identical to the batch
  operator (unit-asserted), so batch backfills and the stream agree.
* the keep/drop decision is Spark's own watermarked stateful dedup
  (``dropDuplicatesWithinWatermark``), which bounds the state store by event
  time — the built-in-first alternative to a hand-rolled
  ``applyInPandasWithState`` keyed on fingerprint. Without a timestamp column
  it falls back to global-state ``dropDuplicates`` (exact, state grows with
  distinct fingerprints — backfill/test tier).

At 100 TB/day the state store holds one (fingerprint) key per distinct
document seen inside the watermark horizon — the same bound a batch
exact-dedup's shuffle would carry, amortized over time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from pandas_profiling_personal_spark.functions import stats as S
from pandas_profiling_personal_spark.operators.dedup import (
    MINHASH_PRIME,
    minhash_params,
    word_shingles,
)
from pandas_profiling_personal_spark.operators.text import normalize_text


def fingerprint(text: Column) -> Column:
    """md5 fingerprint of normalized text — same definition as the batch
    :func:`...operators.dedup.exact_duplicates` groups on."""
    return F.md5(normalize_text(text))


def minhash_signature_array(
    text: Column, num_hashes: int = 16, shingle_k: int = 3, seed: int = 42
) -> Column:
    """MinHash signature as an ``array<bigint>`` computed per row with
    higher-order functions — no explode, no groupBy, stream-safe.

    Equivalent to the batch signature: min over the document's distinct
    shingles of ``(a_i * h(shingle) + b_i) mod p`` with the md5-derived
    ``h`` (:func:`...operators.dedup.portable_hash64` definition inlined so
    the whole expression stays a single projection)."""
    shingles = F.filter(
        F.array_distinct(word_shingles(text, shingle_k)), lambda s: s != ""
    )
    h = lambda s: (  # noqa: E731 — portable_hash64(s) % MINHASH_PRIME
        F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
        % MINHASH_PRIME
    )
    # hash every shingle ONCE, then bind the hashed array as a lambda
    # variable: the naive form re-evaluated the shingle array (tokenize +
    # slide + distinct) AND the md5 in every one of the H min-folds — H x
    # the work per row (see dedup.word_shingles for the measured economics)
    hashed = F.transform(shingles, h)

    def build(hs: Column) -> Column:
        return F.array(
            *[
                F.array_min(
                    F.transform(
                        hs, lambda x: (F.lit(a) * x + F.lit(b)) % MINHASH_PRIME
                    )
                )
                for a, b in minhash_params(num_hashes, seed)
            ]
        )

    return F.element_at(F.transform(F.array(hashed), build), 1)


def exact_dedup_stream(
    df: DataFrame,
    text_col: str,
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-seen-wins exact dedup of a (streaming or batch) DataFrame.

    Adds a ``fingerprint`` column and keeps one row per fingerprint. With
    ``ts_col`` on a stream, state is bounded by the watermark horizon
    (``dropDuplicatesWithinWatermark``): a duplicate arriving later than
    ``watermark`` after the original may be re-emitted — the documented trade
    for bounded state on unbounded input. Without ``ts_col``: global-state
    ``dropDuplicates`` (exact; state grows with distinct fingerprints)."""
    out = df.withColumn("fingerprint", fingerprint(S.col(text_col)))
    if ts_col is not None and out.isStreaming:
        return out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["fingerprint"]
        )
    return out.dropDuplicates(["fingerprint"])


def signature_stream(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, fingerprint, minhash array<bigint>) as a stateless projection —
    composable with any downstream streaming sink/join; at 100 TB this is
    pure map-side work with zero shuffle."""
    return df.select(
        S.col(id_col),
        fingerprint(S.col(text_col)).alias("fingerprint"),
        minhash_signature_array(
            S.col(text_col), num_hashes, shingle_k, seed
        ).alias("minhash"),
    )


def exact_dedup_stream_vs_store(
    df: DataFrame,
    text_col: str,
    fp_store: DataFrame,
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-seen-wins exact dedup of a stream AGAINST A PERSISTED
    HISTORY: the streaming half of the daily-incremental mode
    (:func:`...operators.dedup.incremental_exact_dedup` is the batch
    half and :func:`...operators.dedup.dedup_store_update` maintains the
    store both read).

    Two stages, both built-in: a stream-static LEFT ANTI join against the
    store's fingerprint column (documents history already kept never
    enter the stream's state store — the static side is re-read per
    micro-batch, so a store table that grows during the run is picked
    up), then the watermarked within-stream dedup of
    :func:`exact_dedup_stream`. Fingerprints use the batch sentinel rule
    (null text → ``"\\x00null"``) so a null-text doc kept in history
    suppresses streaming null-text docs exactly like any other
    fingerprint.

    At 100 TB of history the anti join is the reason this scales: state
    holds only fingerprints seen ON THE STREAM inside the watermark
    horizon; history stays in the store table (bucket it on
    ``fingerprint`` via ``write_bucketed_table`` and the static side
    reads co-located buckets)."""
    out = df.withColumn(
        "fingerprint",
        F.coalesce(fingerprint(S.col(text_col)), F.lit("\x00null")),
    )
    # no dedup on the static side: a LEFT ANTI join is unaffected by
    # duplicate right-side keys, and a per-micro-batch HashAggregate over
    # the full history store would be pure wasted work (review r6)
    out = out.join(
        fp_store.select("fingerprint"), "fingerprint", "left_anti"
    )
    if ts_col is not None and out.isStreaming:
        return out.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(["fingerprint"])
    return out.dropDuplicates(["fingerprint"])


def near_dup_stream_vs_store(
    df: DataFrame,
    sig_store: DataFrame,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    min_est_jaccard: float = 0.8,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Suppress documents that are MinHash NEAR-duplicates of a persisted
    SIGNATURE store — the streaming half of incremental near-dup
    (:func:`...operators.dedup.incremental_minhash_dedup` is the batch half
    and shares the store layout: ``(doc_id, m0..m{H-1})``, one row per
    historical doc, kept or dropped).

    Built-ins only, append-mode safe on a stream: the signature is the
    stateless per-row :func:`minhash_signature_array` (bit-identical to the
    batch operator), each of the ``bands`` LSH band buckets becomes a
    per-row md5 column (same bucket definition as
    :func:`...operators.dedup.band_table` — they can never silently
    disagree), and history suppression is ``bands`` successive stream-static
    LEFT ANTI equi-joins on the bucket key, each carrying the
    signature-estimated-Jaccard >= ``min_est_jaccard`` verify as a join
    residual. A document survives iff NO historical signature shares a band
    bucket at estimated similarity.

    Semantics note: this is the STREAM rule — history wins, regardless of
    id order (the same first-seen-wins rule as
    :func:`exact_dedup_stream_vs_store`). The batch incremental operator
    instead drops only against LOWER-id partners, so the two agree exactly
    when ids are assigned in arrival order (the normal log/crawl case); a
    stream doc with an id SMALLER than its historical near-dup is
    suppressed here but kept by the batch run. On a stream "the store saw
    it first" is the meaningful order — arrival, not id.

    WITHIN-STREAM near-dups are NOT suppressed here: near-dup is not an
    equality key, so no built-in watermarked state can bound it
    (``dropDuplicatesWithinWatermark`` handles the exact tier only). For
    full two-step parity with the batch incremental operator — including
    within-batch and cross-batch stream near-dups and store maintenance —
    use :func:`minhash_dedup_foreach_batch`.

    100 TB shape: signatures are pure map-side work; each anti join is an
    equi-join on one band's bucket (the static side is re-read per
    micro-batch — persist the store as a table so that read is a bounded
    columnar scan of H ints + id per historical doc). Only the stream side
    shuffles, ``bands`` times, on the bucket key; state stays empty.
    Documents with no shingles (null/empty text) have no near-dup identity
    and PASS THROUGH (their all-null signature matches nothing) — route
    them through the exact tier, whose null sentinel covers them."""
    r = num_hashes // bands
    assert r * bands == num_hashes, "bands must divide num_hashes"
    sig_cols = [f"m{i}" for i in range(num_hashes)]
    out = df.withColumn(
        "minhash",
        minhash_signature_array(S.col(text_col), num_hashes, shingle_k, seed),
    )
    for j in range(bands):
        out = out.withColumn(
            f"__b{j}",
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at("minhash", j * r + i + 1)
                        for i in range(r)
                    ],
                )
            ),
        )
    est = (
        sum(
            (F.element_at(F.col("minhash"), i + 1) == F.col(f"m{i}")).cast(
                "int"
            )
            for i in range(num_hashes)
        )
        / F.lit(float(num_hashes))
    )
    for j in range(bands):
        store_j = sig_store.select(
            F.md5(
                F.concat_ws(",", *[F.col(f"m{j * r + i}") for i in range(r)])
            ).alias("__bucket"),
            *sig_cols,
        )
        out = out.join(
            store_j,
            (F.col(f"__b{j}") == store_j["__bucket"])
            & (est >= F.lit(min_est_jaccard)),
            "left_anti",
        )
    return out.drop(*[f"__b{j}" for j in range(bands)])


def minhash_dedup_foreach_batch(
    store_path: str,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    **minhash_kwargs,
):
    """``foreachBatch`` processor giving a stream FULL parity with the batch
    incremental near-dup: each micro-batch runs
    :func:`...operators.dedup.incremental_minhash_dedup` against the
    persisted signature store, appends ALL of its signatures (kept or
    dropped — the greedy sweep needs both) back to the store, and writes the
    ``(doc_id, keep, dup_of)`` flags to ``out_path``. By construction the
    result equals the batch two-step run whose shards are the micro-batches
    — within-batch, cross-batch and vs-history near-dups included
    (pytest-gated; the batch operator's ``max_bucket_size`` cap
    qualification applies across micro-batches exactly as across shards).

    Both writes land in ``batch=<id>`` subdirectories with overwrite, so a
    retried micro-batch replaces its own output instead of duplicating
    store signatures (exactly-once under foreachBatch's at-least-once
    contract). Wire it up::

        q = (stream.writeStream
             .foreachBatch(minhash_dedup_foreach_batch(store, out))
             .option("checkpointLocation", ckpt).start())
    """
    from pandas_profiling_personal_spark.operators.dedup import (
        incremental_minhash_dedup,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        try:
            store = spark.read.parquet(store_path)
        except AnalysisException as exc:
            # ONLY path-not-found means "first micro-batch: no store yet";
            # any other failure (permissions, corrupt footer) must fail the
            # batch — silently deduping against empty history would write
            # wrong keep flags permanently (review r7)
            if "PATH_NOT_FOUND" not in str(exc):
                raise
            store = None
        if store is not None:
            # a RETRY of this micro-batch must not read its own failed
            # attempt's signatures: counting this batch's docs twice
            # inflates band buckets past max_bucket_size and flips flags
            # vs a clean run (review r7)
            store = store.where(F.col("batch") != batch_id).drop("batch")
        flags = incremental_minhash_dedup(
            batch_df, store, id_col=id_col, text_col=text_col, **minhash_kwargs
        )
        flags = flags.persist()
        try:
            import re

            sig_cols = [c for c in flags.columns if re.fullmatch(r"m\d+", c)]
            flags.select("doc_id", *sig_cols).write.mode("overwrite").parquet(
                f"{store_path}/batch={batch_id}"
            )
            flags.select("doc_id", "keep", "dup_of").write.mode(
                "overwrite"
            ).parquet(f"{out_path}/batch={batch_id}")
        finally:
            flags.unpersist()

    return process
