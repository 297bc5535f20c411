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
