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
    (``dropDuplicatesWithinWatermark`` handles the exact tier only). Two
    closures of that gap: :func:`near_dup_stream` (custom band-bucket state
    via ``applyInPandasWithState`` — within-stream verdicts, TTL-bounded
    state), and :func:`minhash_dedup_foreach_batch` for full two-step
    parity with the batch incremental operator including store
    maintenance.

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


def hamming_dedup_stream_vs_store(
    df: DataFrame,
    sig_store: DataFrame,
    sig_col: str = "signature",
    bits: int = 64,
    max_hamming: int = 7,
    band_bits: int | None = None,
) -> DataFrame:
    """Suppress stream rows whose Hamming-space signature (perceptual image
    phash, audio envelope signature, SimHash) is within ``max_hamming`` of
    a PERSISTED signature store — the streaming half of
    :func:`...operators.dedup.incremental_hamming_dedup` (same store
    layout: one ``(id, signature)`` row per historical doc, kept or
    dropped), completing the streaming column of the modality matrix the
    exact and MinHash tiers already have.

    Built-ins only, append-mode safe, zero state: the signature splits
    into ``bits/band_bits`` single-block band keys — the SAME
    shiftright+mask block rule as ``dedup._hamming_band_melt`` with
    ``key_blocks=1``, so the stream tier and the batch engine can never
    silently disagree — and history suppression is one stream-static LEFT
    ANTI equi-join per block, each carrying the exact
    ``hamming <= max_hamming`` verify as a join residual. Pigeonhole:
    within-radius signatures agree on >= blocks - max_hamming blocks, so
    recall is exact whenever ``blocks >= max_hamming + 1`` (guarded).
    Single-block keys are inherent to this form — the join count scales
    with the number of BANDS, so the wide-key geometries the batch pair
    engine uses (``key_blocks>=2``, C(b,k) bands) are not expressible as
    successive joins; at streaming rates the per-block bucket fan-out is
    bounded by the STORE's bucket sizes, which is what the anti join
    prices.

    Semantics: the STREAM rule — history wins regardless of id order
    (same as :func:`near_dup_stream_vs_store`); the batch incremental
    drops only against lower ids, so the two agree exactly when ids
    follow arrival order. Null signatures have no Hamming identity and
    PASS THROUGH (every join condition is null) — route them through the
    exact tier. WITHIN-stream near-dups are :func:`near_dup_stream`'s
    job (custom TTL-bounded state); this operator holds no state at all.

    100 TB shape: the store is re-read per micro-batch — persist it as a
    columnar table (id + one long per doc) so each read is a bounded
    scan; only the stream side shuffles, ``blocks`` times, on one-block
    keys."""
    if band_bits is None:
        band_bits = 6 if bits % 6 == 0 else 8
    n_blocks = bits // band_bits
    if n_blocks < max_hamming + 1:
        raise ValueError(
            f"bits/band_bits={n_blocks} blocks cannot guarantee recall at "
            f"max_hamming={max_hamming} with single-block keys; need "
            "blocks >= max_hamming + 1 (pigeonhole)"
        )

    def block(c: Column, i: int) -> Column:
        # dedup._hamming_band_melt's block rule, key_blocks=1
        return F.shiftright(c, i * band_bits).bitwiseAND(
            F.lit((1 << band_bits) - 1)
        )

    from pandas_profiling_personal_spark.operators.dedup import (
        hamming_distance,
    )

    out = df
    for j in range(n_blocks):
        store_j = sig_store.select(
            block(S.col(sig_col), j).alias("__hk"),
            S.col(sig_col).alias("__hsig"),
        )
        out = out.join(
            store_j,
            (block(S.col(sig_col), j) == store_j["__hk"])
            & (
                hamming_distance(S.col(sig_col), store_j["__hsig"])
                <= max_hamming
            ),
            "left_anti",
        )
    return out


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


NEAR_DUP_VERDICT_SCHEMA = (
    "doc_id bigint, ts timestamp, dup_of bigint, est_jaccard double, "
    "band int"
)
_NEAR_DUP_STATE_SCHEMA = (
    "ids array<bigint>, ts_us array<bigint>, sigs array<bigint>"
)


def near_dup_stream(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ts_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    min_est_jaccard: float = 0.8,
    shingle_k: int = 3,
    seed: int = 42,
    watermark: str = "10 minutes",
    state_ttl_minutes: int | None = None,
    max_bucket_signatures: int = 1000,
) -> DataFrame:
    """WITHIN-STREAM near-dup detection — the gap
    :func:`near_dup_stream_vs_store` documents: near-dup is not an equality
    key, so no built-in watermarked state can bound it. This closes it with
    the one capability built-ins lack, ``applyInPandasWithState`` keyed on
    the LSH BAND BUCKET (the ``session_stream`` seam): per bucket, the
    state holds the signatures seen inside the TTL horizon, and each
    arriving document compares against them with the signature-estimated
    Jaccard.

    Returns an append-mode VERDICT stream: one row per (document, band)
    whose bucket contained a LOWER-id signature estimating >=
    ``min_est_jaccard`` — ``(doc_id, ts, dup_of, est_jaccard, band)`` with
    ``dup_of`` the minimum qualifying partner in THAT band. A document
    near-dups in as many rows as bands caught it: consumers suppress
    ``SELECT DISTINCT doc_id`` (verdicts only exist for duplicates, so the
    stream is small — the kept corpus is the input anti-joined on it).

    Semantics match the batch ``incremental_minhash_dedup(df, None, ...)``
    greedy sweep — a doc is flagged iff some banded-LSH candidate with a
    LOWER id estimates >= the threshold — EXACTLY, whenever every near-dup
    pair arrives within the TTL horizon AND ids respect micro-batch
    arrival order (pytest-gated equivalence). The order condition is load-
    bearing across micro-batches: if a LOWER-id partner arrives in a LATER
    micro-batch, the higher-id doc was already judged against state that
    lacked it and stays permanently unflagged (in-batch disorder is fine —
    each batch sorts by id before the sweep; review r9). Monotone ids
    (ingest sequence numbers, the usual streaming id) satisfy this by
    construction. Two
    qualifications, both deliberate: (1) ``state_ttl_minutes`` bounds state
    by event time — an entry stops suppressing once the watermark passes
    ``entry_ts + ttl`` (None = no age eviction: exact, state grows with
    distinct bucket population — backfill/test tier); idle buckets reap
    their whole state via event-time timeout. (2) ``max_bucket_signatures``
    caps each bucket's state at the FIRST N signatures (a degenerate
    boilerplate bucket stops growing; the batch operator's
    ``max_bucket_size`` instead drops the whole bucket, so past the cap the
    stream flags MORE than the batch — the conservative direction for
    dedup).

    Docs with no shingles (null/empty text) have no near-dup identity and
    never appear in verdicts — route them through the exact tier
    (:func:`exact_dedup_stream_vs_store`), same as every near-dup operator
    here.

    100 TB shape: signatures are stateless map-side expressions; the ONE
    shuffle is the groupBy on (band, bucket) — ``bands`` rows per doc, the
    same fan-out the batch band table pays; state per bucket is
    ``num_hashes`` longs per doc inside the horizon, watermark-bounded.

    Batch DataFrames are rejected: the batch semantics ARE
    ``incremental_minhash_dedup`` / ``minhash_dedup`` — use them."""
    if not df.isStreaming:
        raise ValueError(
            "near_dup_stream is the streaming tier; on a batch DataFrame "
            "use operators.dedup.minhash_dedup or incremental_minhash_dedup"
        )
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    r = num_hashes // bands
    assert r * bands == num_hashes, "bands must divide num_hashes"
    session_tz = df.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    )
    ttl_ms = (
        None if state_ttl_minutes is None else int(state_ttl_minutes) * 60_000
    )
    H, thr, cap = num_hashes, float(min_est_jaccard), int(
        max_bucket_signatures
    )

    sig = minhash_signature_array(
        S.col(text_col), num_hashes, shingle_k, seed
    )
    src = df.select(
        S.col(id_col).cast("bigint").alias("__id"),
        S.col(ts_col).cast("timestamp").alias("__ts"),
        sig.alias("__sig"),
    ).where(
        F.col("__ts").isNotNull()
        & F.element_at("__sig", 1).isNotNull()  # shingle-less docs drop out
    )
    # one (band, bucket) row per band — same md5 bucket definition as
    # near_dup_stream_vs_store / the batch band_table
    bucket_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at("__sig", j * r + i + 1)
                            for i in range(r)
                        ],
                    )
                ).alias("bucket"),
            )
            for j in range(bands)
        ]
    )
    exploded = src.select(
        "__id", "__ts", "__sig", F.explode(bucket_structs).alias("bb")
    ).select("__id", "__ts", "__sig", "bb.band", "bb.bucket")

    def _utc_ms(ts) -> int:
        # Arrow hands the kernel NAIVE session-local timestamps; state
        # comparisons run against the UTC-epoch watermark (the
        # session_stream._utc_timeout_ms hazard)
        t = pd.Timestamp(ts)
        if t.tzinfo is None:
            t = t.tz_localize(
                session_tz, ambiguous=True, nonexistent="shift_forward"
            )
        return t.value // 1_000_000

    def fn(
        key: tuple,
        pdfs,
        state: GroupState,
    ):
        band = int(key[0])
        if state.hasTimedOut:
            state.remove()
            return
        ids, ts_ms, flat = (
            ([], [], []) if not state.exists else
            (list(state.get[0]), list(state.get[1]), list(state.get[2]))
        )
        wm = state.getCurrentWatermarkMs()
        if ttl_ms is not None and wm > 0 and ids:
            keep_ix = [
                i for i, t in enumerate(ts_ms) if t + ttl_ms >= wm
            ]
            if len(keep_ix) < len(ids):
                ids = [ids[i] for i in keep_ix]
                ts_ms = [ts_ms[i] for i in keep_ix]
                flat = [
                    v
                    for i in keep_ix
                    for v in flat[i * H : (i + 1) * H]
                ]
        rows = []
        # concatenate the Arrow chunks BEFORE sorting: a bucket spanning
        # multiple chunks in one micro-batch must still process in global
        # id order, or a later-chunk doc whose lower-id partner sits in an
        # earlier chunk is compared before that partner enters state — a
        # silently missed duplicate vs the batch sweep (review r8)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        merged_pdf = (
            pd.concat(chunks, ignore_index=True) if chunks else None
        )
        if merged_pdf is not None:
            for _, row in merged_pdf.sort_values("__id").iterrows():
                doc = int(row["__id"])
                cur = np.asarray(row["__sig"], dtype=np.int64)
                n = len(ids)
                dup_of, best = None, None
                if n:
                    mat = np.asarray(flat, dtype=np.int64).reshape(n, H)
                    est = (mat == cur).mean(axis=1)
                    ok = np.flatnonzero(
                        (est >= thr) & (np.asarray(ids) < doc)
                    )
                    if ok.size:
                        j = ok[int(np.argmin(np.asarray(ids)[ok]))]
                        dup_of, best = int(ids[j]), float(est[j])
                if dup_of is not None:
                    rows.append(
                        (doc, row["__ts"], dup_of, best, band)
                    )
                if len(ids) < cap:  # first-N cap: degenerate buckets freeze
                    ids.append(doc)
                    ts_ms.append(_utc_ms(row["__ts"]))
                    flat.extend(int(x) for x in cur)
        if ids:
            state.update((ids, ts_ms, flat))
            if ttl_ms is not None:
                # reap the whole bucket once the watermark passes the
                # youngest entry's horizon (must stay above the watermark)
                state.setTimeoutTimestamp(
                    max(max(ts_ms) + ttl_ms, (wm or 0) + 1)
                )
        elif state.exists:
            state.remove()
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "ts", "dup_of", "est_jaccard", "band"],
            )

    return (
        exploded.withWatermark("__ts", watermark)
        .groupBy("band", "bucket")
        .applyInPandasWithState(
            fn,
            outputStructType=NEAR_DUP_VERDICT_SCHEMA,
            stateStructType=_NEAR_DUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
