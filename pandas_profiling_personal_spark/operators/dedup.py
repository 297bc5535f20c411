"""Document deduplication at corpus scale: exact, MinHash+LSH, SimHash, n-gram
Jaccard.

All operators are compositions of built-in DataFrame ops (explode / groupBy /
self-join) — no Python in the hot path. Hashing is md5-based so results are
deterministic and reproducible by any engine (the DuckDB oracle recomputes them
bit-for-bit), unlike Spark's Murmur3 ``F.hash``.

Scale shapes:
* exact dedup: shuffle of (fingerprint, count) — map-side combined, tiny.
* MinHash: one explode over shingles feeding H min-aggregates — partial
  aggregation reduces each partition to one signature row per doc before the
  shuffle; then an equi-join on (band_index, band_hash) buckets. Hot buckets
  (boilerplate/spam clusters) are capped via ``max_bucket_size``.
* n-gram Jaccard: equi-join on shingle with document-frequency capping — the
  standard stop-shingle guard against quadratic blowup.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window, functions as F

from pandas_profiling_personal_spark.functions import stats as S
from pandas_profiling_personal_spark.functions.partitioning import (
    parallelize_narrow,
    shj_build,
)
from pandas_profiling_personal_spark.operators.text import normalize_text, tokens

#: Mersenne prime 2^31-1; universal-hash modulus for MinHash
MINHASH_PRIME = 2147483647


def minhash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a_i*x + b_i) mod p. a < 2^30 keeps
    a*x within int64 for x < 2^31."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 30), rng.randrange(0, MINHASH_PRIME))
        for _ in range(num_hashes)
    ]


def word_shingles(c: Column, k: int = 3) -> Column:
    """Array of k-word shingles (joined with '_') over normalized tokens.

    The token array is BOUND ONCE as a lambda variable via a single-element
    ``transform`` wrapper. Embedding the ``tokens(c)`` expression directly in
    the per-index lambda re-evaluates the whole tokenizer (lower + regex split
    + filter) for EVERY ``element_at`` — ~3 x n_shingles tokenizations per
    document; measured 24 s -> 0.7 s for 5.4M shingles (50k docs) at sf1.
    HOFs run interpreted (outside codegen), so there is no common-subexpression
    elimination to save the naive form."""

    def build(t: Column) -> Column:
        return F.when(
            F.size(t) >= k,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - k),
                lambda i: F.concat_ws(
                    "_",
                    *[
                        F.element_at(t, (i + j + 1).cast("int"))
                        for j in range(k)
                    ],
                ),
            ),
        ).otherwise(F.array(F.concat_ws("_", t)))

    return F.element_at(F.transform(F.array(tokens(c)), build), 1)


def portable_hash64(c: Column) -> Column:
    """First 8 hex chars of md5 as a non-negative int64 (< 2^32). Any engine with
    md5 reproduces it exactly — the property the oracle checks rely on."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def fast_hash64(c: Column) -> Column:
    """Non-negative int64 (< 2^32) via xxhash64 — JVM-native, ~an order of
    magnitude cheaper than the md5/hex path, but Spark-specific (not
    reproducible by an external oracle). The scale-tier default; pass
    ``hash_fn="md5"`` for cross-engine-reproducible results."""
    return F.pmod(F.xxhash64(c), F.lit(1 << 32)).cast("long")


_HASH_FNS = {"md5": portable_hash64, "xxhash64": fast_hash64}


# --- exact -------------------------------------------------------------------------


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str, max_ids: int = 100
) -> DataFrame:
    """Groups of documents with identical normalized text:
    (fingerprint, n_docs, doc_ids). ``n_docs`` counts the FULL group;
    ``doc_ids`` holds only the ``max_ids`` smallest ids — at corpus scale a
    boilerplate fingerprint can have millions of members, and an unbounded
    ``collect_list`` would materialize them all in one aggregation buffer /
    output row. The rank filter runs inside the same fingerprint exchange
    (window and groupBy share the partitioning), so memory stays bounded
    end-to-end."""
    fp = F.md5(normalize_text(S.col(text_col)))
    w = Window.partitionBy("fingerprint")
    ranked = (
        df.select(S.col(id_col).alias("doc_id"), fp.alias("fingerprint"))
        .withColumn("__n", F.count(F.lit(1)).over(w))
        .withColumn("__rn", F.row_number().over(w.orderBy("doc_id")))
        .where(F.col("__rn") <= max_ids)
    )
    return (
        ranked.groupBy("fingerprint")
        .agg(
            F.max("__n").alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


# --- MinHash + LSH --------------------------------------------------------------


def shingle_table(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(doc_id, shingle) — distinct shingles per document.

    Input is widened to full parallelism first: shingle generation is the
    interpreted-HOF CPU hot spot, and byte-sized file splits starve it (one
    600 KB split = one core doing all the work)."""
    df = parallelize_narrow(df)
    return (
        df.select(
            S.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(word_shingles(S.col(text_col), k))).alias(
                "shingle"
            ),
        )
        .where(F.col("shingle") != "")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    hash_fn: str = "md5",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, m0..m{H-1}) MinHash signature — one explode + one combine-friendly
    aggregation (H min() columns). ``hash_fn``: "md5" (oracle-reproducible) or
    "xxhash64" (fast scale tier). ``shingles`` lets a pipeline pass a shared
    (doc_id, shingle) table so the shingling subtree is computed once."""
    sh = (
        shingles
        if shingles is not None
        else shingle_table(df, id_col, text_col, shingle_k)
    )
    h = (_HASH_FNS[hash_fn](F.col("shingle")) % MINHASH_PRIME).alias("h")
    hashed = sh.select("doc_id", h)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_PRIME).alias(f"m{i}")
        for i, (a, b) in enumerate(minhash_params(num_hashes, seed))
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def band_table(
    signatures: DataFrame,
    num_hashes: int,
    bands: int,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """(doc_id[, keep_cols...], band, bucket) — each signature exploded
    into its ``bands`` LSH band buckets (bucket = md5 of that band's
    ``num_hashes // bands`` signature slice). The ONE definition of band
    hashing shared by the batch (:func:`lsh_candidate_pairs`) and
    incremental (:func:`incremental_minhash_dedup`) paths — and mirrored
    by the oracle SQL's band_selects — so they can never silently
    disagree."""
    r = num_hashes // bands
    assert r * bands == num_hashes, "bands must divide num_hashes"
    band_structs = [
        F.struct(
            F.lit(j).alias("band"),
            F.md5(
                F.concat_ws(",", *[F.col(f"m{j * r + i}") for i in range(r)])
            ).alias("bucket"),
        )
        for j in range(bands)
    ]
    extra = keep_cols or []
    return signatures.select(
        F.col("doc_id"), *extra, F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", *extra, "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs sharing at least one LSH band bucket.

    rows_per_band = num_hashes // bands; a pair collides in a band iff that band's
    signature slice matches exactly. ``max_bucket_size`` drops degenerate buckets
    (boilerplate clusters) that would go quadratic."""
    melted = band_table(signatures, num_hashes, bands)
    if max_bucket_size:
        w = Window.partitionBy("band", "bucket")
        melted = melted.withColumn("__bs", F.count(F.lit(1)).over(w)).where(
            F.col("__bs") <= max_bucket_size
        ).drop("__bs")
    a, b = melted.alias("a"), melted.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_similarity(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    min_jaccard: float = 0.0,
    max_shingle_df: int | None = 1000,
    candidates: DataFrame | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for document pairs sharing >= 1 shingle:
    (doc_a, doc_b, n_common, n_a, n_b, jaccard).

    Without ``candidates`` this is all-pairs-with-overlap (shingle-blocked);
    ``max_shingle_df`` drops shingles appearing in more than N docs (stop-shingle
    guard). With ``candidates`` (e.g. from LSH) it verifies only those pairs.
    ``shingles`` lets a pipeline share a pre-built (doc_id, shingle) table."""
    sh = (
        shingles
        if shingles is not None
        else shingle_table(df, id_col, text_col, shingle_k)
    )
    if max_shingle_df:
        docfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = (
            sh.join(docfreq.where(F.col("df") <= max_shingle_df), "shingle")
            .select("doc_id", "shingle")
        )
    # Materialize shingle generation through ONE exchange: every consumer below
    # (both self-join sides, the per-doc size aggregate) re-derives this subtree,
    # and without a common exchange Catalyst re-runs the expensive interpreted
    # HOF shingling once per consumer (4 scans in the physical plan). Hash
    # partitioning by the join key turns the subtree into a single shuffle whose
    # output ReuseExchange shares — shingles are computed exactly once, and the
    # shingle-equality join needs no further exchange. AQE still coalesces the
    # partition count. A caller-supplied ``shingles`` table is trusted to carry
    # its own exchange (see minhash_dedup) — re-repartitioning it here would
    # fork the subtree and defeat ReuseExchange across the pipeline.
    if shingles is None or max_shingle_df:
        sh = sh.repartition("shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    if candidates is not None:
        # candidates-first: intersect shingle sets ONLY for candidate pairs
        # (join candidates->shingles twice on doc id + shingle equality) instead
        # of materializing every overlapping pair — the difference between
        # O(candidates · shingles/doc) and O(sum_over_shingles df²) at scale
        a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        common = (
            candidates.join(a, "doc_a")
            .join(b, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    else:
        a, b = sh.alias("a"), sh.alias("b")
        common = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")
    )
    out = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                4,
            ),
        )
    )
    if min_jaccard > 0:
        out = out.where(F.col("jaccard") >= min_jaccard)
    return out.select("doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard")


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    min_jaccard: float = 0.8,
    seed: int = 42,
    hash_fn: str = "md5",
) -> DataFrame:
    """Full near-dup pipeline: MinHash -> LSH buckets -> exact Jaccard verify.
    Returns verified (doc_a, doc_b, jaccard >= min_jaccard) pairs.

    The (doc_id, shingle) table — the interpreted-HOF CPU hot spot — is built
    ONCE behind a single hash exchange and shared by the signature branch and
    the Jaccard-verify branch via ReuseExchange; without this the shingling
    subtree is evaluated twice (once per branch)."""
    sh = shingle_table(df, id_col, text_col, shingle_k).repartition("shingle")
    sigs = minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_k, seed, hash_fn, shingles=sh
    )
    cands = lsh_candidate_pairs(sigs, num_hashes, bands)
    return jaccard_similarity(
        df,
        id_col,
        text_col,
        shingle_k,
        min_jaccard,
        max_shingle_df=None,
        candidates=cands,
        shingles=sh,
    )


# --- clustering / keep-list ---------------------------------------------------------


def cluster_pairs(pairs: DataFrame, max_iterations: int = 50) -> DataFrame:
    """Connected components over near-dup pairs -> (doc_id, cluster_id).

    Iterative min-label propagation (the simple alternating halves of
    large-star/small-star): each doc's label becomes the min label in its
    neighborhood; converges in O(diameter) rounds — near-dup clusters are
    almost always tiny, so a handful of joins. ``cluster_id`` is the minimum
    doc_id of the component. Only documents appearing in a pair are returned.

    Raises ``RuntimeError`` if the label propagation has not converged after
    ``max_iterations`` rounds: an unconverged result silently violates the
    keep-list contract (cluster_id = component minimum), so a pathological
    diameter-> ``max_iterations`` chain must fail loudly, not quietly."""
    from pyspark import StorageLevel

    edges = (
        pairs.select("doc_a", "doc_b")
        .union(pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    # Each round references ``labels`` TWICE (neighbor-min join + the outer
    # join), so without lineage truncation the logical plan doubles per
    # iteration — exponential plan growth that OOMs the driver around ~14
    # rounds regardless of data size. ``localCheckpoint`` materializes the
    # round's result AND cuts the plan, so every round is one bounded shuffle
    # job over a flat lineage. (On a multi-executor cluster, reliable
    # ``checkpoint`` to the checkpoint dir is the executor-loss-safe variant;
    # local checkpointing is the right default for an iterative dedup step.)
    converged = False
    try:
        for _ in range(max_iterations):
            neighbor_min = (
                edges.join(
                    labels.withColumnRenamed("doc_id", "doc_b"), "doc_b"
                )
                .groupBy(F.col("doc_a").alias("doc_id"))
                .agg(F.min("cluster_id").alias("nbr_min"))
            )
            stepped = (
                labels.join(neighbor_min, "doc_id", "left")
                .select(
                    "doc_id",
                    F.col("cluster_id").alias("__old"),
                    F.least(
                        F.col("cluster_id"), F.coalesce("nbr_min", "cluster_id")
                    ).alias("cluster_id"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                stepped.where(F.col("cluster_id") != F.col("__old"))
                .limit(1)
                .count()
            )
            labels = stepped.select("doc_id", "cluster_id")
            if changed == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"cluster_pairs: min-label propagation did not converge in "
                f"{max_iterations} rounds (component diameter exceeds the cap); "
                f"raise max_iterations"
            )
        return labels
    finally:
        edges.unpersist()


def dedup_keep_list(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
) -> DataFrame:
    """The end product of a dedup pipeline: the input with a ``keep`` flag —
    one representative (minimum id) per near-dup cluster, everything not in any
    cluster kept. Filter ``keep`` to materialize the deduplicated corpus."""
    clusters = cluster_pairs(pairs)
    # cluster map is bounded (ids of clustered docs only) — hash-build it
    out = df.join(
        shj_build(clusters.withColumnRenamed("doc_id", "__cid")),
        S.col(id_col) == F.col("__cid"),
        "left",
    )
    return out.withColumn(
        "keep",
        F.col("cluster_id").isNull() | (S.col(id_col) == F.col("cluster_id")),
    ).drop("__cid", "cluster_id")


# --- SimHash ----------------------------------------------------------------------


def simhash_table(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32,
    hash_fn: str = "md5",
) -> DataFrame:
    """(doc_id, simhash) — ``bits``-bit SimHash over word tokens.

    One explode + ``bits`` conditional sums, combine-friendly. Near-dups have
    small Hamming distance; pair generation should block on rotated prefixes or
    band slices of the hash (same LSH idea as MinHash bands)."""
    df = parallelize_narrow(df)
    tok = df.select(
        S.col(id_col).alias("doc_id"),
        F.explode(tokens(S.col(text_col))).alias("tok"),
    )
    h = _HASH_FNS[hash_fn](F.col("tok"))
    hashed = tok.select("doc_id", h.alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = hashed.groupBy("doc_id").agg(*bit_sums)
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim + F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(0)
    return agg.select("doc_id", sim.alias("simhash"))


def hamming_distance(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def auto_band_geometry(
    n: int,
    bits: int,
    max_hamming: int,
    band_bits: int | None = None,
) -> tuple[int, int]:
    """Pick ``(band_bits, key_blocks)`` for :func:`banded_hamming_pairs`
    from the corpus size — the signature-space twin of
    ``similarity.semantic_dedup``'s ``n_cells=None`` auto-sizing (review
    r7: the safe tier must be the DEFAULT, not a flag).

    Enumerates every exact-recall geometry — ``band_bits`` dividing
    ``bits`` (or the caller's fixed value), ``key_blocks`` up to
    ``blocks - max_hamming`` (pigeonhole) under the 512-band explode cap —
    and minimizes the expected row model for uniform signatures::

        cost = n * C(blocks, k)                    (band-exploded rows)
             + C(blocks, k) * n^2 / 2^(k*bb + 1)   (candidate pairs)

    Small corpora get single-block bands (minimal explode); large corpora
    widen keys (``key_blocks`` up, the Manku block-combination scheme)
    because candidate pairs dominate — measured at 50k 60-bit fake
    signatures: k=1 -> ~195M candidates / 75.8 s, k=2 -> ~14x fewer /
    16.6 s, same exact pair set. Deterministic: ties break toward fewer
    bands, then wider band_bits."""
    from math import comb

    bbs = [band_bits] if band_bits is not None else [
        bb for bb in range(3, min(bits, 17)) if bits % bb == 0
    ]
    best = None
    for bb in bbs:
        blocks = bits // bb
        for k in range(1, max(blocks - max_hamming, 0) + 1):
            bands = comb(blocks, k)
            if bands > 512:
                break
            cost = n * bands + bands * n * n / (2.0 ** (k * bb + 1))
            cand = (cost, bands, -bb, bb, k)
            if best is None or cand < best:
                best = cand
    if best is None:
        raise ValueError(
            f"no exact-recall band geometry exists for bits={bits}, "
            f"max_hamming={max_hamming}"
            + (f", band_bits={band_bits}" if band_bits is not None else "")
            + " — lower max_hamming or widen the signature"
        )
    return best[3], best[4]


def _hamming_band_melt(
    df: DataFrame,
    id_col: str,
    sig_col: str,
    band_bits: int,
    combos: list[tuple[int, ...]],
) -> DataFrame:
    """(doc_id, __sig, band, key) rows — THE one band-key definition for
    Hamming-space banding (block = shiftright+mask, key = concatenated
    blocks), shared by :func:`banded_hamming_pairs` and
    :func:`incremental_hamming_dedup` so the pair engine and the store
    sweep can never silently disagree (the ``band_table`` rule)."""

    def block(i: int) -> Column:
        return F.shiftright(F.col(sig_col), i * band_bits).bitwiseAND(
            F.lit((1 << band_bits) - 1)
        )

    def key_of(combo) -> Column:
        k = block(combo[0])
        for i in combo[1:]:
            k = F.shiftleft(k, band_bits).bitwiseOR(block(i))
        return k

    band_structs = [
        F.struct(F.lit(j).alias("band"), key_of(combo).alias("key"))
        for j, combo in enumerate(combos)
    ]
    return df.select(
        S.col(id_col).alias("doc_id"),
        F.col(sig_col).alias("__sig"),
        F.explode(F.array(*band_structs)).alias("bb"),
    ).select("doc_id", "__sig", "bb.band", "bb.key")


def banded_hamming_pairs(
    sig: DataFrame,
    id_col: str,
    sig_col: str,
    bits: int,
    band_bits: int,
    max_hamming: int,
    key_blocks: int = 1,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs whose ``sig_col`` bit-signatures differ
    in <= ``max_hamming`` positions, blocked on exact-match band keys so the
    join never goes all-pairs. The signature splits into ``bits/band_bits``
    blocks; each band's key is the concatenation of ``key_blocks`` of them
    (every combination is a band — the Manku/Google SimHash-dedup block
    scheme). Pigeonhole recall guarantee: two signatures within
    ``max_hamming`` differ in at most ``max_hamming`` blocks, so they agree
    on >= blocks - max_hamming of them and share a full band key whenever
    ``blocks >= max_hamming + key_blocks`` (guarded with an explicit raise).

    ``key_blocks`` is the exactness-vs-scale lever the single-block form
    lacks: at a fixed Hamming radius the guarantee caps a single block at
    ``bits/(max_hamming+1)`` bits — 6-bit keys = 64 buckets/band for r=8
    over 60 bits, which goes quadratic long before corpus scale (measured:
    50k docs -> ~195M candidate pairs, 76 s). ``key_blocks=2`` widens every
    key to 12 bits (4096 buckets) at the cost of C(10,2)=45 bands — ~14x
    fewer candidates for the SAME exact-recall radius; the driver-recorded
    oracle row runs this configuration against an all-pairs SQL rebuild.

    Shared pair-generation engine for every Hamming-space signature: SimHash
    over text (:func:`simhash_near_duplicates`) and perceptual image hashes
    (``operators.multimodal.image_near_duplicates``). One band explode (rides
    the signature scan), one equi-join keyed on (band, key) — the same
    bucket-join shape as MinHash LSH, so the scale story is identical: no
    cross-band comparisons, shuffle is ids+signature only (times C(b,k)
    band rows per doc)."""
    from itertools import combinations

    n_blocks = bits // band_bits
    if n_blocks < max_hamming + key_blocks:
        raise ValueError(
            f"bits/band_bits={n_blocks} blocks cannot guarantee recall at "
            f"max_hamming={max_hamming} with key_blocks={key_blocks}; need "
            f"blocks >= max_hamming + key_blocks (pigeonhole)"
        )
    combos = list(combinations(range(n_blocks), key_blocks))
    if len(combos) > 512:
        raise ValueError(
            f"C({n_blocks},{key_blocks})={len(combos)} bands — the explode "
            "factor is unreasonable; use fewer/wider blocks"
        )

    melted = _hamming_band_melt(sig, id_col, sig_col, band_bits, combos)
    a, b = melted.alias("a"), melted.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming_distance(F.col("a.__sig"), F.col("b.__sig")).alias(
                "hamming"
            ),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    max_hamming: int = 3,
    band_bits: int = 8,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with Hamming distance <= max_hamming,
    blocked on ``bits/band_bits`` SimHash bands so the join never goes
    all-pairs (see :func:`banded_hamming_pairs`)."""
    sim = simhash_table(df, id_col, text_col, bits)
    return banded_hamming_pairs(
        sim, "doc_id", "simhash", bits, band_bits, max_hamming
    )


# --- corpus overlap / contamination detection ---------------------------------------


def corpus_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    unit: str = "token",
    shingle_k: int = 3,
    exact: bool = True,
    lgk: int = 14,
) -> DataFrame:
    """Train/test contamination check: distinct-unit overlap between two
    corpora as ONE row (n_a, n_b, n_overlap, jaccard, containment_a_in_b).

    ``unit``: "token" (vocabulary overlap), "shingle" (k-word shingles — the
    contamination-relevant unit: shared shingles mean shared phrasing, not
    just shared vocabulary), or "fingerprint" (whole-document exact overlap).

    Tiers:
    * ``exact=True`` — distinct units per side, inner-joined: the oracle-
      checkable form; the join shuffles O(distinct units).
    * ``exact=False`` — Datasketches HLL per side + inclusion-exclusion
      (|A∩B| = |A|+|B|-|A∪B| via the native ``hll_union``): NO join, no
      cross-corpus shuffle at all — each side collapses to one 2^lgk-byte
      sketch, the right shape when both corpora are 100 TB. Estimates can
      carry HLL error (~0.8% at lgk=14) and tiny intersections can read 0.
    """
    df_a = parallelize_narrow(df_a)
    df_b = parallelize_narrow(df_b)
    from pandas_profiling_personal_spark.operators.text import tokens

    def units(df: DataFrame) -> DataFrame:
        c = S.col(text_col)
        if unit == "token":
            u = F.explode(F.array_distinct(tokens(c)))
        elif unit == "shingle":
            u = F.explode(F.array_distinct(word_shingles(c, shingle_k)))
        elif unit == "fingerprint":
            u = F.md5(normalize_text(c))
        else:
            raise ValueError(f"unknown unit: {unit}")
        return df.select(u.alias("u")).where(F.col("u") != "")

    ua, ub = units(df_a), units(df_b)
    if exact:
        da, db = ua.distinct(), ub.distinct()
        joined = da.join(db.withColumnRenamed("u", "u2"), F.col("u") == F.col("u2"))
        counts = (
            da.agg(F.count(F.lit(1)).alias("n_a"))
            .crossJoin(db.agg(F.count(F.lit(1)).alias("n_b")))
            .crossJoin(joined.agg(F.count(F.lit(1)).alias("n_overlap")))
        )
    else:
        sa = ua.agg(F.hll_sketch_agg("u", F.lit(lgk)).alias("sk_a"))
        sb = ub.agg(F.hll_sketch_agg("u", F.lit(lgk)).alias("sk_b"))
        counts = sa.crossJoin(sb).select(
            F.hll_sketch_estimate(F.col("sk_a")).alias("n_a"),
            F.hll_sketch_estimate(F.col("sk_b")).alias("n_b"),
            F.greatest(
                F.lit(0).cast("long"),
                (
                    F.hll_sketch_estimate(F.col("sk_a"))
                    + F.hll_sketch_estimate(F.col("sk_b"))
                    - F.hll_sketch_estimate(
                        F.hll_union(F.col("sk_a"), F.col("sk_b"))
                    )
                ).cast("long"),
            ).alias("n_overlap"),
        )
    # nullif-guarded denominators: empty corpora yield an explicit NULL
    # jaccard/containment under BOTH ansi settings (unguarded, ansi=true
    # would throw DIVIDE_BY_ZERO and ansi=false would silently null)
    union_size = F.nullif(
        F.col("n_a") + F.col("n_b") - F.col("n_overlap"), F.lit(0)
    )
    return counts.select(
        "n_a",
        "n_b",
        "n_overlap",
        F.round(F.col("n_overlap") / union_size, 4).alias("jaccard"),
        F.round(
            F.col("n_overlap") / F.nullif(F.col("n_a"), F.lit(0)), 4
        ).alias("containment_a_in_b"),
    )


def hashed_word_shingles(c: Column, k: int = 8) -> Column:
    """k-word shingles as 61-bit polynomial hashes over per-token xxhash64 —
    the FAST twin of :func:`word_shingles` for joins that only need shingle
    IDENTITY (not the text): no per-shingle string building, ~1.55x faster
    at sf1 (13.4 -> 8.6 s for 4.7M shingles) and long joins instead of
    ~60-char string joins. Token hashes are computed ONCE per document
    (bound-lambda pattern); under k tokens falls back to a whole-doc fold,
    mirroring word_shingles' whole-doc shingle.

    Collision caveat: 61-bit space. At 10^10 corpus shingles x 10^6
    benchmark shingles the expected cross-collisions are O(1-10) — a few
    parts-per-billion FALSE drops, acceptable for decontamination; use the
    string tier when exact text identity is required."""
    P = 1000003
    M = F.lit(1 << 61)

    def window_hash(h: Column, i: Column) -> Column:
        # weighted sum with per-step modular reduction: 31-bit token hash x
        # 31-bit coefficient < 2^62, + acc (< 2^61) stays inside int64 —
        # ANSI-overflow-safe by construction
        acc = F.lit(0).cast("long")
        for j in range(k):
            term = F.element_at(h, (i + j + 1).cast("int")) * F.lit(
                P**j % (1 << 31)
            )
            acc = (acc + term) % M
        return acc

    def build(h: Column) -> Column:
        # empty token arrays yield NULL (no shingle at all), NOT the
        # aggregate's initial accumulator 0 — otherwise every empty/
        # punctuation-only doc shares hash 0 and falsely cross-matches
        # (mirrors the string tier's shingle != '' guard)
        return F.when(
            F.size(h) >= k,
            F.transform(
                F.sequence(F.lit(0), F.size(h) - k),
                lambda i: window_hash(h, i),
            ),
        ).when(
            F.size(h) > 0,
            F.array(
                F.aggregate(
                    h,
                    F.lit(0).cast("long"),
                    lambda a, x: ((a % F.lit(1 << 55)) * 31 + x)
                    % F.lit(1 << 55),
                )
            ),
        )

    th = F.transform(
        tokens(c), lambda t: F.pmod(F.xxhash64(t), F.lit(1 << 31))
    )
    return F.element_at(F.transform(F.array(th), build), 1)


def contamination_keep_list(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 8,
    min_matched: int = 1,
    broadcast_benchmark: bool = True,
    shingle_repr: str = "string",
) -> DataFrame:
    """Benchmark decontamination: flag every corpus document sharing at least
    ``min_matched`` distinct ``shingle_k``-gram word shingles with ANY
    document of ``benchmark`` — the standard eval-contamination rule (a
    shared 8-gram means shared phrasing, not shared vocabulary; cf. the
    n-gram overlap decontamination in GPT-3 appendix C / PaLM appendix).

    Returns ``(doc_id, n_matched, keep)`` for every corpus document
    (``keep = n_matched < min_matched``) — feed to
    :func:`~pandas_profiling_personal_spark.sources.writers.write_deduplicated`
    to materialize the clean corpus.

    100 TB shape: a benchmark is eval-sized (MBs) while the corpus is the
    100 TB side, so the benchmark's distinct-shingle set is BROADCAST —
    the corpus-side scan joins against an in-memory set with NO shuffle of
    corpus data; the only exchange is the (doc_id, count) partial-aggregated
    rollup over matched rows, bounded by the contamination volume. Set
    ``broadcast_benchmark=False`` only when the "benchmark" is itself
    corpus-scale (then this is a plain shuffle join and
    :func:`corpus_overlap`'s HLL tier is the cheaper first question).

    ``shingle_repr``: "string" (default — exact text identity, DuckDB-
    reproducible) or "hash" (:func:`hashed_word_shingles` fast tier — no
    per-shingle string building, long joins; ppb-level false-drop risk).

    No reference analogue (single-frame profiler); LLM-pipeline tier."""
    if shingle_repr not in ("string", "hash"):
        raise ValueError(f"shingle_repr must be 'string' or 'hash', got {shingle_repr!r}")

    def sh(df: DataFrame, with_id: bool) -> DataFrame:
        cols = [S.col(id_col).alias("doc_id")] if with_id else []
        if shingle_repr == "hash":
            gen = hashed_word_shingles(S.col(text_col), shingle_k)
            guard = F.col("shingle").isNotNull()
        else:
            gen = word_shingles(S.col(text_col), shingle_k)
            guard = F.col("shingle") != ""
        return df.select(
            *cols,
            F.explode(F.array_distinct(gen)).alias("shingle"),
        ).where(guard)

    sh_b = sh(benchmark, with_id=False).distinct()
    if broadcast_benchmark:
        sh_b = F.broadcast(sh_b)
    hits = (
        sh(parallelize_narrow(corpus), with_id=True)
        .join(sh_b, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    return (
        corpus.select(S.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_matched"), F.lit(0)).alias("n_matched"),
            (F.coalesce(F.col("n_matched"), F.lit(0)) < min_matched).alias(
                "keep"
            ),
        )
    )


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 10,
    min_span_chars: int = 0,
) -> DataFrame:
    """Corpus-level duplicated-span removal (the C4 pipeline's "discard any
    repeated occurrence of a span" rule, applied to fixed ``span_words``-word
    chunks): every span that occurs more than once ACROSS THE WHOLE CORPUS
    keeps only its first occurrence — first = smallest ``(doc_id, span_idx)``,
    a total order any engine reproduces — and each document is reassembled
    from its surviving spans in order.

    Returns ``(doc_id, text_deduped, n_spans, n_spans_kept)``. Reassembly
    joins spans with single spaces, so text round-trips exactly for
    single-space-separated corpora and is whitespace-normalized otherwise.
    Spans shorter than ``min_span_chars`` are exempt (always kept) — short
    tails are common strings, not contamination.

    100 TB shape: one narrow posexplode (no data growth beyond a span-index
    column), ONE corpus-wide exchange keyed by md5(span) carrying
    (hash, min-struct) with map-side combine — the min-winner per span is a
    partial-aggregatable fold, so the shuffle carries one row per DISTINCT
    span, not per occurrence — then a hash-keyed join back and a per-doc
    regroup bounded by document length. No driver-side state."""
    df = parallelize_narrow(df)
    k = span_words

    # bind the token array ONCE as a lambda variable (the word_shingles
    # lesson): embedding split() in the per-index lambda re-tokenizes the
    # document for EVERY span — measured 18.7 s -> see PERFORMANCE.md at
    # sf1 (50k docs) for the bound form
    def _build(t):
        n_chunks = F.ceil(F.size(t) / F.lit(float(k))).cast("int")
        return F.when(
            n_chunks >= 1,
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(t, (i * k + 1).cast("int"), k)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    spans = F.element_at(
        F.transform(F.array(F.split(S.col(text_col), " ")), _build), 1
    )
    occ = df.select(
        S.col(id_col).alias("doc_id"),
        F.posexplode(spans).alias("idx", "span"),
    ).withColumn("h", F.md5(F.col("span")))
    eligible = (
        occ if min_span_chars <= 0
        else occ.where(F.length("span") >= min_span_chars)
    )
    winners = eligible.groupBy("h").agg(
        F.min(F.struct("doc_id", "idx")).alias("w"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    kept = occ.join(winners, "h", "left").where(
        F.col("w").isNull()  # exempt (below min_span_chars): always kept
        | ((F.col("w.doc_id") == F.col("doc_id")) & (F.col("w.idx") == F.col("idx")))
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "span"))),
                lambda x: x["span"],
            ),
        ).alias("text_deduped"),
        F.count(F.lit(1)).alias("n_spans_kept"),
    )
    # per-doc span totals ARITHMETICALLY (ceil(n_tokens / k), min 1 — the
    # whole-doc fallback): size(spans) would rebuild every span string just
    # to count them, and re-grouping the exploded table would re-evaluate
    # the HOF (subtree reuse only applies to exchanges, not scans)
    # null text → 0 spans (split(null) produced no occ rows, so flooring at 1
    # would make null-text docs indistinguishable from docs whose only span
    # was removed as a duplicate — and diverge from the oracle SQL)
    totals = df.select(
        S.col(id_col).alias("doc_id"),
        F.when(S.col(text_col).isNull(), F.lit(0).cast("long"))
        .otherwise(
            F.greatest(
                F.ceil(
                    F.size(F.split(S.col(text_col), " ")) / F.lit(float(k))
                ).cast("long"),
                F.lit(1).cast("long"),
            )
        )
        .alias("n_spans"),
    )
    return (
        totals  # one row per corpus doc already — no extra id scan needed
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("text_deduped"), F.lit("")).alias("text_deduped"),
            F.coalesce(F.col("n_spans"), F.lit(0)).alias("n_spans"),
            F.coalesce(F.col("n_spans_kept"), F.lit(0)).alias("n_spans_kept"),
        )
    )


# --- incremental dedup vs a historical store -----------------------------------
# The daily-incremental operating mode: yesterday's corpus is NOT re-read —
# history lives in a compact persisted store (a fingerprint table, or a
# num_hashes-ints-per-doc signature table) that the new shard joins against.
# Pairs with plans/incremental.py (mergeable profile states) to make the
# whole profile+dedup pipeline incremental. Contract both operators share:
# document ids are globally unique and increase over time (later shards
# carry larger ids), so "lower id wins" is exactly "first seen wins" and a
# two-step run equals the batch run over the unioned corpus (pytest-gated).


def incremental_exact_dedup(
    df: DataFrame,
    fp_store: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact dedup of a NEW shard against a persisted fingerprint store:
    ``(doc_id, fingerprint, keep, dup_of)`` — one row per new document.
    ``fp_store`` is ``(fingerprint, doc_id)`` with one row per historical
    winner (``None`` for the first shard); a new document is kept iff its
    normalized-text fingerprint has no historical winner AND it is the
    minimum id for that fingerprint within the shard. ``dup_of`` is the
    winning id (historical beats in-shard).

    Null-text documents fingerprint to the ``"\\x00null"`` sentinel (never
    SQL NULL): an equi-join on a null key matches nothing, so a null
    fingerprint would silently exempt null-text docs from the store and
    break two-step == batch (review r6). With the sentinel they form ONE
    dup group across all shards — the same grouping the batch window
    gives them. (That group is also one shuffle partition; if your corpus
    is mostly null text, filter those docs out first.)

    Scale shape: the shard is fingerprinted in one projection and elected
    by one fingerprint-keyed window; the store participates ONLY through
    an equi-join on its key (no historical text is re-read or re-hashed —
    plan-gated). Persist the store with
    :func:`...sources.writers.write_bucketed_table` bucketed on
    ``fingerprint`` and the store side of that join reads co-located
    buckets with NO exchange — only the daily shard shuffles
    (plan-gated: test_incremental_dedup_bucketed_store_no_store_exchange).
    Update the store with :func:`dedup_store_update`; two-step == batch
    equivalence is pytest-gated."""
    fps = parallelize_narrow(df).select(
        S.col(id_col).alias("doc_id"),
        F.coalesce(
            F.md5(normalize_text(S.col(text_col))), F.lit("\x00null")
        ).alias("fingerprint"),
    )
    w = Window.partitionBy("fingerprint")
    fps = fps.withColumn("__shard_win", F.min("doc_id").over(w))
    if fp_store is not None:
        store = fp_store.select(
            F.col("fingerprint"), F.col("doc_id").alias("__hist_win")
        )
    else:
        # empty first-shard store: __hist_win must carry the CALLER's id
        # type (string doc ids are legal) — a hardcoded bigint would make
        # the dup_of F.when branches mix types, which fails analysis under
        # ANSI mode (advice r6)
        from pyspark.sql import types as T

        store = fps.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("fingerprint", T.StringType()),
                    T.StructField("__hist_win", df.schema[id_col].dataType),
                ]
            ),
        )
    return (
        # the store side of this join is the winner projection
        # (fingerprint, id) — bounded metadata, never document text;
        # hash-build it (bucketed stores still join exchange-free)
        fps.join(shj_build(store), "fingerprint", "left")
        .select(
            "doc_id",
            "fingerprint",
            (
                F.col("__hist_win").isNull()
                & (F.col("doc_id") == F.col("__shard_win"))
            ).alias("keep"),
            F.when(
                F.col("__hist_win").isNotNull(), F.col("__hist_win")
            )
            .when(
                F.col("doc_id") != F.col("__shard_win"), F.col("__shard_win")
            )
            .alias("dup_of"),
        )
    )


def dedup_store_update(
    fp_store: DataFrame | None, flags: DataFrame
) -> DataFrame:
    """The next round's fingerprint store: historical winners plus the new
    shard's kept documents (``(fingerprint, doc_id)``). Pure union — the
    old store is never rewritten row-by-row, so the daily job appends a
    partition instead of rewriting 100 TB of history."""
    new_winners = flags.where(F.col("keep")).select("fingerprint", "doc_id")
    if fp_store is None:
        return new_winners
    return fp_store.select("fingerprint", "doc_id").unionByName(new_winners)


def incremental_minhash_dedup(
    df: DataFrame,
    sig_store: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    min_est_jaccard: float = 0.8,
    shingle_k: int = 3,
    seed: int = 42,
    hash_fn: str = "md5",
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-dup dedup of a NEW shard against a persisted MinHash SIGNATURE
    store: ``(doc_id, keep, dup_of, m0..m{H-1})`` — one row per new
    document. ``sig_store`` is ``(doc_id, m0..m{H-1})`` for EVERY
    historical document (kept or dropped — the greedy sweep drops against
    any earlier near-dup, so forgetting dropped docs would diverge from
    the batch result); ``None`` for the first shard. Documents with no
    shingles (null/empty text) have no near-dup identity and are ABSENT
    from the result — route them through
    :func:`incremental_exact_dedup`, whose null-fingerprint group covers
    them.

    Verification tier: history keeps ``num_hashes`` ints per document,
    not its shingles, so cross-shard similarity is the SIGNATURE-estimated
    Jaccard (fraction of agreeing minhash components — the unbiased
    estimator LSH theory is built on), not the exact re-shingled Jaccard
    of :func:`minhash_dedup`. Per-shard semantics: a new doc is dropped
    iff some banded-LSH candidate with a LOWER id (historical or in-shard)
    estimates >= ``min_est_jaccard`` — the same greedy min-partner sweep
    as the corpus funnel's near-dup stage.

    Scale shape: only the new shard is shingled (ONE signature pass; the
    store is never re-shingled — plan-gated); candidates come from an
    equi-join of the store+shard band table against the NEW shard's band
    table; degenerate buckets are dropped via a bounded (band, bucket)
    count aggregate broadcast back as an anti-join (no full-store window).
    Appending ``m0..m{H-1}`` rows of this result to the store (ALL of
    them, kept or not) is the store update; two-step == batch-on-union
    equivalence is pytest-gated. One qualification (review r6): the
    ``max_bucket_size`` cap counts each RUN's bucket population, so a
    bucket that crosses the cap only once later shards join can differ
    between two-step and batch (an early shard generated its pairs while
    the bucket was small; the batch run anti-joins the whole bucket
    away). The cap is a cost guard against degenerate buckets, not part
    of the semantic contract — equivalence is exact whenever no bucket
    crosses the cap between runs, and the divergence direction is pinned
    (test_incremental_minhash_bucket_cap_divergence_direction): every
    run's bucket population is a subset of the batch run's, so candidate
    pairs flow one way — two-step drops ⊇ batch drops, i.e. the crossed
    bucket only ever makes the BATCH side keep more; two-step never
    invents a keep the batch would drop."""
    sig_cols = [f"m{i}" for i in range(num_hashes)]
    # ONE explicit doc_id exchange under the signature table: three
    # consumers (the store∪new band table, the new band table, the final
    # keep join) read the SAME subtree via ReuseExchange — without it the
    # shingle+hash pass (the CPU hot spot) executes once per consumer
    sigs_new = (
        minhash_signatures(
            df, id_col, text_col, num_hashes, shingle_k, seed, hash_fn
        )
        .select("doc_id", *sig_cols)
        .repartition("doc_id")
    )
    if sig_store is not None:
        store = sig_store.select("doc_id", *sig_cols)
        all_sigs = store.unionByName(sigs_new)
    else:
        all_sigs = sigs_new

    # the ONE band-hashing definition, shared with lsh_candidate_pairs
    bands_all = band_table(all_sigs, num_hashes, bands, keep_cols=sig_cols)
    bands_new = band_table(sigs_new, num_hashes, bands, keep_cols=sig_cols)
    if max_bucket_size:
        # hot buckets identified by a partial-aggregated count whose output
        # is tiny (only buckets over the cap), broadcast as an anti-join —
        # no window over the full historical band table
        hot = (
            bands_all.groupBy("band", "bucket")
            .count()
            .where(F.col("count") > max_bucket_size)
            .select("band", "bucket")
        )
        bands_all = bands_all.join(
            F.broadcast(hot), ["band", "bucket"], "left_anti"
        )
        bands_new = bands_new.join(
            F.broadcast(hot), ["band", "bucket"], "left_anti"
        )
    a, b = bands_all.alias("a"), bands_new.alias("b")
    est = (
        sum(
            (F.col(f"a.{c}") == F.col(f"b.{c}")).cast("int") for c in sig_cols
        )
        / F.lit(float(num_hashes))
    )
    nd = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(est >= min_est_jaccard)
        .groupBy(F.col("b.doc_id").alias("doc_id"))
        .agg(F.min(F.col("a.doc_id")).alias("dup_of"))
    )
    return (
        # nd is bounded (one row per FLAGGED new doc: id + dup_of) —
        # hash-build it against the corpus-sized signature side
        sigs_new.join(shj_build(nd), "doc_id", "left")
        .select(
            "doc_id",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
            *sig_cols,
        )
    )


def incremental_hamming_dedup(
    new_sigs: DataFrame,
    sig_store: DataFrame | None,
    id_col: str = "doc_id",
    sig_col: str = "signature",
    bits: int = 64,
    max_hamming: int = 7,
    band_bits: int | None = None,
    key_blocks: int | None = None,
    n_hint: int | None = None,
) -> DataFrame:
    """Near-dup dedup of a NEW shard of Hamming-space signatures against a
    persisted signature store — the bit-signature twin of
    :func:`incremental_minhash_dedup`, completing the daily-incremental
    mode for the modalities that dedup on Hamming distance: perceptual
    image hashes (``multimodal.media_metadata`` phash), audio envelope
    signatures (``multimodal.audio_metadata``), and SimHash. Returns
    ``(id, signature, keep, dup_of)`` — one row per new signature;
    ``sig_store`` is ``(id, signature)`` for EVERY historical doc (kept or
    dropped — dropping only against keepers would diverge from the batch
    sweep), ``None`` for the first shard; appending this result's
    ``(id, signature)`` rows is the store update.

    ID CONTRACT: new-shard ids must be distinct within the shard AND
    disjoint from the store. The sweep pairs on strict ``a.id < b.id``, so
    re-ingesting an id already present keeps it (its identical-signature
    twin never pairs) and the documented append then doubles that id's
    band rows in every later sweep (review r9). Re-ingestion pipelines
    must anti-join new ids against the store first
    (``new.join(store, [id_col], "left_anti")``) — not done here because
    the extra exchange would tax every caller for a contract violation.

    Semantics: a new doc is dropped iff some banded candidate with a LOWER
    id (historical or in-shard) lies within ``max_hamming``; ``dup_of`` is
    the minimum such partner. Two-step == batch-on-union equivalence is
    exact (pytest-gated) — banding has the pigeonhole recall guarantee, so
    unlike the MinHash tier there is no bucket-size-cap qualification.

    Scale shape: the store participates only through the band equi-join
    (band-melted once, ``C(blocks, key_blocks)`` rows per signature); the
    new shard melts the same way; one (band, key) exchange + one min
    aggregate per flagged doc. ``key_blocks=None`` auto-sizes from
    |store| + |shard| via :func:`auto_band_geometry`; pass ``n_hint``
    (that total, known cheaply by the caller — e.g. a metadata-only
    ``df.count()`` BEFORE an expensive signature pipeline) so the sizing
    does not execute ``new_sigs``'s lineage as an extra job (review r8:
    the image/audio wrappers' sizing count was re-running the full Arrow
    media decode)."""
    ids = new_sigs.select(
        S.col(id_col).alias("doc_id"), S.col(sig_col).alias("__sig")
    ).repartition("doc_id")
    all_sigs = (
        ids
        if sig_store is None
        else sig_store.select(
            S.col(id_col).alias("doc_id"), S.col(sig_col).alias("__sig")
        ).unionByName(ids)
    )
    if key_blocks is None:
        band_bits, key_blocks = auto_band_geometry(
            all_sigs.count() if n_hint is None else int(n_hint),
            bits, max_hamming, band_bits,
        )
    elif band_bits is None:
        band_bits = 6 if bits % 6 == 0 else 8

    from itertools import combinations

    n_blocks = bits // band_bits
    if n_blocks < max_hamming + key_blocks:
        raise ValueError(
            f"bits/band_bits={n_blocks} blocks cannot guarantee recall at "
            f"max_hamming={max_hamming} with key_blocks={key_blocks}"
        )
    combos = list(combinations(range(n_blocks), key_blocks))
    # the ONE band-key definition, shared with banded_hamming_pairs
    a = _hamming_band_melt(all_sigs, "doc_id", "__sig", band_bits, combos
                           ).alias("a")
    b = _hamming_band_melt(ids, "doc_id", "__sig", band_bits, combos
                           ).alias("b")
    nd = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(
            hamming_distance(F.col("a.__sig"), F.col("b.__sig"))
            <= max_hamming
        )
        .groupBy(F.col("b.doc_id").alias("doc_id"))
        .agg(F.min(F.col("a.doc_id")).alias("dup_of"))
    )
    # nd is bounded (one row per flagged new signature) — hash-build it
    return ids.join(shj_build(nd), "doc_id", "left").select(
        F.col("doc_id").alias(id_col),
        F.col("__sig").alias(sig_col),
        F.col("dup_of").isNull().alias("keep"),
        "dup_of",
    )
