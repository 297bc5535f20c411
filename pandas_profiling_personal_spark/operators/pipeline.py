"""End-to-end corpus preparation: the composed training-data pipeline a
user of the individual operators would otherwise hand-wire — C4 line
cleaning → quality filter → exact dedup → (optional) MinHash near-dup →
benchmark decontamination → (optional) chunking — plus a one-aggregate
data FUNNEL report.

Design: :func:`corpus_funnel` computes every stage as a SEQUENTIAL boolean
flag over one wide DataFrame instead of materializing per-stage corpora —
a later flag is true only if every earlier flag is (dedup winners are
elected only among quality survivors, decontamination only among dedup
winners), so the flags read as a funnel, the counts come from ONE
aggregate, and nothing is filtered until the caller asks. The per-stage
operators stay the single source of truth for semantics: line cleaning is
:func:`...text.c4_line_filter`, the quality rules are
:func:`...text.quality_filter` (over the CLEANED text), exact dedup
groups on :func:`...text.fingerprint` of the cleaned text with the
first-id-wins rule, decontamination is
:func:`...dedup.contamination_keep_list`.

Scale shape: one corpus scan feeds the flag projection; the only
exchanges are the fingerprint-keyed window that elects dedup winners
(groups bounded by duplicate-group size; quality-failed docs carry
unique synthetic keys so the null-key partition can't become a
straggler), the optional near-dup stage's shared shingle exchange +
banded LSH buckets (capped — see :func:`...dedup.minhash_dedup`) over
exact-dedup winners only, and the decontamination's
broadcast-benchmark join + bounded hit rollup. The funnel report
collapses to a single row via partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pandas_profiling_personal_spark.functions import stats as S
from pandas_profiling_personal_spark.functions.partitioning import (
    parallelize_narrow,
    shj_build,
)
from pandas_profiling_personal_spark.operators import text as TX

#: funnel stages in order; each column of the flags frame.
#: pass_near_dup equals pass_dedup when the optional MinHash stage is off,
#: so the funnel schema is stable across configurations.
FUNNEL_STAGES = (
    "pass_lines",
    "pass_quality",
    "pass_dedup",
    "pass_near_dup",
    "pass_decontam",
)


def corpus_funnel(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words_per_line: int = 3,
    min_clean_lines: int = 1,
    line_filter: bool = True,
    near_dup: dict | None = None,
    benchmark: DataFrame | None = None,
    benchmark_text_col: str = "text",
    quality_kwargs: dict | None = None,
) -> DataFrame:
    """One row per input document with the cleaned text and sequential
    stage flags: ``(id, text_clean, pass_lines, pass_quality, pass_dedup,
    pass_near_dup, pass_decontam, quality_score, reject_reasons)``.

    ``pass_decontam`` is the FINAL keep decision (it folds every earlier
    stage); with no ``benchmark`` it equals ``pass_near_dup``. Dedup
    winners are elected with min-id-wins among documents that survived
    the quality stage — a dropped near-duplicate never shadows a kept
    one. ``line_filter=False`` skips the C4 line stage (``text_clean``
    is the raw text, ``pass_lines`` is true for non-null docs).

    ``near_dup`` switches on the fuzzy stage real pipelines run between
    exact dedup and decontamination: MinHash → LSH buckets → exact
    Jaccard verify (:func:`...dedup.minhash_dedup`, which these kwargs
    parameterize — ``num_hashes``/``bands``/``shingle_k``/
    ``min_jaccard``/``seed``/``hash_fn``; ``{}`` takes its defaults,
    deterministic md5 tier included) over the exact-dedup WINNERS only,
    then a greedy min-partner sweep: a winner is dropped iff some
    verified near-duplicate partner has a lower id (the SemDeDup-style
    sweep — non-iterative and engine-reproducible, unlike the
    connected-components election of :func:`...dedup.dedup_keep_list`,
    which drops transitive chain members a pairwise sweep keeps). With
    ``near_dup=None`` (default) ``pass_near_dup`` equals ``pass_dedup``
    and the stage costs nothing.
    """
    base = parallelize_narrow(df).select(
        S.col(id_col).alias("id"), S.col(text_col).alias("__t")
    )
    # every per-document stage stacks as a PROJECTION on one frame (codegen
    # subexpression elimination shares the tokenizer subtrees) — no
    # self-joins, so the corpus is scanned once per genuinely relational
    # stage (dedup winners, decontamination), not once per rule
    if line_filter:
        flags = TX.c4_line_filter(
            base, "id", "__t", min_words=min_words_per_line
        ).select(
            "id",
            "text_clean",
            F.coalesce(
                F.col("n_lines_kept") >= min_clean_lines, F.lit(False)
            ).alias("pass_lines"),
        )
    else:
        flags = base.select(
            "id",
            F.col("__t").alias("text_clean"),
            F.col("__t").isNotNull().alias("pass_lines"),
        )

    score, reasons = TX.quality_reject_reasons(
        F.col("text_clean"), **(quality_kwargs or {})
    )
    flags = flags.select(
        "*",
        score.alias("quality_score"),
        reasons.alias("reject_reasons"),
    ).withColumn(
        "pass_quality",
        F.col("pass_lines") & (F.size(F.col("reject_reasons")) == 0),
    )

    # exact dedup among quality survivors: min-id-wins per fingerprint of
    # the CLEANED text, elected by ONE window over the fingerprint key.
    # Quality-failed docs get a UNIQUE synthetic key instead of a shared
    # NULL: on raw web corpora MOST docs fail quality, and a null __fp
    # would hash every one of them into the single null-key shuffle
    # partition — one straggler task holding the bulk of a 100 TB corpus.
    fp = F.when(F.col("pass_quality"), TX.fingerprint(F.col("text_clean")))
    flags = flags.withColumn(
        "__fp",
        F.coalesce(
            fp, F.concat(F.lit("\x00nofp:"), F.col("id").cast("string"))
        ),
    )
    # winner election as a WINDOW over __fp instead of an aggregate +
    # join-back: ONE __fp exchange, and the per-document stage chain (the
    # expensive part) evaluates exactly once — the join form re-derived
    # the whole chain for the aggregate side (filter pushdown through the
    # shared exchange defeated runtime reuse; measured 63 s vs 40 s at sf1)
    from pyspark.sql import Window

    win = F.min(
        F.when(F.col("pass_quality"), F.col("id"))
    ).over(Window.partitionBy("__fp"))
    flags = flags.withColumn(
        "pass_dedup", F.col("pass_quality") & (F.col("id") == win)
    )

    if near_dup is not None:
        from pandas_profiling_personal_spark.operators.dedup import (
            minhash_dedup,
        )

        # the per-document stage chain now has TWO consumers (the final
        # flag projection and the winners→shingle branch), and projection
        # pruning below the __fp window diverges between them, so exchange
        # reuse cannot dedupe the chain (the r5 funnel lesson; measured:
        # +1 full chain evaluation, 13 s of 25.7 at sf1). A LAZY local
        # checkpoint materializes the flags once on first evaluation and
        # both consumers read it — chain runs once per action. Storage
        # lifetime: the blocks live while the returned DataFrame is
        # referenced; Spark's ContextCleaner unpersists checkpointed RDDs
        # once they are garbage-collected, so repeated calls don't
        # accumulate (review r6). (On a multi-executor cluster, reliable
        # checkpointing is the executor-loss-safe variant — same note as
        # cluster_pairs.)
        flags = flags.localCheckpoint(eager=False)

        # fuzzy stage over exact-dedup WINNERS only (the survivor set is
        # already a fraction of the corpus, and exact dups would flood
        # every LSH bucket with jaccard-1.0 pairs). minhash_dedup shares
        # its (doc_id, shingle) exchange between the signature and the
        # verify branches; its bucket cap bounds degenerate buckets.
        winners = flags.where(F.col("pass_dedup")).select(
            F.col("id"), F.col("text_clean")
        )
        pairs = minhash_dedup(winners, "id", "text_clean", **near_dup)
        # greedy min-partner sweep: doc_b is dropped iff ANY verified
        # partner precedes it — a |dropped|-row aggregate, no iteration
        nd = pairs.groupBy(F.col("doc_b").alias("id")).agg(
            F.min("doc_a").alias("__nd_of")
        )
        # nd is bounded (one row per dropped near-dup) — hash-build it
        flags = flags.join(shj_build(nd), "id", "left").withColumn(
            "pass_near_dup",
            F.col("pass_dedup") & F.col("__nd_of").isNull(),
        )
    else:
        flags = flags.withColumn("pass_near_dup", F.col("pass_dedup"))

    if benchmark is not None:
        from pandas_profiling_personal_spark.operators.dedup import (
            contamination_keep_list,
        )

        contam = contamination_keep_list(
            flags.select("id", "text_clean"),
            benchmark.select(
                S.col(benchmark_text_col).alias("text_clean")
            ),
            id_col="id",
            text_col="text_clean",
        ).select(
            F.col("doc_id").alias("id"), F.col("keep").alias("__c_keep")
        )
        flags = flags.join(shj_build(contam), "id", "left").withColumn(
            "pass_decontam",
            F.col("pass_near_dup")
            & F.coalesce(F.col("__c_keep"), F.lit(True)),
        )
    else:
        flags = flags.withColumn("pass_decontam", F.col("pass_near_dup"))

    return flags.select(
        "id",
        "text_clean",
        *FUNNEL_STAGES,
        "quality_score",
        "reject_reasons",
    )


def funnel_report(flags: DataFrame) -> DataFrame:
    """ONE-row survivor counts over a :func:`corpus_funnel` result:
    ``(n_docs, n_pass_lines, n_pass_quality, n_pass_dedup,
    n_pass_decontam)`` — a single partial-aggregated collapse, the
    training-data "data funnel" chart in one job."""
    return flags.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum(F.col(s).cast("long")).alias(f"n_{s}")
            for s in FUNNEL_STAGES
        ],
    )


def prepare_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int | None = None,
    overlap_tokens: int = 0,
    flags: DataFrame | None = None,
    **funnel_kwargs,
) -> DataFrame:
    """The surviving corpus: :func:`corpus_funnel` filtered to the final
    stage, original non-text columns preserved, text replaced by the
    cleaned text. With ``chunk_tokens`` the result is chunk rows
    (:func:`...text.chunk_documents` schema) instead of document rows —
    ready for :func:`...sources.writers.write_training_shards` keyed on
    ``chunk_id``/``id``.

    Pass a precomputed (ideally persisted) :func:`corpus_funnel` result as
    ``flags`` when you also need :func:`funnel_report` — otherwise the
    funnel (whose quality stage dominates corpus cost) executes twice.
    ``flags`` and funnel options are mutually exclusive: stage options
    like ``benchmark=`` must be baked into the flags you pass, and
    silently dropping them here would ship a contaminated corpus."""
    if flags is not None and funnel_kwargs:
        raise ValueError(
            "pass funnel options when BUILDING flags, not alongside them — "
            f"these would be silently ignored: {sorted(funnel_kwargs)}"
        )
    if flags is None:
        flags = corpus_funnel(df, id_col, text_col, **funnel_kwargs)
    # internal aliases are __-prefixed and the output keeps the CALLER's
    # id column name, so a corpus that already has columns named "id" or
    # "text_clean" doesn't collide with the funnel's internals
    kept = flags.where(F.col("pass_decontam")).select(
        F.col("id").alias("__pc_id"), F.col("text_clean").alias("__pc_text")
    )
    others = [c for c in df.columns if c not in (id_col, text_col)]
    out = (
        df.select(S.col(id_col).alias("__pc_id"), *[S.col(c) for c in others])
        .join(kept, "__pc_id")
        .select(
            F.col("__pc_id").alias(id_col),
            *others,
            F.col("__pc_text").alias(text_col),
        )
    )
    if chunk_tokens is not None:
        return TX.chunk_documents(
            out, id_col, text_col,
            chunk_tokens=chunk_tokens, overlap_tokens=overlap_tokens,
        )
    return out
