"""Text analysis for large-scale (training-data) pipelines.

Beyond the reference's string stats (A13/A14), these are the document-level
operators a 100 TB text pipeline needs: language identification, quality scoring,
token counting, fingerprinting. All are pure Spark SQL expressions (whole-stage
codegen, no Python in the hot path) so they run at scan speed; none shuffles until
an aggregation is requested.

Design notes:
* language-ID is the classic stopword-hit heuristic (no external model in this
  environment): score(lang) = |tokens ∩ stopwords(lang)| / |tokens|; argmax with a
  deterministic tie order. Accuracy is adequate for routing/filtering; a real
  fastText-style classifier would slot in as a Pandas UDF behind the same column
  contract.
* quality scoring mirrors common pretraining-corpus filters (Gopher/C4 style):
  length, mean word length, punctuation density, stopword density.
* fingerprint = md5 of whitespace-normalized lowercase text — the exact-dedup key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from pandas_profiling_personal_spark.functions import stats as S
from pandas_profiling_personal_spark.functions.partitioning import (
    parallelize_narrow,
)

#: small, fixed stopword inventories (top function words) per language.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "you", "that", "it", "for",
           "was", "with", "are", "this", "have"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "pour", "que",
           "dans", "qui", "pas", "sur", "avec"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu",
           "den", "von", "sich", "auf", "auch", "eine"),
    "es": ("el", "los", "de", "y", "que", "en", "un", "es", "por", "una",
           "con", "para", "del", "las", "se"),
}

#: deterministic priority order for argmax ties
LANG_ORDER = ("en", "fr", "de", "es")

TOKEN_PATTERN = "[^a-z0-9]+"
#: BPE-ish word/number/punctuation token pattern (GPT-2 flavor, ASCII simplified)
BPE_TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def tokens(c: Column) -> Column:
    """Lowercased word tokens (letters/digits runs), empties removed."""
    return F.filter(
        F.split(F.lower(c), TOKEN_PATTERN), lambda t: t != ""
    )


def size_or_null(arr: Column) -> Column:
    """``size()`` that is NULL for a null array under BOTH ANSI modes.

    With ANSI off (this package's own sessions) Spark defaults
    ``spark.sql.legacy.sizeOfNull`` on, so ``size(NULL)`` is **-1**, not
    NULL — a ratio like ``hits / nullif(size, 0)`` then evaluates to
    ``(-1)/(-1) = 1.0`` for null text and silently classifies empty
    documents as high-quality English (found by review after the r5
    evaluation-shape refactor). ``greatest`` folds both encodings (-1 and
    NULL — greatest ignores NULLs) to -1, and ``nullif`` lifts that back
    to NULL, branch-free so the array expression stays
    subexpression-eliminable."""
    return F.nullif(F.greatest(F.size(arr), F.lit(-1)), F.lit(-1))


def token_count(c: Column) -> Column:
    """Whitespace-ish word token count (NULL for null text in both ANSI
    modes — see :func:`size_or_null`)."""
    return size_or_null(tokens(c))


def bpe_token_count(c: Column) -> Column:
    """BPE-ish token count: words + numbers + punctuation marks each count once.
    A cheap, deterministic proxy for tokenizer cost estimation at corpus scale."""
    return F.regexp_count(F.lower(c), F.lit(BPE_TOKEN_PATTERN))


def stopword_hits(toks: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def language_scores(c: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratio in [0, 1].

    Unconditional form (coalesce over a nullif denominator, not a
    when-branch) so the per-language stopword HOF scans stay eligible for
    subexpression elimination — see the evaluation-shape note on
    :func:`quality_features`. Values unchanged: n=0 and null text both
    yield 0.0, exactly as the branch form did."""
    toks = tokens(c)
    n = F.nullif(size_or_null(toks), F.lit(0))
    return {
        lang: F.coalesce(stopword_hits(toks, lang) / n, F.lit(0.0))
        for lang in LANG_ORDER
    }


def language_id(c: Column, min_score: float = 0.01) -> Column:
    """Best-scoring language code, 'und' (undetermined) when no stopword hits.

    Ties break by LANG_ORDER position (deterministic). This is the heuristic
    tier (pure codegen, honest caveat: stopword lists only); a fastText-style
    learned model plugs in behind the SAME column contract via
    ``operators.models.language_id_model(df, ..., loader=...)``."""
    scores = language_scores(c)
    # single-reference argmax: greatest() over (score, priority, lang)
    # structs compares lexicographically, so the best score wins and exact
    # ties fall to the higher priority (= earlier LANG_ORDER position).
    # The old when-chain referenced each score twice per link (predicate +
    # value), re-evaluating the per-language stopword HOF scans — same
    # evaluation-shape issue as quality_features.
    n_langs = len(LANG_ORDER)
    best = F.greatest(
        *[
            F.struct(
                scores[lang].alias("s"),
                F.lit(n_langs - i).alias("prio"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(LANG_ORDER)
        ]
    )
    # bound-lambda so the greatest() tree is evaluated ONCE (referencing
    # best.s and best.lang separately would duplicate it)
    return F.element_at(
        F.transform(
            F.array(best),
            lambda b: F.when(
                b["s"] >= F.lit(float(min_score)), b["lang"]
            ).otherwise(F.lit("und")),
        ),
        1,
    )


def quality_features(c: Column) -> dict[str, Column]:
    """Deterministic quality-filter features (C4/Gopher-style).

    Evaluation-shape note (measured at sf1, 50k docs): the expensive
    subtrees (tokenizer HOFs, regex strips) are kept UNCONDITIONAL —
    guards are expressed as ``nullif`` denominators + ``coalesce``, never
    as ``when(cond, heavy_expr)`` value branches. Spark's subexpression
    elimination (codegen AND the interpreted HOF runtime) skips
    expressions inside conditional branches, so a branch-guarded tokenizer
    is re-evaluated at EVERY reference site: the branch-guarded form made
    ``quality_score`` alone read 9.5 s where the whole 11-column
    text_profile reads 1.9 s. Values are identical (ANSI-safe: the nullif
    denominator can't divide by zero; coalesce restores the 0.0 cases)."""
    toks = tokens(c)
    # NULL (not -1) for null text under both ANSI modes, so the nullif
    # denominators below null out and the coalesces restore the exact
    # pre-refactor values for null documents
    n_tok = size_or_null(toks)
    n_chars = F.length(c)
    alpha_chars = F.length(F.regexp_replace(F.lower(c), "[^a-z]", ""))
    punct_chars = F.length(F.regexp_replace(c, "[^.,;:!?]", ""))
    tok_div = F.nullif(n_tok, F.lit(0))
    char_div = F.nullif(n_chars, F.lit(0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_token_len": alpha_chars / tok_div,
        "punct_ratio": F.coalesce(punct_chars / char_div, F.lit(0.0)),
        "stopword_ratio": F.coalesce(
            stopword_hits(toks, "en") / tok_div, F.lit(0.0)
        ),
        "distinct_token_ratio": F.size(F.array_distinct(toks)) / tok_div,
    }


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards sane length, word shape and
    stopword density; punishes punctuation soup and heavy repetition."""
    f = quality_features(c)
    len_ok = F.when((f["n_tokens"] >= 10) & (f["n_tokens"] <= 100000), 1.0).otherwise(0.2)
    wordlen_ok = F.when(
        (f["mean_token_len"] >= 2) & (f["mean_token_len"] <= 12), 1.0
    ).otherwise(0.3)
    stop_ok = F.least(f["stopword_ratio"] * 5.0, F.lit(1.0))
    rep_ok = F.coalesce(f["distinct_token_ratio"], F.lit(0.0))
    punct_ok = F.when(f["punct_ratio"] <= 0.2, 1.0).otherwise(0.4)
    return (
        0.25 * len_ok + 0.2 * wordlen_ok + 0.25 * stop_ok + 0.15 * rep_ok
        + 0.15 * punct_ok
    )


def normalize_text(c: Column) -> Column:
    """Whitespace-collapse + lowercase + trim — the canonical form for exact dedup."""
    return F.regexp_replace(F.lower(F.trim(c)), "\\s+", " ")


def fingerprint(c: Column) -> Column:
    """128-bit content fingerprint of the normalized text (hex md5)."""
    return F.md5(normalize_text(c))


def text_profile(
    df: DataFrame, text_col: str, id_col: str | None = None
) -> DataFrame:
    """Per-document text-analysis projection: id, language, quality features,
    token counts, fingerprint. Narrow (no shuffle) — safe to run inline at any
    scale and feed into filters/groupBys."""
    # NOTE (measured at sf1, 50k docs): the column-per-feature form below is
    # the FAST one (0.6 s) — whole-stage codegen's subexpression elimination
    # already evaluates the shared tokens()/score subtrees once per row at
    # projection level. A rewrite that moved every feature inside one bound
    # HOF lambda measured 6.1 s: the lambda body is interpreted, so the
    # regex/md5-heavy parts lost codegen. The lambda-binding trick (see
    # word_shingles) pays ONLY for per-element re-evaluation inside HOF
    # lambdas, never for top-level projection sharing.
    df = parallelize_narrow(df)
    c = S.col(text_col)
    cols = [S.col(id_col)] if id_col else []
    feats = quality_features(c)
    return df.select(
        *cols,
        language_id(c).alias("language"),
        token_count(c).alias("n_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        feats["n_chars"].alias("n_chars"),
        F.round(feats["mean_token_len"], 4).alias("mean_token_len"),
        F.round(feats["punct_ratio"], 4).alias("punct_ratio"),
        F.round(feats["stopword_ratio"], 4).alias("stopword_ratio"),
        F.round(feats["distinct_token_ratio"], 4).alias("distinct_token_ratio"),
        F.round(quality_score(c), 4).alias("quality_score"),
        fingerprint(c).alias("fingerprint"),
    )


def lines(c: Column) -> Column:
    """Non-empty trimmed lines."""
    return F.filter(
        F.transform(F.split(c, "\\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams from a token array (empty when < n tokens).

    The input array is bound once as a lambda variable (single-element
    ``transform`` wrapper) so a computed ``toks`` expression — e.g.
    ``tokens(c)`` — is NOT re-evaluated per ``element_at``; see
    dedup.word_shingles for the measured 34x cost of the naive form."""
    if n == 1:
        return toks

    def build(t: Column) -> Column:
        # guard: F.sequence(1, 0) DESCENDS ([1, 0]) rather than yielding empty
        idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
        return F.when(
            F.size(t) >= n,
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(toks), build), 1)


def repetition_profile(
    df: DataFrame, text_col: str, id_col: str, ngram: int = 2
) -> DataFrame:
    """Per-document repetition signals (the MassiveText/Gopher quality rules —
    Rae et al. 2021 §A1.1): ``(id, n_lines, dup_line_frac, n_ngrams,
    dup_ngram_frac, top_ngram_frac)``.

    * ``dup_line_frac`` — fraction of non-empty lines that are duplicates of
      an earlier line; computed narrowly per row with array HOFs (no shuffle).
    * ``dup_ngram_frac`` / ``top_ngram_frac`` — fraction of word n-grams that
      are repeats, and the share held by the single most frequent n-gram.
      Computed the scale-shaped way: explode → count per (doc, gram) →
      per-doc collapse. ONE shuffle keyed by (doc, gram) with map-side
      combine — the same exchange shape the dedup family uses, bounded by
      distinct grams per doc, never by corpus vocabulary.

    High dup/top fractions mark boilerplate, templated spam and
    degenerate-generation text — the documents a pretraining filter drops
    first."""
    df = parallelize_narrow(df)
    c, idc = S.col(text_col), S.col(id_col)
    # unconditional shape (coalesce / nullif, no heavy exprs inside when
    # value branches) so the line HOFs stay subexpression-eliminable — see
    # the evaluation-shape note on quality_features
    lns = lines(c)
    n_lns = F.size(lns)
    base = df.select(
        idc.alias("doc_id"),
        n_lns.alias("n_lines"),
        F.coalesce(
            (n_lns - F.size(F.array_distinct(lns)))
            / F.nullif(n_lns, F.lit(0)).cast("double"),
            F.lit(0.0),
        ).alias("dup_line_frac"),
        word_ngrams(tokens(c), ngram).alias("__grams"),
    )
    per_gram = (
        base.select("doc_id", F.explode("__grams").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_doc = per_gram.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_ngrams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("top_cnt"),
    )
    out = base.select("doc_id", "n_lines", "dup_line_frac").join(
        per_doc, "doc_id", "left"
    )
    n = F.coalesce(F.col("n_ngrams"), F.lit(0))
    return out.select(
        "doc_id",
        "n_lines",
        F.round(F.col("dup_line_frac"), 4).alias("dup_line_frac"),
        n.alias("n_ngrams"),
        F.round(
            F.when(
                n > 0,
                (n - F.coalesce(F.col("n_distinct"), F.lit(0))) / n.cast("double"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("dup_ngram_frac"),
        F.round(
            F.when(
                n > 0,
                F.coalesce(F.col("top_cnt"), F.lit(0)) / n.cast("double"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("top_ngram_frac"),
    )


def quality_reject_reasons(
    c: Column,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    max_punct_ratio: float = 0.2,
    min_stopword_ratio: float = 0.05,
    min_quality: float = 0.5,
) -> tuple[Column, Column]:
    """The quality-filter rules as PURE COLUMN expressions:
    ``(quality_score, reject_reasons)`` over a text column — the single
    source of truth shared by :func:`quality_filter` and the composed
    pipeline (``operators.pipeline.corpus_funnel``), which stacks them as
    projections instead of paying a join. Same rounded arithmetic as
    :func:`text_profile`, so both call sites stay oracle-identical."""
    feats = quality_features(c)
    n_tok = feats["n_tokens"]
    punct = F.round(feats["punct_ratio"], 4)
    stop = F.round(feats["stopword_ratio"], 4)
    score = F.round(quality_score(c), 4)
    reasons = F.filter(
        F.array(
            # NULL text propagates NULL through every threshold condition,
            # which would silently KEEP the document — reject it explicitly
            F.when(n_tok.isNull(), F.lit("null_text")),
            F.when(n_tok < min_tokens, F.lit("too_short")),
            F.when(n_tok > max_tokens, F.lit("too_long")),
            F.when(punct > max_punct_ratio, F.lit("high_punct")),
            F.when(stop < min_stopword_ratio, F.lit("low_stopword")),
            F.when(score < min_quality, F.lit("low_quality")),
        ),
        lambda x: x.isNotNull(),
    )
    return score, reasons


def quality_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    max_punct_ratio: float = 0.2,
    min_stopword_ratio: float = 0.05,
    min_quality: float = 0.5,
) -> DataFrame:
    """Per-document keep/drop decision with machine-readable reasons — the
    C4/Gopher-style corpus filter built on :func:`text_profile`'s features:
    ``(id, quality_score, reject_reasons array<string>, keep)``.

    Pure projection over the text-profile scan (no shuffle); the reasons
    array preserves rule order so downstream triage can group by first
    reason. Thresholds mirror the published heuristics (C4: length bounds
    and punctuation; Gopher §A1.1: stopword floor) — tune per corpus."""
    df = parallelize_narrow(df)
    score, reasons = quality_reject_reasons(
        S.col(text_col),
        min_tokens=min_tokens,
        max_tokens=max_tokens,
        max_punct_ratio=max_punct_ratio,
        min_stopword_ratio=min_stopword_ratio,
        min_quality=min_quality,
    )
    return df.select(
        S.col(id_col),
        score.alias("quality_score"),
        reasons.alias("reject_reasons"),
        (F.size(reasons) == 0).alias("keep"),
    )


def packing_stats(
    df: DataFrame,
    text_col: str,
    context_len: int = 2048,
    exact: bool = False,
) -> DataFrame:
    """Context-window packing planner for LLM training: ONE 1-row aggregate
    over per-document token counts — ``(n_docs, total_tokens, mean_tokens,
    p50_tokens, p95_tokens, max_tokens, docs_over_context,
    tokens_over_context, min_sequences, naive_sequences, naive_pad_frac)``.

    * ``min_sequences`` — ceil(total/L): the packing lower bound any
      concatenate-and-chunk pipeline achieves.
    * ``naive_sequences`` / ``naive_pad_frac`` — one-doc-per-sequence cost
      (docs longer than L split into ceil(t/L) chunks): the upper bound, and
      the padding fraction it wastes; the gap between the two is what a
      packing strategy is worth on this corpus.
    * ``docs/tokens_over_context`` — how much splitting/truncation L forces.

    Counts use the whitespace tokenizer (:func:`token_count`); swap in BPE
    counts by profiling ``bpe_token_count`` upstream. Partial-aggregated:
    at 1000 executors this is a scan plus a 1-row exchange. Callers
    that already computed per-document counts (corpus_profile holds
    them in its persisted text_profile) use
    :func:`packing_stats_from_counts` and skip the re-tokenization."""
    df = parallelize_narrow(df)
    t = token_count(S.col(text_col)).cast("long")
    return packing_stats_from_counts(
        df.select(t.alias("__t")), "__t", context_len, exact
    )


def packing_stats_from_counts(
    df: DataFrame,
    count_col: str,
    context_len: int = 2048,
    exact: bool = False,
) -> DataFrame:
    """:func:`packing_stats` over an existing per-document token-count
    column — the tokenizer-free path for callers that already computed
    the counts (same output schema and arithmetic)."""
    t = S.col(count_col).cast("long")
    L = F.lit(int(context_len))
    naive_seqs = F.ceil(t / L)
    # exact tier: interpolated `percentile` (DuckDB quantile_cont-identical,
    # the oracle convention); approx tier: GK sketch for corpus scale
    if exact:
        p50 = F.round(F.percentile(t, F.lit(0.5)), 4)
        p95 = F.round(F.percentile(t, F.lit(0.95)), 4)
    else:
        p50 = F.percentile_approx(t, 0.5, 10000).cast("double")
        p95 = F.percentile_approx(t, 0.95, 10000).cast("double")
    agg = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(t).alias("total_tokens"),
        F.round(F.avg(t), 4).alias("mean_tokens"),
        p50.alias("p50_tokens"),
        p95.alias("p95_tokens"),
        F.max(t).alias("max_tokens"),
        F.sum((t > L).cast("long")).alias("docs_over_context"),
        F.sum(F.when(t > L, t - L).otherwise(F.lit(0))).alias(
            "tokens_over_context"
        ),
        F.sum(naive_seqs).alias("naive_sequences"),
    )
    return agg.select(
        "*",
        F.ceil(F.col("total_tokens") / L).alias("min_sequences"),
        F.round(
            F.when(
                F.col("naive_sequences") > 0,
                1.0
                - F.col("total_tokens")
                / (F.col("naive_sequences") * L).cast("double"),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("naive_pad_frac"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
    context_len: int = 2048,
    bucket_size: int = 100_000,
) -> DataFrame:
    """The EXECUTABLE packing assignment the :func:`packing_stats` planner
    estimates: GPT-style concatenate-and-chunk — documents laid end-to-end
    in ``id_col`` order, the token stream cut every ``context_len`` tokens.
    One row per document:

    ``(id, n_tokens, start_token, seq_first, seq_last)``

    where ``start_token`` is the document's offset in the global token
    stream and ``seq_first``/``seq_last`` the training sequences it lands
    in (``seq_last > seq_first`` means the document crosses one or more
    sequence boundaries — the standard trade of zero-padding pipelines).
    Deterministic for a given id order; achieves exactly the planner's
    ``min_sequences`` lower bound. Null counts pack as 0 tokens.

    Scale shape: a global prefix sum WITHOUT a single-partition global
    window — the two-phase pattern: (1) a cumsum windowed inside
    order-aligned id buckets, (2) bucket totals (|buckets| rows, bounded)
    cumsum'd over the small rollup and broadcast back as per-bucket
    offsets. NUMERIC ids bucket arithmetically (``floor(id /
    bucket_size)`` — one window exchange; pick ``bucket_size`` so
    |buckets| stays in the thousands at your corpus size); any OTHER
    orderable id type (string doc ids, timestamps) buckets by
    ``repartitionByRange(id)`` + partition id — the range partitioner
    guarantees order-aligned buckets for any orderable type, at the cost
    of one extra exchange (its sampled boundaries do NOT affect the
    output: ``start_token`` depends only on global id order, which every
    order-aligned bucketing reproduces; ``bucket_size`` is ignored on
    this path)."""
    from pyspark.sql import Window
    from pyspark.sql.types import NumericType

    t = F.coalesce(S.col(count_col).cast("long"), F.lit(0))
    L = F.lit(int(context_len))
    numeric_id = isinstance(df.schema[id_col].dataType, NumericType)
    # ROWS frame, not the default RANGE frame: RANGE collapses rows TIED on
    # the order key into one cumulative group, so two rows sharing an id
    # would both read the tie-group total and claim overlapping token
    # ranges (review r7). With ROWS every row gets a distinct running sum;
    # ids should still be unique for the ASSIGNMENT to be deterministic
    # (which physical duplicate gets which slot is partition-dependent —
    # the same contract as stratified_sample's key).
    w_in = (
        Window.partitionBy("__b")
        .orderBy(S.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if numeric_id:
        b = F.floor(S.col(id_col) / F.lit(int(bucket_size)))
        bucketed = df.select(S.col(id_col), t.alias("__t"), b.alias("__b"))
    else:
        bucketed = (
            df.select(S.col(id_col), t.alias("__t"))
            .repartitionByRange(S.col(id_col))
            .withColumn("__b", F.spark_partition_id().cast("long"))
        )
    within = bucketed.withColumn("__cum_in", F.sum("__t").over(w_in))
    # bucket totals: a bounded rollup; its cumsum runs over |buckets| rows
    w_b = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        within.groupBy("__b")
        .agg(F.sum("__t").alias("__bt"))
        .withColumn("__off", F.coalesce(F.sum("__bt").over(w_b), F.lit(0)))
        .select("__b", "__off")
    )
    start = F.col("__off") + F.col("__cum_in") - F.col("__t")
    end = start + F.col("__t") - 1
    return (
        within.join(F.broadcast(offs), "__b")
        .select(
            S.col(id_col),
            F.col("__t").alias("n_tokens"),
            start.alias("start_token"),
            F.floor(start / L).cast("long").alias("seq_first"),
            F.when(F.col("__t") > 0, F.floor(end / L))
            .otherwise(F.floor(start / L))
            .cast("long")
            .alias("seq_last"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 256,
    overlap_tokens: int = 32,
) -> DataFrame:
    """Sliding-window document chunking — the RAG-indexing / training-prep
    step that turns a corpus into bounded, overlapping token windows:
    one output row per chunk, ``(id, chunk_index, chunk_id, chunk_text,
    n_chunk_tokens)``.

    Semantics (engine-independent, so an independent SQL engine reproduces
    it byte-for-byte):

    * tokens are whitespace runs of the trimmed text (the same cheap
      tokenizer the packing planner uses);
    * window starts are ``1, 1+stride, ...`` with ``stride = chunk_tokens −
      overlap_tokens``, emitted while ``start ≤ max(1, n_tokens −
      overlap_tokens)`` — the cap stops a trailing degenerate window that
      would contain only the previous chunk's overlap;
    * ``chunk_id = md5(id ':' chunk_index)`` — a deterministic, engine- and
      partitioning-independent key downstream sinks can join/dedup on;
    * null/empty/whitespace-only documents yield NO chunks (callers keep
      them via the source table, not the chunk table).

    100 TB shape: sequence + posexplode + slice are all NARROW (per-row
    expression work inside whole-stage codegen) — chunking shuffles
    NOTHING; output partitioning inherits the scan. The expansion factor
    is bounded by ~n_tokens/stride per document, so executor memory sees
    one document's chunks at a time, never a corpus-level blowup.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            "overlap_tokens must satisfy 0 <= overlap < chunk_tokens, got "
            f"{overlap_tokens} vs {chunk_tokens}"
        )
    stride = chunk_tokens - overlap_tokens
    # regex-strip ALL whitespace at the edges (F.trim strips spaces only —
    # a doc starting with a tab would otherwise yield a phantom '' token)
    # and require at least one non-whitespace char (a whitespace-only doc
    # must emit no chunks, same as empty/null)
    toks = F.split(
        F.regexp_replace(S.col(text_col), "^\\s+|\\s+$", ""), "\\s+"
    )
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(F.col("__toks")) - overlap_tokens, F.lit(1)),
        F.lit(stride),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start"), chunk_tokens)
    return (
        parallelize_narrow(df.where(S.col(text_col).rlike("\\S")))
        .select(S.col(id_col).alias("id"), toks.alias("__toks"))
        .select("id", "__toks", F.explode(starts).alias("__start"))
        .select(
            "id",
            ((F.col("__start") - 1) / stride).cast("long").alias(
                "chunk_index"
            ),
            chunk.alias("__chunk"),
        )
        .select(
            "id",
            "chunk_index",
            F.md5(
                F.concat_ws(":", F.col("id").cast("string"), "chunk_index")
            ).alias("chunk_id"),
            F.array_join(F.col("__chunk"), " ").alias("chunk_text"),
            F.size(F.col("__chunk")).cast("long").alias("n_chunk_tokens"),
        )
    )


#: line-level ban list from the C4 cleaning recipe (Raffel et al. 2020 §2.2):
#: boilerplate markers that disqualify a line regardless of shape
C4_BANNED_SUBSTRINGS = ("javascript", "lorem ipsum", "{")


def c4_line_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 3,
    terminal_punct: str = '[.!?"]',
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    lines that (a) end in a terminal punctuation mark, (b) have at least
    ``min_words`` whitespace-delimited words, and (c) contain none of the
    boilerplate markers (``javascript``, ``lorem ipsum``, ``{``,
    case-insensitive). One output row per document: ``(id, text_clean,
    n_lines, n_lines_kept)`` — the kept lines rejoined with newlines, plus
    the counts a page-level gate (e.g. drop docs with < N clean lines)
    filters on.

    Pure array higher-order functions over each row (split → filter →
    array_join): NARROW, whole-stage codegen, zero shuffle — cleaning runs
    at scan speed on any corpus size. Null documents pass through with
    null text_clean/counts (the C4 page filter drops them downstream).
    """
    df = parallelize_narrow(df)
    ln = F.split(S.col(text_col), "\n")

    def keep(x: Column) -> Column:
        t = F.trim(x)
        lower = F.lower(t)
        banned = None
        for b in C4_BANNED_SUBSTRINGS:
            hit = lower.contains(b)
            banned = hit if banned is None else (banned | hit)
        return (
            (F.size(F.split(t, "\\s+")) >= min_words)
            & t.rlike(terminal_punct + "$")
            & ~banned
        )

    kept = F.filter(ln, keep)
    return df.select(
        S.col(id_col).alias("id"),
        F.array_join(kept, "\n").alias("text_clean"),
        F.size(ln).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Corpus keyword extraction: the top-``k`` TF-IDF terms per document —
    ``(id, rank, term, tf, df, score)`` with the sklearn-style smoothed IDF
    ``ln((N + 1) / (df + 1)) + 1`` (never zero, no division blowups on
    corpus-wide terms).

    Determinism across engines: score is ROUNDED (4 decimals) before
    ranking and ties break on ``term`` ascending, so an independent SQL
    engine reproduces the exact ranking (ulp-level ``ln`` differences
    cannot reorder).

    100 TB shape: four exchanges, each bounded — (doc,term) partial-agged
    term counts, a vocab-sized document-frequency aggregate REUSED from the
    (doc,term) table (no second corpus scan), a term-keyed join of the two,
    and a per-doc ranking window whose groups are bounded by document
    length (never corpus-sized). N arrives as a broadcast 1-row aggregate,
    not a driver round-trip inside the plan.
    """
    tok = parallelize_narrow(df).select(
        S.col(id_col).alias("id"),
        F.explode(tokens(S.col(text_col))).alias("term"),
    )
    tf = tok.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # document frequency from the (doc,term) aggregate — one row per
    # (doc,term) already, so df is a plain count, not a count_distinct
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        dfreq = dfreq.where(F.col("df") >= min_df)
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                4,
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("id", "rank", "term", "tf", "df", "score")
    )


def ngram_lm_train(
    ref: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    unk: str = "<unk>",
) -> tuple[DataFrame, DataFrame]:
    """"Train" a bigram language model on a REFERENCE corpus — the
    CCNet-style quality-filter recipe (score web documents by how well a
    clean-corpus LM predicts them; KenLM 5-gram in the paper, a bigram +
    add-alpha tier here — same pipeline seam, dependency-free and
    engine-reproducible). Returns ``(unigrams, bigrams)`` count tables:

    * ``unigrams(w, c)`` — the top-``vocab_size`` terms by (count desc,
      term asc — deterministic cut) plus one ``unk`` row carrying the
      summed count of everything out-of-vocabulary.
    * ``bigrams(w1, w2, c)`` — consecutive-token pair counts AFTER
      unk-mapping (the standard order: map, then count).

    Scale shape: one token explode + groupBy for the counts; the vocab cut
    is a distributed TakeOrdered (no single-partition sort); unk-mapping
    joins are broadcasts of the bounded vocab; the bigram aggregate is one
    (w1, w2) exchange. Both outputs are bounded by vocab² worst-case and
    by observed pairs in practice — persist them once, score forever."""
    toks = parallelize_narrow(ref).select(
        F.explode(tokens(S.col(text_col))).alias("w")
    )
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        counts.orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(vocab_size)
        .select("w", "c")
    )
    unk_row = (
        counts.join(F.broadcast(vocab.select("w")), "w", "left_anti")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("c"))
        .select(F.lit(unk).alias("w"), "c")
    )
    unigrams = vocab.unionByName(unk_row)

    t = tokens(S.col(text_col))
    pairs = (
        parallelize_narrow(ref)
        .select(t.alias("__t"))
        .where(F.size("__t") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("__t"), 1, F.size("__t") - 1),
                    F.slice(F.col("__t"), 2, F.size("__t") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    v = vocab.select("w")
    mapped = (
        pairs.join(
            F.broadcast(v.withColumnRenamed("w", "__v1")),
            F.col("w1") == F.col("__v1"),
            "left",
        )
        .join(
            F.broadcast(v.withColumnRenamed("w", "__v2")),
            F.col("w2") == F.col("__v2"),
            "left",
        )
        .select(
            F.coalesce("__v1", F.lit(unk)).alias("w1"),
            F.coalesce("__v2", F.lit(unk)).alias("w2"),
        )
    )
    bigrams = mapped.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    # persist BOTH tables (bounded by construction): the scorer consumes
    # unigrams three times (V count, vocab broadcasts, the c1 join) and
    # bigrams once — unpersisted, every consumer would re-tokenize the
    # whole reference corpus through this lineage (review r7). Callers
    # that persist to real tables can .unpersist() after writing.
    from pyspark import StorageLevel

    return (
        unigrams.persist(StorageLevel.MEMORY_AND_DISK),
        bigrams.persist(StorageLevel.MEMORY_AND_DISK),
    )


def lm_perplexity_score(
    df: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    unk: str = "<unk>",
    round_to: int = 6,
) -> DataFrame:
    """Score documents by a reference bigram LM
    (:func:`ngram_lm_train`) — the perplexity-proxy quality signal corpus
    curation ranks on (CCNet: keep the low-perplexity tail of a
    clean-corpus LM). One row per document with >= 2 tokens:

    ``(id, n_bigrams, mean_logp, ppl)`` where
    ``logp_i = ln((C(w1,w2) + alpha) / (C(w1) + alpha·V))`` (add-alpha
    smoothing, V = |vocab| + 1 for unk), ``mean_logp`` their mean
    (rounded to ``round_to``) and ``ppl = exp(-mean_logp)`` (FIXED at 4
    decimals — ppl's magnitude makes more precision noise; only
    ``mean_logp`` follows ``round_to``). OOV tokens map to ``unk``
    exactly as in training. Deterministic given the model tables, so an
    independent engine reproduces it bit-for-bit at these roundings.

    Scale shape: docs explode once into consecutive pairs; the model
    participates through two broadcast joins (vocab map) + a pair-keyed
    left join (bigram counts) + a broadcast unigram join; one final
    per-doc aggregate."""
    V = unigrams.count()  # bounded table — cheap, exact
    t = tokens(S.col(text_col))
    pairs = (
        parallelize_narrow(df)
        .select(S.col(id_col).alias("__id"), t.alias("__t"))
        .where(F.size("__t") >= 2)
        .select(
            "__id",
            F.explode(
                F.zip_with(
                    F.slice(F.col("__t"), 1, F.size("__t") - 1),
                    F.slice(F.col("__t"), 2, F.size("__t") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p"),
        )
        .select("__id", "p.w1", "p.w2")
    )
    v = unigrams.where(F.col("w") != unk).select("w")
    mapped = (
        pairs.join(
            F.broadcast(v.withColumnRenamed("w", "__v1")),
            F.col("w1") == F.col("__v1"),
            "left",
        )
        .join(
            F.broadcast(v.withColumnRenamed("w", "__v2")),
            F.col("w2") == F.col("__v2"),
            "left",
        )
        .select(
            "__id",
            F.coalesce("__v1", F.lit(unk)).alias("w1"),
            F.coalesce("__v2", F.lit(unk)).alias("w2"),
        )
    )
    scored = (
        mapped.join(bigrams.withColumnRenamed("c", "__c12"), ["w1", "w2"], "left")
        .join(
            F.broadcast(
                unigrams.select(F.col("w").alias("w1"), F.col("c").alias("__c1"))
            ),
            "w1",
            "left",
        )
        .select(
            "__id",
            F.log(
                (F.coalesce("__c12", F.lit(0)) + F.lit(alpha))
                / (F.coalesce("__c1", F.lit(0)) + F.lit(alpha) * F.lit(float(V)))
            ).alias("__lp"),
        )
    )
    return (
        scored.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("__lp"), round_to).alias("mean_logp"),
            F.round(F.exp(-F.avg("__lp")), 4).alias("ppl"),
        )
        .withColumnRenamed("__id", id_col)
    )
