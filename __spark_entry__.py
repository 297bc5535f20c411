"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator from SURVEY.md §2 implemented by
``pandas_profiling_personal_spark``; ``oracle_sql()`` holds the equivalent DuckDB
SQL. Both sides are generated from the shared spec in
``pandas_profiling_personal_spark/parity.py`` so aliases/rounding/tie-breaks match.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pandas_profiling_personal_spark import parity as P
from pandas_profiling_personal_spark import parity_pipeline as PP

LINEITEM_NUMERIC = [
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_linenumber",
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
]
LINEITEM_ALL = LINEITEM_NUMERIC + ["l_returnflag", "l_linestatus", "l_shipdate"]
CUSTOMER_STRINGS = ["c_name", "c_mktsegment"]
DUP_SUBSET = ["l_returnflag", "l_linestatus", "l_quantity", "l_discount", "l_tax"]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: single-pass scalar profile of lineitem at sf0.001."""
    return P.numeric_summary_query("lineitem", LINEITEM_NUMERIC)(
        spark, "/root/testdata/sf0.001"
    )


_SPECS: dict[str, tuple] = {
    # (spark_query_fn, oracle_sql or None)
    #
    # ORDERING CONTRACT: the driver records the FIRST 50 entries only. With
    # more distinct operator families than window slots (r6+), the window
    # holds one row per family, favouring rows the driver has NEVER recorded
    # and retiring rows whose machinery is exercised by an in-window kin
    # (e.g. exact_dedup/minhash_lsh retire to the tail once the incremental
    # store tiers — which run the same fingerprint/signature pipelines plus
    # the store round-trip — and the funnel's full near-dup tier hold window
    # rows). r7 rotation: in — image_near_dup + embedding_drift (new) and
    # exact_dedup/drift_psi_categorical/grouped_top_k (driver evidence stale
    # since r4/r5); out — ngram_jaccard_pairs (kin dedup_clusters),
    # media_metadata (kin image_near_dup), embedding_stats (kin
    # embedding_drift), token_overlap (kin contamination),
    # top_duplicates_lineitem (kin duplicate_stats_orders). r8 rotation:
    # in — the five r7 tail additions that have never had a driver row
    # (image_dedup_keep_list, pack_sequences, audio_metadata, lm_perplexity,
    # canonical_url) plus cosine_topk + session_stats (stale since r4);
    # out — image_near_dup (kin image_dedup_keep_list, which runs the same
    # decode->phash->banded-pairs pipeline plus clustering), exact_dedup
    # (kin incremental_exact_dedup), drift_psi_categorical (kin
    # drift_psi_lineitem), grouped_top_k (kin top_k_part_brand), mad (kin
    # numeric_summary quantile machinery), value_counts_returnflag (kin
    # value-count head of top_k/char_counts), phik_contingency (kin
    # cramers_v contingency shuffle) — all seven r7-green, so their family
    # evidence is fresh while they sit out. numeric_summary_nation stays in
    # the tail: same operator as in-window numeric_summary_lineitem.
    # r8 rotation, second pass (the six operators BUILT this round get
    # driver evidence this round): in — audio_near_dup, video_near_dup,
    # incremental_pearson, incremental_drift, incremental_embedding_drift,
    # incremental_image_dedup; out (all r7-green, kin-covered) —
    # drift_psi_lineitem and embedding_drift (their incremental twins run
    # the SAME oracle SQL over a superset path), url_parts (kin
    # canonical_url), histogram_extendedprice (kin incremental_drift's
    # per-shard histogram_all + shared bucket arithmetic),
    # incremental_minhash_dedup (kin incremental_image_dedup store round
    # trip + in-window incremental_exact_dedup), tfidf_top_terms (text
    # family: text_profile/chunk/c4/repetition all in-window). All
    # entries — both windows — are verified by tests/test_oracle_parity.py
    # locally every round.
    "numeric_summary_lineitem": (
        P.numeric_summary_query("lineitem", LINEITEM_NUMERIC),
        P.numeric_summary_sql("lineitem", LINEITEM_NUMERIC),
    ),
    "image_dedup_keep_list_documents": (
        PP.image_dedup_keep_list_query(),
        PP.image_dedup_keep_list_sql(),
    ),
    "pack_sequences_documents": (
        PP.pack_sequences_query(),
        PP.pack_sequences_sql(),
    ),
    "top_k_part_brand": (
        P.top_k_query("part", "p_brand", 5),
        P.top_k_sql("part", "p_brand", 5),
    ),
    "distinct_unique_lineitem": (
        P.distinct_unique_query("lineitem", LINEITEM_ALL),
        P.distinct_unique_sql("lineitem", LINEITEM_ALL),
    ),
    "missing_counts_events": (
        P.missing_counts_query(
            "events", ["event_id", "ts", "user_id", "event_type", "value", "props"]
        ),
        P.missing_counts_sql(
            "events", ["event_id", "ts", "user_id", "event_type", "value", "props"]
        ),
    ),
    "incremental_pearson_lineitem": (
        PP.incremental_pearson_query(),
        PP.incremental_pearson_sql(),
    ),
    "duplicate_stats_orders": (
        P.duplicate_stats_query("orders"),
        P.duplicate_stats_sql("orders"),
    ),
    "string_lengths_customer": (
        P.string_lengths_query("customer", CUSTOMER_STRINGS),
        P.string_lengths_sql("customer", CUSTOMER_STRINGS),
    ),
    "date_stats_orders": (
        P.date_stats_query("orders", ["o_orderdate"]),
        P.date_stats_sql("orders", ["o_orderdate"]),
    ),
    "pearson_lineitem": (
        P.pearson_query(
            "lineitem", ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
        ),
        P.pearson_sql(
            "lineitem", ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
        ),
    ),
    "json_extract_events": (P.json_props_query(), P.json_props_sql()),
    "cramers_v_lineitem": (
        P.cramers_v_query("lineitem", "l_returnflag", "l_linestatus"),
        P.cramers_v_sql("lineitem", "l_returnflag", "l_linestatus"),
    ),
    "spearman_lineitem": (
        P.spearman_query("lineitem", ["l_quantity", "l_extendedprice", "l_discount"]),
        P.spearman_sql("lineitem", ["l_quantity", "l_extendedprice", "l_discount"]),
    ),
    "kendall_customer": (
        P.kendall_query("customer", ["c_custkey", "c_nationkey", "c_acctbal"]),
        P.kendall_sql("customer", ["c_custkey", "c_nationkey", "c_acctbal"]),
    ),
    "char_counts_customer": (
        P.char_counts_query("customer", "c_mktsegment"),
        P.char_counts_sql("customer", "c_mktsegment"),
    ),
    "corpus_funnel_documents": (
        PP.corpus_funnel_query(),
        PP.corpus_funnel_sql(),
    ),
    "grouped_summary_lineitem": (
        P.grouped_summary_query(),
        P.grouped_summary_sql(),
    ),
    "incremental_drift_lineitem": (
        PP.incremental_drift_query(),
        P.drift_sql(),
    ),
    "incremental_exact_dedup_documents": (
        PP.incremental_exact_dedup_query(250),
        PP.incremental_exact_dedup_sql(250),
    ),
    "stratified_sample_documents": (
        P.stratified_sample_query("documents", "lang", 5, "doc_id"),
        P.stratified_sample_sql("documents", "lang", 5, "doc_id"),
    ),
    "incremental_image_dedup_documents": (
        PP.incremental_image_dedup_query(),
        PP.incremental_image_dedup_sql(),
    ),
    "scatter_lineitem": (
        P.scatter_query("lineitem", "l_quantity", "l_extendedprice", 16),
        P.scatter_sql("lineitem", "l_quantity", "l_extendedprice", 16),
    ),
    "session_stats_events": (
        P.session_stats_query("events", "user_id", "ts", 30),
        P.session_stats_sql("events", "user_id", "ts", 30),
    ),
    "audio_near_dup_documents": (
        PP.audio_near_dup_query(),
        PP.audio_near_dup_sql(),
    ),
    "video_near_dup_documents": (
        PP.video_near_dup_query(),
        PP.video_near_dup_sql(),
    ),
    "path_parts_events": (P.path_parts_query(), P.path_parts_sql()),
    "complex_stats_lineitem": (
        P.complex_stats_query("lineitem"),
        P.complex_stats_sql("lineitem"),
    ),
    # --- training-data pipeline operators (documents / embeddings) -----------
    "text_profile_documents": (PP.text_profile_query(), PP.text_profile_sql()),
    "pii_scan_documents": (PP.pii_scan_query(), PP.pii_scan_sql()),
    "quality_filter_documents": (
        PP.quality_filter_query(),
        PP.quality_filter_sql(),
    ),
    "packing_stats_documents": (
        PP.packing_stats_query(256),
        PP.packing_stats_sql(256),
    ),
    "chunk_documents": (
        PP.chunk_documents_query(64, 16),
        PP.chunk_documents_sql(64, 16),
    ),
    "c4_line_filter_documents": (
        PP.c4_line_filter_query(4),
        PP.c4_line_filter_sql(4),
    ),
    "mixture_plan_documents": (
        PP.mixture_plan_query(),
        PP.mixture_plan_sql(),
    ),
    "contamination_documents": (
        PP.contamination_query(8, 37),
        PP.contamination_sql(8, 37),
    ),
    "span_dedup_documents": (
        PP.span_dedup_query(10),
        PP.span_dedup_sql(10),
    ),
    "repetition_profile_documents": (
        PP.repetition_query(2),
        PP.repetition_sql(2),
    ),
    "key_skew_events": (
        P.key_skew_query("events", ["event_type"], 5),
        P.key_skew_sql("events", ["event_type"], 5),
    ),
    "join_fanout_orders_lineitem": (
        P.join_fanout_query("orders", "lineitem", ["o_orderkey"], ["l_orderkey"]),
        P.join_fanout_sql("orders", "lineitem", ["o_orderkey"], ["l_orderkey"]),
    ),
    "simhash_documents": (PP.simhash_query(32), PP.simhash_sql(32)),
    "dedup_clusters_documents": (
        PP.dedup_clusters_query(0.1),
        PP.dedup_clusters_sql(0.1),
    ),
    "semantic_dedup_embeddings": (
        PP.semantic_dedup_query(16, 0.3),
        PP.semantic_dedup_sql(16, 0.3),
    ),
    "embedding_near_dup_embeddings": (
        PP.embedding_near_dup_query(0.4),
        PP.embedding_near_dup_sql(0.4),
    ),
    "ivf_topk_embeddings": (
        PP.ivf_topk_query(5, 5, 16, 4),
        PP.ivf_topk_sql(5, 5, 16, 4),
    ),
    "audio_metadata_documents": (
        PP.audio_metadata_query(),
        PP.audio_metadata_sql(),
    ),
    "incremental_embedding_drift_embeddings": (
        PP.incremental_embedding_drift_query(),
        PP.embedding_drift_sql(),
    ),
    "lm_perplexity_documents": (
        PP.lm_perplexity_query(),
        PP.lm_perplexity_sql(),
    ),
    "canonical_url_events": (
        PP.canonical_url_query(),
        PP.canonical_url_sql(),
    ),
    "cosine_topk_embeddings": (
        PP.cosine_topk_query(5, 5),
        PP.cosine_topk_sql(5, 5),
    ),
    # ---- entry 51+ — outside the driver's 50-row window: redundant family
    # variants and rows-only-by-design queries (local oracle still covers all)
    "image_near_dup_documents": (
        PP.image_near_dup_query(),
        PP.image_near_dup_sql(),
    ),
    "exact_dedup_documents": (
        PP.exact_duplicates_query(),
        PP.exact_duplicates_sql(),
    ),
    "drift_psi_categorical": (
        P.drift_categorical_query(),
        P.drift_categorical_sql(),
    ),
    "grouped_top_k_documents": (
        P.grouped_top_k_query(),
        P.grouped_top_k_sql(),
    ),
    "mad_lineitem": (
        P.mad_query("lineitem", ["l_quantity", "l_extendedprice", "l_discount"]),
        P.mad_sql("lineitem", ["l_quantity", "l_extendedprice", "l_discount"]),
    ),
    "value_counts_returnflag": (
        P.value_counts_query("lineitem", "l_returnflag"),
        P.value_counts_sql("lineitem", "l_returnflag"),
    ),
    "phik_contingency_lineitem": (
        P.phik_contingency_query("lineitem", "l_quantity", "l_returnflag"),
        P.phik_contingency_sql("lineitem", "l_quantity", "l_returnflag"),
    ),
    # rows-only: LSH bucket membership depends on FP dot-product signs an
    # independent engine can't reproduce bit-for-bit; recall is unit-tested
    "ann_lsh_topk_embeddings": (PP.ann_lsh_topk_query(5, 5), None),
    "minhash_signatures_documents": (
        PP.minhash_signatures_query(16),
        PP.minhash_signatures_sql(16),
    ),
    "numeric_summary_nation": (
        P.numeric_summary_query("nation", ["n_nationkey", "n_regionkey"]),
        P.numeric_summary_sql("nation", ["n_nationkey", "n_regionkey"]),
    ),
    "value_counts_event_type": (
        P.value_counts_query("events", "event_type"),
        P.value_counts_sql("events", "event_type"),
    ),
    "mixture_upsampled_documents": (
        PP.mixture_upsampled_query(3.0),
        PP.mixture_upsampled_sql(3.0),
    ),
    # φk value itself is a driver-side bisection over a bivariate-normal
    # integral — not SQL-expressible; rows-only check (contingency is the
    # oracle-checked distributed core above)
    "phik_mixed_lineitem": (
        P.phik_mixed_query(
            "lineitem",
            ["l_quantity", "l_extendedprice"],
            ["l_returnflag", "l_linestatus"],
        ),
        None,
    ),
    "pii_summary_documents": (PP.pii_summary_query(), PP.pii_summary_sql()),
    "pii_redact_documents": (PP.pii_redact_query(), PP.pii_redact_sql()),
    "mixture_counts_documents": (
        PP.mixture_counts_query(),
        PP.mixture_counts_sql(),
    ),
    "monotonicity_orders": (
        P.monotonicity_query("orders", "o_totalprice", "o_orderkey"),
        P.monotonicity_sql("orders", "o_totalprice", "o_orderkey"),
    ),
    "tail_sample_orders": (
        P.tail_sample_query(
            "orders", ["o_orderkey", "o_custkey", "o_totalprice"], "o_orderkey", 7
        ),
        P.tail_sample_sql(
            "orders", ["o_orderkey", "o_custkey", "o_totalprice"], "o_orderkey", 7
        ),
    ),
    "split_counts_orders": (
        P.split_counts_query("orders", "o_orderkey", "o_orderstatus"),
        P.split_counts_sql("orders", "o_orderkey", "o_orderstatus"),
    ),
    "dedup_keep_list_documents": (
        PP.dedup_keep_list_query(0.1),
        PP.dedup_keep_list_sql(0.1),
    ),
    "hourly_rollup_events": (
        P.time_rollup_query("events", "ts", "event_type", "value"),
        P.time_rollup_sql("events", "ts", "event_type", "value"),
    ),
    "minhash_lsh_dedup_documents": (
        PP.minhash_dedup_query(16, 4, 0.5),
        PP.minhash_dedup_sql(16, 4, 0.5),
    ),
    "ngram_jaccard_pairs_documents": (
        PP.jaccard_pairs_query(0.1),
        PP.jaccard_pairs_sql(0.1),
    ),
    "media_metadata_documents": (
        PP.media_metadata_query(),
        PP.media_metadata_sql(),
    ),
    "embedding_stats_embeddings": (
        PP.embedding_stats_query(),
        PP.embedding_stats_sql(),
    ),
    "token_overlap_documents": (
        PP.corpus_overlap_query("token"),
        PP.corpus_overlap_sql("token"),
    ),
    "top_duplicates_lineitem": (
        P.top_duplicates_query("lineitem", DUP_SUBSET, 10),
        P.top_duplicates_sql("lineitem", DUP_SUBSET, 10),
    ),
    # r8 additions (tail — r9 window candidates): mergeable-Pearson shard
    # states vs the whole-frame corr an independent engine computes, and
    # audio near-dup (fake tier) vs an all-pairs Hamming rebuild
    "histogram_extendedprice": (
        P.histogram_query("lineitem", "l_extendedprice", 10),
        P.histogram_sql("lineitem", "l_extendedprice", 10),
    ),
    "drift_psi_lineitem": (P.drift_query(), P.drift_sql()),
    # r8: frame-vote video near-dup — the codec stays stubbed (libav absent)
    # but the distributed shape is real and oracle-checked on the fake tier
    "incremental_minhash_dedup_documents": (
        PP.incremental_minhash_dedup_query(250),
        PP.incremental_minhash_dedup_sql(250),
    ),
    # r8: PSI from mergeable shard STATES vs the raw-frame SQL rebuild —
    # the oracle is drift_sql itself, proving state drift == frame drift
    "url_parts_events": (P.url_parts_query(), P.url_parts_sql()),
    # r8: embedding drift from mergeable states — oracle is the batch
    # operator's own SQL rebuild (state drift == frame drift, embeddings)
    "tfidf_top_terms_documents": (
        PP.tfidf_top_terms_query(5),
        PP.tfidf_top_terms_sql(5),
    ),
    # r8: Hamming signature-store dedup (image fake tier, full two-step
    # round trip) vs the union-rule SQL rebuild
    "embedding_drift_embeddings": (
        PP.embedding_drift_query(),
        PP.embedding_drift_sql(),
    ),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec[0] for name, spec in _SPECS.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec[1] for name, spec in _SPECS.items() if spec[1] is not None}
