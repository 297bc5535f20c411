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
    # more operator specs than window slots, the window is DERIVED from
    # driver-evidence age: never-recorded SQL-backed specs first, then
    # oldest latest-green round, with explicit kin exceptions for rows
    # whose machinery an in-window spec exercises. The policy is CODE, not
    # this comment: scripts/window_policy.py computes evidence ages from
    # CORRECTNESS_r*.json and tests/test_window_policy.py FAILS the suite
    # if the window violates it (VERDICT r11 #4). Rotation history for
    # r7-r13 lives in git; every entry — window and tail — is verified by
    # tests/test_oracle_parity.py locally every round.
    #
    # Since r14 the window order is applied by the explicit _WINDOW_R14
    # list below the literal (the literal keeps its r13 grouping so diffs
    # stay reviewable); rotate by regenerating that list from
    # `python scripts/window_policy.py`.

    # ---- never driver-recorded (NEW r13) -----------------------------------
    # KEY DISCOVERY — unique-column-combination mining completing the
    # FD/inclusion relationship triad (VERDICT r12 #2): explicit candidate
    # sets (production enumerates the bounded lattice with TANE minimality
    # + HLL screens) through the declared uniqueness check's one-melt
    # kernel; NULL components exercised via the derived cust_n column
    "key_discovery_orders": (
        P.key_discovery_query(),
        P.key_discovery_sql(),
    ),
    # CATALOG FK DISCOVERY — the N-table warehouse hunt (VERDICT r12 #4):
    # every ordered pair of three TPC-H tables mined in one call; one
    # stats scan per TABLE in production, prune=False here so every row
    # is exact-verified and the DuckDB oracle rebuilds the whole catalog
    "fk_catalog_tpch": (
        P.fk_catalog_query(),
        P.fk_catalog_sql(),
    ),

    # ---- latest driver evidence r10 (oldest — window head) ----------------
    "mad_lineitem": (
        P.mad_query("lineitem", ["l_quantity", "l_extendedprice", "l_discount"]),
        P.mad_sql("lineitem", ["l_quantity", "l_extendedprice", "l_discount"]),
    ),
    "value_counts_returnflag": (
        P.value_counts_query("lineitem", "l_returnflag"),
        P.value_counts_sql("lineitem", "l_returnflag"),
    ),
    "seasonal_profile_events": (
        P.seasonal_profile_query(),
        P.seasonal_profile_sql(),
    ),
    "ts_anomaly_events": (
        P.ts_anomaly_query(),
        P.ts_anomaly_sql(),
    ),
    "referential_integrity_lineitem": (
        P.referential_integrity_query(),
        P.referential_integrity_sql(),
    ),

    # ---- latest driver evidence r11 (window) -------------------------------
    "rolling_trend_events": (
        P.rolling_trend_query(),
        P.rolling_trend_sql(),
    ),
    "phik_mixed_contingency_lineitem": (
        P.phik_mixed_contingency_query(
            "lineitem",
            ["l_quantity", "l_extendedprice"],
            ["l_returnflag", "l_linestatus"],
        ),
        P.phik_mixed_contingency_sql(
            "lineitem",
            ["l_quantity", "l_extendedprice"],
            ["l_returnflag", "l_linestatus"],
        ),
    ),
    "numeric_summary_lineitem": (
        P.numeric_summary_query("lineitem", LINEITEM_NUMERIC),
        P.numeric_summary_sql("lineitem", LINEITEM_NUMERIC),
    ),
    "string_lengths_customer": (
        P.string_lengths_query("customer", CUSTOMER_STRINGS),
        P.string_lengths_sql("customer", CUSTOMER_STRINGS),
    ),
    "cramers_v_lineitem": (
        P.cramers_v_query("lineitem", "l_returnflag", "l_linestatus"),
        P.cramers_v_sql("lineitem", "l_returnflag", "l_linestatus"),
    ),
    "scatter_lineitem": (
        P.scatter_query("lineitem", "l_quantity", "l_extendedprice", 16),
        P.scatter_sql("lineitem", "l_quantity", "l_extendedprice", 16),
    ),
    "top_k_part_brand": (
        P.top_k_query("part", "p_brand", 5),
        P.top_k_sql("part", "p_brand", 5),
    ),
    "path_parts_events": (
        P.path_parts_query(), P.path_parts_sql(),
    ),
    "grouped_summary_lineitem": (
        P.grouped_summary_query(),
        P.grouped_summary_sql(),
    ),
    "incremental_pearson_lineitem": (
        PP.incremental_pearson_query(),
        PP.incremental_pearson_sql(),
    ),
    "corpus_funnel_documents": (
        PP.corpus_funnel_query(),
        PP.corpus_funnel_sql(),
    ),
    "pii_scan_documents": (
        PP.pii_scan_query(), PP.pii_scan_sql(),
    ),
    "mixture_plan_documents": (
        PP.mixture_plan_query(),
        PP.mixture_plan_sql(),
    ),
    "dedup_clusters_documents": (
        PP.dedup_clusters_query(0.1),
        PP.dedup_clusters_sql(0.1),
    ),
    "image_dedup_keep_list_documents": (
        PP.image_dedup_keep_list_query(),
        PP.image_dedup_keep_list_sql(),
    ),
    "pack_sequences_documents": (
        PP.pack_sequences_query(),
        PP.pack_sequences_sql(),
    ),
    "audio_metadata_documents": (
        PP.audio_metadata_query(),
        PP.audio_metadata_sql(),
    ),
    "incremental_embedding_drift_embeddings": (
        PP.incremental_embedding_drift_query(),
        PP.embedding_drift_sql(),
    ),
    "cosine_topk_embeddings": (
        PP.cosine_topk_query(5, 5),
        PP.cosine_topk_sql(5, 5),
    ),
    "check_suite_orders": (
        P.check_suite_query("orders"),
        P.check_suite_sql("orders"),
    ),
    "ngram_jaccard_pairs_documents": (
        PP.jaccard_pairs_query(0.1),
        PP.jaccard_pairs_sql(0.1),
    ),
    "embedding_stats_embeddings": (
        PP.embedding_stats_query(),
        PP.embedding_stats_sql(),
    ),
    "token_overlap_documents": (
        PP.corpus_overlap_query("token"),
        PP.corpus_overlap_sql("token"),
    ),
    "image_near_dup_documents": (
        PP.image_near_dup_query(),
        PP.image_near_dup_sql(),
    ),
    "drift_psi_categorical": (
        P.drift_categorical_query(),
        P.drift_categorical_sql(),
    ),
    "grouped_top_k_documents": (
        P.grouped_top_k_query(),
        P.grouped_top_k_sql(),
    ),
    "histogram_extendedprice": (
        P.histogram_query("lineitem", "l_extendedprice", 10),
        P.histogram_sql("lineitem", "l_extendedprice", 10),
    ),
    "incremental_minhash_dedup_documents": (
        PP.incremental_minhash_dedup_query(250),
        PP.incremental_minhash_dedup_sql(250),
    ),
    "tfidf_top_terms_documents": (
        PP.tfidf_top_terms_query(5),
        PP.tfidf_top_terms_sql(5),
    ),
    "pearson_lineitem": (
        P.pearson_query(
            "lineitem", ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
        ),
        P.pearson_sql(
            "lineitem", ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
        ),
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
    "session_stats_events": (
        P.session_stats_query("events", "user_id", "ts", 30),
        P.session_stats_sql("events", "user_id", "ts", 30),
    ),
    "video_near_dup_documents": (
        PP.video_near_dup_query(),
        PP.video_near_dup_sql(),
    ),
    "complex_stats_lineitem": (
        P.complex_stats_query("lineitem"),
        P.complex_stats_sql("lineitem"),
    ),
    "quality_filter_documents": (
        PP.quality_filter_query(),
        PP.quality_filter_sql(),
    ),
    "chunk_documents": (
        PP.chunk_documents_query(64, 16),
        PP.chunk_documents_sql(64, 16),
    ),
    "c4_line_filter_documents": (
        PP.c4_line_filter_query(4),
        PP.c4_line_filter_sql(4),
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
    "lm_perplexity_documents": (
        PP.lm_perplexity_query(),
        PP.lm_perplexity_sql(),
    ),

    # ---- entry 51+ — outside the driver 50-row window ----------------------
    # r11-green rows tying the newest in-window evidence (ties are legal
    # either side of the boundary per scripts/window_policy.py):
    "canonical_url_events": (
        PP.canonical_url_query(),
        PP.canonical_url_sql(),
    ),
    "incremental_cramers_v_lineitem": (
        PP.incremental_cramers_v_query(),
        PP.incremental_cramers_v_sql(),
    ),
    "ann_lsh_recall_embeddings": (
        PP.ann_lsh_recall_query(5, 5),
        PP.ann_lsh_recall_sql(5, 5),
    ),
    "mixture_upsampled_documents": (
        PP.mixture_upsampled_query(3.0),
        PP.mixture_upsampled_sql(3.0),
    ),
    "pii_summary_documents": (
        PP.pii_summary_query(), PP.pii_summary_sql(),
    ),

    # r12-green rows (recorded hash-matched last round):
    "target_relevance_lineitem": (
        P.target_relevance_query(),
        P.target_relevance_sql(),
    ),
    "weighted_sample_documents": (
        PP.weighted_sample_query(),
        PP.weighted_sample_sql(),
    ),
    "seasonal_decompose_events": (
        P.seasonal_decompose_query(),
        P.seasonal_decompose_sql(),
    ),
    "check_violations_lineitem": (
        P.check_violations_query(),
        P.check_violations_sql(),
    ),
    "layout_stats_lineitem": (
        P.layout_stats_query(
            "lineitem",
            ["l_returnflag", "l_linestatus", "l_orderkey",
             "l_partkey", "l_shipdate"],
        ),
        P.layout_stats_sql(
            "lineitem",
            ["l_returnflag", "l_linestatus", "l_orderkey",
             "l_partkey", "l_shipdate"],
        ),
    ),
    "incremental_target_relevance_lineitem": (
        PP.incremental_target_relevance_query(),
        PP.incremental_target_relevance_sql(),
    ),
    "fd_discovery_lineitem": (
        P.fd_discovery_query(),
        P.fd_discovery_sql(),
    ),
    "fk_discovery_orders_customer": (
        P.fk_discovery_query(),
        P.fk_discovery_sql(),
    ),
    "contamination_documents": (
        PP.contamination_query(8, 37),
        PP.contamination_sql(8, 37),
    ),
    "distinct_unique_lineitem": (
        P.distinct_unique_query("lineitem", LINEITEM_ALL),
        P.distinct_unique_sql("lineitem", LINEITEM_ALL),
    ),
    "duplicate_stats_orders": (
        P.duplicate_stats_query("orders"),
        P.duplicate_stats_sql("orders"),
    ),
    "embedding_near_dup_embeddings": (
        PP.embedding_near_dup_query(0.4),
        PP.embedding_near_dup_sql(0.4),
    ),
    "missing_counts_events": (
        P.missing_counts_query(
            "events", ["event_id", "ts", "user_id", "event_type", "value", "props"]
        ),
        P.missing_counts_sql(
            "events", ["event_id", "ts", "user_id", "event_type", "value", "props"]
        ),
    ),
    "text_profile_documents": (
        PP.text_profile_query(), PP.text_profile_sql(),
    ),
    "binary_format_mix_documents": (
        PP.binary_format_mix_query(),
        PP.binary_format_mix_sql(),
    ),
    "date_stats_orders": (
        P.date_stats_query("orders", ["o_orderdate"]),
        P.date_stats_sql("orders", ["o_orderdate"]),
    ),
    "json_extract_events": (
        P.json_props_query(), P.json_props_sql(),
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
    "video_metadata_documents": (
        PP.video_metadata_query(),
        PP.video_metadata_sql(),
    ),
    "audio_near_dup_documents": (
        PP.audio_near_dup_query(),
        PP.audio_near_dup_sql(),
    ),
    "packing_stats_documents": (
        PP.packing_stats_query(256),
        PP.packing_stats_sql(256),
    ),
    "simhash_documents": (
        PP.simhash_query(32), PP.simhash_sql(32),
    ),
    "semantic_dedup_embeddings": (
        PP.semantic_dedup_query(16, 0.3),
        PP.semantic_dedup_sql(16, 0.3),
    ),
    "ivf_topk_embeddings": (
        PP.ivf_topk_query(5, 5, 16, 4),
        PP.ivf_topk_sql(5, 5, 16, 4),
    ),
    "minhash_signatures_documents": (
        PP.minhash_signatures_query(16),
        PP.minhash_signatures_sql(16),
    ),
    "mixture_counts_documents": (
        PP.mixture_counts_query(),
        PP.mixture_counts_sql(),
    ),
    "numeric_summary_nation": (
        P.numeric_summary_query("nation", ["n_nationkey", "n_regionkey"]),
        P.numeric_summary_sql("nation", ["n_nationkey", "n_regionkey"]),
    ),
    "pii_redact_documents": (
        PP.pii_redact_query(), PP.pii_redact_sql(),
    ),
    "value_counts_event_type": (
        P.value_counts_query("events", "event_type"),
        P.value_counts_sql("events", "event_type"),
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
    "monotonicity_orders": (
        P.monotonicity_query("orders", "o_totalprice", "o_orderkey"),
        P.monotonicity_sql("orders", "o_totalprice", "o_orderkey"),
    ),
    "split_counts_orders": (
        P.split_counts_query("orders", "o_orderkey", "o_orderstatus"),
        P.split_counts_sql("orders", "o_orderkey", "o_orderstatus"),
    ),
    "tail_sample_orders": (
        P.tail_sample_query(
            "orders", ["o_orderkey", "o_custkey", "o_totalprice"], "o_orderkey", 7
        ),
        P.tail_sample_sql(
            "orders", ["o_orderkey", "o_custkey", "o_totalprice"], "o_orderkey", 7
        ),
    ),
    "asof_state_events": (
        P.asof_state_query(),
        P.asof_state_sql(),
    ),
    "range_join_events": (
        P.range_join_query(),
        P.range_join_sql(),
    ),
    "acf_events": (
        P.acf_query(),
        P.acf_sql(),
    ),
    "functional_dependency_lineitem": (
        P.functional_dependency_query(),
        P.functional_dependency_sql(),
    ),
    "benford_lineitem": (
        P.benford_query(),
        P.benford_sql(),
    ),
    "grouped_checks_documents": (
        P.grouped_checks_query(),
        P.grouped_checks_sql(),
    ),
    "phik_contingency_lineitem": (
        P.phik_contingency_query("lineitem", "l_quantity", "l_returnflag"),
        P.phik_contingency_sql("lineitem", "l_quantity", "l_returnflag"),
    ),
    "drift_psi_lineitem": (
        P.drift_query(), P.drift_sql(),
    ),
    "embedding_drift_embeddings": (
        PP.embedding_drift_query(),
        PP.embedding_drift_sql(),
    ),
    "exact_dedup_documents": (
        PP.exact_duplicates_query(),
        PP.exact_duplicates_sql(),
    ),
    "media_metadata_documents": (
        PP.media_metadata_query(),
        PP.media_metadata_sql(),
    ),
    "top_duplicates_lineitem": (
        P.top_duplicates_query("lineitem", DUP_SUBSET, 10),
        P.top_duplicates_sql("lineitem", DUP_SUBSET, 10),
    ),
    "url_parts_events": (
        P.url_parts_query(), P.url_parts_sql(),
    ),

    # rows-only by design (ann_lsh_topk: bucket membership not engine-
    # reproducible — its recall gate ann_lsh_recall is SQL-backed;
    # phik_mixed: driver-side bisection over a bivariate-normal integral,
    # not SQL-expressible — its contingency hash gate is SQL-backed)
    "ann_lsh_topk_embeddings": (
        PP.ann_lsh_topk_query(5, 5), None,
    ),
    "phik_mixed_lineitem": (
        P.phik_mixed_query(
            "lineitem",
            ["l_quantity", "l_extendedprice"],
            ["l_returnflag", "l_linestatus"],
        ),
        None,
    ),
}


# r15 driver window (generated by scripts/window_policy.py
# propose_window() over CORRECTNESS_r*.json evidence ages): rule 0 puts
# fk_catalog_tpch first (touched by the r14 checks.py tolerant-stats fix
# the same round it rotated out — no driver evidence since); then the 7
# rows whose latest evidence is r12, then the 42 oldest r13-green rows.
# The 7 remaining r13 rows tie at age r13 with the newest in-window
# evidence (ties may sit either side); the 50 r14-green rows and the 2
# rows-only-by-design specs fill the tail in literal order.
_WINDOW_R15 = [
    # rule 0: touched last round, no driver evidence since
    "fk_catalog_tpch",
    # latest driver evidence r12 (oldest — window head)
    "phik_contingency_lineitem",
    "drift_psi_lineitem",
    "embedding_drift_embeddings",
    "exact_dedup_documents",
    "media_metadata_documents",
    "top_duplicates_lineitem",
    "url_parts_events",
    # latest driver evidence r13
    "key_discovery_orders",
    "mad_lineitem",
    "value_counts_returnflag",
    "seasonal_profile_events",
    "ts_anomaly_events",
    "referential_integrity_lineitem",
    "rolling_trend_events",
    "phik_mixed_contingency_lineitem",
    "numeric_summary_lineitem",
    "string_lengths_customer",
    "cramers_v_lineitem",
    "scatter_lineitem",
    "top_k_part_brand",
    "path_parts_events",
    "grouped_summary_lineitem",
    "incremental_pearson_lineitem",
    "corpus_funnel_documents",
    "pii_scan_documents",
    "mixture_plan_documents",
    "dedup_clusters_documents",
    "image_dedup_keep_list_documents",
    "pack_sequences_documents",
    "audio_metadata_documents",
    "incremental_embedding_drift_embeddings",
    "cosine_topk_embeddings",
    "check_suite_orders",
    "ngram_jaccard_pairs_documents",
    "embedding_stats_embeddings",
    "token_overlap_documents",
    "image_near_dup_documents",
    "drift_psi_categorical",
    "grouped_top_k_documents",
    "histogram_extendedprice",
    "incremental_minhash_dedup_documents",
    "tfidf_top_terms_documents",
    "pearson_lineitem",
    "incremental_drift_lineitem",
    "incremental_exact_dedup_documents",
    "stratified_sample_documents",
    "incremental_image_dedup_documents",
    "session_stats_events",
    "video_near_dup_documents",
]
_SPECS = {
    name: _SPECS[name]
    for name in _WINDOW_R15 + [n for n in _SPECS if n not in _WINDOW_R15]
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec[0] for name, spec in _SPECS.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec[1] for name, spec in _SPECS.items() if spec[1] is not None}
