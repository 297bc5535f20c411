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
    # more distinct operator families than window slots, the window holds
    # one row per family, favouring rows the driver has NEVER recorded and
    # retiring rows whose machinery is exercised by an in-window kin. Full
    # rotation history for r7/r8/r9 lives in git (b952a02^, f1f1c88^);
    # every entry — window and tail — is verified by
    # tests/test_oracle_parity.py locally every round.
    #
    # r10 rotation: in — the 5 NEW temporal/time-series specs (asof_state,
    # range_join, acf, rolling_trend, seasonal_profile — operators the
    # reference lacks entirely, oracled against DuckDB ASOF JOIN / window
    # frames), the 5 rows whose last driver evidence was r6
    # (ngram_jaccard_pairs, media_metadata, embedding_stats, token_overlap,
    # top_duplicates) and the 13 r7 rows (image_near_dup, exact_dedup,
    # drift_psi_categorical, grouped_top_k, mad, value_counts_returnflag,
    # phik_contingency, histogram_extendedprice, drift_psi_lineitem,
    # incremental_minhash_dedup, url_parts, tfidf_top_terms,
    # embedding_drift). out — 23 r9-green rows whose machinery keeps an
    # in-window kin: binary_format_mix + video_metadata + audio_near_dup
    # (kin media_metadata — same sniff/decode seam; Hamming banding kin
    # incremental_image_dedup stays), date_stats + json_extract (kin
    # canonical_url stays; time ops acf/seasonal_profile incoming),
    # spearman + kendall (kin pearson stays + phik_contingency incoming),
    # char_counts (kin token_overlap/text_profile), packing_stats (kin
    # chunk_documents stays), simhash (kin ngram_jaccard incoming),
    # semantic_dedup + ivf_topk (kin embedding_near_dup stays +
    # ann_lsh_recall runs the exact scan), minhash_signatures +
    # minhash_lsh_dedup + dedup_keep_list (kin incremental_minhash_dedup +
    # exact_dedup incoming), mixture_counts (kin mixture_upsampled stays),
    # numeric_summary_nation (kin mad/histogram incoming), pii_redact (kin
    # pii_summary stays), value_counts_event_type (kin
    # value_counts_returnflag incoming — same operator), hourly_rollup
    # (kin acf/rolling_trend grid — same date_trunc aggregate),
    # monotonicity + split_counts + tail_sample (order/sample machinery:
    # kin stratified_sample stays, rolling_trend incoming). After this
    # round no SQL-backed spec's driver evidence is older than r8.
    # r10.1 (mid-round): in — ts_anomaly_events (NEW: grid spike/dip
    # flags with the EXACT scaled-integer threshold — the boolean itself
    # is the hash-matched quantity). out — contamination_documents
    # (r9-green; its token-overlap kernel IS the incoming token_overlap
    # spec's machinery, plus c4/span_dedup/quality in-window).
    # r11 rotation: in — the 17 rows whose last driver evidence was r8
    # (audio_metadata, corpus_funnel, cosine_topk, cramers_v,
    # dedup_clusters, grouped_summary, image_dedup_keep_list,
    # incremental_embedding_drift, incremental_pearson, mixture_plan,
    # numeric_summary_lineitem, pack_sequences, path_parts, pii_scan,
    # scatter, string_lengths, top_k_part_brand — VERDICT r10 #3) plus the
    # NEW phik_mixed_contingency_lineitem (the hash gate for the formerly
    # rows-only mixed φk: per-pair χ² + geometry, the exact inversion
    # inputs). rolling_trend stays to land its post-HUGEINT-fix green.
    # out (18, all r10-green, each under in-window or incoming kin):
    # asof_state + range_join + acf + seasonal_profile + ts_anomaly
    # (rolling_trend keeps the ts grid/window machinery in-window; all
    # five were recorded green this past round), referential_integrity +
    # functional_dependency + benford + grouped_checks (check_suite_orders
    # stays as the checks-family row — and re-verifies this round's NaN
    # gate change), phik_contingency (kin: incoming phik_mixed_contingency
    # — same exact-edges binning + contingency), drift_psi_lineitem (kin
    # incremental_drift_lineitem shares drift_sql verbatim),
    # embedding_drift (kin incoming incremental_embedding_drift shares
    # embedding_drift_sql), exact_dedup (kin incremental_exact_dedup
    # in-window), media_metadata (sniff/decode seam kept by image/video
    # _near_dup in-window + incoming audio_metadata), top_duplicates +
    # value_counts_returnflag (frequency/top-K machinery: incoming
    # top_k_part_brand + in-window grouped_top_k), url_parts (kin
    # canonical_url in-window + incoming path_parts), mad_lineitem (kin
    # incoming numeric_summary_lineitem — same exact-percentile tier).
    # After this round no SQL-backed spec's driver evidence is older
    # than r9.

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
    # r10.2 (mid-round): in — the NEW declarative validation family
    # (check_suite / referential_integrity / functional_dependency: the
    # CI-gate surface, operators/checks.py). out — three 9-round-green rows
    # under in-window kin: distinct_unique_lineitem (distinctness/uniqueness
    # ARE check_suite constraints now, same group-size machinery),
    # duplicate_stats_orders (kin top_duplicates_lineitem + the uniqueness
    # constraint), embedding_near_dup_embeddings (kin embedding_drift +
    # embedding_stats + ann_lsh_recall's exact scan).
    "check_suite_orders": (
        P.check_suite_query("orders"),
        P.check_suite_sql("orders"),
    ),
    # r10.3 (mid-round): in — benford_lineitem (first-digit forensic, the
    # printf-decimal extraction that IS engine-identical where log10/pow
    # arithmetic is not). out — missing_counts_events (9-round-green; its
    # null-counting machinery is the completeness constraint in the
    # in-window check_suite_orders and every null-aware aggregate).
    # r10.4 (mid-round): in — grouped_checks_documents (the per-segment
    # gate: the scalar suite per lang in ONE grouped pass — the contract a
    # mixture pipeline declares per segment). out — text_profile_documents
    # (9-round-green; its text-stat machinery keeps in-window kin
    # quality_filter + c4_line_filter + repetition_profile).
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
    # ---- entry 51+ — outside the driver's 50-row window: r8/r9-green rows
    # sitting out under kin coverage, and rows-only-by-design queries
    # (ann_lsh_topk: bucket membership not engine-reproducible — its recall
    # gate ann_lsh_recall IS in-window; phik_mixed: driver-side bisection
    # over a bivariate-normal integral, not SQL-expressible).
    # r12 rotation plan: the FOUR never-driver-recorded r11 specs below
    # (seasonal_decompose_events, check_violations_lineitem,
    # layout_stats_lineitem, plus phik_mixed_contingency if it missed this
    # window) go in first, then rows whose latest evidence is r9 — the
    # window policy (one per family, favour never/oldest) continues.
    "contamination_documents": (
        PP.contamination_query(8, 37),
        PP.contamination_sql(8, 37),
    ),
    # NEW r11 (tail for now; window is full this round): layout-advisor
    # inputs — per-column cardinality/null/skew in one melt, the numbers
    # suggest_layout's partition/bucket/salt rules consume
    # NEW r11 (tail): feature-vs-target relevance ranking — |Pearson| for
    # numeric features in one agg, correlation ratio η² for categoricals
    # in one melt (the target analysis the reference lacks)
    "target_relevance_lineitem": (
        P.target_relevance_query(),
        P.target_relevance_sql(),
    ),
    # NEW r11 (tail): score-proportional deterministic sampling — the
    # quality/temperature row-level sampler (keep_prob ∝ w^(1/T), md5
    # uniforms, one 1-row scale aggregate)
    "weighted_sample_documents": (
        PP.weighted_sample_query(),
        PP.weighted_sample_sql(),
    ),
    # NEW r11 (tail): classical additive decomposition on the bounded grid
    # (v = trend + seasonal + resid) — per-period exact-integer invariants
    "seasonal_decompose_events": (
        P.seasonal_decompose_query(),
        P.seasonal_decompose_sql(),
    ),
    # NEW r11 (tail): row-level violation sampling — WHICH values break a
    # gate, the limit-heaviest per check (Deequ row-level results)
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
    "value_counts_returnflag": (
        P.value_counts_query("lineitem", "l_returnflag"),
        P.value_counts_sql("lineitem", "l_returnflag"),
    ),
    "url_parts_events": (
        P.url_parts_query(), P.url_parts_sql(),
    ),
    "mad_lineitem": (
        P.mad_query("lineitem", ["l_quantity", "l_extendedprice", "l_discount"]),
        P.mad_sql("lineitem", ["l_quantity", "l_extendedprice", "l_discount"]),
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec[0] for name, spec in _SPECS.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec[1] for name, spec in _SPECS.items() if spec[1] is not None}
