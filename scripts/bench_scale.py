#!/usr/bin/env python3
"""Scale-curve measurement (VERDICT r3 #10 stretch): the flagship profile and
the pipeline headliners at sf0.01 / sf0.1 / sf1 (sf1 from scripts/gen_sf1.py,
10x the driver's largest tier). If per-row cost dominates, wall should grow
~linearly with rows; the gap below linear is the fixed plan/codegen overhead
amortizing — the closest local proxy for the 100x cluster story.

Prints one JSON line: {"points": {sf: {workload: sec}}, "rows": {...}}.
Each wall is min-of-2 (see bench.py for the pause rationale).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TIERS = {
    "0.01": "/root/testdata/sf0.01",
    "0.1": "/root/testdata/sf0.1",
    "1": os.path.join(os.path.dirname(__file__), "..", "testdata_sf1"),
}


def main() -> None:
    from pyspark.sql import functions as F

    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.operators import (
        dedup as DD,
        similarity as SIM,
        text as TX,
    )
    from pandas_profiling_personal_spark.session import get_session
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    spark = get_session(app_name="bench_scale")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(run) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        return round(best, 3)

    # warm up JVM/codegen/JIT on the smallest tier so the first measured tier
    # doesn't absorb all compilation cost (same rationale as bench.py: cold
    # interpreted-HOF paths run 10-20x slow for their first executions)
    warm = next((d for d in TIERS.values() if os.path.isdir(d)), None)
    if warm:
        wli = read_parquet(spark, f"{warm}/lineitem.parquet")
        wdocs = read_parquet(spark, f"{warm}/documents.parquet")
        wemb = read_parquet(spark, f"{warm}/embeddings.parquet")
        for _ in range(2):
            profile(wli, ProfileConfig(exact=False))
            DD.minhash_dedup(
                wdocs, "doc_id", "text", num_hashes=32, bands=8,
                hash_fn="xxhash64",
            ).count()
            TX.text_profile(wdocs, "text", "doc_id").agg(F.sum("n_tokens")).first()
            SIM.ann_topk_lsh(
                wemb, wemb.where(F.col("vec_id") < 50), dim=64, k=10
            ).count()

    points: dict[str, dict[str, float]] = {}
    rows: dict[str, dict[str, int]] = {}
    for sf, d in TIERS.items():
        if not os.path.isdir(d):
            continue
        li = read_parquet(spark, f"{d}/lineitem.parquet")
        docs = read_parquet(spark, f"{d}/documents.parquet")
        emb = read_parquet(spark, f"{d}/embeddings.parquet")
        rows[sf] = {
            "lineitem": li.count(),
            "documents": docs.count(),
            "embeddings": emb.count(),
        }
        p: dict[str, float] = {}
        p["full_profile_lineitem"] = timed(
            lambda: profile(li, ProfileConfig(exact=False))
        )
        # wide-table scale point — the SHARED builder (benchmarks.py, one
        # definition across bench/A-B/scale harnesses): proves the one-pass
        # wide agg's fixed codegen cost amortizes with rows
        from pandas_profiling_personal_spark.benchmarks import wide100_frame

        wide = wide100_frame(li)
        p["full_profile_wide100"] = timed(
            lambda: profile(wide, ProfileConfig(exact=False))
        )
        ev_path = f"{d}/events.parquet"
        if os.path.isfile(ev_path) or os.path.isdir(ev_path):
            ev = read_parquet(spark, ev_path)
            rows[sf]["events"] = ev.count()
            p["full_profile_events"] = timed(
                lambda: profile(ev, ProfileConfig(exact=False))
            )
        p["minhash_dedup_documents"] = timed(
            lambda: DD.minhash_dedup(
                docs, "doc_id", "text", num_hashes=32, bands=8,
                hash_fn="xxhash64",
            ).count()
        )
        p["text_profile_documents"] = timed(
            lambda: TX.text_profile(docs, "text", "doc_id")
            .agg(F.sum("n_tokens")).first()
        )
        p["ann_lsh_topk_embeddings"] = timed(
            lambda: SIM.ann_topk_lsh(
                emb, emb.where(F.col("vec_id") < 50), dim=64, k=10
            ).count()
        )
        # r4 training-pipeline additions
        # sum over OUTPUT columns, not .count(): a count() over these
        # left joins lets Catalyst prune the whole computation (unique-key
        # join elimination) and measures nothing
        p["span_dedup_documents"] = timed(
            lambda: DD.span_dedup(docs, span_words=10)
            .agg(F.sum("n_spans_kept")).first()
        )
        p["contamination_documents"] = timed(
            lambda: DD.contamination_keep_list(
                docs, docs.where(F.col("doc_id") % 37 == 0), shingle_k=8
            ).agg(F.sum(F.col("keep").cast("int"))).first()
        )
        from pandas_profiling_personal_spark.operators.mixture import (
            mixture_counts,
        )
        p["mixture_counts_documents"] = timed(
            lambda: mixture_counts(
                docs, "lang",
                {"en": 0.5, "zh": 0.2, "fr": 0.2, "de": 0.1},
                key="doc_id", size_col="n_chars",
            ).agg(F.sum("n_kept")).first()
        )
        # r5 additions: chunking (narrow, output-expansion bound), TF-IDF
        # (vocab exchanges + per-doc window), the composed funnel, and
        # semantic dedup (assignment fold + intra-cell self-join)
        p["chunk_documents"] = timed(
            lambda: TX.chunk_documents(docs, "doc_id", "text", 64, 16)
            .agg(F.sum("n_chunk_tokens")).first()
        )
        p["tfidf_top_terms_documents"] = timed(
            lambda: TX.tfidf_top_terms(docs, "doc_id", "text", k=5)
            .agg(F.sum("tf")).first()
        )
        from pandas_profiling_personal_spark.operators.pipeline import (
            corpus_funnel,
            funnel_report,
        )
        p["corpus_funnel_documents"] = timed(
            lambda: funnel_report(
                corpus_funnel(docs, "doc_id", "text", line_filter=False)
            ).first()
        )
        p["semantic_dedup_embeddings"] = timed(
            lambda: SIM.semantic_dedup(emb, n_cells=16, threshold=0.3)
            .agg(F.sum(F.col("keep").cast("int"))).first()
        )
        # r6 additions: auto-sized + hot-cell-capped semantic dedup (the
        # scale defaults), the funnel with the MinHash near-dup stage, and
        # the daily-incremental dedup tiers (store = first half by id,
        # new shard = second half)
        p["semantic_dedup_auto_capped"] = timed(
            lambda: SIM.semantic_dedup(emb, threshold=0.3)
            .agg(F.sum(F.col("keep").cast("int"))).first()
        )
        p["corpus_funnel_near_dup"] = timed(
            lambda: funnel_report(
                corpus_funnel(
                    docs, "doc_id", "text", line_filter=False,
                    near_dup={"min_jaccard": 0.5},
                )
            ).first()
        )
        mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]

        def _inc_exact():
            fa = DD.incremental_exact_dedup(
                docs.where(F.col("doc_id") < mid), None
            )
            store = DD.dedup_store_update(None, fa)
            DD.incremental_exact_dedup(
                docs.where(F.col("doc_id") >= mid), store
            ).agg(F.sum(F.col("keep").cast("int"))).first()

        p["incremental_exact_dedup"] = timed(_inc_exact)

        def _inc_minhash():
            fa = DD.incremental_minhash_dedup(
                docs.where(F.col("doc_id") < mid), None
            )
            sig_cols = [f"m{i}" for i in range(16)]
            DD.incremental_minhash_dedup(
                docs.where(F.col("doc_id") >= mid),
                fa.select("doc_id", *sig_cols),
            ).agg(F.sum(F.col("keep").cast("int"))).first()

        p["incremental_minhash_dedup"] = timed(_inc_minhash)

        # r7 additions: perceptual image near-dup (decode-once banded
        # pairs), embedding drift (zero-shuffle two-scan shape), and the
        # streaming near-dup history suppression measured in its batch form
        # (the same bands× anti-join plan a micro-batch executes)
        from pandas_profiling_personal_spark.operators.drift import (
            embedding_drift,
        )
        from pandas_profiling_personal_spark.operators.multimodal import (
            image_near_duplicates,
        )
        from pandas_profiling_personal_spark.streaming.dedup_stream import (
            near_dup_stream_vs_store,
        )

        blobs = docs.where(F.col("text").isNotNull()).select(
            "doc_id", F.col("text").cast("binary").alias("blob")
        )
        p["image_near_dup_documents"] = timed(
            lambda: image_near_duplicates(
                blobs, "blob", "doc_id", decoder="fake",
                max_hamming=8, band_bits=6, bits=60, key_blocks=2,
            ).count()
        )
        emb_b = emb.where(F.col("vec_id") % 3 != 0).select(
            F.transform(
                "embedding", lambda x: x.cast("double") * 1.05 + 0.1
            ).alias("embedding")
        )
        p["embedding_drift_embeddings"] = timed(
            lambda: embedding_drift(emb, emb_b, "embedding", dim=64).first()
        )

        def _stream_near_dup():
            fa = DD.incremental_minhash_dedup(
                docs.where(F.col("doc_id") < mid), None
            )
            near_dup_stream_vs_store(
                docs.where(F.col("doc_id") >= mid),
                fa.select("doc_id", *[f"m{i}" for i in range(16)]),
                "text",
            ).count()

        p["stream_near_dup_vs_store"] = timed(_stream_near_dup)

        # r7 batch 2: LM quality scoring (train + score round trip),
        # executable packing, audio metadata
        from pandas_profiling_personal_spark.operators.multimodal import (
            audio_metadata,
        )

        def _lm():
            u, bg = TX.ngram_lm_train(
                docs.where(F.col("doc_id") % 2 == 0), vocab_size=300
            )
            TX.lm_perplexity_score(docs, u, bg).agg(
                F.sum("n_bigrams")
            ).first()

        p["lm_train_and_score"] = timed(_lm)
        p["pack_sequences_documents"] = timed(
            lambda: TX.pack_sequences(docs, "doc_id", "n_chars", 2048, 1000)
            .agg(F.max("seq_last")).first()
        )
        p["audio_metadata_fake"] = timed(
            lambda: audio_metadata(blobs, "blob", decoder="fake")
            .agg(F.sum("audio_meta.n_frames")).first()
        )

        # r8: the new modality near-dup tiers (auto band geometry — the
        # default the bare call takes) + mergeable Pearson
        from pandas_profiling_personal_spark.operators.multimodal import (
            audio_near_duplicates,
            video_near_duplicates,
        )
        from pandas_profiling_personal_spark.plans.incremental import (
            merge_partials,
            partial_profile,
            pearson_of,
        )

        p["audio_near_dup_documents"] = timed(
            lambda: audio_near_duplicates(
                blobs, "blob", "doc_id", decoder="fake", max_hamming=8
            ).count()
        )
        p["video_near_dup_documents"] = timed(
            lambda: video_near_duplicates(
                blobs, "blob", "doc_id", n_frames=4, decoder="fake",
                max_hamming=8,
            ).count()
        )
        li4 = li.select(
            "l_quantity", "l_extendedprice", "l_discount", "l_tax"
        )
        shard_key = F.col("l_extendedprice").cast("long") % 3

        def _inc_pearson():
            parts = [
                partial_profile(li4.where(shard_key == i), correlations=True)
                for i in range(3)
            ]
            pearson_of(merge_partials(parts))

        p["incremental_pearson_lineitem"] = timed(_inc_pearson)
        points[sf] = p
        print(json.dumps({"sf": sf, "walls": p, "rows": rows[sf]}), flush=True)

    print(json.dumps({"points": points, "rows": rows}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
