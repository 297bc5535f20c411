"""PII scan/redact and Gopher-style repetition signals."""

import pytest
from pyspark.sql import functions as F

from pandas_profiling_personal_spark.operators import pii as PII
from pandas_profiling_personal_spark.operators.text import (
    repetition_profile,
    word_ngrams,
    tokens,
)

DOC = (
    "Contact john.doe+spam@example.com or jane@sub.test.org today. "
    "Server 192.168.1.254 logged ssn 123-45-6789 and card 4111111111111111; "
    "call +4915123456789 now."
)


def test_pii_scan_counts(spark):
    df = spark.createDataFrame(
        [(0, DOC), (1, "clean text with tok123 and nothing else")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in PII.pii_scan(df, "text", "doc_id").collect()}
    r = rows[0]
    assert r["n_email"] == 2
    assert r["n_ipv4"] == 1
    assert r["n_ssn"] == 1
    assert r["n_card"] == 1
    assert r["n_phone"] == 1
    assert r["n_pii"] == 6
    assert r["has_pii"] is True
    c = rows[1]
    assert c["n_pii"] == 0 and c["has_pii"] is False


def test_pii_redact_is_complete_and_typed(spark):
    df = spark.createDataFrame([(DOC,)], "text string")
    red = PII.redact_documents(df, "text").collect()[0]["text"]
    for marker in ("<EMAIL>", "<IPV4>", "<SSN>", "<CARD>", "<PHONE>"):
        assert marker in red, marker
    # nothing PII-shaped survives a second scan
    df2 = spark.createDataFrame([(red,)], "text string")
    assert PII.pii_scan(df2, "text").collect()[0]["n_pii"] == 0


def test_pii_summary_rates(spark):
    df = spark.createDataFrame(
        [(0, DOC), (1, "clean"), (2, "also clean")],
        "doc_id bigint, text string",
    )
    row = PII.pii_summary(df, "text").collect()[0]
    assert row["n_docs"] == 3
    assert row["docs_pii"] == 1
    assert row["total_email"] == 2 and row["docs_email"] == 1
    assert row["pii_doc_rate"] == pytest.approx(round(1 / 3, 4))


def test_word_ngrams_short_doc_guard(spark):
    df = spark.createDataFrame([("one",), ("a b c",), ("",)], "t string")
    got = df.select(
        word_ngrams(tokens(F.col("t")), 2).alias("g")
    ).collect()
    assert got[0]["g"] == []
    assert got[1]["g"] == ["a b", "b c"]
    assert got[2]["g"] == []


def test_repetition_profile_hand_example(spark):
    # "spam spam spam ham" -> 2-grams: [spam spam, spam spam, spam ham]
    # dup_ngram_frac = (3-2)/3, top_ngram_frac = 2/3
    df = spark.createDataFrame(
        [
            (0, "spam spam spam ham"),
            (1, "line one\nline one\nline two"),
            (2, "x"),
        ],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in repetition_profile(df, "text", "doc_id").collect()
    }
    r0 = rows[0]
    assert r0["n_ngrams"] == 3
    assert r0["dup_ngram_frac"] == pytest.approx(round(1 / 3, 4))
    assert r0["top_ngram_frac"] == pytest.approx(round(2 / 3, 4))
    assert r0["n_lines"] == 1 and r0["dup_line_frac"] == 0.0
    r1 = rows[1]
    assert r1["n_lines"] == 3
    assert r1["dup_line_frac"] == pytest.approx(round(1 / 3, 4))
    r2 = rows[2]  # single token: no 2-grams at all
    assert r2["n_ngrams"] == 0
    assert r2["dup_ngram_frac"] == 0.0 and r2["top_ngram_frac"] == 0.0


def test_deterministic_split_properties(spark):
    from pandas_profiling_personal_spark.operators.sampling import (
        deterministic_split,
        split_counts,
    )

    df = spark.range(0, 20000).withColumnRenamed("id", "k")
    out = deterministic_split(df, "k")
    counts = {r["split"]: r["n"] for r in split_counts(df, "k").collect()}
    n = sum(counts.values())
    assert n == 20000
    assert abs(counts["train"] / n - 0.9) < 0.02
    assert abs(counts["val"] / n - 0.05) < 0.01
    assert abs(counts["test"] / n - 0.05) < 0.01
    # deterministic: identical assignment on recomputation and on a
    # differently-partitioned input
    a = {r["k"]: r["split"] for r in out.collect()}
    b = {
        r["k"]: r["split"]
        for r in deterministic_split(df.repartition(7), "k").collect()
    }
    assert a == b
    # custom weights: remainder falls to the last split
    w = (("train", 0.5), ("holdout", 0.25))
    c2 = {
        r["split"]: r["n"]
        for r in split_counts(df, "k", weights=w).collect()
    }
    assert abs(c2["train"] / n - 0.5) < 0.02
    assert abs(c2["holdout"] / n - 0.5) < 0.02


def test_hashed_duplicates_match_exact(spark):
    from pandas_profiling_personal_spark.operators.duplicates import (
        duplicate_stats,
        duplicate_summary_hashed,
        top_duplicates,
    )

    rows = [(i % 40, f"v{i % 25}", float(i % 7)) for i in range(400)]
    df = spark.createDataFrame(rows, "a bigint, b string, c double")
    exact = duplicate_stats(df)
    stats, top = duplicate_summary_hashed(df, n=10)
    assert stats == exact
    exact_top = [
        r.asDict() for r in top_duplicates(df, n=10).collect()
    ]
    # same groups and counts (no count ties at the boundary in this data
    # means selection is identical, not just equivalent)
    assert sorted(
        (d["a"], d["b"], d["c"], d["n_dup"]) for d in top
    ) == sorted((d["a"], d["b"], d["c"], d["n_dup"]) for d in exact_top)


def test_profile_wide_uses_hashed_duplicates(spark):
    from pandas_profiling_personal_spark import ProfileConfig, profile

    cols = ", ".join(f"c{i} bigint" for i in range(25))
    rows = [tuple((i * (j + 1)) % 5 for j in range(25)) for i in range(300)]
    df = spark.createDataFrame(rows, cols)
    r_hash = profile(
        df, ProfileConfig(correlations=(), missing_diagrams=False)
    )
    r_exact = profile(
        df,
        ProfileConfig(
            correlations=(), missing_diagrams=False, duplicates_hash=False
        ),
    )
    assert r_hash.table["n_duplicates"] == r_exact.table["n_duplicates"]
    assert r_hash.table["p_duplicates"] == r_exact.table["p_duplicates"]
    assert len(r_hash.duplicates) == len(r_exact.duplicates)
    assert {d["n_dup"] for d in r_hash.duplicates} == {
        d["n_dup"] for d in r_exact.duplicates
    }


def test_quality_filter_reasons(spark):
    from pandas_profiling_personal_spark.operators.text import quality_filter

    good = (
        "the quick brown fox and the lazy dog are in the yard with you "
        "for this is a fine day and it is good to have words that flow"
    )
    df = spark.createDataFrame(
        [
            (0, good),
            (1, "short text"),  # < 10 tokens
            (2, "zz " * 50),  # no stopwords
            (3, good + " !!!;;;...." * 40),  # punctuation soup
        ],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in quality_filter(df, "text", "doc_id").collect()
    }
    assert rows[0]["keep"] is True and rows[0]["reject_reasons"] == []
    assert "too_short" in rows[1]["reject_reasons"]
    assert "low_stopword" in rows[2]["reject_reasons"]
    assert "high_punct" in rows[3]["reject_reasons"]
    assert all(not rows[i]["keep"] for i in (1, 2, 3))


def test_packing_stats_hand_example(spark):
    import math

    from pandas_profiling_personal_spark.operators.text import packing_stats

    # token counts: 4, 10, 3  with L=8
    df = spark.createDataFrame(
        [("a b c d",), ("t " * 10,), ("x y z",)], "text string"
    )
    row = packing_stats(df, "text", context_len=8, exact=True).collect()[0]
    assert row["n_docs"] == 3
    assert row["total_tokens"] == 17
    assert row["max_tokens"] == 10
    assert row["docs_over_context"] == 1
    assert row["tokens_over_context"] == 2
    assert row["min_sequences"] == math.ceil(17 / 8)  # 3
    assert row["naive_sequences"] == 1 + 2 + 1  # ceil(4/8)+ceil(10/8)+ceil(3/8)
    assert row["naive_pad_frac"] == round(1 - 17 / (4 * 8), 4)


def test_quality_filter_null_text(spark):
    from pandas_profiling_personal_spark.operators.text import quality_filter

    df = spark.createDataFrame([(0, None)], "doc_id bigint, text string")
    row = quality_filter(df, "text", "doc_id").collect()[0]
    assert row["keep"] is False
    assert "null_text" in row["reject_reasons"]


def test_learned_model_seams_fake_models(spark):
    """The learned-model seams (models.py) run a fake vectorized model
    through the documented loader/predict contract: loader once per
    partition, batch-aligned outputs, schema checked loudly, heuristic
    tier as default with identical columns."""
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F

    from pandas_profiling_personal_spark.operators.models import (
        apply_text_model,
        language_id_model,
        pii_entities_model,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog"),
            (2, "der schnelle braune fuchs und der hund"),
            (3, None),
        ],
        "doc_id bigint, text string",
    )

    # heuristic default: codegen path, (language, confidence) contract
    heur = {r["doc_id"]: r for r in language_id_model(df, "text", "doc_id").collect()}
    assert heur[1]["language"] == "en" and heur[1]["confidence"] > 0
    assert heur[3]["language"] == "und"
    # 'und' rows carry NO confidence: the best score belonged to the
    # REJECTED candidate label, not to the emitted 'und'
    assert heur[3]["confidence"] is None

    # fake fastText: deterministic predict over the batch
    def fake_lang_loader():
        def predict(texts: pd.Series) -> pd.DataFrame:
            langs, confs = [], []
            for t in texts:
                if t is None:
                    langs.append("und"); confs.append(0.0)
                elif "fuchs" in t:
                    langs.append("de"); confs.append(0.99)
                else:
                    langs.append("en"); confs.append(0.95)
            return pd.DataFrame({"language": langs, "confidence": confs})

        return predict

    model = {
        r["doc_id"]: r
        for r in language_id_model(
            df, "text", "doc_id", loader=fake_lang_loader
        ).collect()
    }
    assert model[2]["language"] == "de" and model[2]["confidence"] == 0.99
    assert model[3]["language"] == "und"
    # identical column contract between tiers
    assert set(model[1].asDict()) == set(heur[1].asDict())

    # NER-PII seam: spans in, counts derived with regex-tier semantics
    def fake_ner_loader():
        def predict(texts: pd.Series) -> pd.DataFrame:
            ents = []
            for t in texts:
                if t and "fox" in t:
                    i = t.index("fox")
                    ents.append([{"kind": "ANIMAL", "begin": i, "end": i + 3}])
                else:
                    ents.append([])
            return pd.DataFrame({"entities": ents})

        return predict

    pii = {
        r["doc_id"]: r
        for r in pii_entities_model(df, "text", fake_ner_loader, "doc_id").collect()
    }
    assert pii[1]["n_pii"] == 1 and pii[1]["has_pii"]
    assert pii[1]["entities"][0]["kind"] == "ANIMAL"
    assert pii[3]["n_pii"] == 0 and not pii[3]["has_pii"]

    # contract violations fail loudly on the first batch
    def bad_cols_loader():
        def predict(texts: pd.Series) -> pd.DataFrame:
            return pd.DataFrame({"lang": ["x"] * len(texts)})

        return predict

    from pandas_profiling_personal_spark.operators.models import (
        LANGUAGE_MODEL_SCHEMA,
    )

    with pytest.raises(Exception, match="contract|columns"):
        apply_text_model(
            df, "text", bad_cols_loader, LANGUAGE_MODEL_SCHEMA, id_col="doc_id"
        ).collect()

    def bad_len_loader():
        def predict(texts: pd.Series) -> pd.DataFrame:
            return pd.DataFrame({"language": ["en"], "confidence": [1.0]})

        return predict

    with pytest.raises(Exception, match="one output row per input row"):
        apply_text_model(
            df.repartition(1), "text", bad_len_loader, LANGUAGE_MODEL_SCHEMA
        ).collect()


def test_corpus_funnel_and_prepare(spark):
    """End-to-end corpus preparation: sequential funnel flags (lines →
    quality → exact dedup → decontamination), one-aggregate report, and
    the filtered/chunked corpus with original columns preserved."""
    from pandas_profiling_personal_spark.operators.pipeline import (
        corpus_funnel,
        funnel_report,
        prepare_corpus,
    )

    good = (
        "The quick brown fox jumps over the lazy dog every single day.\n"
        "It is a fine dog and the fox is in the house with you and it."
    )
    dup = ("  " + good.upper() + " ")  # same after line-clean? no — keep raw dup
    docs = [
        (1, good, "web"),
        (2, good, "web2"),          # exact dup of 1 (after cleaning) — loses
        (3, "short.\nnope", "web"), # no line survives min_words
        (4, "xx " * 40 + "end of the test sentence here.", "web"),  # low stopword/quality
        (5, None, "web"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string, source string")
    flags = corpus_funnel(df, "doc_id", "text")
    by = {r["id"]: r for r in flags.collect()}
    assert by[1]["pass_lines"] and by[1]["pass_quality"] and by[1]["pass_dedup"]
    assert by[2]["pass_quality"] and not by[2]["pass_dedup"]  # dup loses to 1
    assert not by[3]["pass_lines"] and not by[3]["pass_quality"]
    assert by[5]["pass_lines"] is False and by[5]["pass_decontam"] is False

    rep = funnel_report(flags).collect()[0]
    assert rep["n_docs"] == 5
    assert rep["n_pass_lines"] >= rep["n_pass_quality"] >= rep["n_pass_dedup"]
    assert rep["n_pass_dedup"] == rep["n_pass_decontam"]  # no benchmark

    # near-dup stage (off by default): pass_near_dup mirrors pass_dedup
    for r in by.values():
        assert r["pass_near_dup"] == r["pass_dedup"]

    # near-dup stage ON: doc 6 shares most 3-shingles with doc 1 but is
    # not an exact duplicate — exact dedup keeps both, MinHash+Jaccard
    # drops the higher id; the funnel stays sequential and the report
    # counts pin the full chain
    near = good + " Extra tail words here."
    docs_n = docs + [(6, near, "web")]
    df_n = spark.createDataFrame(
        docs_n, "doc_id bigint, text string, source string"
    )
    flags_n = corpus_funnel(
        df_n, "doc_id", "text", near_dup={"min_jaccard": 0.5}
    )
    by_n = {r["id"]: r for r in flags_n.collect()}
    assert by_n[6]["pass_dedup"]            # not an exact dup
    assert not by_n[6]["pass_near_dup"]     # near-dup of 1 — greedy sweep
    assert not by_n[6]["pass_decontam"]     # sequential fold
    assert by_n[1]["pass_near_dup"]         # the lower id survives
    rep_n = funnel_report(flags_n).collect()[0]
    assert (rep_n["n_docs"], rep_n["n_pass_lines"], rep_n["n_pass_quality"],
            rep_n["n_pass_dedup"], rep_n["n_pass_near_dup"],
            rep_n["n_pass_decontam"]) == (6, 4, 3, 2, 1, 1)

    # decontamination stage: doc 1's text as the benchmark kills 1 (and its
    # dup 2 already lost) — funnel is sequential
    bench = spark.createDataFrame([(100, good)], "doc_id bigint, text string")
    flags_b = corpus_funnel(df, "doc_id", "text", benchmark=bench)
    by_b = {r["id"]: r for r in flags_b.collect()}
    assert by_b[1]["pass_dedup"] and not by_b[1]["pass_decontam"]

    # prepare_corpus: survivors only, original columns preserved under the
    # CALLER's id column name (not the funnel's internal 'id')
    out = prepare_corpus(df, "doc_id", "text")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {r["id"] for r in flags.collect() if r["pass_decontam"]}
    assert rows[1]["source"] == "web"
    assert "\n" in rows[1]["text"]  # cleaned text, both lines kept

    # chunked variant hands off chunk rows
    chunks = prepare_corpus(df, "doc_id", "text", chunk_tokens=8,
                            overlap_tokens=2).collect()
    assert chunks and all(r["n_chunk_tokens"] <= 8 for r in chunks)
    assert {r["id"] for r in chunks} == set(rows)

    # a corpus that already carries columns named 'id'/'text_clean' must
    # not collide with the funnel's internals (review r5)
    clash = df.withColumn("id", F.col("doc_id") * 100).withColumn(
        "text_clean", F.lit("decoy")
    )
    out_c = prepare_corpus(clash, "doc_id", "text")
    rc = {r["doc_id"]: r for r in out_c.collect()}
    assert set(rc) == set(rows)
    assert rc[1]["id"] == 100 and rc[1]["text_clean"] == "decoy"


def test_null_text_semantics_under_legacy_size_of_null(spark):
    """Review r5: with ANSI off (the package's own get_session), Spark
    defaults legacy sizeOfNull on and size(NULL) is -1 — a nullif(size,0)
    denominator then computes (-1)/(-1)=1.0 for null text, silently
    classifying empty docs as high-quality English. size_or_null folds
    both encodings to NULL; this test pins the null-doc contract under
    the legacy mode the default-ANSI test session would never exercise."""
    from pandas_profiling_personal_spark.functions import stats as S
    from pandas_profiling_personal_spark.operators.text import (
        language_id,
        quality_filter,
        text_profile,
        token_count,
    )

    before = (
        spark.conf.get("spark.sql.ansi.enabled"),
        spark.conf.get("spark.sql.legacy.sizeOfNull"),
    )
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
    try:
        df = spark.createDataFrame([(0, None)], "doc_id bigint, text string")
        assert (
            df.select(F.size(F.split("text", " ")).alias("s")).collect()[0][
                "s"
            ]
            == -1
        ), "legacy mode not active — test setup broken"
        assert (
            df.select(language_id(S.col("text")).alias("l")).collect()[0]["l"]
            == "und"
        )
        assert (
            df.select(token_count(S.col("text")).alias("n")).collect()[0]["n"]
            is None
        )
        q = quality_filter(df, "text", "doc_id").collect()[0]
        assert q["keep"] is False and "null_text" in q["reject_reasons"]
        tp = text_profile(df, "text", "doc_id").collect()[0]
        assert tp["n_tokens"] is None and tp["stopword_ratio"] == 0.0
        assert tp["language"] == "und"
        assert tp["quality_score"] == 0.26  # the pre-refactor null-doc score
    finally:
        spark.conf.set("spark.sql.ansi.enabled", before[0])
        spark.conf.set("spark.sql.legacy.sizeOfNull", before[1])
