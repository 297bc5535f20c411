"""Oracle-parity queries for the training-data pipeline operators (text analysis,
dedup, similarity search) on the ``documents`` / ``embeddings`` tables.

Hashing is md5-based everywhere (see operators/dedup.portable_hash64) so DuckDB
reproduces every stage bit-for-bit — verified: md5-hash ints, tokenization, BPE
counts and array dot products are exactly equal across engines on the testdata.

DuckDB syntax notes vs Spark: 1-based list indexing (Spark arrays are 0-based via
``[]``/1-based via element_at), ``range(a,b)`` end-exclusive, ``QUALIFY`` for
window filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pandas_profiling_personal_spark.operators import (
    dedup as DD,
    similarity as SIM,
    text as TX,
)
from pandas_profiling_personal_spark.parity import QueryFn, load

# --------------------------------------------------------------------------------
# shared DuckDB CTE fragments
# --------------------------------------------------------------------------------

_TOK = (
    "tok AS (SELECT doc_id, list_filter(string_split_regex(lower(text),"
    " '[^a-z0-9]+'), x -> x <> '') AS t FROM documents)"
)

# 3-word shingles, distinct per doc (matches dedup.word_shingles + shingle_table)
_SHINGLES = (
    "sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) >= 3 THEN"
    " list_transform(range(1, len(t) - 1), i -> t[i] || '_' || t[i+1] || '_' ||"
    " t[i+2]) ELSE [array_to_string(t, '_')] END)) AS shingle FROM tok)"
)

_HASH64 = "CAST(('0x' || substring(md5({x}), 1, 8)) AS UBIGINT)"

_STOP_SQL = {
    lang: "(" + ", ".join(f"'{w}'" for w in words) + ")"
    for lang, words in TX.STOPWORDS.items()
}


def _score_sql(lang: str) -> str:
    return (
        f"CASE WHEN len(t) > 0 THEN len(list_filter(t, x -> x IN"
        f" {_STOP_SQL[lang]})) * 1.0 / len(t) ELSE 0.0 END"
    )


# --------------------------------------------------------------------------------
# text profile
# --------------------------------------------------------------------------------


def text_profile_query() -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return TX.text_profile(load(spark, sf_dir, "documents"), "text", "doc_id")

    return fn


def text_profile_sql() -> str:
    scores = ", ".join(
        f"{_score_sql(lang)} AS s_{lang}" for lang in TX.LANG_ORDER
    )
    return f"""
WITH {_TOK},
feat AS (
  SELECT d.doc_id, d.text, tok.t, {scores},
    length(d.text) AS n_chars,
    len(tok.t) AS n_tokens,
    length(regexp_replace(lower(d.text), '[^a-z]', '', 'g')) AS alpha_chars,
    length(regexp_replace(d.text, '[^.,;:!?]', '', 'g')) AS punct_chars,
    len(list_filter(tok.t, x -> x IN {_STOP_SQL["en"]})) AS stop_hits,
    len(list_distinct(tok.t)) AS n_distinct_tok
  FROM documents d JOIN tok ON d.doc_id = tok.doc_id),
q AS (
  SELECT doc_id,
    CASE
      WHEN s_en >= greatest(s_fr, s_de, s_es, 0.01) THEN 'en'
      WHEN s_fr >= greatest(s_de, s_es, 0.01) THEN 'fr'
      WHEN s_de >= greatest(s_es, 0.01) THEN 'de'
      WHEN s_es >= 0.01 THEN 'es'
      ELSE 'und' END AS language,
    n_tokens,
    len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens,
    n_chars,
    CASE WHEN n_tokens > 0 THEN alpha_chars * 1.0 / n_tokens END AS mean_token_len_raw,
    CASE WHEN n_chars > 0 THEN punct_chars * 1.0 / n_chars ELSE 0.0 END AS punct_ratio_raw,
    CASE WHEN n_tokens > 0 THEN stop_hits * 1.0 / n_tokens ELSE 0.0 END AS stopword_ratio_raw,
    CASE WHEN n_tokens > 0 THEN n_distinct_tok * 1.0 / n_tokens END AS distinct_token_ratio_raw,
    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
  FROM feat)
SELECT doc_id, language, n_tokens, n_bpe_tokens, n_chars,
  round(mean_token_len_raw, 4) AS mean_token_len,
  round(punct_ratio_raw, 4) AS punct_ratio,
  round(stopword_ratio_raw, 4) AS stopword_ratio,
  round(distinct_token_ratio_raw, 4) AS distinct_token_ratio,
  round(0.25 * (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.2 END)
      + 0.2 * (CASE WHEN mean_token_len_raw BETWEEN 2 AND 12 THEN 1.0 ELSE 0.3 END)
      + 0.25 * least(stopword_ratio_raw * 5.0, 1.0)
      + 0.15 * coalesce(distinct_token_ratio_raw, 0.0)
      + 0.15 * (CASE WHEN punct_ratio_raw <= 0.2 THEN 1.0 ELSE 0.4 END), 4)
    AS quality_score,
  fingerprint
FROM q
"""


# --------------------------------------------------------------------------------
# dedup
# --------------------------------------------------------------------------------


def exact_duplicates_query() -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return DD.exact_duplicates(load(spark, sf_dir, "documents"), "doc_id", "text")

    return fn


def exact_duplicates_sql(max_ids: int = 100) -> str:
    # doc_ids is capped to the max_ids smallest ids (scale guard in the Spark
    # op); n_docs still counts the full group.
    return f"""
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
       count(*) AS n_docs,
       list_slice(list_sort(list(doc_id)), 1, {max_ids}) AS doc_ids
FROM documents GROUP BY 1 HAVING count(*) > 1
"""


def minhash_signatures_query(num_hashes: int = 16) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return DD.minhash_signatures(
            load(spark, sf_dir, "documents"), "doc_id", "text", num_hashes
        )

    return fn


def minhash_signatures_sql(num_hashes: int = 16) -> str:
    params = DD.minhash_params(num_hashes)
    mins = ", ".join(
        f"min(({a} * h + {b}) % {DD.MINHASH_PRIME}) AS m{i}"
        for i, (a, b) in enumerate(params)
    )
    return f"""
WITH {_TOK}, {_SHINGLES},
h AS (SELECT doc_id, CAST({_HASH64.format(x='shingle')} % {DD.MINHASH_PRIME} AS BIGINT) AS h
      FROM sh WHERE shingle <> '')
SELECT doc_id, {mins} FROM h GROUP BY doc_id
"""


def minhash_dedup_query(
    num_hashes: int = 16, bands: int = 4, min_jaccard: float = 0.5
) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return DD.minhash_dedup(
            load(spark, sf_dir, "documents"),
            "doc_id",
            "text",
            num_hashes=num_hashes,
            bands=bands,
            min_jaccard=min_jaccard,
        )

    return fn


def minhash_dedup_sql(
    num_hashes: int = 16, bands: int = 4, min_jaccard: float = 0.5
) -> str:
    params = DD.minhash_params(num_hashes)
    r = num_hashes // bands
    mins = ", ".join(
        f"min(({a} * h + {b}) % {DD.MINHASH_PRIME}) AS m{i}"
        for i, (a, b) in enumerate(params)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {j} AS band, md5(concat_ws(','"
        + "".join(f", m{j * r + i}" for i in range(r))
        + ")) AS bucket FROM sig"
        for j in range(bands)
    )
    return f"""
WITH {_TOK}, {_SHINGLES},
h AS (SELECT doc_id, CAST({_HASH64.format(x='shingle')} % {DD.MINHASH_PRIME} AS BIGINT) AS h
      FROM sh WHERE shingle <> ''),
sig AS (SELECT doc_id, {mins} FROM h GROUP BY doc_id),
bands AS (SELECT * FROM ({band_selects})
          QUALIFY count(*) OVER (PARTITION BY band, bucket) <= 1000),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
shf AS (SELECT doc_id, shingle FROM sh WHERE shingle <> ''),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY doc_id),
common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
           FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
vc AS (SELECT c.* FROM common c SEMI JOIN cand ON c.doc_a = cand.doc_a AND c.doc_b = cand.doc_b)
SELECT vc.doc_a, vc.doc_b, vc.n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
       round(vc.n_common * 1.0 / (sa.n_sh + sb.n_sh - vc.n_common), 4) AS jaccard
FROM vc JOIN sizes sa ON vc.doc_a = sa.doc_id JOIN sizes sb ON vc.doc_b = sb.doc_id
WHERE round(vc.n_common * 1.0 / (sa.n_sh + sb.n_sh - vc.n_common), 4) >= {min_jaccard}
"""


def jaccard_pairs_query(min_jaccard: float = 0.1) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return DD.jaccard_similarity(
            load(spark, sf_dir, "documents"),
            "doc_id",
            "text",
            shingle_k=3,
            min_jaccard=min_jaccard,
            max_shingle_df=None,
        )

    return fn


def jaccard_pairs_sql(min_jaccard: float = 0.1) -> str:
    return f"""
WITH {_TOK}, {_SHINGLES},
shf AS (SELECT doc_id, shingle FROM sh WHERE shingle <> ''),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY doc_id),
common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
           FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
SELECT c.doc_a, c.doc_b, c.n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
       round(c.n_common * 1.0 / (sa.n_sh + sb.n_sh - c.n_common), 4) AS jaccard
FROM common c JOIN sizes sa ON c.doc_a = sa.doc_id JOIN sizes sb ON c.doc_b = sb.doc_id
WHERE round(c.n_common * 1.0 / (sa.n_sh + sb.n_sh - c.n_common), 4) >= {min_jaccard}
"""


def simhash_query(bits: int = 32) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return DD.simhash_table(load(spark, sf_dir, "documents"), "doc_id", "text", bits)

    return fn


def simhash_sql(bits: int = 32) -> str:
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(bits)
    )
    recompose = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN (1::BIGINT << {b}) ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
WITH {_TOK},
tk AS (SELECT doc_id, unnest(t) AS tok FROM tok),
h AS (SELECT doc_id, CAST({_HASH64.format(x='tok')} AS BIGINT) AS h FROM tk),
agg AS (SELECT doc_id, {bit_sums} FROM h GROUP BY doc_id)
SELECT doc_id, {recompose} AS simhash FROM agg
"""


# --------------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------------

_COS = (
    "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) *"
    " sqrt(list_dot_product(b.v, b.v)))"
)


def cosine_topk_query(k: int = 5, n_queries: int = 5) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = load(spark, sf_dir, "embeddings")
        queries = emb.where(F.col("vec_id") < n_queries)
        return SIM.cosine_topk(emb, queries, "vec_id", "embedding", k)

    return fn


def cosine_topk_sql(k: int = 5, n_queries: int = 5) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id, v FROM e WHERE vec_id < {n_queries}),
sims AS (
  SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id, round({_COS}, 4) AS cosine_sim
  FROM e a, q b WHERE a.vec_id <> b.vec_id)
SELECT query_id, neighbor_id, cosine_sim,
       row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
FROM sims
QUALIFY rank <= {k}
"""


def media_metadata_query() -> QueryFn:
    """A20 plumbing, oracle-checked on its engine-independent columns: the
    documents' text bytes as an opaque binary column through the Arrow-batched
    mapInPandas decode pass; n_bytes / format-sniff / content_hash are exact
    byte facts DuckDB reproduces (width/height/truncated are decoder-tier
    outputs, excluded — see operators/multimodal.py)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.multimodal import (
            media_metadata,
        )

        df = (
            load(spark, sf_dir, "documents")
            .where(F.col("text").isNotNull())
            .select("doc_id", F.col("text").cast("binary").alias("blob"))
        )
        meta = media_metadata(df, "blob", decoder="fake")
        return meta.select(
            "doc_id",
            F.col("meta.n_bytes").alias("n_bytes"),
            F.col("meta.format").alias("format"),
            F.col("meta.content_hash").alias("content_hash"),
            F.col("meta.phash").alias("phash"),
        )

    return fn


def media_metadata_sql() -> str:
    # magic-byte sniff mirroring the Spark tier's _sniff_format branch for
    # branch (jpeg/png magics cannot begin a UTF-8 string; NUL-prefixed
    # parquet strings CAN occur, so the mp4? branch is rebuilt with chr(0)
    # like binary_format_mix_sql); phash is the fake tier's md5-prefix
    # signature (multimodal._fake_hashes), 60-bit so it is
    # signed-BIGINT-safe in both engines
    return """
SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       CASE WHEN text LIKE 'GIF8%' THEN 'gif'
            WHEN text LIKE 'RIFF%' THEN 'riff'
            WHEN text LIKE 'YUV4MPEG2%' THEN 'y4m'
            WHEN substring(text, 1, 3) = chr(0) || chr(0) || chr(0)
                 THEN 'mp4?'
            ELSE 'unknown' END AS format,
       md5(text) AS content_hash,
       CAST(('0x' || substring(md5(text), 1, 15)) AS UBIGINT)::BIGINT AS phash
FROM documents WHERE text IS NOT NULL
"""


def image_near_dup_query(dup_stride: int = 5, id_shift: int = 100_000) -> QueryFn:
    """Perceptual image near-dup (A20 full tier) through the FULL distributed
    path: Arrow-batched decode -> 60-bit deterministic signatures -> banded
    Hamming pair join (operators/dedup.banded_hamming_pairs). Every
    ``dup_stride``-th document is re-added under a shifted id so the pair set
    is non-empty and known; the oracle computes ALL-PAIRS Hamming directly,
    so a driver match also proves the banding drops nothing. The banding
    runs the SCALE configuration — key_blocks=2 over 10 six-bit blocks:
    C(10,2)=45 bands of 12-bit keys, exact recall at max_hamming=8 since
    blocks(10) >= max_hamming(8) + key_blocks(2); measured ~14x fewer
    candidate pairs than single-block 6-bit keys at 50k docs."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.multimodal import (
            image_near_duplicates,
        )

        base = (
            load(spark, sf_dir, "documents")
            .where(F.col("text").isNotNull())
            .select("doc_id", "text")
        )
        planted = base.where(F.col("doc_id") % dup_stride == 0).select(
            (F.col("doc_id") + id_shift).alias("doc_id"), "text"
        )
        df = base.unionAll(planted).select(
            "doc_id", F.col("text").cast("binary").alias("blob")
        )
        pairs = image_near_duplicates(
            df, "blob", "doc_id", decoder="fake",
            max_hamming=8, band_bits=6, bits=60, key_blocks=2,
        )
        return pairs.select(
            "doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming")
        )

    return fn


def image_dedup_keep_list_query(
    dup_stride: int = 5, id_shift: int = 100_000
) -> QueryFn:
    """The full image-dedup pipeline end product: perceptual pairs ->
    connected components -> one kept representative per cluster (fake tier,
    scale banding); oracled against an all-pairs + recursive-CTE transitive
    closure, so a driver match proves banding AND clustering together."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.multimodal import (
            image_dedup_keep_list,
        )

        base = (
            load(spark, sf_dir, "documents")
            .where(F.col("text").isNotNull())
            .select("doc_id", "text")
        )
        planted = base.where(F.col("doc_id") % dup_stride == 0).select(
            (F.col("doc_id") + id_shift).alias("doc_id"), "text"
        )
        df = base.unionAll(planted).select(
            "doc_id", F.col("text").cast("binary").alias("blob")
        )
        out = image_dedup_keep_list(
            df, "blob", "doc_id", decoder="fake",
            max_hamming=8, band_bits=6, bits=60, key_blocks=2,
        )
        return out.select("doc_id", "keep")

    return fn


def image_dedup_keep_list_sql(
    dup_stride: int = 5, id_shift: int = 100_000
) -> str:
    return f"""
WITH RECURSIVE docs AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT doc_id + {id_shift} AS doc_id, text FROM documents
  WHERE text IS NOT NULL AND doc_id % {dup_stride} = 0),
sig AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(text), 1, 15)) AS UBIGINT)::BIGINT AS ph
  FROM docs),
pairs AS (
  SELECT a.doc_id AS da, b.doc_id AS db
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.ph, b.ph)) <= 8),
edges AS (SELECT da, db FROM pairs UNION SELECT db AS da, da AS db FROM pairs),
reach(id, peer) AS (
  SELECT da, db FROM edges
  UNION
  SELECT r.id, e.db FROM reach r JOIN edges e ON r.peer = e.da
  WHERE e.db != r.id),
mins AS (SELECT id, min(peer) AS mn FROM reach GROUP BY 1)
SELECT d.doc_id, (m.mn IS NULL OR m.mn > d.doc_id) AS keep
FROM docs d LEFT JOIN mins m ON d.doc_id = m.id
"""


def image_near_dup_sql(dup_stride: int = 5, id_shift: int = 100_000) -> str:
    return f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT doc_id + {id_shift} AS doc_id, text FROM documents
  WHERE text IS NOT NULL AND doc_id % {dup_stride} = 0),
sig AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(text), 1, 15)) AS UBIGINT)::BIGINT AS ph
  FROM docs)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.ph, b.ph)) <= 8
"""


def ann_lsh_topk_query(k: int = 5, n_queries: int = 5) -> QueryFn:
    """Hyperplane-LSH ANN (rows-only check: the sign-bit signatures hinge on
    FP dot-product signs at the bucket boundary, which an independent engine
    cannot be guaranteed to reproduce bit-for-bit; recall vs the exact scan is
    unit-tested instead — tests/test_strings_text.py)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = load(spark, sf_dir, "embeddings")
        dim = len(emb.select("embedding").first()[0])
        queries = emb.where(F.col("vec_id") < n_queries)
        return SIM.ann_topk_lsh(
            emb, queries, dim, "vec_id", "embedding", k, n_planes=10, n_tables=4
        )

    return fn


def ann_lsh_recall_query(
    k: int = 5,
    n_queries: int = 5,
    n_planes: int = 4,
    n_tables: int = 16,
    min_hits: int = 3,
) -> QueryFn:
    """Hash-matchable recall gate for the LSH ANN (VERDICT r8 #2): the Spark
    side computes per-query overlap of the LSH top-k against the exact scan
    and asserts the pinned floor; the oracle re-derives ``n_exact`` and
    asserts the same floor rows. Deterministic because the hyperplanes are
    seeded and dot products are sequential folds — measured hits at sf0.01
    with (4 planes, 16 tables): [4, 5, 4, 5, 4] of 5, so ``min_hits=3``
    holds with margin while a broken signature pipeline (recall ≈ candidate
    fraction) fails it. Wide-bucket geometry is deliberate: the gate wants
    high recall on a bounded query set; ``ann_lsh_topk`` keeps the selective
    production geometry."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = load(spark, sf_dir, "embeddings")
        dim = len(emb.select("embedding").first()[0])
        queries = emb.where(F.col("vec_id") < n_queries)
        return SIM.ann_lsh_recall(
            emb,
            queries,
            dim,
            "vec_id",
            "embedding",
            k,
            n_planes=n_planes,
            n_tables=n_tables,
            min_hits=min_hits,
        )

    return fn


def ann_lsh_recall_sql(k: int = 5, n_queries: int = 5) -> str:
    return f"""
SELECT vec_id AS query_id,
       LEAST({k}, (SELECT count(*) - 1 FROM embeddings))::BIGINT AS n_exact,
       TRUE AS recall_ok
FROM embeddings WHERE vec_id < {n_queries}
"""


def embedding_near_dup_query(threshold: float = 0.4, max_id: int = 800) -> QueryFn:
    """Brute-force (exact) near-dup pairs, bounded to ``vec_id < max_id`` so the
    oracle query stays quadratic-in-a-constant at any benchmark scale factor
    (covers the whole table at sf0.01; the unbounded scale path is the
    LSH-blocked mode of embedding_near_duplicates)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return SIM.embedding_near_duplicates(
            load(spark, sf_dir, "embeddings").where(F.col("vec_id") < max_id),
            "vec_id",
            "embedding",
            threshold=threshold,
            brute_force=True,
        )

    return fn


def embedding_near_dup_sql(threshold: float = 0.4, max_id: int = 800) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < {max_id})
SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({_COS}, 4) AS cosine_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round({_COS}, 4) >= {threshold}
"""


# --------------------------------------------------------------------------------
# near-dup clustering (connected components) + keep-list — the dedup end product
# --------------------------------------------------------------------------------

_PAIR_CTES = (
    "shf AS (SELECT doc_id, shingle FROM sh WHERE shingle <> ''),\n"
    "sizes AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY doc_id),\n"
    "common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common\n"
    "           FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id\n"
    "           GROUP BY 1, 2),\n"
    "pj AS (SELECT c.doc_a, c.doc_b FROM common c\n"
    "       JOIN sizes sa ON c.doc_a = sa.doc_id JOIN sizes sb ON c.doc_b = sb.doc_id\n"
    "       WHERE round(c.n_common * 1.0 / (sa.n_sh + sb.n_sh - c.n_common), 4) >= {thr}),\n"
    "edges AS (SELECT doc_a AS a, doc_b AS b FROM pj\n"
    "          UNION SELECT doc_b, doc_a FROM pj),\n"
    "reach AS (SELECT a AS node, b AS r FROM edges\n"
    "          UNION\n"
    "          SELECT re.node, e.b FROM reach re JOIN edges e ON e.a = re.r),\n"
    "clusters AS (SELECT node AS doc_id, least(node, min(r)) AS cluster_id\n"
    "             FROM reach GROUP BY node)"
)


def _jaccard_pairs(spark: SparkSession, sf_dir: str, min_jaccard: float) -> DataFrame:
    return DD.jaccard_similarity(
        load(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        shingle_k=3,
        min_jaccard=min_jaccard,
        max_shingle_df=None,
    )


def dedup_clusters_query(min_jaccard: float = 0.1) -> QueryFn:
    """Connected components over n-gram-Jaccard near-dup pairs (iterative
    min-label propagation, dedup.cluster_pairs) — oracled against a DuckDB
    recursive-CTE transitive closure of the identical edge set."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return DD.cluster_pairs(_jaccard_pairs(spark, sf_dir, min_jaccard))

    return fn


def dedup_clusters_sql(min_jaccard: float = 0.1) -> str:
    return (
        f"WITH RECURSIVE {_TOK}, {_SHINGLES},\n"
        + _PAIR_CTES.format(thr=min_jaccard)
        + "\nSELECT doc_id, cluster_id FROM clusters"
    )


def dedup_keep_list_query(min_jaccard: float = 0.1) -> QueryFn:
    """One representative (min doc_id) per near-dup cluster, everything
    unclustered kept — the materializable deduplicated-corpus flag."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load(spark, sf_dir, "documents")
        pairs = _jaccard_pairs(spark, sf_dir, min_jaccard)
        return DD.dedup_keep_list(docs, pairs, "doc_id").select("doc_id", "keep")

    return fn


def dedup_keep_list_sql(min_jaccard: float = 0.1) -> str:
    return (
        f"WITH RECURSIVE {_TOK}, {_SHINGLES},\n"
        + _PAIR_CTES.format(thr=min_jaccard)
        + "\nSELECT d.doc_id, (c.cluster_id IS NULL OR d.doc_id = c.cluster_id) AS keep\n"
        + "FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id"
    )


# --------------------------------------------------------------------------------
# IVF-flat ANN — deterministic seed-vector centroids, so DuckDB rebuilds the
# identical index (cells, probes, candidates) and checks the full pipeline
# --------------------------------------------------------------------------------


def _cos_sql(x: str, y: str) -> str:
    return (
        f"list_dot_product({x}, {y}) / (sqrt(list_dot_product({x}, {x})) *"
        f" sqrt(list_dot_product({y}, {y})))"
    )


def ivf_topk_query(
    k: int = 5, n_queries: int = 5, n_cells: int = 16, n_probe: int = 4
) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = load(spark, sf_dir, "embeddings")
        return SIM.ivf_topk(
            emb,
            emb.where(F.col("vec_id") < n_queries),
            "vec_id",
            "embedding",
            k=k,
            n_cells=n_cells,
            n_probe=n_probe,
        )

    return fn


def ivf_topk_sql(
    k: int = 5, n_queries: int = 5, n_cells: int = 16, n_probe: int = 4
) -> str:
    key = "CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS UBIGINT)"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT vec_id AS cell_id, v AS cv FROM e
  ORDER BY {key} ASC, vec_id ASC LIMIT {n_cells}),
asg AS (
  SELECT neighbor_id, v, cell_id FROM (
    SELECT e.vec_id AS neighbor_id, e.v, c.cell_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round({_cos_sql("e.v", "c.cv")}, 4) DESC, c.cell_id ASC) AS r
    FROM e, cents c) WHERE r = 1),
probes AS (
  SELECT query_id, qv, cell_id FROM (
    SELECT q.vec_id AS query_id, q.v AS qv, c.cell_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY round({_cos_sql("q.v", "c.cv")}, 4) DESC, c.cell_id ASC) AS r
    FROM (SELECT * FROM e WHERE vec_id < {n_queries}) q, cents c) WHERE r <= {n_probe}),
sims AS (
  SELECT p.query_id, a.neighbor_id, round({_cos_sql("a.v", "p.qv")}, 4) AS cosine_sim
  FROM asg a JOIN probes p ON a.cell_id = p.cell_id
  WHERE a.neighbor_id <> p.query_id)
SELECT query_id, neighbor_id, cosine_sim,
       row_number() OVER (PARTITION BY query_id
         ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
FROM sims QUALIFY rank <= {k}
"""


def corpus_overlap_query(unit: str = "token") -> QueryFn:
    """Contamination check between the even- and odd-doc_id halves of the
    documents corpus (exact tier — the HLL tier is accuracy-tested in
    tests/test_sketches.py)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load(spark, sf_dir, "documents")
        a = docs.where(F.col("doc_id") % 2 == 0)
        b = docs.where(F.col("doc_id") % 2 == 1)
        return DD.corpus_overlap(a, b, "text", unit=unit, exact=True)

    return fn


def corpus_overlap_sql(unit: str = "token") -> str:
    assert unit == "token"
    return f"""
WITH tokall AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS u
  FROM documents
),
a AS (SELECT DISTINCT u FROM tokall WHERE doc_id % 2 = 0),
b AS (SELECT DISTINCT u FROM tokall WHERE doc_id % 2 = 1),
c AS (SELECT (SELECT count(*) FROM a) AS na,
             (SELECT count(*) FROM b) AS nb,
             (SELECT count(*) FROM a JOIN b USING (u)) AS nov)
SELECT na AS n_a, nb AS n_b, nov AS n_overlap,
       round(nov / (na + nb - nov), 4) AS jaccard,
       round(nov / na, 4) AS containment_a_in_b
FROM c
"""


# --------------------------------------------------------------------------------
# PII scan — deterministic PII injected from doc_id arithmetic (documents'
# token-soup text carries no digit-only runs, so every match is planted and
# both engines construct IDENTICAL strings: integer formatting is
# engine-independent, double formatting is not)
# --------------------------------------------------------------------------------


def pii_scan_query() -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators import pii as PII

        df = load(spark, sf_dir, "documents")
        m = F.col("doc_id") % 4
        octet = (F.col("doc_id") % 256).cast("string")
        suffix = (
            F.when(
                m == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or admin@test.org"),
                ),
            )
            .when(
                m == 1,
                F.concat(
                    F.lit(" ip 10."), octet, F.lit(".0.1 ssn 123-45-6789")
                ),
            )
            .when(
                m == 2,
                F.lit(" call +4915123456789 card 4111111111111111"),
            )
            .otherwise(F.lit(""))
        )
        spiked = df.select(
            "doc_id", F.concat(F.col("text"), suffix).alias("text")
        )
        return PII.pii_scan(spiked, "text", "doc_id")

    return fn


def pii_scan_sql() -> str:
    from pandas_profiling_personal_spark.operators.pii import PII_PATTERNS

    counts = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{kind}"
        for kind, pat in PII_PATTERNS.items()
    )
    total = " + ".join(f"n_{k}" for k in PII_PATTERNS)
    return f"""
WITH spiked AS (
  SELECT doc_id, text || CASE doc_id % 4
    WHEN 0 THEN ' contact user' || doc_id || '@example.com or admin@test.org'
    WHEN 1 THEN ' ip 10.' || (doc_id % 256) || '.0.1 ssn 123-45-6789'
    WHEN 2 THEN ' call +4915123456789 card 4111111111111111'
    ELSE '' END AS text
  FROM documents
), cnt AS (
  SELECT doc_id, {counts} FROM spiked
)
SELECT doc_id, {', '.join('n_' + k for k in PII_PATTERNS)},
  {total} AS n_pii, ({total}) > 0 AS has_pii
FROM cnt
"""


# --------------------------------------------------------------------------------
# repetition profile (Gopher/MassiveText quality rules)
# --------------------------------------------------------------------------------


def repetition_query(ngram: int = 2) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return TX.repetition_profile(
            load(spark, sf_dir, "documents"), "text", "doc_id", ngram=ngram
        )

    return fn


def repetition_sql(ngram: int = 2) -> str:
    gram_expr = " || ' ' || ".join(
        f"t[i + {j}]" if j else "t[i]" for j in range(ngram)
    )
    return f"""
WITH {_TOK},
grams AS (
  SELECT doc_id, CASE WHEN len(t) >= {ngram}
    THEN list_transform(range(1, len(t) - {ngram - 2}), i -> {gram_expr})
    ELSE CAST([] AS VARCHAR[]) END AS g
  FROM tok
), per AS (
  SELECT doc_id, gram, count(*) AS cnt
  FROM (SELECT doc_id, unnest(g) AS gram FROM grams)
  GROUP BY 1, 2
), agg AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_ngrams,
         count(*) AS n_distinct, max(cnt) AS top_cnt
  FROM per GROUP BY 1
), lns AS (
  SELECT doc_id,
    list_filter(list_transform(string_split(text, chr(10)), s -> trim(s)),
                s -> s <> '') AS l
  FROM documents
)
SELECT d.doc_id,
  len(l.l) AS n_lines,
  round(CASE WHEN len(l.l) > 0
    THEN (len(l.l) - len(list_distinct(l.l))) * 1.0 / len(l.l)
    ELSE 0.0 END, 4) AS dup_line_frac,
  coalesce(a.n_ngrams, 0) AS n_ngrams,
  round(CASE WHEN coalesce(a.n_ngrams, 0) > 0
    THEN (a.n_ngrams - a.n_distinct) * 1.0 / a.n_ngrams
    ELSE 0.0 END, 4) AS dup_ngram_frac,
  round(CASE WHEN coalesce(a.n_ngrams, 0) > 0
    THEN a.top_cnt * 1.0 / a.n_ngrams
    ELSE 0.0 END, 4) AS top_ngram_frac
FROM documents d
JOIN lns l USING (doc_id)
LEFT JOIN agg a USING (doc_id)
"""


def pii_summary_query() -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators import pii as PII

        df = load(spark, sf_dir, "documents")
        m = F.col("doc_id") % 4
        octet = (F.col("doc_id") % 256).cast("string")
        suffix = (
            F.when(
                m == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or admin@test.org"),
                ),
            )
            .when(
                m == 1,
                F.concat(
                    F.lit(" ip 10."), octet, F.lit(".0.1 ssn 123-45-6789")
                ),
            )
            .when(
                m == 2,
                F.lit(" call +4915123456789 card 4111111111111111"),
            )
            .otherwise(F.lit(""))
        )
        spiked = df.select(
            "doc_id", F.concat(F.col("text"), suffix).alias("text")
        )
        return PII.pii_summary(spiked, "text")

    return fn


def pii_summary_sql() -> str:
    from pandas_profiling_personal_spark.operators.pii import PII_PATTERNS

    counts = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{kind}"
        for kind, pat in PII_PATTERNS.items()
    )
    total = " + ".join(f"n_{k}" for k in PII_PATTERNS)
    aggs = ", ".join(
        f"CAST(SUM(n_{k}) AS BIGINT) AS total_{k}, "
        f"CAST(SUM(CASE WHEN n_{k} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_{k}"
        for k in PII_PATTERNS
    )
    return f"""
WITH spiked AS (
  SELECT doc_id, text || CASE doc_id % 4
    WHEN 0 THEN ' contact user' || doc_id || '@example.com or admin@test.org'
    WHEN 1 THEN ' ip 10.' || (doc_id % 256) || '.0.1 ssn 123-45-6789'
    WHEN 2 THEN ' call +4915123456789 card 4111111111111111'
    ELSE '' END AS text
  FROM documents
), cnt AS (
  SELECT doc_id, {counts} FROM spiked
)
SELECT {aggs},
  COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN ({total}) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_pii,
  round(CAST(SUM(CASE WHEN ({total}) > 0 THEN 1 ELSE 0 END) AS DOUBLE)
        / COUNT(*), 4) AS pii_doc_rate
FROM cnt
"""


def pii_redact_query() -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators import pii as PII

        df = load(spark, sf_dir, "documents")
        m = F.col("doc_id") % 4
        suffix = (
            F.when(
                m == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            )
            .when(m == 1, F.lit(" ip 10.1.0.1 ssn 123-45-6789"))
            .when(
                m == 2,
                F.lit(" call +4915123456789 card 4111111111111111"),
            )
            .otherwise(F.lit(""))
        )
        spiked = df.select(
            "doc_id", F.concat(F.col("text"), suffix).alias("text")
        )
        return PII.redact_documents(spiked, "text").select(
            "doc_id", F.md5("text").alias("redacted_md5")
        )

    return fn


def pii_redact_sql() -> str:
    from pandas_profiling_personal_spark.operators.pii import _REDACT

    expr = "text"
    for kind, (pat, repl) in _REDACT.items():
        duck_repl = repl.replace("$1", "\\1")
        expr = f"regexp_replace({expr}, '{pat}', '{duck_repl}', 'g')"
    return f"""
WITH spiked AS (
  SELECT doc_id, text || CASE doc_id % 4
    WHEN 0 THEN ' contact user' || doc_id || '@example.com'
    WHEN 1 THEN ' ip 10.1.0.1 ssn 123-45-6789'
    WHEN 2 THEN ' call +4915123456789 card 4111111111111111'
    ELSE '' END AS text
  FROM documents
)
SELECT doc_id, md5({expr}) AS redacted_md5 FROM spiked
"""


def quality_filter_query() -> QueryFn:
    # the driver's canonicalizer sorts the result frame; an array column is
    # unhashable for pandas sort_values, so the parity surface joins it to a
    # CSV string — the library operator (TX.quality_filter) keeps the array
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        out = TX.quality_filter(load(spark, sf_dir, "documents"), "text", "doc_id")
        return out.withColumn(
            "reject_reasons", F.array_join("reject_reasons", ",")
        )

    return fn


def quality_filter_sql() -> str:
    # reasons re-derive the same thresholds over the text-profile CTE; the
    # list_filter drops the NULL branches exactly like Spark's F.filter
    profile_cte = text_profile_sql().strip().rstrip()
    return f"""
WITH tp AS (
{profile_cte}
)
SELECT doc_id, quality_score,
  coalesce(array_to_string(list_filter([
    CASE WHEN n_tokens IS NULL THEN 'null_text' END,
    CASE WHEN n_tokens < 10 THEN 'too_short' END,
    CASE WHEN n_tokens > 100000 THEN 'too_long' END,
    CASE WHEN punct_ratio > 0.2 THEN 'high_punct' END,
    CASE WHEN stopword_ratio < 0.05 THEN 'low_stopword' END,
    CASE WHEN quality_score < 0.5 THEN 'low_quality' END
  ], x -> x IS NOT NULL), ','), '') AS reject_reasons,
  len(list_filter([
    CASE WHEN n_tokens IS NULL THEN 'null_text' END,
    CASE WHEN n_tokens < 10 THEN 'too_short' END,
    CASE WHEN n_tokens > 100000 THEN 'too_long' END,
    CASE WHEN punct_ratio > 0.2 THEN 'high_punct' END,
    CASE WHEN stopword_ratio < 0.05 THEN 'low_stopword' END,
    CASE WHEN quality_score < 0.5 THEN 'low_quality' END
  ], x -> x IS NOT NULL)) = 0 AS keep
FROM tp
"""


def packing_stats_query(context_len: int = 256) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return TX.packing_stats(
            load(spark, sf_dir, "documents"), "text", context_len, exact=True
        )

    return fn


def packing_stats_sql(context_len: int = 256) -> str:
    L = context_len
    return f"""
WITH {_TOK},
t AS (SELECT CAST(len(tok.t) AS BIGINT) AS n FROM tok),
agg AS (
  SELECT COUNT(*) AS n_docs,
    CAST(SUM(n) AS BIGINT) AS total_tokens,
    round(avg(n), 4) AS mean_tokens,
    round(quantile_cont(n, 0.5), 4) AS p50_tokens,
    round(quantile_cont(n, 0.95), 4) AS p95_tokens,
    max(n) AS max_tokens,
    CAST(SUM(CASE WHEN n > {L} THEN 1 ELSE 0 END) AS BIGINT)
      AS docs_over_context,
    CAST(SUM(CASE WHEN n > {L} THEN n - {L} ELSE 0 END) AS BIGINT)
      AS tokens_over_context,
    CAST(SUM(CAST(ceil(n * 1.0 / {L}) AS BIGINT)) AS BIGINT)
      AS naive_sequences
  FROM t
)
SELECT *, CAST(ceil(total_tokens * 1.0 / {L}) AS BIGINT) AS min_sequences,
  round(CASE WHEN naive_sequences > 0
    THEN 1.0 - total_tokens * 1.0 / (naive_sequences * {L})
    ELSE 0.0 END, 4) AS naive_pad_frac
FROM agg
"""


# --------------------------------------------------------------------------------
# corpus mixture planner — per-group sampling rates to hit target weights
# (operators/mixture.py; no reference analogue — LLM-pipeline tier)
# --------------------------------------------------------------------------------

_MIX_TARGETS = {"en": 0.5, "zh": 0.2, "fr": 0.2, "de": 0.1}  # es dropped


def _mix_target_case(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} = '{g}' THEN CAST({w!r} AS DOUBLE)"
        for g, w in _MIX_TARGETS.items()
    )
    return f"CASE {whens} ELSE CAST(0.0 AS DOUBLE) END"


def mixture_plan_query() -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.mixture import (
            mixture_plan,
        )

        return mixture_plan(
            load(spark, sf_dir, "documents"), "lang", _MIX_TARGETS, "n_chars"
        )

    return fn


def mixture_plan_sql() -> str:
    tgt = _mix_target_case('"group"')
    return f"""
WITH g AS (
  SELECT lang AS "group", count(*) AS n_docs,
    CAST(sum(n_chars) AS BIGINT) AS size
  FROM documents GROUP BY 1
),
t AS (
  SELECT *, {tgt} AS target_share,
    CAST(sum(size) OVER () AS BIGINT) AS total,
    min(CASE WHEN {tgt} > 0
        THEN CAST(size AS DOUBLE) / {tgt} END) OVER () AS t_max
  FROM g
)
SELECT "group", n_docs, size,
  CAST(size AS DOUBLE) / CAST(total AS DOUBLE) AS current_share,
  target_share,
  CASE WHEN target_share > 0
    THEN t_max * target_share / CAST(size AS DOUBLE)
    ELSE CAST(0.0 AS DOUBLE) END AS sampling_rate,
  (CASE WHEN target_share > 0
    THEN t_max * target_share / CAST(size AS DOUBLE)
    ELSE CAST(0.0 AS DOUBLE) END) * CAST(size AS DOUBLE) AS planned_size
FROM t ORDER BY "group"
"""


def mixture_counts_query() -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.mixture import (
            mixture_counts,
        )

        return mixture_counts(
            load(spark, sf_dir, "documents"),
            "lang",
            _MIX_TARGETS,
            key="doc_id",
            size_col="n_chars",
        )

    return fn


def mixture_counts_sql() -> str:
    tgt = _mix_target_case('"group"')
    return f"""
WITH g AS (
  SELECT lang AS "group", CAST(sum(n_chars) AS BIGINT) AS size
  FROM documents GROUP BY 1
),
t AS (
  SELECT *, {tgt} AS target_share,
    min(CASE WHEN {tgt} > 0
        THEN CAST(size AS DOUBLE) / {tgt} END) OVER () AS t_max
  FROM g
),
plan AS (
  SELECT "group",
    CASE WHEN target_share > 0
      THEN t_max * target_share / CAST(size AS DOUBLE)
      ELSE CAST(0.0 AS DOUBLE) END AS sampling_rate
  FROM t
),
kept AS (
  SELECT d.lang AS "group", d.n_chars
  FROM documents d JOIN plan p ON d.lang = p."group"
  WHERE CAST({_HASH64.format(x="CAST(d.doc_id AS VARCHAR)")} AS DOUBLE)
        / CAST(4294967296 AS DOUBLE) < p.sampling_rate
)
SELECT "group", count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS kept_size
FROM kept GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------------
# benchmark decontamination — corpus docs sharing k-gram shingles with a
# benchmark subset (dedup.contamination_keep_list)
# --------------------------------------------------------------------------------


def _shingles_cte(name: str, k: int, where: str = "") -> str:
    """k-parameterized twin of _SHINGLES (which is k=3): distinct k-word
    shingles per doc, whole-doc fallback under k tokens — matches
    dedup.word_shingles exactly."""
    joined = " || '_' || ".join(f"t[i+{j}]" for j in range(k))
    return (
        f"{name} AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) >= {k}"
        f" THEN list_transform(range(1, len(t) - {k} + 2), i -> {joined})"
        f" ELSE [array_to_string(t, '_')] END)) AS shingle FROM tok {where})"
    )


def contamination_query(k: int = 8, bench_mod: int = 37) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.dedup import (
            contamination_keep_list,
        )

        docs = load(spark, sf_dir, "documents")
        bench = docs.where(F.col("doc_id") % bench_mod == 0)
        return contamination_keep_list(docs, bench, shingle_k=k)

    return fn


def contamination_sql(k: int = 8, bench_mod: int = 37) -> str:
    return f"""
WITH {_TOK},
{_shingles_cte("sh_c", k)},
sh_ne AS (SELECT doc_id, shingle FROM sh_c WHERE shingle <> ''),
bench AS (SELECT DISTINCT shingle FROM sh_ne WHERE doc_id % {bench_mod} = 0),
hits AS (
  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_matched
  FROM sh_ne s JOIN bench b USING (shingle) GROUP BY 1
)
SELECT d.doc_id, coalesce(h.n_matched, 0) AS n_matched,
  coalesce(h.n_matched, 0) < 1 AS keep
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


def weighted_sample_query(
    target_fraction: float = 0.3, temperature: float = 2.0
) -> QueryFn:
    """Score-proportional deterministic sampling (operators/sampling.py:
    weighted_sample — the quality/temperature row-level sampler of LLM
    data-mixing recipes): keep_prob ∝ n_chars^(1/T), scaled to the target
    expected fraction by ONE 1-row aggregate; the per-row uniform is the
    md5(key) idiom every dedup oracle already proves cross-engine. The
    9-decimal keep_prob rounding makes the comparison engine-stable (the
    double pow/sum differ in the last ulp between engines)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.sampling import (
            weighted_sample,
        )

        docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
        out = weighted_sample(
            docs, "doc_id", "n_chars", target_fraction, temperature
        )
        return out.select(
            "doc_id", F.round(F.col("keep_prob"), 4).alias("keep_prob")
        )

    return fn


def weighted_sample_sql(
    target_fraction: float = 0.3, temperature: float = 2.0
) -> str:
    inv_t = repr(1.0 / temperature)
    u = (
        "(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
        " AS UBIGINT) % 1000000) / 1000000.0"
    )
    return f"""
WITH w AS (
  SELECT doc_id,
         CASE WHEN n_chars IS NOT NULL AND n_chars > 0
              THEN pow(CAST(n_chars AS DOUBLE), {inv_t}) END AS wt
  FROM documents),
tot AS (SELECT sum(wt) AS wsum, count(wt) AS n FROM w),
sel AS (
  SELECT doc_id,
         CASE WHEN wt IS NOT NULL THEN
           round(least(1.0, {target_fraction!r} * tot.n / tot.wsum * wt), 9)
         END AS keep_prob,
         {u} AS u
  FROM w, tot)
SELECT doc_id, round(keep_prob, 4) AS keep_prob
FROM sel WHERE keep_prob IS NOT NULL AND u < keep_prob
"""


def mixture_upsampled_query(max_repeats: float = 3.0) -> QueryFn:
    """Upsampling tier: zh/fr/de may repeat up to ``max_repeats`` epochs, so
    the small languages stop being the binding constraint on the mixture."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.mixture import (
            mixture_counts,
        )

        return mixture_counts(
            load(spark, sf_dir, "documents"),
            "lang",
            _MIX_TARGETS,
            key="doc_id",
            size_col="n_chars",
            max_repeats=max_repeats,
        )

    return fn


def mixture_upsampled_sql(max_repeats: float = 3.0) -> str:
    tgt = _mix_target_case('"group"')
    rep = f"CAST({max_repeats!r} AS DOUBLE)"
    return f"""
WITH g AS (
  SELECT lang AS "group", CAST(sum(n_chars) AS BIGINT) AS size
  FROM documents GROUP BY 1
),
t AS (
  SELECT *, {tgt} AS target_share,
    min(CASE WHEN {tgt} > 0
        THEN CAST(size AS DOUBLE) * {rep} / {tgt} END) OVER () AS t_max
  FROM g
),
plan AS (
  SELECT "group",
    CASE WHEN target_share > 0
      THEN t_max * target_share / CAST(size AS DOUBLE)
      ELSE CAST(0.0 AS DOUBLE) END AS sampling_rate
  FROM t
),
copies AS (
  SELECT d.lang AS "group", d.n_chars,
    CAST(floor(p.sampling_rate) AS BIGINT)
    + CASE WHEN CAST({_HASH64.format(x="CAST(d.doc_id AS VARCHAR)")} AS DOUBLE)
             / CAST(4294967296 AS DOUBLE)
           < p.sampling_rate - floor(p.sampling_rate)
      THEN 1 ELSE 0 END AS n_copies
  FROM documents d JOIN plan p ON d.lang = p."group"
)
SELECT "group", CAST(sum(n_copies) AS BIGINT) AS n_kept,
  CAST(sum(n_chars * n_copies) AS BIGINT) AS kept_size
FROM copies WHERE n_copies > 0 GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------------
# corpus-level duplicated-span removal (dedup.span_dedup, C4-style)
# --------------------------------------------------------------------------------


def span_dedup_query(span_words: int = 10) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.dedup import span_dedup

        return span_dedup(
            load(spark, sf_dir, "documents"), span_words=span_words
        )

    return fn


def span_dedup_sql(span_words: int = 10) -> str:
    k = span_words
    n = f"CAST(ceil(len(t) / {float(k)!r}) AS BIGINT)"
    return f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
occ AS (
  SELECT doc_id,
    unnest(range(1, {n} + 1)) - 1 AS idx,
    unnest(list_transform(range(1, {n} + 1),
      i -> array_to_string(t[(i-1)*{k}+1 : i*{k}], ' '))) AS span
  FROM tok
),
win AS (
  SELECT *, row_number() OVER (PARTITION BY span ORDER BY doc_id, idx) AS rn
  FROM occ
),
kept AS (
  SELECT doc_id, string_agg(span, ' ' ORDER BY idx) AS text_deduped,
    CAST(count(*) AS BIGINT) AS n_spans_kept
  FROM win WHERE rn = 1 GROUP BY doc_id
),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans FROM occ GROUP BY doc_id)
SELECT d.doc_id, coalesce(k.text_deduped, '') AS text_deduped,
  coalesce(tot.n_spans, 0) AS n_spans,
  coalesce(k.n_spans_kept, 0) AS n_spans_kept
FROM documents d
LEFT JOIN tot ON d.doc_id = tot.doc_id
LEFT JOIN kept k ON d.doc_id = k.doc_id
"""


# --------------------------------------------------------------------------------
# sliding-window document chunking — RAG-indexing / training-prep step
# (operators/text.py chunk_documents; no reference analogue — LLM-pipeline tier)
# --------------------------------------------------------------------------------


def chunk_documents_query(
    chunk_tokens: int = 64, overlap_tokens: int = 16
) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return TX.chunk_documents(
            load(spark, sf_dir, "documents"),
            "doc_id",
            "text",
            chunk_tokens=chunk_tokens,
            overlap_tokens=overlap_tokens,
        )

    return fn


def chunk_documents_sql(
    chunk_tokens: int = 64, overlap_tokens: int = 16
) -> str:
    stride = chunk_tokens - overlap_tokens
    return f"""
WITH base AS (
  SELECT doc_id,
    string_split_regex(
      regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS toks
  FROM documents WHERE regexp_matches(text, '\\S')
),
st AS (
  SELECT doc_id, toks,
    unnest(generate_series(
      1, greatest(len(toks) - {overlap_tokens}, 1), {stride})) AS gs
  FROM base
)
SELECT doc_id AS id,
  CAST((gs - 1) / {stride} AS BIGINT) AS chunk_index,
  md5(CAST(doc_id AS VARCHAR) || ':'
      || CAST(CAST((gs - 1) / {stride} AS BIGINT) AS VARCHAR)) AS chunk_id,
  array_to_string(toks[gs:gs + {chunk_tokens} - 1], ' ') AS chunk_text,
  CAST(len(toks[gs:gs + {chunk_tokens} - 1]) AS BIGINT) AS n_chunk_tokens
FROM st
"""


# --------------------------------------------------------------------------------
# C4-style line-level cleaning (operators/text.py c4_line_filter). The synthetic
# documents are single-line, so the oracle row derives deterministic multi-line
# text first (replace ' value ' -> newline, same literal-replace in both
# engines) and relaxes the terminal-punctuation class to the corpus alphabet;
# the full punctuation/ban-list semantics are pinned by hand-built pytests.
# --------------------------------------------------------------------------------


def c4_line_filter_query(min_words: int = 4) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load(spark, sf_dir, "documents").withColumn(
            "text", F.replace(F.col("text"), F.lit(" value "), F.lit("\n"))
        )
        return TX.c4_line_filter(
            df, "doc_id", "text",
            min_words=min_words, terminal_punct="[a-z0-9]",
        )

    return fn


def c4_line_filter_sql(min_words: int = 4) -> str:
    keep = (
        f"x -> len(string_split_regex(trim(x), '\\s+')) >= {min_words}"
        " AND regexp_matches(trim(x), '[a-z0-9]$')"
        " AND NOT (contains(lower(trim(x)), 'javascript')"
        " OR contains(lower(trim(x)), 'lorem ipsum')"
        " OR contains(lower(trim(x)), '{'))"
    )
    return f"""
WITH lined AS (
  SELECT doc_id, replace(text, ' value ', chr(10)) AS text FROM documents
)
SELECT doc_id AS id,
  array_to_string(list_filter(string_split(text, chr(10)), {keep}), chr(10))
    AS text_clean,
  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
  CAST(len(list_filter(string_split(text, chr(10)), {keep})) AS BIGINT)
    AS n_lines_kept
FROM lined
"""


# --------------------------------------------------------------------------------
# TF-IDF keyword extraction (operators/text.py tfidf_top_terms). Score rounds
# BEFORE ranking and ties break on term asc, so the ranking is reproducible
# across engines despite ulp-level ln() differences.
# --------------------------------------------------------------------------------


def tfidf_top_terms_query(k: int = 5) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return TX.tfidf_top_terms(
            load(spark, sf_dir, "documents"), "doc_id", "text", k=k
        )

    return fn


def tfidf_top_terms_sql(k: int = 5) -> str:
    return f"""
WITH {_TOK},
ex AS (SELECT doc_id, unnest(t) AS term FROM tok),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM ex GROUP BY 1, 2),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
    round(tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0), 4)
      AS score
  FROM tf JOIN dfreq USING (term), n
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id AS id, CAST(rank AS BIGINT) AS rank, term, tf, df, score
FROM ranked WHERE rank <= {k}
"""


# --------------------------------------------------------------------------------
# SemDeDup-style semantic dedup (operators/similarity.py semantic_dedup):
# deterministic md5-seed centroids + min-id-wins keep rule make the whole
# cluster/pair/keep pipeline oracle-reproducible.
# --------------------------------------------------------------------------------


def semantic_dedup_query(
    n_cells: int = 16, threshold: float = 0.3
) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return SIM.semantic_dedup(
            load(spark, sf_dir, "embeddings"),
            "vec_id",
            "embedding",
            n_cells=n_cells,
            threshold=threshold,
        )

    return fn


def semantic_dedup_sql(
    n_cells: int = 16, threshold: float = 0.3, max_cell_size: int = 10_000
) -> str:
    key = "CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS UBIGINT)"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT vec_id AS cell_id, v AS cv FROM e
  ORDER BY {key} ASC, vec_id ASC LIMIT {n_cells}),
asg0 AS (
  SELECT id, v, cell_id FROM (
    SELECT e.vec_id AS id, e.v, c.cell_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round({_cos_sql("e.v", "c.cv")}, 4) DESC,
                      c.cell_id ASC) AS r
    FROM e, cents c) WHERE r = 1),
asg AS (
  SELECT id, v, cell_id,
         CAST(floor((row_number() OVER (PARTITION BY cell_id ORDER BY id)
                     - 1) / {max_cell_size}) AS BIGINT) AS sub_cell
  FROM asg0),
dups AS (
  SELECT b.id AS id, min(a.id) AS dup_of
  FROM asg a JOIN asg b
    ON a.cell_id = b.cell_id AND a.sub_cell = b.sub_cell AND a.id < b.id
  WHERE round({_cos_sql("a.v", "b.v")}, 4) >= {threshold}
  GROUP BY 1)
SELECT asg.id, asg.cell_id, d.dup_of IS NULL AS keep, d.dup_of, asg.sub_cell
FROM asg LEFT JOIN dups d ON asg.id = d.id
"""


# --------------------------------------------------------------------------------
# composed corpus-preparation funnel (operators/pipeline.py corpus_funnel) in
# its SQL-expressible configuration: quality + exact-dedup + MinHash
# near-dup stages over raw text (line_filter=False — the synthetic docs are
# single-line without terminal punctuation; the line stage's semantics are
# pinned by the c4_line_filter oracle row + pytest). The near-dup stage runs
# the full deterministic md5 MinHash→LSH→Jaccard-verify pipeline over the
# exact-dedup winners, then the greedy min-partner sweep. reject_reasons
# joins to a string for the driver's sort-based canonicalizer.
# --------------------------------------------------------------------------------

_FUNNEL_MIN_JACCARD = 0.5


def corpus_funnel_query() -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.pipeline import (
            FUNNEL_STAGES,
            corpus_funnel,
        )

        out = corpus_funnel(
            load(spark, sf_dir, "documents"), "doc_id", "text",
            line_filter=False,
            near_dup={"min_jaccard": _FUNNEL_MIN_JACCARD},
        )
        return out.select(
            "id",
            *FUNNEL_STAGES,
            "quality_score",
            F.coalesce(
                F.array_join(F.col("reject_reasons"), ","), F.lit("")
            ).alias("reject_reasons"),
        )

    return fn


def corpus_funnel_sql() -> str:
    profile_cte = text_profile_sql().strip()
    reasons = """list_filter([
    CASE WHEN n_tokens IS NULL THEN 'null_text' END,
    CASE WHEN n_tokens < 10 THEN 'too_short' END,
    CASE WHEN n_tokens > 100000 THEN 'too_long' END,
    CASE WHEN punct_ratio > 0.2 THEN 'high_punct' END,
    CASE WHEN stopword_ratio < 0.05 THEN 'low_stopword' END,
    CASE WHEN quality_score < 0.5 THEN 'low_quality' END
  ], x -> x IS NOT NULL)"""
    # MinHash near-dup over exact-dedup winners: same CTE chain as
    # minhash_dedup_sql, with tokenization restricted to winner docs
    num_hashes, bands, mj = 16, 4, _FUNNEL_MIN_JACCARD
    params = DD.minhash_params(num_hashes)
    r = num_hashes // bands
    mins = ", ".join(
        f"min(({a} * h + {b}) % {DD.MINHASH_PRIME}) AS m{i}"
        for i, (a, b) in enumerate(params)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {j} AS band, md5(concat_ws(','"
        + "".join(f", m{j * r + i}" for i in range(r))
        + ")) AS bucket FROM sig"
        for j in range(bands)
    )
    return f"""
WITH tp AS (
{profile_cte}
),
q AS (
  SELECT tp.doc_id, tp.quality_score, tp.fingerprint,
    d.text IS NOT NULL AS pass_lines,
    (d.text IS NOT NULL) AND len({reasons}) = 0 AS pass_quality,
    coalesce(array_to_string({reasons}, ','), '') AS reject_reasons
  FROM tp JOIN documents d USING (doc_id)),
w AS (
  SELECT fingerprint, min(doc_id) AS win FROM q WHERE pass_quality
  GROUP BY 1),
d0 AS (
  SELECT q.doc_id AS id, q.pass_lines, q.pass_quality,
    q.pass_quality AND q.doc_id = w.win AS pass_dedup,
    q.quality_score, q.reject_reasons
  FROM q LEFT JOIN w ON q.fingerprint = w.fingerprint),
tok AS (SELECT doc_id, list_filter(string_split_regex(lower(text),
        '[^a-z0-9]+'), x -> x <> '') AS t
        FROM documents SEMI JOIN d0 ON documents.doc_id = d0.id AND d0.pass_dedup),
{_SHINGLES},
h AS (SELECT doc_id, CAST({_HASH64.format(x='shingle')} % {DD.MINHASH_PRIME} AS BIGINT) AS h
      FROM sh WHERE shingle <> ''),
sig AS (SELECT doc_id, {mins} FROM h GROUP BY doc_id),
bands AS (SELECT * FROM ({band_selects})
          QUALIFY count(*) OVER (PARTITION BY band, bucket) <= 1000),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
shf AS (SELECT doc_id, shingle FROM sh WHERE shingle <> ''),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY doc_id),
common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
           FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
vc AS (SELECT c.* FROM common c SEMI JOIN cand ON c.doc_a = cand.doc_a AND c.doc_b = cand.doc_b),
nd AS (SELECT vc.doc_b AS id, min(vc.doc_a) AS nd_of
       FROM vc JOIN sizes sa ON vc.doc_a = sa.doc_id
               JOIN sizes sb ON vc.doc_b = sb.doc_id
       WHERE round(vc.n_common * 1.0 / (sa.n_sh + sb.n_sh - vc.n_common), 4) >= {mj}
       GROUP BY 1)
SELECT d0.id, d0.pass_lines, d0.pass_quality, d0.pass_dedup,
  d0.pass_dedup AND nd.id IS NULL AS pass_near_dup,
  d0.pass_dedup AND nd.id IS NULL AS pass_decontam,
  d0.quality_score, d0.reject_reasons
FROM d0 LEFT JOIN nd ON d0.id = nd.id
"""


# --------------------------------------------------------------------------------
# embedding-column health profile (operators/similarity.py embedding_stats)
# --------------------------------------------------------------------------------


def embedding_stats_query() -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return SIM.embedding_stats(
            load(spark, sf_dir, "embeddings"), "embedding",
            exact_quantiles=True,
        )

    return fn


def embedding_stats_sql() -> str:
    norm = "sqrt(list_dot_product(v, v))"
    return f"""
WITH e AS (SELECT embedding, embedding::DOUBLE[] AS v FROM embeddings),
f AS (
  SELECT embedding, v, len(v) AS dim,
    len(list_filter(v, x -> x = 0.0)) = len(v) AS is_zero,
    len(list_filter(v, x -> x IS NULL OR isnan(x) OR isinf(x))) > 0 AS nonfinite,
    -- norm over FINITE vectors only, mirroring the Spark op (a NaN
    -- component would otherwise poison max/avg)
    CASE WHEN len(list_filter(v, x -> x IS NULL OR isnan(x) OR isinf(x))) = 0
         THEN {norm} END AS nrm
  FROM e)
SELECT CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_null,
  min(dim) AS dim_min, max(dim) AS dim_max,
  CAST(count(DISTINCT dim) AS BIGINT) AS n_distinct_dims,
  CAST(sum(CASE WHEN is_zero THEN 1 ELSE 0 END) AS BIGINT)
    AS n_zero_vectors,
  CAST(sum(CASE WHEN nonfinite THEN 1 ELSE 0 END) AS BIGINT)
    AS n_nonfinite_vectors,
  round(min(nrm), 4) AS norm_min,
  round(avg(nrm), 4) AS norm_mean,
  round(quantile_cont(nrm, 0.5), 4) AS norm_p50,
  round(max(nrm), 4) AS norm_max
FROM f
"""


def embedding_drift_query(
    dim: int = 64, scale: float = 1.05, shift: float = 0.1, modulo: int = 3
) -> QueryFn:
    """Embedding drift between two snapshots (operators/drift.embedding_drift):
    snapshot B is a deterministic scaled+shifted subset of A
    (``x -> x*scale + shift`` over ``vec_id % modulo != 0``), so the norm-PSI,
    centroid-cosine and per-dimension mean-shift signals are all non-trivially
    exercised and an independent engine reproduces them exactly."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.drift import (
            embedding_drift,
        )

        emb = load(spark, sf_dir, "embeddings")
        df_b = emb.where(F.col("vec_id") % modulo != 0).select(
            F.transform(
                "embedding",
                lambda x: x.cast("double") * scale + shift,
            ).alias("embedding")
        )
        return embedding_drift(emb, df_b, "embedding", dim=dim)

    return fn


def embedding_drift_sql(
    dim: int = 64,
    scale: float = 1.05,
    shift: float = 0.1,
    modulo: int = 3,
    bins: int = 10,
    eps: float = 1e-6,
) -> str:
    valid = (
        "v IS NOT NULL AND len(v) = {d} AND "
        "len(list_filter(v, x -> x IS NULL OR isnan(x) OR isinf(x))) = 0"
    ).format(d=dim)
    norm = "sqrt(list_dot_product(v, v))"
    bucket = (
        f"CASE WHEN e.hi = e.lo THEN 0 ELSE CAST(least(greatest("
        f"floor((norm - e.lo) / ((e.hi - e.lo) / {float(bins)!r})), 0), "
        f"{bins - 1}) AS BIGINT) END"
    )
    epsb = eps * bins
    return f"""
WITH pa AS (
  SELECT v, {norm} AS norm FROM (
    SELECT embedding::DOUBLE[] AS v FROM embeddings)
  WHERE {valid}),
pb AS (
  SELECT v, {norm} AS norm FROM (
    SELECT list_transform(embedding::DOUBLE[], x -> x * {scale!r} + {shift!r}) AS v
    FROM embeddings WHERE vec_id % {modulo} != 0)
  WHERE {valid}),
tot AS (SELECT (SELECT count(*) FROM pa) AS n_a, (SELECT count(*) FROM pb) AS n_b),
e AS (SELECT least((SELECT min(norm) FROM pa), (SELECT min(norm) FROM pb)) AS lo,
             greatest((SELECT max(norm) FROM pa), (SELECT max(norm) FROM pb)) AS hi),
ca AS (SELECT bucket, count(*) AS c FROM (SELECT {bucket} AS bucket FROM pa, e) GROUP BY 1),
cb AS (SELECT bucket, count(*) AS c FROM (SELECT {bucket} AS bucket FROM pb, e) GROUP BY 1),
grid AS (
  SELECT r.bucket, coalesce(ca.c, 0) AS c_a, coalesce(cb.c, 0) AS c_b
  FROM range(0, {bins}) r(bucket)
  LEFT JOIN ca ON r.bucket = ca.bucket LEFT JOIN cb ON r.bucket = cb.bucket),
terms AS (
  SELECT bucket, (p - q) * ln(p / q) AS term, round(abs(p - q), 6) AS shift
  FROM (SELECT bucket, (c_a + {eps!r}) / (t.n_a + {epsb!r}) AS p,
               (c_b + {eps!r}) / (t.n_b + {epsb!r}) AS q
        FROM grid, tot t)),
psi AS (
  SELECT round(sum(term), 6) AS norm_psi,
         (SELECT bucket FROM terms ORDER BY shift DESC, bucket ASC LIMIT 1)
           AS max_shift_bucket
  FROM terms),
da AS (SELECT r.i, sum(v[r.i + 1]) AS s, sum(v[r.i + 1] * v[r.i + 1]) AS q
       FROM pa, range(0, {dim}) r(i) GROUP BY 1),
db AS (SELECT r.i, sum(v[r.i + 1]) AS s, sum(v[r.i + 1] * v[r.i + 1]) AS q
       FROM pb, range(0, {dim}) r(i) GROUP BY 1),
d AS (
  SELECT a.i, a.s / t.n_a AS m_a, b.s / t.n_b AS m_b,
         greatest(a.q / t.n_a - (a.s / t.n_a) ^ 2, 0) AS var_a,
         greatest(b.q / t.n_b - (b.s / t.n_b) ^ 2, 0) AS var_b
  FROM da a JOIN db b ON a.i = b.i, tot t),
cent AS (
  SELECT sum(m_a * m_b) AS dot, sqrt(sum(m_a * m_a)) AS na,
         sqrt(sum(m_b * m_b)) AS nb,
         sqrt(sum((m_a - m_b) ^ 2)) AS l2
  FROM d),
best AS (
  SELECT i, round(abs(m_a - m_b) / (sqrt((var_a + var_b) / 2.0) + {eps!r}), 6)
           AS ds
  FROM d ORDER BY ds DESC, i ASC LIMIT 1)
SELECT t.n_a AS n_a, t.n_b AS n_b, p.norm_psi, p.max_shift_bucket,
       CASE WHEN c.na > 0 AND c.nb > 0
            THEN round(c.dot / (c.na * c.nb), 6) END AS centroid_cosine,
       round(c.l2, 6) AS mean_shift_l2,
       b.i AS max_shift_dim, b.ds AS max_mean_shift
FROM tot t, psi p, cent c, best b
"""


# --------------------------------------------------------------------------------
# incremental dedup vs a historical store (operators/dedup.py
# incremental_exact_dedup / incremental_minhash_dedup): history = docs with
# id < cutoff processed first, new shard = the rest — the oracle reproduces
# the two-step store round-trip, which the pytest equivalence gate proves
# equal to the batch sweep over the union.
# --------------------------------------------------------------------------------


def incremental_exact_dedup_query(cutoff: int = 250) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load(spark, sf_dir, "documents")
        hist = docs.where(F.col("doc_id") < cutoff)
        new = docs.where(F.col("doc_id") >= cutoff)
        fa = DD.incremental_exact_dedup(hist, None)
        store = DD.dedup_store_update(None, fa)
        return DD.incremental_exact_dedup(new, store)

    return fn


def incremental_exact_dedup_sql(cutoff: int = 250) -> str:
    # null text -> the same \\x00null sentinel the Spark op uses (an
    # equi-join on SQL NULL matches nothing; the sentinel makes null-text
    # docs one dup group across shards, matching the batch window)
    return f"""
WITH f AS (SELECT doc_id,
             coalesce(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')),
                      chr(0) || 'null') AS fingerprint
           FROM documents),
hist AS (SELECT fingerprint, min(doc_id) AS hist_win FROM f
         WHERE doc_id < {cutoff} GROUP BY 1),
new AS (SELECT doc_id, fingerprint,
          min(doc_id) OVER (PARTITION BY fingerprint) AS shard_win
        FROM f WHERE doc_id >= {cutoff})
SELECT n.doc_id, n.fingerprint,
  (h.hist_win IS NULL AND n.doc_id = n.shard_win) AS keep,
  CASE WHEN h.hist_win IS NOT NULL THEN h.hist_win
       WHEN n.doc_id <> n.shard_win THEN n.shard_win END AS dup_of
FROM new n LEFT JOIN hist h ON n.fingerprint = h.fingerprint
"""


def incremental_minhash_dedup_query(
    cutoff: int = 250,
    num_hashes: int = 16,
    bands: int = 4,
    min_est_jaccard: float = 0.7,
) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load(spark, sf_dir, "documents")
        sig_cols = [f"m{i}" for i in range(num_hashes)]
        fa = DD.incremental_minhash_dedup(
            docs.where(F.col("doc_id") < cutoff), None,
            num_hashes=num_hashes, bands=bands,
            min_est_jaccard=min_est_jaccard,
        )
        return DD.incremental_minhash_dedup(
            docs.where(F.col("doc_id") >= cutoff),
            fa.select("doc_id", *sig_cols),
            num_hashes=num_hashes, bands=bands,
            min_est_jaccard=min_est_jaccard,
        )

    return fn


def incremental_minhash_dedup_sql(
    cutoff: int = 250,
    num_hashes: int = 16,
    bands: int = 4,
    min_est_jaccard: float = 0.7,
) -> str:
    params = DD.minhash_params(num_hashes)
    r = num_hashes // bands
    mins = ", ".join(
        f"min(({a} * h + {b}) % {DD.MINHASH_PRIME}) AS m{i}"
        for i, (a, b) in enumerate(params)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {j} AS band, md5(concat_ws(','"
        + "".join(f", m{j * r + i}" for i in range(r))
        + ")) AS bucket FROM sig"
        for j in range(bands)
    )
    est = " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END"
        for i in range(num_hashes)
    )
    sig_out = ", ".join(f"s.m{i}" for i in range(num_hashes))
    return f"""
WITH {_TOK}, {_SHINGLES},
h AS (SELECT doc_id, CAST({_HASH64.format(x='shingle')} % {DD.MINHASH_PRIME} AS BIGINT) AS h
      FROM sh WHERE shingle <> ''),
sig AS (SELECT doc_id, {mins} FROM h GROUP BY doc_id),
bandst AS ({band_selects}),
ba AS (SELECT * FROM bandst
       QUALIFY count(*) OVER (PARTITION BY band, bucket) <= 1000),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM ba a JOIN ba b
           ON a.band = b.band AND a.bucket = b.bucket
          AND a.doc_id < b.doc_id AND b.doc_id >= {cutoff}),
nd AS (SELECT c.doc_b AS doc_id, min(c.doc_a) AS dup_of
       FROM cand c JOIN sig sa ON c.doc_a = sa.doc_id
                   JOIN sig sb ON c.doc_b = sb.doc_id
       WHERE ({est}) * 1.0 / {num_hashes} >= {min_est_jaccard}
       GROUP BY 1)
SELECT s.doc_id, nd.doc_id IS NULL AS keep,
       nd.dup_of, {sig_out}
FROM sig s LEFT JOIN nd ON s.doc_id = nd.doc_id
WHERE s.doc_id >= {cutoff}
"""


def pack_sequences_query(
    context_len: int = 500, bucket_size: int = 100
) -> QueryFn:
    """Executable concatenate-and-chunk packing over the documents table
    (n_chars as the token proxy so the oracle is arithmetic-exact);
    bucket_size 100 forces the two-phase prefix sum through multiple
    buckets even at sf0.01."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.text import (
            pack_sequences,
        )

        return pack_sequences(
            load(spark, sf_dir, "documents"),
            "doc_id",
            "n_chars",
            context_len=context_len,
            bucket_size=bucket_size,
        )

    return fn


def pack_sequences_sql(context_len: int = 500) -> str:
    return f"""
WITH d AS (SELECT doc_id, coalesce(n_chars, 0) AS t FROM documents),
c AS (SELECT doc_id, t,
             sum(t) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM d)
SELECT doc_id, CAST(t AS BIGINT) AS n_tokens,
       CAST(cum - t AS BIGINT) AS start_token,
       CAST(floor((cum - t) / {float(context_len)!r}) AS BIGINT) AS seq_first,
       CAST(CASE WHEN t > 0 THEN floor((cum - 1) / {float(context_len)!r})
                 ELSE floor((cum - t) / {float(context_len)!r}) END AS BIGINT)
         AS seq_last
FROM c
"""


def audio_metadata_query() -> QueryFn:
    """Audio plumbing (fake tier) through the Arrow-batched decode pass —
    the md5-derived pseudo-fields are engine-reproducible integers
    (duration_s is excluded: Python banker's rounding vs SQL half-up can
    disagree on exact 6th-decimal ties; it is n_frames/sample_rate)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.multimodal import (
            audio_metadata,
        )

        df = (
            load(spark, sf_dir, "documents")
            .where(F.col("text").isNotNull())
            .select("doc_id", F.col("text").cast("binary").alias("blob"))
        )
        meta = audio_metadata(df, "blob", decoder="fake")
        return meta.select(
            "doc_id",
            F.col("audio_meta.n_bytes").alias("n_bytes"),
            F.col("audio_meta.format").alias("format"),
            F.col("audio_meta.sample_rate").cast("long").alias("sample_rate"),
            F.col("audio_meta.channels").cast("long").alias("channels"),
            F.col("audio_meta.bits_per_sample").cast("long").alias("bits"),
            F.col("audio_meta.n_frames").alias("n_frames"),
        )

    return fn


def audio_metadata_sql() -> str:
    h = "CAST(('0x' || substring(md5(text), 1, 8)) AS UBIGINT)"
    frames = "CAST(('0x' || substring(md5(text), 9, 8)) AS UBIGINT) % 1000000"
    return f"""
SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       CASE WHEN text LIKE 'GIF8%' THEN 'gif'
            WHEN text LIKE 'RIFF%' THEN 'riff'
            WHEN text LIKE 'YUV4MPEG2%' THEN 'y4m'
            WHEN substring(text, 1, 3) = chr(0) || chr(0) || chr(0)
                 THEN 'mp4?'
            ELSE 'unknown' END AS format,
       CAST(8000 + {h} % 40000 AS BIGINT) AS sample_rate,
       CAST(1 + {h} % 2 AS BIGINT) AS channels,
       CAST(8 * (1 + ({h} >> 2) % 2) AS BIGINT) AS bits,
       CAST({frames} AS BIGINT) AS n_frames
FROM documents WHERE text IS NOT NULL
"""


#: (doc_id % 7 -> ASCII magic) planting rule shared by the Spark query and
#: the oracle: every ASCII branch of the sniff when-chain fires on real
#: prefix comparisons; residues 5-6 stay magic-free ('unknown')
_PLANT_MAGICS = [
    (0, "GIF8"),
    (1, "RIFF"),
    (2, "YUV4MPEG2 "),
    (3, "P5 "),
    (4, "P3"),
]


def binary_format_mix_query() -> QueryFn:
    """The full-data tier of profile()'s binary-column refinement
    (``sniff_format_expr``): magic-byte format sniff + byte-size stats as
    ONE pure-SQL aggregate — never decodes a payload, so it holds at any
    corpus size. Deterministic ASCII magics are planted by doc_id residue
    so every when-chain branch is exercised, not just the 'unknown'
    fall-through. ASCII prefixes make byte- and character-wise prefix
    comparison coincide under UTF-8, so the oracle can compare on text."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.multimodal import (
            sniff_format_expr,
        )

        prefix = F.lit("")
        for res, magic in _PLANT_MAGICS:
            prefix = F.when(
                F.col("doc_id") % 7 == res, F.lit(magic)
            ).otherwise(prefix)
        df = (
            load(spark, sf_dir, "documents")
            .where(F.col("text").isNotNull())
            .select(
                F.concat(prefix, F.col("text")).cast("binary").alias("blob")
            )
        )
        return df.groupBy(
            sniff_format_expr(F.col("blob")).alias("format")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.length("blob")).alias("min_bytes"),
            F.max(F.length("blob")).alias("max_bytes"),
            F.sum(F.length("blob")).alias("sum_bytes"),
        )

    return fn


def binary_format_mix_sql() -> str:
    plant = " ".join(
        f"WHEN doc_id % 7 = {res} THEN '{m}' || text"
        for res, m in _PLANT_MAGICS
    )
    # when-chain in multimodal._SQL_MAGIC precedence order. \xFF\xD8\xFF
    # and \x89PNG cannot prefix valid UTF-8 text (invalid first byte), so
    # those two are unreachable on both sides; \x00\x00\x00 CAN — U+0000
    # is valid UTF-8 and legal in parquet strings — so the mp4? branch is
    # rebuilt with chr(0) rather than assumed away (review r9 third pass)
    return f"""
WITH b AS (
  SELECT CASE {plant} ELSE text END AS s
  FROM documents WHERE text IS NOT NULL)
SELECT CASE WHEN substring(s, 1, 4) = 'GIF8' THEN 'gif'
            WHEN substring(s, 1, 4) = 'RIFF' THEN 'riff'
            WHEN substring(s, 1, 9) = 'YUV4MPEG2' THEN 'y4m'
            WHEN substring(s, 1, 3) = chr(0) || chr(0) || chr(0)
                 THEN 'mp4?'
            WHEN substring(s, 1, 2) = 'P5' THEN 'pgm'
            WHEN substring(s, 1, 2) = 'P2' THEN 'pgm'
            WHEN substring(s, 1, 2) = 'P6' THEN 'ppm'
            WHEN substring(s, 1, 2) = 'P3' THEN 'ppm'
            ELSE 'unknown' END AS format,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(octet_length(s::BLOB)) AS BIGINT) AS min_bytes,
       CAST(max(octet_length(s::BLOB)) AS BIGINT) AS max_bytes,
       CAST(sum(octet_length(s::BLOB)) AS BIGINT) AS sum_bytes
FROM b GROUP BY 1
"""


def video_metadata_query() -> QueryFn:
    """Video plumbing (fake tier) through the Arrow-batched decode pass —
    the md5-derived pseudo-fields are engine-reproducible integers
    (duration_s excluded for the same rounding-tie reason as audio's)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.multimodal import (
            video_metadata,
        )

        df = (
            load(spark, sf_dir, "documents")
            .where(F.col("text").isNotNull())
            .select("doc_id", F.col("text").cast("binary").alias("blob"))
        )
        meta = video_metadata(df, "blob", decoder="fake")
        return meta.select(
            "doc_id",
            F.col("video_meta.n_bytes").alias("n_bytes"),
            F.col("video_meta.format").alias("format"),
            F.col("video_meta.width").cast("long").alias("width"),
            F.col("video_meta.height").cast("long").alias("height"),
            F.col("video_meta.fps_num").cast("long").alias("fps_num"),
            F.col("video_meta.n_frames").alias("n_frames"),
            F.col("video_meta.truncated").alias("truncated"),
        )

    return fn


def video_metadata_sql() -> str:
    h = "CAST(('0x' || substring(md5(text), 1, 8)) AS UBIGINT)"
    frames = "CAST(('0x' || substring(md5(text), 9, 8)) AS UBIGINT) % 100000"
    return f"""
SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       CASE WHEN text LIKE 'GIF8%' THEN 'gif'
            WHEN text LIKE 'RIFF%' THEN 'riff'
            WHEN text LIKE 'YUV4MPEG2%' THEN 'y4m'
            WHEN substring(text, 1, 3) = chr(0) || chr(0) || chr(0)
                 THEN 'mp4?'
            ELSE 'unknown' END AS format,
       CAST(64 + {h} % 1216 AS BIGINT) AS width,
       CAST(64 + ({h} >> 2) % 656 AS BIGINT) AS height,
       CAST(24 + {h} % 37 AS BIGINT) AS fps_num,
       CAST({frames} AS BIGINT) AS n_frames,
       ({h} % 17 = 0) AS truncated
FROM documents WHERE text IS NOT NULL
"""


def lm_perplexity_query(
    vocab_size: int = 300, alpha: float = 0.5, ref_mod: int = 2
) -> QueryFn:
    """CCNet-style LM quality scoring: train the bigram model on the even
    half of the corpus, score every document; vocab_size small enough that
    the unk path is exercised at sf0.01."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.text import (
            lm_perplexity_score,
            ngram_lm_train,
        )

        docs = load(spark, sf_dir, "documents")
        uni, big = ngram_lm_train(
            docs.where(F.col("doc_id") % ref_mod == 0),
            vocab_size=vocab_size,
        )
        return lm_perplexity_score(docs, uni, big, alpha=alpha)

    return fn


def lm_perplexity_sql(
    vocab_size: int = 300, alpha: float = 0.5, ref_mod: int = 2
) -> str:
    tok = (
        "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
        " x -> x <> '')"
    )
    return f"""
WITH tokr AS (
  SELECT {tok} AS t FROM documents
  WHERE doc_id % {ref_mod} = 0 AND text IS NOT NULL),
uni0 AS (
  SELECT w, count(*) AS c FROM (SELECT unnest(t) AS w FROM tokr) GROUP BY 1),
vocab AS (SELECT w, c FROM uni0 ORDER BY c DESC, w ASC LIMIT {vocab_size}),
uni AS (
  SELECT w, c FROM vocab
  UNION ALL
  SELECT '<unk>' AS w, coalesce(sum(c), 0) AS c FROM uni0
  WHERE w NOT IN (SELECT w FROM vocab)),
nv AS (SELECT count(*) AS v FROM uni),
bp AS (
  SELECT unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2
  FROM tokr WHERE len(t) >= 2),
bpm AS (
  SELECT coalesce(v1.w, '<unk>') AS w1, coalesce(v2.w, '<unk>') AS w2
  FROM bp LEFT JOIN vocab v1 ON bp.w1 = v1.w
          LEFT JOIN vocab v2 ON bp.w2 = v2.w),
big AS (SELECT w1, w2, count(*) AS c FROM bpm GROUP BY 1, 2),
tokd AS (
  SELECT doc_id, {tok} AS t FROM documents WHERE text IS NOT NULL),
pd AS (
  SELECT doc_id, unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2
  FROM tokd WHERE len(t) >= 2),
pm AS (
  SELECT doc_id, coalesce(v1.w, '<unk>') AS w1, coalesce(v2.w, '<unk>') AS w2
  FROM pd LEFT JOIN vocab v1 ON pd.w1 = v1.w
          LEFT JOIN vocab v2 ON pd.w2 = v2.w),
sc AS (
  SELECT doc_id,
         ln((coalesce(b.c, 0) + {alpha!r})
            / (coalesce(u.c, 0) + {alpha!r} * (SELECT v FROM nv))) AS lp
  FROM pm LEFT JOIN big b ON pm.w1 = b.w1 AND pm.w2 = b.w2
          LEFT JOIN uni u ON pm.w1 = u.w)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(lp), 6) AS mean_logp, round(exp(-avg(lp)), 4) AS ppl
FROM sc GROUP BY 1
"""


def canonical_url_query() -> QueryFn:
    """URL canonicalization over a deliberately messy synthetic URL (upper
    case, default port, tracker params, unsorted params, trailing slash,
    fragment); the oracle derives the expected canonical form
    INDEPENDENTLY from the base columns, so every normalization step is
    checked, not just reproduced."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.strings import (
            canonical_url,
        )

        messy = (
            "concat('HTTPS://', coalesce(event_type, 'none'),"
            " '.Example.COM:443/u/', cast(coalesce(user_id, -1) as string),"
            " '/?utm_source=x&b=', cast(coalesce(event_id, -9) % 5 as string),"
            " '&a=1#frag')"
        )
        return (
            load(spark, sf_dir, "events")
            .withColumn("url", F.expr(messy))
            .select("event_id", canonical_url(F.col("url")).alias("curl"))
        )

    return fn


def canonical_url_sql() -> str:
    return """
SELECT event_id,
       'https://' || lower(coalesce(event_type, 'none')) || '.example.com/u/'
       || CAST(coalesce(user_id, -1) AS VARCHAR)
       || '?a=1&b=' || CAST(coalesce(event_id, -9) % 5 AS VARCHAR) AS curl
FROM events
"""


# --------------------------------------------------------------------------------
# Incremental mergeable Pearson (plans/incremental.py) — shard states merged
# driver-side must reproduce the whole-frame correlation matrix an independent
# engine computes in one pass (the r8 addition closing the one profile section
# the incremental mode lacked; the reference computes correlations per-snapshot
# only, model/correlations.py:102-137)
# --------------------------------------------------------------------------------


def incremental_pearson_query(
    n_shards: int = 3,
    cols: tuple = ("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
) -> QueryFn:
    """Split lineitem into ``n_shards`` disjoint shards, profile each with
    ``correlations=True`` (six co-moment sums per pair riding the moment
    pass), merge the states, finalize to the Pearson matrix. Exactness is
    the whole point: the oracle computes ``corr`` over the UNSHARDED frame,
    so a hash-match proves the Chan/Pébay pairwise merge is exact — not
    approximately right — across an arbitrary split."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.drift import (
            round_half_up,
        )
        from pandas_profiling_personal_spark.plans.incremental import (
            merge_partials,
            partial_profile,
            pearson_of,
        )

        li = load(spark, sf_dir, "lineitem").select(*cols)
        key = F.col("l_extendedprice").cast("long") % n_shards
        parts = [
            partial_profile(li.where(key == i), correlations=True)
            for i in range(n_shards)
        ]
        mat = pearson_of(merge_partials(parts))
        rows = [
            (a, b, round_half_up(v, 6) if v is not None else None)
            for (a, b), v in sorted(mat.items())
        ]
        return spark.createDataFrame(
            rows, "col_a string, col_b string, corr double"
        )

    return fn


def incremental_pearson_sql(
    n_shards: int = 3,
    cols: tuple = ("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
) -> str:
    from itertools import combinations

    pairs = sorted(combinations(cols, 2))
    selects = [
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"round(corr({a}, {b}), 6) AS corr FROM lineitem"
        for a, b in pairs
    ]
    return "\nUNION ALL ".join(selects)


def incremental_cramers_v_query(n_shards: int = 3) -> QueryFn:
    """Mergeable categorical association (VERDICT r8 #3): split lineitem
    into ``n_shards`` disjoint shards, carry a bounded contingency state
    per shard (one melt shuffle each), vector-add-merge, finalize with the
    batch chi²/bias-correction arithmetic. The oracle computes Cramér's V
    over the UNSHARDED frame, so a hash-match proves the integer-cell
    merge is exact across an arbitrary split — the categorical twin of
    ``incremental_pearson``. The pair is DERIVED (quantity decile ×
    quantity mod 7, V ≈ 0.21 at sf0.01) because the synthetic tables'
    string columns are mutually independent — a clamped-to-zero V would
    gate the merge but not the chi² arithmetic."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.drift import (
            round_half_up,
        )
        from pandas_profiling_personal_spark.plans.incremental import (
            cramers_v_of,
            merge_partials,
            partial_profile,
        )

        li = load(spark, sf_dir, "lineitem").select(
            "l_extendedprice",
            F.floor(F.col("l_quantity") / 10)
            .cast("string")
            .alias("q_decile"),
            F.pmod(F.col("l_quantity").cast("long"), F.lit(7))
            .cast("string")
            .alias("q_mod7"),
        )
        key = F.col("l_extendedprice").cast("long") % n_shards
        parts = [
            partial_profile(
                li.where(key == i).select("q_decile", "q_mod7"),
                top_m=0,
                categorical_pairs=[("q_decile", "q_mod7")],
            )
            for i in range(n_shards)
        ]
        res = cramers_v_of(merge_partials(parts))[("q_decile", "q_mod7")]
        v = res["v"]
        rows = [
            (
                "q_decile",
                "q_mod7",
                round_half_up(v, 4) if v is not None else None,
                res["n"],
                res["exact"],
            )
        ]
        return spark.createDataFrame(
            rows,
            "col_a string, col_b string, cramers_v double, "
            "n_rows long, exact boolean",
        )

    return fn


def incremental_cramers_v_sql() -> str:
    # the cell labels never enter the chi² formula, so the oracle groups the
    # raw derived expressions — no cross-engine string-formatting hazard
    col_a = "floor(l_quantity / 10)"
    col_b = "CAST(l_quantity AS BIGINT) % 7"
    return f"""
WITH ct AS (SELECT {col_a} AS a, {col_b} AS b, count(*) AS n FROM lineitem
            WHERE {col_a} IS NOT NULL AND {col_b} IS NOT NULL GROUP BY 1, 2),
cells AS (SELECT n, sum(n) OVER (PARTITION BY a) AS ra,
                 sum(n) OVER (PARTITION BY b) AS cb FROM ct),
agg AS (SELECT sum(n) AS N, sum(n * n / (ra * cb)) AS s FROM cells),
rk AS (SELECT count(DISTINCT a) AS r, count(DISTINCT b) AS k FROM ct)
SELECT 'q_decile' AS col_a, 'q_mod7' AS col_b,
       round(sqrt(
         greatest((N * s - N) / N - (k - 1) * (r - 1) / (N - 1), 0.0)
         / least(k - (k - 1) * (k - 1) / (N - 1) - 1,
                 r - (r - 1) * (r - 1) / (N - 1) - 1)), 4) AS cramers_v,
       N::BIGINT AS n_rows, TRUE AS exact
FROM agg, rk
"""


def incremental_target_relevance_query(
    n_shards: int = 3,
    target: str = "l_extendedprice",
    num_feats: tuple = ("l_quantity", "l_discount", "l_tax"),
    cat_feats: tuple = ("l_returnflag", "l_linestatus"),
) -> QueryFn:
    """State-mode target relevance (VERDICT r11 #5): split lineitem into
    ``n_shards`` disjoint shards, profile each with the mergeable kernels
    the ranking needs — Pearson pair states riding the moment pass plus
    the NEW per-category [n, Σy, Σy²] group-moment melt — merge, finalize
    with ``target_relevance_of`` (plans/incremental.py): ZERO rescans of
    any shard. The oracle computes the batch ranking (|Pearson| + η²)
    over the UNSHARDED frame, so a hash-match proves the merged ranking
    equals the batch ``target_relevance`` across an arbitrary split —
    completing the batch/state matrix the other correlation families have
    (reference has no target analysis at all; successors' interactions.
    targets is batch-only)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.plans.incremental import (
            merge_partials,
            partial_profile,
            target_relevance_of,
        )

        li = load(spark, sf_dir, "lineitem").select(
            target, *num_feats, *cat_feats
        )
        key = F.col(target).cast("long") % n_shards
        parts = [
            partial_profile(
                li.where(key == i),
                top_m=0,
                correlations=True,
                group_pairs=[(c, target) for c in cat_feats],
            )
            for i in range(n_shards)
        ]
        rows = target_relevance_of(
            merge_partials(parts), target,
            numeric_cols=list(num_feats),
            categorical_cols=list(cat_feats),
        )
        return spark.createDataFrame(
            [(r["feature"], r["method"], r["score"]) for r in rows],
            "feature string, method string, score double",
        )

    return fn


def incremental_target_relevance_sql(
    target: str = "l_extendedprice",
    num_feats: tuple = ("l_quantity", "l_discount", "l_tax"),
    cat_feats: tuple = ("l_returnflag", "l_linestatus"),
) -> str:
    # the state ranking must equal the BATCH ranking on the union frame —
    # same oracle as target_relevance_lineitem by construction
    from pandas_profiling_personal_spark.parity import target_relevance_sql

    return target_relevance_sql(
        "lineitem", target, num_feats, cat_feats
    )


# --------------------------------------------------------------------------------
# Audio perceptual near-dup (operators/multimodal.py audio_near_duplicates) —
# fake tier vs an all-pairs SQL Hamming rebuild, the image_near_dup pattern: a
# driver match proves the banded pair join (auto-sized geometry included)
# drops nothing vs the quadratic reference computation
# --------------------------------------------------------------------------------


def audio_near_dup_query(dup_stride: int = 5, id_shift: int = 100_000) -> QueryFn:
    """Audio near-dup through the FULL distributed path: Arrow-batched
    signature decode -> banded Hamming pair join. Every ``dup_stride``-th
    document re-added under a shifted id plants a known pair set; the fake
    tier's 60-bit md5-prefix signatures are engine-reproducible, and the
    oracle computes ALL-PAIRS Hamming directly. key_blocks is left at the
    auto-sizing default on purpose — the driver row certifies the geometry
    the operator actually picks at this corpus size."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.multimodal import (
            audio_near_duplicates,
        )

        base = (
            load(spark, sf_dir, "documents")
            .where(F.col("text").isNotNull())
            .select("doc_id", "text")
        )
        planted = base.where(F.col("doc_id") % dup_stride == 0).select(
            (F.col("doc_id") + id_shift).alias("doc_id"), "text"
        )
        df = base.unionAll(planted).select(
            "doc_id", F.col("text").cast("binary").alias("blob")
        )
        pairs = audio_near_duplicates(
            df, "blob", "doc_id", decoder="fake", max_hamming=8
        )
        return pairs.select(
            "doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming")
        )

    return fn


def audio_near_dup_sql(dup_stride: int = 5, id_shift: int = 100_000) -> str:
    return f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT doc_id + {id_shift} AS doc_id, text FROM documents
  WHERE text IS NOT NULL AND doc_id % {dup_stride} = 0),
sig AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(text), 1, 15)) AS UBIGINT)::BIGINT AS s
  FROM docs)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= 8
"""


# --------------------------------------------------------------------------------
# Video near-dup (operators/multimodal.py video_near_duplicates) — frame-voting
# over the sample_frames plumbing, fake tier vs an all-pairs-per-index SQL
# rebuild of the SAME vote: the codec is stubbed (libav absent) but the
# distributed shape — frame explode, one banded pair join, the majority vote —
# is real and driver-checked
# --------------------------------------------------------------------------------


def video_near_dup_query(
    dup_stride: int = 5,
    id_shift: int = 100_000,
    n_frames: int = 4,
    max_hamming: int = 8,
) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.multimodal import (
            video_near_duplicates,
        )

        base = (
            load(spark, sf_dir, "documents")
            .where(F.col("text").isNotNull())
            .select("doc_id", "text")
        )
        planted = base.where(F.col("doc_id") % dup_stride == 0).select(
            (F.col("doc_id") + id_shift).alias("doc_id"), "text"
        )
        df = base.unionAll(planted).select(
            "doc_id", F.col("text").cast("binary").alias("blob")
        )
        pairs = video_near_duplicates(
            df, "blob", "doc_id",
            n_frames=n_frames, decoder="fake", max_hamming=max_hamming,
        )
        return pairs.select(
            "doc_a", "doc_b",
            F.col("n_matching_frames").cast("long").alias("n_matching_frames"),
        )

    return fn


def video_near_dup_sql(
    dup_stride: int = 5,
    id_shift: int = 100_000,
    n_frames: int = 4,
    max_hamming: int = 8,
) -> str:
    # fake frame hash = md5(video_bytes + frame_index as 4 big-endian bytes);
    # DuckDB varchars carry NULs, so chr(0)x3 || chr(i) rebuilds the suffix
    frame_selects = "\nUNION ALL ".join(
        f"SELECT doc_id, {i} AS idx, "
        "CAST(('0x' || substring(md5(text || chr(0)||chr(0)||chr(0)||"
        f"chr({i})), 1, 15)) AS UBIGINT)::BIGINT AS sig FROM docs"
        for i in range(n_frames)
    )
    vote = n_frames // 2 + 1
    return f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT doc_id + {id_shift} AS doc_id, text FROM documents
  WHERE text IS NOT NULL AND doc_id % {dup_stride} = 0),
frames AS ({frame_selects}),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM frames a JOIN frames b
    ON a.idx = b.idx AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming})
SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_matching_frames
FROM pairs GROUP BY doc_a, doc_b
HAVING count(*) >= {vote}
"""


# --------------------------------------------------------------------------------
# Incremental drift (plans/incremental.py drift_between_partials) — PSI computed
# driver-side from two shard STATES (mergeable histograms) must equal the PSI an
# independent engine computes from the raw frames with the same edges: the
# oracle IS parity.drift_sql, proving state-vs-state drift == frame-vs-frame
# --------------------------------------------------------------------------------


def incremental_drift_query(
    cols: tuple = ("l_quantity", "l_extendedprice", "l_discount"),
    bins: int = 10,
    n_shards: int = 2,
) -> QueryFn:
    """Baseline = full lineitem, candidate = the l_quantity > 10 slice (the
    drift_psi_lineitem fixture) — but the Spark side never runs a drift
    scan: each side is profiled into mergeable states (the baseline in
    ``n_shards`` shards, merged) with shared histogram edges from the union
    min/max, and PSI comes from ``drift_between_partials``'s driver
    arithmetic over those states. The oracle recomputes from the raw rows,
    so a hash-match proves state drift == frame drift exactly."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.plans.incremental import (
            drift_between_partials,
            merge_partials,
            partial_profile,
        )

        li = load(spark, sf_dir, "lineitem").select(*cols)
        df_b = li.where(F.col("l_quantity") > 10)
        row = li.agg(
            *[F.min(F.col(c).cast("double")).alias(f"lo_{i}")
              for i, c in enumerate(cols)],
            *[F.max(F.col(c).cast("double")).alias(f"hi_{i}")
              for i, c in enumerate(cols)],
        ).collect()[0]
        # union min/max == baseline's (the candidate is a subset)
        specs = {
            c: (bins, float(row[f"lo_{i}"]), float(row[f"hi_{i}"]))
            for i, c in enumerate(cols)
        }
        key = F.col("l_extendedprice").cast("long") % n_shards
        pa = merge_partials([
            partial_profile(li.where(key == i), histograms=specs)
            for i in range(n_shards)
        ])
        pb = partial_profile(df_b, histograms=specs)
        drift = drift_between_partials(pa, pb)
        rows = [
            (c, d["n_a"], d["n_b"], d["psi"], d["max_shift_bucket"])
            for c, d in sorted(drift.items())
        ]
        return spark.createDataFrame(
            rows,
            "column string, n_a long, n_b long, psi double, "
            "max_shift_bucket long",
        )

    return fn


def incremental_embedding_drift_query(
    dim: int = 64, scale: float = 1.05, shift: float = 0.1, modulo: int = 3
) -> QueryFn:
    """Embedding drift from mergeable STATES (plans/incremental.py): the
    embedding_drift_embeddings fixture, but the Spark side never runs the
    batch operator — snapshot A is profiled in two shards and merged,
    snapshot B whole, over shared norm edges (the union extent, what the
    batch derives), and the drift row comes from
    ``embedding_drift_between``'s driver arithmetic. The oracle is the
    batch operator's own SQL rebuild, so a hash-match proves state drift ==
    frame drift for embeddings too."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.plans.incremental import (
            embedding_drift_between,
            embedding_norm_extent,
            embedding_partial,
            merge_embedding_states,
        )

        emb = load(spark, sf_dir, "embeddings")
        df_b = emb.where(F.col("vec_id") % modulo != 0).select(
            F.transform(
                "embedding",
                lambda x: x.cast("double") * scale + shift,
            ).alias("embedding")
        )
        ea = embedding_norm_extent(emb, "embedding", dim)
        eb = embedding_norm_extent(df_b, "embedding", dim)
        edges = (min(ea[0], eb[0]), max(ea[1], eb[1]))
        pa = merge_embedding_states([
            embedding_partial(
                emb.where(F.col("vec_id") % 2 == i), "embedding", dim, edges
            )
            for i in range(2)
        ])
        pb = embedding_partial(df_b, "embedding", dim, edges)
        d = embedding_drift_between(pa, pb)
        return spark.createDataFrame(
            [tuple(d[k] for k in (
                "n_a", "n_b", "norm_psi", "max_shift_bucket",
                "centroid_cosine", "mean_shift_l2", "max_shift_dim",
                "max_mean_shift",
            ))],
            "n_a long, n_b long, norm_psi double, max_shift_bucket long, "
            "centroid_cosine double, mean_shift_l2 double, "
            "max_shift_dim long, max_mean_shift double",
        )

    return fn


def incremental_image_dedup_query(
    cutoff: int = 250, dup_stride: int = 5, id_shift: int = 100_000
) -> QueryFn:
    """Daily-incremental image dedup (fake tier), full store round trip:
    shard 1 (doc_id < cutoff) sweeps against an empty store, its signatures
    become the store, shard 2 (the rest + every ``dup_stride``-th doc
    re-planted under a shifted id) sweeps against it. The oracle computes
    the union rule directly — dropped iff ANY lower-id partner within the
    Hamming radius — so a driver match proves two-step == batch-on-union
    for the Hamming store tier."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pandas_profiling_personal_spark.operators.multimodal import (
            incremental_image_dedup,
        )

        base = (
            load(spark, sf_dir, "documents")
            .where(F.col("text").isNotNull())
            .select("doc_id", F.col("text").cast("binary").alias("blob"))
        )
        planted = base.where(F.col("doc_id") % dup_stride == 0).select(
            (F.col("doc_id") + id_shift).alias("doc_id"), "blob"
        )
        hist = base.where(F.col("doc_id") < cutoff)
        new = base.where(F.col("doc_id") >= cutoff).unionAll(planted)
        kw = dict(decoder="fake", max_hamming=8)
        first = incremental_image_dedup(hist, None, "blob", "doc_id", **kw)
        store = first.select("doc_id", "signature")
        out = incremental_image_dedup(new, store, "blob", "doc_id", **kw)
        return out.select(
            "doc_id", "signature", "keep", "dup_of"
        )

    return fn


def incremental_image_dedup_sql(
    cutoff: int = 250, dup_stride: int = 5, id_shift: int = 100_000
) -> str:
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(text), 1, 15)) AS UBIGINT)::BIGINT
           AS signature
  FROM documents WHERE text IS NOT NULL),
docs AS (
  SELECT * FROM base
  UNION ALL
  SELECT doc_id + {id_shift} AS doc_id, signature FROM base
  WHERE doc_id % {dup_stride} = 0),
new AS (SELECT * FROM docs WHERE doc_id >= {cutoff}),
nd AS (
  SELECT n.doc_id, min(p.doc_id) AS dup_of
  FROM new n JOIN docs p
    ON p.doc_id < n.doc_id
   AND bit_count(xor(p.signature, n.signature)) <= 8
  GROUP BY n.doc_id)
SELECT n.doc_id, n.signature, (d.dup_of IS NULL) AS keep, d.dup_of
FROM new n LEFT JOIN nd d ON n.doc_id = d.doc_id
"""
