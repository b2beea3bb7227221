"""LLM-data-pipeline queries (SURVEY.md §2.9 X1–X5): dedup, similarity
search, text analysis, multimodal columns — over ``documents`` and
``embeddings``.

Approximate operators (MinHash LSH, BRP LSH) have no ORACLE entry → the
driver records rows-only checks; each has an exact oracle-checked twin
(n-gram Jaccard, brute-force cosine) verifying the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.operators import textops
from kenshin_backup_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dupes,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from kenshin_backup_spark.operators.similarity import (
    brp_lsh_topk,
    cosine_topk,
    knn_label_vote,
)
from kenshin_backup_spark.sources import load_table

#: DuckDB mirror of operators.dedup.normalize_text (note the 'g' flag).
_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"


# --- X1: exact dedup ---------------------------------------------------------

def dedup_exact_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs).select(
        "fp", F.col("keep_id").cast("long").alias("keep_id"),
        F.col("n_copies").cast("long").alias("n_copies"),
    )


_EXACT_SQL = f"""
SELECT md5({_NORM.format(x="text")}) AS fp,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_copies
FROM documents
WHERE text IS NOT NULL AND {_NORM.format(x="text")} <> ''
GROUP BY 1
"""


# --- X2: near-dup (exact n-gram Jaccard; LSH twin is rows-only) -------------

def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.2)
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("common").cast("long").alias("common"),
        F.col("size_a").cast("long").alias("size_a"),
        F.col("size_b").cast("long").alias("size_b"),
        F.col("jaccard").cast("double").alias("jaccard"),
    )


_JACCARD_SQL = f"""
WITH norm AS (
  SELECT doc_id, str_split({_NORM.format(x="text")}, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(w) - 2, 0)),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
  FROM norm
),
sizes AS (SELECT doc_id, len(sh) AS sz FROM grams),
posting AS (SELECT doc_id, UNNEST(sh) AS g FROM grams),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
  FROM posting a JOIN posting b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b, c.common,
       sa.sz AS size_a, sb.sz AS size_b,
       CAST(c.common AS DOUBLE) / (sa.sz + sb.sz - c.common) AS jaccard
FROM common c
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
WHERE CAST(c.common AS DOUBLE) / (sa.sz + sb.sz - c.common) >= 0.2
"""


def dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale variant of the shingle-Jaccard join: document-frequency cap
    (df ≤ 10) removes stop-phrase shingles BEFORE the self-join — the
    Σ df² join volume drops its quadratic head. Jaccard is defined over
    the capped shingle universe, mirrored exactly in the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=10)
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("common").cast("long").alias("common"),
        F.col("size_a").cast("long").alias("size_a"),
        F.col("size_b").cast("long").alias("size_b"),
        F.col("jaccard").cast("double").alias("jaccard"),
    )


_JACCARD_CAPPED_SQL = f"""
WITH norm AS (
  SELECT doc_id, str_split({_NORM.format(x="text")}, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(w) - 2, 0)),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
  FROM norm
),
posting0 AS (SELECT doc_id, UNNEST(sh) AS g FROM grams),
keep AS (SELECT g FROM posting0 GROUP BY g HAVING COUNT(*) <= 10),
posting AS (SELECT doc_id, g FROM posting0 JOIN keep USING (g)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM posting GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
  FROM posting a JOIN posting b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b, c.common,
       sa.sz AS size_a, sb.sz AS size_b,
       CAST(c.common AS DOUBLE) / (sa.sz + sb.sz - c.common) AS jaccard
FROM common c
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
WHERE CAST(c.common AS DOUBLE) / (sa.sz + sb.sz - c.common) >= 0.2
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate MinHash-LSH near-dup join (rows-only check; exact twin:
    dedup_ngram_jaccard)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_dupes(docs, jaccard_threshold=0.2).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), "jaccard_est"
    )


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole banding (rows-only: xxhash64
    has no DuckDB twin)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_pairs(docs, max_hamming=8)


# --- X3: similarity search ---------------------------------------------------

def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for a bounded query set (vec_id<20)
    against all candidates — quantized-exact, hash-matches DuckDB."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return cosine_topk(queries, emb, k=5).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "cosine",
        "rank",
    )


_COSINE_TOPK_SQL = """
WITH qv AS (
  SELECT vec_id AS id,
         list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
  FROM embeddings
),
norms AS (
  -- zero-norm guard (mirrors cosine_topk): NaN cosines rank differently
  SELECT id, list_sum(list_transform(v, x -> x * x)) AS n2 FROM qv
  WHERE list_sum(list_transform(v, x -> x * x)) > 0
),
pairs AS (
  SELECT q.id AS query_id, c.id AS neighbor_id,
         list_sum(list_transform(generate_series(1, len(q.v)),
                                 i -> q.v[i] * c.v[i])) AS dot
  FROM qv q JOIN qv c ON q.id < 20 AND q.id != c.id
),
scored AS (
  SELECT p.query_id, p.neighbor_id,
         CAST(p.dot / sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)) AS DOUBLE) AS cosine
  FROM pairs p
  JOIN norms nq ON nq.id = p.query_id
  JOIN norms nc ON nc.id = p.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
           ) AS BIGINT) AS rank
  FROM scored
) t WHERE rank <= 5
"""


def emb_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label prediction: majority label of the exact top-5 neighbors
    (ties → smaller label), per query, with the true label for accuracy."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 100)
    topk = cosine_topk(queries, emb, k=5)
    pred = knn_label_vote(topk, emb)
    truth = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return pred.join(truth, "query_id").select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("predicted_label").cast("long").alias("predicted_label"),
        F.col("votes").cast("long").alias("votes"),
        F.col("true_label").cast("long").alias("true_label"),
    )


_KNN_SQL = """
WITH qv AS (
  SELECT vec_id AS id, label,
         list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
  FROM embeddings
),
norms AS (SELECT id, list_sum(list_transform(v, x -> x * x)) AS n2 FROM qv),
pairs AS (
  SELECT q.id AS query_id, c.id AS neighbor_id, c.label AS nb_label,
         list_sum(list_transform(generate_series(1, len(q.v)),
                                 i -> q.v[i] * c.v[i])) AS dot
  FROM qv q JOIN qv c ON q.id < 100 AND q.id != c.id
),
scored AS (
  SELECT p.query_id, p.neighbor_id, p.nb_label,
         CAST(p.dot / sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)) AS DOUBLE) AS cosine
  FROM pairs p
  JOIN norms nq ON nq.id = p.query_id
  JOIN norms nc ON nc.id = p.neighbor_id
),
topk AS (
  SELECT query_id, nb_label FROM (
    SELECT *, ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
    FROM scored) t
  WHERE rn <= 5
),
votes AS (
  SELECT query_id, nb_label, COUNT(*) AS votes
  FROM topk GROUP BY 1, 2
),
pred AS (
  SELECT query_id, nb_label AS predicted_label, votes FROM (
    SELECT *, ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY votes DESC, nb_label ASC) AS rn
    FROM votes) t
  WHERE rn = 1
)
SELECT p.query_id,
       CAST(p.predicted_label AS BIGINT) AS predicted_label,
       p.votes,
       CAST(e.label AS BIGINT) AS true_label
FROM pred p JOIN embeddings e ON e.vec_id = p.query_id
"""


def emb_ann_brp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN via bucketed random projections (rows-only check;
    exact twin: emb_cosine_topk)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return brp_lsh_topk(queries, emb, k=5).select(
        F.col("query_id").cast("long"),
        F.col("neighbor_id").cast("long"),
        "l2",
        "rank",
    )


# --- X5: text analysis -------------------------------------------------------

def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = textops.quality_features(docs)
    return feats.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        F.countDistinct("source").alias("n_sources"),
        (F.sum("n_chars_alnum") / F.sum("n_tokens")).cast("double").alias("chars_per_token"),
    )


_STATS_SQL = """
WITH f AS (
  SELECT lang, source, n_chars,
         len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens,
         length(regexp_replace(text, '[^A-Za-z0-9]+', '', 'g')) AS n_chars_alnum
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       COUNT(DISTINCT source) AS n_sources,
       CAST(SUM(n_chars_alnum) AS DOUBLE) / SUM(n_tokens) AS chars_per_token
FROM f GROUP BY lang
"""


def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = textops.quality_features(docs)
    return feats.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_tokens").alias("n_tokens"),
        F.col("n_chars_alnum").alias("n_chars_alnum"),
        "avg_word_len",
        "stop_ratio",
        textops.bpe_ish_token_count("text").alias("bpe_tokens"),
    )


_QUALITY_SQL = """
WITH f AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
         CAST(length(regexp_replace(text, '[^A-Za-z0-9]+', '', 'g')) AS BIGINT) AS n_chars_alnum,
         CAST(len(regexp_extract_all(lower(text),
              '\\b(the|and|of|to|a)\\b')) AS BIGINT) AS stop
  FROM documents
)
SELECT doc_id, n_tokens, n_chars_alnum,
       CASE WHEN n_tokens > 0
            THEN CAST(n_chars_alnum AS DOUBLE) / n_tokens END AS avg_word_len,
       CASE WHEN n_tokens > 0
            THEN CAST(stop AS DOUBLE) / n_tokens END AS stop_ratio,
       CAST(n_tokens + CAST(FLOOR((n_chars_alnum - n_tokens * 4) / 4.0) AS BIGINT)
            AS BIGINT) AS bpe_tokens
FROM f
"""


def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-id heuristic vs the labeled lang: marker
    scores per language, argmax with deterministic tie-break (score desc,
    lang asc), emitted per doc with a match flag."""
    docs = load_table(spark, sf_dir, "documents")
    langs = sorted(textops.LANG_MARKERS)
    scored = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        *[textops.lang_marker_score("text", L).alias(f"s_{L}") for L in langs],
    )
    best = F.greatest(*[F.col(f"s_{L}") for L in langs])
    pred = None
    for L in langs:
        cond = F.col(f"s_{L}") == best
        pred = F.when(cond, F.lit(L)) if pred is None else pred.when(cond, F.lit(L))
    return scored.select(
        "doc_id",
        "lang",
        *[F.col(f"s_{L}") for L in langs],
        pred.alias("predicted_lang"),
        (pred == F.col("lang")).cast("string").alias("is_match"),
    )


def _langid_sql() -> str:
    langs = sorted(textops.LANG_MARKERS)
    score_exprs = ",\n         ".join(
        "CAST(len(regexp_extract_all(lower(text), '\\b("
        + "|".join(textops.LANG_MARKERS[L])
        + ")\\b')) AS BIGINT) AS s_" + L
        for L in langs
    )
    greatest = "GREATEST(" + ", ".join(f"s_{L}" for L in langs) + ")"
    whens = "\n         ".join(
        f"WHEN s_{L} = {greatest} THEN '{L}'" for L in langs
    )
    cols = ", ".join(f"s_{L}" for L in langs)
    return f"""
WITH s AS (
  SELECT doc_id, lang,
         {score_exprs}
  FROM documents
)
SELECT doc_id, lang, {cols},
       CASE {whens} END AS predicted_lang,
       CAST((CASE {whens} END) = lang AS VARCHAR) AS is_match
FROM s
"""


def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return textops.doc_fingerprint(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "fp_md5",
        F.col("n_chars").cast("long").alias("n_chars"),
    )


_FP_SQL = f"""
SELECT doc_id, md5({_NORM.format(x="text")}) AS fp_md5, n_chars
FROM documents
"""


def llm_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone pipeline — the shape of a real training-data curation job,
    composed from the engine's operators into ONE Catalyst plan:

    1. exact dedup (md5 fingerprint, keep min doc_id),
    2. quality gate (token count ≥ 20, mean word length in [3, 8]),
    3. per-language token budget: top 30 surviving docs per lang by token
       count (ties → doc_id),
    4. curation report per language.
    """
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    from kenshin_backup_spark.operators.dedup import fingerprint
    from kenshin_backup_spark.operators.textops import token_count

    fp = docs.withColumn("fp", fingerprint("text"))
    w_fp = W.partitionBy("fp").orderBy("doc_id")
    deduped = fp.withColumn("rn", F.row_number().over(w_fp)).where(F.col("rn") == 1)

    alnum = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z0-9]+", "")).cast("long")
    qual = (
        deduped.withColumn("n_tokens", token_count("text"))
        .withColumn("awl", (alnum.cast("double") / F.col("n_tokens")))
        .where((F.col("n_tokens") >= 20) & F.col("awl").between(3.0, 8.0))
    )
    w_lang = W.partitionBy("lang").orderBy(F.desc("n_tokens"), F.asc("doc_id"))
    picked = qual.withColumn("pick", F.row_number().over(w_lang)).where(F.col("pick") <= 30)
    return picked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("budget_tokens"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
        F.countDistinct("source").alias("n_sources"),
    )


_CURATION_SQL = f"""
WITH fp AS (
  SELECT *, md5({_NORM.format(x="text")}) AS fp,
         ROW_NUMBER() OVER (PARTITION BY md5({_NORM.format(x="text")})
                            ORDER BY doc_id) AS rn
  FROM documents
),
deduped AS (SELECT * FROM fp WHERE rn = 1),
qual AS (
  SELECT *, len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens,
         CAST(length(regexp_replace(text, '[^A-Za-z0-9]+', '', 'g')) AS DOUBLE)
           / len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS awl
  FROM deduped
),
gated AS (
  SELECT * FROM qual
  WHERE n_tokens >= 20 AND awl BETWEEN 3.0 AND 8.0
),
picked AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                 ORDER BY n_tokens DESC, doc_id ASC) AS pick
    FROM gated) t
  WHERE pick <= 30
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS budget_tokens,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id,
       COUNT(DISTINCT source) AS n_sources
FROM picked GROUP BY lang
"""


QUERIES = {
    "llm_corpus_curation": llm_corpus_curation,
    "dedup_exact_fingerprint": dedup_exact_fingerprint,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_ngram_jaccard_capped": dedup_ngram_jaccard_capped,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash_pairs": dedup_simhash_pairs,
    "emb_cosine_topk": emb_cosine_topk,
    "emb_knn_label_vote": emb_knn_label_vote,
    "emb_ann_brp_lsh": emb_ann_brp_lsh,
    "text_stats_by_lang": text_stats_by_lang,
    "text_quality_scores": text_quality_scores,
    "text_langid_heuristic": text_langid_heuristic,
    "text_fingerprints": text_fingerprints,
}

ORACLE = {
    "llm_corpus_curation": _CURATION_SQL,
    "dedup_exact_fingerprint": _EXACT_SQL,
    "dedup_ngram_jaccard": _JACCARD_SQL,
    "dedup_ngram_jaccard_capped": _JACCARD_CAPPED_SQL,
    "emb_cosine_topk": _COSINE_TOPK_SQL,
    "emb_knn_label_vote": _KNN_SQL,
    "text_stats_by_lang": _STATS_SQL,
    "text_quality_scores": _QUALITY_SQL,
    "text_langid_heuristic": _langid_sql(),
    "text_fingerprints": _FP_SQL,
    # dedup_minhash_lsh, dedup_simhash_pairs, emb_ann_brp_lsh: approximate /
    # engine-specific hashes → rows-only checks by design.
}
