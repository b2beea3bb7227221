"""Batch-31 queries (round 3): hybrid lexical+vector retrieval with RRF
fusion, asymmetric n-gram containment dedup, and a word-rarity quality
signal — three training-data-pipeline capabilities over the documents /
embeddings fixtures, each fully DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.cache import persist_tracked
from kenshin_backup_spark.operators.dedup import with_shingles
from kenshin_backup_spark.operators.similarity import qdot, quantize_vec
from kenshin_backup_spark.sources import load_table

_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"

_GRAMS_CTE = f"""
norm AS (
  SELECT doc_id, str_split({_NORM.format(x="text")}, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(w) - 2, 0)),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
  FROM norm WHERE len(w) >= 3
)"""


# --- hybrid search: lexical overlap + vector cosine, RRF fusion -------------

_RRF_K = 60
_HYBRID_TOPK = 10
_N_QUERIES = 10


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval, the production RAG/dedup-triage shape: for each
    query document (doc_id < 10), candidates are documents sharing ≥1 word
    3-gram (posting-list equi-join — the corpus never self-joins or cross
    joins); each candidate gets a LEXICAL rank (shingle-overlap count) and
    a VECTOR rank (exact quantized cosine via the 1:1 vec_id↔doc_id
    embeddings), fused by reciprocal-rank fusion
    ``1/(60+r_lex) + 1/(60+r_vec)``; top-10 per query.

    Every score is integer-derived (overlap counts, quantized cosine) and
    RRF is a two-term IEEE division sum — deterministic in any engine, so
    the whole fused ranking is oracle-checkable.

    At 100 TB: the query side is bounded (broadcast); the posting join
    shuffles the corpus once on the gram key (hash the gram to 8 bytes at
    scale — same lever as ``ngram_jaccard_pairs``); the vector join is a
    broadcast of query vectors against candidate ids only.
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    shingled = (
        with_shingles(docs.select(F.col("doc_id").alias("id"), "text"), n=3)
        .select("id", "sh")
        .transform(persist_tracked)
    )
    posting = shingled.select("id", F.explode("sh").alias("g"))
    qsh = (
        shingled.where(F.col("id") < _N_QUERIES)
        .select(F.col("id").alias("qid"), F.explode("sh").alias("g"))
    )
    overlap = (
        qsh.join(posting, "g")
        .where(F.col("qid") != F.col("id"))
        .groupBy("qid", "id")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )

    # Zero-norm guard (both engines): a zero-quantized vector gives cosine
    # NaN, which Spark ranks largest in a descending window while DuckDB
    # does not — exclude such vectors before the ranking windows.
    qv = (
        emb.where(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("qid"), quantize_vec("embedding").alias("qvec"))
        .withColumn("qn", qdot(F.col("qvec"), F.col("qvec")))
        .where(F.col("qn") > 0)
    )
    cv = (
        emb.select(F.col("vec_id").alias("id"), quantize_vec("embedding").alias("cvec"))
        .withColumn("cn", qdot(F.col("cvec"), F.col("cvec")))
        .where(F.col("cn") > 0)
    )
    scored = (
        overlap.join(F.broadcast(qv), "qid")
        .join(cv, "id")
        .select(
            "qid",
            "id",
            "overlap",
            (
                qdot(F.col("qvec"), F.col("cvec"))
                / F.sqrt(F.col("qn").cast("double") * F.col("cn").cast("double"))
            ).cast("double").alias("cosine"),
        )
    )
    w_lex = W.partitionBy("qid").orderBy(F.desc("overlap"), F.asc("id"))
    w_vec = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("id"))
    ranked = scored.withColumn("r_lex", F.row_number().over(w_lex)).withColumn(
        "r_vec", F.row_number().over(w_vec)
    )
    rrf = (
        1.0 / (F.lit(_RRF_K) + F.col("r_lex"))
        + 1.0 / (F.lit(_RRF_K) + F.col("r_vec"))
    ).cast("double")
    w_fused = W.partitionBy("qid").orderBy(F.desc("rrf"), F.asc("id"))
    return (
        ranked.withColumn("rrf", rrf)
        .withColumn("fused_rank", F.row_number().over(w_fused).cast("long"))
        .where(F.col("fused_rank") <= _HYBRID_TOPK)
        .select(
            F.col("qid").cast("long").alias("query_id"),
            F.col("id").cast("long").alias("doc_id"),
            F.col("overlap").cast("long").alias("overlap"),
            "cosine",
            "rrf",
            "fused_rank",
        )
    )


_HYBRID_SQL = f"""
WITH {_GRAMS_CTE},
posting AS (SELECT doc_id AS id, UNNEST(sh) AS g FROM grams),
qsh AS (SELECT doc_id AS qid, UNNEST(sh) AS g FROM grams WHERE doc_id < {_N_QUERIES}),
overlap AS (
  SELECT q.qid, p.id, COUNT(*) AS overlap
  FROM qsh q JOIN posting p ON q.g = p.g AND q.qid != p.id
  GROUP BY 1, 2
),
vecs0 AS (
  SELECT vec_id AS id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
  FROM embeddings
),
-- zero-norm guard (mirrors the Spark side): NaN cosines rank differently
vecs AS (SELECT id, v FROM vecs0 WHERE list_dot_product(v, v) > 0),
n AS (SELECT id, list_dot_product(v, v) AS n2 FROM vecs),
scored AS (
  SELECT o.qid, o.id, o.overlap,
         CAST(list_dot_product(vq.v, vc.v)
              / sqrt(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE))
              AS DOUBLE) AS cosine
  FROM overlap o
  JOIN vecs vq ON vq.id = o.qid
  JOIN vecs vc ON vc.id = o.id
  JOIN n nq ON nq.id = o.qid
  JOIN n nc ON nc.id = o.id
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY overlap DESC, id ASC) AS r_lex,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, id ASC) AS r_vec
  FROM scored
),
fused AS (
  SELECT qid, id, overlap, cosine,
         CAST(1.0 / ({_RRF_K} + r_lex) + 1.0 / ({_RRF_K} + r_vec) AS DOUBLE) AS rrf
  FROM ranked
)
SELECT qid AS query_id, id AS doc_id, overlap, cosine, rrf,
       CAST(fused_rank AS BIGINT) AS fused_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf DESC, id ASC) AS fused_rank
  FROM fused
) t WHERE fused_rank <= {_HYBRID_TOPK}
"""


# --- asymmetric containment dedup -------------------------------------------

_CONTAIN_T = 0.6


def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup: containment ``C(a→b) = |A∩B| / |A|`` catches a
    document SUBSUMED by another (quotes, boilerplate-wrapped copies) that
    symmetric Jaccard misses when sizes differ a lot. Same posting-list
    equi-join as the Jaccard dedup; pairs kept when either direction's
    containment ≥ 0.6. Output reports both directions.
    """
    docs = load_table(spark, sf_dir, "documents")
    shingled = (
        with_shingles(docs.select(F.col("doc_id").alias("id"), "text"), n=3)
        .select("id", "sh")
        .transform(persist_tracked)
    )
    posting = shingled.select("id", F.explode("sh").alias("g"))
    a = posting.alias("a")
    b = posting.alias("b")
    common = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sizes = shingled.select("id", F.size("sh").alias("sz"))
    out = (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("size_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("size_b")), "id_b")
        .select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
            F.col("common").cast("long").alias("common"),
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
            (F.col("common") / F.col("size_a")).cast("double").alias("contain_a_in_b"),
            (F.col("common") / F.col("size_b")).cast("double").alias("contain_b_in_a"),
        )
    )
    return out.where(
        (F.col("contain_a_in_b") >= _CONTAIN_T)
        | (F.col("contain_b_in_a") >= _CONTAIN_T)
    )


_CONTAIN_SQL = f"""
WITH {_GRAMS_CTE},
posting AS (SELECT doc_id, UNNEST(sh) AS g FROM grams),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
  FROM posting a JOIN posting b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, len(sh) AS sz FROM grams)
SELECT c.id_a, c.id_b, c.common,
       CAST(sa.sz AS BIGINT) AS size_a,
       CAST(sb.sz AS BIGINT) AS size_b,
       CAST(c.common AS DOUBLE) / sa.sz AS contain_a_in_b,
       CAST(c.common AS DOUBLE) / sb.sz AS contain_b_in_a
FROM common c
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
WHERE CAST(c.common AS DOUBLE) / sa.sz >= {_CONTAIN_T}
   OR CAST(c.common AS DOUBLE) / sb.sz >= {_CONTAIN_T}
"""


# --- word-rarity quality signal ---------------------------------------------

def text_word_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document word-rarity signal: mean corpus document-frequency of
    the doc's DISTINCT words. Boilerplate-heavy docs (every word appears
    everywhere) score high; information-dense docs score low — an
    integer-exact quality feature that needs no language model. Two
    corpus passes: df table (word → doc count), then a doc×word join
    aggregated back per doc. All counts integer; the mean is one exact
    division.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.col("doc_id"),
            F.explode(
                F.array_distinct(
                    F.split(
                        F.trim(
                            F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
                        ),
                        " ",
                    )
                )
            ).alias("w"),
        )
        .where(F.length("w") > 0)
        .transform(persist_tracked)
    )
    df_tab = words.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    return (
        words.join(df_tab, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_words"),
            F.sum("df").cast("long").alias("sum_df"),
        )
        .select(
            "doc_id",
            "n_distinct_words",
            "sum_df",
            (F.col("sum_df") / F.col("n_distinct_words"))
            .cast("double")
            .alias("mean_df"),
        )
    )


_RARITY_SQL = f"""
WITH norm AS (
  SELECT doc_id, str_split({_NORM.format(x="text")}, ' ') AS w FROM documents
),
words AS (
  SELECT doc_id, UNNEST(list_distinct(w)) AS word FROM norm
),
words2 AS (SELECT doc_id, word FROM words WHERE len(word) > 0),
dftab AS (SELECT word, COUNT(*) AS df FROM words2 GROUP BY 1)
SELECT w.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
       CAST(SUM(d.df) AS BIGINT) AS sum_df,
       CAST(SUM(d.df) AS DOUBLE) / COUNT(*) AS mean_df
FROM words2 w JOIN dftab d ON d.word = w.word
GROUP BY 1
"""


# --- CUSUM changepoint detection --------------------------------------------

_CUSUM_H = 3_000_000  # threshold in quantized (1e6) value units


def tsdb_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM changepoint statistic per metric: the classic
    recursion ``s_k = max(0, s_{k-1} + (x_k − target))`` is not directly
    window-expressible, but reduces EXACTLY to ``S_k − min_{j≤k} S_j``
    where S is the prefix sum of the deviations — two stacked window
    functions, no recursion, no UDF. Deviations are integer-quantized
    (1e6) against the per-metric integer mean, so the statistic is exact
    in both engines; rows breaching the threshold flag a level shift.

    At 100 TB: two window passes partitioned by metric — the standard
    sessionize/anomaly shuffle shape; no driver loops.
    """
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    vq = F.floor(F.col("value") * 1_000_000).cast("long")
    base = ev.select(
        F.col("event_type").alias("metric"),
        es.alias("es"),
        F.col("event_id"),
        vq.alias("vq"),
    )
    w_all = W.partitionBy("metric")
    # integer target: floor of the per-metric mean of quantized values
    base = base.withColumn(
        "target_q", F.floor(F.sum("vq").over(w_all) / F.count("vq").over(w_all)).cast("long")
    )
    w_ord = W.partitionBy("metric").orderBy("es", "event_id")
    run = base.withColumn(
        "s", F.sum(F.col("vq") - F.col("target_q")).over(w_ord)
    )
    cusum = run.withColumn("smin", F.min(F.least(F.col("s"), F.lit(0))).over(w_ord))
    return cusum.select(
        "metric",
        "es",
        "event_id",
        (F.col("s") - F.col("smin")).alias("cusum_q"),
        ((F.col("s") - F.col("smin")) > _CUSUM_H).cast("long").alias("breach"),
    )


_CUSUM_SQL = """
WITH e AS (
  SELECT event_type AS metric,
         CAST(epoch_ms(CAST(ts AS TIMESTAMP)) // 1000 AS BIGINT) AS es,
         event_id,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS vq
  FROM events
),
t AS (
  SELECT *, CAST(FLOOR(SUM(vq) OVER (PARTITION BY metric)
                       / CAST(COUNT(vq) OVER (PARTITION BY metric) AS DOUBLE))
                 AS BIGINT) AS target_q
  FROM e
),
run AS (
  SELECT *, SUM(vq - target_q) OVER (
              PARTITION BY metric ORDER BY es, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM t
),
c AS (
  SELECT *, MIN(LEAST(s, 0)) OVER (
              PARTITION BY metric ORDER BY es, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS smin
  FROM run
)
SELECT metric, es, event_id, CAST(s - smin AS BIGINT) AS cusum_q,
       CAST(s - smin > {h} AS BIGINT) AS breach
FROM c
""".format(h=_CUSUM_H)


QUERIES = {
    "hybrid_search_rrf": hybrid_search_rrf,
    "dedup_ngram_containment": dedup_ngram_containment,
    "text_word_rarity": text_word_rarity,
    "tsdb_changepoint_cusum": tsdb_changepoint_cusum,
}

ORACLE = {
    "hybrid_search_rrf": _HYBRID_SQL,
    "dedup_ngram_containment": _CONTAIN_SQL,
    "text_word_rarity": _RARITY_SQL,
    "tsdb_changepoint_cusum": _CUSUM_SQL,
}
