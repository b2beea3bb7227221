"""Batch-29 queries: corpus statistics (Heaps-law vocabulary growth, Zipf
top-word table), audience overlap between event types, and embedding-norm
hygiene — the profiling passes a data curator runs before training.

All ratios are exact integer divisions; the Zipf rank uses a total order
(count desc, word asc) so both engines rank identically; norms are
quantized-integer dot products (associative, order-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.cache import persist_tracked
from kenshin_backup_spark.operators.dedup import normalize_text
from kenshin_backup_spark.operators.scalepat import global_topk
from kenshin_backup_spark.sources import load_table

_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"


# --- Heaps-law vocabulary growth ------------------------------------------

def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law curve: cumulative distinct vocabulary after each decile
    of the corpus (in doc_id order) vs cumulative token count. Sub-linear
    growth is the expected shape; a LINEAR tail means unbounded novel
    tokens — an encoding-garbage red flag.

    Scale: each word contributes only its FIRST-occurrence doc (min
    doc_id per word — one shuffle keyed by word), then a 10-row decile
    aggregation; the corpus is never re-scanned per decile. The doc count
    feeding the decile boundaries is a broadcast 1-row aggregate (scalar
    subquery shape), keeping everything one plan — no driver collect."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (normalize_text("text") != "")
    )
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    base = (
        docs.crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "n_docs",
            F.explode(F.split(normalize_text("text"), " ")).alias("word"),
        )
    )
    decile = F.floor(F.col("doc_id") * 10 / F.col("n_docs")).cast("long")
    first = base.groupBy("word").agg(
        F.min("doc_id").alias("first_doc"), F.min("n_docs").alias("n_docs")
    )
    vocab_per = (
        first.select(
            F.floor(F.col("first_doc") * 10 / F.col("n_docs"))
            .cast("long")
            .alias("decile")
        )
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("new_words"))
    )
    toks_per = (
        base.select(decile.alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("tokens"))
    )
    # token deciles are the spine (every decile has tokens); deciles where
    # no NEW word appears must still show with their cumulative vocab — an
    # inner join would truncate the curve to first-occurrence deciles only
    w = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    return (
        toks_per.join(vocab_per, "decile", "left")
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.sum("tokens").over(w).cast("long").alias("cum_tokens"),
            F.sum(F.coalesce("new_words", F.lit(0)))
            .over(w)
            .cast("long")
            .alias("cum_vocab"),
        )
    )


_HEAPS_SQL = f"""
WITH docs AS (
  SELECT doc_id, {_NORM.format(x="text")} AS t FROM documents
  WHERE text IS NOT NULL AND {_NORM.format(x="text")} <> ''
),
n AS (SELECT COUNT(*) AS n_docs FROM docs),
base AS (
  SELECT doc_id, UNNEST(str_split(t, ' ')) AS word FROM docs
),
first AS (
  SELECT word, MIN(doc_id) AS first_doc FROM base GROUP BY word
),
vocab_per AS (
  SELECT CAST(first_doc * 10 // (SELECT n_docs FROM n) AS BIGINT) AS decile,
         COUNT(*) AS new_words
  FROM first GROUP BY 1
),
toks_per AS (
  SELECT CAST(doc_id * 10 // (SELECT n_docs FROM n) AS BIGINT) AS decile,
         COUNT(*) AS tokens
  FROM base GROUP BY 1
)
SELECT t.decile,
       CAST(SUM(t.tokens) OVER (ORDER BY t.decile
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(v.new_words, 0)) OVER (ORDER BY t.decile
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
FROM toks_per t LEFT JOIN vocab_per v ON v.decile = t.decile
"""


# --- Zipf top-word table ---------------------------------------------------

def text_zipf_topwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf table: the global top-50 words by frequency with rank and
    corpus share — the input to stopword-list generation and the df-cap
    choice in the posting-join dedup. Rank ties break on the word itself
    so both engines produce one total order."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    words = docs.select(
        F.explode(F.split(normalize_text("text"), " ")).alias("word")
    ).where(F.col("word") != "")
    # share denominator as a broadcast 1-row aggregate (scalar-subquery
    # shape) — one plan, no driver collect
    total = words.agg(F.count(F.lit(1)).cast("double").alias("t"))
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    # Global top-50 via TakeOrderedAndProject, then rank over the 50
    # survivors (window input bounded by k, not by the vocabulary).
    top = global_topk(counts, [F.desc("n"), F.asc("word")], 50)
    w = W.orderBy(F.desc("n"), F.asc("word"))
    return (
        top.select(
            "word", "n", F.row_number().over(w).cast("long").alias("rank")
        )
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            "word",
            F.col("n").cast("long").alias("n"),
            (F.col("n").cast("double") / F.col("t")).alias("share"),
        )
    )


_ZIPF_SQL = f"""
WITH words AS (
  SELECT UNNEST(str_split({_NORM.format(x="text")}, ' ')) AS word
  FROM documents WHERE text IS NOT NULL
),
kept AS (SELECT word FROM words WHERE word <> ''),
total AS (SELECT COUNT(*) AS t FROM kept),
counts AS (SELECT word, COUNT(*) AS n FROM kept GROUP BY word),
ranked AS (
  SELECT word, n, ROW_NUMBER() OVER (ORDER BY n DESC, word ASC) AS rank
  FROM counts
)
SELECT rank, word, n,
       CAST(n AS DOUBLE) / (SELECT CAST(t AS DOUBLE) FROM total) AS share
FROM ranked WHERE rank <= 50
"""


# --- audience overlap between event types ---------------------------------

def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap matrix: for every pair of event types, the Jaccard
    of their user sets — which behaviors share an audience. The distinct
    (type, user) table is tiny after dedup; the pair join is an equi-join
    on user_id (never a cross join over users)."""
    ev = load_table(spark, sf_dir, "events")
    # persist: the distinct (a full shuffle of events) feeds THREE
    # consumers — sizes + both sides of the pair join (house persist rule)
    tu = ev.select("event_type", "user_id").distinct().transform(persist_tracked)
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("sz"))
    a, b = tu.alias("a"), tu.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("common").cast("long").alias("common_users"),
            (
                F.col("common").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
            ).alias("jaccard"),
        )
    )


_OVERLAP_SQL = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
sizes AS (SELECT event_type, COUNT(*) AS sz FROM tu GROUP BY event_type),
common AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS common_users
  FROM tu a JOIN tu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT c.type_a, c.type_b, c.common_users,
       CAST(c.common_users AS DOUBLE) / (sa.sz + sb.sz - c.common_users) AS jaccard
FROM common c
JOIN sizes sa ON sa.event_type = c.type_a
JOIN sizes sb ON sb.event_type = c.type_b
"""


# --- embedding norm hygiene ------------------------------------------------

def emb_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-norm hygiene: per label, the min/max/mean quantized L2
    norm-squared and how many vectors fall outside 0.5x-2x the label mean
    — zero-norm or exploding vectors are upstream-encoder bugs that
    poison cosine math. Norms are integer dot products (exact); the
    outlier band check multiplies out to integer space."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = F.transform("embedding", lambda x: F.floor(x.cast("double") * 10000).cast("long"))
    norm2 = F.aggregate(
        F.zip_with(qvec, qvec, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    base = emb.select(F.col("label").cast("long").alias("label"), norm2.alias("n2"))
    stats = base.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("n2").alias("min_n2"),
        F.max("n2").alias("max_n2"),
        F.sum("n2").alias("sum_n2"),
    )
    joined = base.join(F.broadcast(stats), "label")
    # outside [mean/2, 2*mean]  <=>  2*n2*n < sum  OR  n2*n > 2*sum
    outlier = (
        2 * F.col("n2") * F.col("n_vecs") < F.col("sum_n2")
    ) | (F.col("n2") * F.col("n_vecs") > 2 * F.col("sum_n2"))
    out_counts = (
        joined.where(outlier).groupBy("label").agg(F.count(F.lit(1)).alias("n_out"))
    )
    return (
        stats.join(out_counts, "label", "left")
        .select(
            "label",
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.col("min_n2").cast("long").alias("min_n2"),
            F.col("max_n2").cast("long").alias("max_n2"),
            F.coalesce(F.col("n_out"), F.lit(0)).cast("long").alias("n_outliers"),
        )
    )


_NORM_SQL = """
WITH base AS (
  SELECT CAST(label AS BIGINT) AS label,
         list_sum(list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)
                * CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT))) AS n2
  FROM embeddings
),
stats AS (
  SELECT label, COUNT(*) AS n_vecs, MIN(n2) AS min_n2, MAX(n2) AS max_n2,
         SUM(n2) AS sum_n2
  FROM base GROUP BY label
),
outc AS (
  SELECT b.label, COUNT(*) AS n_out
  FROM base b JOIN stats s USING (label)
  WHERE 2 * b.n2 * s.n_vecs < s.sum_n2 OR b.n2 * s.n_vecs > 2 * s.sum_n2
  GROUP BY b.label
)
SELECT s.label, CAST(s.n_vecs AS BIGINT) AS n_vecs,
       CAST(s.min_n2 AS BIGINT) AS min_n2, CAST(s.max_n2 AS BIGINT) AS max_n2,
       CAST(COALESCE(o.n_out, 0) AS BIGINT) AS n_outliers
FROM stats s LEFT JOIN outc o ON o.label = s.label
"""


QUERIES = {
    "text_vocab_growth": text_vocab_growth,
    "text_zipf_topwords": text_zipf_topwords,
    "events_audience_overlap": events_audience_overlap,
    "emb_norm_outliers": emb_norm_outliers,
}

ORACLE = {
    "text_vocab_growth": _HEAPS_SQL,
    "text_zipf_topwords": _ZIPF_SQL,
    "events_audience_overlap": _OVERLAP_SQL,
    "emb_norm_outliers": _NORM_SQL,
}
