"""Batch-42 queries (round 4): exact substring-span dedup, embedding
truncation audit, and PageRank over the near-dup graph.

- ``dedup_substring_spans`` — span-level exact dedup in the style of
  "Deduplicating Training Data Makes Language Models Better" (Lee et
  al., 2022): fixed-width word windows (8 words, stride 4) fingerprint
  scan-side; a fingerprint appearing in ≥ 2 documents marks a duplicated
  span that document- and sentence-level dedup both miss (boilerplate
  fragments, quoted passages). Fully oracle-checked. At 100 TB the
  shuffle carries (md5, doc_id) pairs — 40 bytes per window — and the
  ≥2-docs filter happens in the first keyed aggregate.
- ``emb_truncation_recall`` — the matryoshka-style storage question: if
  vectors are truncated to their first 16 dims, how much of the full-dim
  cosine top-10 survives? Both rankings use quantized integer dots, so
  the per-query recall is engine-exact and fully oracle-checked.
- ``graph_pagerank_docs`` — PageRank centrality over the symmetrized
  near-dup Jaccard graph: which documents sit at the center of duplicate
  neighborhoods (the canonical-representative selection signal).
  Iterative float recursion → rows-only, pinned by property tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.operators.dedup import (
    ngram_jaccard_pairs,
    normalize_text,
)
from kenshin_backup_spark.operators.graph import pagerank
from kenshin_backup_spark.operators.similarity import qdot, quantize_vec
from kenshin_backup_spark.sources import load_table

_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"

# --- substring-span dedup ---------------------------------------------------

_SPAN_WORDS = 8
_SPAN_STRIDE = 4


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated word spans (8-word windows, stride 4):
    one row per fingerprint seen in ≥ 2 distinct documents."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    words = F.filter(F.split(normalize_text("text"), " "), lambda x: x != "")
    base = docs.select(F.col("doc_id"), words.alias("w")).where(
        F.size("w") >= _SPAN_WORDS
    )
    starts = F.sequence(
        F.lit(0), F.size("w") - _SPAN_WORDS, F.lit(_SPAN_STRIDE)
    )
    spans = base.select(
        "doc_id",
        F.explode(starts).alias("s"),
        F.col("w"),
    ).select(
        "doc_id",
        F.md5(F.array_join(F.slice(F.col("w"), F.col("s") + 1, _SPAN_WORDS), " ")).alias(
            "fp"
        ),
    )
    return (
        spans.groupBy("fp")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_spans"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
        .where(F.col("n_docs") >= 2)
        .select("fp", F.col("n_docs").cast("long").alias("n_docs"),
                F.col("n_spans").cast("long").alias("n_spans"),
                "min_doc", "max_doc")
    )


_SPAN_SQL = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(str_split({_NORM.format(x="text")}, ' '),
                     x -> x <> '') AS w
  FROM documents WHERE text IS NOT NULL
),
kept AS (SELECT doc_id, w FROM base WHERE len(w) >= {_SPAN_WORDS}),
spans AS (
  SELECT doc_id,
         md5(array_to_string(
           list_slice(w, s + 1, s + {_SPAN_WORDS}), ' ')) AS fp
  FROM kept,
       UNNEST(generate_series(0, len(w) - {_SPAN_WORDS}, {_SPAN_STRIDE}))
         AS t(s)
)
SELECT fp,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM spans GROUP BY fp
HAVING COUNT(DISTINCT doc_id) >= 2
"""


# --- embedding truncation recall --------------------------------------------

_TRUNC_DIMS = 16
_TRUNC_TOPK = 10
_TRUNC_QUERIES = 20


def emb_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of first-16-dim cosine vs full-dim cosine per query
    (vec_id < 20). Candidates must be non-zero-norm under BOTH metrics so
    the two rankings draw from the same pool (NaN guard, both engines)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select(
        F.col("vec_id").alias("id"),
        quantize_vec("embedding").alias("v"),
        quantize_vec(F.slice(F.col("embedding"), 1, _TRUNC_DIMS)).alias("t"),
    ).select(
        "id",
        "v",
        "t",
        qdot(F.col("v"), F.col("v")).alias("vn"),
        qdot(F.col("t"), F.col("t")).alias("tn"),
    ).where((F.col("vn") > 0) & (F.col("tn") > 0))
    q = qv.where(F.col("id") < _TRUNC_QUERIES).select(
        F.col("id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("t").alias("qt"),
        F.col("vn").alias("qvn"),
        F.col("tn").alias("qtn"),
    )
    pairs = qv.crossJoin(F.broadcast(q)).where(F.col("id") != F.col("qid"))
    full_cos = (
        qdot(F.col("qv"), F.col("v"))
        / F.sqrt(F.col("qvn").cast("double") * F.col("vn").cast("double"))
    ).cast("double")
    trunc_cos = (
        qdot(F.col("qt"), F.col("t"))
        / F.sqrt(F.col("qtn").cast("double") * F.col("tn").cast("double"))
    ).cast("double")
    scored = pairs.select(
        "qid", "id", full_cos.alias("fc"), trunc_cos.alias("tc")
    )
    w_f = W.partitionBy("qid").orderBy(F.desc("fc"), F.asc("id"))
    w_t = W.partitionBy("qid").orderBy(F.desc("tc"), F.asc("id"))
    ranked = scored.select(
        "qid",
        "id",
        F.row_number().over(w_f).alias("rf"),
        F.row_number().over(w_t).alias("rt"),
    )
    return (
        ranked.where(F.col("rf") <= _TRUNC_TOPK)
        .groupBy("qid")
        .agg(
            F.sum(F.when(F.col("rt") <= _TRUNC_TOPK, 1).otherwise(0)).alias("nc")
        )
        .select(
            F.col("qid").cast("long").alias("query_id"),
            F.col("nc").cast("long").alias("n_common"),
            (F.col("nc").cast("double") / F.lit(float(_TRUNC_TOPK))).alias(
                "recall_at_10"
            ),
        )
    )


_TRUNC_SQL = f"""
WITH qv AS (
  SELECT vec_id AS id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v,
         list_transform(embedding[1:{_TRUNC_DIMS}],
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS t
  FROM embeddings
),
norms AS (
  SELECT id, v, t,
         list_sum(list_transform(v, x -> x * x)) AS vn,
         list_sum(list_transform(t, x -> x * x)) AS tn
  FROM qv
),
ok AS (SELECT * FROM norms WHERE vn > 0 AND tn > 0),
pairs AS (
  SELECT q.id AS qid, c.id AS id,
         CAST(list_sum(list_transform(generate_series(1, len(q.v)),
                                      i -> q.v[i] * c.v[i])) AS DOUBLE)
           / sqrt(CAST(q.vn AS DOUBLE) * CAST(c.vn AS DOUBLE)) AS fc,
         CAST(list_sum(list_transform(generate_series(1, len(q.t)),
                                      i -> q.t[i] * c.t[i])) AS DOUBLE)
           / sqrt(CAST(q.tn AS DOUBLE) * CAST(c.tn AS DOUBLE)) AS tc
  FROM ok c CROSS JOIN ok q
  WHERE q.id < {_TRUNC_QUERIES} AND c.id <> q.id
),
ranked AS (
  SELECT qid, id,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY fc DESC, id ASC) AS rf,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY tc DESC, id ASC) AS rt
  FROM pairs
)
SELECT CAST(qid AS BIGINT) AS query_id,
       CAST(SUM(CASE WHEN rt <= {_TRUNC_TOPK} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_common,
       CAST(SUM(CASE WHEN rt <= {_TRUNC_TOPK} THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST({_TRUNC_TOPK} AS DOUBLE) AS recall_at_10
FROM ranked WHERE rf <= {_TRUNC_TOPK}
GROUP BY qid
"""


# --- PageRank over the near-dup graph ---------------------------------------


def graph_pagerank_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the symmetrized Jaccard near-dup graph —
    the canonical-representative signal (rows-only; see operators/graph)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=10)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    ranks = pagerank(edges, docs.select("doc_id"), node_col="doc_id", iters=15)
    return ranks.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col("rank")
    )


QUERIES = {
    "dedup_substring_spans": dedup_substring_spans,
    "emb_truncation_recall": emb_truncation_recall,
    "graph_pagerank_docs": graph_pagerank_docs,
}

ORACLE = {
    "dedup_substring_spans": _SPAN_SQL,
    "emb_truncation_recall": _TRUNC_SQL,
    # graph_pagerank_docs: iterative float recursion → rows-only by
    # contract; pinned by tests/test_properties.py.
}
