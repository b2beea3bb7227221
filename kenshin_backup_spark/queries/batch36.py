"""Batch-36 queries (round 4): RAG document chunking.

``llm_document_chunking`` is the sliding-window splitter every
retrieval/RAG ingestion pipeline runs in front of embedding: each
document's word stream becomes overlapping fixed-size chunks with stable
ids and content fingerprints. Everything is scan-side codegen (split →
sequence → explode → slice → join → md5): at 100 TB the operator costs
one scan and NO shuffle — chunk rows stream straight to the sink or the
embedding stage, and the md5 fingerprint gives downstream exact-dedup of
chunks for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.operators.dedup import normalize_text
from kenshin_backup_spark.sources import load_table

_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"

#: 64-word chunks advancing 48 words — the standard 25% overlap so no
#: retrieval span straddles a boundary unseen.
_CHUNK_WORDS = 64
_CHUNK_STRIDE = 48


def llm_document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: (doc_id, chunk_idx) rows carrying
    the word span, its exact token count, and the chunk's md5 fingerprint.

    Chunk starts are ``0, stride, 2·stride, …`` while < n_words; the final
    chunk may be short (never empty). All expressions are whole-stage
    codegen over the scan — no UDF, no shuffle, no driver loop."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    words = F.filter(
        F.split(normalize_text("text"), " "), lambda x: x != ""
    )
    base = docs.select(F.col("doc_id"), words.alias("w")).where(F.size("w") > 0)
    starts = F.sequence(
        F.lit(0), F.size("w") - 1, F.lit(_CHUNK_STRIDE)
    )
    chunked = base.select(
        "doc_id",
        F.size("w").alias("doc_words"),
        F.posexplode(starts).alias("chunk_idx", "start_word"),
        F.col("w"),
    )
    piece = F.slice(F.col("w"), F.col("start_word") + 1, _CHUNK_WORDS)
    text = F.array_join(piece, " ")
    return chunked.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_word").cast("long").alias("start_word"),
        F.size(piece).cast("long").alias("n_words"),
        F.length(text).cast("long").alias("n_chars"),
        F.md5(text).alias("chunk_fp"),
        F.col("doc_words").cast("long").alias("doc_words"),
    )


_CHUNK_SQL = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(str_split({_NORM.format(x="text")}, ' '),
                     x -> x <> '') AS w
  FROM documents WHERE text IS NOT NULL
),
kept AS (SELECT doc_id, w, len(w) AS doc_words FROM base WHERE len(w) > 0),
starts AS (
  SELECT doc_id, w, doc_words,
         UNNEST(generate_series(0, doc_words - 1, {_CHUNK_STRIDE})) AS start_word
  FROM kept
),
chunks AS (
  SELECT doc_id, doc_words, start_word,
         start_word // {_CHUNK_STRIDE} AS chunk_idx,
         array_to_string(
           list_slice(w, start_word + 1,
                      least(start_word + {_CHUNK_WORDS}, doc_words)), ' ') AS txt,
         least(start_word + {_CHUNK_WORDS}, doc_words) - start_word AS n_words
  FROM starts
)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(start_word AS BIGINT) AS start_word,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(length(txt) AS BIGINT) AS n_chars,
       md5(txt) AS chunk_fp,
       CAST(doc_words AS BIGINT) AS doc_words
FROM chunks
"""


QUERIES = {
    "llm_document_chunking": llm_document_chunking,
}

ORACLE = {
    "llm_document_chunking": _CHUNK_SQL,
}
