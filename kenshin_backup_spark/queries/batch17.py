"""Batch-17 queries: gap-ratio series health, cross-source duplicate
reporting, and per-label embedding centroids (the declarative k-means
M-step).

All exact: gap counting is integer grid arithmetic; centroids are
per-dimension quantized averages (float32 → double BEFORE scaling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.operators.dedup import normalize_text
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")


# --- gap ratio: series health ---------------------------------------------

def tsdb_gap_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per metric: how much of the hourly grid between its first and last
    point has no data (the reference's gap semantics as a health metric).
    Expected slots = integer span arithmetic; observed = distinct buckets;
    no grid explode needed for the ratio."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    bucket = (es / 3600).cast("long")
    per_metric = (
        ev.select(F.col("event_type").alias("metric"), bucket.alias("b"))
        .groupBy("metric")
        .agg(
            F.min("b").alias("b0"),
            F.max("b").alias("b1"),
            F.countDistinct("b").alias("observed"),
        )
    )
    expected = F.col("b1") - F.col("b0") + 1
    return per_metric.select(
        "metric",
        (F.col("b0") * 3600).cast("long").alias("first_bucket_ts"),
        (F.col("b1") * 3600).cast("long").alias("last_bucket_ts"),
        expected.cast("long").alias("expected_slots"),
        F.col("observed").cast("long").alias("observed_slots"),
        (
            (expected - F.col("observed")).cast("double")
            / expected.cast("double")
        ).alias("gap_ratio"),
    )


_GAP_SQL = f"""
WITH b AS (
  SELECT event_type AS metric, CAST({_ES} AS BIGINT) // 3600 AS b FROM events
)
SELECT metric,
       MIN(b) * 3600 AS first_bucket_ts,
       MAX(b) * 3600 AS last_bucket_ts,
       MAX(b) - MIN(b) + 1 AS expected_slots,
       COUNT(DISTINCT b) AS observed_slots,
       CAST(MAX(b) - MIN(b) + 1 - COUNT(DISTINCT b) AS DOUBLE)
         / CAST(MAX(b) - MIN(b) + 1 AS DOUBLE) AS gap_ratio
FROM b GROUP BY 1
"""


# --- cross-source duplicate report ----------------------------------------

def dedup_cross_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicates that appear in MORE THAN ONE source — the
    provenance report a corpus-licensing pass needs (same md5 fingerprint
    pipeline as exact_dedup, aggregated by source spread)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(normalize_text(F.col("text"))).alias("fp")
    return (
        docs.select(fp, "source", "doc_id")
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").cast("long").alias("canonical_doc"),
        )
        .where(F.col("n_sources") > 1)
    )


_CROSS_SRC_SQL = """
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
       COUNT(*) AS n_copies,
       COUNT(DISTINCT source) AS n_sources,
       MIN(doc_id) AS canonical_doc
FROM documents
GROUP BY 1
HAVING COUNT(DISTINCT source) > 1
"""


# --- per-label embedding centroids ----------------------------------------

def emb_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid of each label's vectors, per dimension — the k-means
    M-step as one declarative posexplode + groupBy (no iteration, no UDF).
    Quantized float32 → double → FLOOR(x·1e4) keeps the mean exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("dim", "x")
    )
    q = F.floor(F.col("x").cast("double") * 10000).cast("long")
    return (
        exploded.select("label", "dim", q.alias("q"))
        .groupBy(
            F.col("label").cast("long").alias("label"),
            F.col("dim").cast("long").alias("dim"),
        )
        .agg(
            (
                F.sum("q").cast("double")
                / (F.count("q").cast("double") * 10000.0)
            ).alias("centroid"),
            F.count("q").alias("n_vecs"),
        )
    )


_CENTROID_SQL = """
WITH e AS (
  SELECT label, UNNEST(embedding) AS x,
         generate_subscripts(embedding, 1) - 1 AS dim
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS DOUBLE)
         / (CAST(COUNT(*) AS DOUBLE) * 10000.0) AS centroid,
       COUNT(*) AS n_vecs
FROM e GROUP BY 1, 2
"""


QUERIES = {
    "tsdb_gap_ratio": tsdb_gap_ratio,
    "dedup_cross_source_report": dedup_cross_source_report,
    "emb_centroid_by_label": emb_centroid_by_label,
}

ORACLE = {
    "tsdb_gap_ratio": _GAP_SQL,
    "dedup_cross_source_report": _CROSS_SRC_SQL,
    "emb_centroid_by_label": _CENTROID_SQL,
}
