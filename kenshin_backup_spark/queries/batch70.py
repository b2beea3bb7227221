"""Batch-70 queries (round 4): privacy risk + seasonality detection.

- ``privacy_k_anonymity_report`` — the pre-release privacy review: with
  (lang, source, size-bucket) as the quasi-identifier, every
  equivalence class smaller than K = 5 is a re-identification risk.
  Output: the risky classes with their sizes plus each class's share of
  the corpus — the table a data-release review walks before approving an
  export. (Generalization — coarser buckets — is the remediation; the
  bucket width is a parameter.)
- ``tsdb_dominant_period`` — auto-detection of each metric's seasonal
  period: autocorrelation over lags 2..30 h (the batch-37 exact-moment
  ACF kernel, widened), argmax r per metric = the dominant period. The
  input to any seasonal decomposition/forecast that should not assume
  daily seasonality.

Scale notes: k-anonymity is one grouped count plus a broadcast total;
the period scan joins hourly means on (metric, slot+lag) — per-series
keys, 29 lag replicas of a ~720-row/metric frame, nothing proportional
to raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kenshin_backup_spark.cache import persist_tracked
from kenshin_backup_spark.queries.batch37 import (
    _CORR_SQL_EXPR,
    _MOMENT_COLS,
    _QMEANS_CTE,
    _corr_from_moments,
    _hourly_qmeans,
    _moment_aggs,
)
from kenshin_backup_spark.sources import load_table

K_ANON = 5
BUCKET_CHARS = 100


def privacy_k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quasi-identifier classes below the K-anonymity floor."""
    docs = load_table(spark, sf_dir, "documents")
    classes = docs.groupBy(
        "lang",
        "source",
        F.floor(F.col("n_chars") / BUCKET_CHARS).cast("long").alias("size_bucket"),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    total = classes.agg(F.sum("class_size").alias("total"))
    return (
        classes.where(F.col("class_size") < K_ANON)
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            "source",
            "size_bucket",
            F.col("class_size").cast("long").alias("class_size"),
            (F.col("class_size") / F.col("total").cast("double"))
            .cast("double")
            .alias("corpus_share"),
        )
    )


_KANON_SQL = f"""
WITH classes AS (
  SELECT lang, source,
         CAST(n_chars // {BUCKET_CHARS} AS BIGINT) AS size_bucket,
         COUNT(*) AS class_size
  FROM documents GROUP BY 1, 2, 3
),
total AS (SELECT SUM(class_size) AS total FROM classes)
SELECT lang, source, size_bucket,
       CAST(class_size AS BIGINT) AS class_size,
       CAST(class_size / CAST(total AS DOUBLE) AS DOUBLE) AS corpus_share
FROM classes CROSS JOIN total
WHERE class_size < {K_ANON}
"""


_MAX_LAG = 30


def tsdb_dominant_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric argmax-ACF period over lags 2..30 h."""
    qmeans = _hourly_qmeans(spark, sf_dir).transform(persist_tracked)
    lagged = qmeans.select(
        "event_type",
        "slot",
        F.col("qm").alias("qx"),
        F.explode(
            F.sequence(F.lit(2), F.lit(_MAX_LAG))
        ).alias("lag"),
    )
    right = qmeans.select(
        F.col("event_type").alias("retype"),
        F.col("slot").alias("rslot"),
        F.col("qm").alias("qy"),
    )
    pairs = lagged.join(
        right,
        (F.col("retype") == F.col("event_type"))
        & (F.col("rslot") == F.col("slot") + F.col("lag")),
    ).select("event_type", "lag", "qx", "qy")
    acf = _corr_from_moments(
        pairs.groupBy("event_type", "lag").agg(*_moment_aggs())
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("corr"), F.asc("lag")
    )
    return (
        acf.where(F.col("corr").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("lag").cast("long").alias("period_hours"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("corr").alias("acf"),
        )
    )


_PERIOD_SQL = f"""
WITH {_QMEANS_CTE},
lags AS (SELECT UNNEST(generate_series(2, {_MAX_LAG})) AS lag),
pairs AS (
  SELECT a.event_type, l.lag, a.qm AS qx, b.qm AS qy
  FROM qmeans a
  CROSS JOIN lags l
  JOIN qmeans b
    ON b.event_type = a.event_type AND b.slot = a.slot + l.lag
),
m AS (
  SELECT event_type, lag, {_MOMENT_COLS}
  FROM pairs GROUP BY 1, 2
),
acf AS (
  SELECT event_type, lag, n_pairs, ({_CORR_SQL_EXPR}) AS corr FROM m
),
ranked AS (
  SELECT event_type, lag, n_pairs, corr,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY corr DESC, lag ASC) AS rn
  FROM acf WHERE corr IS NOT NULL
)
SELECT event_type, CAST(lag AS BIGINT) AS period_hours,
       CAST(n_pairs AS BIGINT) AS n_pairs, CAST(corr AS DOUBLE) AS acf
FROM ranked WHERE rn = 1
"""


QUERIES = {
    "privacy_k_anonymity_report": privacy_k_anonymity_report,
    "tsdb_dominant_period": tsdb_dominant_period,
}

ORACLE = {
    "privacy_k_anonymity_report": _KANON_SQL,
    "tsdb_dominant_period": _PERIOD_SQL,
}
