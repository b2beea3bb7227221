"""Batch-69 queries (round 4): tag catalog + classifier evaluation.

- ``graphite_tag_catalog`` — graphite 1.1's ``/tags`` + ``/tags/<tag>``
  API as one frame: for every (tag, value) over the tagged series
  catalog (same deterministic tagging as ``graphite_series_by_tag``),
  the number of distinct series carrying it. The tag browser every
  dashboard's query builder populates from.
- ``text_langid_f1`` — per-language precision / recall / F1 of the
  char-n-gram language classifier, computed from the SAME confusion
  matrix the registry already certifies (``text_char_ngram_langid``).
  Evaluation metrics are exact-count ratios (one double division per
  metric, identical in both engines), so the classifier's quality —
  not just its predictions — is hash-certified.

Scale notes: the tag catalog is a scan + distinct-count on a (tag,
value) key space bounded by the tag vocabulary; the F1 query aggregates
the 25-cell confusion matrix — both trivially parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.queries.batch13 import (
    _LANGID_SQL,
    text_char_ngram_langid,
)
from kenshin_backup_spark.sources import load_table


def graphite_tag_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tag, value) → distinct tagged-series count (see docstring)."""
    ev = load_table(spark, sf_dir, "events")
    series = ev.select(
        F.concat(
            F.lit("requests;type="),
            F.col("event_type"),
            F.lit(";dc="),
            F.when(F.col("user_id") % 2 == 0, "east").otherwise("west"),
        ).alias("metric")
    ).distinct()
    pairs = series.select(
        "metric",
        F.explode(
            F.expr(
                "transform(slice(split(metric, ';'), 2, 100),"
                " p -> struct(split_part(p, '=', 1) AS tag,"
                "             split_part(p, '=', 2) AS value))"
            )
        ).alias("tv"),
    )
    return (
        pairs.select("metric", F.col("tv.tag").alias("tag"),
                     F.col("tv.value").alias("value"))
        .groupBy("tag", "value")
        .agg(F.countDistinct("metric").cast("long").alias("n_series"))
    )


_CATALOG_SQL = """
WITH series AS (
  SELECT DISTINCT 'requests;type=' || event_type || ';dc='
           || CASE WHEN user_id % 2 = 0 THEN 'east' ELSE 'west' END AS metric
  FROM events
),
pairs AS (
  SELECT metric, UNNEST(str_split(metric, ';')[2:]) AS p FROM series
)
SELECT split_part(p, '=', 1) AS tag, split_part(p, '=', 2) AS value,
       CAST(COUNT(DISTINCT metric) AS BIGINT) AS n_series
FROM pairs GROUP BY 1, 2
"""


def text_langid_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language P/R/F1 from the certified confusion matrix."""
    conf = text_char_ngram_langid(spark, sf_dir)
    tp = F.sum(F.when(F.col("lang") == F.col("predicted"), F.col("n_docs")))
    actual = conf.groupBy("lang").agg(
        F.sum("n_docs").alias("n_actual"),
        F.coalesce(tp, F.lit(0)).alias("tp"),
    )
    predicted = conf.groupBy(F.col("predicted").alias("lang")).agg(
        F.sum("n_docs").alias("n_predicted")
    )
    j = actual.join(predicted, "lang", "left").fillna(
        {"n_predicted": 0}
    )
    prec = F.when(
        F.col("n_predicted") > 0, F.col("tp") / F.col("n_predicted")
    ).otherwise(F.lit(0.0))
    rec = F.col("tp") / F.col("n_actual")
    f1 = F.when(
        (prec + rec) > 0, 2 * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    return j.select(
        "lang",
        F.col("n_actual").cast("long").alias("n_actual"),
        F.col("n_predicted").cast("long").alias("n_predicted"),
        F.col("tp").cast("long").alias("tp"),
        prec.cast("double").alias("precision"),
        rec.cast("double").alias("recall"),
        f1.cast("double").alias("f1"),
    )


_F1_SQL = f"""
WITH conf AS (
  {_LANGID_SQL}
),
actual AS (
  SELECT lang, SUM(n_docs) AS n_actual,
         COALESCE(SUM(CASE WHEN lang = predicted THEN n_docs END), 0) AS tp
  FROM conf GROUP BY 1
),
predicted AS (
  SELECT predicted AS lang, SUM(n_docs) AS n_predicted FROM conf GROUP BY 1
),
j AS (
  SELECT a.lang, a.n_actual, a.tp,
         COALESCE(p.n_predicted, 0) AS n_predicted
  FROM actual a LEFT JOIN predicted p USING (lang)
),
m AS (
  SELECT lang, n_actual, n_predicted, tp,
         CASE WHEN n_predicted > 0
              THEN CAST(tp AS DOUBLE) / n_predicted ELSE 0.0 END AS precision,
         CAST(tp AS DOUBLE) / n_actual AS recall
  FROM j
)
SELECT lang, CAST(n_actual AS BIGINT) AS n_actual,
       CAST(n_predicted AS BIGINT) AS n_predicted,
       CAST(tp AS BIGINT) AS tp,
       CAST(precision AS DOUBLE) AS precision,
       CAST(recall AS DOUBLE) AS recall,
       CAST(CASE WHEN precision + recall > 0
                 THEN 2 * precision * recall / (precision + recall)
                 ELSE 0.0 END AS DOUBLE) AS f1
FROM m
"""


QUERIES = {
    "graphite_tag_catalog": graphite_tag_catalog,
    "text_langid_f1": text_langid_f1,
}

ORACLE = {
    "graphite_tag_catalog": _CATALOG_SQL,
    "text_langid_f1": _F1_SQL,
}
