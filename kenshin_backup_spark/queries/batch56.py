"""Batch-56 queries (round 4): traffic forensics over the events stream.

- ``events_bot_detection`` — the classic training-data hygiene screen:
  rank users by how regular their inter-arrival cadence is (bots beat
  humans at keeping time). Per user with >= MIN_EVENTS events: mean gap
  and gap variance from exact integer sums of gap and gap² (no float
  accumulation), regularity score = coefficient of variation
  (stdev/mean, lower = more bot-like); emit the top 10 most-regular
  users via ``orderBy().limit()`` (TakeOrdered — a fixed threshold would
  be trivially empty on this synthetic corpus; the ranking is the same
  screen a real pipeline would review before blocking).
- ``tsdb_counter_gauge_classify`` — metric-type auto-detection for TSDB
  ingest: per metric, the share of non-negative first differences along
  the time-ordered series; >= 0.99 ⇒ 'counter', else 'gauge'. Both the
  lag window and the aggregation partition on the metric key.

Scale notes (100 TB): both queries lag-window within a key partition
(user_id / metric) and aggregate on that same key — the shuffle is one
hash exchange, reused by window and aggregate; no global window, no UDF.
Variance uses Σg and Σg² BIGINT sums (gaps are integer seconds; g² fits
int64 far beyond any real cadence), so Spark and DuckDB agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")

MIN_EVENTS = 20
TOP_N = 10


def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most-regular-cadence users (see module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    gaps = (
        ev.select("user_id", "event_id", es.alias("es"))
        .withColumn("gap", F.col("es") - F.lag("es").over(w))
        .where(F.col("gap").isNotNull())
    )
    stats = gaps.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).alias("n_events"),
        F.sum("gap").alias("sg"),
        F.sum(F.col("gap") * F.col("gap")).alias("sg2"),
        F.count(F.lit(1)).alias("ng"),
    )
    mean = F.col("sg") / F.col("ng").cast("double")
    var = F.col("sg2") / F.col("ng").cast("double") - mean * mean
    cv = F.sqrt(var) / mean
    top = (
        stats.where(F.col("n_events") >= MIN_EVENTS)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("n_events").cast("long").alias("n_events"),
            mean.cast("double").alias("mean_gap_s"),
            cv.cast("double").alias("cadence_cv"),
        )
        .orderBy(F.asc("cadence_cv"), F.asc("user_id"))
        .limit(TOP_N)
    )
    w_rank = Window.orderBy(F.asc("cadence_cv"), F.asc("user_id"))
    return top.withColumn(
        "rank", F.row_number().over(w_rank).cast("long")
    ).select("rank", "user_id", "n_events", "mean_gap_s", "cadence_cv")


_BOT_SQL = f"""
WITH gaps AS (
  SELECT user_id,
         es - lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id) AS gap
  FROM (SELECT user_id, event_id, {_ES} AS es FROM events)
),
stats AS (
  SELECT user_id, COUNT(*) + 1 AS n_events,
         SUM(gap) AS sg, SUM(gap * gap) AS sg2, COUNT(*) AS ng
  FROM gaps WHERE gap IS NOT NULL GROUP BY user_id
),
scored AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         CAST(n_events AS BIGINT) AS n_events,
         CAST(sg / CAST(ng AS DOUBLE) AS DOUBLE) AS mean_gap_s,
         CAST(sqrt(sg2 / CAST(ng AS DOUBLE)
                   - (sg / CAST(ng AS DOUBLE)) * (sg / CAST(ng AS DOUBLE)))
              / (sg / CAST(ng AS DOUBLE)) AS DOUBLE) AS cadence_cv
  FROM stats
  WHERE n_events >= {MIN_EVENTS}
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY cadence_cv ASC, user_id ASC)
            AS BIGINT) AS rank,
       user_id, n_events, mean_gap_s, cadence_cv
FROM scored
ORDER BY cadence_cv ASC, user_id ASC
LIMIT {TOP_N}
"""


def tsdb_counter_gauge_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counter-vs-gauge auto-detection by monotone-diff share per metric."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    w = Window.partitionBy("metric").orderBy("es", "event_id")
    diffs = (
        ev.select(
            F.col("event_type").alias("metric"),
            "event_id",
            es.alias("es"),
            F.floor(F.col("value") * 1_000_000).cast("long").alias("vq"),
        )
        .withColumn("d", F.col("vq") - F.lag("vq").over(w))
        .where(F.col("d").isNotNull())
    )
    agg = diffs.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_diffs"),
        F.sum(F.when(F.col("d") >= 0, 1).otherwise(0)).alias("n_up"),
    )
    share = F.col("n_up") / F.col("n_diffs").cast("double")
    return agg.select(
        "metric",
        F.col("n_diffs").cast("long").alias("n_diffs"),
        share.cast("double").alias("monotone_share"),
        F.when(share >= 0.99, F.lit("counter"))
        .otherwise(F.lit("gauge"))
        .alias("metric_kind"),
    )


_CLASSIFY_SQL = f"""
WITH diffs AS (
  SELECT metric,
         vq - lag(vq) OVER (PARTITION BY metric ORDER BY es, event_id) AS d
  FROM (SELECT event_type AS metric, event_id, {_ES} AS es,
               CAST(FLOOR(value * 1000000) AS BIGINT) AS vq
        FROM events)
),
agg AS (
  SELECT metric, COUNT(*) AS n_diffs,
         SUM(CASE WHEN d >= 0 THEN 1 ELSE 0 END) AS n_up
  FROM diffs WHERE d IS NOT NULL GROUP BY metric
)
SELECT metric, CAST(n_diffs AS BIGINT) AS n_diffs,
       CAST(n_up / CAST(n_diffs AS DOUBLE) AS DOUBLE) AS monotone_share,
       CASE WHEN n_up / CAST(n_diffs AS DOUBLE) >= 0.99
            THEN 'counter' ELSE 'gauge' END AS metric_kind
FROM agg
"""


QUERIES = {
    "events_bot_detection": events_bot_detection,
    "tsdb_counter_gauge_classify": tsdb_counter_gauge_classify,
}

ORACLE = {
    "events_bot_detection": _BOT_SQL,
    "tsdb_counter_gauge_classify": _CLASSIFY_SQL,
}
