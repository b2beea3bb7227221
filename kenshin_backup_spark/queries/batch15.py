"""Batch-15 queries: ordered funnel analysis and weekly cohort retention —
the two canonical product-analytics operators over an event log.

Both are pure multi-stage aggregations (no UDFs, no sequential state): the
funnel chains conditional MINs through per-user joins; retention is a
first-seen cohort join. Week arithmetic is integer epoch division so both
engines bucket identically (no calendar-week dialect drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")

_WEEK = 7 * 86400


# --- ordered funnel --------------------------------------------------------

def funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → click → purchase: a user advances to stage
    N only with an event strictly after their stage-N-1 time. Output is
    users-per-stage. Each stage is one conditional-MIN aggregation joined
    back — three narrow (user_id, ts) frames, no window state."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    base = ev.select("user_id", "event_type", es.alias("es"))

    s1 = base.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("es").alias("t1")
    )
    s2 = (
        base.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("es") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("es").alias("t2"))
    )
    s3 = (
        base.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("es") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("es").alias("t3"))
    )
    counts = (
        s1.agg(F.count(F.lit(1)).alias("n")).withColumn("stage", F.lit("1_signup"))
        .unionByName(
            s2.agg(F.count(F.lit(1)).alias("n")).withColumn(
                "stage", F.lit("2_click_after_signup")
            )
        )
        .unionByName(
            s3.agg(F.count(F.lit(1)).alias("n")).withColumn(
                "stage", F.lit("3_purchase_after_click")
            )
        )
    )
    return counts.select("stage", F.col("n").cast("long").alias("n_users"))


_FUNNEL_SQL = f"""
WITH e AS (
  SELECT user_id, event_type, CAST({_ES} AS BIGINT) AS es FROM events
),
s1 AS (
  SELECT user_id, MIN(es) AS t1 FROM e WHERE event_type = 'signup' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(es) AS t2
  FROM e JOIN s1 ON e.user_id = s1.user_id
  WHERE event_type = 'click' AND es > t1 GROUP BY 1
),
s3 AS (
  SELECT e.user_id, MIN(es) AS t3
  FROM e JOIN s2 ON e.user_id = s2.user_id
  WHERE event_type = 'purchase' AND es > t2 GROUP BY 1
)
SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM s1
UNION ALL
SELECT '2_click_after_signup', COUNT(*) FROM s2
UNION ALL
SELECT '3_purchase_after_click', COUNT(*) FROM s3
"""


# --- weekly cohort retention ----------------------------------------------

def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort = a user's first-activity week (integer epoch weeks); cell
    (cohort, offset) = distinct users of that cohort active offset weeks
    later. The first-seen frame is tiny (|users|) and broadcast back onto
    the event stream — one wide scan, one distinct-count shuffle."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    base = ev.select("user_id", (es / _WEEK).cast("long").alias("week"))
    first = base.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        base.join(F.broadcast(first), "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
        .select(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            F.col("week_offset").cast("long").alias("week_offset"),
            F.col("n_active").cast("long").alias("n_active"),
        )
    )


_COHORT_SQL = f"""
WITH e AS (
  SELECT user_id, CAST({_ES} AS BIGINT) // {_WEEK} AS week FROM events
),
first AS (
  SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY 1
)
SELECT cohort_week, week - cohort_week AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_active
FROM e JOIN first ON e.user_id = first.user_id
GROUP BY 1, 2
"""


QUERIES = {
    "funnel_signup_click_purchase": funnel_signup_click_purchase,
    "cohort_retention_weekly": cohort_retention_weekly,
}

ORACLE = {
    "funnel_signup_click_purchase": _FUNNEL_SQL,
    "cohort_retention_weekly": _COHORT_SQL,
}
