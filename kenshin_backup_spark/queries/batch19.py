"""Batch-19 queries: linear gap interpolation (graphite interpolate()) and
per-user event-transition matrices (sequence mining).

Interpolation is the one gap semantic fetch's NULL-fill doesn't cover:
missing grid slots take the straight line between the nearest real points
on each side. The interpolation formula runs on epoch-second integers and
identically-derived doubles, so it hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")


# --- linear interpolation over the fetch grid -----------------------------

def tsdb_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly grid per metric with missing buckets linearly interpolated
    between the nearest real buckets (edges stay NULL — nothing to anchor
    to). Real buckets carry the quantized sum; interpolation is
    v0 + (v1 - v0) * (t - t0) / (t1 - t0) on exact anchors."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    hourly = (
        ev.select(
            F.col("event_type").alias("metric"),
            ((es / 3600).cast("long") * 3600).alias("b"),
            F.floor(F.col("value") * 1000000).cast("long").alias("q"),
        )
        .groupBy("metric", "b")
        .agg((F.sum("q") / 1000000.0).alias("v"))
    )
    span = hourly.groupBy("metric").agg(
        F.min("b").alias("b0"), F.max("b").alias("b1")
    )
    grid = span.select(
        "metric",
        F.explode(F.sequence(F.col("b0"), F.col("b1"), F.lit(3600))).alias("b"),
    )
    g = grid.join(hourly, ["metric", "b"], "left")
    wp = W.partitionBy("metric").orderBy("b").rowsBetween(W.unboundedPreceding, 0)
    wf = W.partitionBy("metric").orderBy("b").rowsBetween(0, W.unboundedFollowing)
    prev_v = F.last("v", ignorenulls=True).over(wp)
    prev_t = F.last(F.when(F.col("v").isNotNull(), F.col("b")), ignorenulls=True).over(wp)
    next_v = F.first("v", ignorenulls=True).over(wf)
    next_t = F.first(F.when(F.col("v").isNotNull(), F.col("b")), ignorenulls=True).over(wf)
    interp = prev_v + (next_v - prev_v) * (
        (F.col("b") - prev_t).cast("double") / (next_t - prev_t).cast("double")
    )
    filled = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.when(prev_t.isNotNull() & next_t.isNotNull(), interp)
    )
    return g.select(
        "metric",
        F.col("b").cast("long").alias("bucket_ts"),
        filled.cast("double").alias("value"),
        F.col("v").isNull().cast("long").alias("was_gap"),
    )


_INTERP_SQL = f"""
WITH hourly AS (
  SELECT event_type AS metric,
         CAST(({_ES} // 3600) * 3600 AS BIGINT) AS b,
         CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS v
  FROM events GROUP BY 1, 2
), span AS (
  SELECT metric, MIN(b) AS b0, MAX(b) AS b1 FROM hourly GROUP BY 1
), grid AS (
  SELECT metric, UNNEST(generate_series(b0, b1, 3600)) AS b FROM span
), g AS (
  SELECT grid.metric, grid.b, hourly.v
  FROM grid LEFT JOIN hourly ON grid.metric = hourly.metric AND grid.b = hourly.b
), anchored AS (
  SELECT metric, b, v,
         LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY metric ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
         LAST_VALUE(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
           OVER (PARTITION BY metric ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_t,
         FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY metric ORDER BY b
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
         FIRST_VALUE(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
           OVER (PARTITION BY metric ORDER BY b
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_t
  FROM g
)
SELECT metric, b AS bucket_ts,
       CASE WHEN v IS NOT NULL THEN v
            WHEN prev_t IS NOT NULL AND next_t IS NOT NULL
            THEN prev_v + (next_v - prev_v)
                 * (CAST(b - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE))
       END AS value,
       CAST(v IS NULL AS BIGINT) AS was_gap
FROM anchored
"""


# --- event-transition matrix ----------------------------------------------

def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive event-type transitions aggregated into the
    corpus-level Markov transition matrix, with an exact per-source
    probability (count ratio of exact integers)."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    w = W.partitionBy("user_id").orderBy("es", "event_id")
    staged = ev.select("user_id", "event_id", es.alias("es"), "event_type")
    pairs = (
        staged.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = F.sum("n").over(W.partitionBy("from_type"))
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / total.cast("double")).alias("p"),
    )


_TRANS_SQL = f"""
WITH staged AS (
  SELECT user_id, event_id, event_type, CAST({_ES} AS BIGINT) AS es FROM events
), pairs AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY es, event_id) AS to_type
  FROM staged
), counted AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
FROM counted
"""


QUERIES = {
    "tsdb_interpolate_linear": tsdb_interpolate_linear,
    "events_transition_matrix": events_transition_matrix,
}

ORACLE = {
    "tsdb_interpolate_linear": _INTERP_SQL,
    "events_transition_matrix": _TRANS_SQL,
}
