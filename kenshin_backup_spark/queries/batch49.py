"""Batch-49 queries (round 4): FOR-duration alert evaluation and local
pattern detection — the alerting tier over the rollup grid.

- ``tsdb_alert_rule_eval`` — the Prometheus ``FOR`` semantic: fire only
  when a condition (hourly mean above threshold) holds for ≥ 3
  CONSECUTIVE hours. Consecutive-run detection is the islands idiom
  (slot_index − row_number is constant within a run), one window per
  metric; each surviving run becomes one alert row with its span and
  peak. Everything is per-metric partitioned — the evaluation
  parallelizes across the metric namespace, which is how a fleet-wide
  alert engine scales.
- ``tsdb_vshape_patterns`` — dip detection: a strict local minimum with
  two monotone arms (m[t−2] > m[t−1] > m[t] < m[t+1] < m[t+2]) over the
  hourly mean series, reported with dip depth. Lag/lead chains per
  metric — the MATCH_RECOGNIZE-lite shape Spark expresses with plain
  windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL, QSUM_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")
_STEP = 3600
_ALERT_THRESHOLD = 100.0
_ALERT_FOR = 3  # consecutive hourly slots

_HOURLY_CTE = f"""
hourly AS (
  SELECT event_type, CAST({_ES} // {_STEP} AS BIGINT) AS slot,
         CAST({QSUM_SQL.format(x="value")} / COUNT(value) AS DOUBLE) AS m
  FROM events GROUP BY 1, 2
)"""


def _hourly_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    mean = (
        (F.sum(F.floor(F.col("value") * 1000000).cast("long")) / F.lit(1e6))
        / F.count("value")
    ).cast("double")
    return (
        ev.select("event_type", (es / _STEP).cast("long").alias("slot"), "value")
        .groupBy("event_type", "slot")
        .agg(mean.alias("m"))
    )


def tsdb_alert_rule_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alerts where hourly mean > 100 for ≥ 3 consecutive hours: one row
    per firing window with span, point count, and peak."""
    hourly = _hourly_means(spark, sf_dir)
    hot = hourly.where(F.col("m") > _ALERT_THRESHOLD)
    w = W.partitionBy("event_type").orderBy("slot")
    runs = hot.withColumn(
        "island", F.col("slot") - F.row_number().over(w)
    )
    alerts = (
        runs.groupBy("event_type", "island")
        .agg(
            F.count(F.lit(1)).alias("n_slots"),
            F.min("slot").alias("s0"),
            F.max("slot").alias("s1"),
            F.max("m").alias("peak"),
        )
        .where(F.col("n_slots") >= _ALERT_FOR)
    )
    return alerts.select(
        "event_type",
        (F.col("s0") * _STEP).cast("long").alias("start_es"),
        (F.col("s1") * _STEP).cast("long").alias("end_es"),
        F.col("n_slots").cast("long").alias("n_slots"),
        F.col("peak"),
    )


_ALERT_SQL = f"""
WITH {_HOURLY_CTE},
hot AS (SELECT * FROM hourly WHERE m > {_ALERT_THRESHOLD}),
runs AS (
  SELECT event_type, slot, m,
         slot - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slot)
           AS island
  FROM hot
),
alerts AS (
  SELECT event_type, island, COUNT(*) AS n_slots,
         MIN(slot) AS s0, MAX(slot) AS s1, MAX(m) AS peak
  FROM runs GROUP BY 1, 2
  HAVING COUNT(*) >= {_ALERT_FOR}
)
SELECT event_type,
       CAST(s0 * {_STEP} AS BIGINT) AS start_es,
       CAST(s1 * {_STEP} AS BIGINT) AS end_es,
       CAST(n_slots AS BIGINT) AS n_slots,
       peak
FROM alerts
"""


def tsdb_vshape_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict V-dips on the hourly mean series (two monotone arms around
    a local minimum), with depth = min(left arm, right arm) drop.

    Lags require GRID adjacency: the series is dense hourly here, and the
    lag chain checks slot continuity so a gap never fakes an arm."""
    hourly = _hourly_means(spark, sf_dir)
    w = W.partitionBy("event_type").orderBy("slot")
    ext = hourly.select(
        "event_type",
        "slot",
        "m",
        F.lag("m", 2).over(w).alias("m_2"),
        F.lag("m", 1).over(w).alias("m_1"),
        F.lead("m", 1).over(w).alias("p_1"),
        F.lead("m", 2).over(w).alias("p_2"),
        F.lag("slot", 2).over(w).alias("s_2"),
        F.lead("slot", 2).over(w).alias("sp2"),
    )
    dip = ext.where(
        (F.col("s_2") == F.col("slot") - 2)
        & (F.col("sp2") == F.col("slot") + 2)
        & (F.col("m_2") > F.col("m_1"))
        & (F.col("m_1") > F.col("m"))
        & (F.col("m") < F.col("p_1"))
        & (F.col("p_1") < F.col("p_2"))
    )
    depth = F.least(F.col("m_2") - F.col("m"), F.col("p_2") - F.col("m"))
    return dip.select(
        "event_type",
        (F.col("slot") * _STEP).cast("long").alias("dip_es"),
        F.col("m").alias("dip_value"),
        depth.alias("depth"),
    )


_VSHAPE_SQL = f"""
WITH {_HOURLY_CTE},
ext AS (
  SELECT event_type, slot, m,
         LAG(m, 2) OVER w AS m_2, LAG(m, 1) OVER w AS m_1,
         LEAD(m, 1) OVER w AS p_1, LEAD(m, 2) OVER w AS p_2,
         LAG(slot, 2) OVER w AS s_2, LEAD(slot, 2) OVER w AS sp2
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY slot)
)
SELECT event_type,
       CAST(slot * {_STEP} AS BIGINT) AS dip_es,
       m AS dip_value,
       LEAST(m_2 - m, p_2 - m) AS depth
FROM ext
WHERE s_2 = slot - 2 AND sp2 = slot + 2
  AND m_2 > m_1 AND m_1 > m AND m < p_1 AND p_1 < p_2
"""


QUERIES = {
    "tsdb_alert_rule_eval": tsdb_alert_rule_eval,
    "tsdb_vshape_patterns": tsdb_vshape_patterns,
}

ORACLE = {
    "tsdb_alert_rule_eval": _ALERT_SQL,
    "tsdb_vshape_patterns": _VSHAPE_SQL,
}
