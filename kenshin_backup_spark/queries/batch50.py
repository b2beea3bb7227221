"""Batch-50 queries (round 4): multi-touch attribution and capacity
forecasting by exact linear regression.

- ``events_attribution_linear`` — linear (equal-split) multi-touch
  attribution: each purchase's value is split equally across the user's
  clicks in the preceding hour, and attributed revenue rolls up by the
  click's hour-of-day (the "when do converting touches happen" report).
  The purchase↔click pairing is a bucketed interval join (same-or-
  adjacent hour buckets, then the exact time predicate) — never a full
  theta join — and the per-purchase click count is a window partitioned
  by purchase. Credit shares are value/n with both sides integer-derived
  (value quantized, n a count), so the split is engine-exact.
- ``tsdb_capacity_forecast_linreg`` — per-metric least-squares trend
  over the hourly mean series from EXACT integer moments (the same five
  sums as the correlation family): slope/intercept in closed form, plus
  the projected time of crossing a capacity threshold. No ML library,
  no iteration — the fleet-wide capacity-planning sweep as one keyed
  aggregate per metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL, QSUM_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")

# --- linear attribution -----------------------------------------------------

_ATTR_WINDOW = 3600  # credit clicks within the hour before the purchase


def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-split attribution of purchase value to the user's clicks in
    the preceding hour, aggregated by click hour-of-day."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        es.alias("pes"),
        F.floor(F.col("value") * 1000000).cast("long").alias("pv_q"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("cu"),
        es.alias("ces"),
    )
    # bucketed interval join: a click within [pes-3600, pes] lives in the
    # purchase's hour bucket or the one before it
    p_b = purchases.withColumn(
        "pb", F.explode(F.array((F.col("pes") / 3600).cast("long"),
                                (F.col("pes") / 3600).cast("long") - 1))
    )
    c_b = clicks.withColumn("cb", (F.col("ces") / 3600).cast("long"))
    pairs = p_b.join(
        c_b, (F.col("pu") == F.col("cu")) & (F.col("pb") == F.col("cb"))
    ).where(
        (F.col("ces") <= F.col("pes"))
        & (F.col("ces") > F.col("pes") - _ATTR_WINDOW)
    ).select("pid", "pv_q", "cid", "ces")
    w = W.partitionBy("pid")
    credited = pairs.withColumn("n_touch", F.count(F.lit(1)).over(w))
    credit = (F.col("pv_q").cast("double") / F.lit(1e6)) / F.col(
        "n_touch"
    ).cast("double")
    by_hour = (
        credited.select(
            ((F.col("ces") % 86400) / 3600).cast("long").alias("hour_of_day"),
            F.floor(credit * F.lit(1000000.0)).cast("long").alias("credit_q"),
        )
        .groupBy("hour_of_day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            (F.sum("credit_q") / F.lit(1e6)).cast("double").alias(
                "attributed_revenue"
            ),
        )
    )
    return by_hour


_ATTR_SQL = f"""
WITH purchases AS (
  SELECT event_id AS pid, user_id AS pu, CAST({_ES} AS BIGINT) AS pes,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS pv_q
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT event_id AS cid, user_id AS cu, CAST({_ES} AS BIGINT) AS ces
  FROM events WHERE event_type = 'click'
),
pairs AS (
  SELECT p.pid, p.pv_q, c.cid, c.ces
  FROM purchases p JOIN clicks c
    ON p.pu = c.cu AND c.ces <= p.pes AND c.ces > p.pes - {_ATTR_WINDOW}
),
credited AS (
  SELECT pid, pv_q, cid, ces,
         COUNT(*) OVER (PARTITION BY pid) AS n_touch
  FROM pairs
)
SELECT CAST((ces % 86400) // 3600 AS BIGINT) AS hour_of_day,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(CAST(SUM(CAST(FLOOR(((CAST(pv_q AS DOUBLE) / 1000000)
                                  / CAST(n_touch AS DOUBLE))
                                 * CAST(1000000 AS DOUBLE)) AS BIGINT))
                 AS DOUBLE) / 1000000 AS DOUBLE) AS attributed_revenue
FROM credited
GROUP BY 1
"""


# --- capacity forecast by exact linear regression ---------------------------

_CAP_THRESHOLD = 200.0
_SLOT_S = 3600
#: hourly means quantized to 1e-3 (see the correlation family's bound)
_CAP_Q = 1000


def tsdb_capacity_forecast_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric least-squares trend of the hourly mean series + hours
    until the trend crosses the capacity threshold (NULL if the trend
    moves away). x = slot index relative to each metric's first slot."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    mean = (
        (F.sum(F.floor(F.col("value") * 1000000).cast("long")) / F.lit(1e6))
        / F.count("value")
    ).cast("double")
    hourly = (
        ev.select("event_type", (es / _SLOT_S).cast("long").alias("slot"), "value")
        .groupBy("event_type", "slot")
        .agg(F.floor(mean * _CAP_Q).cast("long").alias("qy"))
    )
    w0 = W.partitionBy("event_type")
    rel = hourly.withColumn("x", F.col("slot") - F.min("slot").over(w0))
    sums = rel.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("qy").alias("sy"),
        F.sum(F.col("x") * F.col("qy")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.max("x").alias("x_last"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    den = n * F.col("sxx").cast("double") - sx * sx
    slope_q = (n * F.col("sxy").cast("double") - sx * sy) / den
    intercept_q = (sy - slope_q * sx) / n
    slope = slope_q / F.lit(float(_CAP_Q))
    intercept = intercept_q / F.lit(float(_CAP_Q))
    current = intercept + slope * F.col("x_last").cast("double")
    hours_to = F.when(
        (slope > 0) & (current < F.lit(_CAP_THRESHOLD)),
        (F.lit(_CAP_THRESHOLD) - current) / slope,
    ).otherwise(F.lit(None).cast("double"))
    return sums.where(F.col("n") >= 2).select(
        "event_type",
        F.col("n").cast("long").alias("n_slots"),
        slope.alias("slope_per_hour"),
        intercept.alias("intercept"),
        current.alias("trend_now"),
        hours_to.alias("hours_to_threshold"),
    )


_CAP_SQL = f"""
WITH hourly AS (
  SELECT event_type, CAST({_ES} // {_SLOT_S} AS BIGINT) AS slot,
         CAST(FLOOR(CAST({QSUM_SQL.format(x="value")} / COUNT(value) AS DOUBLE)
                    * {_CAP_Q}) AS BIGINT) AS qy
  FROM events GROUP BY 1, 2
),
rel AS (
  SELECT event_type, qy,
         slot - MIN(slot) OVER (PARTITION BY event_type) AS x
  FROM hourly
),
sums AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(qy) AS sy,
         SUM(x * qy) AS sxy, SUM(x * x) AS sxx, MAX(x) AS x_last
  FROM rel GROUP BY 1
),
fit AS (
  SELECT event_type, n, x_last,
         ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS slope_q,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM sums
),
shaped AS (
  SELECT event_type, n, x_last,
         slope_q / CAST({_CAP_Q} AS DOUBLE) AS slope,
         ((syd - slope_q * sxd) / CAST(n AS DOUBLE))
           / CAST({_CAP_Q} AS DOUBLE) AS intercept
  FROM fit
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_slots,
       slope AS slope_per_hour,
       intercept,
       intercept + slope * CAST(x_last AS DOUBLE) AS trend_now,
       CASE WHEN slope > CAST(0 AS DOUBLE)
             AND intercept + slope * CAST(x_last AS DOUBLE)
                 < CAST({_CAP_THRESHOLD} AS DOUBLE)
            THEN (CAST({_CAP_THRESHOLD} AS DOUBLE)
                  - (intercept + slope * CAST(x_last AS DOUBLE))) / slope
            ELSE NULL END AS hours_to_threshold
FROM shaped WHERE n >= 2
"""


QUERIES = {
    "events_attribution_linear": events_attribution_linear,
    "tsdb_capacity_forecast_linreg": tsdb_capacity_forecast_linreg,
}

ORACLE = {
    "events_attribution_linear": _ATTR_SQL,
    "tsdb_capacity_forecast_linreg": _CAP_SQL,
}
