"""Batch-16 queries: z-score anomaly flagging (the alerting operator),
the SQL-text entry path over registered views, and Holt linear-trend
forecasting (the graphite holtWinters family — oracle-backed since
round 8 via a recursive-CTE replay of the recurrence, see _HOLT_SQL).

Variance for the z-score uses a SECOND quantization scale (1e3) so the
sum of squares stays inside BIGINT: value ≤ ~1e3 → q3 = floor(v·1e3) ≤
~1e6, q3² ≤ 1e12, × 10⁶ rows ≈ 1e18 < 2^63. Mean and variance are then
single double expressions over exact integers — identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")


# --- z-score anomaly flags -------------------------------------------------

def tsdb_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric hourly sums scored against the series' own mean/stddev
    (population); |z| > 2 flags the bucket. All moments derive from exact
    BIGINT sums (scale 1e3 for squares), so z is bit-identical."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    q3 = F.floor(F.col("value") * 1000).cast("long")
    hourly = (
        ev.select(
            F.col("event_type").alias("metric"),
            ((es / 3600).cast("long") * 3600).alias("bucket_ts"),
            q3.alias("q3"),
        )
        .groupBy("metric", "bucket_ts")
        .agg(F.sum("q3").alias("bq"))
    )
    stats = hourly.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bq").alias("s1"),
        F.sum(F.col("bq") * F.col("bq")).alias("s2"),
    )
    joined = hourly.join(F.broadcast(stats), "metric")
    mean = F.col("s1").cast("double") / F.col("n").cast("double")
    var = (
        F.col("s2").cast("double") / F.col("n").cast("double")
    ) - mean * mean
    z = (F.col("bq").cast("double") - mean) / F.sqrt(var)
    return joined.select(
        "metric",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        (F.col("bq").cast("double") / 1000.0).alias("bucket_sum"),
        F.when(var > 0, z).cast("double").alias("zscore"),
        F.when(var > 0, (F.abs(z) > 2).cast("long")).alias("is_anomaly"),
    )


_ZSCORE_SQL = f"""
WITH hourly AS (
  SELECT event_type AS metric,
         CAST(({_ES} // 3600) * 3600 AS BIGINT) AS bucket_ts,
         SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS bq
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT metric, COUNT(*) AS n, SUM(bq) AS s1, SUM(bq * bq) AS s2
  FROM hourly GROUP BY 1
)
SELECT h.metric, h.bucket_ts,
       CAST(h.bq AS DOUBLE) / 1000.0 AS bucket_sum,
       CASE WHEN (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                 - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) > 0
            THEN (CAST(h.bq AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 / sqrt((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                        - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                          * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
       END AS zscore,
       CASE WHEN (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                 - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) > 0
            THEN CAST(ABS((CAST(h.bq AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                 / sqrt((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                        - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                          * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))) > 2 AS BIGINT)
       END AS is_anomaly
FROM hourly h JOIN stats ON h.metric = stats.metric
"""


# --- SQL-text entry path ---------------------------------------------------

def sql_api_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL front door: tables registered as temp views,
    query expressed as SQL text, planned by the same Catalyst pipeline as
    the DataFrame API (SURVEY §1.2 — DataFrame and SQL are one surface)."""
    for t in ("lineitem", "orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        """
        SELECT n_name,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000)
                        AS BIGINT)) AS DOUBLE) / 1000000 AS revenue,
               COUNT(*) AS n_lines
        FROM v_lineitem
        JOIN v_orders ON l_orderkey = o_orderkey
        JOIN v_customer ON o_custkey = c_custkey
        JOIN v_nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


_SQLAPI_SQL = """
SELECT n_name,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000)
                AS BIGINT)) AS DOUBLE) / 1000000 AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# --- Holt linear-trend forecast (oracle-backed since r8) -------------------

def tsdb_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graphite holtWinters family: double-exponential (Holt linear)
    smoothing per metric over hourly sums, forecasting one step ahead.
    The level/trend recurrence is inherently sequential → grouped
    applyInPandas (Arrow-batched, one group per metric — the same
    per-series layout the stateful streaming twin uses). Oracle-backed
    since round 8: each step is plain IEEE arithmetic over deterministic
    inputs, replayed bit-for-bit by _HOLT_SQL's recursive CTE."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    hourly = (
        ev.select(
            F.col("event_type").alias("metric"),
            ((es / 3600).cast("long") * 3600).alias("bucket_ts"),
            F.floor(F.col("value") * 1000000).cast("long").alias("q"),
        )
        .groupBy("metric", "bucket_ts")
        .agg((F.sum("q") / 1000000.0).alias("y"))
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts")
        alpha, beta = 0.5, 0.3
        level, trend = None, 0.0
        out_level, out_trend, out_fc = [], [], []
        for y in pdf["y"]:
            if level is None:
                level = y
            else:
                prev = level
                level = alpha * y + (1 - alpha) * (level + trend)
                trend = beta * (level - prev) + (1 - beta) * trend
            out_level.append(level)
            out_trend.append(trend)
            out_fc.append(level + trend)
        pdf["level"] = out_level
        pdf["trend"] = out_trend
        pdf["forecast_next"] = out_fc
        return pdf[["metric", "bucket_ts", "y", "level", "trend", "forecast_next"]]

    return hourly.groupBy("metric").applyInPandas(
        holt,
        "metric string, bucket_ts long, y double, level double, "
        "trend double, forecast_next double",
    )


#: Holt's recurrence is sequential but every step is three plain IEEE
#: binary ops over deterministic inputs (y = exact BIGINT sum / 1e6 in
#: both engines; DuckDB's HUGEINT sum converts exactly below 2^53), so a
#: recursive CTE replays the trace bit-for-bit — upgraded in place from
#: rows-only in round 8. Literal hygiene (same lesson as batch41's MMR
#: oracle): every float constant is CAST(… AS DOUBLE), and (1−α)/(1−β)
#: are written as the SUBTRACTION, not a pre-folded literal, so DuckDB
#: performs the identical IEEE op Python's ``1 - alpha`` performs.
_HOLT_SQL = f"""
WITH RECURSIVE
hourly AS (
  SELECT event_type AS metric, ({_ES}//3600)*3600 AS bucket_ts,
         SUM(CAST(FLOOR(value*1000000) AS BIGINT)) / 1000000.0 AS y
  FROM events GROUP BY 1,2
),
pts AS (
  SELECT metric, bucket_ts, y,
         ROW_NUMBER() OVER (PARTITION BY metric ORDER BY bucket_ts) - 1 AS i
  FROM hourly
),
-- lockstep per-series recurrence: level seeds at y0, trend at 0
rec AS (
  SELECT metric, i, bucket_ts, y, y AS level, CAST(0.0 AS DOUBLE) AS trend
  FROM pts WHERE i = 0
  UNION ALL
  SELECT metric, i, bucket_ts, y, new_level,
         CAST(0.3 AS DOUBLE) * (new_level - old_level)
           + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE)) * old_trend AS trend
  FROM (
    SELECT p.metric, p.i, p.bucket_ts, p.y,
           CAST(0.5 AS DOUBLE) * p.y
             + (CAST(1.0 AS DOUBLE) - CAST(0.5 AS DOUBLE))
               * (r.level + r.trend) AS new_level,
           r.level AS old_level, r.trend AS old_trend
    FROM rec r JOIN pts p ON p.metric = r.metric AND p.i = r.i + 1
  )
)
SELECT metric, bucket_ts, y, level, trend, level + trend AS forecast_next
FROM rec
"""


QUERIES = {
    "tsdb_anomaly_zscore": tsdb_anomaly_zscore,
    "sql_api_revenue_by_nation": sql_api_revenue_by_nation,
    "tsdb_holt_linear_forecast": tsdb_holt_linear_forecast,
}

ORACLE = {
    "tsdb_anomaly_zscore": _ZSCORE_SQL,
    "sql_api_revenue_by_nation": _SQLAPI_SQL,
    "tsdb_holt_linear_forecast": _HOLT_SQL,
}
