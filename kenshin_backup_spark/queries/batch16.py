"""Batch-16 queries: z-score anomaly flagging (the alerting operator),
the SQL-text entry path over registered views, and Holt linear-trend
forecasting (the graphite holtWinters family, rows-only).

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


# --- Holt linear-trend forecast (rows-only) -------------------------------

def tsdb_holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graphite holtWinters family: double-exponential (Holt linear)
    smoothing per metric over hourly sums, forecasting one step ahead.
    The level/trend recurrence is inherently sequential → grouped
    applyInPandas (Arrow-batched, one group per metric — the same
    per-series layout the stateful streaming twin uses); rows-only check."""
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


QUERIES = {
    "tsdb_anomaly_zscore": tsdb_anomaly_zscore,
    "sql_api_revenue_by_nation": sql_api_revenue_by_nation,
    "tsdb_holt_linear_forecast": tsdb_holt_linear_forecast,
}

ORACLE = {
    "tsdb_anomaly_zscore": _ZSCORE_SQL,
    "sql_api_revenue_by_nation": _SQLAPI_SQL,
    # tsdb_holt_linear_forecast: sequential recurrence → rows-only.
}
