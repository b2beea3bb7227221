"""Batch-27 queries: SRE/alerting and business-analytics composites —
multi-window SLO burn rate, year-over-year growth, RFM quartile scoring,
and MAD-based robust anomaly flags.

Burn-rate flags and RFM boundaries are compared in integer space; the MAD
pipeline quantizes values before its two interpolated-median passes so
both engines interpolate over exactly-representable integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import (
    EPOCH_S_SQL,
    QSUM_SQL,
    qsum,
)
from kenshin_backup_spark.operators.scalepat import (
    ntile_expr,
    with_global_prefix,
    with_global_scalars,
)
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")


# --- multi-window SLO burn rate -------------------------------------------

def tsdb_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn-rate alert (the Google SRE workbook shape):
    per 1h bucket, the error share in that bucket AND over the trailing
    6 buckets; the page fires only when BOTH windows burn faster than a
    10% budget — short window for responsiveness, long window to ride out
    blips. Shares are exact integer-count divisions; the burn flag is an
    integer-space comparison (errors*10 > total), never a float epsilon.
    """
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    hourly = (
        ev.select(
            ((es / 3600).cast("long") * 3600).alias("bucket_ts"),
            (F.col("event_type") == "error").cast("long").alias("is_err"),
        )
        .groupBy("bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum("is_err").alias("errors"),
        )
    )
    # Trailing-6h sums via contribute-forward expansion (each hourly row
    # feeds its 6 target buckets, then one hash aggregate) — the same
    # result as a RANGE window ordered by bucket_ts, without funnelling
    # the whole bucket axis through one partition.
    contrib = hourly.select(
        F.explode(
            F.sequence(
                F.col("bucket_ts"), F.col("bucket_ts") + 5 * 3600, F.lit(3600)
            )
        ).alias("t6"),
        "total",
        "errors",
    )
    six = contrib.groupBy("t6").agg(
        F.sum("total").alias("total_6h"), F.sum("errors").alias("errors_6h")
    )
    out = hourly.join(six, hourly.bucket_ts == six.t6).select(
        "bucket_ts", "total", "errors", "total_6h", "errors_6h"
    )
    burn = (
        (F.col("errors") * 10 > F.col("total"))
        & (F.col("errors_6h") * 10 > F.col("total_6h"))
    )
    return out.select(
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        (F.col("errors").cast("double") / F.col("total")).alias("err_rate_1h"),
        (F.col("errors_6h").cast("double") / F.col("total_6h")).alias("err_rate_6h"),
        burn.cast("long").alias("page"),
    )


_BURN_SQL = f"""
WITH hourly AS (
  SELECT (CAST({_ES} AS BIGINT) // 3600) * 3600 AS bucket_ts,
         COUNT(*) AS total,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errors
  FROM events GROUP BY 1
),
win AS (
  SELECT bucket_ts, total, errors,
         SUM(total) OVER (ORDER BY bucket_ts
           RANGE BETWEEN 18000 PRECEDING AND CURRENT ROW) AS total_6h,
         SUM(errors) OVER (ORDER BY bucket_ts
           RANGE BETWEEN 18000 PRECEDING AND CURRENT ROW) AS errors_6h
  FROM hourly
)
SELECT bucket_ts,
       CAST(errors AS DOUBLE) / total AS err_rate_1h,
       CAST(errors_6h AS DOUBLE) / total_6h AS err_rate_6h,
       CAST(errors * 10 > total AND errors_6h * 10 > total_6h AS BIGINT) AS page
FROM win
"""


# --- year-over-year growth ------------------------------------------------

def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation: the board-slide query.
    Revenue is quantized-exact; growth is the difference of two exact
    sums (no ratio — a first-year NULL baseline stays NULL)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    yearly = (
        orders.join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
                    orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("long").alias("yr"))
        .agg(qsum("o_totalprice", "revenue"))
    )
    w = W.partitionBy("nation").orderBy("yr")
    return yearly.select(
        "nation",
        "yr",
        "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        (F.col("revenue") - F.lag("revenue").over(w)).alias("growth"),
    )


_YOY_SQL = f"""
WITH yearly AS (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr,
         {QSUM_SQL.format(x="o.o_totalprice")} AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT nation, yr, revenue,
       LAG(revenue) OVER (PARTITION BY nation ORDER BY yr) AS prev_revenue,
       revenue - LAG(revenue) OVER (PARTITION BY nation ORDER BY yr) AS growth
FROM yearly
"""


# --- RFM quartile scoring --------------------------------------------------

def customer_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, recency (days since last order),
    frequency (order count), monetary (quantized revenue) — each scored
    into quartiles with exact ``NTILE(4)`` semantics. Ties are broken by
    customer key so the quartile assignment is a total order in both
    engines.

    Scale shape: each dimension's global rank comes from
    ``with_global_prefix`` (range repartition + broadcast offsets — no
    unpartitioned-window global sort), and the quartile is the closed-form
    ``ntile_expr(rank, n)`` scan-side. Output is bit-identical to the
    NTILE window the oracle runs."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        qsum("o_totalprice", "monetary"),
    )
    recency = F.datediff(F.lit("1998-12-31").cast("date"), F.col("last_order"))
    base = per_cust.select(
        "custkey",
        recency.cast("long").alias("recency_days"),
        F.col("frequency").cast("long").alias("frequency"),
        "monetary",
    )
    base = with_global_scalars(base, n=F.count(F.lit(1)))
    ranked = with_global_prefix(
        base, [F.asc("recency_days"), F.asc("custkey")], row_number_col="r_rank"
    )
    ranked = with_global_prefix(
        ranked, [F.desc("frequency"), F.asc("custkey")], row_number_col="f_rank"
    )
    ranked = with_global_prefix(
        ranked, [F.desc("monetary"), F.asc("custkey")], row_number_col="m_rank"
    )
    return ranked.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        ntile_expr(F.col("r_rank"), F.col("n"), 4).alias("r_score"),
        ntile_expr(F.col("f_rank"), F.col("n"), 4).alias("f_score"),
        ntile_expr(F.col("m_rank"), F.col("n"), 4).alias("m_score"),
    )


_RFM_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey AS custkey,
         date_diff('day', MAX(o_orderdate), DATE '1998-12-31') AS recency_days,
         COUNT(*) AS frequency,
         {QSUM_SQL.format(x="o_totalprice")} AS monetary
  FROM orders GROUP BY 1
)
SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days,
       CAST(frequency AS BIGINT) AS frequency, monetary,
       CAST(NTILE(4) OVER (ORDER BY recency_days ASC, custkey ASC) AS BIGINT) AS r_score,
       CAST(NTILE(4) OVER (ORDER BY frequency DESC, custkey ASC) AS BIGINT) AS f_score,
       CAST(NTILE(4) OVER (ORDER BY monetary DESC, custkey ASC) AS BIGINT) AS m_score
FROM per_cust
"""


# --- MAD-based robust anomaly flags ---------------------------------------

def tsdb_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly census via Median Absolute Deviation: per metric,
    median and MAD over quantized integer values, then the count of points
    whose deviation exceeds 3 x 1.4826 x MAD — the outlier rule that,
    unlike z-scores, one giant spike cannot poison. The exceedance test
    multiplies out to integer-scaled space: |qv - med_q| > 4.4478 * mad_q
    with both sides exact doubles of integers.
    """
    ev = load_table(spark, sf_dir, "events")
    qv = F.floor(F.col("value") * 1000000).cast("long")
    base = ev.select(F.col("event_type").alias("metric"), qv.alias("qv"))
    med = base.groupBy("metric").agg(F.percentile("qv", 0.5).alias("med_q"))
    dev = base.join(F.broadcast(med), "metric").select(
        "metric", "qv", "med_q", F.abs(F.col("qv") - F.col("med_q")).alias("ad")
    )
    mad = dev.groupBy("metric").agg(
        F.min("med_q").alias("med_q"),
        F.percentile("ad", 0.5).alias("mad_q"),
        F.count(F.lit(1)).alias("n"),
    )
    flagged = (
        dev.drop("med_q")
        .join(F.broadcast(mad.select("metric", "mad_q")), "metric")
        .where(F.col("ad") > F.lit(4.4478) * F.col("mad_q"))
        .groupBy("metric")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
    )
    return (
        mad.join(flagged, "metric", "left")
        .select(
            "metric",
            (F.col("med_q") / 1000000.0).alias("median_value"),
            (F.col("mad_q") / 1000000.0).alias("mad_value"),
            F.col("n").cast("long").alias("n_points"),
            F.coalesce(F.col("n_outliers"), F.lit(0)).cast("long").alias("n_outliers"),
        )
    )


_MAD_SQL = f"""
WITH base AS (
  SELECT event_type AS metric,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS qv
  FROM events
),
med AS (
  SELECT metric, quantile_cont(qv, 0.5) AS med_q FROM base GROUP BY metric
),
dev AS (
  SELECT b.metric, b.qv, m.med_q, abs(b.qv - m.med_q) AS ad
  FROM base b JOIN med m USING (metric)
),
mad AS (
  SELECT metric, MIN(med_q) AS med_q, quantile_cont(ad, 0.5) AS mad_q,
         COUNT(*) AS n
  FROM dev GROUP BY metric
),
flagged AS (
  SELECT d.metric, COUNT(*) AS n_outliers
  FROM dev d JOIN mad m USING (metric)
  WHERE d.ad > 4.4478 * m.mad_q
  GROUP BY d.metric
)
SELECT m.metric,
       m.med_q / 1000000.0 AS median_value,
       m.mad_q / 1000000.0 AS mad_value,
       CAST(m.n AS BIGINT) AS n_points,
       CAST(COALESCE(f.n_outliers, 0) AS BIGINT) AS n_outliers
FROM mad m LEFT JOIN flagged f ON f.metric = m.metric
"""


QUERIES = {
    "tsdb_slo_burn_rate": tsdb_slo_burn_rate,
    "orders_yoy_growth": orders_yoy_growth,
    "customer_rfm_scores": customer_rfm_scores,
    "tsdb_anomaly_mad": tsdb_anomaly_mad,
}

ORACLE = {
    "tsdb_slo_burn_rate": _BURN_SQL,
    "orders_yoy_growth": _YOY_SQL,
    "customer_rfm_scores": _RFM_SQL,
    "tsdb_anomaly_mad": _MAD_SQL,
}
