"""Batch-34 queries (round 3): seasonal-residual anomaly ranking,
year-over-year brand share shift, and discount-band effectiveness — the
BI-diagnostics family (profile → residual → rank; share → delta; bin →
lift), all integer-exact and oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")


# --- seasonal residual anomalies --------------------------------------------

def events_seasonal_residual_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 seasonal-residual anomalies per the classic profile method:
    per (metric, hour-of-day) mean as the seasonal profile, residual =
    value − profile, rank by |residual| (ties → event_id) and keep the
    global top 20. Residuals are quantized-integer differences of exact
    sums — deterministic ranking in both engines.

    At 100 TB: the profile is a tiny (metric × 24) aggregate joined back
    broadcast; one scan, one small shuffle, one global top-k (partial
    TakeOrdered map-side).
    """
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    vq = F.floor(F.col("value") * 1_000_000).cast("long")
    base = ev.select(
        F.col("event_type").alias("metric"),
        es.alias("es"),
        F.col("event_id"),
        vq.alias("vq"),
        F.pmod((es / 3600).cast("long"), F.lit(24)).alias("hod"),
    )
    prof = base.groupBy("metric", "hod").agg(
        F.sum("vq").alias("s"), F.count("vq").alias("c")
    )
    joined = base.join(F.broadcast(prof), ["metric", "hod"])
    # residual_q = vq − floor(mean_q): integer; |residual| ranking total-ordered
    resid = (F.col("vq") - F.floor(F.col("s") / F.col("c"))).cast("long")
    # Global top-k via orderBy().limit() → TakeOrderedAndProject: each task
    # keeps its local top 20, the driver merges — no single-partition sort.
    top = (
        joined.withColumn("residual_q", resid)
        .orderBy(F.abs(F.col("residual_q")).desc(), F.asc("event_id"))
        .limit(20)
    )
    w = W.orderBy(F.abs(F.col("residual_q")).desc(), F.asc("event_id"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "rank",
            "metric",
            F.col("event_id").cast("long").alias("event_id"),
            "es",
            (F.col("vq") / 1_000_000.0).cast("double").alias("value"),
            "residual_q",
        )
    )


_SEASONAL_SQL = f"""
WITH base AS (
  SELECT event_type AS metric,
         CAST({_ES} AS BIGINT) AS es,
         event_id,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS vq,
         CAST({_ES} AS BIGINT) // 3600 % 24 AS hod
  FROM events
),
prof AS (
  SELECT metric, hod, SUM(vq) AS s, COUNT(vq) AS c
  FROM base GROUP BY 1, 2
),
resid AS (
  SELECT b.metric, b.es, b.event_id, b.vq,
         CAST(b.vq - FLOOR(CAST(p.s AS DOUBLE) / p.c) AS BIGINT) AS residual_q
  FROM base b JOIN prof p ON p.metric = b.metric AND p.hod = b.hod
)
SELECT CAST(rank AS BIGINT) AS rank, metric, event_id, es,
       CAST(vq / 1000000.0 AS DOUBLE) AS value, residual_q
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY ABS(residual_q) DESC, event_id ASC) AS rank
  FROM resid
) t WHERE rank <= 20
"""


# --- year-over-year brand share shift ---------------------------------------

def part_brand_share_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand share of revenue per order-year, with the share-point change
    vs the prior year (the BI "who is winning" table). Revenue is
    quantized-integer; shares are exact divisions of exact sums; the YoY
    delta is a lag window per brand."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    rev_q = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    j = (
        li.join(orders.select("o_orderkey", F.year("o_orderdate").alias("yr")),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part.select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
    )
    brand_yr = j.groupBy("yr", "p_brand").agg(F.sum(rev_q).alias("rev_q"))
    tot_yr = brand_yr.groupBy("yr").agg(F.sum("rev_q").alias("tot_q"))
    shared = brand_yr.join(F.broadcast(tot_yr), "yr").withColumn(
        "share", (F.col("rev_q") / F.col("tot_q")).cast("double")
    )
    w = W.partitionBy("p_brand").orderBy("yr")
    return shared.select(
        F.col("yr").cast("long").alias("yr"),
        F.col("p_brand").alias("brand"),
        F.col("rev_q").cast("long").alias("rev_q"),
        "share",
        (F.col("share") - F.lag("share").over(w)).cast("double").alias("share_delta"),
    )


_SHARE_SQL = """
WITH j AS (
  SELECT EXTRACT(year FROM o.o_orderdate) AS yr, p.p_brand,
         CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) AS rq
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
),
brand_yr AS (SELECT yr, p_brand, SUM(rq) AS rev_q FROM j GROUP BY 1, 2),
tot_yr AS (SELECT yr, SUM(rev_q) AS tot_q FROM brand_yr GROUP BY 1),
shared AS (
  SELECT b.yr, b.p_brand, b.rev_q,
         CAST(b.rev_q AS DOUBLE) / t.tot_q AS share
  FROM brand_yr b JOIN tot_yr t ON t.yr = b.yr
)
SELECT CAST(yr AS BIGINT) AS yr, p_brand AS brand,
       CAST(rev_q AS BIGINT) AS rev_q, share,
       CAST(share - LAG(share) OVER (PARTITION BY p_brand ORDER BY yr)
            AS DOUBLE) AS share_delta
FROM shared
"""


# --- discount-band effectiveness --------------------------------------------

def lineitem_discount_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demand lift by discount band: bucket line items into 1-percent
    discount bands, report each band's average quantity as an exact
    rational (sum_q / n) and its lift vs the zero-discount band — the
    price-elasticity diagnostic. All sums integer-quantized."""
    li = load_table(spark, sf_dir, "lineitem")
    band = F.floor(F.col("l_discount") * 100).cast("long")
    qq = F.floor(F.col("l_quantity") * 100).cast("long")
    per_band = (
        li.select(band.alias("band"), qq.alias("qq"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("qq").alias("sum_q"))
        .withColumn("avg_qty", (F.col("sum_q") / F.col("n") / 100.0).cast("double"))
    )
    base = per_band.where(F.col("band") == 0).select(
        F.col("avg_qty").alias("base_avg")
    )
    return (
        per_band.crossJoin(F.broadcast(base))
        .select(
            F.col("band").cast("long").alias("band"),
            F.col("n").cast("long").alias("n"),
            "avg_qty",
            (F.col("avg_qty") / F.col("base_avg")).cast("double").alias("lift_vs_zero"),
        )
    )


_DISCOUNT_SQL = """
WITH per_band AS (
  SELECT CAST(FLOOR(l_discount * 100) AS BIGINT) AS band,
         COUNT(*) AS n,
         SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS sum_q
  FROM lineitem GROUP BY 1
),
withavg AS (
  SELECT band, n, CAST(sum_q AS DOUBLE) / n / 100.0 AS avg_qty FROM per_band
),
base AS (SELECT avg_qty AS base_avg FROM withavg WHERE band = 0)
SELECT w.band, CAST(w.n AS BIGINT) AS n, w.avg_qty,
       CAST(w.avg_qty / b.base_avg AS DOUBLE) AS lift_vs_zero
FROM withavg w CROSS JOIN base b
"""


QUERIES = {
    "events_seasonal_residual_anomalies": events_seasonal_residual_anomalies,
    "part_brand_share_shift": part_brand_share_shift,
    "lineitem_discount_effectiveness": lineitem_discount_effectiveness,
}

ORACLE = {
    "events_seasonal_residual_anomalies": _SEASONAL_SQL,
    "part_brand_share_shift": _SHARE_SQL,
    "lineitem_discount_effectiveness": _DISCOUNT_SQL,
}
