"""Batch-47 queries (round 4): counter wraparound rates and min/max-pair
downsampling.

- ``tsdb_counter_rate_wrap`` — Prometheus-style counter rate with
  WRAPAROUND correction: a monotone counter stored in k bits wraps to 0
  at 2^k, and the correct per-interval delta is ``(c₂ − c₁ + 2^k) mod
  2^k``. The monotone counter is constructed from the events stream as a
  per-metric running value sum (integer-quantized, partitioned window),
  wrapped at 2^20 — both engines build the identical series, so the
  corrected rates are engine-exact. Complements ``tsdb_rate_irate``
  (which treats decreases as resets, the Graphite semantic).
- ``tsdb_downsample_minmax_pairs`` — the other standard dashboard
  downsampler: per bucket keep BOTH extremes with their timestamps
  (arg-min/arg-max via struct ordering, house tie-break rules), so
  rendered envelopes never miss a spike. Unlike LTTB this is pure
  keyed aggregation — fully oracle-checked, and at 100 TB it is one
  partial-aggregated pass, mergeable across shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")

_WRAP_BITS = 20
_WRAP = 1 << _WRAP_BITS


def tsdb_counter_rate_wrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap-corrected instantaneous rate over a synthetic 20-bit counter
    (value sums quantized to integer units) — one partitioned cumulative
    window to build the counter, one lag to rate it."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    base = ev.select(
        "event_type",
        es.alias("es"),
        F.floor(F.col("value")).cast("long").alias("qv"),
        F.col("event_id").cast("long").alias("event_id"),
    )
    w_cum = (
        W.partitionBy("event_type")
        .orderBy("es", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    counter = base.withColumn(
        "c", F.pmod(F.sum("qv").over(w_cum), F.lit(_WRAP))
    )
    w_lag = W.partitionBy("event_type").orderBy("es", "event_id")
    lagged = counter.select(
        "event_type",
        "es",
        "event_id",
        "c",
        F.lag("c").over(w_lag).alias("c_prev"),
        F.lag("es").over(w_lag).alias("es_prev"),
    ).where(F.col("c_prev").isNotNull() & (F.col("es") > F.col("es_prev")))
    delta = F.pmod(F.col("c") - F.col("c_prev") + F.lit(_WRAP), F.lit(_WRAP))
    rate = delta.cast("double") / (F.col("es") - F.col("es_prev")).cast("double")
    out = lagged.select(
        "event_type",
        delta.alias("delta"),
        rate.alias("rate"),
        (F.col("c") < F.col("c_prev")).cast("int").alias("wrapped"),
    )
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("delta").cast("long").alias("total_delta"),
        F.sum("wrapped").cast("long").alias("n_wraps"),
        F.max("rate").alias("max_rate"),
    )


_WRAP_SQL = f"""
WITH base AS (
  SELECT event_type, CAST({_ES} AS BIGINT) AS es,
         CAST(FLOOR(value) AS BIGINT) AS qv, event_id
  FROM events
),
counter AS (
  SELECT event_type, es, event_id,
         SUM(qv) OVER (PARTITION BY event_type ORDER BY es, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           % {_WRAP} AS c
  FROM base
),
lagged AS (
  SELECT event_type, es, c,
         LAG(c) OVER (PARTITION BY event_type ORDER BY es, event_id) AS c_prev,
         LAG(es) OVER (PARTITION BY event_type ORDER BY es, event_id) AS es_prev
  FROM counter
),
rated AS (
  SELECT event_type,
         (c - c_prev + {_WRAP}) % {_WRAP} AS delta,
         CAST((c - c_prev + {_WRAP}) % {_WRAP} AS DOUBLE)
           / CAST(es - es_prev AS DOUBLE) AS rate,
         CASE WHEN c < c_prev THEN 1 ELSE 0 END AS wrapped
  FROM lagged
  WHERE c_prev IS NOT NULL AND es > es_prev
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(delta) AS BIGINT) AS total_delta,
       CAST(SUM(wrapped) AS BIGINT) AS n_wraps,
       MAX(rate) AS max_rate
FROM rated GROUP BY 1
"""


_MM_STEP = 3600


def tsdb_downsample_minmax_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (metric, hour): both extremes with their timestamps.
    arg-min/arg-max via struct ordering — ties break deterministically
    toward (earlier value, later ts) exactly as the SQL mirror does."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    base = ev.select(
        "event_type",
        ((es / _MM_STEP).cast("long") * _MM_STEP).alias("bucket_ts"),
        es.alias("es"),
        "value",
    )
    # struct(value, es): min → lowest value, earliest ts on ties;
    # max → highest value, latest ts on ties
    return base.groupBy("event_type", "bucket_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.min(F.struct(F.col("value").alias("v"), F.col("es").alias("t")))["v"].alias(
            "min_value"
        ),
        F.min(F.struct(F.col("value").alias("v"), F.col("es").alias("t")))["t"]
        .cast("long")
        .alias("min_es"),
        F.max(F.struct(F.col("value").alias("v"), F.col("es").alias("t")))["v"].alias(
            "max_value"
        ),
        F.max(F.struct(F.col("value").alias("v"), F.col("es").alias("t")))["t"]
        .cast("long")
        .alias("max_es"),
    )


_MM_SQL = f"""
WITH base AS (
  SELECT event_type,
         CAST(({_ES} // {_MM_STEP}) * {_MM_STEP} AS BIGINT) AS bucket_ts,
         CAST({_ES} AS BIGINT) AS es, value
  FROM events
),
ranked AS (
  SELECT event_type, bucket_ts, es, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, bucket_ts
                            ORDER BY value ASC, es ASC) AS rlo,
         ROW_NUMBER() OVER (PARTITION BY event_type, bucket_ts
                            ORDER BY value DESC, es DESC) AS rhi
  FROM base
)
SELECT event_type, bucket_ts,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       MIN(CASE WHEN rlo = 1 THEN value END) AS min_value,
       CAST(MIN(CASE WHEN rlo = 1 THEN es END) AS BIGINT) AS min_es,
       MIN(CASE WHEN rhi = 1 THEN value END) AS max_value,
       CAST(MIN(CASE WHEN rhi = 1 THEN es END) AS BIGINT) AS max_es
FROM ranked GROUP BY 1, 2
"""


QUERIES = {
    "tsdb_counter_rate_wrap": tsdb_counter_rate_wrap,
    "tsdb_downsample_minmax_pairs": tsdb_downsample_minmax_pairs,
}

ORACLE = {
    "tsdb_counter_rate_wrap": _WRAP_SQL,
    "tsdb_downsample_minmax_pairs": _MM_SQL,
}
