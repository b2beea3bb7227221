"""Batch-60 query (round 4): ensemble anomaly voting.

``tsdb_anomaly_ensemble`` — the production practice on top of the three
registered single-detector censuses (z-score / MAD / Tukey): all three
rules evaluated at the SAME grain (per-metric hourly sums) and combined
by vote. A bucket flagged by ≥ 2 of the 3 detectors is an ensemble
anomaly — robust to each rule's blind spot (z-scores get poisoned by
the spike itself, MAD collapses on half-constant series, Tukey fences
assume mild skew). Output: every bucket any detector flagged, with the
per-detector flags, the vote count, and the ensemble verdict.

Determinism: hourly sums are exact BIGINTs (Σ floor(v·1e3)); z uses
integer moments; MAD/Tukey use interpolated percentiles over integer
lists (Spark ``percentile`` ≡ DuckDB ``quantile_cont`` — same linear
interpolation at (n−1)p, proven by the existing single-detector
queries); every flag is an integer comparison of identically-derived
doubles.

Scale notes (100 TB): one shuffle to the (metric, hour) grain, then
per-metric broadcast stats joins — the detector stats frames are
|metrics| rows each. No global window, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")

#: Ensemble threshold: flagged by at least 2 of the 3 detectors.
MIN_VOTES = 2


def tsdb_anomaly_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket 3-detector vote (see module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    hourly = (
        ev.select(
            F.col("event_type").alias("metric"),
            (es - es % 3600).alias("bucket_ts"),
            F.floor(F.col("value") * 1000).cast("long").alias("q3v"),
        )
        .groupBy("metric", "bucket_ts")
        .agg(F.sum("q3v").alias("bq"))
    )
    stats = hourly.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bq").alias("s1"),
        F.sum(F.col("bq") * F.col("bq")).alias("s2"),
        F.percentile("bq", 0.5).alias("med"),
        F.percentile("bq", 0.25).alias("p25"),
        F.percentile("bq", 0.75).alias("p75"),
    )
    dev = hourly.join(F.broadcast(stats), "metric").withColumn(
        "ad", F.abs(F.col("bq") - F.col("med"))
    )
    mad = dev.groupBy("metric").agg(F.percentile("ad", 0.5).alias("mad"))
    j = dev.join(F.broadcast(mad), "metric")
    mean = F.col("s1").cast("double") / F.col("n").cast("double")
    var = (F.col("s2").cast("double") / F.col("n").cast("double")) - mean * mean
    flag_z = F.when(
        (var > 0)
        & (F.abs(F.col("bq").cast("double") - mean) > 2.0 * F.sqrt(var)),
        1,
    ).otherwise(0)
    flag_mad = F.when(
        F.col("ad") > F.lit(4.4478) * F.col("mad"), 1
    ).otherwise(0)
    iqr = F.col("p75") - F.col("p25")
    flag_tukey = F.when(
        (F.col("bq") < F.col("p25") - 1.5 * iqr)
        | (F.col("bq") > F.col("p75") + 1.5 * iqr),
        1,
    ).otherwise(0)
    scored = j.select(
        "metric",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        (F.col("bq").cast("double") / 1000.0).alias("bucket_sum"),
        flag_z.cast("long").alias("flag_z"),
        flag_mad.cast("long").alias("flag_mad"),
        flag_tukey.cast("long").alias("flag_tukey"),
    ).withColumn(
        "votes",
        (F.col("flag_z") + F.col("flag_mad") + F.col("flag_tukey")).cast(
            "long"
        ),
    )
    return scored.where(F.col("votes") >= 1).withColumn(
        "is_ensemble_anomaly",
        (F.col("votes") >= MIN_VOTES).cast("long"),
    )


_ENSEMBLE_SQL = f"""
WITH hourly AS (
  SELECT event_type AS metric,
         CAST(({_ES} // 3600) * 3600 AS BIGINT) AS bucket_ts,
         SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS bq
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT metric, COUNT(*) AS n, SUM(bq) AS s1, SUM(bq * bq) AS s2,
         quantile_cont(bq, 0.5) AS med,
         quantile_cont(bq, 0.25) AS p25,
         quantile_cont(bq, 0.75) AS p75
  FROM hourly GROUP BY 1
),
dev AS (
  SELECT h.*, s.n, s.s1, s.s2, s.med, s.p25, s.p75,
         abs(h.bq - s.med) AS ad
  FROM hourly h JOIN stats s USING (metric)
),
mad AS (
  SELECT metric, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY 1
),
scored AS (
  SELECT d.metric, d.bucket_ts,
         CAST(d.bq AS DOUBLE) / 1000.0 AS bucket_sum,
         CASE WHEN (CAST(s2 AS DOUBLE) / n) - (CAST(s1 AS DOUBLE) / n)
                   * (CAST(s1 AS DOUBLE) / n) > 0
               AND abs(CAST(d.bq AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
                   > 2.0 * sqrt((CAST(s2 AS DOUBLE) / n)
                                - (CAST(s1 AS DOUBLE) / n)
                                  * (CAST(s1 AS DOUBLE) / n))
              THEN 1 ELSE 0 END AS flag_z,
         CASE WHEN d.ad > 4.4478 * m.mad THEN 1 ELSE 0 END AS flag_mad,
         CASE WHEN d.bq < d.p25 - 1.5 * (d.p75 - d.p25)
                OR d.bq > d.p75 + 1.5 * (d.p75 - d.p25)
              THEN 1 ELSE 0 END AS flag_tukey
  FROM dev d JOIN mad m USING (metric)
)
SELECT metric, bucket_ts, bucket_sum,
       CAST(flag_z AS BIGINT) AS flag_z,
       CAST(flag_mad AS BIGINT) AS flag_mad,
       CAST(flag_tukey AS BIGINT) AS flag_tukey,
       CAST(flag_z + flag_mad + flag_tukey AS BIGINT) AS votes,
       CAST(CASE WHEN flag_z + flag_mad + flag_tukey >= {MIN_VOTES}
                 THEN 1 ELSE 0 END AS BIGINT) AS is_ensemble_anomaly
FROM scored
WHERE flag_z + flag_mad + flag_tukey >= 1
"""


QUERIES = {
    "tsdb_anomaly_ensemble": tsdb_anomaly_ensemble,
}

ORACLE = {
    "tsdb_anomaly_ensemble": _ENSEMBLE_SQL,
}
