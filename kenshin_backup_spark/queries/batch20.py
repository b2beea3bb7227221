"""Batch-20 queries: Tukey-fence outlier detection on exact quartiles,
gaps-and-islands run analysis, and the split_part/array-edit scalar
family.

Quartiles use the exact interpolating percentile in both engines
(Spark ``percentile`` ↔ DuckDB ``quantile_cont`` — parity proven for the
median by agg_median_quantity); fences and flags are then identical
doubles/integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")


# --- Tukey-fence outliers --------------------------------------------------

def tsdb_tukey_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric IQR outlier census: exact q1/q3, fences at ±1.5·IQR,
    counts of values outside — the robust (quantile-based) cousin of the
    z-score alert."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy(F.col("event_type").alias("metric")).agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
        F.count("value").alias("n"),
    )
    joined = ev.select(F.col("event_type").alias("metric"), "value").join(
        F.broadcast(stats), "metric"
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - 1.5 * iqr
    hi = F.col("q3") + 1.5 * iqr
    return (
        joined.groupBy("metric")
        .agg(
            F.first("q1").alias("q1"),
            F.first("q3").alias("q3"),
            F.sum((F.col("value") < lo).cast("long")).alias("n_low_outliers"),
            F.sum((F.col("value") > hi).cast("long")).alias("n_high_outliers"),
            F.count("value").alias("n"),
        )
        .select(
            "metric",
            F.col("q1").cast("double").alias("q1"),
            F.col("q3").cast("double").alias("q3"),
            F.col("n_low_outliers").cast("long").alias("n_low_outliers"),
            F.col("n_high_outliers").cast("long").alias("n_high_outliers"),
            F.col("n").cast("long").alias("n"),
        )
    )


_TUKEY_SQL = """
WITH stats AS (
  SELECT event_type AS metric,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY 1
)
SELECT e.event_type AS metric,
       CAST(q1 AS DOUBLE) AS q1, CAST(q3 AS DOUBLE) AS q3,
       CAST(SUM(CASE WHEN value < q1 - 1.5 * (q3 - q1) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_outliers,
       CAST(SUM(CASE WHEN value > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high_outliers,
       COUNT(value) AS n
FROM events e JOIN stats s ON e.event_type = s.metric
GROUP BY 1, 2, 3
"""


# --- gaps and islands ------------------------------------------------------

def tsdb_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous hourly runs per metric (the gaps-and-islands idiom:
    bucket_index − row_number is constant within a run). Output one row
    per island with its span and size."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    buckets = (
        ev.select(
            F.col("event_type").alias("metric"),
            (es / 3600).cast("long").alias("b"),
        )
        .distinct()
    )
    w = W.partitionBy("metric").orderBy("b")
    islanded = buckets.withColumn(
        "island", F.col("b") - F.row_number().over(w)
    )
    return (
        islanded.groupBy("metric", "island")
        .agg(
            (F.min("b") * 3600).cast("long").alias("island_start_ts"),
            (F.max("b") * 3600).cast("long").alias("island_end_ts"),
            F.count(F.lit(1)).alias("n_hours"),
        )
        .drop("island")
    )


_ISLANDS_SQL = f"""
WITH buckets AS (
  SELECT DISTINCT event_type AS metric, CAST({_ES} AS BIGINT) // 3600 AS b
  FROM events
), islanded AS (
  SELECT metric, b,
         b - ROW_NUMBER() OVER (PARTITION BY metric ORDER BY b) AS island
  FROM buckets
)
SELECT metric,
       MIN(b) * 3600 AS island_start_ts,
       MAX(b) * 3600 AS island_end_ts,
       COUNT(*) AS n_hours
FROM islanded GROUP BY metric, island
"""


# --- split_part / array-edit family ---------------------------------------

def scalar_split_part_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split_part, array_position, array_remove, array slice-edit — the
    list-surgery surface over the dot-namespace arrays the metric
    hierarchy produces."""
    part = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return part.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.array_position(words, F.element_at(words, 1)).cast("long").alias("first_pos"),
        F.size(F.array_remove(words, F.element_at(words, 1))).cast("long").alias("n_after_remove"),
        F.array_join(F.slice(words, 1, 2), "_").alias("head2"),
    )


_SPLITPART_SQL = """
SELECT p_partkey,
       split_part(p_type, ' ', 1) AS type_head,
       CAST(list_position(str_split(p_name, ' '), str_split(p_name, ' ')[1]) AS BIGINT)
         AS first_pos,
       CAST(len(list_filter(str_split(p_name, ' '),
                x -> x <> str_split(p_name, ' ')[1])) AS BIGINT) AS n_after_remove,
       array_to_string(str_split(p_name, ' ')[1:2], '_') AS head2
FROM part
"""


QUERIES = {
    "tsdb_tukey_outliers": tsdb_tukey_outliers,
    "tsdb_gap_islands": tsdb_gap_islands,
    "scalar_split_part_family": scalar_split_part_family,
}

ORACLE = {
    "tsdb_tukey_outliers": _TUKEY_SQL,
    "tsdb_gap_islands": _ISLANDS_SQL,
    "scalar_split_part_family": _SPLITPART_SQL,
}
