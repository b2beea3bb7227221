"""Batch-8 queries: wide series pivot (the multi-series render grid),
sortByMaxima ranking, cume_dist, regexp_extract_all family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL, QSUM_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")


def tsdb_wide_series_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graphite's multi-series render shape: one row per time bucket with
    one column per metric (pivot over the fixed metric domain) — quantized
    hourly sums, NULL where a series has no points in the bucket."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.unix_timestamp("ts").cast("long") / 3600).cast("long") * 3600
    q = F.floor(F.col("value") * 1000000).cast("long")
    types = ["click", "purchase", "error", "signup", "view"]
    wide = (
        ev.select(bucket.alias("bucket_ts"), "event_type", q.alias("q"))
        .groupBy("bucket_ts")
        .pivot("event_type", types)
        .agg((F.sum("q") / F.lit(1000000.0)).cast("double"))
    )
    return wide.select(
        "bucket_ts",
        *[F.col(t).alias(f"sum_{t}") for t in types],
    )


_WIDE_SQL = f"""
SELECT CAST(({_ES} // 3600) * 3600 AS BIGINT) AS bucket_ts,
       {QSUM_SQL.format(x="CASE WHEN event_type = 'click' THEN value END")} AS sum_click,
       {QSUM_SQL.format(x="CASE WHEN event_type = 'purchase' THEN value END")} AS sum_purchase,
       {QSUM_SQL.format(x="CASE WHEN event_type = 'error' THEN value END")} AS sum_error,
       {QSUM_SQL.format(x="CASE WHEN event_type = 'signup' THEN value END")} AS sum_signup,
       {QSUM_SQL.format(x="CASE WHEN event_type = 'view' THEN value END")} AS sum_view
FROM events GROUP BY 1
"""


def tsdb_sort_by_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graphite sortByMaxima over the hourly series (seriesfns catalog)."""
    from kenshin_backup_spark.operators.rollup import finalize, rollup_partials
    from kenshin_backup_spark.operators.seriesfns import sort_by_maxima

    ev = load_table(spark, sf_dir, "events").withColumnRenamed("event_type", "metric")
    hourly = finalize(
        rollup_partials(ev, key_cols=["metric"], step_seconds=3600), agg="sum"
    ).select("metric", "bucket_ts", "value")
    return sort_by_maxima(hourly).select(
        "metric", F.col("series_max").cast("double").alias("series_max"),
        F.col("rank").cast("long").alias("rank"),
    )


_SORTMAX_SQL = f"""
WITH hourly AS (
  SELECT event_type AS metric,
         CAST(({_ES} // 3600) * 3600 AS BIGINT) AS bucket_ts,
         {QSUM_SQL.format(x="value")} AS value
  FROM events GROUP BY 1, 2
),
mx AS (SELECT metric, MAX(value) AS series_max FROM hourly GROUP BY metric)
SELECT metric, series_max,
       CAST(ROW_NUMBER() OVER (ORDER BY series_max DESC, metric ASC) AS BIGINT) AS rank
FROM mx
"""


def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist over order totals within each priority (exact ratio of
    counts — deterministic)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        "o_orderpriority",
        F.cume_dist().over(w).cast("double").alias("cd"),
    )


_CUME_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(CUME_DIST() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS DOUBLE) AS cd
FROM orders
"""


def scalar_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all family: all digit groups in part names/brands,
    joined sorted for engine-portable ordering."""
    part = load_table(spark, sf_dir, "part")
    nums = F.regexp_extract_all(F.concat_ws(" ", "p_brand", "p_type", "p_name"), F.lit(r"(\d+)"))
    return part.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.array_join(F.sort_array(nums), ",").alias("all_numbers"),
        F.size(nums).cast("long").alias("n_numbers"),
    )


_REX_ALL_SQL = """
SELECT p_partkey,
       array_to_string(list_sort(regexp_extract_all(
         p_brand || ' ' || p_type || ' ' || p_name, '(\\d+)')), ',') AS all_numbers,
       CAST(len(regexp_extract_all(
         p_brand || ' ' || p_type || ' ' || p_name, '(\\d+)')) AS BIGINT) AS n_numbers
FROM part
"""


QUERIES = {
    "tsdb_wide_series_grid": tsdb_wide_series_grid,
    "tsdb_sort_by_maxima": tsdb_sort_by_maxima,
    "window_cume_dist": window_cume_dist,
    "scalar_regexp_extract_all": scalar_regexp_extract_all,
}

ORACLE = {
    "tsdb_wide_series_grid": _WIDE_SQL,
    "tsdb_sort_by_maxima": _SORTMAX_SQL,
    "window_cume_dist": _CUME_SQL,
    "scalar_regexp_extract_all": _REX_ALL_SQL,
}
