"""Batch-54 queries (round 4): table-maintenance + robust-trend tier.

- ``layout_compaction_plan`` — the small-file compaction planner every
  large parquet lake needs: given a file inventory (simulated here as one
  "file" per (return-flag, ship-month) lineitem slice, sized at 128 B/row),
  coalesce consecutive files into target-size compaction groups via a
  partitioned prefix sum: ``bin = floor((cumsum - size) / TARGET)``. This
  is the sequential first-fit plan a compactor executes; the prefix sum
  windows on the partition key (return-flag), never globally.
- ``incremental_rollup_merge`` — incremental materialized-view
  maintenance: the hourly (sum,count) rollup state built from all days
  BEFORE the latest day, merged with the latest day's delta by integer
  addition, must equal the from-scratch rollup. The oracle IS the direct
  recompute, so the hash match is a proof of mergeability (the
  time-increment analogue of ``tsdb_histogram_shard_merge``'s
  shard-dimension proof). The latest-day boundary is a broadcast scalar
  (1-row aggregate cross-joined), not a driver collect.
- ``tsdb_theilsen_trend`` — Theil–Sen robust trend: the median of all
  pairwise slopes over each metric's last 24 hourly grid points. Pairwise
  slopes are O(N²) per metric but N is capped at 24 (≤276 pairs), so the
  self-join is bounded per group and shuffles only on the metric key.
  Slopes are floor-quantized AFTER a single double division (identical
  IEEE op both engines); the median picks explicit row positions
  (row_number vs count) rather than engine-native median, so the
  even-count interpolation is the same arithmetic in both engines.

Scale notes (100 TB): all three plans shuffle on their natural partition
keys (return-flag, metric/hour, metric); prefix sums and rankings window
within those keys only. No global sort, no driver loop, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kenshin_backup_spark.cache import persist_tracked
from kenshin_backup_spark.functions.deterministic import (
    EPOCH_S_SQL,
    QAVG_SQL,
    qavg,
)
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")

#: Compaction target bytes per output file group (sized so the sf0.001
#: inventory still produces multi-file bins).
TARGET_BYTES = 16_384
ROW_BYTES = 128


def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction groups via partitioned prefix-sum bin packing."""
    li = load_table(spark, sf_dir, "lineitem")
    files = li.groupBy(
        F.col("l_returnflag").alias("retflag"),
        (F.year("l_shipdate") * 100 + F.month("l_shipdate")).alias("ym"),
    ).agg((F.count(F.lit(1)) * ROW_BYTES).alias("size_bytes"))
    w = (
        Window.partitionBy("retflag")
        .orderBy("ym")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    planned = files.withColumn(
        "bin",
        F.floor(
            (F.sum("size_bytes").over(w) - F.col("size_bytes"))
            / F.lit(TARGET_BYTES)
        ).cast("long"),
    )
    return (
        planned.groupBy("retflag", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("size_bytes").alias("bin_bytes"),
        )
        .select(
            "retflag",
            "bin",
            F.col("n_files").cast("long").alias("n_files"),
            F.col("bin_bytes").cast("long").alias("bin_bytes"),
        )
    )


_COMPACT_SQL = f"""
WITH files AS (
  SELECT l_returnflag AS retflag,
         year(l_shipdate) * 100 + month(l_shipdate) AS ym,
         COUNT(*) * {ROW_BYTES} AS size_bytes
  FROM lineitem GROUP BY 1, 2
),
planned AS (
  SELECT retflag, size_bytes,
         CAST(FLOOR((SUM(size_bytes) OVER (PARTITION BY retflag ORDER BY ym
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - size_bytes) / {TARGET_BYTES}.0) AS BIGINT) AS bin
  FROM files
)
SELECT retflag, bin, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(size_bytes) AS BIGINT) AS bin_bytes
FROM planned GROUP BY 1, 2
"""


def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup state + latest-day delta merged == full recompute."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    pts = ev.select(
        F.col("event_type").alias("metric"),
        (es - es % 3600).alias("h"),
        (es - es % 86400).alias("day"),
        F.floor(F.col("value") * 1_000_000).cast("long").alias("vq"),
    )
    latest = pts.agg(F.max("day").alias("dmax"))
    tagged = pts.crossJoin(F.broadcast(latest))
    part = (
        tagged.groupBy(
            "metric", "h", (F.col("day") == F.col("dmax")).alias("is_delta")
        )
        .agg(F.sum("vq").alias("s"), F.count(F.lit(1)).alias("c"))
    )
    # State + delta merge by integer addition — associative, so the merged
    # frame hash-equals the oracle's direct recompute.
    return (
        part.groupBy("metric", "h")
        .agg(F.sum("s").alias("s"), F.sum("c").alias("c"))
        .select(
            "metric",
            F.col("h").cast("long").alias("bucket_ts"),
            F.col("c").cast("long").alias("n_points"),
            (F.col("s") / F.lit(1_000_000.0) / F.col("c"))
            .cast("double")
            .alias("avg_v"),
        )
    )


_INCR_SQL = f"""
SELECT event_type AS metric,
       CAST(({_ES} // 3600) * 3600 AS BIGINT) AS bucket_ts,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       {QAVG_SQL.format(x="value")} AS avg_v
FROM events GROUP BY 1, 2
"""


#: Theil–Sen: last N grid points per metric; quantized slope scale.
TS_N = 24
SLOPE_SCALE = 1_000


def tsdb_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median pairwise slope (per hour) over each metric's trailing grid."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    grid = (
        ev.select(
            F.col("event_type").alias("metric"),
            (es - es % 3600).alias("h"),
            "value",
        )
        .groupBy("metric", "h")
        .agg(qavg("value", "v"))
    )
    w_recent = Window.partitionBy("metric").orderBy(F.desc("h"))
    recent = (
        grid.withColumn("rn", F.row_number().over(w_recent))
        .where(F.col("rn") <= TS_N)
        .select("metric", (F.col("h") / 3600).cast("long").alias("idx"), "v")
        # persist: grid agg + rank window feed both sides of the slope
        # pair join (house persist rule)
        .transform(persist_tracked)
    )
    a, b = recent.alias("a"), recent.alias("b")
    slopes = a.join(
        b,
        (F.col("a.metric") == F.col("b.metric"))
        & (F.col("a.idx") < F.col("b.idx")),
    ).select(
        F.col("a.metric").alias("metric"),
        F.col("a.idx").alias("ia"),
        F.col("b.idx").alias("ib"),
        F.floor(
            F.lit(float(SLOPE_SCALE))
            * (F.col("b.v") - F.col("a.v"))
            / (F.col("b.idx") - F.col("a.idx")).cast("double")
        )
        .cast("long")
        .alias("sq"),
    )
    w_rank = Window.partitionBy("metric").orderBy("sq", "ia", "ib")
    w_cnt = Window.partitionBy("metric")
    ranked = slopes.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "n", F.count(F.lit(1)).over(w_cnt)
    )
    mid = ranked.where(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor(F.col("n") / 2) + 1)
    )
    return mid.groupBy("metric").agg(
        F.max("n").cast("long").alias("n_pairs"),
        (F.sum("sq") / F.count(F.lit(1)) / F.lit(float(SLOPE_SCALE)))
        .cast("double")
        .alias("median_slope"),
    )


_THEILSEN_SQL = f"""
WITH grid AS (
  SELECT event_type AS metric, CAST(({_ES} // 3600) * 3600 AS BIGINT) AS h,
         {QAVG_SQL.format(x="value")} AS v
  FROM events GROUP BY 1, 2
),
recent AS (
  SELECT metric, CAST(h // 3600 AS BIGINT) AS idx, v
  FROM (SELECT metric, h, v,
               ROW_NUMBER() OVER (PARTITION BY metric ORDER BY h DESC) AS rn
        FROM grid)
  WHERE rn <= {TS_N}
),
slopes AS (
  SELECT a.metric, a.idx AS ia, b.idx AS ib,
         CAST(FLOOR({SLOPE_SCALE}.0 * (b.v - a.v)
                    / CAST(b.idx - a.idx AS DOUBLE)) AS BIGINT) AS sq
  FROM recent a JOIN recent b ON a.metric = b.metric AND a.idx < b.idx
),
ranked AS (
  SELECT metric, sq,
         ROW_NUMBER() OVER (PARTITION BY metric ORDER BY sq, ia, ib) AS rn,
         COUNT(*) OVER (PARTITION BY metric) AS n
  FROM slopes
)
SELECT metric, CAST(MAX(n) AS BIGINT) AS n_pairs,
       CAST(SUM(sq) / COUNT(*) / {SLOPE_SCALE}.0 AS DOUBLE) AS median_slope
FROM ranked
WHERE rn = FLOOR((n + 1) / 2) OR rn = FLOOR(n / 2) + 1
GROUP BY metric
"""


QUERIES = {
    "layout_compaction_plan": layout_compaction_plan,
    "incremental_rollup_merge": incremental_rollup_merge,
    "tsdb_theilsen_trend": tsdb_theilsen_trend,
}

ORACLE = {
    "layout_compaction_plan": _COMPACT_SQL,
    "incremental_rollup_merge": _INCR_SQL,
    "tsdb_theilsen_trend": _THEILSEN_SQL,
}
