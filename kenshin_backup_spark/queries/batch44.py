"""Batch-44 queries (round 4): streaming hopping-window rollup.

``streaming_hopping_rollup`` is the streaming leg of
``tsdb_hopping_window`` (SURVEY §2.7 T3: the reference only has tumbling
rollups; sliding windows are a Spark-native capability we surface "for
free"). Each event contributes to its two overlapping 1-hour windows
INSIDE the streaming aggregation state; the memory-sink replay drives
the real micro-batch engine with a watermark, so window expansion +
state handling + completeness semantics are genuinely exercised. The
oracle expands events to their two candidate window starts in SQL —
equality proves the streaming state machine computed the same thing the
batch engine would.

At 100 TB (unbounded): state per key is windows × metrics rows of five
integers; hop expansion happens pipeline-side (Spark's internal Expand,
not a self-union double scan — see `tsdb_hopping_window` in PLANS.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL, QSUM_SQL
from kenshin_backup_spark.queries.streaming_q import _events_stream
from kenshin_backup_spark.streaming.ingest import run_stream_to_memory

_ES = EPOCH_S_SQL.format(x="ts")


def streaming_hopping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows hopping every 30 minutes over the events STREAM,
    complete output mode — must equal the batch hop rollup."""
    stream = _events_stream(spark, sf_dir)
    hopped = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("event_type", F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias("sum_q"),
            F.count(F.lit(1)).alias("n_points"),
        )
    )
    out = run_stream_to_memory(spark, hopped, output_mode="complete")
    return out.select(
        "event_type",
        F.unix_timestamp("w.start").cast("long").alias("window_start"),
        (F.col("sum_q") / F.lit(1e6)).cast("double").alias("sum_value"),
        F.col("n_points").cast("long").alias("n_points"),
    )


_SHOP_SQL = f"""
WITH e AS (
  SELECT event_type, value, CAST({_ES} AS BIGINT) AS es FROM events
),
expanded AS (
  SELECT event_type, value, (es // 1800) * 1800 AS window_start FROM e
  UNION ALL
  SELECT event_type, value, (es // 1800) * 1800 - 1800 AS window_start FROM e
)
SELECT event_type, CAST(window_start AS BIGINT) AS window_start,
       {QSUM_SQL.format(x="value")} AS sum_value,
       COUNT(*) AS n_points
FROM expanded GROUP BY 1, 2
"""


QUERIES = {
    "streaming_hopping_rollup": streaming_hopping_rollup,
}

ORACLE = {
    "streaming_hopping_rollup": _SHOP_SQL,
}
