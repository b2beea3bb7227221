"""Batch-11 queries: stream-stream join (the last uncovered Structured
Streaming join class), batch hopping/sliding windows, value histograms,
and numeric RANGE frames.

The stream-stream join runs a REAL micro-batch join with watermarks on
both sides and a time-band join condition, driven to completion with
availableNow — over bounded input its result equals the batch time-band
join, so it gets a full DuckDB oracle (the driver's strongest check, rare
for streaming operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import (
    EPOCH_S_SQL,
    QSUM_SQL,
    qsum,
)
from kenshin_backup_spark.queries.streaming_q import _events_stream
from kenshin_backup_spark.sources import load_table
from kenshin_backup_spark.streaming.ingest import run_stream_to_memory

_ES = EPOCH_S_SQL.format(x="ts")


# --- stream-stream join (§2.7 J7, stream×stream leg) ----------------------

def streaming_purchase_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases joined to the same user's clicks in the preceding 30
    minutes — two watermarked streams, inner join with an event-time band.
    Spark buffers both sides in state and expires rows past the watermark;
    at scale state size is bounded by (watermark horizon × arrival rate),
    NOT the stream length, and the join shuffles both sides on user_id.

    Event times are truncated to whole seconds so the band arithmetic is
    integer-exact in both engines (session-window precedent)."""
    base = _events_stream(spark, sf_dir).withColumn(
        "ts", F.date_trunc("second", F.col("ts"))
    )
    purchases = (
        base.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        base.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") < F.col("p_ts")),
        "inner",
    )
    out = run_stream_to_memory(
        spark,
        joined.select(
            F.col("p_id").cast("long").alias("p_id"),
            F.col("c_id").cast("long").alias("c_id"),
            F.col("p_user").cast("long").alias("user_id"),
            (
                F.unix_timestamp("p_ts").cast("long")
                - F.unix_timestamp("c_ts").cast("long")
            ).alias("gap_s"),
        ),
        output_mode="append",
    )
    return out


_SSJOIN_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, CAST({_ES} AS BIGINT) AS es FROM events
)
SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id AS user_id,
       p.es - c.es AS gap_s
FROM e p JOIN e c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND p.user_id = c.user_id
 AND c.es >= p.es - 1800 AND c.es < p.es
"""


# --- batch hopping (sliding) windows --------------------------------------

def tsdb_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (hop windows): every event
    lands in exactly two windows. The oracle expands each event to its two
    candidate window starts — same explode Spark performs internally."""
    ev = load_table(spark, sf_dir, "events")
    hopped = (
        ev.groupBy("event_type", F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(qsum("value", "sum_value"), F.count(F.lit(1)).alias("n_points"))
        .select(
            "event_type",
            F.unix_timestamp("w.start").cast("long").alias("window_start"),
            "sum_value",
            "n_points",
        )
    )
    return hopped


_HOP_SQL = f"""
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


# --- value histogram -------------------------------------------------------

def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per metric (width 50) — the render-side
    distribution operator; pure integer bucketing."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 50).cast("long")
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


_HIST_SQL = """
SELECT event_type, CAST(FLOOR(value / 50) AS BIGINT) AS bucket,
       COUNT(*) AS n, MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY 1, 2
"""


# --- numeric RANGE frames --------------------------------------------------

def window_range_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each order: how many orders of the same priority fall within
    ±1000 of its total price (numeric RANGE frame, not ROWS — peers are
    defined by value distance, so tie handling is frame-exact in both
    engines)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    return orders.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        "o_orderpriority",
        F.count(F.lit(1)).over(w).cast("long").alias("band_n"),
    )


_RANGEBAND_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                           RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
            AS BIGINT) AS band_n
FROM orders
"""


# --- Graphite plaintext protocol, batch leg (S1) --------------------------

def source_text_lineproto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the reference's wire format as a batch source: export
    events as ``"<metric> <value> <ts>"`` text lines, re-read with
    spark.read.text, parse with the same parser the streaming receiver
    uses, and aggregate. Java double→string is shortest-roundtrip, so the
    parse loses nothing; timestamps travel as integer epoch seconds."""
    import os

    from kenshin_backup_spark.streaming.ingest import parse_graphite_lines

    ev = load_table(spark, sf_dir, "events")
    stage = f"/tmp/kenshin_lineproto/{os.path.basename(os.path.normpath(sf_dir))}"
    lines = ev.select(
        F.concat_ws(
            " ",
            F.col("event_type"),
            F.col("value").cast("string"),
            F.unix_timestamp("ts").cast("long").cast("string"),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(stage)
    parsed = parse_graphite_lines(spark.read.text(stage))
    bucket = (F.unix_timestamp("ts").cast("long") / 3600).cast("long") * 3600
    return (
        parsed.groupBy(F.col("metric"), bucket.alias("bucket_ts"))
        .agg(qsum("value", "sum_value"), F.count(F.lit(1)).alias("n_points"))
    )


_LINEPROTO_SQL = f"""
SELECT event_type AS metric,
       CAST(({_ES} // 3600) * 3600 AS BIGINT) AS bucket_ts,
       {QSUM_SQL.format(x="value")} AS sum_value,
       COUNT(*) AS n_points
FROM events GROUP BY 1, 2
"""


QUERIES = {
    "source_text_lineproto": source_text_lineproto,
    "streaming_purchase_click_join": streaming_purchase_click_join,
    "tsdb_hopping_window": tsdb_hopping_window,
    "agg_value_histogram": agg_value_histogram,
    "window_range_price_band": window_range_price_band,
}

ORACLE = {
    "source_text_lineproto": _LINEPROTO_SQL,
    "streaming_purchase_click_join": _SSJOIN_SQL,
    "tsdb_hopping_window": _HOP_SQL,
    "agg_value_histogram": _HIST_SQL,
    "window_range_price_band": _RANGEBAND_SQL,
}
