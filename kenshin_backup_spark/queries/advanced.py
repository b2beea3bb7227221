"""Batch-2 queries: graphite-web series functions (W2), glob fetch (P2),
as-of join (J6), EXISTS/pivot/grouping-sets relational surface, multimodal
column pipeline (X4), and safe scalar math (§2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import (
    EPOCH_S_SQL,
    QSUM_SQL,
    glob_to_regex,
    qsum,
)
from kenshin_backup_spark.operators.joins import asof_join
from kenshin_backup_spark.operators.scalepat import (
    ntile_expr,
    with_global_prefix,
    with_global_scalars,
)
from kenshin_backup_spark.operators.multimodal import (
    decode_stub,
    frame_sample_stub,
    with_binary_payload,
)
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")


# --- W2: graphite-web series functions --------------------------------------

def tsdb_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """derivative / nonNegativeDerivative per metric: value − lag(value)
    over (ts, event_id)-ordered series (graphite-web function surface)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(
        F.unix_timestamp("ts").cast("long"), "event_id"
    )
    delta = (F.col("value") - F.lag("value").over(w)).cast("double")
    return ev.select(
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("es"),
        delta.alias("delta"),
        F.when(delta >= 0, delta).cast("double").alias("nn_delta"),
    )


_DERIV_SQL = f"""
SELECT event_id, event_type,
       CAST({_ES} AS BIGINT) AS es,
       CAST(value - LAG(value) OVER w AS DOUBLE) AS delta,
       CASE WHEN value - LAG(value) OVER w >= 0
            THEN CAST(value - LAG(value) OVER w AS DOUBLE) END AS nn_delta
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY CAST({_ES} AS BIGINT), event_id)
"""


def tsdb_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average(4) per metric — exact via quantized window sums.

    NOT graphite-parity evidence: trailing-INCLUSIVE frame by intent
    (oracle mirrors it); graphite-web's movingAverage uses the
    strictly-before slice ``series[i-n:i]``, implemented in
    ``operators/seriesfns.moving_average`` (round-7 ADVICE
    annotation)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy(F.unix_timestamp("ts").cast("long"), "event_id")
        .rowsBetween(-3, 0)
    )
    q = F.floor(F.col("value") * 1000000).cast("long")
    mavg = (F.sum(q).over(w) / (F.lit(1000000.0) * F.count(q).over(w))).cast("double")
    return ev.select(
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.unix_timestamp("ts").cast("long").alias("es"),
        mavg.alias("moving_avg_4"),
    )


_MAVG_SQL = f"""
SELECT event_id, event_type,
       CAST({_ES} AS BIGINT) AS es,
       CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) OVER w
            / (1000000.0 * COUNT(value) OVER w) AS DOUBLE) AS moving_avg_4
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY CAST({_ES} AS BIGINT), event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


def tsdb_glob_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graphite glob browse ({click,view} / p*) → per-metric stats —
    exercises glob→regex translation (P2) end to end."""
    from kenshin_backup_spark.operators.fetch import metric_filter

    ev = load_table(spark, sf_dir, "events")
    picked = metric_filter(ev, "event_type", "{click,view,p*}")
    return picked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), qsum("value", "sum_value")
    )


_GLOB_SQL = f"""
SELECT event_type, COUNT(*) AS n, {QSUM_SQL.format(x="value")} AS sum_value
FROM events
WHERE regexp_matches(event_type, '{glob_to_regex("{click,view,p*}")}')
GROUP BY event_type
"""


# --- J6: as-of join ----------------------------------------------------------

def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the user's most recent click at-or-before it —
    the as-of join (series alignment) the reference's web layer performs.
    Right side deduped to one row per (user, second) for determinism."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", F.unix_timestamp("ts").cast("long").alias("ces"))
        .agg(F.max("value").alias("click_value"))
        .select("user_id", F.timestamp_seconds("ces").alias("ts"), "click_value")
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["click_value"],
        direction="backward",
    )
    return joined.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_timestamp("ts").cast("long").alias("es"),
        F.col("value").alias("purchase_value"),
        F.col("click_value_asof").alias("last_click_value"),
        F.col("ts_asof_ts").alias("last_click_es"),
    )


_ASOF_SQL = f"""
WITH purchases AS (
  SELECT event_id, user_id, CAST({_ES} AS BIGINT) AS es, value
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, CAST({_ES} AS BIGINT) AS ces, MAX(value) AS click_value
  FROM events WHERE event_type = 'click'
  GROUP BY 1, 2
)
SELECT p.event_id, p.user_id, p.es,
       p.value AS purchase_value,
       c.click_value AS last_click_value,
       c.ces AS last_click_es
FROM purchases p
LEFT JOIN LATERAL (
  SELECT click_value, ces FROM clicks c
  WHERE c.user_id = p.user_id AND c.ces <= p.es
  ORDER BY c.ces DESC LIMIT 1
) c ON TRUE
"""


# --- Relational batch 2 -------------------------------------------------------

def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped EXISTS: orders with ≥1 line shipped >90 days after order
    date, counted per priority (correlated-predicate semi join)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        F.unix_timestamp(li.l_shipdate)
        > F.unix_timestamp(orders.o_orderdate) + 90 * 86400
    )
    semi = orders.join(li, cond, "left_semi")
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


_Q4_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND {EPOCH_S_SQL.format(x="l_shipdate")} > {EPOCH_S_SQL.format(x="o_orderdate")} + 90 * 86400
)
GROUP BY o_orderpriority
"""


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per priority × status (fixed status domain)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).cast("long").alias("n_open"),
            F.coalesce("F", F.lit(0)).cast("long").alias("n_finished"),
            F.coalesce("P", F.lit(0)).cast("long").alias("n_pending"),
        )
    )


_PIVOT_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
FROM orders GROUP BY o_orderpriority
"""


def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/dense_rank over customer account balances.

    The order key is total (custkey tiebreak), so rank = dense_rank =
    row_number and percent_rank = (rn−1)/(n−1): all three derive from one
    ``with_global_prefix`` global row number (range repartition + broadcast
    offsets) and the closed-form ``ntile_expr`` — no unpartitioned window,
    output bit-identical to the NTILE/PERCENT_RANK/DENSE_RANK oracle."""
    cust = load_table(spark, sf_dir, "customer")
    base = with_global_scalars(
        cust.select("c_custkey", "c_mktsegment", "c_acctbal"),
        n=F.count(F.lit(1)),
    )
    ranked = with_global_prefix(
        base, [F.desc("c_acctbal"), F.asc("c_custkey")], row_number_col="rn"
    )
    pct = F.when(
        F.col("n") > 1,
        (F.col("rn") - 1).cast("double") / (F.col("n") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    return ranked.select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_mktsegment",
        ntile_expr(F.col("rn"), F.col("n"), 4).alias("quartile"),
        pct.cast("double").alias("pct_rank"),
        F.col("rn").cast("long").alias("drank"),
    )


_NTILE_SQL = """
SELECT c_custkey, c_mktsegment,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drank
FROM customer
WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey ASC)
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (same Catalyst plan as the
    DataFrame rollup/cube path)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("__li_gs")
    return spark.sql(
        f"""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_rows,
               {QSUM_SQL.format(x='l_quantity')} AS sum_qty
        FROM __li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


_GSETS_SQL = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n_rows,
       {QSUM_SQL.format(x="l_quantity")} AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic math scalar family: abs/sqrt/power/floor/ceil/sign/mod
    (transcendentals excluded: JVM vs libm differ in the last ulp)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.abs(F.col("l_extendedprice") - 1000).cast("double").alias("abs_dev"),
        F.sqrt("l_quantity").cast("double").alias("sqrt_qty"),
        (F.col("l_discount") * F.col("l_discount")).cast("double").alias("disc_sq"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
    )


_MATH_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       CAST(ABS(l_extendedprice - 1000) AS DOUBLE) AS abs_dev,
       CAST(SQRT(l_quantity) AS DOUBLE) AS sqrt_qty,
       CAST(l_discount * l_discount AS DOUBLE) AS disc_sq,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
       CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       l_orderkey % 7 AS key_mod7
FROM lineitem
"""


# --- X4: multimodal columns ----------------------------------------------------

def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata struct: byte length and sha256 of the
    payload column (X4 schema surface)."""
    docs = load_table(spark, sf_dir, "documents")
    d = with_binary_payload(docs)
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.n_bytes").cast("long").alias("n_bytes"),
        F.col("media_meta.sha256").alias("sha_hex"),
    )


_BINMETA_SQL = """
SELECT doc_id,
       'application/octet-stream' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha_hex
FROM documents
"""


def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode pipeline (stub decoder) — the fake
    features are exact integer/IEEE arithmetic on byte length, so even the
    Python-side pipeline is oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    d = decode_stub(with_binary_payload(docs))
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_frames").cast("long").alias("n_frames"),
        F.element_at("feature", 1).cast("double").alias("f_len"),
        F.element_at("feature", 2).cast("double").alias("f_hash"),
        F.element_at("feature", 3).cast("double").alias("f_area"),
    )


_DECODE_SQL = """
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_bytes,
       CAST(64 + (n % 577) AS BIGINT) AS width,
       CAST(64 + ((n * 31) % 421) AS BIGINT) AS height,
       CAST(1 + (n % 7) AS BIGINT) AS n_frames,
       CAST(n / 1000.0 AS DOUBLE) AS f_len,
       CAST(((n * 2654435761) % 997) / 997.0 AS DOUBLE) AS f_hash,
       CAST((64 + (n % 577)) * (64 + ((n * 31) % 421)) AS DOUBLE) AS f_area
FROM b
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1:N frame-sampling mapInPandas shape (stub): one row per sampled
    fake frame; frame count/indices are length-derived and oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    frames = frame_sample_stub(with_binary_payload(docs), every=2)
    return frames.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.length("frame_bytes").cast("long").alias("n_frame_bytes"),
    )


_FRAMES_SQL = """
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
f AS (SELECT doc_id, n, 1 + (n % 7) AS n_frames FROM b)
SELECT doc_id,
       CAST(UNNEST(generate_series(0, n_frames - 1, 2)) AS BIGINT) AS frame_idx,
       CAST(LEAST(CAST(CEIL((n - UNNEST(generate_series(0, n_frames - 1, 2)))
                           / CAST(n_frames AS DOUBLE)) AS BIGINT), 64) AS BIGINT)
         AS n_frame_bytes
FROM f
"""


def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) per returnflag — approximate by
    definition → rows-only check; exact twin: agg_distinct_counts."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


QUERIES = {
    "tsdb_derivative": tsdb_derivative,
    "tsdb_moving_avg": tsdb_moving_avg,
    "tsdb_glob_fetch": tsdb_glob_fetch,
    "asof_purchase_last_click": asof_purchase_last_click,
    "tpch_q4_order_priority": tpch_q4_order_priority,
    "pivot_status_by_priority": pivot_status_by_priority,
    "window_ntile_quartiles": window_ntile_quartiles,
    "agg_grouping_sets": agg_grouping_sets,
    "scalar_math_funcs": scalar_math_funcs,
    "multimodal_binary_meta": multimodal_binary_meta,
    "multimodal_decode_features": multimodal_decode_features,
    "multimodal_frame_sample": multimodal_frame_sample,
    "approx_distinct_parts": approx_distinct_parts,
}

ORACLE = {
    "tsdb_derivative": _DERIV_SQL,
    "tsdb_moving_avg": _MAVG_SQL,
    "tsdb_glob_fetch": _GLOB_SQL,
    "asof_purchase_last_click": _ASOF_SQL,
    "tpch_q4_order_priority": _Q4_SQL,
    "pivot_status_by_priority": _PIVOT_SQL,
    "window_ntile_quartiles": _NTILE_SQL,
    "agg_grouping_sets": _GSETS_SQL,
    "scalar_math_funcs": _MATH_SQL,
    "multimodal_binary_meta": _BINMETA_SQL,
    "multimodal_decode_features": _DECODE_SQL,
    "multimodal_frame_sample": _FRAMES_SQL,
    # approx_distinct_parts: approximate → rows-only by design.
}
