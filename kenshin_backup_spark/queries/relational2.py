"""Batch-3 relational queries: TPC-H Q10/Q14/Q17/Q18 shapes (correlated
scalar subquery, HAVING, promo share, returned-items top-k), levenshtein,
stream-static enrichment, and batch session windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import (
    EPOCH_S_SQL,
    QSUM_SQL,
    qsum,
)
from kenshin_backup_spark.sources import load_table
from kenshin_backup_spark.streaming.ingest import run_stream_to_memory

_ES = EPOCH_S_SQL.format(x="ts")


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: revenue lost to returned items per customer, top 20."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name", "c_acctbal").agg(
        qsum(revenue, "revenue")
    )
    return (
        agg.orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            "n_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "revenue",
        )
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name, n_name, c_acctbal,
       {QSUM_SQL.format(x="l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo revenue share — conditional quantized sums, one
    deterministic division."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", revenue)
    agg = j.agg(
        qsum(promo, "promo_revenue"),
        qsum(revenue, "total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (100.0 * F.col("promo_revenue") / F.col("total_revenue"))
        .cast("double")
        .alias("promo_pct"),
    )


_Q14_SQL = f"""
WITH a AS (
  SELECT
    {QSUM_SQL.format(x="CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) END")} AS promo_revenue,
    {QSUM_SQL.format(x="l_extendedprice * (1 - l_discount)")} AS total_revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT promo_revenue, total_revenue,
       CAST(100.0 * promo_revenue / total_revenue AS DOUBLE) AS promo_pct
FROM a
"""


def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated scalar subquery — lines with quantity below
    half their part's average quantity. Quantities are integer-valued
    doubles, so AVG is exact (sum < 2^53) and the threshold can't drift."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("__li_q17")
    return spark.sql(
        f"""
        SELECT COUNT(*) AS n_small,
               {QSUM_SQL.format(x='l_extendedprice')} AS sum_price
        FROM __li_q17 l1
        WHERE l_quantity < (
          SELECT 0.5 * AVG(l_quantity) FROM __li_q17 l2
          WHERE l2.l_partkey = l1.l_partkey
        )
        """
    )


_Q17_SQL = f"""
SELECT COUNT(*) AS n_small,
       {QSUM_SQL.format(x="l_extendedprice")} AS sum_price
FROM lineitem l1
WHERE l_quantity < (
  SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
  WHERE l2.l_partkey = l1.l_partkey
)
"""


def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING on grouped fact — orders whose total quantity
    exceeds 150, joined back to order/customer attributes."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(qsum("l_quantity", "total_qty"))
        .where(F.col("total_qty") > 150)
    )
    j = big.join(orders, big.l_orderkey == orders.o_orderkey).join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    return j.select(
        F.col("l_orderkey").cast("long").alias("o_orderkey"),
        F.col("c_custkey").cast("long").alias("c_custkey"),
        "c_name",
        F.unix_timestamp("o_orderdate").cast("long").alias("o_orderdate_ts"),
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "total_qty",
    )


_Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey, {QSUM_SQL.format(x="l_quantity")} AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {QSUM_SQL.format(x="l_quantity")} > 150
)
SELECT b.l_orderkey AS o_orderkey, c_custkey, c_name,
       {EPOCH_S_SQL.format(x="o_orderdate")} AS o_orderdate_ts,
       o_totalprice, b.total_qty
FROM big b
JOIN orders ON b.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def scalar_levenshtein_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance (dedup-adjacent string family): part names vs a probe
    plus pairwise distance of name to its brand-mate canonical name."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        "p_name",
        F.levenshtein(F.col("p_name"), F.lit("small widget")).cast("long").alias("lev_probe"),
        F.levenshtein(F.col("p_name"), F.col("p_type")).cast("long").alias("lev_type"),
    )


_LEV_SQL = """
SELECT p_partkey, p_name,
       CAST(levenshtein(p_name, 'small widget') AS BIGINT) AS lev_probe,
       CAST(levenshtein(p_name, p_type) AS BIGINT) AS lev_type
FROM part
"""


def streaming_enrich_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–static join (J7): the events stream enriched with a static
    broadcast dimension (value bands), aggregated per (event_type, band)."""
    from kenshin_backup_spark.queries.streaming_q import _events_stream

    stream = _events_stream(spark, sf_dir)
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1e9)],
        "band string, lo double, hi double",
    )
    joined = stream.join(
        F.broadcast(bands), (stream.value >= bands.lo) & (stream.value < bands.hi)
    )
    agg = joined.groupBy("event_type", "band").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias("sum_q"),
    )
    out = run_stream_to_memory(spark, agg, output_mode="complete")
    return out.select(
        "event_type",
        "band",
        F.col("n").cast("long").alias("n"),
        (F.col("sum_q") / F.lit(1000000.0)).cast("double").alias("sum_value"),
    )


_ENRICH_SQL = f"""
WITH bands(band, lo, hi) AS (
  VALUES ('low', 0.0, 50.0), ('mid', 50.0, 200.0), ('high', 200.0, 1e9)
)
SELECT event_type, band, COUNT(*) AS n,
       {QSUM_SQL.format(x="value")} AS sum_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY event_type, band
"""


def batch_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window in BATCH mode (same operator as the streaming twin,
    same oracle semantics: second-truncated timestamps, half-open gap)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.date_trunc("second", F.col("ts"))
    )
    sess = (
        ev.groupBy(F.col("user_id"), F.session_window("ts", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias("sum_q"),
        )
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.unix_timestamp("session_window.start").cast("long").alias("session_start_ts"),
            F.col("n_events").cast("long").alias("n_events"),
            (F.col("sum_q") / F.lit(1000000.0)).cast("double").alias("sum_value"),
        )
    )
    return sess


_BATCH_SESSION_SQL = f"""
WITH e AS (
  SELECT user_id, value, CAST({_ES} AS BIGINT) AS es
  FROM events
),
flagged AS (
  SELECT user_id, value, es,
         CASE WHEN es - LAG(es) OVER (PARTITION BY user_id ORDER BY es) > 1800
              OR LAG(es) OVER (PARTITION BY user_id ORDER BY es) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e
),
sessions AS (
  SELECT user_id, value, es,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY es
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(es) AS session_start_ts,
       COUNT(*) AS n_events,
       {QSUM_SQL.format(x="value")} AS sum_value
FROM sessions GROUP BY user_id, sid
"""


QUERIES = {
    "tpch_q10_returned_items": tpch_q10_returned_items,
    "tpch_q14_promo_share": tpch_q14_promo_share,
    "tpch_q17_small_quantity": tpch_q17_small_quantity,
    "tpch_q18_large_orders": tpch_q18_large_orders,
    "scalar_levenshtein_names": scalar_levenshtein_names,
    "streaming_enrich_bands": streaming_enrich_bands,
    "batch_session_windows": batch_session_windows,
}

ORACLE = {
    "tpch_q10_returned_items": _Q10_SQL,
    "tpch_q14_promo_share": _Q14_SQL,
    "tpch_q17_small_quantity": _Q17_SQL,
    "tpch_q18_large_orders": _Q18_SQL,
    "scalar_levenshtein_names": _LEV_SQL,
    "streaming_enrich_bands": _ENRICH_SQL,
    "batch_session_windows": _BATCH_SESSION_SQL,
}
