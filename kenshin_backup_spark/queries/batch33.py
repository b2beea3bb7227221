"""Batch-33 queries (round 3): association-rule mining (market basket) —
the classic frequent-itemset analytics family, expressed as posting-list
equi-joins with integer-exact support/confidence/lift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.cache import persist_tracked
from kenshin_backup_spark.sources import load_table

_MIN_PAIR_SUPPORT = 3


def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise association rules over order baskets: for part pairs
    co-occurring in ≥ 3 orders, support counts, confidence(a→b) =
    pair/count(a), and lift = pair·N / (count(a)·count(b)).

    Plan: distinct (order, part) posting list → per-part order counts →
    pair equi-join ON THE ORDER KEY (candidate volume Σ basket², bounded
    by basket size — the same Σdf² shape as shingle dedup, with the
    min-support filter playing the df-cap role) → broadcast part counts
    back. All counts integer; confidence/lift are exact IEEE divisions.

    At 100 TB: baskets are naturally bounded (line items per order), so
    the pair join never explodes; the support threshold prunes the long
    tail before the stats join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    basket = li.select(
        F.col("l_orderkey").alias("oid"), F.col("l_partkey").alias("part")
    ).distinct().transform(persist_tracked)
    n_orders = basket.agg(
        F.countDistinct("oid").cast("long").alias("n_orders")
    )
    part_cnt = basket.groupBy("part").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.oid") == F.col("b.oid"))
            & (F.col("a.part") < F.col("b.part")),
        )
        .groupBy(
            F.col("a.part").alias("part_a"), F.col("b.part").alias("part_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("pair_cnt"))
        .where(F.col("pair_cnt") >= _MIN_PAIR_SUPPORT)
    )
    ca = part_cnt.select(F.col("part").alias("part_a"), F.col("cnt").alias("cnt_a"))
    cb = part_cnt.select(F.col("part").alias("part_b"), F.col("cnt").alias("cnt_b"))
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            F.col("part_a").cast("long").alias("part_a"),
            F.col("part_b").cast("long").alias("part_b"),
            "pair_cnt",
            "cnt_a",
            "cnt_b",
            (F.col("pair_cnt") / F.col("cnt_a")).cast("double").alias("conf_a_b"),
            (F.col("pair_cnt") / F.col("cnt_b")).cast("double").alias("conf_b_a"),
            (
                F.col("pair_cnt") * F.col("n_orders")
                / (F.col("cnt_a") * F.col("cnt_b"))
            ).cast("double").alias("lift"),
        )
    )


_BASKET_SQL = f"""
WITH basket AS (
  SELECT DISTINCT l_orderkey AS oid, l_partkey AS part FROM lineitem
),
n AS (SELECT COUNT(DISTINCT oid) AS n_orders FROM basket),
part_cnt AS (SELECT part, COUNT(*) AS cnt FROM basket GROUP BY 1),
pairs AS (
  SELECT a.part AS part_a, b.part AS part_b, COUNT(*) AS pair_cnt
  FROM basket a JOIN basket b ON a.oid = b.oid AND a.part < b.part
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_MIN_PAIR_SUPPORT}
)
SELECT p.part_a, p.part_b,
       CAST(p.pair_cnt AS BIGINT) AS pair_cnt,
       CAST(ca.cnt AS BIGINT) AS cnt_a,
       CAST(cb.cnt AS BIGINT) AS cnt_b,
       CAST(p.pair_cnt AS DOUBLE) / ca.cnt AS conf_a_b,
       CAST(p.pair_cnt AS DOUBLE) / cb.cnt AS conf_b_a,
       CAST(p.pair_cnt AS DOUBLE) * (SELECT n_orders FROM n)
         / (CAST(ca.cnt AS DOUBLE) * CAST(cb.cnt AS DOUBLE)) AS lift
FROM pairs p
JOIN part_cnt ca ON ca.part = p.part_a
JOIN part_cnt cb ON cb.part = p.part_b
"""


QUERIES = {
    "orders_market_basket": orders_market_basket,
}

ORACLE = {
    "orders_market_basket": _BASKET_SQL,
}
