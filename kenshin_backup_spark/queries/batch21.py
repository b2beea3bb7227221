"""Batch-21 queries: rolling 7-day active users, Pareto cumulative-share
curves, and deterministic readability scoring.

Rolling WAU uses the contribute-forward expansion (each active (day,
user) pair contributes to 7 target days) instead of a distinct-over-frame
window — the same shape Spark's hop windows lower to, and the form that
scales (the expansion is 7×|day-user pairs|, never |events|²). At 100 TB
the exact distinct becomes an HLL sketch merge; the exact twin here is
the correctness anchor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.operators.scalepat import (
    with_global_prefix,
    with_global_scalars,
)
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")
_DAY = 86400


# --- rolling 7-day active users -------------------------------------------

def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every observed day: distinct users active in the trailing 7
    days. Day grain first (|users|×|days| pairs), then each pair
    contributes to its 7 following target days; count distinct per target
    day; keep target days that were actually observed."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    day_user = (
        ev.select((es / _DAY).cast("long").alias("day"), "user_id").distinct()
    )
    days = day_user.select("day").distinct()
    contrib = day_user.select(
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("target_day"),
        "user_id",
    )
    wau = contrib.groupBy("target_day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        days.join(wau, days.day == wau.target_day)
        .select(
            (F.col("day") * _DAY).cast("long").alias("day_ts"),
            F.col("wau").cast("long").alias("wau"),
        )
    )


_WAU_SQL = f"""
WITH day_user AS (
  SELECT DISTINCT CAST({_ES} AS BIGINT) // {_DAY} AS day, user_id FROM events
), contrib AS (
  SELECT UNNEST(generate_series(day, day + 6)) AS target_day, user_id
  FROM day_user
), wau AS (
  SELECT target_day, COUNT(DISTINCT user_id) AS wau FROM contrib GROUP BY 1
)
SELECT DISTINCT d.day * {_DAY} AS day_ts, w.wau
FROM day_user d JOIN wau w ON w.target_day = d.day
"""


# --- Pareto cumulative-share curve ----------------------------------------

def orders_pareto_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ranked by revenue; cumulative share of total — the 80/20
    curve. Prefix and total sums are the same exact BIGINTs, so the share
    is one deterministic division; rank ties break by custkey.

    Scale shape: the global rank and running sum go through
    ``with_global_prefix`` (range-repartition + per-partition windows +
    broadcast running offsets — bit-identical to the unpartitioned window,
    no single-partition sort); the total is a broadcast 1-row scalar."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 1000000).cast("long")).alias("rev_l")
    )
    order = [F.desc("rev_l"), F.asc("o_custkey")]
    prefixed = with_global_prefix(
        with_global_scalars(per_cust, total_l=F.sum("rev_l")),
        order,
        sums={"cum_l": "rev_l"},
        row_number_col="rank",
    )
    return prefixed.select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        "rank",
        (F.col("rev_l").cast("double") / 1000000.0).alias("revenue"),
        (
            F.col("cum_l").cast("double") / F.col("total_l").cast("double")
        ).alias("cum_share"),
    )


_PARETO_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(FLOOR(o_totalprice * 1000000) AS BIGINT)) AS rev_l
  FROM orders GROUP BY 1
)
SELECT o_custkey,
       CAST(ROW_NUMBER() OVER (ORDER BY rev_l DESC, o_custkey ASC) AS BIGINT) AS rank,
       CAST(rev_l AS DOUBLE) / 1000000.0 AS revenue,
       CAST(SUM(rev_l) OVER (ORDER BY rev_l DESC, o_custkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / CAST(SUM(rev_l) OVER () AS DOUBLE) AS cum_share
FROM per_cust
"""


# --- deterministic readability score --------------------------------------

def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability proxy from exact integer counts (words,
    sentences, alnum chars): 206.835 − 1.015·(words/sentences) −
    84.6·(chars/words)/5. Pure products/divisions of identical integers —
    hash-exact; the quality-gate signal a curation pipeline thresholds
    on."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.regexp_count(F.col("text"), F.lit("[A-Za-z0-9]+")).cast("long")
    sents = F.greatest(
        F.regexp_count(F.col("text"), F.lit("[.!?]+")).cast("long"), F.lit(1)
    )
    chars = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z0-9]+", "")).cast("long")
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sents.cast("double"))
        - F.lit(84.6) * (chars.cast("double") / words.cast("double")) / F.lit(5.0)
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        words.alias("n_words"),
        sents.alias("n_sentences"),
        F.when(words > 0, score).cast("double").alias("readability"),
    )


_READ_SQL = """
WITH c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_words,
         greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1) AS n_sentences,
         CAST(length(regexp_replace(text, '[^A-Za-z0-9]+', '', 'g')) AS BIGINT) AS n_chars
  FROM documents
)
SELECT doc_id, n_words, n_sentences,
       CASE WHEN n_words > 0
            THEN 206.835
                 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                 - 84.6 * (CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE)) / 5.0
       END AS readability
FROM c
"""


QUERIES = {
    "events_rolling_wau": events_rolling_wau,
    "orders_pareto_curve": orders_pareto_curve,
    "text_readability_scores": text_readability_scores,
}

ORACLE = {
    "events_rolling_wau": _WAU_SQL,
    "orders_pareto_curve": _PARETO_SQL,
    "text_readability_scores": _READ_SQL,
}
