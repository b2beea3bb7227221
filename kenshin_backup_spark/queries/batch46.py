"""Batch-46 queries (round 4): forward as-of join and bigram novelty.

- ``asof_click_next_purchase`` — the FORWARD direction of the as-of
  join (J6): for each click, the user's earliest purchase at-or-after
  it — the attribution/"time-to-conversion" alignment. Exercises the
  ``direction='forward'`` leg of ``operators/joins.asof_join`` (the
  backward leg is driver-green via ``asof_purchase_last_click``); same
  union + per-key ordered window plan, so one shuffle on the key, no
  range join explosion.
- ``text_bigram_novelty`` — an n-gram-LM-flavored fluency proxy with no
  log: the fraction of a document's word bigrams NOT present in the
  corpus' 1000 most frequent bigrams. The reference set is a bounded
  aggregate broadcast to the scan (the decontamination shape), so the
  corpus shuffles once on the bigram key and the per-doc score is a
  broadcast-join ratio. High novelty = unusual word transitions (either
  creative or garbage — a triage signal either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.operators.dedup import normalize_text
from kenshin_backup_spark.operators.joins import asof_join
from kenshin_backup_spark.operators.scalepat import global_topk
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")
_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"


def asof_click_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each click, the user's earliest purchase at-or-after it
    (forward as-of; right side deduped per (user, second) with max value
    for determinism, like the backward twin)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.unix_timestamp("ts").cast("long").alias("pes"))
        .agg(F.max("value").alias("purchase_value"))
        .select("user_id", F.timestamp_seconds("pes").alias("ts"), "purchase_value")
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_value"],
        direction="forward",
    )
    return joined.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_timestamp("ts").cast("long").alias("es"),
        F.col("value").alias("click_value"),
        F.col("purchase_value_asof").alias("next_purchase_value"),
        F.col("ts_asof_ts").alias("next_purchase_es"),
    )


_ASOF_FWD_SQL = f"""
WITH clicks AS (
  SELECT event_id, user_id, CAST({_ES} AS BIGINT) AS es, value
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, CAST({_ES} AS BIGINT) AS pes, MAX(value) AS purchase_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT c.event_id, c.user_id, c.es,
       c.value AS click_value,
       p.purchase_value AS next_purchase_value,
       p.pes AS next_purchase_es
FROM clicks c
LEFT JOIN LATERAL (
  SELECT purchase_value, pes FROM purchases p
  WHERE p.user_id = c.user_id AND p.pes >= c.es
  ORDER BY p.pes ASC LIMIT 1
) p ON TRUE
"""


_NOVELTY_REF = 1000


def text_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novel-bigram ratio vs the corpus' top-1000 bigrams."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    words = F.filter(F.split(normalize_text("text"), " "), lambda x: x != "")
    base = docs.select(F.col("doc_id"), words.alias("w")).where(F.size("w") >= 2)
    grams = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(F.col("w"), i), F.element_at(F.col("w"), i + 1)
                ),
            )
        ).alias("g"),
    )
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    top = global_topk(freq, [F.desc("c"), F.asc("g")], _NOVELTY_REF).select(
        "g", F.lit(1).alias("known")
    )
    scored = (
        grams.join(F.broadcast(top), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.when(F.col("known").isNull(), 1).otherwise(0)).alias("n_novel"),
        )
    )
    return scored.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.col("n_novel").cast("long").alias("n_novel"),
        (F.col("n_novel").cast("double") / F.col("n_bigrams").cast("double")).alias(
            "novelty"
        ),
    )


_NOVELTY_SQL = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(str_split({_NORM.format(x="text")}, ' '),
                     x -> x <> '') AS w
  FROM documents WHERE text IS NOT NULL
),
kept AS (SELECT doc_id, w FROM base WHERE len(w) >= 2),
grams AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS g
  FROM kept, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
),
freq AS (SELECT g, COUNT(*) AS c FROM grams GROUP BY 1),
top AS (
  SELECT g, 1 AS known FROM freq ORDER BY c DESC, g ASC LIMIT {_NOVELTY_REF}
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CASE WHEN known IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST(SUM(CASE WHEN known IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS novelty
FROM grams LEFT JOIN top USING (g)
GROUP BY doc_id
"""


QUERIES = {
    "asof_click_next_purchase": asof_click_next_purchase,
    "text_bigram_novelty": text_bigram_novelty,
}

ORACLE = {
    "asof_click_next_purchase": _ASOF_FWD_SQL,
    "text_bigram_novelty": _NOVELTY_SQL,
}
