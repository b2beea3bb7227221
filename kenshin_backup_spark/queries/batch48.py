"""Batch-48 queries (round 4): LSH precision report and corpus-mix
rebalancing plan.

- ``dedup_lsh_precision_report`` — in-engine evaluation of the LSH
  tuning itself: ALL band-collision candidate pairs from the portable
  MinHash (threshold off) are exact-verified, and the report counts true
  positives (Jaccard ≥ 0.5) vs false candidates per corpus. Because the
  portable MinHash is integer-deterministic, even this meta-evaluation
  is fully oracle-checked — the rare case of an LSH whose PRECISION
  number is hash-verifiable across engines. At 100 TB this is the
  candidate-volume dashboard a dedup operator watches when tuning
  bands/rows.
- ``llm_mix_rebalance_plan`` — given target language shares, compute
  the largest feasible corpus size and per-language sampling plan
  (keep-count + keep-rate): T = min over langs of count/share, then
  keep_l = floor(share_l · T). Five-row aggregate + broadcast scalar —
  the planning step in front of ``llm_quality_weighted_sample``-style
  deterministic sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.operators.dedup import minhash_portable_pairs
from kenshin_backup_spark.queries.batch30 import _minhash_sql
from kenshin_backup_spark.sources import load_table

_TP_THRESHOLD = 0.5


def dedup_lsh_precision_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TP/FP counts and precision of portable-MinHash band candidates
    against the exact Jaccard verdict (τ = 0.5)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_portable_pairs(docs, threshold=0.0)
    tp = F.sum(
        F.when(F.col("jaccard") >= _TP_THRESHOLD, 1).otherwise(0)
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        tp.cast("long").alias("n_true_pairs"),
        (F.count(F.lit(1)) - tp).cast("long").alias("n_false_candidates"),
        (
            tp.cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("precision"),
    )


_PRECISION_SQL = f"""
WITH pairs AS (
{_minhash_sql(threshold=None)}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN jaccard >= {_TP_THRESHOLD} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_true_pairs,
       CAST(COUNT(*) - SUM(CASE WHEN jaccard >= {_TP_THRESHOLD} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_candidates,
       CAST(SUM(CASE WHEN jaccard >= {_TP_THRESHOLD} THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS precision
FROM pairs
"""


#: Target language mix: English-heavy with uniform tail — the shape of a
#: typical multilingual pretraining recipe.
_TARGET_SHARES = {"en": 0.4, "es": 0.15, "zh": 0.15, "de": 0.15, "fr": 0.15}


def llm_mix_rebalance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sampling plan hitting the target mix: feasible total
    T = min(count/share), keep_l = floor(share_l · T), rate = keep/count."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    share = F.element_at(
        F.create_map(
            *[x for k, v in _TARGET_SHARES.items() for x in (F.lit(k), F.lit(v))]
        ),
        F.col("lang"),
    )
    with_share = counts.select(
        "lang", "n_docs", share.alias("target_share")
    ).where(F.col("target_share").isNotNull())
    feasible = with_share.agg(
        F.min(
            F.col("n_docs").cast("double") / F.col("target_share")
        ).alias("t")
    )
    keep = F.floor(F.col("target_share") * F.col("t")).cast("long")
    return (
        with_share.crossJoin(F.broadcast(feasible))
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("target_share"),
            keep.alias("keep_docs"),
            (keep.cast("double") / F.col("n_docs").cast("double")).alias(
                "keep_rate"
            ),
        )
    )


_shares_values = ",\n         ".join(
    f"('{k}', CAST({v} AS DOUBLE))" for k, v in _TARGET_SHARES.items()
)

_MIX_SQL = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1
),
shares AS (SELECT * FROM (VALUES {_shares_values}) AS t(lang, target_share)),
with_share AS (
  SELECT c.lang, c.n_docs, s.target_share
  FROM counts c JOIN shares s USING (lang)
),
feasible AS (
  SELECT MIN(CAST(n_docs AS DOUBLE) / target_share) AS t FROM with_share
)
SELECT lang,
       CAST(n_docs AS BIGINT) AS n_docs,
       target_share,
       CAST(FLOOR(target_share * t) AS BIGINT) AS keep_docs,
       CAST(FLOOR(target_share * t) AS DOUBLE) / CAST(n_docs AS DOUBLE)
         AS keep_rate
FROM with_share CROSS JOIN feasible
"""


QUERIES = {
    "dedup_lsh_precision_report": dedup_lsh_precision_report,
    "llm_mix_rebalance_plan": llm_mix_rebalance_plan,
}

ORACLE = {
    "dedup_lsh_precision_report": _PRECISION_SQL,
    "llm_mix_rebalance_plan": _MIX_SQL,
}
