"""Batch-58 query (round 4): cross-method dedup agreement report.

``dedup_method_agreement`` — the methodology dashboard a curation team
reads before trusting a near-dup pipeline: the same corpus deduped two
independent ways — char-level winnowing fingerprints (batch-53) and
word-level df-capped 3-gram Jaccard (the bench headline) — and the pair
sets cross-tabulated into ``both`` / ``winnowing_only`` /
``jaccard_only`` counts plus each method's total. The two methods see
different granularities (character runs vs word shingles), so the
overlap quantifies how much near-duplication is detectable at either
level; a collapse of ``both`` to ~0 after a code change is the canary
for a broken method.

The Spark side composes the two REGISTERED query functions (same code
the driver certifies individually); the oracle composes their two SQL
pipelines as CTEs — so a hash match here certifies the *composition*,
not just the parts.

Scale notes: both inputs are the already-bounded pair frames (df-capped
posting joins — no new quadratic work); the cross-tab is a full outer
join on (id_a, id_b) followed by a 3-group count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.queries.batch53 import (
    _WINNOW_SQL,
    dedup_winnowing_pairs,
)
from kenshin_backup_spark.queries.llm import (
    _JACCARD_CAPPED_SQL,
    dedup_ngram_jaccard_capped,
)


def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing vs capped-Jaccard pair cross-tab (see module docstring)."""
    win = dedup_winnowing_pairs(spark, sf_dir).select(
        "id_a", "id_b", F.lit(1).alias("in_win")
    )
    jac = dedup_ngram_jaccard_capped(spark, sf_dir).select(
        "id_a", "id_b", F.lit(1).alias("in_jac")
    )
    tab = win.join(jac, ["id_a", "id_b"], "full")
    cls = (
        F.when(
            F.col("in_win").isNotNull() & F.col("in_jac").isNotNull(), "both"
        )
        .when(F.col("in_win").isNotNull(), "winnowing_only")
        .otherwise("jaccard_only")
    )
    return (
        tab.select(cls.alias("agreement"))
        .groupBy("agreement")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select("agreement", F.col("n_pairs").cast("long").alias("n_pairs"))
    )


# Each method's full oracle (its own WITH chain included) nests as a
# sub-select inside one CTE — no CTE-name collisions between pipelines.
_AGREEMENT_SQL = f"""
WITH win_pairs AS (
  {_WINNOW_SQL}
),
jac_pairs AS (
  {_JACCARD_CAPPED_SQL}
),
tab AS (
  SELECT COALESCE(w.id_a, j.id_a) AS id_a,
         COALESCE(w.id_b, j.id_b) AS id_b,
         (w.id_a IS NOT NULL) AS in_win,
         (j.id_a IS NOT NULL) AS in_jac
  FROM win_pairs w
  FULL OUTER JOIN jac_pairs j ON w.id_a = j.id_a AND w.id_b = j.id_b
)
SELECT CASE WHEN in_win AND in_jac THEN 'both'
            WHEN in_win THEN 'winnowing_only'
            ELSE 'jaccard_only' END AS agreement,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM tab GROUP BY 1
"""


QUERIES = {
    "dedup_method_agreement": dedup_method_agreement,
}

ORACLE = {
    "dedup_method_agreement": _AGREEMENT_SQL,
}
