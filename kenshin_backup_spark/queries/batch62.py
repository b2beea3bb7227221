"""Batch-62 query (round 4): the near-dup-aware curation funnel capstone.

``llm_curation_funnel_v2`` — the round-4 successor to the
``llm_corpus_curation`` capstone, composing this round's operators into
the funnel every training-data pipeline reports before a run:

1. **near-dup stage** — winnowing fingerprint pairs (batch-53,
   char-level, shared >= 2); of each duplicate pair the LARGER doc_id is
   dropped (keep-first), implemented as a semi-join flag against the
   distinct ``id_b`` set;
2. **quality stage** — token count >= 20 and mean word length in
   [3, 8] (the v1 gate, unchanged — gates should be stable across
   pipeline versions);
3. **sampling stage** — deterministic 50% hash sampling with the md5
   variate (seedless, engine-independent: ``md5(doc_id) mod 1e6 <
   5e5``);
4. **funnel report** — per (lang, source): docs in, surviving each
   stage (stages apply cumulatively), and kept token volume.

The oracle recomputes the whole funnel — including the nested winnowing
pipeline — in one DuckDB statement, so the hash certifies the
composition of all three stages, not just each operator.

Scale notes (100 TB): the pair frame is the df-capped winnowing join
(bounded); the drop set is its distinct ``id_b`` projection (small) —
broadcast semi-join back; everything else is scan-side flags + one
map-side-combinable aggregate on (lang, source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.operators.dedup import md5_hash60, normalize_text
from kenshin_backup_spark.operators.textops import token_count
from kenshin_backup_spark.queries.batch53 import (
    _WINNOW_SQL,
    dedup_winnowing_pairs,
)
from kenshin_backup_spark.sources import load_table

_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"

SAMPLE_PPM = 500_000  # 50% deterministic keep rate


def llm_curation_funnel_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-dedup → quality → hash-sample funnel (module docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    drop = (
        dedup_winnowing_pairs(spark, sf_dir)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    alnum = F.length(
        F.regexp_replace(F.col("text"), r"[^A-Za-z0-9]+", "")
    ).cast("long")
    n_tokens = token_count("text")
    awl = alnum.cast("double") / n_tokens
    qual = (
        (n_tokens >= 20) & awl.between(3.0, 8.0)
    ).cast("int")
    variate = F.pmod(md5_hash60(F.col("doc_id").cast("string")), F.lit(1_000_000))
    samp = (variate < SAMPLE_PPM).cast("int")
    flagged = (
        docs.join(F.broadcast(drop), "doc_id", "left")
        .withColumn("keep_dedup", F.when(F.col("is_dup").isNull(), 1).otherwise(0))
        .withColumn("keep_qual", F.col("keep_dedup") * qual)
        .withColumn("keep_samp", F.col("keep_qual") * samp)
        .withColumn("n_tokens", n_tokens)
    )
    return (
        flagged.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("keep_dedup").cast("long").alias("n_after_dedup"),
            F.sum("keep_qual").cast("long").alias("n_after_quality"),
            F.sum("keep_samp").cast("long").alias("n_sampled"),
            F.sum(F.col("keep_samp") * F.col("n_tokens"))
            .cast("long")
            .alias("kept_tokens"),
        )
    )


_FUNNEL_SQL = f"""
WITH win_pairs AS (
  {_WINNOW_SQL}
),
drop_set AS (SELECT DISTINCT id_b AS doc_id FROM win_pairs),
flagged AS (
  SELECT d.lang, d.source,
         CASE WHEN s.doc_id IS NULL THEN 1 ELSE 0 END AS keep_dedup,
         len(regexp_extract_all(d.text, '[A-Za-z0-9]+')) AS n_tokens,
         len(regexp_replace(d.text, '[^A-Za-z0-9]+', '', 'g')) AS n_alnum,
         CASE WHEN CAST(CONCAT('0x', SUBSTRING(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
                        AS BIGINT) % 1000000 < {SAMPLE_PPM}
              THEN 1 ELSE 0 END AS samp
  FROM documents d LEFT JOIN drop_set s ON s.doc_id = d.doc_id
),
staged AS (
  SELECT lang, source, keep_dedup, n_tokens,
         keep_dedup * (CASE WHEN n_tokens >= 20
                             AND CAST(n_alnum AS DOUBLE) / n_tokens
                                 BETWEEN 3.0 AND 8.0
                            THEN 1 ELSE 0 END) AS keep_qual,
         samp
  FROM flagged
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(keep_dedup) AS BIGINT) AS n_after_dedup,
       CAST(SUM(keep_qual) AS BIGINT) AS n_after_quality,
       CAST(SUM(keep_qual * samp) AS BIGINT) AS n_sampled,
       CAST(SUM(keep_qual * samp * n_tokens) AS BIGINT) AS kept_tokens
FROM staged GROUP BY 1, 2
"""


QUERIES = {
    "llm_curation_funnel_v2": llm_curation_funnel_v2,
}

ORACLE = {
    "llm_curation_funnel_v2": _FUNNEL_SQL,
}
