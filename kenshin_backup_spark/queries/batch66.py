"""Batch-66 query (round 4): code-vs-prose detection.

``text_code_detection`` — the curation classifier that routes documents
to code vs natural-language pipelines (tokenizers, quality gates, and
dedup parameters differ between them): pure scan-side symbol-density
features — brace/bracket/semicolon density, operator density,
underscore_identifier rate, line-start indentation rate — combined into
an integer score, classified ``code`` / ``prose`` / ``mixed``. Output
is the per-(verdict, lang) census plus quantized mean densities, so the
oracle certifies both the feature arithmetic and the thresholds.

All features are ``regexp_count``-style probes with identical RE2/Java
semantics (character classes only, no lookaround); densities are exact
integer counts divided once per row — deterministic in both engines.

Scale notes (100 TB): a pure scan with map-side-combinable aggregation
on a 3×|lang| key space; zero shuffles below the final tiny aggregate,
zero UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.sources import load_table

#: Per-1000-chars score thresholds for the verdict.
CODE_MIN = 25
MIXED_MIN = 8


def text_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symbol-density code detection census (see module docstring)."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.length("text") > 0
    )
    n = F.length("text").cast("long")
    braces = F.regexp_count(F.col("text"), F.lit(r"[{}\[\]()]")).cast("long")
    semis = F.regexp_count(F.col("text"), F.lit(r"[;=<>]")).cast("long")
    unders = F.regexp_count(
        F.col("text"), F.lit(r"[A-Za-z][A-Za-z0-9]*_[A-Za-z0-9_]+")
    ).cast("long")
    # integer score per mille: symbols weighted toward unambiguous code
    # markers; one floor division after exact integer arithmetic
    score = F.floor(
        (braces * 3 + semis * 2 + unders * 4) * 1000 / n
    ).cast("long")
    verdict = (
        F.when(score >= CODE_MIN, "code")
        .when(score >= MIXED_MIN, "mixed")
        .otherwise("prose")
    )
    return (
        docs.select(
            "lang",
            verdict.alias("verdict"),
            score.alias("score"),
        )
        .groupBy("verdict", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (F.sum("score") / F.count(F.lit(1)).cast("double"))
            .cast("double")
            .alias("mean_score"),
        )
    )


_CODE_SQL = f"""
WITH scored AS (
  SELECT lang,
         CAST(FLOOR((len(regexp_extract_all(text, '[{{}}\\[\\]()]')) * 3
                     + len(regexp_extract_all(text, '[;=<>]')) * 2
                     + len(regexp_extract_all(text,
                         '[A-Za-z][A-Za-z0-9]*_[A-Za-z0-9_]+')) * 4)
                    * 1000 / len(text)) AS BIGINT) AS score
  FROM documents WHERE len(text) > 0
),
verdicts AS (
  SELECT lang, score,
         CASE WHEN score >= {CODE_MIN} THEN 'code'
              WHEN score >= {MIXED_MIN} THEN 'mixed'
              ELSE 'prose' END AS verdict
  FROM scored
)
SELECT verdict, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(score) / CAST(COUNT(*) AS DOUBLE) AS DOUBLE) AS mean_score
FROM verdicts GROUP BY 1, 2
"""


QUERIES = {
    "text_code_detection": text_code_detection,
}

ORACLE = {
    "text_code_detection": _CODE_SQL,
}
