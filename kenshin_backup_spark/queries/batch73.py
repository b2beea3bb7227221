"""Batch-73 queries (round 8): LLM-corpus governance — PII scanning and
benchmark-contamination detection.

Two operations every production training-data pipeline runs before a
corpus ships, re-expressed Spark-first over the ``documents`` table:

``text_pii_scan`` — regex PII detection (emails, US-style phone
numbers, IPv4 addresses) with per-(source, lang) rollups of documents
scanned / flagged and total match counts. The synthetic testdata
contains no PII, so the scan runs over the text PLUS a deterministic
marker suffix derived from ``doc_id`` (``user<id>@example.com`` /
``555-01<id%100>`` / an IPv4 built from id bytes, one per id mod 4,
class 3 left clean) — the suffix rule is replicated in the DuckDB
oracle, so the hash match certifies the REGEX MACHINERY (extraction
counts, flag logic, rollup) with non-trivial results. The patterns use
the Java∩RE2 compatible subset (character classes, bounded repeats —
no lookarounds), so both engines match identically.

``llm_contamination_report`` — n-gram benchmark contamination: treat
the deterministic subset ``doc_id % 97 = 0`` as the held-out benchmark;
a corpus document is CONTAMINATED when it shares at least one word
3-gram with any benchmark document (3 instead of the production 8-13
because the synthetic vocabulary is ~30 words — the n is a parameter).
Per-source report: docs, benchmark docs, contaminated docs, and the
contamination rate (one double division of exact BIGINTs).

Scale notes (100 TB): the scan is a single stateless projection —
regexes evaluate scan-side inside codegen, the rollup is one shrinking
hash aggregate. Contamination is the posting-list shape shared with the
dedup tier: shingles explode scan-side, the benchmark side is tiny
(1/97 of docs) and BROADCAST onto the corpus shingles — no shuffle of
the corpus at all; the distinct-contaminated count is a hash aggregate
on doc_id. The Spark side joins on the 64-bit ``xxhash64`` of the
shingle (the oracle joins the strings; a cross-engine divergence needs
an in-document xxhash64 collision against the benchmark set —
P < n²/2⁶⁴ ≈ 1e-10 at sf0.01, the same documented bound as the dedup
tier's hashed posting lists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.sources import load_table

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "555-[0-9]{4}"
_IPV4_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"


def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scan + per-(source, lang) rollup (see module
    docstring; marker suffix makes the synthetic corpus non-trivial)."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    did = F.col("doc_id")
    marker = (
        F.when(
            did % 4 == 0,
            F.concat(F.lit(" contact user"), did, F.lit("@example.com")),
        )
        .when(
            did % 4 == 1,
            F.concat(
                F.lit(" call 555-01"),
                F.lpad((did % 100).cast("string"), 2, "0"),
            ),
        )
        .when(
            did % 4 == 2,
            F.concat(
                F.lit(" host 10."), (did % 256).cast("string"),
                F.lit(".0."), ((did * 7) % 256).cast("string"),
            ),
        )
        .otherwise(F.lit(""))
    )
    enriched = F.concat(F.col("text"), marker)
    scanned = docs.select(
        "source",
        "lang",
        F.size(F.regexp_extract_all(enriched, F.lit(_EMAIL_RE), 0))
        .alias("__em"),
        F.size(F.regexp_extract_all(enriched, F.lit(_PHONE_RE), 0))
        .alias("__ph"),
        F.size(F.regexp_extract_all(enriched, F.lit(_IPV4_RE), 0))
        .alias("__ip"),
    )
    return (
        scanned.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("docs_scanned"),
            F.sum(
                ((F.col("__em") + F.col("__ph") + F.col("__ip")) > 0)
                .cast("long")
            ).alias("docs_with_pii"),
            F.sum("__em").cast("long").alias("emails"),
            F.sum("__ph").cast("long").alias("phones"),
            F.sum("__ip").cast("long").alias("ipv4s"),
        )
        .orderBy("source", "lang")
    )


_PII_SQL = f"""
WITH enriched AS (
  SELECT source, lang,
         text || CASE
           WHEN doc_id % 4 = 0
             THEN ' contact user' || doc_id || '@example.com'
           WHEN doc_id % 4 = 1
             THEN ' call 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
           WHEN doc_id % 4 = 2
             THEN ' host 10.' || (doc_id % 256) || '.0.' || ((doc_id * 7) % 256)
           ELSE ''
         END AS t
  FROM documents WHERE text IS NOT NULL
),
scanned AS (
  SELECT source, lang,
         len(regexp_extract_all(t, '{_EMAIL_RE}')) AS em,
         len(regexp_extract_all(t, '{_PHONE_RE}')) AS ph,
         len(regexp_extract_all(t, '{_IPV4_RE}')) AS ip
  FROM enriched
)
SELECT source, lang,
       COUNT(*) AS docs_scanned,
       CAST(SUM(CASE WHEN em + ph + ip > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_pii,
       CAST(SUM(em) AS BIGINT) AS emails,
       CAST(SUM(ph) AS BIGINT) AS phones,
       CAST(SUM(ip) AS BIGINT) AS ipv4s
FROM scanned
GROUP BY source, lang
ORDER BY source, lang
"""


def llm_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination report via shared word 3-grams (see
    module docstring)."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    words = F.split(F.trim(F.col("text")), "\\s+")
    n = F.size(words)
    grams = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.xxhash64(
                F.array_join(F.slice(words, i + 1, 3), " ")
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    shingled = docs.select(
        "doc_id", "source", F.explode(grams).alias("g")
    ).distinct()
    bench = shingled.where(F.col("doc_id") % 97 == 0)
    corpus = shingled.where(F.col("doc_id") % 97 != 0)
    contaminated = (
        corpus.join(
            F.broadcast(bench.select("g").distinct()), "g", "left_semi"
        )
        .select("doc_id", "source")
        .distinct()
    )
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum((F.col("doc_id") % 97 == 0).cast("long")).alias(
            "benchmark_docs"
        ),
    )
    hits = contaminated.groupBy("source").agg(
        F.count(F.lit(1)).alias("contaminated_docs")
    )
    return (
        per_source.join(hits, "source", "left")
        .select(
            "source",
            "docs",
            "benchmark_docs",
            F.coalesce(F.col("contaminated_docs"), F.lit(0))
            .cast("long")
            .alias("contaminated_docs"),
            (
                F.coalesce(F.col("contaminated_docs"), F.lit(0))
                .cast("double")
                / (F.col("docs") - F.col("benchmark_docs")).cast("double")
            ).alias("contamination_rate"),
        )
        .orderBy("source")
    )


_CONTAMINATION_SQL = """
WITH grams AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(words[i:i+2], ' ') AS g
  FROM (
    SELECT doc_id, source,
           string_split_regex(trim(text), '\\s+') AS words
    FROM documents WHERE text IS NOT NULL
  ), UNNEST(generate_series(1, len(words) - 2)) AS t(i)
  WHERE len(words) >= 3
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
contaminated AS (
  SELECT DISTINCT c.doc_id, c.source
  FROM grams c JOIN bench b USING (g)
  WHERE c.doc_id % 97 != 0
),
per_source AS (
  SELECT source, COUNT(*) AS docs,
         CAST(SUM(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS benchmark_docs
  FROM documents WHERE text IS NOT NULL
  GROUP BY source
),
hits AS (
  SELECT source, COUNT(*) AS contaminated_docs
  FROM contaminated GROUP BY source
)
SELECT p.source, p.docs, p.benchmark_docs,
       CAST(COALESCE(h.contaminated_docs, 0) AS BIGINT)
         AS contaminated_docs,
       CAST(COALESCE(h.contaminated_docs, 0) AS DOUBLE)
         / CAST(p.docs - p.benchmark_docs AS DOUBLE) AS contamination_rate
FROM per_source p LEFT JOIN hits h ON h.source = p.source
ORDER BY p.source
"""


QUERIES = {
    "text_pii_scan": text_pii_scan,
    "llm_contamination_report": llm_contamination_report,
}

ORACLE = {
    "text_pii_scan": _PII_SQL,
    "llm_contamination_report": _CONTAMINATION_SQL,
}
