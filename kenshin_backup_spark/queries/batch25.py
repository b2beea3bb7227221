"""Batch-25 queries: the two 100 TB STORAGE-LAYOUT levers as driver-visible
queries (date-partitioned writes with partition pruning; bucketed fact-fact
joins with zero-exchange plans), plus seasonal hour-of-day profiles, a
Grafana-style value heatmap, and the per-source corpus mix report.

Partition pruning and bucketing are the levers that decide whether a 100 TB
scan reads 100 TB or 300 GB; both get an oracle-checked query here (the
oracle reads the ORIGINAL parquet, so any layout/roundtrip infidelity
breaks the value hash) and a plan assertion in tests/test_plans.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import (
    EPOCH_S_SQL,
    QSUM_SQL,
    qsum,
)
from kenshin_backup_spark.sources import load_table
from kenshin_backup_spark.sources.bucketed import bucketed_join, write_bucketed

_ES = EPOCH_S_SQL.format(x="ts")


def _stage_dir(sf_dir: str, tag: str) -> str:
    # fingerprint-keyed + stale-generation reaping (see
    # sources.tables.staged_path)
    from kenshin_backup_spark.sources.tables import staged_path

    return staged_path(sf_dir, tag)


# --- date-partitioned layout + partition pruning --------------------------

def source_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage events PARTITIONED BY event_date (the production layout for an
    append-only fact table), read back with a date predicate, aggregate.

    The date filter prunes at the DIRECTORY level — a 100 TB table scans
    only the matched partitions (plan-asserted in test_plans.py). The
    oracle applies the same predicate to the original parquet, so pruning
    must lose no rows.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("es"),
        "event_type",
        "value",
    ).withColumn(
        # tz-free date: pure integer epoch-day arithmetic in both engines
        "event_date",
        F.date_add(F.lit("1970-01-01").cast("date"), (F.col("es") / 86400).cast("int")),
    )
    path = _stage_dir(sf_dir, "part_by_date")
    if not os.path.exists(path):
        ev.write.mode("overwrite").partitionBy("event_date").parquet(path)
    back = spark.read.parquet(path)
    lo, hi = "2024-01-10", "2024-01-12"
    return (
        back.where(F.col("event_date").between(lo, hi))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            qsum("value", "sum_value"),
            F.min("es").cast("long").alias("min_es"),
            F.max("es").cast("long").alias("max_es"),
        )
    )


_PRUNE_SQL = f"""
WITH ev AS (
  SELECT event_type, value, CAST({_ES} AS BIGINT) AS es,
         DATE '1970-01-01' + CAST({_ES} // 86400 AS INTEGER) AS event_date
  FROM events
)
SELECT event_type, COUNT(*) AS n,
       {QSUM_SQL.format(x="value")} AS sum_value,
       MIN(es) AS min_es, MAX(es) AS max_es
FROM ev
WHERE event_date BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
GROUP BY event_type
"""


# --- bucketed fact-fact join ----------------------------------------------

def source_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders over CO-BUCKETED tables: both facts are written
    ``bucketBy(8, orderkey)`` once, and the join plans with zero shuffle
    exchanges (asserted in test_bucketing.py) — the write-once/read-many
    trade that removes the dominant shuffle of every fact-fact join at
    100 TB. Oracle joins the original parquet, proving the bucketed layout
    is lossless."""
    safe = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    lt, ot = f"li_b25_{safe}", f"ord_b25_{safe}"
    if not spark.catalog.tableExists(lt) or not spark.catalog.tableExists(ot):
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        write_bucketed(
            li, lt, key="l_orderkey", buckets=8, path=_stage_dir(sf_dir, lt)
        )
        write_bucketed(
            orders, ot, key="o_orderkey", buckets=8, path=_stage_dir(sf_dir, ot)
        )
    j = bucketed_join(spark, lt, ot, ("l_orderkey", "o_orderkey"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        qsum(revenue, "revenue"),
    )


_BUCKET_SQL = f"""
SELECT o.o_orderpriority, COUNT(*) AS n_items,
       {QSUM_SQL.format(x="l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


# --- seasonal hour-of-day profile -----------------------------------------

def tsdb_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per metric: the 24-slot average that
    seasonal-naive forecasting and timeStack() panels subtract. Hour is
    computed in pure epoch arithmetic ((es % 86400) / 3600 — no timezone),
    and the profile is one partial-aggregated pass: 24 rows per metric out
    of any number of raw points."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    return (
        ev.select(
            F.col("event_type").alias("metric"),
            ((es % 86400) / 3600).cast("long").alias("hod"),
            "value",
        )
        .groupBy("metric", "hod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            qsum("value", "sum_value"),
        )
        .withColumn("avg_value", F.col("sum_value") / F.col("n"))
    )


_SEASON_SQL = f"""
SELECT event_type AS metric,
       (CAST({_ES} AS BIGINT) % 86400) // 3600 AS hod,
       COUNT(*) AS n,
       {QSUM_SQL.format(x="value")} AS sum_value,
       {QSUM_SQL.format(x="value")} / COUNT(*) AS avg_value
FROM events
GROUP BY 1, 2
"""


# --- value-band heatmap ----------------------------------------------------

def tsdb_heatmap_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grafana heatmap: count of points per (1h time bucket, value band of
    width 50). Banding is integer arithmetic on FLOOR(value), so both
    engines band identically; output is a fixed small grid regardless of
    input row count — the classic pre-aggregation for dashboard render."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    band = (F.floor("value").cast("long") / 50).cast("long") * 50
    return (
        ev.select(
            ((es / 3600).cast("long") * 3600).alias("bucket_ts"),
            band.alias("value_band"),
        )
        .groupBy("bucket_ts", "value_band")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_HEAT_SQL = f"""
SELECT (CAST({_ES} AS BIGINT) // 3600) * 3600 AS bucket_ts,
       (CAST(FLOOR(value) AS BIGINT) // 50) * 50 AS value_band,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2
"""


# --- per-source corpus mix report -----------------------------------------

def llm_corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus card: per source — document count, exact-unique count
    (distinct md5 fingerprint), total whitespace tokens, and how many docs
    pass the word-count band — the one-screen summary a dataset curator
    reads before mixing sources into a training run.

    Scale: one pass, everything partial-aggregated; distinct fingerprints
    via count_distinct over the 32-byte md5 (scan-side hash)."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    base = docs.select(
        "source",
        F.md5(norm).alias("fp"),
        F.size(F.split(norm, " ")).alias("nw"),
    )
    return base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_unique"),
        F.sum("nw").cast("long").alias("total_tokens"),
        F.sum(((F.col("nw") >= 10) & (F.col("nw") <= 100000)).cast("long"))
        .cast("long")
        .alias("n_wc_ok"),
    )


_MIX_SQL = """
WITH base AS (
  SELECT source,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
         len(str_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS nw
  FROM documents WHERE text IS NOT NULL
)
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT fp) AS n_unique,
       CAST(SUM(nw) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN nw >= 10 AND nw <= 100000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_wc_ok
FROM base GROUP BY source
"""


QUERIES = {
    "source_partitioned_pruning": source_partitioned_pruning,
    "source_bucketed_join": source_bucketed_join,
    "tsdb_seasonal_profile": tsdb_seasonal_profile,
    "tsdb_heatmap_buckets": tsdb_heatmap_buckets,
    "llm_corpus_mix_report": llm_corpus_mix_report,
}

ORACLE = {
    "source_partitioned_pruning": _PRUNE_SQL,
    "source_bucketed_join": _BUCKET_SQL,
    "tsdb_seasonal_profile": _SEASON_SQL,
    "tsdb_heatmap_buckets": _HEAT_SQL,
    "llm_corpus_mix_report": _MIX_SQL,
}
