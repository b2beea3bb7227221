"""Batch-28 queries: shipping-delay percentiles, near-dup graph degree
statistics, DAU/MAU stickiness, and schema-evolution reads.

Schema evolution is the lakehouse reality check: an append-only fact dir
accumulates files written under different schema versions; the engine must
read both vintages in one scan (mergeSchema) with NULLs for the column the
old files lack — mirrored in the oracle by a UNION with an explicit NULL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL, QSUM_SQL, qsum
from kenshin_backup_spark.operators.dedup import ngram_jaccard_pairs
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")


def _stage_dir(sf_dir: str, tag: str) -> str:
    # fingerprint-keyed + stale-generation reaping (see
    # sources.tables.staged_path)
    from kenshin_backup_spark.sources.tables import staged_path

    return staged_path(sf_dir, tag)


# --- shipping delay percentiles -------------------------------------------

def lineitem_shipping_delays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment SLA panel: per order priority, the p50/p95 of
    order→ship latency in days and the slow fraction (> 60 days) —
    interpolated percentiles over integer day counts, slow-rate an exact
    integer division, the orders dim broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.select("l_orderkey", "l_shipdate").join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    )
    lat = F.datediff("l_shipdate", "o_orderdate")
    base = j.select(
        F.col("o_orderpriority").alias("priority"), lat.cast("long").alias("lat")
    )
    return base.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.percentile("lat", 0.5).alias("p50_days"),
        F.percentile("lat", 0.95).alias("p95_days"),
        (
            F.sum((F.col("lat") > 60).cast("long")).cast("double")
            / F.count(F.lit(1))
        ).alias("slow_rate"),
    )


_SLIP_SQL = """
WITH base AS (
  SELECT o.o_orderpriority AS priority,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS lat
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT priority, COUNT(*) AS n,
       quantile_cont(lat, 0.5) AS p50_days,
       quantile_cont(lat, 0.95) AS p95_days,
       CAST(SUM(CASE WHEN lat > 60 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS slow_rate
FROM base GROUP BY priority
"""


# --- near-dup graph degree distribution -----------------------------------

def dedup_graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the near-dup graph: how many documents have
    exactly d near-duplicates — the shape a curator checks before trusting
    connected-components output (a heavy tail means template families, a
    spike at high d means the threshold is too loose).

    One symmetrized explode of the pair table, two small aggregations."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=10)
    sym = pairs.select(F.col("id_a").alias("id")).unionAll(
        pairs.select(F.col("id_b").alias("id"))
    )
    degrees = sym.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
    return (
        degrees.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.col("degree").cast("long").alias("degree"),
            F.col("n_docs").cast("long").alias("n_docs"),
        )
    )


_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"

_DEGREE_SQL = f"""
WITH norm AS (
  SELECT doc_id, str_split({_NORM.format(x="text")}, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(w) - 2, 0)),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
  FROM norm
),
posting0 AS (SELECT doc_id, UNNEST(sh) AS g FROM grams),
keep AS (SELECT g FROM posting0 GROUP BY g HAVING COUNT(*) <= 10),
posting AS (SELECT doc_id, g FROM posting0 JOIN keep USING (g)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM posting GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
  FROM posting a JOIN posting b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT c.id_a, c.id_b
  FROM common c
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
  WHERE CAST(c.common AS DOUBLE) / (sa.sz + sb.sz - c.common) >= 0.2
),
sym AS (
  SELECT id_a AS id FROM pairs UNION ALL SELECT id_b AS id FROM pairs
),
degrees AS (
  SELECT id, COUNT(*) AS degree FROM sym GROUP BY id
)
SELECT degree, COUNT(*) AS n_docs FROM degrees GROUP BY degree
"""


# --- DAU / MAU stickiness --------------------------------------------------

def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product stickiness: per day, distinct daily actives over distinct
    trailing-28-day actives. The trailing distinct uses the
    contribute-forward expansion (each (user, day) pair votes for the next
    28 days — a bounded 28× explode, shuffled once on the day key), the
    same shape as the exact rolling-WAU twin; at 10^9 users/day the
    HLL-merge variant replaces it (see events_rolling_wau_hll)."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    ud = ev.select(
        "user_id", (es / 86400).cast("long").alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    votes = ud.select(
        "user_id", F.explode(F.sequence(F.col("day"), F.col("day") + 27)).alias("day")
    )
    mau = votes.groupBy("day").agg(F.countDistinct("user_id").alias("mau"))
    # keep only days that actually occur in the data (votes extend 27 past)
    return (
        dau.join(mau, "day")
        .select(
            F.col("day").cast("long").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("mau").cast("long").alias("mau"),
            (F.col("dau").cast("double") / F.col("mau")).alias("stickiness"),
        )
    )


_STICKY_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST({_ES} // 86400 AS BIGINT) AS day FROM events
),
dau AS (
  SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY day
),
votes AS (
  SELECT user_id, day + offs AS day
  FROM ud CROSS JOIN (SELECT UNNEST(generate_series(0, 27)) AS offs) o
),
mau AS (
  SELECT day, COUNT(DISTINCT user_id) AS mau FROM votes GROUP BY day
)
SELECT d.day, d.dau, m.mau, CAST(d.dau AS DOUBLE) / m.mau AS stickiness
FROM dau d JOIN mau m ON m.day = d.day
"""


# --- schema evolution read -------------------------------------------------

def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution scan: half the events land as v1 files (no
    ``value`` column), half as v2 files (with it); one ``mergeSchema``
    read covers both vintages, v1 rows surfacing NULL values. The
    aggregate counts rows and non-NULL values per type — the oracle
    replays the split with an explicit NULL union, so the merged scan is
    proven lossless.

    Scale: mergeSchema reconciles footers at planning time; data files
    are never rewritten — exactly how a 100 TB append-only table survives
    adding a column."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("es"),
        "event_type",
        "value",
    )
    path = _stage_dir(sf_dir, "schema_evo")
    if not os.path.exists(path):
        v1 = ev.where(F.col("event_id") % 2 == 0).drop("value")
        v2 = ev.where(F.col("event_id") % 2 == 1)
        v1.write.mode("overwrite").parquet(path + "/v=1")
        v2.write.mode("overwrite").parquet(path + "/v=2")
    back = spark.read.option("mergeSchema", True).parquet(
        path + "/v=1", path + "/v=2"
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("value").cast("long").alias("n_with_value"),
        qsum("value", "sum_value"),
    )


_EVO_SQL = f"""
WITH merged AS (
  SELECT event_type, CAST(NULL AS DOUBLE) AS value
  FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT event_type, value FROM events WHERE event_id % 2 = 1
)
SELECT event_type, COUNT(*) AS n_rows,
       COUNT(value) AS n_with_value,
       {QSUM_SQL.format(x="value")} AS sum_value
FROM merged GROUP BY event_type
"""


QUERIES = {
    "lineitem_shipping_delays": lineitem_shipping_delays,
    "dedup_graph_degree_stats": dedup_graph_degree_stats,
    "events_dau_mau_stickiness": events_dau_mau_stickiness,
    "source_schema_evolution": source_schema_evolution,
}

ORACLE = {
    "lineitem_shipping_delays": _SLIP_SQL,
    "dedup_graph_degree_stats": _DEGREE_SQL,
    "events_dau_mau_stickiness": _STICKY_SQL,
    "source_schema_evolution": _EVO_SQL,
}
