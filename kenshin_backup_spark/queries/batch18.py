"""Batch-18 queries: null-safe equality joins, Bollinger bands (moving
mean ± 2σ with frame-exact integer moments), suffix-sum frames, and the
two-tier LSH-candidate → exact-verify dedup pipeline.

Bollinger bands reuse the double-quantization trick from the z-score
query (1e3 scale for the squares) but over ROWS frames, so every
window's mean/σ come from exact BIGINT frame sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")


# --- null-safe equality join ----------------------------------------------

def join_null_safe_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers bucketed by their (possibly absent) latest order status,
    then joined null-safely (<=> / IS NOT DISTINCT FROM) against the
    status dimension INCLUDING the null bucket — the join class plain
    equality silently drops."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    latest = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(
                F.struct(
                    F.unix_timestamp("o_orderdate").cast("long").alias("ts"),
                    F.col("o_orderkey").alias("k"),
                    F.col("o_orderstatus").alias("s"),
                )
            )["s"].alias("status")
        )
    )
    with_status = cust.join(
        latest, cust.c_custkey == latest.o_custkey, "left"
    ).select("c_custkey", "status")
    dim = with_status.select("status").distinct().withColumn(
        "status_label", F.coalesce("status", F.lit("<never-ordered>"))
    )
    return (
        with_status.alias("a")
        .join(dim.alias("d"), F.col("a.status").eqNullSafe(F.col("d.status")))
        .groupBy("status_label")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_custkey").cast("long").alias("min_custkey"),
        )
    )


_NULLSAFE_SQL = """
WITH latest AS (
  SELECT o_custkey, s AS status FROM (
    SELECT o_custkey, o_orderstatus AS s,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
             ORDER BY CAST(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 1000 AS BIGINT) DESC,
                      o_orderkey DESC, o_orderstatus DESC) AS rn
    FROM orders) t
  WHERE rn = 1
),
with_status AS (
  SELECT c_custkey, latest.status FROM customer
  LEFT JOIN latest ON c_custkey = o_custkey
),
dim AS (
  SELECT DISTINCT status, COALESCE(status, '<never-ordered>') AS status_label
  FROM with_status
)
SELECT status_label, COUNT(*) AS n_customers, MIN(c_custkey) AS min_custkey
FROM with_status a JOIN dim d ON a.status IS NOT DISTINCT FROM d.status
GROUP BY 1
"""


# --- Bollinger bands -------------------------------------------------------

def tsdb_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving mean ± 2 population σ over the last 20 points per metric —
    the alert-threshold render op. Frame sums of q (1e3 scale) and q² are
    exact BIGINTs; mean/σ/bands are then identical doubles."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    staged = ev.select(
        F.col("event_type").alias("metric"),
        F.col("event_id").cast("long").alias("event_id"),
        es.alias("es"),
        "value",
        F.floor(F.col("value") * 1000).cast("long").alias("q"),
    )
    w = W.partitionBy("metric").orderBy("es", "event_id").rowsBetween(-19, 0)
    n = F.count("q").over(w).cast("double")
    s1 = F.sum("q").over(w).cast("double")
    s2 = F.sum(F.col("q") * F.col("q")).over(w).cast("double")
    mean = s1 / n / 1000.0
    var = (s2 / n - (s1 / n) * (s1 / n)) / 1000000.0
    sd = F.sqrt(F.when(var > 0, var).otherwise(F.lit(0.0)))
    return staged.select(
        "metric",
        "event_id",
        "es",
        F.col("value").cast("double").alias("value"),
        mean.cast("double").alias("mid"),
        (mean + 2 * sd).cast("double").alias("upper"),
        (mean - 2 * sd).cast("double").alias("lower"),
    )


_BOLL_SQL = f"""
WITH staged AS (
  SELECT event_type AS metric, event_id, value,
         CAST({_ES} AS BIGINT) AS es,
         CAST(FLOOR(value * 1000) AS BIGINT) AS q
  FROM events
), framed AS (
  SELECT metric, event_id, es, value,
         CAST(COUNT(q) OVER w AS DOUBLE) AS n,
         CAST(SUM(q) OVER w AS DOUBLE) AS s1,
         CAST(SUM(q * q) OVER w AS DOUBLE) AS s2
  FROM staged
  WINDOW w AS (PARTITION BY metric ORDER BY es, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT metric, event_id, es, value,
       s1 / n / 1000.0 AS mid,
       s1 / n / 1000.0 + 2 * sqrt(CASE WHEN (s2 / n - (s1 / n) * (s1 / n)) / 1000000.0 > 0
            THEN (s2 / n - (s1 / n) * (s1 / n)) / 1000000.0 ELSE 0.0 END) AS upper,
       s1 / n / 1000.0 - 2 * sqrt(CASE WHEN (s2 / n - (s1 / n) * (s1 / n)) / 1000000.0 > 0
            THEN (s2 / n - (s1 / n) * (s1 / n)) / 1000000.0 ELSE 0.0 END) AS lower
FROM framed
"""


# --- suffix sums (unbounded-following frames) -----------------------------

def window_suffix_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining-revenue-to-date per customer: suffix sums via the
    CURRENT ROW → UNBOUNDED FOLLOWING frame (the mirror of the running
    total, used for burn-down reports)."""
    orders = load_table(spark, sf_dir, "orders")
    staged = orders.select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.unix_timestamp("o_orderdate").cast("long").alias("od"),
        F.floor(F.col("o_totalprice") * 1000000).cast("long").alias("q"),
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("od", "o_orderkey")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    return staged.select(
        "o_custkey",
        "o_orderkey",
        "od",
        (F.sum("q").over(w) / 1000000.0).cast("double").alias("remaining_revenue"),
        F.count("q").over(w).cast("long").alias("remaining_orders"),
    )


_SUFFIX_SQL = """
WITH staged AS (
  SELECT o_custkey, o_orderkey,
         CAST(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) // 1000 AS BIGINT) AS od,
         CAST(FLOOR(o_totalprice * 1000000) AS BIGINT) AS q
  FROM orders
)
SELECT o_custkey, o_orderkey, od,
       CAST(SUM(q) OVER w AS DOUBLE) / 1000000.0 AS remaining_revenue,
       CAST(COUNT(q) OVER w AS BIGINT) AS remaining_orders
FROM staged
WINDOW w AS (PARTITION BY o_custkey ORDER BY od, o_orderkey
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
"""


# --- two-tier dedup: LSH candidates → exact verification ------------------

def dedup_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production near-dup shape: MinHash-LSH proposes candidate
    pairs (near-linear), exact shingle Jaccard verifies them (quadratic
    work only on candidates). Output keeps verified pairs ≥ 0.2. Candidate
    recall is probabilistic → rows-only; the verification arithmetic
    itself is the oracle-checked ngram_jaccard_pairs."""
    from kenshin_backup_spark.operators.dedup import (
        minhash_lsh_dupes,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    cands = minhash_lsh_dupes(docs, jaccard_threshold=0.2).select("id_a", "id_b")
    exact = ngram_jaccard_pairs(docs, n=3, threshold=0.0)
    return (
        cands.join(exact, ["id_a", "id_b"])
        .where(F.col("jaccard") >= 0.2)
        .select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
            F.col("jaccard").cast("double").alias("jaccard"),
        )
    )


QUERIES = {
    "join_null_safe_status": join_null_safe_status,
    "tsdb_bollinger_bands": tsdb_bollinger_bands,
    "window_suffix_revenue": window_suffix_revenue,
    "dedup_lsh_verified": dedup_lsh_verified,
}

ORACLE = {
    "join_null_safe_status": _NULLSAFE_SQL,
    "tsdb_bollinger_bands": _BOLL_SQL,
    "window_suffix_revenue": _SUFFIX_SQL,
    # dedup_lsh_verified: LSH candidate recall is probabilistic → rows-only.
}
