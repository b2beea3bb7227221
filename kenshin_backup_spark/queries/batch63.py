"""Batch-63 queries (round 4): data-governance tier.

- ``gdpr_erasure_audit`` — the right-to-be-forgotten dry-run every lake
  needs before executing deletes: a deterministic tombstone predicate
  (here ``user_id % 97 == 0`` / ``c_custkey % 97 == 0`` standing in for
  an erasure-request list) audited across every table that carries the
  subject key. One row per (table, metric): rows scanned, rows to erase,
  erase share. The real delete is a partition-rewrite anti-join (the
  ``upsert_latest_state`` machinery); this query is the audit gate in
  front of it.
- ``orders_duplicate_payments`` — relational near-dup detection (the
  fraud-ops cousin of document dedup): candidate duplicate payments =
  same customer, order dates within 7 days, order totals within 10%
  relative difference (continuous synthetic amounts never collide
  exactly — an equality key would be a trivially-empty report). The
  join is an equi-join on custkey with the window/amount checks as
  post-join filters; per-customer order counts are small and bounded,
  so the intra-key pairing is O(k²) with tiny k — never a cross join
  across customers.

Scale notes (100 TB): the audit is a pure scan with conditional counts
(map-side combine, one row out per table); the duplicate-payment join
shuffles on a compound key whose groups are tiny (a customer rarely
repeats an exact amount), the classic trick for relational near-dup at
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.sources import load_table

ERASE_MOD = 97
DUP_WINDOW_DAYS = 7
DUP_AMOUNT_TOL = 0.10


def gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erasure dry-run audit across subject-keyed tables."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def audit(df: DataFrame, table: str, key: str) -> DataFrame:
        hit = (F.col(key) % ERASE_MOD == 0).cast("long")
        return df.agg(
            F.lit(table).alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(hit).cast("long").alias("n_erase"),
            (F.sum(hit) / F.count(F.lit(1)).cast("double"))
            .cast("double")
            .alias("erase_share"),
        )

    return (
        audit(ev, "events", "user_id")
        .unionAll(audit(orders, "orders", "o_custkey"))
        .unionAll(audit(cust, "customer", "c_custkey"))
    )


_ERASURE_SQL = f"""
SELECT 'events' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN user_id % {ERASE_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_erase,
       CAST(SUM(CASE WHEN user_id % {ERASE_MOD} = 0 THEN 1 ELSE 0 END)
            / CAST(COUNT(*) AS DOUBLE) AS DOUBLE) AS erase_share
FROM events
UNION ALL
SELECT 'orders', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o_custkey % {ERASE_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN o_custkey % {ERASE_MOD} = 0 THEN 1 ELSE 0 END)
            / CAST(COUNT(*) AS DOUBLE) AS DOUBLE)
FROM orders
UNION ALL
SELECT 'customer', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN c_custkey % {ERASE_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN c_custkey % {ERASE_MOD} = 0 THEN 1 ELSE 0 END)
            / CAST(COUNT(*) AS DOUBLE) AS DOUBLE)
FROM customer
"""


def orders_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate duplicate payments (see module docstring)."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    a, b = base.alias("a"), base.alias("b")
    rel_diff = F.abs(
        F.col("a.o_totalprice") - F.col("b.o_totalprice")
    ) / F.greatest(F.col("a.o_totalprice"), F.col("b.o_totalprice"))
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .where(
            (
                F.abs(
                    F.datediff(
                        F.col("a.o_orderdate"), F.col("b.o_orderdate")
                    )
                )
                <= DUP_WINDOW_DAYS
            )
            & (rel_diff <= DUP_AMOUNT_TOL)
        )
        .select(
            F.col("a.o_custkey").cast("long").alias("custkey"),
            F.col("a.o_orderkey").cast("long").alias("orderkey_a"),
            F.col("b.o_orderkey").cast("long").alias("orderkey_b"),
            rel_diff.cast("double").alias("amount_diff_rel"),
            F.abs(
                F.datediff(F.col("a.o_orderdate"), F.col("b.o_orderdate"))
            )
            .cast("long")
            .alias("days_apart"),
        )
    )


_DUP_PAY_SQL = f"""
SELECT CAST(a.o_custkey AS BIGINT) AS custkey,
       CAST(a.o_orderkey AS BIGINT) AS orderkey_a,
       CAST(b.o_orderkey AS BIGINT) AS orderkey_b,
       CAST(abs(a.o_totalprice - b.o_totalprice)
            / greatest(a.o_totalprice, b.o_totalprice) AS DOUBLE)
         AS amount_diff_rel,
       CAST(abs(datediff('day', CAST(b.o_orderdate AS DATE),
                         CAST(a.o_orderdate AS DATE))) AS BIGINT) AS days_apart
FROM orders a
JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
WHERE abs(datediff('day', CAST(b.o_orderdate AS DATE),
                   CAST(a.o_orderdate AS DATE))) <= {DUP_WINDOW_DAYS}
  AND abs(a.o_totalprice - b.o_totalprice)
      / greatest(a.o_totalprice, b.o_totalprice) <= {DUP_AMOUNT_TOL}
"""


QUERIES = {
    "gdpr_erasure_audit": gdpr_erasure_audit,
    "orders_duplicate_payments": orders_duplicate_payments,
}

ORACLE = {
    "gdpr_erasure_audit": _ERASURE_SQL,
    "orders_duplicate_payments": _DUP_PAY_SQL,
}
