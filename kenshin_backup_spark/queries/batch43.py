"""Batch-43 queries (round 4): data-quality constraint checking and
deterministic A/B analysis.

- ``dq_constraint_report`` — the deequ/dbt-test shape: one declarative
  pass emitting a row per constraint (referential integrity via left-anti
  counts, key uniqueness, value-range, null-rate, temporal-span sanity)
  with checked/violation counts and a pass/fail verdict. Every check is
  an independent aggregate unioned into one report; at 100 TB each check
  is one scan + keyed anti-join or aggregate — no check ever collects,
  and unrelated checks parallelize as independent stages of one job.
- ``events_ab_assignment_balance`` — hash users into two arms
  (md5 mod 2 — seedless, reproducible, the same variate trick as the
  weighted sampler), then Welch's z for the value-mean difference from
  EXACT integer moments: one conditional aggregate over one scan, no
  join, and a result that is bit-identical in any engine (sqrt is
  IEEE-correctly-rounded; no t-distribution lookup — z only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.operators.dedup import md5_hash60
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")


def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per data-quality constraint: (check, n_checked,
    n_violations, status)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    def report(name: str, checked: DataFrame, violations: DataFrame) -> DataFrame:
        c = checked.agg(F.count(F.lit(1)).alias("n_checked"))
        v = violations.agg(F.count(F.lit(1)).alias("n_violations"))
        return (
            c.crossJoin(v)
            .select(
                F.lit(name).alias("check"),
                F.col("n_checked").cast("long").alias("n_checked"),
                F.col("n_violations").cast("long").alias("n_violations"),
                F.when(F.col("n_violations") == 0, F.lit("pass"))
                .otherwise(F.lit("fail"))
                .alias("status"),
            )
        )

    checks = [
        # referential integrity: every order's customer exists
        report(
            "orders_custkey_fk",
            orders,
            orders.join(
                customer.select("c_custkey"),
                orders.o_custkey == customer.c_custkey,
                "left_anti",
            ),
        ),
        # referential integrity: every line item's order exists
        report(
            "lineitem_orderkey_fk",
            lineitem,
            lineitem.join(
                orders.select("o_orderkey"),
                lineitem.l_orderkey == orders.o_orderkey,
                "left_anti",
            ),
        ),
        # key uniqueness
        report(
            "customer_key_unique",
            customer,
            customer.groupBy("c_custkey")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > 1),
        ),
        # value domain
        report(
            "events_value_range",
            events,
            events.where(
                F.col("value").isNull()
                | (F.col("value") < 0)
                | (F.col("value") > 1000)
            ),
        ),
        # completeness
        report(
            "documents_text_nonnull",
            docs,
            docs.where(F.col("text").isNull()),
        ),
        # quantity domain (TPC-H invariant: 1..50)
        report(
            "lineitem_quantity_domain",
            lineitem,
            lineitem.where(
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


_DQ_SQL = """
SELECT 'orders_custkey_fk' AS check,
       (SELECT COUNT(*) FROM orders) AS n_checked,
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS n_violations,
       CASE WHEN (SELECT COUNT(*) FROM orders o
                  WHERE NOT EXISTS (SELECT 1 FROM customer c
                                    WHERE c.c_custkey = o.o_custkey)) = 0
            THEN 'pass' ELSE 'fail' END AS status
UNION ALL
SELECT 'lineitem_orderkey_fk',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)),
       CASE WHEN (SELECT COUNT(*) FROM lineitem l
                  WHERE NOT EXISTS (SELECT 1 FROM orders o
                                    WHERE o.o_orderkey = l.l_orderkey)) = 0
            THEN 'pass' ELSE 'fail' END
UNION ALL
SELECT 'customer_key_unique',
       (SELECT COUNT(*) FROM customer),
       (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer
                              GROUP BY c_custkey HAVING COUNT(*) > 1)),
       CASE WHEN (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer
                                        GROUP BY c_custkey
                                        HAVING COUNT(*) > 1)) = 0
            THEN 'pass' ELSE 'fail' END
UNION ALL
SELECT 'events_value_range',
       (SELECT COUNT(*) FROM events),
       (SELECT COUNT(*) FROM events
        WHERE value IS NULL OR value < 0 OR value > 1000),
       CASE WHEN (SELECT COUNT(*) FROM events
                  WHERE value IS NULL OR value < 0 OR value > 1000) = 0
            THEN 'pass' ELSE 'fail' END
UNION ALL
SELECT 'documents_text_nonnull',
       (SELECT COUNT(*) FROM documents),
       (SELECT COUNT(*) FROM documents WHERE text IS NULL),
       CASE WHEN (SELECT COUNT(*) FROM documents WHERE text IS NULL) = 0
            THEN 'pass' ELSE 'fail' END
UNION ALL
SELECT 'lineitem_quantity_domain',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50),
       CASE WHEN (SELECT COUNT(*) FROM lineitem
                  WHERE l_quantity < 1 OR l_quantity > 50) = 0
            THEN 'pass' ELSE 'fail' END
"""


#: A/B moment quantization: whole value units (|value| ≤ ~500) keeps
#: Σq² < 2^53 up to ~3.6e10 rows per arm — see batch38 for the cast bound.
_AB_Q = 1


def events_ab_assignment_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-assign users to arms A/B, report per-arm exposure and Welch's
    z for the value-mean difference — one conditional aggregate, no join."""
    ev = load_table(spark, sf_dir, "events")
    arm = F.pmod(md5_hash60(F.col("user_id").cast("string")), F.lit(2))
    q = F.floor(F.col("value") * _AB_Q).cast("long")
    base = ev.select(arm.alias("arm"), q.alias("q"), "user_id")
    agg = base.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.countDistinct(F.when(F.col("arm") == 0, F.col("user_id"))).alias("users_a"),
        F.countDistinct(F.when(F.col("arm") == 1, F.col("user_id"))).alias("users_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("q")).otherwise(0)).alias("s1a"),
        F.sum(F.when(F.col("arm") == 1, F.col("q")).otherwise(0)).alias("s1b"),
        F.sum(F.when(F.col("arm") == 0, F.col("q") * F.col("q")).otherwise(0)).alias(
            "s2a"
        ),
        F.sum(F.when(F.col("arm") == 1, F.col("q") * F.col("q")).otherwise(0)).alias(
            "s2b"
        ),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ma = F.col("s1a").cast("double") / na
    mb = F.col("s1b").cast("double") / nb
    # unbiased sample variance from raw moments
    va = (F.col("s2a").cast("double") - na * ma * ma) / (na - F.lit(1.0))
    vb = (F.col("s2b").cast("double") - nb * mb * mb) / (nb - F.lit(1.0))
    z = (ma - mb) / F.sqrt(va / na + vb / nb)
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("users_a").cast("long").alias("users_a"),
        F.col("users_b").cast("long").alias("users_b"),
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        (ma - mb).alias("mean_diff"),
        z.alias("welch_z"),
    )


_AB_SQL = f"""
WITH base AS (
  SELECT CAST(CONCAT('0x', SUBSTRING(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 2 AS arm,
         CAST(FLOOR(value * {_AB_Q}) AS BIGINT) AS q,
         user_id
  FROM events
),
agg AS (
  SELECT SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_b,
         COUNT(DISTINCT CASE WHEN arm = 0 THEN user_id END) AS users_a,
         COUNT(DISTINCT CASE WHEN arm = 1 THEN user_id END) AS users_b,
         SUM(CASE WHEN arm = 0 THEN q ELSE 0 END) AS s1a,
         SUM(CASE WHEN arm = 1 THEN q ELSE 0 END) AS s1b,
         SUM(CASE WHEN arm = 0 THEN q * q ELSE 0 END) AS s2a,
         SUM(CASE WHEN arm = 1 THEN q * q ELSE 0 END) AS s2b
  FROM base
),
d AS (
  SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         CAST(users_a AS BIGINT) AS users_a, CAST(users_b AS BIGINT) AS users_b,
         CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
         CAST(s1a AS DOUBLE) AS s1a, CAST(s1b AS DOUBLE) AS s1b,
         CAST(s2a AS DOUBLE) AS s2a, CAST(s2b AS DOUBLE) AS s2b
  FROM agg
)
SELECT n_a, n_b, users_a, users_b,
       s1a / nad AS mean_a,
       s1b / nbd AS mean_b,
       s1a / nad - s1b / nbd AS mean_diff,
       (s1a / nad - s1b / nbd)
         / SQRT(((s2a - nad * (s1a / nad) * (s1a / nad))
                   / (nad - CAST(1 AS DOUBLE))) / nad
                + ((s2b - nbd * (s1b / nbd) * (s1b / nbd))
                   / (nbd - CAST(1 AS DOUBLE))) / nbd) AS welch_z
FROM d
"""


QUERIES = {
    "dq_constraint_report": dq_constraint_report,
    "events_ab_assignment_balance": events_ab_assignment_balance,
}

ORACLE = {
    "dq_constraint_report": _DQ_SQL,
    "events_ab_assignment_balance": _AB_SQL,
}
