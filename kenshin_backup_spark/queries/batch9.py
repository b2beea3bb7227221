"""Batch-9 queries: the remaining TPC-H query shapes, adapted to the
driver's star schema (FIXTURES.md — no ``partsupp`` table, no
``l_shipmode``/``l_commitdate``, so Q2/Q9/Q11/Q16/Q20 use lineitem-derived
supplier-part relations and Q12 uses ship-lag instead of ship-mode).

Every query follows the determinism contract (functions/deterministic.py):
float sums quantized to BIGINT before aggregation, ratio thresholds
compared in integer space (``val*200 > total`` instead of ``val/total >
0.005``) so the oracle hash is exact, and arg-min tie-breaks are explicit.

Scale notes (100 TB): all dim joins (supplier/nation/region/part/customer)
are broadcast; the only shuffles are the per-key aggregations on the fact
table, which Spark executes partial→final. The window-over-() global
totals (Q11/Q15/Q20) reduce a *pre-aggregated* frame (|parts| or
|suppliers| rows, not |lineitem|), so the single-partition window is over
a small frame — at true scale that frame is ≤ |distinct keys|, and the
threshold comparison stays integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import (
    EPOCH_S_SQL,
    QSUM_SQL,
    qsum,
)
from kenshin_backup_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _qlong(col: F.Column) -> F.Column:
    """Per-row quantized BIGINT term — the associative building block."""
    return F.floor(col * 1000000).cast("long")


# --- TPC-H Q2 shape: min-cost supplier per part (argmin via struct-min) ---

def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each LARGE part shipped by a EUROPE supplier, the supplier with
    the lowest observed unit cost (qsum(price)/qsum(qty) — two exact BIGINT
    sums, one double division; tie-break min suppkey)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "LARGE")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    sup_eu = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    per_pair = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup_eu), li.l_suppkey == sup_eu.s_suppkey)
        .groupBy("p_partkey", "s_suppkey", "s_name", "n_name")
        .agg(
            F.sum(_qlong(F.col("l_extendedprice"))).alias("price_l"),
            F.sum(_qlong(F.col("l_quantity"))).alias("qty_l"),
        )
        .withColumn(
            "unit_cost",
            (F.col("price_l").cast("double") / F.col("qty_l").cast("double")),
        )
    )
    best = per_pair.groupBy("p_partkey").agg(
        F.min(F.struct("unit_cost", "s_suppkey", "s_name", "n_name")).alias("b")
    )
    return best.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.col("b.unit_cost").cast("double").alias("unit_cost"),
        F.col("b.s_suppkey").cast("long").alias("s_suppkey"),
        F.col("b.s_name").alias("s_name"),
        F.col("b.n_name").alias("n_name"),
    )


_Q2_SQL = """
WITH per_pair AS (
  SELECT p_partkey, s_suppkey, s_name, n_name,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 1000000) AS BIGINT)) AS DOUBLE)
           / CAST(SUM(CAST(FLOOR(l_quantity * 1000000) AS BIGINT)) AS DOUBLE)
           AS unit_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'LARGE'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
  GROUP BY 1, 2, 3, 4
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_partkey
              ORDER BY unit_cost ASC, s_suppkey ASC, s_name ASC, n_name ASC) AS rn
  FROM per_pair
)
SELECT p_partkey, unit_cost, s_suppkey, s_name, n_name
FROM ranked WHERE rn = 1
"""


# --- TPC-H Q9 shape: profit by supplier nation and order year -------------

def tpch_q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of PROMO parts grouped by supplier nation and order year
    (Q9 without ps_supplycost — the driver schema has no partsupp)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(qsum(rev, "profit"), F.count(F.lit(1)).alias("n_lines"))
    )


_Q9_SQL = f"""
SELECT n_name,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       {QSUM_SQL.format(x="l_extendedprice * (1 - l_discount)")} AS profit,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""


# --- TPC-H Q11 shape: important parts (global-share threshold) ------------

def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose shipped value from ASIA suppliers exceeds 0.05% of the
    total — the share test runs in exact integer space
    (``val_long * 2000 > total_long``), so no float threshold ambiguity.
    The 1/2000 share mirrors TPC-H Q11's SF-relative fraction intent
    (0.0001/SF): at the driver's sf0.01 it yields a non-trivial result
    set (~935 parts) instead of the vacuous 0 rows the old 0.5% cut
    produced, so the driver hash certifies real values."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    sup_asia = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey")
    )
    per_part = (
        li.join(F.broadcast(sup_asia), li.l_suppkey == sup_asia.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_qlong(F.col("l_extendedprice"))).alias("val_l"))
    )
    # Broadcast-scalar threshold: a 1-row global aggregate cross-joined in,
    # not an unpartitioned window (which would single-partition per_part).
    total = per_part.agg(F.sum("val_l").alias("total_l"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("val_l") * 2000 > F.col("total_l"))
        .select(
            F.col("l_partkey").cast("long").alias("l_partkey"),
            (F.col("val_l").cast("double") / 1000000.0).alias("part_value"),
        )
    )


_Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(FLOOR(l_extendedprice * 1000000) AS BIGINT)) AS val_l
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
  GROUP BY 1
)
SELECT l_partkey,
       CAST(val_l AS DOUBLE) / 1000000.0 AS part_value
FROM (SELECT *, SUM(val_l) OVER () AS total_l FROM per_part)
WHERE val_l * 2000 > total_l
"""


# --- TPC-H Q12 shape: ship-lag buckets by priority class ------------------

def tpch_q12_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 without l_shipmode: bucket order→ship lag into 30-day bands and
    count high- vs low-priority orders per band (floor-double division is
    the same IEEE op in both engines)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    lag_days = F.floor(
        (F.unix_timestamp("l_shipdate").cast("long")
         - F.unix_timestamp("o_orderdate").cast("long")).cast("double")
        / 86400.0
    )
    band = F.floor(lag_days.cast("double") / 30.0).cast("long")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.select(band.alias("lag_band"), is_high.alias("hi"))
        .groupBy("lag_band")
        .agg(
            F.sum(F.when(F.col("hi"), 1).otherwise(0)).cast("long").alias("high_count"),
            F.sum(F.when(F.col("hi"), 0).otherwise(1)).cast("long").alias("low_count"),
        )
    )


_ES_SHIP = EPOCH_S_SQL.format(x="l_shipdate")
_ES_ORD = EPOCH_S_SQL.format(x="o_orderdate")

_Q12_SQL = f"""
SELECT CAST(FLOOR(CAST(FLOOR(CAST({_ES_SHIP} - {_ES_ORD} AS DOUBLE) / 86400.0)
                  AS DOUBLE) / 30.0) AS BIGINT) AS lag_band,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# --- TPC-H Q13: customer order-count distribution -------------------------

def tpch_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join keeps zero-order customers; double group-by yields the
    distribution. Excludes 'P' (pending) orders as the comment-filter
    adaptation."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") != "P")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .select(F.col("c_count").cast("long").alias("c_count"), "custdist")
    )


_Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'P'
  GROUP BY 1
)
SELECT c_count, COUNT(*) AS custdist FROM per_cust GROUP BY 1
"""


# --- TPC-H Q15: top supplier(s) by quarterly revenue ----------------------

def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose 1996-Q1 revenue equals the maximum — the equality
    test runs on the exact BIGINT revenue, so ties are handled identically
    in both engines (original Q15's view-with-max shape)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(F.sum(_qlong(rev)).alias("rev_l"))
    # Broadcast-scalar max instead of an unpartitioned window over per_supp.
    mx = per_supp.agg(F.max("rev_l").alias("max_l"))
    top = per_supp.crossJoin(F.broadcast(mx)).where(F.col("rev_l") == F.col("max_l"))
    return top.join(F.broadcast(supp), top.l_suppkey == supp.s_suppkey).select(
        F.col("s_suppkey").cast("long").alias("s_suppkey"),
        "s_name",
        (F.col("rev_l").cast("double") / 1000000.0).alias("total_revenue"),
    )


_Q15_SQL = """
WITH per_supp AS (
  SELECT l_suppkey,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) AS rev_l
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(rev_l AS DOUBLE) / 1000000.0 AS total_revenue
FROM (SELECT *, MAX(rev_l) OVER () AS max_l FROM per_supp)
JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_l = max_l
"""


# --- TPC-H Q16 shape: supplier-relation counts per brand/type/size --------

def tpch_q16_supplier_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, type, size) from the lineitem-derived
    supplier-part relation (no partsupp in the driver schema); suppliers
    with negative account balance are excluded via anti join (the
    'complaints' exclusion of the original)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    rel = (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
    )
    return (
        rel.groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# --- TPC-H Q19: disjunctive predicate revenue -----------------------------

def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three OR'd brand/size/quantity bands — exercises disjunct pushdown
    and broadcast join under a non-trivial residual predicate."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#3") & sz.between(1, 15) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#7") & sz.between(10, 30) & q.between(5, 25))
        | ((F.col("p_brand") == "Brand#15") & sz.between(20, 50) & q.between(1, 15))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.where(cond).agg(
        qsum(rev, "revenue"), F.count(F.lit(1)).alias("n_lines")
    )


_Q19_SQL = f"""
SELECT {QSUM_SQL.format(x="l_extendedprice * (1 - l_discount)")} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 5 AND 25)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 1 AND 15)
"""


# --- TPC-H Q20 shape: dominant-share suppliers ----------------------------

def tpch_q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped more than half of some part's total quantity
    (Q20's excess-availability semi-join without ps_availqty). Share test
    in exact integer space: ``qty_l * 2 > total_l``."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    per_pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_qlong(F.col("l_quantity"))).alias("qty_l")
    )
    total = F.sum("qty_l").over(W.partitionBy("l_partkey"))
    dominant = (
        per_pair.withColumn("total_l", total)
        .where(F.col("qty_l") * 2 > F.col("total_l"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "n_name",
        )
    )


_Q20_SQL = """
WITH per_pair AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(FLOOR(l_quantity * 1000000) AS BIGINT)) AS qty_l
  FROM lineitem GROUP BY 1, 2
), dominant AS (
  SELECT DISTINCT l_suppkey
  FROM (SELECT *, SUM(qty_l) OVER (PARTITION BY l_partkey) AS total_l FROM per_pair)
  WHERE qty_l * 2 > total_l
)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
"""


QUERIES = {
    "tpch_q2_min_cost_supplier": tpch_q2_min_cost_supplier,
    "tpch_q9_profit_by_nation_year": tpch_q9_profit_by_nation_year,
    "tpch_q11_important_parts": tpch_q11_important_parts,
    "tpch_q12_ship_lag": tpch_q12_ship_lag,
    "tpch_q13_order_count_distribution": tpch_q13_order_count_distribution,
    "tpch_q15_top_supplier": tpch_q15_top_supplier,
    "tpch_q16_supplier_relation": tpch_q16_supplier_relation,
    "tpch_q19_disjunctive_revenue": tpch_q19_disjunctive_revenue,
    "tpch_q20_dominant_suppliers": tpch_q20_dominant_suppliers,
}

ORACLE = {
    "tpch_q2_min_cost_supplier": _Q2_SQL,
    "tpch_q9_profit_by_nation_year": _Q9_SQL,
    "tpch_q11_important_parts": _Q11_SQL,
    "tpch_q12_ship_lag": _Q12_SQL,
    "tpch_q13_order_count_distribution": _Q13_SQL,
    "tpch_q15_top_supplier": _Q15_SQL,
    "tpch_q16_supplier_relation": _Q16_SQL,
    "tpch_q19_disjunctive_revenue": _Q19_SQL,
    "tpch_q20_dominant_suppliers": _Q20_SQL,
}
