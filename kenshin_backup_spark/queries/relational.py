"""Relational surface queries (SURVEY.md §2.4–2.6).

The reference has no relational algebra (SURVEY §2 preamble); this is the
engine surface the driver's star schema exercises: joins (J1–J5), group-bys
and grouping sets (A9), window functions (W1–W3), set ops (W5), and the
scalar families (§2.6). All pure Spark built-ins — zero UDFs — so every
query is whole-stage-codegen'd and Catalyst-optimized.

Scale notes (100 TB): dim joins use explicit ``broadcast()`` hints
(region/nation/supplier/customer/part are broadcast-sized at every SF —
FIXTURES.md); fact-fact joins shuffle on their join key and rely on AQE for
skew; every filter is a pushable predicate on scan columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import (
    EPOCH_S_SQL,
    QAVG_SQL,
    QSUM_SQL,
    qavg,
    qsum,
)
from kenshin_backup_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- TPC-H Q1: pricing summary (groupBy + 8 aggs) -------------------------

def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            qsum("l_quantity", "sum_qty"),
            qsum("l_extendedprice", "sum_base_price"),
            qsum(disc_price, "sum_disc_price"),
            qsum(charge, "sum_charge"),
            qavg("l_quantity", "avg_qty"),
            qavg("l_extendedprice", "avg_price"),
            qavg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {QSUM_SQL.format(x="l_quantity")} AS sum_qty,
       {QSUM_SQL.format(x="l_extendedprice")} AS sum_base_price,
       {QSUM_SQL.format(x="l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       {QSUM_SQL.format(x="l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       {QAVG_SQL.format(x="l_quantity")} AS avg_qty,
       {QAVG_SQL.format(x="l_extendedprice")} AS avg_price,
       {QAVG_SQL.format(x="l_discount")} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- TPC-H Q3: shipping priority (3-way join + top-k) ---------------------

def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1997-06-15").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(qsum(revenue, "revenue"))
        .select(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            F.unix_timestamp("o_orderdate").cast("long").alias("o_orderdate_ts"),
            "o_orderpriority",
            "revenue",
        )
    )
    return agg.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)


_Q3_SQL = f"""
SELECT l_orderkey,
       {EPOCH_S_SQL.format(x="o_orderdate")} AS o_orderdate_ts,
       o_orderpriority,
       {QSUM_SQL.format(x="l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-06-15 00:00:00'
GROUP BY l_orderkey, o_orderdate_ts, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- TPC-H Q5: local supplier volume (5-way join, c_nation == s_nation) ---

def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("n_name").agg(qsum(revenue, "revenue"))


_Q5_SQL = f"""
SELECT n_name, {QSUM_SQL.format(x="l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


# --- TPC-H Q6: forecast revenue (scan + filter + single-row agg) ----------

def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            qsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q6_SQL = f"""
SELECT {QSUM_SQL.format(x="l_extendedprice * l_discount")} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- Semi / anti / outer joins (J3, J1) ------------------------------------

def join_semi_discounted_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS): orders having ≥1 deeply discounted line item."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_discount") > 0.08)
    semi = orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
    return semi.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        qsum("o_totalprice", "sum_totalprice"),
    )


_SEMI_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_orders,
       {QSUM_SQL.format(x="o_totalprice")} AS sum_totalprice
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
GROUP BY o_orderpriority
"""


def join_anti_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS): customers who never ordered, per segment."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    anti = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return anti.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        qsum("c_acctbal", "sum_acctbal"),
    )


_ANTI_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_customers,
       {QSUM_SQL.format(x="c_acctbal")} AS sum_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


def join_outer_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with NULL-side observation, per segment."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
    return j.groupBy("c_mktsegment").agg(
        F.countDistinct("c_custkey").alias("n_customers"),
        F.count("o_orderkey").alias("n_orders"),
        F.countDistinct(F.when(F.col("o_orderkey").isNull(), F.col("c_custkey"))).alias(
            "n_orderless"
        ),
    )


_OUTER_SQL = """
SELECT c_mktsegment,
       COUNT(DISTINCT c_custkey) AS n_customers,
       COUNT(o_orderkey) AS n_orders,
       COUNT(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END) AS n_orderless
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# --- Windows (W1–W3) --------------------------------------------------------

def window_topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by (exact) revenue within each brand — W1/W3."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey", "p_name")
        .agg(qsum(revenue, "revenue"))
    )
    w = W.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return (
        per_part.withColumn("rank_in_brand", F.row_number().over(w))
        .where(F.col("rank_in_brand") <= 3)
        .select(
            "p_brand",
            F.col("p_partkey").cast("long").alias("p_partkey"),
            "p_name",
            "revenue",
            F.col("rank_in_brand").cast("long").alias("rank_in_brand"),
        )
    )


_TOPK_SQL = f"""
WITH per_part AS (
  SELECT p_brand, p_partkey, p_name,
         {QSUM_SQL.format(x="l_extendedprice * (1 - l_discount)")} AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_partkey, p_name
)
SELECT p_brand, p_partkey, p_name, revenue,
       CAST(rank_in_brand AS BIGINT) AS rank_in_brand
FROM (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY p_brand ORDER BY revenue DESC, p_partkey ASC
         ) AS rank_in_brand
  FROM per_part
) t WHERE rank_in_brand <= 3
"""


def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order total over time — W2 frame spec.

    Exact: the cumulative sum runs over quantized BIGINTs, so frame
    accumulation order cannot produce float drift. Ordering key is made
    unique with o_orderkey (SURVEY §7 hard-part 3: determinism by design).
    """
    orders = _t(spark, sf_dir, "orders")
    q = F.floor(F.col("o_totalprice") * 1000000).cast("long")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.unix_timestamp("o_orderdate").cast("long").alias("o_orderdate_ts"),
        (F.sum(q).over(w) / F.lit(1000000.0)).cast("double").alias("running_total"),
        F.row_number().over(
            W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        ).cast("long").alias("order_seq"),
    )


_RUNNING_SQL = f"""
SELECT o_custkey, o_orderkey,
       {EPOCH_S_SQL.format(x="o_orderdate")} AS o_orderdate_ts,
       CAST(SUM(CAST(FLOOR(o_totalprice * 1000000) AS BIGINT)) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS DOUBLE) / 1000000 AS running_total,
       CAST(ROW_NUMBER() OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ) AS BIGINT) AS order_seq
FROM orders
"""


def window_lag_lead_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: gap in days between consecutive orders — W1."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev_ts = F.lag(F.unix_timestamp("o_orderdate")).over(w)
    return orders.select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.unix_timestamp("o_orderdate").cast("long").alias("o_orderdate_ts"),
        ((F.unix_timestamp("o_orderdate") - prev_ts) / F.lit(86400.0))
        .cast("double")
        .alias("days_since_prev"),
    )


_LAG_SQL = f"""
SELECT o_custkey, o_orderkey,
       {EPOCH_S_SQL.format(x="o_orderdate")} AS o_orderdate_ts,
       CAST(({EPOCH_S_SQL.format(x="o_orderdate")} - LAG({EPOCH_S_SQL.format(x="o_orderdate")}) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            )) / 86400.0 AS DOUBLE) AS days_since_prev
FROM orders
"""


# --- Grouping sets / rollup / cube (A9) -------------------------------------

def agg_rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(qsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


_ROLLUP_SQL = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       {QSUM_SQL.format(x="l_quantity")} AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def agg_cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            qavg("o_totalprice", "avg_totalprice"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "avg_totalprice",
        )
    )


_CUBE_SQL = f"""
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COUNT(*) AS n_orders,
       {QAVG_SQL.format(x="o_totalprice")} AS avg_totalprice
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (A9): per returnflag, distinct parts,
    suppliers, orders touched."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


# --- Set operations (W5) -----------------------------------------------------

def setops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over two customer cohorts, emitted as
    labeled cardinalities (one row per set operator)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    open_orders = (
        orders.where(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    rows = [
        ("union", building.union(open_orders).distinct()),
        ("intersect", building.intersect(open_orders)),
        ("except_building_minus_open", building.exceptAll(open_orders).distinct()),
    ]
    out = None
    for name, df in rows:
        one = df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("setop"), F.col("n").cast("long").alias("n")
        )
        out = one if out is None else out.unionByName(one)
    return out


_SETOPS_SQL = """
WITH building AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
open_orders AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O')
SELECT 'union' AS setop, COUNT(*) AS n FROM (SELECT k FROM building UNION SELECT k FROM open_orders) t
UNION ALL
SELECT 'intersect', COUNT(*) FROM (SELECT k FROM building INTERSECT SELECT k FROM open_orders) t
UNION ALL
SELECT 'except_building_minus_open', COUNT(*) FROM (SELECT k FROM building EXCEPT SELECT k FROM open_orders) t
"""


# --- Scalar families (§2.6) --------------------------------------------------

def scalar_string_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", r"(\d+)", 1).cast("long").alias("brand_num"),
        F.concat_ws("/", "p_type", "p_brand").alias("type_brand"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
    )


_STRING_SQL = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
       str_split(p_name, ' ')[1] AS first_word,
       CAST(regexp_extract(p_brand, '(\\d+)', 1) AS BIGINT) AS brand_num,
       p_type || '/' || p_brand AS type_brand,
       SUBSTRING(p_name, 1, 4) AS name_prefix
FROM part
"""


def scalar_datetime_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.unix_timestamp(F.date_trunc("month", "o_orderdate"))
        .cast("long")
        .alias("month_start_ts"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_date"),
    )


_DATETIME_SQL = f"""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       CAST(day(o_orderdate) AS BIGINT) AS dom,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       {EPOCH_S_SQL.format(x="date_trunc('month', o_orderdate)")} AS month_start_ts,
       strftime(o_orderdate, '%Y-%m-%d') AS iso_date
FROM orders
"""


def scalar_json_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction on events.props (§2.6 Map/JSON family)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
            F.countDistinct("k").alias("distinct_k"),
        )
    )


_JSON_SQL = """
SELECT event_type,
       COUNT(k) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       COUNT(DISTINCT k) AS distinct_k
FROM (SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events) t
GROUP BY event_type
"""


def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family on embeddings (§2.6): element access, slice stats,
    exact quantized L1 norm via transform+aggregate (no UDF)."""
    emb = _t(spark, sf_dir, "embeddings")
    # cast float32→double BEFORE multiplying (see operators.similarity.quantize_vec)
    qarr = F.transform(
        F.col("embedding"), lambda x: F.floor(x.cast("double") * 10000).cast("long")
    )
    l1_q = F.aggregate(qarr, F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x))
    return emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("label").cast("long").alias("label"),
        F.size("embedding").cast("long").alias("dim"),
        (l1_q / F.lit(10000.0)).cast("double").alias("l1_norm"),
        F.floor(F.col("embedding").getItem(0).cast("double") * 10000)
        .cast("long")
        .alias("e0_q"),
    )


_ARRAY_SQL = """
SELECT vec_id,
       CAST(label AS BIGINT) AS label,
       CAST(len(embedding) AS BIGINT) AS dim,
       CAST(list_sum(list_transform(embedding,
             x -> abs(CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)))) / 10000.0
            AS DOUBLE) AS l1_norm,
       CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 10000) AS BIGINT) AS e0_q
FROM embeddings
"""


# --- Range join (J5) ---------------------------------------------------------

def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/theta join: classify events into literal value bands via a
    broadcast range join (J5) — the Spark-side pattern for banding joins."""
    ev = _t(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1e9)],
        "band string, lo double, hi double",
    )
    j = ev.join(
        F.broadcast(bands),
        (ev.value >= bands.lo) & (ev.value < bands.hi),
        "inner",
    )
    return j.groupBy("event_type", "band").agg(
        F.count(F.lit(1)).alias("n"),
        qsum("value", "sum_value"),
    )


_RANGE_SQL = f"""
WITH bands(band, lo, hi) AS (
  VALUES ('low', 0.0, 50.0), ('mid', 50.0, 200.0), ('high', 200.0, 1e9)
)
SELECT event_type, band, COUNT(*) AS n,
       {QSUM_SQL.format(x="value")} AS sum_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY event_type, band
"""


QUERIES = {
    "tpch_q1_pricing_summary": tpch_q1_pricing_summary,
    "tpch_q3_shipping_priority": tpch_q3_shipping_priority,
    "tpch_q5_local_supplier": tpch_q5_local_supplier,
    "tpch_q6_forecast_revenue": tpch_q6_forecast_revenue,
    "join_semi_discounted_orders": join_semi_discounted_orders,
    "join_anti_customers_no_orders": join_anti_customers_no_orders,
    "join_outer_customer_orders": join_outer_customer_orders,
    "window_topk_parts_per_brand": window_topk_parts_per_brand,
    "window_running_revenue": window_running_revenue,
    "window_lag_lead_orders": window_lag_lead_orders,
    "agg_rollup_flag_status": agg_rollup_flag_status,
    "agg_cube_priority_status": agg_cube_priority_status,
    "agg_distinct_counts": agg_distinct_counts,
    "setops_customer_cohorts": setops_customer_cohorts,
    "scalar_string_part_names": scalar_string_part_names,
    "scalar_datetime_orders": scalar_datetime_orders,
    "scalar_json_event_props": scalar_json_event_props,
    "scalar_array_ops": scalar_array_ops,
    "range_join_value_bands": range_join_value_bands,
}

ORACLE = {
    "tpch_q1_pricing_summary": _Q1_SQL,
    "tpch_q3_shipping_priority": _Q3_SQL,
    "tpch_q5_local_supplier": _Q5_SQL,
    "tpch_q6_forecast_revenue": _Q6_SQL,
    "join_semi_discounted_orders": _SEMI_SQL,
    "join_anti_customers_no_orders": _ANTI_SQL,
    "join_outer_customer_orders": _OUTER_SQL,
    "window_topk_parts_per_brand": _TOPK_SQL,
    "window_running_revenue": _RUNNING_SQL,
    "window_lag_lead_orders": _LAG_SQL,
    "agg_rollup_flag_status": _ROLLUP_SQL,
    "agg_cube_priority_status": _CUBE_SQL,
    "agg_distinct_counts": _DISTINCT_SQL,
    "setops_customer_cohorts": _SETOPS_SQL,
    "scalar_string_part_names": _STRING_SQL,
    "scalar_datetime_orders": _DATETIME_SQL,
    "scalar_json_event_props": _JSON_SQL,
    "scalar_array_ops": _ARRAY_SQL,
    "range_join_value_bands": _RANGE_SQL,
}
