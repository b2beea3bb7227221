"""Batch-7 queries: period-over-period comparison (timeShift join),
multi-EXISTS (Q21 shape), cohort + uncorrelated scalar subquery (Q22
shape), boolean/bitwise aggregate family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL, QSUM_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")


def tsdb_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graphite timeShift comparison: today's hourly sum per metric joined
    against the same metric 24h earlier; delta of quantized sums is exact."""
    from kenshin_backup_spark.operators import seriesfns as S
    from kenshin_backup_spark.operators.rollup import finalize, rollup_partials

    ev = load_table(spark, sf_dir, "events").withColumnRenamed("event_type", "metric")
    hourly = finalize(
        rollup_partials(ev, key_cols=["metric"], step_seconds=3600), agg="sum"
    ).select("metric", "bucket_ts", "value")
    shifted = S.time_shift(hourly, 24 * 3600).select(
        "metric", "bucket_ts", F.col("value").alias("prev_value")
    )
    j = hourly.join(shifted, ["metric", "bucket_ts"], "inner")
    return j.select(
        "metric",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.col("value").cast("double").alias("value"),
        F.col("prev_value").cast("double").alias("prev_value"),
        (F.col("value") - F.col("prev_value")).cast("double").alias("day_delta"),
    )


_POP_SQL = f"""
WITH hourly AS (
  SELECT event_type AS metric,
         CAST(({_ES} // 3600) * 3600 AS BIGINT) AS bucket_ts,
         {QSUM_SQL.format(x="value")} AS value
  FROM events GROUP BY 1, 2
)
SELECT a.metric, a.bucket_ts,
       a.value, b.value AS prev_value,
       CAST(a.value - b.value AS DOUBLE) AS day_delta
FROM hourly a
JOIN hourly b ON a.metric = b.metric AND a.bucket_ts = b.bucket_ts + 86400
"""


def tpch_q21_multi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers with a late line on a multi-supplier order where
    no OTHER supplier was late — EXISTS + NOT EXISTS on the same fact."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("__li_q21")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__ord_q21")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("__sup_q21")
    # Spark-side late predicate (EPOCH_S_SQL is the DuckDB dialect macro)
    late1 = "unix_timestamp(l1.l_shipdate) > unix_timestamp(o_orderdate) + 60 * 86400"
    late3 = "unix_timestamp(l3.l_shipdate) > unix_timestamp(o_orderdate) + 60 * 86400"
    return spark.sql(
        f"""
        SELECT s_name, COUNT(*) AS numwait
        FROM __sup_q21, __li_q21 l1, __ord_q21
        WHERE s_suppkey = l1.l_suppkey
          AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND {late1}
          AND EXISTS (SELECT 1 FROM __li_q21 l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey != l1.l_suppkey)
          AND NOT EXISTS (
              SELECT 1 FROM __li_q21 l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey != l1.l_suppkey
                AND {late3})
        GROUP BY s_name
        """
    )


_Q21_SQL = f"""
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND {EPOCH_S_SQL.format(x="l1.l_shipdate")} > {EPOCH_S_SQL.format(x="o_orderdate")} + 60 * 86400
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey != l1.l_suppkey)
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey != l1.l_suppkey
        AND {EPOCH_S_SQL.format(x="l3.l_shipdate")}
            > {EPOCH_S_SQL.format(x="o_orderdate")} + 60 * 86400)
GROUP BY s_name
"""


def tpch_q22_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: name-digit cohorts of customers with above-average
    balance and no orders — uncorrelated scalar subquery + anti join."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("__cust_q22")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__ord_q22")
    return spark.sql(
        f"""
        SELECT substring(c_name, -1, 1) AS cohort,
               COUNT(*) AS numcust,
               {QSUM_SQL.format(x='c_acctbal')} AS totacctbal
        FROM __cust_q22
        WHERE c_acctbal > (SELECT {QSUM_SQL.format(x='c_acctbal')} / COUNT(*)
                           FROM __cust_q22 WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM __ord_q22 WHERE o_custkey = c_custkey)
        GROUP BY cohort
        """
    )


_Q22_SQL = f"""
SELECT substring(c_name, -1, 1) AS cohort,
       COUNT(*) AS numcust,
       {QSUM_SQL.format(x="c_acctbal")} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT {QSUM_SQL.format(x="c_acctbal")} / COUNT(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY cohort
"""


def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipping volume between supplier-nation and customer-
    nation pairs per year — double dimension chain on one fact row."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.s_nkey)
        .join(F.broadcast(n2), cust.c_nationkey == n2.c_nkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    from kenshin_backup_spark.functions.deterministic import qsum as _qsum

    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(_qsum(revenue, "volume"), F.count(F.lit(1)).alias("n_lines"))


_Q7_SQL = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {QSUM_SQL.format(x="l_extendedprice * (1 - l_discount)")} AS volume,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE ns.n_name != nc.n_name
GROUP BY 1, 2, 3
"""


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one supplier nation's share of a region's revenue per
    order year — conditional quantized sum over a regioned join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    nation_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation_c), cust.c_nationkey == nation_c.c_nkey)
        .join(F.broadcast(nation_s), supp.s_nationkey == nation_s.s_nkey)
        .join(F.broadcast(region), nation_c.c_rkey == region.r_regionkey)
    )
    from kenshin_backup_spark.functions.deterministic import qsum as _qsum

    n7 = F.when(F.col("supp_nation") == "NATION_7", revenue)
    agg = j.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        _qsum(n7, "n7_volume"), _qsum(revenue, "total_volume")
    )
    return agg.select(
        "o_year",
        "n7_volume",
        "total_volume",
        (F.col("n7_volume") / F.col("total_volume")).cast("double").alias("mkt_share"),
    )


_Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {QSUM_SQL.format(x="CASE WHEN ns.n_name = 'NATION_7' THEN l_extendedprice * (1 - l_discount) END")} AS n7_volume,
       {QSUM_SQL.format(x="l_extendedprice * (1 - l_discount)")} AS total_volume,
       CAST(({QSUM_SQL.format(x="CASE WHEN ns.n_name = 'NATION_7' THEN l_extendedprice * (1 - l_discount) END")})
            / ({QSUM_SQL.format(x="l_extendedprice * (1 - l_discount)")}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN region ON nc.n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY 1
"""


def agg_boolean_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean + bitwise aggregate family: bool_and/bool_or, count_if,
    bit_and/bit_or/bit_xor."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bool_and(F.col("value") > 0).cast("string").alias("all_positive"),
        F.bool_or(F.col("value") > 400).cast("string").alias("any_over_400"),
        F.count_if(F.col("user_id") % 2 == 0).cast("long").alias("n_even_users"),
        F.bit_and(F.col("user_id")).cast("long").alias("uid_and"),
        F.bit_or(F.col("user_id")).cast("long").alias("uid_or"),
        F.bit_xor(F.col("user_id")).cast("long").alias("uid_xor"),
    )


_BOOLBIT_SQL = """
SELECT event_type,
       CAST(bool_and(value > 0) AS VARCHAR) AS all_positive,
       CAST(bool_or(value > 400) AS VARCHAR) AS any_over_400,
       COUNT(*) FILTER (WHERE user_id % 2 = 0) AS n_even_users,
       CAST(bit_and(user_id) AS BIGINT) AS uid_and,
       CAST(bit_or(user_id) AS BIGINT) AS uid_or,
       CAST(bit_xor(user_id) AS BIGINT) AS uid_xor
FROM events GROUP BY event_type
"""


def agg_string_concat_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String aggregation (listagg family): nations per region as a
    deterministic comma-joined SORTED list, plus collect_set cardinality."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    j = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return j.groupBy("r_name").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
        F.size(F.collect_set("n_name")).cast("long").alias("n_nations"),
    )


_STRAGG_SQL = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       CAST(COUNT(DISTINCT n_name) AS BIGINT) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


QUERIES = {
    "agg_string_concat_sorted": agg_string_concat_sorted,
    "tsdb_period_over_period": tsdb_period_over_period,
    "tpch_q21_multi_exists": tpch_q21_multi_exists,
    "tpch_q22_cohort": tpch_q22_cohort,
    "agg_boolean_bitwise": agg_boolean_bitwise,
    "tpch_q7_nation_volume": tpch_q7_nation_volume,
    "tpch_q8_market_share": tpch_q8_market_share,
}

ORACLE = {
    "agg_string_concat_sorted": _STRAGG_SQL,
    "tsdb_period_over_period": _POP_SQL,
    "tpch_q21_multi_exists": _Q21_SQL,
    "tpch_q22_cohort": _Q22_SQL,
    "agg_boolean_bitwise": _BOOLBIT_SQL,
    "tpch_q7_nation_volume": _Q7_SQL,
    "tpch_q8_market_share": _Q8_SQL,
}
