"""Batch-6 queries: unpivot/stack, array set operations, date arithmetic,
extended string family, null-handling conditionals, per-dimension embedding
stats, and covariance/correlation from quantized sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL, QSUM_SQL, qsum
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")


def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (stack): wide measure columns → long (measure, value) —
    quantized per-measure sums by returnflag."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).alias("n"), qsum("val", "sum_val")
    )


_UNPIVOT_SQL = f"""
SELECT l_returnflag, measure, COUNT(*) AS n,
       {QSUM_SQL.format(x="val")} AS sum_val
FROM (
  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
) t
GROUP BY l_returnflag, measure
"""


def array_set_ops_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_intersect/union/except on consecutive documents' word sets
    (sorted for engine-portable ordering)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    words = F.array_distinct(F.split(F.lower("text"), r"\s+"))
    w = docs.select("doc_id", words.alias("ws"))
    a = w.alias("a")
    b = w.alias("b")
    pairs = a.join(b, F.col("a.doc_id") + 1 == F.col("b.doc_id"))
    return pairs.select(
        F.col("a.doc_id").cast("long").alias("doc_id"),
        F.size(F.array_intersect("a.ws", "b.ws")).cast("long").alias("n_common"),
        F.size(F.array_union("a.ws", "b.ws")).cast("long").alias("n_union"),
        F.size(F.array_except("a.ws", "b.ws")).cast("long").alias("n_only_a"),
        F.get(F.sort_array(F.array_intersect("a.ws", "b.ws")), 0).alias(
            "first_common"
        ),
    )


_ARRSET_SQL = """
WITH w AS (
  SELECT doc_id, list_distinct(str_split_regex(lower(text), '\\s+')) AS ws
  FROM documents WHERE doc_id < 50
)
SELECT a.doc_id,
       CAST(len(list_intersect(a.ws, b.ws)) AS BIGINT) AS n_common,
       CAST(len(list_distinct(list_concat(a.ws, b.ws))) AS BIGINT) AS n_union,
       CAST(len(list_filter(a.ws, x -> NOT list_contains(b.ws, x))) AS BIGINT) AS n_only_a,
       list_sort(list_intersect(a.ws, b.ws))[1] AS first_common
FROM w a JOIN w b ON a.doc_id + 1 = b.doc_id
"""


def scalar_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic family: add_months (with end-of-month clamping),
    date_add days, datediff, last_day, weekday fields."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.date_format(d, "yyyy-MM-dd").alias("d0"),
        F.date_format(F.add_months(d, 1), "yyyy-MM-dd").alias("plus_month"),
        F.date_format(F.date_add(d, 90), "yyyy-MM-dd").alias("plus_90d"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).cast("long").alias("days_to_2002"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.dayofweek(d).cast("long").alias("dow"),
    )


_DATEARITH_SQL = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS d0,
       strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS plus_month,
       strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS plus_90d,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT)
         AS days_to_2002,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow
FROM orders
"""


def scalar_string_family2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family: lpad/rpad, translate, replace, reverse,
    instr/strpos, repeat, trim variants."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.regexp_replace("p_name", " ", "_").alias("snake_name"),
        F.reverse("p_name").alias("rev_name"),
        F.instr("p_name", "widget").cast("long").alias("widget_pos"),
        F.repeat(F.lit("*"), F.col("p_size") % 5).alias("stars"),
        F.rtrim(F.ltrim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  ")))).alias(
            "trimmed"
        ),
    )


_STRING2_SQL = """
SELECT p_partkey,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
       translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
       replace(p_name, ' ', '_') AS snake_name,
       reverse(p_name) AS rev_name,
       CAST(strpos(p_name, 'widget') AS BIGINT) AS widget_pos,
       repeat('*', CAST(p_size % 5 AS INTEGER)) AS stars,
       rtrim(ltrim('  ' || p_brand || '  ')) AS trimmed
FROM part
"""


def scalar_null_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling family: nullif, coalesce/nvl, least/greatest (row-
    wise), CASE, boolean aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.nullif(F.col("l_discount"), F.lit(0.0)).cast("double").alias("disc_or_null"),
        F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0))
        .cast("double")
        .alias("disc_or_neg1"),
        F.least("l_quantity", F.col("l_extendedprice") / 1000).cast("double").alias("least_qp"),
        F.greatest("l_discount", "l_tax").cast("double").alias("max_rate"),
        F.when(F.col("l_returnflag") == "R", "returned")
        .when(F.col("l_linestatus") == "O", "open")
        .otherwise("closed")
        .alias("status_label"),
    )


_NULLCOND_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       CAST(nullif(l_discount, 0.0) AS DOUBLE) AS disc_or_null,
       CAST(coalesce(nullif(l_discount, 0.0), -1.0) AS DOUBLE) AS disc_or_neg1,
       CAST(least(l_quantity, l_extendedprice / 1000) AS DOUBLE) AS least_qp,
       CAST(greatest(l_discount, l_tax) AS DOUBLE) AS max_rate,
       CASE WHEN l_returnflag = 'R' THEN 'returned'
            WHEN l_linestatus = 'O' THEN 'open'
            ELSE 'closed' END AS status_label
FROM lineitem
"""


def emb_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: per-dimension statistics across all embedding vectors
    (quantized-exact mean per dimension) — vector-column analytics."""
    emb = load_table(spark, sf_dir, "embeddings")
    qarr = F.transform(
        F.col("embedding"), lambda x: F.floor(x.cast("double") * 10000).cast("long")
    )
    exploded = emb.select(F.posexplode(qarr).alias("dim", "qv"))
    return exploded.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("qv") / (F.lit(10000.0) * F.count("qv"))).cast("double").alias("mean"),
        (F.min("qv") / F.lit(10000.0)).cast("double").alias("mn"),
        (F.max("qv") / F.lit(10000.0)).cast("double").alias("mx"),
    ).select(F.col("dim").cast("long").alias("dim"), "n", "mean", "mn", "mx")


_EMBDIM_SQL = """
WITH e AS (
  SELECT UNNEST(generate_series(1, len(embedding))) - 1 AS dim,
         UNNEST(list_transform(embedding,
                x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT))) AS qv
  FROM embeddings
)
SELECT CAST(dim AS BIGINT) AS dim, COUNT(*) AS n,
       CAST(SUM(qv) / (10000.0 * COUNT(qv)) AS DOUBLE) AS mean,
       CAST(MIN(qv) / 10000.0 AS DOUBLE) AS mn,
       CAST(MAX(qv) / 10000.0 AS DOUBLE) AS mx
FROM e GROUP BY dim
"""


def agg_covar_corr_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance and correlation of (quantity, extendedprice) per flag —
    computed from quantized integer sums (Σx, Σy, Σxy, Σx², Σy², n), so the
    result is order-insensitive and engine-exact, unlike built-in
    covar_samp/corr which accumulate doubles in stream order."""
    li = load_table(spark, sf_dir, "lineitem")
    # unit quantization: price² sums at finer scales overflow BIGINT once
    # row counts reach ~10⁶ (DuckDB silently promotes to HUGEINT; Spark
    # does not) — the operator is DEFINED on floor()ed values in both.
    qx = F.floor(F.col("l_quantity")).cast("long")
    qy = F.floor(F.col("l_extendedprice")).cast("long")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qx).alias("sx"),
        F.sum(qy).alias("sy"),
        F.sum(qx * qy).alias("sxy"),
        F.sum(qx * qx).alias("sxx"),
        F.sum(qy * qy).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov = (sxy - sx * sy / n) / (n - 1)
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return agg.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        cov.cast("double").alias("covar_qty_price"),
        corr.cast("double").alias("corr_qty_price"),
    )


_COVAR_SQL = """
WITH s AS (
  SELECT l_returnflag, COUNT(*) AS n,
         SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS sx,
         SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)) AS sy,
         SUM(CAST(FLOOR(l_quantity) AS BIGINT)
             * CAST(FLOOR(l_extendedprice) AS BIGINT)) AS sxy,
         SUM(CAST(FLOOR(l_quantity) AS BIGINT)
             * CAST(FLOOR(l_quantity) AS BIGINT)) AS sxx,
         SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)
             * CAST(FLOOR(l_extendedprice) AS BIGINT)) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       CAST((CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
            / (CAST(n AS DOUBLE) - 1) AS DOUBLE) AS covar_qty_price,
       CAST((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS DOUBLE)
         AS corr_qty_price
FROM s
"""


QUERIES = {
    "unpivot_lineitem_measures": unpivot_lineitem_measures,
    "array_set_ops_shingles": array_set_ops_shingles,
    "scalar_date_arithmetic": scalar_date_arithmetic,
    "scalar_string_family2": scalar_string_family2,
    "scalar_null_conditionals": scalar_null_conditionals,
    "emb_dimension_stats": emb_dimension_stats,
    "agg_covar_corr_quantized": agg_covar_corr_quantized,
}

ORACLE = {
    "unpivot_lineitem_measures": _UNPIVOT_SQL,
    "array_set_ops_shingles": _ARRSET_SQL,
    "scalar_date_arithmetic": _DATEARITH_SQL,
    "scalar_string_family2": _STRING2_SQL,
    "scalar_null_conditionals": _NULLCOND_SQL,
    "emb_dimension_stats": _EMBDIM_SQL,
    "agg_covar_corr_quantized": _COVAR_SQL,
}
