"""Batch-38 queries (round 4): higher-moment statistics, categorical
diversity, and exact weighted quantiles — three analytics staples built on
the house integer-exact determinism scheme.

- ``agg_skewness_kurtosis`` — per-metric skewness and excess kurtosis from
  EXACT integer raw moments. Built-in ``skewness()``/``kurtosis()`` are
  float-sum reductions whose result depends on aggregation order (never
  oracle-matchable); here each value quantizes to an integer whose powers
  are summed exactly in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), and the
  closed-form g1/g2 is one deterministic double expression over those
  exact sums. No ``pow()`` — ``m2^1.5`` is written ``m2·sqrt(m2)`` because
  libm ``pow`` may differ across engines in the last ulp while ``sqrt``
  is IEEE-correctly-rounded everywhere.
- ``events_user_gini_diversity`` — per-user Gini impurity of the event-type
  distribution ``1 − Σcᵢ²/T²``: the no-log diversity measure (Shannon
  entropy needs ``ln``, banned in oracle paths), exact from integer counts.
- ``lineitem_weighted_median`` — exact weighted median (lower median) of
  the price distribution weighted by quantity, per return flag: pre-
  aggregate weight per distinct quantized price, then a cumulative-weight
  window PARTITIONED by the group key picks the first price covering half
  the total weight.

At 100 TB: moments and Gini are single map-side-combinable aggregations
(state per group = 5 numbers). The weighted median shuffles the
(group, price)-grain pre-aggregate — distinct prices per group, not rows —
and its windows are partitioned by group, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.sources import load_table

# --- skewness / kurtosis from exact integer moments -------------------------

#: value quantization for the moment sums: whole value units (|value| ≤
#: ~500 → q ≤ 500). The sums are exact in DECIMAL(38,0)/HUGEINT at any
#: scale, but the final cast-to-double is only guaranteed bit-identical
#: across engines while the sums stay < 2^53 (DuckDB converts HUGEINT via
#: two 64-bit halves, which double-rounds above that): q⁴ ≤ 6.25e10 keeps
#: Σq⁴ exact up to ~1.4e5 rows per group — beyond that, re-quantize
#: coarser or split the conversion. (Empirically: at q = value·100 the
#: kurtosis diverged by 3 ulps at sf0.01 — exactly this cast.)
_MOM_Q = 1


def agg_skewness_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric skewness (g1) and excess kurtosis (g2) — deterministic,
    engine-exact (see module docstring for the scheme)."""
    ev = load_table(spark, sf_dir, "events")
    qv = F.floor(F.col("value") * _MOM_Q).cast("decimal(38,0)")
    base = ev.select("event_type", qv.alias("q"))
    q2 = F.col("q") * F.col("q")
    sums = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("s1"),
        F.sum(q2).alias("s2"),
        F.sum(q2 * F.col("q")).alias("s3"),
        F.sum(q2 * q2).alias("s4"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s3 = F.col("s3").cast("double")
    s4 = F.col("s4").cast("double")
    mean = s1 / n
    m2 = s2 / n - mean * mean
    m3 = s3 / n - F.lit(3.0) * mean * (s2 / n) + F.lit(2.0) * mean * mean * mean
    m4 = (
        s4 / n
        - F.lit(4.0) * mean * (s3 / n)
        + F.lit(6.0) * mean * mean * (s2 / n)
        - F.lit(3.0) * mean * mean * mean * mean
    )
    pos = m2 > F.lit(0.0)
    return sums.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (mean / F.lit(float(_MOM_Q))).alias("mean_value"),
        F.when(pos, m3 / (m2 * F.sqrt(m2))).otherwise(F.lit(None).cast("double")).alias(
            "skewness"
        ),
        F.when(pos, m4 / (m2 * m2) - F.lit(3.0))
        .otherwise(F.lit(None).cast("double"))
        .alias("kurtosis_excess"),
    )


_SKEW_SQL = f"""
WITH base AS (
  SELECT event_type, CAST(FLOOR(value * {_MOM_Q}) AS HUGEINT) AS q FROM events
),
sums AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(q) AS s1, SUM(q * q) AS s2,
         SUM(q * q * q) AS s3, SUM((q * q) * (q * q)) AS s4
  FROM base GROUP BY 1
),
d AS (
  SELECT event_type, n,
         CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1,
         CAST(s2 AS DOUBLE) AS s2, CAST(s3 AS DOUBLE) AS s3,
         CAST(s4 AS DOUBLE) AS s4
  FROM sums
),
m AS (
  SELECT event_type, n, nd,
         s1 / nd AS mean,
         s2 / nd - (s1 / nd) * (s1 / nd) AS m2,
         s3 / nd - CAST(3 AS DOUBLE) * (s1 / nd) * (s2 / nd)
           + CAST(2 AS DOUBLE) * (s1 / nd) * (s1 / nd) * (s1 / nd) AS m3,
         s4 / nd - CAST(4 AS DOUBLE) * (s1 / nd) * (s3 / nd)
           + CAST(6 AS DOUBLE) * (s1 / nd) * (s1 / nd) * (s2 / nd)
           - CAST(3 AS DOUBLE) * (s1 / nd) * (s1 / nd) * (s1 / nd) * (s1 / nd)
           AS m4
  FROM d
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       mean / CAST({_MOM_Q} AS DOUBLE) AS mean_value,
       CASE WHEN m2 > CAST(0 AS DOUBLE)
            THEN m3 / (m2 * SQRT(m2)) ELSE NULL END AS skewness,
       CASE WHEN m2 > CAST(0 AS DOUBLE)
            THEN m4 / (m2 * m2) - CAST(3 AS DOUBLE) ELSE NULL END
         AS kurtosis_excess
FROM m
"""


# --- per-user categorical diversity (Gini impurity) -------------------------


def events_user_gini_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Gini impurity of event types: 0 = monomaniac (one event
    type), →1 = uniform across many types. Exact rational arithmetic over
    integer counts — the log-free diversity score.

    Two map-side-combinable aggregations keyed by user; no windows."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_user = per_type.groupBy("user_id").agg(
        F.sum("c").alias("t"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
        F.count(F.lit(1)).alias("n_types"),
    )
    gini = F.lit(1.0) - F.col("ss").cast("double") / (
        F.col("t").cast("double") * F.col("t").cast("double")
    )
    return per_user.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("t").cast("long").alias("n_events"),
        F.col("n_types").cast("long").alias("n_types"),
        gini.alias("gini"),
    )


_GINI_SQL = """
WITH per_type AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
),
per_user AS (
  SELECT user_id, SUM(c) AS t, SUM(c * c) AS ss, COUNT(*) AS n_types
  FROM per_type GROUP BY 1
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(t AS BIGINT) AS n_events,
       CAST(n_types AS BIGINT) AS n_types,
       CAST(1 AS DOUBLE) - CAST(ss AS DOUBLE)
         / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)) AS gini
FROM per_user
"""


# --- exact weighted median --------------------------------------------------


def lineitem_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted (lower) median of the extended price per
    return flag: the first quantized price whose cumulative weight reaches
    half the group's total weight.

    Shape: pre-aggregate weight per (flag, price-cent) — the window input
    is distinct prices per group, not line items — then one cumulative-sum
    window PARTITIONED by flag and a min-over-qualifying aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    qp = F.floor(F.col("l_extendedprice") * 100).cast("long")
    wpp = (
        li.select(
            "l_returnflag",
            qp.alias("qp"),
            F.col("l_quantity").cast("long").alias("w"),
        )
        .groupBy("l_returnflag", "qp")
        .agg(F.sum("w").alias("wsum"))
    )
    w_cum = (
        W.partitionBy("l_returnflag")
        .orderBy("qp")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = wpp.withColumn("cw", F.sum("wsum").over(w_cum)).withColumn(
        "total", F.sum("wsum").over(W.partitionBy("l_returnflag"))
    )
    med = (
        cum.where(F.col("cw") * 2 >= F.col("total"))
        .groupBy("l_returnflag", "total")
        .agg(F.min("qp").alias("med_qp"))
    )
    return med.select(
        "l_returnflag",
        F.col("total").cast("long").alias("total_weight"),
        (F.col("med_qp").cast("double") / F.lit(100.0)).alias("weighted_median"),
    )


_WMED_SQL = """
WITH wpp AS (
  SELECT l_returnflag, CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS qp,
         SUM(CAST(l_quantity AS BIGINT)) AS wsum
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, qp, wsum,
         SUM(wsum) OVER (PARTITION BY l_returnflag ORDER BY qp
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cw,
         SUM(wsum) OVER (PARTITION BY l_returnflag) AS total
  FROM wpp
)
SELECT l_returnflag,
       CAST(total AS BIGINT) AS total_weight,
       CAST(MIN(qp) AS DOUBLE) / CAST(100 AS DOUBLE) AS weighted_median
FROM cum WHERE cw * 2 >= total
GROUP BY l_returnflag, total
"""


QUERIES = {
    "agg_skewness_kurtosis": agg_skewness_kurtosis,
    "events_user_gini_diversity": events_user_gini_diversity,
    "lineitem_weighted_median": lineitem_weighted_median,
}

ORACLE = {
    "agg_skewness_kurtosis": _SKEW_SQL,
    "events_user_gini_diversity": _GINI_SQL,
    "lineitem_weighted_median": _WMED_SQL,
}
