"""Batch-45 queries (round 4): interval-count backlog, market
concentration, and embedding drift monitoring.

- ``orders_backlog_over_time`` — open-order backlog per month via the
  event-differencing idiom: +1 at open, −1 after close, running sum over
  the month axis. The running sum routes through
  ``scalepat.with_global_prefix`` (range partition + broadcast offsets) —
  the scale-safe exact-prefix house pattern — even though the month-grain
  input is calendar-bounded, so the idiom stays uniform engine-wide.
- ``supplier_concentration_hhi`` — Herfindahl–Hirschman concentration of
  supplier revenue per nation. HHI = Σ revᵢ² / (Σ revᵢ)² over integer
  hundred-unit revenues, so no per-share float sum exists anywhere —
  the classic "sum of squared shares" reformulated to be engine-exact
  (quantization sized to keep Σrev² < 2^53; see batch38's cast bound).
- ``emb_drift_by_label`` — per-label centroid cosine between the first
  and second half of the vector corpus: the embedding-drift monitor that
  catches encoder version skew. Centroids are per-dimension exact
  integer sums (posexplode → keyed aggregate — one shuffle of
  (label, dim) pairs); the centroid cosine derives from those sums in
  one deterministic double expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import QSUM_SQL
from kenshin_backup_spark.operators.scalepat import with_global_prefix
from kenshin_backup_spark.sources import load_table


def orders_backlog_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open orders per month: an order opens at o_orderdate's month and
    closes after the month of its last line-item shipment (orders with no
    line items close in their opening month)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    close = lineitem.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    spans = (
        orders.join(close, orders.o_orderkey == close.l_orderkey, "left")
        .select(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias(
                "open_m"
            ),
            F.coalesce(
                F.year("last_ship") * 12 + F.month("last_ship") - 1,
                F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1,
            ).alias("close_m"),
        )
    )
    deltas = (
        spans.select(F.col("open_m").alias("m"), F.lit(1).alias("d"))
        .unionByName(
            spans.select((F.col("close_m") + 1).alias("m"), F.lit(-1).alias("d"))
        )
        .groupBy("m")
        .agg(F.sum("d").alias("net_change"))
    )
    cum = with_global_prefix(
        deltas, order=[F.col("m")], sums={"backlog": "net_change"}
    )
    return cum.select(
        F.col("m").cast("long").alias("month_key"),
        F.floor(F.col("m") / 12).cast("long").alias("year"),
        (F.col("m") % 12 + 1).cast("long").alias("month"),
        F.col("net_change").cast("long").alias("net_change"),
        F.col("backlog").cast("long").alias("backlog"),
    )


_BACKLOG_SQL = """
WITH close AS (
  SELECT l_orderkey, MAX(l_shipdate) AS last_ship FROM lineitem GROUP BY 1
),
spans AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS open_m,
         COALESCE(year(last_ship) * 12 + month(last_ship) - 1,
                  year(o_orderdate) * 12 + month(o_orderdate) - 1) AS close_m
  FROM orders o LEFT JOIN close c ON o.o_orderkey = c.l_orderkey
),
deltas AS (
  SELECT m, SUM(d) AS net_change FROM (
    SELECT open_m AS m, 1 AS d FROM spans
    UNION ALL
    SELECT close_m + 1 AS m, -1 AS d FROM spans
  ) GROUP BY 1
)
SELECT CAST(m AS BIGINT) AS month_key,
       CAST(m // 12 AS BIGINT) AS year,
       CAST(m % 12 + 1 AS BIGINT) AS month,
       CAST(net_change AS BIGINT) AS net_change,
       CAST(SUM(net_change) OVER (ORDER BY m
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS backlog
FROM deltas
"""


#: hundred-currency-unit revenue quantization: per-supplier revenue ≤ ~1e8
#: → q ≤ 1e6, q² ≤ 1e12 — Σq² stays < 2^53 up to ~9e3 suppliers/nation.
_HHI_Q = 100


def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-revenue HHI per nation from integer hundred-unit revenues
    — no float share sum anywhere (Σq² and (Σq)² are exact)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        lineitem.join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "s_suppkey")
        .agg(
            F.floor(
                (
                    F.sum(
                        F.floor(
                            F.col("l_extendedprice")
                            * (F.lit(1.0) - F.col("l_discount"))
                            * 1000000
                        ).cast("long")
                    )
                    / F.lit(1e6)
                )
                / F.lit(float(_HHI_Q))
            )
            .cast("long")
            .alias("q")
        )
    )
    agg = rev.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
    )
    hhi = F.col("sqq").cast("double") / (
        F.col("sq").cast("double") * F.col("sq").cast("double")
    )
    return agg.where(F.col("sq") > 0).select(
        F.col("n_name").alias("nation"),
        F.col("n_suppliers").cast("long").alias("n_suppliers"),
        F.col("sq").cast("long").alias("revenue_q100"),
        hhi.alias("hhi"),
    )


_HHI_REV = QSUM_SQL.format(x="l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)")

_HHI_SQL = f"""
WITH rev AS (
  SELECT n.n_name, s.s_suppkey,
         CAST(FLOOR({_HHI_REV} / CAST({_HHI_Q} AS DOUBLE)) AS BIGINT) AS q
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
agg AS (
  SELECT n_name, COUNT(*) AS n_suppliers, SUM(q) AS sq, SUM(q * q) AS sqq
  FROM rev GROUP BY 1
)
SELECT n_name AS nation,
       CAST(n_suppliers AS BIGINT) AS n_suppliers,
       CAST(sq AS BIGINT) AS revenue_q100,
       CAST(sqq AS DOUBLE) / (CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) AS hhi
FROM agg WHERE sq > 0
"""


_DRIFT_SPLIT = 250


def emb_drift_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label cosine between the centroids of the first (vec_id < 250)
    and second half of the corpus — the encoder-drift monitor."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label",
        (F.col("vec_id") < _DRIFT_SPLIT).cast("int").alias("old"),
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * 10000).cast("long"),
            )
        ).alias("dim", "qc"),
    )
    per_dim = comp.groupBy("label", "dim").agg(
        F.sum(F.when(F.col("old") == 1, F.col("qc")).otherwise(0)).alias("sa"),
        F.sum(F.when(F.col("old") == 0, F.col("qc")).otherwise(0)).alias("sb"),
    )
    dots = per_dim.groupBy("label").agg(
        F.sum(F.col("sa") * F.col("sb")).alias("ab"),
        F.sum(F.col("sa") * F.col("sa")).alias("aa"),
        F.sum(F.col("sb") * F.col("sb")).alias("bb"),
    )
    counts = emb.groupBy("label").agg(
        F.sum(F.when(F.col("vec_id") < _DRIFT_SPLIT, 1).otherwise(0)).alias("n_old"),
        F.sum(F.when(F.col("vec_id") >= _DRIFT_SPLIT, 1).otherwise(0)).alias("n_new"),
    )
    cos = F.when(
        (F.col("aa") > 0) & (F.col("bb") > 0),
        F.col("ab").cast("double")
        / F.sqrt(F.col("aa").cast("double") * F.col("bb").cast("double")),
    ).otherwise(F.lit(None).cast("double"))
    return (
        dots.join(counts, "label")
        .select(
            F.col("label").cast("long").alias("label"),
            F.col("n_old").cast("long").alias("n_old"),
            F.col("n_new").cast("long").alias("n_new"),
            cos.alias("centroid_cosine"),
        )
    )


_DRIFT_SQL = f"""
WITH comp AS (
  SELECT label,
         CASE WHEN vec_id < {_DRIFT_SPLIT} THEN 1 ELSE 0 END AS old,
         t.i - 1 AS dim,
         CAST(FLOOR(CAST(embedding[t.i] AS DOUBLE) * 10000) AS BIGINT) AS qc
  FROM embeddings,
       UNNEST(generate_series(1, len(embedding))) AS t(i)
),
per_dim AS (
  SELECT label, dim,
         SUM(CASE WHEN old = 1 THEN qc ELSE 0 END) AS sa,
         SUM(CASE WHEN old = 0 THEN qc ELSE 0 END) AS sb
  FROM comp GROUP BY 1, 2
),
dots AS (
  SELECT label, SUM(sa * sb) AS ab, SUM(sa * sa) AS aa, SUM(sb * sb) AS bb
  FROM per_dim GROUP BY 1
),
counts AS (
  SELECT label,
         SUM(CASE WHEN vec_id < {_DRIFT_SPLIT} THEN 1 ELSE 0 END) AS n_old,
         SUM(CASE WHEN vec_id >= {_DRIFT_SPLIT} THEN 1 ELSE 0 END) AS n_new
  FROM embeddings GROUP BY 1
)
SELECT CAST(d.label AS BIGINT) AS label,
       CAST(n_old AS BIGINT) AS n_old,
       CAST(n_new AS BIGINT) AS n_new,
       CASE WHEN aa > 0 AND bb > 0
            THEN CAST(ab AS DOUBLE) / SQRT(CAST(aa AS DOUBLE) * CAST(bb AS DOUBLE))
            ELSE NULL END AS centroid_cosine
FROM dots d JOIN counts c ON d.label = c.label
"""


QUERIES = {
    "orders_backlog_over_time": orders_backlog_over_time,
    "supplier_concentration_hhi": supplier_concentration_hhi,
    "emb_drift_by_label": emb_drift_by_label,
}

ORACLE = {
    "orders_backlog_over_time": _BACKLOG_SQL,
    "supplier_concentration_hhi": _HHI_SQL,
    "emb_drift_by_label": _DRIFT_SQL,
}
