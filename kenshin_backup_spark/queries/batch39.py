"""Batch-39 queries (round 4): histogram-bucket percentiles, cohort LTV
curves, and per-document TF-IDF keywords.

- ``tsdb_histogram_percentile`` — the Prometheus ``histogram_quantile``
  shape: values bucket into fixed ``le`` boundaries scan-side, cumulative
  bucket counts per metric, and p95 is linearly interpolated inside the
  first bucket whose cumulative count covers the target rank. This is THE
  monitoring-percentile operator at scale: the shuffled state is
  metrics × buckets (a dozen integers per series), never raw samples, and
  histograms from different shards/windows merge by integer addition.
- ``orders_cohort_ltv`` — customer-lifetime-value curve: cohort = first
  purchase year, age = years since; reports per-(cohort, age) cumulative
  revenue per cohort customer. The cumulative window is partitioned by
  cohort and its input is one row per (cohort, age) — bounded by years²,
  not by data.
- ``text_tfidf_keywords`` — top-5 keywords per document by tf ×
  rational-idf (same log-free idf as ``retrieval_bm25_topk``; scores
  quantized to integers so ranking ties are engine-exact). The per-doc
  ranking window partitions on doc_id — embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.cache import persist_tracked
from kenshin_backup_spark.operators.dedup import normalize_text
from kenshin_backup_spark.operators.scalepat import with_global_scalars
from kenshin_backup_spark.sources import load_table

_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"

# --- histogram percentile ---------------------------------------------------

#: Prometheus-style ``le`` boundaries (integers; the +inf bucket is
#: implicit — values beyond the last bound clamp to it, and a percentile
#: landing there reports the last finite bound, as histogram_quantile does).
_LE = [1, 2, 5, 10, 20, 50, 100, 200, 500]
_PCT = 0.95


def tsdb_histogram_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p95 per metric via fixed-boundary histogram buckets + linear
    interpolation — deterministic (integer counts / integer bounds; one
    double interpolation both engines evaluate identically)."""
    ev = load_table(spark, sf_dir, "events")
    # bucket index = count of boundaries strictly below the value
    idx = F.lit(0)
    for b in _LE:
        idx = idx + F.when(F.col("value") > b, 1).otherwise(0)
    counts = (
        ev.select("event_type", idx.alias("b"))
        .groupBy("event_type", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        W.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = counts.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "total", F.sum("cnt").over(W.partitionBy("event_type"))
    )
    target = F.lit(_PCT) * F.col("total").cast("double")
    hit = cum.where(F.col("cum").cast("double") >= target)
    w_first = W.partitionBy("event_type").orderBy("b")
    first = hit.withColumn("rn", F.row_number().over(w_first)).where(
        F.col("rn") == 1
    )
    bounds = F.array(*[F.lit(float(b)) for b in _LE])
    lo = F.when(F.col("b") == 0, F.lit(0.0)).otherwise(
        F.element_at(bounds, F.col("b").cast("int"))
    )
    hi = F.when(
        F.col("b") >= len(_LE), F.element_at(bounds, len(_LE))
    ).otherwise(F.element_at(bounds, F.col("b").cast("int") + 1))
    prev_cum = (F.col("cum") - F.col("cnt")).cast("double")
    interp = lo + (hi - lo) * (target - prev_cum) / F.col("cnt").cast("double")
    p95 = F.when(F.col("b") >= len(_LE), F.element_at(bounds, len(_LE))).otherwise(
        interp
    )
    return first.select(
        "event_type",
        F.col("total").cast("long").alias("n_samples"),
        F.col("b").cast("long").alias("bucket_idx"),
        p95.alias("p95_interp"),
    )


_LE_SQL = ", ".join(str(b) for b in _LE)

_HIST_SQL = f"""
WITH le AS (SELECT [{_LE_SQL}] AS bounds),
tagged AS (
  SELECT event_type,
         len(list_filter(bounds, x -> value > x)) AS b
  FROM events CROSS JOIN le
),
counts AS (
  SELECT event_type, b, COUNT(*) AS cnt FROM tagged GROUP BY 1, 2
),
cum AS (
  SELECT event_type, b, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY b
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS total
  FROM counts
),
first_hit AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY b) AS rn
    FROM cum
    WHERE CAST(cum AS DOUBLE)
          >= CAST({_PCT} AS DOUBLE) * CAST(total AS DOUBLE)
  ) WHERE rn = 1
)
SELECT event_type,
       CAST(total AS BIGINT) AS n_samples,
       CAST(b AS BIGINT) AS bucket_idx,
       CASE WHEN b >= {len(_LE)} THEN CAST(bounds[{len(_LE)}] AS DOUBLE)
            ELSE (CASE WHEN b = 0 THEN CAST(0 AS DOUBLE)
                       ELSE CAST(bounds[b] AS DOUBLE) END)
                 + (CASE WHEN b >= {len(_LE)}
                         THEN CAST(bounds[{len(_LE)}] AS DOUBLE)
                         ELSE CAST(bounds[b + 1] AS DOUBLE) END
                    - CASE WHEN b = 0 THEN CAST(0 AS DOUBLE)
                           ELSE CAST(bounds[b] AS DOUBLE) END)
                   * (CAST({_PCT} AS DOUBLE) * CAST(total AS DOUBLE)
                      - CAST(cum - cnt AS DOUBLE))
                   / CAST(cnt AS DOUBLE)
       END AS p95_interp
FROM first_hit CROSS JOIN le
"""


# --- cohort LTV -------------------------------------------------------------


def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per cohort customer by cohort age (years since
    first purchase year): the classic LTV curve.

    Shape: per-customer first-year (one aggregate), revenue per
    (cohort, age) via qsum, cohort sizes, then a cumulative window whose
    partition is the cohort and whose input is one row per age — years²
    rows total regardless of data volume."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        F.col("o_totalprice"),
    )
    first = base.groupBy("o_custkey").agg(F.min("yr").alias("cohort"))
    sized = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_customers")
    )
    rev = (
        base.join(first, "o_custkey")
        .select(
            "cohort",
            (F.col("yr") - F.col("cohort")).alias("age"),
            "o_totalprice",
        )
        .groupBy("cohort", "age")
        .agg(
            (F.sum(F.floor(F.col("o_totalprice") * 1000000).cast("long")) / F.lit(1e6))
            .cast("double")
            .alias("rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w_cum = (
        W.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = rev.withColumn(
        "cum_rev",
        F.sum(F.floor(F.col("rev") * 1000000).cast("long")).over(w_cum)
        / F.lit(1e6),
    )
    return cum.join(sized, "cohort").select(
        F.col("cohort").cast("long").alias("cohort"),
        F.col("age").cast("long").alias("age"),
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("cohort_customers").cast("long").alias("cohort_customers"),
        F.col("rev").cast("double").alias("rev"),
        (
            F.col("cum_rev").cast("double")
            / F.col("cohort_customers").cast("double")
        ).alias("ltv_per_customer"),
    )


_LTV_SQL = """
WITH base AS (
  SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr, o_totalprice
  FROM orders
),
first AS (SELECT o_custkey, MIN(yr) AS cohort FROM base GROUP BY 1),
sized AS (SELECT cohort, COUNT(*) AS cohort_customers FROM first GROUP BY 1),
rev AS (
  SELECT f.cohort, b.yr - f.cohort AS age,
         CAST(CAST(SUM(CAST(FLOOR(b.o_totalprice * 1000000) AS BIGINT))
                   AS DOUBLE) / 1000000 AS DOUBLE) AS rev,
         COUNT(*) AS n_orders
  FROM base b JOIN first f USING (o_custkey)
  GROUP BY 1, 2
),
cum AS (
  SELECT cohort, age, n_orders, rev,
         CAST(SUM(CAST(FLOOR(rev * 1000000) AS BIGINT))
              OVER (PARTITION BY cohort ORDER BY age
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE) / 1000000 AS cum_rev
  FROM rev
)
SELECT CAST(cohort AS BIGINT) AS cohort,
       CAST(age AS BIGINT) AS age,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(cohort_customers AS BIGINT) AS cohort_customers,
       rev,
       CAST(cum_rev AS DOUBLE) / CAST(cohort_customers AS DOUBLE)
         AS ltv_per_customer
FROM cum JOIN sized USING (cohort)
"""


# --- TF-IDF keywords --------------------------------------------------------

_KW_TOPK = 5


def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 keywords per document by tf × rational-idf (log-free; scores
    quantized to integers before ranking so ties are engine-exact).

    Shape: the (doc, term, tf) frame joins the vocabulary-sized df table
    on the term key; N attaches as a broadcast scalar; the ranking window
    partitions on doc_id. No corpus self-join anywhere."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    words = F.filter(F.split(normalize_text("text"), " "), lambda x: x != "")
    tf = (
        docs.select(F.col("doc_id"), F.explode(words).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(persist_tracked)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ndocs = with_global_scalars(
        tf.select("doc_id").distinct(), n_docs=F.count(F.lit(1)).cast("long")
    ).select("doc_id", "n_docs")
    idf = (
        (F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    score_q = F.floor(
        (F.col("tf").cast("double") * idf) * F.lit(1000000.0)
    ).cast("long")
    scored = (
        tf.join(dfreq, "term")
        .join(ndocs, "doc_id")
        .select("doc_id", "term", "tf", "df", score_q.alias("sq"))
    )
    w_rank = W.partitionBy("doc_id").orderBy(F.desc("sq"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= _KW_TOPK)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("rank").cast("long").alias("rank"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            (F.col("sq").cast("double") / F.lit(1000000.0)).alias("tfidf"),
        )
    )


_KW_SQL = f"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(str_split({_NORM.format(x="text")}, ' '),
                            x -> x <> '')) AS term
  FROM documents WHERE text IS NOT NULL
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
stats AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         CAST(FLOOR((CAST(t.tf AS DOUBLE)
                     * ((CAST(s.n_docs - d.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                        / (CAST(d.df AS DOUBLE) + CAST(0.5 AS DOUBLE))))
                    * CAST(1000000 AS DOUBLE)) AS BIGINT) AS sq
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN stats s
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(rank AS BIGINT) AS rank,
       term,
       CAST(tf AS BIGINT) AS tf,
       CAST(df AS BIGINT) AS df,
       CAST(sq AS DOUBLE) / CAST(1000000 AS DOUBLE) AS tfidf
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY sq DESC, term ASC) AS rank
  FROM scored
) WHERE rank <= {_KW_TOPK}
"""


QUERIES = {
    "tsdb_histogram_percentile": tsdb_histogram_percentile,
    "orders_cohort_ltv": orders_cohort_ltv,
    "text_tfidf_keywords": text_tfidf_keywords,
}

ORACLE = {
    "tsdb_histogram_percentile": _HIST_SQL,
    "orders_cohort_ltv": _LTV_SQL,
    "text_tfidf_keywords": _KW_SQL,
}
