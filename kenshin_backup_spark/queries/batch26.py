"""Batch-26 queries: int8 embedding quantization (the 4x storage/IO lever
for 100 TB embedding tables), a Jaccard threshold sweep with INTEGER-space
threshold tests, a graphite transform chain, and event inter-arrival
statistics.

Determinism notes: the quantization pipeline casts float32 -> double
BEFORE any arithmetic and uses FLOOR(x + 0.5) instead of round() (banker's
rounding differs between engines); the sweep compares
``common * 10 >= t10 * union`` so no float threshold ever appears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import (
    EPOCH_S_SQL,
    QSUM_SQL,
    qsum,
)
from kenshin_backup_spark.operators.dedup import ngram_jaccard_pairs
from kenshin_backup_spark.operators.rollup import finalize, rollup_partials
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")


# --- int8 scalar quantization of embeddings --------------------------------

def emb_int8_quantize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (per-dimension) int8 quantization audit: per dimension, the
    min/max calibration range and the worst absolute reconstruction error
    across the corpus after an 8-bit round trip.

    This is the storage layout an ANN serving tier actually ships — 4x
    smaller than float32, scanned 4x faster — and the max-error column is
    the go/no-go gate for adopting it. Two aggregation passes (calibrate,
    then audit), both partial-aggregated scans; no UDF, no collect.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    # one row per (vec, dim): posexplode the array ONCE, cast to double
    flat = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "v32")
    ).select("dim", F.col("v32").cast("double").alias("v"))
    cal = flat.groupBy("dim").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    q = flat.join(F.broadcast(cal), "dim").select(
        "dim",
        "v",
        "lo",
        "hi",
        F.floor((F.col("v") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 255.0 + 0.5)
        .cast("long")
        .alias("code"),
    )
    recon = F.col("code").cast("double") / 255.0 * (F.col("hi") - F.col("lo")) + F.col("lo")
    err = F.abs(recon - F.col("v"))
    # quantize the error stat itself so the aggregate is order-free exact
    return (
        q.select("dim", "lo", "hi", F.floor(err * 10000000).cast("long").alias("errq"))
        .groupBy("dim")
        .agg(
            F.min("lo").alias("lo"),
            F.max("hi").alias("hi"),
            (F.max("errq").cast("double") / 10000000).alias("max_abs_err"),
        )
        .select(
            F.col("dim").cast("long").alias("dim"),
            F.col("lo").cast("double").alias("lo"),
            F.col("hi").cast("double").alias("hi"),
            "max_abs_err",
        )
    )


_INT8_SQL = """
WITH flat AS (
  -- parallel UNNESTs of equal-length lists zip positionally in DuckDB
  SELECT UNNEST(generate_series(1, len(embedding))) - 1 AS dim,
         UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
  FROM embeddings
),
cal AS (
  SELECT dim, MIN(v) AS lo, MAX(v) AS hi FROM flat GROUP BY dim
),
q AS (
  SELECT f.dim, f.v, c.lo, c.hi,
         CAST(FLOOR((f.v - c.lo) / (c.hi - c.lo) * 255.0 + 0.5) AS BIGINT) AS code
  FROM flat f JOIN cal c USING (dim)
)
SELECT dim, MIN(lo) AS lo, MAX(hi) AS hi,
       CAST(MAX(CAST(FLOOR(abs(CAST(code AS DOUBLE) / 255.0 * (hi - lo) + lo - v)
                           * 10000000) AS BIGINT)) AS DOUBLE) / 10000000
         AS max_abs_err
FROM q GROUP BY dim
"""


# --- Jaccard threshold sweep ----------------------------------------------

def llm_jaccard_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup tuning curve: from ONE capped posting-join pass, the pair
    count and affected-document count at every candidate threshold — the
    table a curator reads to pick the dedup cutoff. Thresholds are tested
    in integer space (``common*10 >= t10*union``), so the sweep is exact.

    Scale: the pair table is computed once; the sweep is a tiny
    crossJoin-free explode over 4 threshold literals."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.0, max_df=10).select(
        "id_a", "id_b", "common", (F.col("size_a") + F.col("size_b") - F.col("common")).alias("un")
    )
    thresholds = F.array(*[F.lit(t) for t in (2, 3, 5, 7)])
    swept = pairs.select(
        "id_a", "id_b", "common", "un", F.explode(thresholds).alias("t10")
    ).where(F.col("common") * 10 >= F.col("t10") * F.col("un"))
    per_t = swept.groupBy("t10").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("id_a").alias("n_left_docs"),
    )
    return per_t.select(
        F.col("t10").cast("long").alias("t10"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("n_left_docs").cast("long").alias("n_left_docs"),
    )


_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"

_SWEEP_SQL = f"""
WITH norm AS (
  SELECT doc_id, str_split({_NORM.format(x="text")}, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(w) - 2, 0)),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
  FROM norm
),
posting0 AS (SELECT doc_id, UNNEST(sh) AS g FROM grams),
keep AS (SELECT g FROM posting0 GROUP BY g HAVING COUNT(*) <= 10),
posting AS (SELECT doc_id, g FROM posting0 JOIN keep USING (g)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM posting GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
  FROM posting a JOIN posting b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT c.id_a, c.id_b, c.common, sa.sz + sb.sz - c.common AS un
  FROM common c
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
),
swept AS (
  SELECT p.*, t.t10
  FROM pairs p CROSS JOIN (SELECT UNNEST([2, 3, 5, 7]) AS t10) t
  WHERE p.common * 10 >= t.t10 * p.un
)
SELECT CAST(t10 AS BIGINT) AS t10, COUNT(*) AS n_pairs,
       COUNT(DISTINCT id_a) AS n_left_docs
FROM swept GROUP BY t10
"""


# --- graphite transform chain ---------------------------------------------

def _ten_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    metric = F.concat_ws(
        ".",
        F.lit("app"),
        F.col("event_type"),
        F.concat(F.lit("u"), (F.col("user_id") % 4).cast("string")),
    )
    d = ev.select(metric.alias("metric"), "ts", "value")
    return finalize(
        rollup_partials(d, key_cols=["metric"], step_seconds=600), agg="average"
    ).select("metric", "bucket_ts", "value")


_TEN_SQL = f"""
e AS (
  SELECT 'app.' || event_type || '.u' || CAST(user_id % 4 AS VARCHAR) AS metric,
         value, CAST(({_ES} // 600) * 600 AS BIGINT) AS bucket_ts
  FROM events
),
ten AS (
  SELECT metric, bucket_ts,
         CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS DOUBLE)
           / 1000000 / COUNT(value) AS value
  FROM e GROUP BY metric, bucket_ts
)
"""


def graphite_transform_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graphite ``countSeries`` + ``averageSeries(absolute(offset(scale(
    series, 2), -300)))``: the linear-transform chain every dashboard
    composes. scale/offset/absolute are exact double ops on the quantized
    frame; the cross-series average re-quantizes (sum of FLOOR(x*1e6)
    ints) so it is order-free."""
    ten = _ten_series(spark, sf_dir).select(
        "metric",
        "bucket_ts",
        F.abs(F.col("value") * 2.0 - 300.0).alias("value"),
    )
    return (
        ten.groupBy("bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("n_series"),
            qsum("value", "sum_t"),
        )
        .select(
            F.col("bucket_ts").cast("long").alias("bucket_ts"),
            F.col("n_series").cast("long").alias("n_series"),
            (F.col("sum_t") / F.col("n_series")).alias("avg_transformed"),
        )
    )


_CHAIN_SQL = f"""
WITH {_TEN_SQL},
t AS (
  SELECT metric, bucket_ts, abs(value * 2.0 - 300.0) AS value FROM ten
)
SELECT bucket_ts, COUNT(*) AS n_series,
       {QSUM_SQL.format(x="value")} / COUNT(*) AS avg_transformed
FROM t GROUP BY bucket_ts
"""


# --- event inter-arrival statistics ---------------------------------------

def events_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival profile: gap count, mean/max gap in whole
    seconds, and the median gap — the load-model input for capacity
    planning and bot detection (impossibly regular or fast users).

    Gaps are integer second differences from a per-user lag window; the
    median over integers interpolates identically in both engines."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    es = F.unix_timestamp("ts").cast("long")
    w = W.partitionBy("user_id").orderBy("es", "event_id")
    gaps = (
        ev.select("user_id", "event_id", es.alias("es"))
        .withColumn("gap", F.col("es") - F.lag("es").over(w))
        .where(F.col("gap").isNotNull())
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        (F.sum("gap").cast("double") / F.count(F.lit(1))).alias("mean_gap"),
        F.max("gap").cast("long").alias("max_gap"),
        F.percentile("gap", 0.5).alias("median_gap"),
    )


_ARRIVAL_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, CAST({_ES} AS BIGINT) AS es FROM events
),
gaps AS (
  SELECT user_id,
         es - LAG(es) OVER (PARTITION BY user_id ORDER BY es, event_id) AS gap
  FROM e
)
SELECT user_id,
       COUNT(*) AS n_gaps,
       CAST(SUM(gap) AS DOUBLE) / COUNT(*) AS mean_gap,
       MAX(gap) AS max_gap,
       quantile_cont(gap, 0.5) AS median_gap
FROM gaps WHERE gap IS NOT NULL
GROUP BY user_id
"""


QUERIES = {
    "emb_int8_quantize_stats": emb_int8_quantize_stats,
    "llm_jaccard_threshold_sweep": llm_jaccard_threshold_sweep,
    "graphite_transform_chain": graphite_transform_chain,
    "events_inter_arrival": events_inter_arrival,
}

ORACLE = {
    "emb_int8_quantize_stats": _INT8_SQL,
    "llm_jaccard_threshold_sweep": _SWEEP_SQL,
    "graphite_transform_chain": _CHAIN_SQL,
    "events_inter_arrival": _ARRIVAL_SQL,
}
