"""Batch-55 queries (round 4): ANN quality certification + skew ops report.

- ``retrieval_ann_recall_report`` — per-query recall@5 of the SRP-banded
  ANN top-k (``emb_ann_topk_srp``'s plan) against the exact brute-force
  cosine ranking. This turns the ANN operator's *quality* into an
  oracle-checked number: the driver hash covers not just "the ANN runs"
  but "its recall against ground truth is exactly this, in both engines".
  Both rankings are integer-deterministic (quantized vectors, integer SRP
  hyperplanes), so the recall join is exact — rare for an LSH method.
- ``layout_partition_skew_report`` — the partition-skew dashboard that
  decides salting factors at 100 TB: per partition key (event_type), row
  count, share of table, skew ratio vs the mean partition, and the
  recommended salt fan-out ``ceil(n_rows / target_rows_per_task)``. The
  global totals come from a broadcast 1-row aggregate (house pattern), not
  a global window.

Scale notes: the recall report joins two per-query top-5 frames — volume
is O(|queries| * k), independent of corpus size; the ANN side never
cross-joins (band equi-join; see operators/similarity.srp_topk). The skew
report is one map-side-combinable count per key plus a broadcast scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.operators.similarity import (
    cosine_topk,
    srp_planes,
    srp_topk,
)
from kenshin_backup_spark.sources import load_table

_PLANES = 24
_BANDS = 4
_K = 5


def retrieval_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of SRP-banded ANN vs exact cosine, per query vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    exact = cosine_topk(queries, emb, k=_K).select(
        "query_id", "neighbor_id"
    )
    ann = (
        srp_topk(queries, emb, k=_K, num_planes=_PLANES, bands=_BANDS)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        exact.join(ann, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
        )
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("n_exact").cast("long").alias("n_exact"),
            F.col("n_hits").cast("long").alias("n_hits"),
            (F.col("n_hits") / F.col("n_exact").cast("double"))
            .cast("double")
            .alias("recall"),
        )
    )


def _ann_recall_sql() -> str:
    planes = srp_planes(_PLANES, 64)
    bits_per_band = _PLANES // _BANDS
    values = ",\n         ".join(f"({i}, {p})" for i, p in enumerate(planes))
    return f"""
WITH q0 AS (
  SELECT vec_id AS id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
  FROM embeddings
),
q AS (SELECT id, v FROM q0 WHERE list_dot_product(v, v) > 0),
n AS (SELECT id, list_dot_product(v, v) AS n2 FROM q),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT qa.id AS query_id, qb.id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY qa.id
             ORDER BY CAST(list_dot_product(qa.v, qb.v)
                      / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))
                      AS DOUBLE) DESC, qb.id ASC) AS rank
    FROM q qa JOIN q qb ON qa.id < 20 AND qa.id != qb.id
    JOIN n na ON na.id = qa.id
    JOIN n nb ON nb.id = qb.id
  ) t WHERE rank <= {_K}
),
planes AS (
  SELECT * FROM (VALUES {values}) AS t(p, comp)
),
bits AS (
  SELECT q.id, planes.p,
         CASE WHEN list_dot_product(q.v, planes.comp) > 0 THEN 1 ELSE 0 END AS b
  FROM q CROSS JOIN planes
),
bands AS (
  SELECT id, p // {bits_per_band} AS band,
         CAST(SUM(b * (1 << (p % {bits_per_band}))) AS BIGINT) AS key
  FROM bits GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT qb.id AS query_id, cb.id AS neighbor_id
  FROM bands qb JOIN bands cb ON qb.band = cb.band AND qb.key = cb.key
  WHERE qb.id < 20 AND qb.id != cb.id
),
ann AS (
  SELECT query_id, neighbor_id FROM (
    SELECT c.query_id, c.neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY c.query_id
             ORDER BY CAST(list_dot_product(qa.v, qb.v)
                      / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))
                      AS DOUBLE) DESC, c.neighbor_id ASC) AS rank
    FROM cand c
    JOIN q qa ON qa.id = c.query_id
    JOIN q qb ON qb.id = c.neighbor_id
    JOIN n na ON na.id = c.query_id
    JOIN n nb ON nb.id = c.neighbor_id
  ) t WHERE rank <= {_K}
)
SELECT e.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            / CAST(COUNT(*) AS DOUBLE) AS DOUBLE) AS recall
FROM exact e
LEFT JOIN ann a
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


#: Target rows per task for the salting recommendation.
TARGET_ROWS = 2_000


def layout_partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key row counts, skew ratio vs mean, recommended salt fan-out."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(F.col("event_type").alias("pkey")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "pkey",
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.col("n_rows") / F.col("total_rows").cast("double"))
            .cast("double")
            .alias("share"),
            (
                F.col("n_rows")
                * F.col("n_keys")
                / F.col("total_rows").cast("double")
            )
            .cast("double")
            .alias("skew_ratio"),
            F.ceil(F.col("n_rows") / F.lit(float(TARGET_ROWS)))
            .cast("long")
            .alias("salt_factor"),
        )
    )


_SKEW_SQL = f"""
WITH counts AS (
  SELECT event_type AS pkey, COUNT(*) AS n_rows FROM events GROUP BY 1
),
totals AS (
  SELECT SUM(n_rows) AS total_rows, COUNT(*) AS n_keys FROM counts
)
SELECT pkey, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_rows / CAST(total_rows AS DOUBLE) AS DOUBLE) AS share,
       CAST(n_rows * n_keys / CAST(total_rows AS DOUBLE) AS DOUBLE)
         AS skew_ratio,
       CAST(CEIL(n_rows / {TARGET_ROWS}.0) AS BIGINT) AS salt_factor
FROM counts CROSS JOIN totals
"""


QUERIES = {
    "retrieval_ann_recall_report": retrieval_ann_recall_report,
    "layout_partition_skew_report": layout_partition_skew_report,
}

ORACLE = {
    "retrieval_ann_recall_report": _ann_recall_sql(),
    "layout_partition_skew_report": _SKEW_SQL,
}
