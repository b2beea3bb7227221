"""Batch-74 query (round 8): the oracle-checkable IVF ANN path.

``emb_ann_ivf_seeded`` upgrades the inverted-file ANN layout (SURVEY
§2.9 X3's "IVF as the scale path") from rows-only evidence to a full
rows+schema+hash driver certification. The k-means variant
(``emb_ann_ivf``) stays rows-only by nature — MLlib centroids are not
reproducible in another engine — so this twin replaces its TRAINING
step with a deterministic seed draw (the ``n_centroids`` corpus vectors
with the smallest ``md5(vec_id)``) while keeping the genuine IVF
execution shape: cells as the equi-join key, ``nprobe`` probed cells
per query, exact scoring only inside probed cells.

Every stage is integer-exact (quantized vectors; squared L2 as
``n2_q + n2_c − 2·dot``, all BIGINT; ties → lower cid), so the DuckDB
oracle reproduces the Spark result bit-for-bit — including which cells
each query probes and therefore which neighbors are reachable.

Scale notes (100 TB): centroids are a bounded driver collect (guarded
≤4096) re-emitted as one SQL literal → candidate assignment is a pure
scan-side projection, the corpus never shuffles for assignment; the
routed-query side (|Q|·nprobe rows) broadcasts onto the assigned
corpus; the per-query top-k window sees only probed-cell candidates
(≈ nprobe/n_centroids of the corpus). The oracle's CROSS JOIN against
the centroid table mirrors the same n_centroids-wide comparison the
literal performs scan-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.operators.similarity import ivf_topk_seeded
from kenshin_backup_spark.sources import load_table

_K = 5
_N_CENTROIDS = 16
_NPROBE = 3
_N_QUERIES = 20


def emb_ann_ivf_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5 with the deterministic seeded coarse quantizer —
    the inverted-file scale path, fully oracle-checkable (see module
    docstring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    out = ivf_topk_seeded(
        queries, emb, k=_K, n_centroids=_N_CENTROIDS, nprobe=_NPROBE
    )
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "cosine",
        "rank",
    )


_IVF_SQL = f"""
WITH q0 AS (
  SELECT vec_id AS id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS v
  FROM embeddings
),
-- zero-norm guard (mirrors ivf_topk_seeded): NaN cosines rank
-- differently in Spark vs DuckDB, so zero vectors are excluded
q AS (
  SELECT id, v, list_dot_product(v, v) AS n2
  FROM q0 WHERE list_dot_product(v, v) > 0
),
-- deterministic quantizer "training": the {_N_CENTROIDS} vectors with
-- the smallest md5(id), ranked into cids by that order
cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id)
              AS BIGINT) AS cid,
         v AS cv, n2 AS cn2
  FROM q
  ORDER BY md5(CAST(id AS VARCHAR)), id
  LIMIT {_N_CENTROIDS}
),
-- assignment: nearest centroid by exact integer squared L2
-- (n2 + cn2 - 2*dot), ties -> lower cid; one cell per candidate
assign AS (
  SELECT id AS neighbor_id, v AS cv, n2 AS cn, cid FROM (
    SELECT q.id, q.v, q.n2, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY q.id
             ORDER BY q.n2 + c.cn2 - 2 * list_dot_product(q.v, c.cv), c.cid
           ) AS rn
    FROM q CROSS JOIN cents c
  ) WHERE rn = 1
),
-- routing: each query probes its nprobe nearest cells, same metric
probes AS (
  SELECT id AS query_id, v AS qv, n2 AS qn, cid FROM (
    SELECT q.id, q.v, q.n2, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY q.id
             ORDER BY q.n2 + c.cn2 - 2 * list_dot_product(q.v, c.cv), c.cid
           ) AS rn
    FROM q CROSS JOIN cents c WHERE q.id < {_N_QUERIES}
  ) WHERE rn <= {_NPROBE}
),
scored AS (
  SELECT p.query_id, a.neighbor_id,
         CAST(list_dot_product(p.qv, a.cv)
              / sqrt(CAST(p.qn AS DOUBLE) * CAST(a.cn AS DOUBLE))
              AS DOUBLE) AS cosine
  FROM probes p JOIN assign a USING (cid)
  WHERE p.query_id != a.neighbor_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
           ) AS BIGINT) AS rank
  FROM scored
) t WHERE rank <= {_K}
"""


QUERIES = {
    "emb_ann_ivf_seeded": emb_ann_ivf_seeded,
}

ORACLE = {
    "emb_ann_ivf_seeded": _IVF_SQL,
}
