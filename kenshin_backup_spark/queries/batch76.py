"""Batch-76 query (round 8): oracle-checkable integer PageRank.

``graph_pagerank_quantized`` upgrades PageRank centrality (the
canonical-representative signal over the near-dup graph) from
rows-only evidence to a full rows+schema+hash driver certification.
The float variant (``graph_pagerank_docs``) stays rows-only — float
inflow sums depend on aggregation order — so this twin runs
:func:`kenshin_backup_spark.operators.graph.pagerank_quantized`:
ranks as BIGINTs at scale 1e12 with every per-edge contribution
floor-divided BEFORE summation, making each iteration exact integer
arithmetic that a DuckDB recursive CTE replays bit-for-bit.

The graph is the same symmetrized df-capped 3-gram Jaccard near-dup
graph as the float query (edges proven cross-engine by
``dedup_ngram_jaccard_capped``'s parity; Spark joins xxhash64 shingle
keys, the oracle joins strings — the documented ~1e-10 collision
bound). Dangling nodes (isolated docs) redistribute their mass
uniformly each iteration.

Oracle shape: the recursive term may reference the iteration state
only ONCE, but an iteration needs both the dangling-mass total and the
per-edge inflows — so one scan of the state computes ``dmass`` as an
unpartitioned window (bounded: the state is one row per node), LEFT
JOINs the edge list, and then FANS OUT via ``UNNEST([0,1])``: the
``which=0`` copy (kept only on each node's first joined row) carries
teleport + dangling share to the node itself, the ``which=1`` copies
carry edge contributions to their targets; one GROUP BY sums both row
kinds. 15 lockstep iterations.

Scale notes (100 TB): identical plan shape to the float PageRank —
per iteration one equi-join on the node key, one keyed aggregate, a
broadcast 1-row dangling scalar, and an eager ``localCheckpoint``
lineage cut. The quantization adds zero shuffles; the recursion exists
only oracle-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.operators.dedup import ngram_jaccard_pairs
from kenshin_backup_spark.operators.graph import PR_SCALE, pagerank_quantized
from kenshin_backup_spark.sources import load_table

_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"
_ITERS = 15
_DP = 85


def graph_pagerank_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer PageRank over the symmetrized near-dup graph — the
    oracle-checkable twin of ``graph_pagerank_docs`` (see module
    docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=10)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    ranks = pagerank_quantized(
        edges, docs.select("doc_id"), node_col="doc_id",
        damping_pct=_DP, iters=_ITERS,
    )
    return ranks.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("rank_q").cast("long").alias("rank_q"),
        F.col("rank").cast("double").alias("rank"),
    )


_PR_SQL = f"""
WITH RECURSIVE
norm AS (
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
pairs AS (
  SELECT c.id_a, c.id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
    FROM posting a JOIN posting b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ) c
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
  WHERE CAST(c.common AS DOUBLE) / (sa.sz + sb.sz - c.common) >= 0.2
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
degs AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
nodes AS (SELECT doc_id AS nid FROM documents),
consts AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
pr AS (
  SELECT CAST(0 AS BIGINT) AS it, nid, CAST({PR_SCALE} AS BIGINT) // c.n AS r
  FROM nodes CROSS JOIN consts c
  UNION ALL
  SELECT it + 1 AS it, tgt AS nid, SUM(amt) AS r FROM (
    SELECT j.it,
           CASE WHEN u.which = 0 THEN j.nid ELSE j.dst END AS tgt,
           CASE WHEN u.which = 0
                THEN ({100 - _DP} * CAST({PR_SCALE} AS BIGINT)) // (100 * j.n)
                     + ({_DP} * j.dmass) // (100 * j.n)
                ELSE ({_DP} * j.r) // (100 * j.deg)
                END AS amt
    FROM (
      SELECT x.it, x.nid, x.r, x.deg, x.n, x.dmass, e.dst,
             ROW_NUMBER() OVER (PARTITION BY x.nid ORDER BY e.dst) AS rn
      FROM (
        SELECT p.it, p.nid, p.r, d.deg, c.n,
               SUM(CASE WHEN d.deg IS NULL THEN p.r ELSE 0 END) OVER () AS dmass
        FROM pr p
        LEFT JOIN degs d ON d.src = p.nid
        CROSS JOIN consts c
        WHERE p.it < {_ITERS}
      ) x
      LEFT JOIN edges e ON e.src = x.nid
    ) j
    CROSS JOIN (SELECT UNNEST([0, 1]) AS which) u
    WHERE (u.which = 0 AND j.rn = 1) OR (u.which = 1 AND j.dst IS NOT NULL)
  ) GROUP BY 1, 2
)
SELECT nid AS doc_id, r AS rank_q,
       CAST(r AS DOUBLE) / {PR_SCALE} AS rank
FROM pr WHERE it = {_ITERS}
"""


QUERIES = {
    "graph_pagerank_quantized": graph_pagerank_quantized,
}

ORACLE = {
    "graph_pagerank_quantized": _PR_SQL,
}
