"""Batch-32 queries (round 3): graph analytics over the near-duplicate
graph — degree-ordered triangle counting and clustering coefficient, the
standard "how clique-y is my dedup graph" diagnostic (dense triangle
clusters = template/boilerplate families; sparse chains = drift chains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.cache import persist_tracked
from kenshin_backup_spark.operators.dedup import ngram_jaccard_pairs
from kenshin_backup_spark.sources import load_table

_NORM = "trim(regexp_replace(lower({x}), '\\s+', ' ', 'g'))"

_TRI_T = 0.5


def graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + wedge count + global clustering coefficient of the
    n-gram near-dup graph (Jaccard ≥ 0.5 pairs as undirected edges).

    Algorithm (the MapReduce-classic degree-ordered orientation): orient
    every edge from its (degree, id)-smaller endpoint to the larger; a
    triangle {u,v,w} then has EXACTLY ONE wedge u→v, u→w with a closing
    oriented edge v→w, so one self-join on the oriented source + one
    semi-join against the edge set counts each triangle once. Orientation
    bounds the join fan-out by the max OUT-degree ≤ O(√m) on any graph —
    hub nodes never explode the wedge join (the reason production triangle
    counters orient by degree).

    Wedges (open + closed, for the clustering coefficient) are
    Σ deg·(deg−1)/2 — a per-node expression, no join. Global clustering
    coefficient = 3·triangles / wedges (exact integer-derived double).

    At 100 TB: edges come from the already-bucketed near-dup pipeline; the
    wedge join shuffles the oriented edge list twice — both keyed by
    vertex, both bounded by the orientation.
    """
    docs = load_table(spark, sf_dir, "documents")
    edges = (
        ngram_jaccard_pairs(docs, threshold=_TRI_T)
        .select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .transform(persist_tracked)
    )
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
        .transform(persist_tracked)
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    with_deg = edges.join(du, "u").join(dv, "v")
    # orient by (degree, id): src = smaller endpoint under that order
    src_is_u = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(src_is_u, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(src_is_u, F.col("v")).otherwise(F.col("u")).alias("d"),
    ).transform(persist_tracked)

    a = oriented.alias("a")
    b = oriented.alias("b")
    # wedges from a common oriented source; d1 < d2 under the SAME total
    # order is implied by orientation only within each edge, so order the
    # wedge pair by (its own endpoints) to count each unordered pair once
    wedge = a.join(b, F.col("a.s") == F.col("b.s")).where(
        F.col("a.d") < F.col("b.d")
    ).select(F.col("a.d").alias("x"), F.col("b.d").alias("y"))
    # the closing edge may be oriented either way between x and y; normalize
    closing = oriented.select(
        F.least("s", "d").alias("x"), F.greatest("s", "d").alias("y")
    )
    tri_df = (
        wedge.join(closing, ["x", "y"], "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    # four 1-row aggregates crossJoined into the summary row — one plan,
    # no driver-side collect
    nodes_df = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    edges_df = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    wedges_df = deg.agg(
        F.coalesce(
            F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("long"), F.lit(0)
        ).alias("n_wedges")
    )
    return (
        nodes_df.crossJoin(edges_df)
        .crossJoin(tri_df)
        .crossJoin(wedges_df)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.when(F.col("n_wedges") == 0, F.lit(0.0))
            .otherwise(3.0 * F.col("n_triangles") / F.col("n_wedges"))
            .cast("double")
            .alias("clustering_coeff"),
        )
    )


def _tri_sql() -> str:
    return f"""
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
posting AS (SELECT doc_id, UNNEST(sh) AS g FROM grams),
common AS (
  SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS c
  FROM posting a JOIN posting b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, len(sh) AS sz FROM grams),
edges AS (
  SELECT u, v FROM common
  JOIN sizes sa ON sa.doc_id = u
  JOIN sizes sb ON sb.doc_id = v
  WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= {_TRI_T}
),
deg AS (
  SELECT n, COUNT(*) AS deg FROM (
    SELECT u AS n FROM edges UNION ALL SELECT v AS n FROM edges
  ) t GROUP BY 1
),
oriented AS (
  SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS s,
         CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS d
  FROM edges e
  JOIN deg du ON du.n = e.u
  JOIN deg dv ON dv.n = e.v
),
wedge AS (
  SELECT a.d AS x, b.d AS y
  FROM oriented a JOIN oriented b ON a.s = b.s AND a.d < b.d
),
closing AS (
  SELECT LEAST(s, d) AS x, GREATEST(s, d) AS y FROM oriented
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM wedge w WHERE EXISTS (
    SELECT 1 FROM closing c WHERE c.x = w.x AND c.y = w.y
  )
),
agg AS (
  SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
         (SELECT COUNT(*) FROM edges) AS n_edges,
         (SELECT n_triangles FROM tri) AS n_triangles,
         (SELECT CAST(SUM(deg * (deg - 1) / 2) AS BIGINT) FROM deg) AS n_wedges
)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_triangles AS BIGINT) AS n_triangles,
       CAST(COALESCE(n_wedges, 0) AS BIGINT) AS n_wedges,
       CASE WHEN COALESCE(n_wedges, 0) = 0 THEN 0.0
            ELSE CAST(3.0 * n_triangles / n_wedges AS DOUBLE) END
         AS clustering_coeff
FROM agg
"""


# --- interval overlap join --------------------------------------------------

def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: each order's fulfillment window is
    ``[o_orderdate, max(l_shipdate)]``; find pairs of the SAME customer's
    orders whose windows overlap (concurrent fulfillment — the classic
    interval join, here keyed by a natural partition column).

    Plan: intervals built by one grouped agg; the pair join is an
    EQUI-join on the customer key with the overlap predicate evaluated
    inside each (small) customer group — never an unkeyed theta join.
    Where no natural key exists, the same operator buckets intervals by
    coarse time range first (`range_join_value_bands` shows that shape).

    Overlap length is reported in whole days (integer-exact).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    win = (
        li.groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("ship_end"))
        .join(
            orders.select(
                "o_orderkey",
                "o_custkey",
                F.to_date("o_orderdate").alias("ord_start"),
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.datediff("ord_start", F.lit("1970-01-01").cast("date")).alias("s"),
            F.datediff("ship_end", F.lit("1970-01-01").cast("date")).alias("e"),
        )
    )
    # persist: the agg+join frame feeds both sides of the interval pair
    # join (house persist rule — without it the groupBy runs twice)
    win = win.transform(persist_tracked)
    a = win.alias("a")
    b = win.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (F.col("a.s") <= F.col("b.e"))
        & (F.col("b.s") <= F.col("a.e")),
    )
    overlap_days = (
        F.least(F.col("a.e"), F.col("b.e")) - F.greatest(F.col("a.s"), F.col("b.s"))
    )
    return pairs.select(
        F.col("a.o_custkey").cast("long").alias("custkey"),
        F.col("a.o_orderkey").cast("long").alias("orderkey_a"),
        F.col("b.o_orderkey").cast("long").alias("orderkey_b"),
        (overlap_days + 1).cast("long").alias("overlap_days"),
    )


_OVERLAP_SQL = """
WITH win AS (
  SELECT o.o_orderkey, o.o_custkey,
         CAST(epoch_ms(CAST(o.o_orderdate AS TIMESTAMP)) // 86400000 AS BIGINT) AS s,
         CAST(epoch_ms(CAST(MAX(l.l_shipdate) AS TIMESTAMP)) // 86400000 AS BIGINT) AS e
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2, 3
)
SELECT a.o_custkey AS custkey,
       a.o_orderkey AS orderkey_a,
       b.o_orderkey AS orderkey_b,
       LEAST(a.e, b.e) - GREATEST(a.s, b.s) + 1 AS overlap_days
FROM win a JOIN win b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
 AND a.s <= b.e AND b.s <= a.e
"""


QUERIES = {
    "graph_triangle_stats": graph_triangle_stats,
    "join_interval_overlap": join_interval_overlap,
}

ORACLE = {
    "graph_triangle_stats": _tri_sql(),
    "join_interval_overlap": _OVERLAP_SQL,
}
