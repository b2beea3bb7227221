"""Iterative graph algorithms beyond connected components.

``pagerank`` follows the same billion-edge discipline as
``dedup.connected_components_star``: every iteration is one equi-join on
the node key plus keyed aggregates, lineage is truncated per iteration
with an eager ``localCheckpoint`` (plans stay O(1) deep), and nothing
data-proportional ever reaches the driver. Dangling-node mass (nodes with
no out-edges) is redistributed uniformly via a broadcast 1-row aggregate
— the scalar-subquery house pattern, not a collect.

Determinism note: ``pagerank``'s ranks are float sums over incoming
contributions, so the last ulp depends on aggregation order — it
registers rows-only (driver contract for iterative/approximate ops) and
is pinned by property tests (probability mass conservation,
uniform-cycle symmetry, hub dominance, cross-run tolerance) in
``tests/test_properties.py``. ``pagerank_quantized`` (round 8) is the
oracle-checkable twin: ranks live in BIGINT at scale 1e12 and every
per-edge contribution is floor-divided BEFORE summation, so the result
is order-independent exact integers a DuckDB recursive CTE reproduces
bit-for-bit. The floors leak ≤ 1 rank-unit per edge per iteration
(≤ edges·iters/1e12 of total mass — documented deviation from the real
power iteration, immaterial at scale 1e12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    node_col: str = "id",
    damping: float = 0.85,
    iters: int = 15,
    checkpoint_every: int = 1,
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)``; symmetrize the
    edges first for an undirected graph. Returns ``(node_col, rank)``
    with ranks summing to 1 over ``nodes``.

    Fixed iteration count (no convergence probe): 15 damped iterations
    bound the residual below 0.85^15 ≈ 0.009 of the initial mass —
    deterministic job count, no driver round-trips per iteration."""
    ids = nodes.select(F.col(node_col).alias("nid")).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    out_edges = edges.join(deg, "src").persist()
    out_edges.count()  # materialize once; reused every iteration

    n_scalar = ids.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ranks = ids.crossJoin(F.broadcast(n_scalar)).select(
        "nid", "n", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    has_out = deg.select(F.col("src").alias("nid"), F.lit(1).alias("has_out"))

    for i in range(iters):
        contribs = (
            ranks.join(out_edges, ranks.nid == out_edges.src)
            .select(
                F.col("dst").alias("nid"),
                (F.col("rank") / F.col("deg").cast("double")).alias("c"),
            )
            .groupBy("nid")
            .agg(F.sum("c").alias("inflow"))
        )
        dangling = (
            ranks.join(has_out, "nid", "left")
            .where(F.col("has_out").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
        )
        ranks = (
            ranks.select("nid", "n")
            .join(contribs, "nid", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "nid",
                "n",
                (
                    (F.lit(1.0) - F.lit(damping)) / F.col("n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dmass") / F.col("n")
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)

    out_edges.unpersist()
    return ranks.select(F.col("nid").alias(node_col), "rank")


#: Rank scale for :func:`pagerank_quantized` (1e12 rank units = mass 1.0).
PR_SCALE = 1_000_000_000_000


def pagerank_quantized(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    node_col: str = "id",
    damping_pct: int = 85,
    iters: int = 15,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Integer PageRank — the oracle-checkable twin of :func:`pagerank`.

    Ranks are BIGINTs at scale :data:`PR_SCALE`; each iteration computes

    ``r' = ((100-dp)·S) div (100·N)                      (teleport)
         + (dp·dmass) div (100·N)                        (dangling share)
         + Σ_in (dp·r_src) div (100·deg_src)             (edge inflow)``

    with ``div`` integral division on non-negative longs — every term is
    an exact integer independent of aggregation order, so a DuckDB
    recursive CTE replays the iteration bit-for-bit. The same plan shape
    and lineage discipline as :func:`pagerank` (one equi-join + keyed
    aggregate per iteration, eager ``localCheckpoint`` lineage cut,
    broadcast 1-row dangling mass). Returns ``(node_col, rank_q, rank)``
    where ``rank = rank_q / S`` (one double division).

    Overflow headroom: ``dp·r ≤ 100·S = 1e14`` and per-node inflow sums
    stay below total mass ``S`` — far inside int64.
    """
    ids = nodes.select(F.col(node_col).alias("nid")).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    out_edges = edges.join(deg, "src").persist()
    out_edges.count()  # materialize once; reused every iteration

    n_scalar = ids.agg(F.count(F.lit(1)).alias("n"))
    ranks = ids.crossJoin(F.broadcast(n_scalar)).selectExpr(
        "nid", "n", f"CAST({PR_SCALE} AS BIGINT) div n AS r"
    )
    has_out = deg.select(F.col("src").alias("nid"), F.lit(1).alias("has_out"))
    dp, cp = damping_pct, 100 - damping_pct

    for i in range(iters):
        contribs = (
            ranks.join(out_edges, ranks.nid == out_edges.src)
            .selectExpr("dst AS nid", f"({dp}L * r) div (100L * deg) AS c")
            .groupBy("nid")
            .agg(F.sum("c").alias("inflow"))
        )
        dangling = (
            ranks.join(has_out, "nid", "left")
            .where(F.col("has_out").isNull())
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dmass"))
        )
        ranks = (
            ranks.select("nid", "n")
            .join(contribs, "nid", "left")
            .crossJoin(F.broadcast(dangling))
            .selectExpr(
                "nid",
                "n",
                f"({cp}L * CAST({PR_SCALE} AS BIGINT)) div (100L * n)"
                f" + ({dp}L * dmass) div (100L * n)"
                " + coalesce(inflow, 0L) AS r",
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)

    out_edges.unpersist()
    return ranks.selectExpr(
        f"nid AS {node_col}",
        "r AS rank_q",
        f"CAST(r AS DOUBLE) / {PR_SCALE} AS rank",
    )
