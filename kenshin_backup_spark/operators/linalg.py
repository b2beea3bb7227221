"""Distributed linear algebra for embedding pipelines: PCA projection.

The 100 TB-safe PCA recipe (the layout OPQ / whitening / dimension-
reduction steps in vector pipelines all share):

1. **Moment accumulation (distributed).** One `posexplode` pass emits
   (vec_id, dim, value); a self-join on ``vec_id`` with ``i <= j`` forms
   the upper-triangle outer product rows, and a groupBy(i, j) sums them —
   Σxᵢ and Σxᵢxⱼ partial-aggregate map-side, so the shuffle volume is
   the d(d+1)/2 key space, not the corpus.
2. **Bounded collect.** Exactly d + d(d+1)/2 scalars (64 + 2080 here)
   come to the driver — independent of corpus size. This is the same
   "collect a bounded sketch, never the data" discipline as IVF's
   centroid collect and CC's convergence probe.
3. **Driver eigensolve.** numpy ``eigh`` on the d×d covariance (64×64 —
   microseconds); components broadcast back as ONE SQL array literal
   (the `_srp_band_keys` lesson: never per-element ``F.lit``).
4. **Scan-side projection.** Each vector's top-k projections are
   ``F.aggregate`` dot products — codegen'd, no UDF, no shuffle.

Eigenvector sign (and near-degenerate eigenvalue order) is solver-
dependent, so PCA is a rows-only operator; its contracts are pinned by
property tests instead (orthonormal components, projection variance ==
eigenvalues, reconstruction error bounded by the truncated spectrum —
`tests/test_scale_primitives.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_fit(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
):
    """Fit PCA on an ``array<float>`` column; returns
    ``(components: list[list[float]], eigenvalues: list[float],
    mean: list[float], total_var: float)`` with components as rows
    sorted by descending eigenvalue and ``total_var`` the full spectrum
    trace (for explained-variance shares). Driver memory: O(d²),
    independent of corpus size."""
    import numpy as np

    # persisted: the exploded frame feeds three jobs (count, Σx, and both
    # sides of the outer-product self-join) — without the cache the
    # posexplode scan runs four times
    x = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.col(vec_col)).alias("i", "v"),
        )
        .select("id", "i", F.col("v").cast("double").alias("v"))
        .persist()
    )
    try:
        # n MUST come from the exploded frame, not df.count(): rows with a
        # null/empty vector contribute nothing to the sums, and counting
        # them would silently shrink the mean and covariance. One 1-row
        # agg also guards ragged dimensions (min/max per-id length).
        shape = (
            x.groupBy("id")
            .agg(F.count("*").alias("c"))
            .agg(
                F.count("*").alias("n"),
                F.min("c").alias("dmin"),
                F.max("c").alias("dmax"),
            )
            .collect()[0]
        )
        n = shape.n or 0
        if n < 2:
            raise ValueError("pca_fit needs at least 2 non-empty vectors")
        if shape.dmin != shape.dmax:
            raise ValueError(
                f"pca_fit: ragged vector dimensions ({shape.dmin} != {shape.dmax})"
            )
        sums = (
            x.groupBy("i").agg(F.sum("v").alias("s")).orderBy("i").collect()
        )
        mean = np.array([r.s for r in sums]) / n
        d = len(mean)
        a, b = x.alias("a"), x.alias("b")
        prods = (
            a.join(
                b,
                (F.col("a.id") == F.col("b.id"))
                & (F.col("a.i") <= F.col("b.i")),
            )
            .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
            .agg(F.sum(F.col("a.v") * F.col("b.v")).alias("sxy"))
            .collect()
        )
    finally:
        x.unpersist()
    cov = np.zeros((d, d))
    for r in prods:
        c = r.sxy / n - mean[r.i] * mean[r.j]
        cov[r.i, r.j] = c
        cov[r.j, r.i] = c
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for idx in order:
        v = evecs[:, idx]
        # canonical sign (largest-|entry| positive): eigensolver sign is
        # otherwise arbitrary and would flip projections between runs
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append(list(map(float, v)))
    return (
        comps,
        [float(evals[idx]) for idx in order],
        list(map(float, mean)),
        float(evals.sum()),
    )


def _matrix_literal(rows: list[list[float]]) -> str:
    """One parsed SQL array-of-arrays literal (no per-element py4j)."""
    inner = ",".join(
        "array(" + ",".join(repr(v) for v in row) + ")" for row in rows
    )
    return f"array({inner})"


def pca_project(
    df: DataFrame,
    components: list[list[float]],
    mean: list[float],
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """Scan-side projection onto fitted components: adds ``proj``
    (array<double>, one entry per component). Pure codegen'd
    ``F.aggregate`` dot products over the centered vector — no UDF."""
    comp_lit = F.expr(_matrix_literal(components))
    mean_lit = F.expr(
        "array(" + ",".join(repr(v) for v in mean) + ")"
    )
    centered = F.zip_with(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        mean_lit,
        lambda x, m: x - m,
    )
    proj = F.transform(
        comp_lit,
        lambda c: F.aggregate(
            F.zip_with(centered, c, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
    )
    return df.withColumn("proj", proj)
