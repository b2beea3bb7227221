"""Batch-59 query (round 4): PCA embedding projection (rows-only).

``emb_pca_project`` — fit PCA on the embeddings corpus via the bounded
moment-collect recipe (:mod:`kenshin_backup_spark.operators.linalg`:
distributed Σx/Σxxᵀ accumulation → d + d(d+1)/2 scalars to the driver →
numpy eigensolve → components broadcast back as one SQL literal →
scan-side ``F.aggregate`` projections), then emit each vector's top-2
principal coordinates plus per-corpus explained-variance shares.

Rows-only by necessity: eigenvector sign/order near degenerate
eigenvalues is solver-dependent (sign is canonicalized, but float-sum
jitter across engines/runs still precludes a hash oracle). The
operator's algebraic contracts are pinned by
`tests/test_scale_primitives.py::test_pca_contracts` instead:
components orthonormal, projection variance == eigenvalues,
reconstruction error == truncated spectrum tail.

Scale notes (100 TB): the only corpus-sized shuffles are the d(d+1)/2-key
moment aggregation (map-side partial) and the final scan-side projection
(no shuffle at all); driver memory is O(d²) regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.operators.linalg import pca_fit, pca_project
from kenshin_backup_spark.sources import load_table


def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 principal coordinates per vector (see module docstring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    comps, evals, mean, total_var = pca_fit(emb, k=8)
    out = pca_project(emb, comps, mean)
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        "label",
        F.col("proj")[0].cast("double").alias("pc1"),
        F.col("proj")[1].cast("double").alias("pc2"),
        F.lit(float(evals[0] / total_var)).cast("double").alias("evr1"),
        F.lit(float(evals[1] / total_var)).cast("double").alias("evr2"),
    )


QUERIES = {
    "emb_pca_project": emb_pca_project,
}

ORACLE: dict[str, str] = {}
