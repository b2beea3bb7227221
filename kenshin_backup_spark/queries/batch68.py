"""Batch-68 query (round 4): intrinsic dimension of the embedding space.

``emb_intrinsic_dimension`` — the TwoNN estimator (Facco et al.,
Scientific Reports 2017): for each sampled point, the ratio
``mu = r2/r1`` of its two nearest-neighbor distances follows a Pareto
law whose exponent IS the manifold's intrinsic dimension; the MLE is
``d = n / sum(ln mu)``. Collapsed or low-rank embedding spaces (a
failing encoder, over-aggressive quantization) show up as an intrinsic
dimension far below the ambient one — the diagnostic this query
reports.

Plan shape: a bounded sample of query points (deterministic
``vec_id % SAMPLE_MOD``) broadcasts against one corpus scan; exact
top-2 Euclidean neighbors per sampled point via the per-query rank
window (WindowGroupLimit prunes map-side); one tiny aggregate computes
the MLE. Rows-only: ``ln`` is transcendental (JVM vs libm last-ulp
drift breaks hash oracles) — the estimator is pinned instead by
``tests/test_properties.py::test_twonn_recovers_planted_dimension``
(recovers a planted 3-dimensional subspace in 8-D ambient space, and
the ambient dimension on full-rank data).

Scale notes (100 TB): sample size is fixed, so the candidate volume is
O(sample x corpus) scan-side work with no shuffle of the corpus; for
corpus-scale all-point estimates the same ratio statistic runs over the
SRP-ANN top-2 instead (operators/similarity.srp_topk) — identical
downstream arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kenshin_backup_spark.sources import load_table

SAMPLE_MOD = 5  # every 5th vector → bounded, deterministic sample


def twonn_intrinsic_dimension(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int = SAMPLE_MOD,
) -> DataFrame:
    """One-row frame: (n_sampled, sum_log_mu, intrinsic_dim). Euclidean
    two-NN ratios over a deterministic sample (see module docstring)."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    q = base.where(F.col("id") % sample_mod == 0).select(
        F.col("id").alias("qid"), F.col("v").alias("qv")
    )
    pairs = base.crossJoin(F.broadcast(q)).where(F.col("id") != F.col("qid"))
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("qv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    w = Window.partitionBy("qid").orderBy(F.asc("d2"), F.asc("id"))
    top2 = (
        pairs.select("qid", "id", d2.alias("d2"))
        .where(F.col("d2") > 0)  # exclude exact duplicates of the query
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
    )
    ratio = (
        top2.groupBy("qid")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("d2"))).alias("r1sq"),
            F.min(F.when(F.col("rn") == 2, F.col("d2"))).alias("r2sq"),
        )
        .where(F.col("r2sq").isNotNull() & (F.col("r1sq") > 0))
        # mu = r2/r1 => ln mu = 0.5 * ln(r2^2 / r1^2)
        .select((F.log(F.col("r2sq") / F.col("r1sq")) * 0.5).alias("logmu"))
    )
    return ratio.agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.sum("logmu").cast("double").alias("sum_log_mu"),
        (F.count(F.lit(1)) / F.sum("logmu")).cast("double").alias(
            "intrinsic_dim"
        ),
    )


def emb_intrinsic_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TwoNN intrinsic-dimension diagnostic over the embeddings table."""
    emb = load_table(spark, sf_dir, "embeddings")
    return twonn_intrinsic_dimension(emb)


QUERIES = {
    "emb_intrinsic_dimension": emb_intrinsic_dimension,
}

ORACLE: dict[str, str] = {}
