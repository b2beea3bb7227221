"""Storage-schema policy assignment (SURVEY.md §3.3).

Reference: ``storage-schemas.conf`` is an *ordered* list of sections
``[name] pattern=<regex> retentions=<archives>``; the first regex that
matches a new metric's name assigns its retention ladder, aggregation
kernel, and xFilesFactor (``rurouni/storage.py loadStorageSchemas``,
public-repo path; SURVEY §2.2 P2).

Spark mapping: policy assignment is a deterministic expression evaluated at
ingest — a ``coalesce(when-chain)`` over the ordered patterns. The policy
list is driver-side config (tens of entries), so a when-chain is strictly
better than a join: it inlines into whole-stage codegen with zero shuffle
and zero broadcast. (A broadcast join variant is provided for very large
policy lists.)

Scale notes (100 TB): the when-chain evaluates per input row inside the scan
stage; regex matching is the only cost. On a real deployment the assignment
is computed once per *new* metric (a tiny distinct set), then the
metric→policy mapping is itself a broadcast dimension.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Policy:
    """One storage-schema section (ordered; first match wins)."""

    name: str
    pattern: str  # regex over the metric name (un-anchored, like carbon)
    steps: tuple[int, ...] = (60, 600, 3600)  # retention ladder, finest first
    agg: str = "average"
    xff: float = 0.0


DEFAULT_POLICY = Policy(name="default", pattern=".*")


def assign_policy(
    df: DataFrame,
    policies: list[Policy],
    *,
    metric_col: str = "metric",
    out_col: str = "policy",
) -> DataFrame:
    """Add ``out_col`` = name of the first policy whose pattern matches.

    First-match-wins over the *ordered* list — encoded as a cascaded
    ``when`` chain, which Catalyst evaluates top-down exactly like the
    reference's ordered regex scan.
    """
    acc = None
    for p in policies:
        cond = F.col(metric_col).rlike(p.pattern)
        acc = F.when(cond, F.lit(p.name)) if acc is None else acc.when(cond, F.lit(p.name))
    expr = acc.otherwise(F.lit(DEFAULT_POLICY.name)) if acc is not None else F.lit(DEFAULT_POLICY.name)
    return df.withColumn(out_col, expr)


def policies_dim(spark, policies: list[Policy]) -> DataFrame:
    """Policies as a broadcastable dimension table (priority = list order),
    for deployments where the list is too large for a when-chain. Join
    pattern: rlike non-equi → min(priority) per metric."""
    rows = [
        (i, p.name, p.pattern, list(p.steps), p.agg, float(p.xff))
        for i, p in enumerate(policies)
    ]
    return spark.createDataFrame(
        rows, "priority int, name string, pattern string, steps array<int>, agg string, xff double"
    )


def assign_policy_via_join(
    df: DataFrame, dim: DataFrame, *, metric_col: str = "metric", out_col: str = "policy"
) -> DataFrame:
    """Join-based first-match assignment: broadcast NLJ on ``regexp_like``
    then keep the minimum-priority match per row (ties impossible: priority
    is unique). Falls back to 'default' when nothing matches. A synthetic
    row id keeps duplicate input rows distinct through the group-by."""
    with_id = df.withColumn("__rid", F.monotonically_increasing_id())
    matched = with_id.join(
        F.broadcast(dim),
        F.regexp_like(F.col(metric_col), dim["pattern"]),
        "left",
    )
    best = F.min(F.struct(dim["priority"], dim["name"].alias("_pname")))
    keys = [F.col(c) for c in with_id.columns]
    return (
        matched.groupBy(*keys)
        .agg(best.alias("_best"))
        .withColumn(out_col, F.coalesce(F.col("_best._pname"), F.lit(DEFAULT_POLICY.name)))
        .drop("_best", "__rid")
    )
