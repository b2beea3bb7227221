"""Scale-safe global idioms (house patterns).

Three operations are easy to write as unpartitioned windows — and every one
of those windows moves its entire input into ONE task at scale
(``WindowExec: No Partition Defined``). This module provides the plan shapes
that replace them; every query in the engine that needs a global rank,
scalar, or prefix sum routes through here so the anti-pattern cannot creep
back in (``tests/test_plans.py`` asserts the physical plans).

- ``global_topk``            — global top-N via ``orderBy().limit()``:
  Spark plans ``TakeOrderedAndProject`` (each task keeps its local top-N,
  driver merges N·tasks rows) instead of a single-partition sort.
- ``with_global_scalars``    — global aggregates (total, max, …) attached
  as a broadcast 1-row cross join, the scalar-subquery shape.
- ``with_global_prefix``     — exact running totals / row numbers over a
  global order WITHOUT a global sort: range-repartition on the sort key,
  window per partition, then shift each partition by the broadcast running
  offsets of the (num_partitions-row) per-partition subtotals. Output is
  bit-identical to the unpartitioned window; the widest shuffle is the
  range partitioning, and no task ever sees more than its own range.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = [
    "global_topk",
    "ntile_expr",
    "with_global_scalars",
    "with_global_prefix",
]

_PID = "__scalepat_pid"
_ORD = "__scalepat_ord"


def global_topk(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-``k`` rows of ``df`` under ``order`` as a
    ``TakeOrderedAndProject`` plan (never an unpartitioned ranking window).

    The result is at most ``k`` rows; deriving ``row_number`` over it
    afterwards is safe at any scale because the window input is bounded by
    ``k``, not by the data.
    """
    return df.orderBy(*order).limit(k)


def ntile_expr(rank: Column, n: Column, buckets: int) -> Column:
    """SQL ``NTILE(buckets)`` as a closed-form expression of the global
    1-based ``rank`` and the total row count ``n`` — the first ``n %
    buckets`` tiles get ``n div buckets + 1`` rows, the rest ``n div
    buckets``. Combined with ``with_global_prefix(row_number_col=...)``
    this reproduces an unpartitioned ``ntile`` window exactly, scan-side,
    with no global sort."""
    q = F.floor(n / buckets)
    rem = n % buckets
    cut = rem * (q + 1)
    return (
        F.when(rank <= cut, F.floor((rank - 1) / (q + 1)))
        .otherwise(rem + F.floor((rank - 1 - cut) / q))
        + 1
    ).cast("long")


def with_global_scalars(df: DataFrame, **aggs: Column) -> DataFrame:
    """Attach global aggregate scalars as new columns via a broadcast 1-row
    cross join: ``with_global_scalars(df, total=F.sum("x"))`` adds column
    ``total``. The aggregate is map-side partial + 1-row final; the join is
    a broadcast nested loop over one row — no unpartitioned window, no
    driver collect."""
    scalars = df.agg(*[c.alias(name) for name, c in aggs.items()])
    return df.crossJoin(F.broadcast(scalars))


def with_global_prefix(
    df: DataFrame,
    order: Sequence[Column],
    sums: dict[str, str] | None = None,
    row_number_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running sums and/or global row numbers over ``order``
    without a global sort.

    ``sums`` maps output column name → input column name; each output is
    the inclusive running SUM of the input under the global order.
    ``row_number_col`` names an output column carrying the global 1-based
    row number. ``order`` must be a total order (include a tiebreaker key)
    for the result to be deterministic.

    Plan: ``repartitionByRange(order)`` (ranges are globally ordered by
    construction) → per-partition window keyed on ``spark_partition_id()``
    → per-partition subtotals (one row per partition, bounded by the
    partition count, not the data) → running offsets over that tiny frame →
    broadcast-join the offsets back. Matches the unpartitioned-window
    result exactly; scales because no task holds more than its key range.
    """
    sums = sums or {}
    if not sums and row_number_col is None:
        return df
    # Cost note (measured r15): repartitionByRange executes its child TWICE
    # (range-boundary sampling pass + the shuffle itself). Callers with an
    # expensive input should persist it FIRST; callers must NOT stack
    # prefixes over unmaterialized pipelines (the old stacked RFM carried
    # 32 copies of its scan in the plan) — compute each prefix over the
    # same persisted narrow input and join back instead. An unconditional
    # persist here measured as a net LOSS for the common cheap-input case
    # (orders_pareto_curve 0.76 s -> 1.21 s), so the choice stays with the
    # caller.
    # Both downstream branches (the windowed rows and the per-partition
    # subtotals) hang off the SAME range exchange; Spark's exchange reuse
    # (default-on, AQE included) materializes the shuffle once, so both see
    # one consistent partition-id ↔ key-range assignment.
    rp = (
        df.repartitionByRange(num_partitions, *order)
        if num_partitions
        else df.repartitionByRange(*order)
    )
    part = rp.withColumn(_PID, F.spark_partition_id())
    local_w = W.partitionBy(_PID).orderBy(*order).rowsBetween(
        W.unboundedPreceding, 0
    )
    locald = part
    for out, src in sums.items():
        locald = locald.withColumn(out, F.sum(src).over(local_w))
    if row_number_col is not None:
        locald = locald.withColumn(
            row_number_col,
            F.row_number().over(W.partitionBy(_PID).orderBy(*order)).cast("long"),
        )
    # Per-partition totals: one row per range partition — size is the
    # partition count, never data-proportional. The running-offset window
    # over it is bounded the same way.
    agg_cols = [F.sum(src).alias(f"__t_{out}") for out, src in sums.items()]
    if row_number_col is not None:
        agg_cols.append(F.count(F.lit(1)).alias("__t_rn"))
    totals = part.groupBy(_PID).agg(*agg_cols)
    off_w = W.orderBy(_PID).rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        _PID,
        *[
            F.coalesce(F.sum(f"__t_{out}").over(off_w), F.lit(0)).alias(f"__o_{out}")
            for out in sums
        ],
        *(
            [F.coalesce(F.sum("__t_rn").over(off_w), F.lit(0)).alias("__o_rn")]
            if row_number_col is not None
            else []
        ),
    )
    out_df = locald.join(F.broadcast(offsets), _PID)
    for out in sums:
        out_df = out_df.withColumn(out, F.col(out) + F.col(f"__o_{out}")).drop(
            f"__o_{out}"
        )
    if row_number_col is not None:
        out_df = out_df.withColumn(
            row_number_col, (F.col(row_number_col) + F.col("__o_rn")).cast("long")
        ).drop("__o_rn")
    return out_df.drop(_PID)
