"""Graphite-web series functions (the reference's consumer surface).

The reference itself exposes only ``fetch`` (SURVEY §1.1); every render-API
computation users actually run — scale, movingAverage, summarize,
highestCurrent, timeShift, … — lives in graphite-web on top of fetched
series. A user switching from the reference needs those, so this module
re-expresses the common catalog as composable DataFrame transforms over
the engine's canonical series frame:

    series(metric: string, bucket_ts: long, value: double)

(the shape produced by ``rollup.finalize(..., agg=...)`` + ``fetch``).

All transforms are native column expressions / window functions — they
compose lazily into ONE Catalyst plan, so chaining ``scale(derivative(x))``
costs no extra passes. Per-metric windows shuffle once on ``metric`` and
every subsequent window reuses the partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import QUANT


def _w(order_desc: bool = False) -> W:
    order = F.desc("bucket_ts") if order_desc else F.asc("bucket_ts")
    return W.partitionBy("metric").orderBy(order)


def alias_series(df: DataFrame, name: str) -> DataFrame:
    """graphite ``alias()``: rename the series."""
    return df.withColumn("metric", F.lit(name))


def scale(df: DataFrame, factor: float) -> DataFrame:
    """graphite ``scale()``."""
    return df.withColumn("value", (F.col("value") * factor).cast("double"))


def offset(df: DataFrame, amount: float) -> DataFrame:
    """graphite ``offset()``."""
    return df.withColumn("value", (F.col("value") + amount).cast("double"))


def absolute(df: DataFrame) -> DataFrame:
    """graphite ``absolute()``."""
    return df.withColumn("value", F.abs("value").cast("double"))


def time_shift(df: DataFrame, shift_seconds: int) -> DataFrame:
    """graphite ``timeShift()``: move the series along the time axis
    (negative = into the past, for period-over-period comparison)."""
    return df.withColumn(
        "bucket_ts", (F.col("bucket_ts") + shift_seconds).cast("long")
    )


def keep_last_value(df: DataFrame, limit: int | None = None) -> DataFrame:
    """graphite ``keepLastValue()``: forward-fill gaps with the last seen
    value (optionally only across ≤ limit consecutive gap slots)."""
    w = _w().rowsBetween(W.unboundedPreceding, 0)
    filled = F.last("value", ignorenulls=True).over(w)
    if limit is None:
        return df.withColumn("value", filled)
    # distance to the last non-gap slot
    marker = F.when(F.col("value").isNotNull(), F.col("bucket_ts"))
    last_seen = F.last(marker, ignorenulls=True).over(w)
    step = F.col("bucket_ts") - F.lag("bucket_ts").over(_w())
    # slots are uniform per series; estimate step as the min positive diff
    step_est = F.min(step).over(W.partitionBy("metric"))
    gap_slots = ((F.col("bucket_ts") - last_seen) / step_est).cast("long")
    return df.withColumn(
        "value", F.when(gap_slots <= limit, filled).otherwise(F.col("value"))
    )


def derivative(df: DataFrame) -> DataFrame:
    """graphite ``derivative()``: per-slot difference."""
    return df.withColumn(
        "value", (F.col("value") - F.lag("value").over(_w())).cast("double")
    )


def non_negative_derivative(df: DataFrame) -> DataFrame:
    """graphite ``nonNegativeDerivative()``: drop negative diffs (counter
    wraps read as gaps)."""
    d = F.col("value") - F.lag("value").over(_w())
    return df.withColumn("value", F.when(d >= 0, d).cast("double"))


def per_second(df: DataFrame) -> DataFrame:
    """graphite ``perSecond()``: rate of a counter."""
    dv = F.col("value") - F.lag("value").over(_w())
    dt = F.col("bucket_ts") - F.lag("bucket_ts").over(_w())
    return df.withColumn(
        "value", F.when((dv >= 0) & (dt > 0), dv / dt).cast("double")
    )


def integral(df: DataFrame) -> DataFrame:
    """graphite ``integral()``: running total (quantized-exact)."""
    q = F.floor(F.col("value") * QUANT).cast("long")
    w = _w().rowsBetween(W.unboundedPreceding, 0)
    return df.withColumn(
        "value", (F.sum(q).over(w) / F.lit(float(QUANT))).cast("double")
    )


def moving_average(df: DataFrame, window_points: int) -> DataFrame:
    """graphite ``movingAverage(n)`` (quantized-exact)."""
    q = F.floor(F.col("value") * QUANT).cast("long")
    w = _w().rowsBetween(-(window_points - 1), 0)
    return df.withColumn(
        "value",
        (F.sum(q).over(w) / (F.lit(float(QUANT)) * F.count(q).over(w))).cast("double"),
    )


def summarize(df: DataFrame, interval_seconds: int, func: str = "sum") -> DataFrame:
    """graphite ``summarize()``: re-bucket into a coarser interval with
    sum/max/min/last/count. (``avg`` requires partial state — use the
    rollup cascade for averages; graphite-web has the same avg-of-avg trap.)
    """
    bucket = (F.col("bucket_ts") - (F.col("bucket_ts") % interval_seconds)).cast("long")
    q = F.floor(F.col("value") * QUANT).cast("long")
    aggs = {
        "sum": (F.sum(q) / F.lit(float(QUANT))).cast("double"),
        "max": F.max("value"),
        "min": F.min("value"),
        "count": F.count("value").cast("double"),
        "last": F.max(
            F.when(
                F.col("value").isNotNull(),
                F.struct(F.col("bucket_ts").alias("t"), F.col("value").alias("v")),
            )
        )["v"],
    }
    if func not in aggs:
        raise ValueError(f"summarize func must be one of {sorted(aggs)}")
    return (
        df.groupBy("metric", bucket.alias("bucket_ts"))
        .agg(aggs[func].alias("value"))
    )


def current_value(df: DataFrame) -> DataFrame:
    """Per-series latest non-gap value (helper for highestCurrent etc.)."""
    cur = F.max(
        F.when(
            F.col("value").isNotNull(),
            F.struct(F.col("bucket_ts").alias("t"), F.col("value").alias("v")),
        )
    )
    return df.groupBy("metric").agg(cur["v"].alias("current"))


def highest_current(df: DataFrame, n: int) -> DataFrame:
    """graphite ``highestCurrent(n)``: keep the n series with the largest
    latest value (ties → metric name asc). Returns the filtered series."""
    cur = current_value(df)
    w = W.orderBy(F.desc("current"), F.asc("metric"))
    top = cur.withColumn("__rk", F.row_number().over(w)).where(F.col("__rk") <= n)
    return df.join(F.broadcast(top.select("metric")), "metric")


def sort_by_maxima(df: DataFrame) -> DataFrame:
    """graphite ``sortByMaxima()``: rank series by their max value."""
    mx = df.groupBy("metric").agg(F.max("value").alias("series_max"))
    w = W.orderBy(F.desc("series_max"), F.asc("metric"))
    return mx.withColumn("rank", F.row_number().over(w).cast("long"))


def as_percent(df: DataFrame) -> DataFrame:
    """graphite ``asPercent()``: each series' value as a share of the
    all-series total in the same bucket. The per-bucket total is computed
    on quantized BIGINTs (associative → partial aggregation safe) and the
    share is one double division — oracle-exact.

    Scale note: the total is a window over (bucket_ts), which shuffles by
    bucket — the same key the rollup that produced the frame already
    grouped on, so the exchange is reusable; no per-metric skew (every
    bucket has ≤ |metrics| rows).
    """
    q = F.floor(F.col("value") * 1_000_000).cast("long")
    w = W.partitionBy("bucket_ts")
    out = df.withColumn("__q", q).withColumn(
        "pct",
        F.when(
            F.sum("__q").over(w) != 0,
            (F.col("__q").cast("double") / F.sum("__q").over(w).cast("double")) * 100.0,
        ),
    )
    return out.drop("__q")
