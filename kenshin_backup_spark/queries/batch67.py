"""Batch-67 query (round 4): forecast backtesting.

``tsdb_forecast_backtest`` — the evaluation loop that belongs next to
any forecasting operator: per metric, fit the least-squares trend on
the FIRST 80% of hourly slots (time-ordered split — never a random
split for time series), predict the held-out 20%, and report test MAE
and mean signed bias. The fit uses the house linreg-from-exact-moments
recipe (integer Σx/Σy/Σxy/Σx², one closed-form double expression —
``tsdb_capacity_forecast_linreg``'s kernel); the holdout errors
quantize before averaging so the report is oracle-exact.

Scale notes (100 TB): the fact table collapses to the (metric, slot)
grain first; the split is a per-metric count threshold (window on the
metric key); moments and error sums are map-side-combinable aggregates
on the metric key. No global window, no UDF, no driver-side fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL, QAVG_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")

#: Quantization for the hourly means fed to the fit (matches the
#: capacity-forecast kernel) and for the holdout errors.
_Q = 1_000
TRAIN_FRAC = 0.8


def tsdb_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 time-ordered backtest of the linear trend (see docstring)."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    mean = (
        (F.sum(F.floor(F.col("value") * 1_000_000).cast("long")) / F.lit(1e6))
        / F.count("value")
    ).cast("double")
    hourly = (
        ev.select(
            F.col("event_type").alias("metric"),
            (es / 3600).cast("long").alias("slot"),
            "value",
        )
        .groupBy("metric", "slot")
        .agg(F.floor(mean * _Q).cast("long").alias("qy"))
    )
    w0 = W.partitionBy("metric")
    w_ord = W.partitionBy("metric").orderBy("slot")
    rel = (
        hourly.withColumn("x", F.col("slot") - F.min("slot").over(w0))
        .withColumn("rn", F.row_number().over(w_ord))
        .withColumn("n_all", F.count(F.lit(1)).over(w0))
        .withColumn(
            "is_train",
            F.col("rn") <= F.floor(F.col("n_all") * TRAIN_FRAC),
        )
    )
    fit = (
        rel.where("is_train")
        .groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("qy").alias("sy"),
            F.sum(F.col("x") * F.col("qy")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    den = n * F.col("sxx").cast("double") - sx * sx
    slope_q = (n * F.col("sxy").cast("double") - sx * sy) / den
    intercept_q = (sy - slope_q * sx) / n
    fitted = fit.select(
        "metric",
        F.col("n").cast("long").alias("n_train"),
        slope_q.alias("slope_q"),
        intercept_q.alias("intercept_q"),
    )
    test = rel.where(~F.col("is_train")).join(F.broadcast(fitted), "metric")
    # error in qy units, floor-quantized once more so Σ is an exact BIGINT
    err = F.col("qy").cast("double") - (
        F.col("intercept_q") + F.col("slope_q") * F.col("x").cast("double")
    )
    eq = F.floor(err).cast("long")
    aeq = F.floor(F.abs(err)).cast("long")
    return (
        test.groupBy("metric")
        .agg(
            F.max("n_train").cast("long").alias("n_train"),
            F.count(F.lit(1)).cast("long").alias("n_test"),
            (F.max("slope_q") / F.lit(float(_Q))).cast("double").alias(
                "slope_per_hour"
            ),
            (F.sum(aeq) / F.count(F.lit(1)) / F.lit(float(_Q)))
            .cast("double")
            .alias("mae"),
            (F.sum(eq) / F.count(F.lit(1)) / F.lit(float(_Q)))
            .cast("double")
            .alias("bias"),
        )
    )


_BACKTEST_SQL = f"""
WITH hourly AS (
  SELECT event_type AS metric, CAST({_ES} // 3600 AS BIGINT) AS slot,
         CAST(FLOOR({QAVG_SQL.format(x="value")} * {_Q}) AS BIGINT) AS qy
  FROM events GROUP BY 1, 2
),
rel AS (
  SELECT metric, qy,
         slot - MIN(slot) OVER (PARTITION BY metric) AS x,
         ROW_NUMBER() OVER (PARTITION BY metric ORDER BY slot) AS rn,
         COUNT(*) OVER (PARTITION BY metric) AS n_all
  FROM hourly
),
fit AS (
  SELECT metric, COUNT(*) AS n, SUM(x) AS sx, SUM(qy) AS sy,
         SUM(x * qy) AS sxy, SUM(x * x) AS sxx
  FROM rel WHERE rn <= FLOOR(n_all * {TRAIN_FRAC}) GROUP BY 1
),
fitted AS (
  SELECT metric, n AS n_train,
         (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS slope_q
  FROM fit
),
fitted2 AS (
  SELECT f.metric, f.n_train, f.slope_q,
         (CAST(t.sy AS DOUBLE) - f.slope_q * t.sx) / t.n AS intercept_q
  FROM fitted f JOIN fit t USING (metric)
),
test AS (
  SELECT r.metric, f.n_train, f.slope_q,
         CAST(r.qy AS DOUBLE) - (f.intercept_q + f.slope_q * r.x) AS err
  FROM rel r JOIN fitted2 f USING (metric)
  WHERE r.rn > FLOOR(r.n_all * {TRAIN_FRAC})
)
SELECT metric,
       CAST(MAX(n_train) AS BIGINT) AS n_train,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(MAX(slope_q) / {_Q}.0 AS DOUBLE) AS slope_per_hour,
       CAST(SUM(CAST(FLOOR(abs(err)) AS BIGINT)) / COUNT(*) / {_Q}.0
            AS DOUBLE) AS mae,
       CAST(SUM(CAST(FLOOR(err) AS BIGINT)) / COUNT(*) / {_Q}.0
            AS DOUBLE) AS bias
FROM test GROUP BY 1
"""


QUERIES = {
    "tsdb_forecast_backtest": tsdb_forecast_backtest,
}

ORACLE = {
    "tsdb_forecast_backtest": _BACKTEST_SQL,
}
