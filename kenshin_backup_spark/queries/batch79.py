"""Batch-79 query (round 10): the linearRegression source-window
refetch certified end-to-end.

``graphite_render_linreg_source`` drives the r10 Engine-rail refetch
(VERDICT r9 item 3): ``linearRegression(series, startSourceAt,
endSourceAt)`` fits ordinary least squares on a SEPARATELY-FETCHED
source window (days 1–14 of the events range) and projects the fitted
line over the render window (days 15–31). The render-window data is
real but never feeds the fit — an engine that wrongly fits on the
render fetch produces a different line and fails the hash match, so
the cert pins the ``refetch_fn`` path through ``Engine.render`` →
``render()``'s window-context threading → ``seriesfns
.linear_regression(source_df=...)``.

Determinism: store values are ``floor()``-ed (integer doubles) and the
hourly grid's centered x is an integer number of seconds, so all five
OLS sums are exact integers in double regardless of accumulation
order; every downstream op (n·Σxy − Σx·Σy, the division, the
projection) is a single IEEE expression mirrored operand-for-operand
in the DuckDB oracle.

Scale notes (100 TB): the fit is one per-series aggregate (5 sums)
over the source fetch, broadcast back onto the render frame — no
window function, no collect, no extra shuffle beyond the two archive
fetches (which prune to their date partitions). The source refetch is
a second bounded scan, not a widening of the render scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.api import Engine
from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.operators.policies import Policy
from kenshin_backup_spark.sources import load_table
from kenshin_backup_spark.sources.tables import staged_path

_ES = EPOCH_S_SQL.format(x="ts")
_METS = "{click,error,purchase,signup,view}"


def graphite_render_linreg_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """OLS fit on days 1–14, line projected over days 15–31 (see module
    docstring — the hash match fails on any fit-on-render fallback)."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.col("event_type").alias("metric"),
        "ts",
        F.floor("value").cast("double").alias("value"),
    )
    eng = Engine(
        spark,
        staged_path(sf_dir, "linreg_store", tables=("events",)),
        policies=[Policy(name="hourly", pattern=".*", steps=(3600,),
                         agg="max")],
    )
    # exact raw bounds from the store-build pass (observe) — kills the
    # second full raw scan the bounds agg used to run (r16, guide §1.1)
    lo_s, hi_s = eng.write(pts, observe_bounds=True)
    lo = lo_s - lo_s % 86400
    mid = lo + 14 * 86400
    out = eng.render(
        f"linearRegression({_METS}, {lo}, {mid})", mid, hi_s + 1
    )
    return out.select(
        "metric",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.col("value").cast("double").alias("value"),
    )


_LINREG_SQL = f"""
WITH bounds AS (
  SELECT (MIN({_ES}) - MIN({_ES}) % 86400) AS lo,
         ((MAX({_ES}) + 1) // 3600) * 3600 AS hi
  FROM events
),
win AS (SELECT lo, lo + 14 * 86400 AS mid, hi FROM bounds),
mets AS (
  SELECT UNNEST(['click','error','purchase','signup','view']) AS metric
),
hourly AS (
  SELECT event_type AS metric,
         CAST((({_ES}) // 3600) * 3600 AS BIGINT) AS h,
         CAST(MAX(FLOOR(value)) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
),
src AS (
  SELECT m.metric, CAST(g.h AS BIGINT) AS h, hr.v
  FROM (SELECT UNNEST(generate_series(lo, mid, 3600)) AS h FROM win) g
  CROSS JOIN mets m
  LEFT JOIN hourly hr ON hr.h = g.h AND hr.metric = m.metric
),
srcx AS (
  SELECT metric, h, v,
         CAST(h - MIN(h) OVER (PARTITION BY metric) AS DOUBLE) AS x,
         MIN(h) OVER (PARTITION BY metric) AS x0
  FROM src
),
fit AS (
  SELECT metric, MIN(x0) AS x0,
         CAST(COUNT(v) AS DOUBLE) AS n,
         SUM(CASE WHEN v IS NOT NULL THEN x END) AS sx,
         SUM(v) AS sy,
         SUM(CASE WHEN v IS NOT NULL THEN x * x END) AS sxx,
         SUM(x * v) AS sxy
  FROM srcx GROUP BY metric
),
coef AS (
  SELECT metric, x0,
         CASE WHEN n >= 2 AND (n * sxx - sx * sx) <> 0
              THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS m,
         CASE WHEN n >= 2 AND (n * sxx - sx * sx) <> 0
              THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                   / n END AS b
  FROM fit
),
ren AS (
  SELECT m.metric, CAST(g.h AS BIGINT) AS h
  FROM (SELECT UNNEST(generate_series(mid, hi, 3600)) AS h FROM win) g
  CROSS JOIN mets m
)
SELECT r.metric, r.h AS bucket_ts,
       CAST(c.b + c.m * CAST(r.h - c.x0 AS DOUBLE) AS DOUBLE) AS value
FROM ren r JOIN coef c ON r.metric = c.metric
ORDER BY 1, 2
"""


QUERIES = {
    "graphite_render_linreg_source": graphite_render_linreg_source,
}

ORACLE = {
    "graphite_render_linreg_source": _LINREG_SQL,
}


def graphite_render_timeshift_weekly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """r10 refetch-rail cert #2: ``timeShift(series, '7d')`` through
    ``Engine.render`` — the week-ago values re-FETCHED from the store
    and plotted at the render window's slots. The render window is the
    events range's last ~16 days; a frame-only shift (the pre-r10
    behavior) would push the fetched window's data out of range and
    emit gaps everywhere data should be, so the hash match certifies
    the shifted-window fetch + unshift + resetEnd clamp end-to-end.

    Determinism: hourly MAX of floored values — integers all the way;
    the shift is pure timestamp arithmetic. Scale: one extra pruned
    archive fetch (the shifted window); no new shuffle."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.col("event_type").alias("metric"),
        "ts",
        F.floor("value").cast("double").alias("value"),
    )
    eng = Engine(
        spark,
        staged_path(sf_dir, "tshift_store", tables=("events",)),
        policies=[Policy(name="hourly", pattern=".*", steps=(3600,),
                         agg="max")],
    )
    lo_s, hi_s = eng.write(pts, observe_bounds=True)
    lo = lo_s - lo_s % 86400
    mid = lo + 14 * 86400
    out = eng.render(f"timeShift({_METS}, '7d')", mid, hi_s + 1)
    return out.select(
        "metric",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.col("value").cast("double").alias("value"),
    )


_TSHIFT_SQL = f"""
WITH bounds AS (
  SELECT (MIN({_ES}) - MIN({_ES}) % 86400) AS lo,
         ((MAX({_ES}) + 1) // 3600) * 3600 AS hi
  FROM events
),
win AS (SELECT lo, lo + 14 * 86400 AS mid, hi FROM bounds),
mets AS (
  SELECT UNNEST(['click','error','purchase','signup','view']) AS metric
),
hourly AS (
  SELECT event_type AS metric,
         CAST((({_ES}) // 3600) * 3600 AS BIGINT) AS h,
         CAST(MAX(FLOOR(value)) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
)
SELECT m.metric, CAST(g.h AS BIGINT) AS bucket_ts, hr.v AS value
FROM (SELECT UNNEST(generate_series(mid, hi, 3600)) AS h FROM win) g
CROSS JOIN mets m
LEFT JOIN hourly hr
  ON hr.h = g.h - 7 * 86400 AND hr.metric = m.metric
ORDER BY 1, 2
"""

QUERIES["graphite_render_timeshift_weekly"] = graphite_render_timeshift_weekly
ORACLE["graphite_render_timeshift_weekly"] = _TSHIFT_SQL
