"""Batch-72 queries (round 8): the wave-4 render tier, driver-certified.

Three oracle-backed certs drive the round-8 render-catalog additions
through the full consumer stack (Engine store build → target parse →
seriesfns evaluation):

``graphite_render_generic`` — the GENERIC function family::

    highest(summarize({click,view,purchase,signup,error}, '1d', 'avg'), 2, 'max')
    aggregate(summarize({...}, '1d', 'avg'), 'median')

i.e. generic top-k by an arbitrary per-series key (here max) and the
generic cross-series combine with the 'median' kernel (graphite's
safeMedian — mean of two middles for even counts, NOT the NIST
percentile rank).

``graphite_render_mapreduce`` — the map/reduce-over-name-nodes tier
over a two-family metric tree (``app.<type>.used`` = event value,
``app.<type>.total`` = 2× value, exact in float)::

    reduceSeries(mapSeries(app.*.*, 1), 'asPercent', 2, 'used', 'total')
    applyByNode(app.*.used, 1, 'sumSeries(%.*)', '%.sum')

``graphite_render_timegen`` — the generator functions and positional
list pairing::

    sumSeriesLists({click}, time('t', 3600))

time() synthesizes the request grid (value == timestamp) from the
from/until window Engine.render now threads through; sumSeriesLists
pairs the two single-series lists by name rank and safeSums per bucket.

Each DuckDB oracle replicates the evaluator stage by stage with the
house quantization discipline (hourly QAVG store reads, per-stage
requantization); hash matches certify kernels, grids and names at once.

Scale notes: one Catalyst plan per target over the hourly store; the
generic median/percentile collects are bounded by the glob's series
count per bucket (5 / 2 here); applyByNode's prefix collect is bounded
by the glob's series count (5) — documented bounded-collect contracts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.api import Engine
from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL, QAVG_SQL
from kenshin_backup_spark.operators.policies import Policy
from kenshin_backup_spark.sources import load_table
from kenshin_backup_spark.sources.tables import staged_path

_ES = EPOCH_S_SQL.format(x="ts")
_Q = "CAST(FLOOR(({x}) * 1000000) AS BIGINT)"
_TYPES = ("click", "error", "purchase", "signup", "view")


def _hourly_engine(spark, sf_dir, name, pts):
    """Build the hourly store and return ``(eng, (lo, hi))`` — the exact
    raw epoch bounds captured on the store-build pass itself (observe),
    so no caller pays a second full scan of the input for two scalars
    (r16, guide §1.1)."""
    eng = Engine(
        spark,
        staged_path(sf_dir, name, tables=("events",)),
        policies=[Policy(name="hourly", pattern=".*", steps=(3600,))],
    )
    bounds = eng.write(pts, observe_bounds=True)
    return eng, bounds


_T_HIGHEST = (
    "highest(summarize({click,view,purchase,signup,error}, '1d', 'avg'), "
    "2, 'max')"
)
_T_MEDIAN = (
    "aggregate(summarize({click,view,purchase,signup,error}, '1d', 'avg'), "
    "'median')"
)


def graphite_render_generic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic family cert: highest(n, 'max') + aggregate('median') over
    the daily-average panel (see module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(F.col("event_type").alias("metric"), "ts", "value")
    eng, (lo_s, hi_s) = _hourly_engine(spark, sf_dir, "generic_store", pts)
    lo = lo_s - lo_s % 86400
    # both targets fetch the same glob: share one leaf fetch/persist
    # across the two renders (request-scoped memo, r16)
    memo: dict = {}
    out = eng.render(_T_HIGHEST, lo, hi_s + 1, memo=memo).unionByName(
        eng.render(_T_MEDIAN, lo, hi_s + 1, memo=memo)
    )
    return out.select(
        "metric",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.col("value").cast("double").alias("value"),
    )


_GENERIC_SQL = f"""
WITH bounds AS (
  SELECT (MIN({_ES}) - MIN({_ES}) % 86400) AS lo,
         ((MAX({_ES}) + 1) // 3600) * 3600 AS hi
  FROM events
),
grid AS (
  SELECT UNNEST(generate_series(lo, hi, 3600)) AS h FROM bounds
),
dgrid AS (
  SELECT DISTINCT CAST((h // 86400) * 86400 AS BIGINT) AS d FROM grid
),
hourly AS (
  SELECT event_type AS metric, CAST(({_ES} // 3600) * 3600 AS BIGINT) AS h,
         {QAVG_SQL.format(x="value")} AS avg_v
  FROM events GROUP BY 1, 2
),
hq AS (SELECT metric, h, {_Q.format(x="avg_v")} AS q FROM hourly),
mets AS (SELECT UNNEST(['click','error','purchase','signup','view']) AS metric),
daily AS (
  SELECT m.metric, g.d,
         CAST(SUM(c.q) / 1000000 / COUNT(c.q) AS DOUBLE) AS v
  FROM dgrid g
  CROSS JOIN mets m
  LEFT JOIN hq c ON CAST((c.h // 86400) * 86400 AS BIGINT) = g.d
                AND c.metric = m.metric
  GROUP BY 1, 2
),
-- highest(2, 'max'): per-series max key, top 2, ties metric asc
keys AS (
  SELECT metric, MAX(v) AS k FROM daily GROUP BY 1
),
top2 AS (
  SELECT metric FROM keys ORDER BY k DESC, metric ASC LIMIT 2
),
t1 AS (
  SELECT d2.metric, d2.d AS bucket_ts, d2.v AS value
  FROM daily d2 JOIN top2 USING (metric)
),
-- aggregate('median'): graphite safeMedian across series per day
med AS (
  SELECT d, list_sort(list_filter(list(v), x -> x IS NOT NULL)) AS arr
  FROM daily GROUP BY d
),
t2 AS (
  SELECT 'medianSeries' AS metric, d AS bucket_ts,
         CAST(CASE WHEN len(arr) = 0 THEN NULL
              WHEN len(arr) % 2 = 1 THEN arr[(len(arr) + 1) // 2]
              ELSE (arr[len(arr) // 2] + arr[len(arr) // 2 + 1]) / 2
         END AS DOUBLE) AS value
  FROM med
)
SELECT metric, CAST(bucket_ts AS BIGINT) AS bucket_ts, value FROM t1
UNION ALL
SELECT metric, CAST(bucket_ts AS BIGINT) AS bucket_ts, value FROM t2
"""


_T_REDUCE = (
    "reduceSeries(mapSeries(app.*.*, 1), 'asPercent', 2, 'used', 'total')"
)
_T_APPLY = "applyByNode(app.*.used, 1, 'sumSeries(%.*)', '%.sum')"


def graphite_render_mapreduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map/reduce tier cert over the app.<type>.{used,total} tree (see
    module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    used = ev.select(
        F.concat(F.lit("app."), F.col("event_type"), F.lit(".used"))
        .alias("metric"),
        "ts",
        "value",
    )
    total = ev.select(
        F.concat(F.lit("app."), F.col("event_type"), F.lit(".total"))
        .alias("metric"),
        "ts",
        (F.col("value") * F.lit(2.0)).alias("value"),
    )
    # both union branches carry ev's ts verbatim, so the written points'
    # observed min/max equals the old bounds agg over ev exactly
    eng, (lo_s, hi_s) = _hourly_engine(
        spark, sf_dir, "mapreduce_store", used.unionByName(total)
    )
    lo = lo_s - lo_s % 86400
    # one request-scoped memo across both targets (overlapping app.* leaves)
    memo: dict = {}
    out = eng.render(_T_REDUCE, lo, hi_s + 1, memo=memo).unionByName(
        eng.render(_T_APPLY, lo, hi_s + 1, memo=memo)
    )
    return out.select(
        "metric",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.col("value").cast("double").alias("value"),
    )


_MAPREDUCE_SQL = f"""
WITH bounds AS (
  SELECT (MIN({_ES}) - MIN({_ES}) % 86400) AS lo,
         ((MAX({_ES}) + 1) // 3600) * 3600 AS hi
  FROM events
),
grid AS (
  SELECT UNNEST(generate_series(lo, hi, 3600)) AS h FROM bounds
),
-- the store holds hourly QAVG of used (= value) and total (= 2*value)
hourly AS (
  SELECT event_type AS et, CAST(({_ES} // 3600) * 3600 AS BIGINT) AS h,
         {QAVG_SQL.format(x="value")} AS used_v,
         {QAVG_SQL.format(x="value * 2.0")} AS total_v
  FROM events GROUP BY 1, 2
),
mets AS (SELECT UNNEST(['click','error','purchase','signup','view']) AS et),
ongrid AS (
  SELECT m.et, g.h, c.used_v, c.total_v
  FROM grid g CROSS JOIN mets m
  LEFT JOIN hourly c ON c.h = g.h AND c.et = m.et
),
-- reduceSeries 'asPercent': used/total*100 on buckets where BOTH exist
t1 AS (
  SELECT 'app.' || et AS metric, h AS bucket_ts,
         CAST(CASE WHEN total_v != 0 THEN used_v / total_v * 100.0 END
              AS DOUBLE) AS value
  FROM ongrid
),
-- applyByNode 'sumSeries(%.*)': per prefix, quantized sum of the two
-- member series' fetched hourly values (requantized per _combine)
t2 AS (
  SELECT 'app.' || et || '.sum' AS metric, h AS bucket_ts,
         CAST(
           (COALESCE({_Q.format(x="used_v")}, 0)
            + COALESCE({_Q.format(x="total_v")}, 0)) / 1000000.0
         AS DOUBLE) AS value
  FROM ongrid
  WHERE used_v IS NOT NULL OR total_v IS NOT NULL
),
t2g AS (
  -- gap slots (both members NULL) stay NULL rows on the grid
  SELECT 'app.' || et || '.sum' AS metric, h AS bucket_ts,
         CAST(NULL AS DOUBLE) AS value
  FROM ongrid WHERE used_v IS NULL AND total_v IS NULL
)
SELECT metric, CAST(bucket_ts AS BIGINT) AS bucket_ts, value FROM t1
UNION ALL
SELECT metric, CAST(bucket_ts AS BIGINT) AS bucket_ts, value FROM t2
UNION ALL
SELECT metric, CAST(bucket_ts AS BIGINT) AS bucket_ts, value FROM t2g
"""


_T_TIMEGEN = "sumSeriesLists({click}, time('t', 3600))"


def graphite_render_timegen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator cert: time() synthesizes the request grid and
    sumSeriesLists pairs it with the fetched click series (see module
    docstring)."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(F.col("event_type").alias("metric"), "ts", "value")
    eng, (lo_s, hi_s) = _hourly_engine(spark, sf_dir, "timegen_store", pts)
    lo = lo_s - lo_s % 86400
    out = eng.render(_T_TIMEGEN, lo, hi_s + 1)
    return out.select(
        "metric",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.col("value").cast("double").alias("value"),
    )


_TIMEGEN_SQL = f"""
WITH bounds AS (
  SELECT (MIN({_ES}) - MIN({_ES}) % 86400) AS lo,
         ((MAX({_ES}) + 1) // 3600) * 3600 AS hi,
         MAX({_ES}) + 1 AS until_excl
  FROM events
),
-- the fetch grid is [lo, hi]; time('t', 3600) generates [lo, until)
-- exclusive — the inner (rank, bucket) pairing keeps the intersection
tgrid AS (
  SELECT h FROM (
    SELECT UNNEST(generate_series(lo, hi, 3600)) AS h, until_excl
    FROM bounds
  ) WHERE h < until_excl
),
hourly AS (
  SELECT CAST(({_ES} // 3600) * 3600 AS BIGINT) AS h,
         {QAVG_SQL.format(x="value")} AS v
  FROM events WHERE event_type = 'click' GROUP BY 1
)
SELECT 'sumSeries(click,t)' AS metric, CAST(g.h AS BIGINT) AS bucket_ts,
       CAST(COALESCE(c.v, 0) + g.h AS DOUBLE) AS value
FROM tgrid g LEFT JOIN hourly c ON c.h = g.h
"""


QUERIES = {
    "graphite_render_generic": graphite_render_generic,
    "graphite_render_mapreduce": graphite_render_mapreduce,
    "graphite_render_timegen": graphite_render_timegen,
}

ORACLE = {
    "graphite_render_generic": _GENERIC_SQL,
    "graphite_render_mapreduce": _MAPREDUCE_SQL,
    "graphite_render_timegen": _TIMEGEN_SQL,
}
