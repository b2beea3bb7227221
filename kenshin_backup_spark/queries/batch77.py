"""Batch-77 query (round 8): graphite ``maxDataPoints`` consolidation,
driver-certified end-to-end.

``graphite_render_maxdatapoints`` drives the pixel-budget consolidation
every Grafana panel requests (``render(..., max_data_points=N)``)
through the full consumer stack: Engine store build → target parse →
fetch grid → ``seriesfns.consolidate_points``. Two targets over an
hourly MAX store of floored (integer-valued) event points::

    {click,error,purchase,signup,view}                    # default avg
    consolidateBy({click,...},"max")                      # max kernel

with ``max_data_points=48`` over the month-long events fixture
(~720-hour grid → valuesPerPoint ≈ 15 at both certified SFs, so the
consolidation path is ACTIVE, not a passthrough).

The store keeps values integer-valued (MAX of FLOOR(value)) so the
band averages are exact in IEEE double regardless of aggregation order
— the oracle's AVG sums the same integers. The DuckDB oracle mirrors
the evaluator stage by stage: the fetch grid (day-aligned lo,
inclusive hourly series — same arithmetic the batch72 certs proved),
then the transcribed band nudge ``nstart = lo + spp + lo%step -
lo%spp`` and the band group-bys. Hash equality certifies the nudge
arithmetic, the kernel dispatch (legend-wrap parse), gap handling
(all-gap bands stay gaps) and the band timestamps at once.

Scale notes (100 TB): consolidate_points adds ONE shuffle — the
per-series (n, start, end) windows hash-partition on ``metric`` and
the band group-by reuses that clustering (plan-checked: a single
Exchange). Band state is O(1) per group; nothing collects to the
driver. See ``seriesfns.consolidate_points`` for the two documented
deviations from graphite-web's literal code (all pre-band points
dropped vs the del-loop off-by-one; no dangling trailing gap point).
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
_MDP = 48
_TYPES = "{click,error,purchase,signup,view}"
_T_AVG = _TYPES
_T_MAX = f'consolidateBy({_TYPES},"max")'


def graphite_render_maxdatapoints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pixel-budget consolidation cert: default-average and
    consolidateBy-max kernels under ``max_data_points=48`` (see module
    docstring)."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.col("event_type").alias("metric"),
        "ts",
        F.floor("value").cast("double").alias("value"),
    )
    eng = Engine(
        spark,
        staged_path(sf_dir, "mdp_store", tables=("events",)),
        policies=[Policy(name="hourly", pattern=".*", steps=(3600,),
                         agg="max")],
    )
    # exact raw bounds from the store-build pass (observe) — kills the
    # second full raw scan the bounds agg used to run (r16, guide §1.1)
    lo_s, hi_s = eng.write(pts, observe_bounds=True)
    lo = lo_s - lo_s % 86400
    # both targets fetch the same glob: share one leaf fetch/persist
    # across the two renders (request-scoped memo, r16)
    memo: dict = {}
    out = eng.render(
        _T_AVG, lo, hi_s + 1, max_data_points=_MDP, memo=memo
    ).unionByName(
        eng.render(_T_MAX, lo, hi_s + 1, max_data_points=_MDP, memo=memo)
    )
    return out.select(
        "metric",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.col("value").cast("double").alias("value"),
    )


_MDP_SQL = f"""
WITH bounds AS (
  SELECT (MIN({_ES}) - MIN({_ES}) % 86400) AS lo,
         ((MAX({_ES}) + 1) // 3600) * 3600 AS hi
  FROM events
),
grid AS (
  SELECT UNNEST(generate_series(lo, hi, 3600)) AS h FROM bounds
),
mets AS (
  SELECT UNNEST(['click','error','purchase','signup','view']) AS metric
),
hourly AS (
  SELECT event_type AS metric,
         CAST((({_ES}) // 3600) * 3600 AS BIGINT) AS h,
         CAST(MAX(FLOOR(value)) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT m.metric, CAST(g.h AS BIGINT) AS h, hr.v
  FROM grid g
  CROSS JOIN mets m
  LEFT JOIN hourly hr ON hr.h = g.h AND hr.metric = m.metric
),
consts AS (
  SELECT lo,
         CAST(CEIL(CAST((hi - lo) // 3600 + 1 AS DOUBLE) / {_MDP})
              AS BIGINT) * 3600 AS spp
  FROM bounds
),
consts2 AS (
  SELECT spp, lo + spp + lo % 3600 - lo % spp AS nstart FROM consts
),
banded AS (
  SELECT s.metric,
         c.nstart + ((s.h - c.nstart) // c.spp) * c.spp AS band,
         s.v
  FROM series s CROSS JOIN consts2 c
  WHERE s.h >= c.nstart
)
SELECT metric, CAST(band AS BIGINT) AS bucket_ts,
       CAST(AVG(v) AS DOUBLE) AS value
FROM banded GROUP BY 1, 2
UNION ALL
SELECT 'consolidateBy(' || metric || ',"max")' AS metric,
       CAST(band AS BIGINT) AS bucket_ts,
       CAST(MAX(v) AS DOUBLE) AS value
FROM banded GROUP BY 1, 2
"""


QUERIES = {
    "graphite_render_maxdatapoints": graphite_render_maxdatapoints,
}

ORACLE = {
    "graphite_render_maxdatapoints": _MDP_SQL,
}
