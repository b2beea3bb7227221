"""Batch-83 query (round 12): the group()/unique() CONCATENATION order
certified end-to-end — the ADVICE-r11 fix over the r11 boundary reset.

graphite's ``group(a, b)`` concatenates the evaluated lists, so
``limit(group(sortBy(a), b), n)`` takes the first n of (sorted a, then
b). The r11 ``_drop_internal`` fix removed the sortBy bookkeeping at
the union (fixing a schema-mismatch crash) but selected by NAME order;
r12's ``seriesfns._concat_order`` re-ranks the union on (branch index,
per-branch sortBy rank or name), restoring graphite's order. This cert
fails on BOTH pre-r12 behaviors:

- part ``sorted`` — ``limit(group(sortBy(svc.*.*, 'max'),
  cap.*.total), 6)``: the pick must be the six svc series with the
  SMALLEST per-series max (sortBy is ascending), where name order
  would pick ``svc.click.*`` first regardless of magnitude;
- part ``branch`` — ``limit(group(cap.*.total, svc.*.*), 12)``: the
  first branch's six ``cap.*`` series must ALL precede any ``svc.*``,
  where union name order interleaves (``cap.* < svc.*`` happens to
  agree lexically here, so the part also pins that an UNSORTED branch
  orders by name within itself: the six svc picks are the lexical
  first six).

Store and determinism: the batch80 store (integer-valued floors of the
events fixture, hourly MAX rollup — exact in both engines); per-series
maxima are exact integral doubles, so the sortBy ranking and the
tiebreak (max asc, metric asc) are reproducible in DuckDB verbatim.

Scale notes (100 TB): ``_concat_order`` touches one-row-per-series
frames only (distinct + a struct-min groupBy + the with_global_prefix
range-rank over series count, never data volume) and broadcasts the
rank back; ``limit`` stays the TakeOrdered-over-survivors pattern. The
render plan itself is the archive fetch + hourly grid — unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.api import Engine
from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.operators.policies import Policy
from kenshin_backup_spark.queries.batch80 import _store_points
from kenshin_backup_spark.sources.tables import staged_path

_ES = EPOCH_S_SQL.format(x="ts")

_T_SORTED = "limit(group(sortBy(svc.*.*, 'max'), cap.*.total), 6)"
_T_BRANCH = "limit(group(cap.*.total, svc.*.*), 12)"


def graphite_render_group_order(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Concatenation-order selection through Engine.render_many (see
    module docstring — fails on name-order selection pre-r12)."""
    pts = _store_points(spark, sf_dir)
    eng = Engine(
        spark,
        staged_path(sf_dir, "grouporder_store", tables=("events",)),
        policies=[Policy(name="hourly", pattern=".*", steps=(3600,),
                         agg="max")],
    )
    # exact raw bounds from the store-build pass (observe) — kills the
    # second full raw scan the bounds agg used to run (r16, guide §1.1);
    # every event row fans out to ≥1 store row with its ts verbatim, so
    # the written points' min/max equals the old bounds agg over pts
    lo_s, hi_s = eng.write(pts, observe_bounds=True)
    lo = lo_s - lo_s % 86400
    out = eng.render_many([_T_SORTED, _T_BRANCH], lo, hi_s + 1)
    return out.select(
        F.when(F.col("target") == _T_SORTED, F.lit("sorted"))
        .otherwise(F.lit("branch"))
        .alias("part"),
        "metric",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.col("value").cast("double").alias("value"),
    )


_GROUP_ORDER_SQL = f"""
WITH bounds AS (
  SELECT (MIN({_ES}) - MIN({_ES}) % 86400) AS lo,
         ((MAX({_ES}) + 1) // 3600) * 3600 AS hi
  FROM events
),
-- the batch80 store: per-metric hourly MAX of integral floors
hourly AS (
  SELECT 'svc.' || event_type || '.a' AS metric,
         CAST((({_ES}) // 3600) * 3600 AS BIGINT) AS h,
         CAST(MAX(FLOOR(value)) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
  UNION ALL
  SELECT 'svc.' || event_type || '.b',
         CAST((({_ES}) // 3600) * 3600 AS BIGINT),
         CAST(MAX(FLOOR(value / CAST(2 AS DOUBLE))) AS DOUBLE)
  FROM events GROUP BY 1, 2
  UNION ALL
  SELECT 'cap.' || event_type || '.total',
         CAST((({_ES}) // 3600) * 3600 AS BIGINT),
         CAST(MAX(FLOOR(value) * 3) AS DOUBLE)
  FROM events GROUP BY 1, 2
  UNION ALL
  SELECT 'cap.refund.total',
         CAST((({_ES}) // 3600) * 3600 AS BIGINT),
         CAST(MAX(FLOOR(value) + 7) AS DOUBLE)
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
),
mets AS (SELECT DISTINCT metric FROM hourly),
-- part 'sorted': sortBy(svc, 'max') ascending, metric tiebreak → first 6
sorted_pick AS (
  SELECT metric FROM (
    SELECT metric, MAX(v) AS mx FROM hourly
    WHERE metric LIKE 'svc.%' GROUP BY 1
  ) ORDER BY mx ASC, metric ASC LIMIT 6
),
-- part 'branch': all of branch 0 (cap.*, name order) then svc by name
branch_pick AS (
  SELECT metric FROM mets
  ORDER BY (CASE WHEN metric LIKE 'cap.%' THEN 0 ELSE 1 END) ASC,
           metric ASC
  LIMIT 12
),
slots AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, 3600)) AS BIGINT) AS h
  FROM bounds
)
SELECT 'sorted' AS part, p.metric, s.h AS bucket_ts, hr.v AS value
FROM sorted_pick p CROSS JOIN slots s
LEFT JOIN hourly hr ON hr.metric = p.metric AND hr.h = s.h
UNION ALL
SELECT 'branch', p.metric, s.h, hr.v
FROM branch_pick p CROSS JOIN slots s
LEFT JOIN hourly hr ON hr.metric = p.metric AND hr.h = s.h
ORDER BY 1, 2, 3
"""


QUERIES = {
    "graphite_render_group_order": graphite_render_group_order,
}

ORACLE = {
    "graphite_render_group_order": _GROUP_ORDER_SQL,
}
