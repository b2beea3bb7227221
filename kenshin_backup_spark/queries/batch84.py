"""Batch-84 query (round 13): the r12 groupByNode kernel WIDENING
certified end-to-end — VERDICT r12 #4.

Round 12 widened groupByNode/groupByNodes/groupByTags from the four
fast kernels (sum/avg/max/min) to graphite's full aggFunc set
(median/stddev/count/range/multiply/pow/diff/last) via
``seriesfns._combine_grouped``; the widening was fuzz- and pytest-
covered but had no driver cert. ``graphite_groupbynode_median`` drives
``groupByNode(*.*.*, 0, 'median')`` through ``Engine.render``: node 0
collapses the batch80 store to two groups — ``svc`` (ten member
series) and ``cap`` (six, one of them sparse) — so every bucket
exercises the per-bucket sorted-array median over BOTH parities (even
member count with the full svc group, odd for cap hours where the
sparse ``cap.refund.total`` is a gap) plus the all-gap → NULL row.

Store and determinism: the batch80 store (integer-valued floors of the
events fixture, hourly MAX rollup — exact in both engines). Member
values are integral doubles, so the median is exact: odd count picks a
stored integer; even count averages two integers — an exact ``x.0`` or
``x.5`` double. The oracle mirrors the kernel STAGE-FOR-STAGE
(``list_sort`` over the group's non-gap hourly values, middle element
or mean-of-two-middles) rather than trusting ``quantile_cont``'s
interpolation form.

Scale notes (100 TB): the median kernel's ``collect_list`` is bounded
by MEMBER COUNT PER GROUP per bucket (series count, never data
volume) — the same contract as multiply/pow's completeness gates; the
groupBy key (group, bucket) is coarser than the input key, so the
shuffle shrinks and map-side combines. The render plan under it is the
unchanged archive fetch + hourly grid.
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


def graphite_groupbynode_median(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """groupByNode with the 'median' aggFunc through Engine.render (see
    module docstring — fails pre-r12 with the loud kernel reject)."""
    pts = _store_points(spark, sf_dir)
    eng = Engine(
        spark,
        staged_path(sf_dir, "gbnmedian_store", tables=("events",)),
        policies=[Policy(name="hourly", pattern=".*", steps=(3600,),
                         agg="max")],
    )
    # exact raw bounds from the store-build pass (observe) — kills the
    # second full raw scan the bounds agg used to run (r16, guide §1.1)
    lo_s, hi_s = eng.write(pts, observe_bounds=True)
    lo = lo_s - lo_s % 86400
    out = eng.render("groupByNode(*.*.*, 0, 'median')", lo, hi_s + 1)
    return out.select(
        "metric",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.col("value").cast("double").alias("value"),
    )


_GBN_MEDIAN_SQL = f"""
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
-- node 0 of the dotted name = the group key
grouped AS (
  SELECT split_part(metric, '.', 1) AS grp, h,
         list_sort(list(v)) AS vals
  FROM hourly GROUP BY 1, 2
),
-- the kernel's sorted-array median, stage-mirrored: odd → middle,
-- even → mean of the two middles (members are integral → exact)
med AS (
  SELECT grp, h,
         CASE
           WHEN len(vals) % 2 = 1 THEN vals[len(vals) // 2 + 1]
           ELSE (vals[len(vals) // 2] + vals[len(vals) // 2 + 1])
                / CAST(2 AS DOUBLE)
         END AS v
  FROM grouped
),
grps AS (SELECT UNNEST(['svc', 'cap']) AS grp),
slots AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, 3600)) AS BIGINT) AS h
  FROM bounds
)
SELECT g.grp AS metric, s.h AS bucket_ts, m.v AS value
FROM grps g CROSS JOIN slots s
LEFT JOIN med m ON m.grp = g.grp AND m.h = s.h
ORDER BY 1, 2
"""


QUERIES = {
    "graphite_groupbynode_median": graphite_groupbynode_median,
}

ORACLE = {
    "graphite_groupbynode_median": _GBN_MEDIAN_SQL,
}
