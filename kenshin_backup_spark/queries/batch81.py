"""Batch-81 query (round 11): aliasQuery certified end-to-end.

``graphite_render_aliasquery`` drives the round-11 catalog-closure
function through ``Engine.render``: each ``chan.<etype>.power`` series
name regex-substitutes into its ``chan.<etype>.freq`` sibling, that
target re-evaluates on the evaluator's window context (a second pruned
store fetch), and the LAST value of the result sprintfs into the new
legend — graphite's per-series re-query. The cert pins the whole
chain: bounded per-series evaluation, safeLast (the last NON-GAP
slot), and Python ``'%d'`` formatting (truncation mirrored by the
oracle's ``CAST(... AS BIGINT)``).

Determinism: both families hold ``floor()``-ed integers; the freq
family adds ``ascii(first char of etype)·1000`` so every renamed
legend is distinct across event types (99/101/112/115/118 thousands —
floor(value) ≤ a few hundred can never bridge two offsets). The last
value is DuckDB ``arg_max`` over the hourly grid — exact integers, no
float accumulation anywhere.

Scale notes (100 TB): aliasQuery issues one bounded re-query per
DISTINCT series name (the applyByNode render-tier contract — series
count, never data-proportional); each re-query is an exact-name
archive fetch (partition-pruned); the rename applies as a literal
``create_map`` lookup on the scan — no shuffle, no data-proportional
driver work.
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


def graphite_render_aliasquery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """aliasQuery(chan.*.power, 'power', 'freq', 'Channel %d MHz')
    through Engine.render (see module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    power = ev.select(
        F.concat(F.lit("chan."), "event_type", F.lit(".power")).alias(
            "metric"
        ),
        "ts",
        F.floor("value").cast("double").alias("value"),
    )
    freq = ev.select(
        F.concat(F.lit("chan."), "event_type", F.lit(".freq")).alias(
            "metric"
        ),
        "ts",
        (F.floor("value") + F.ascii("event_type") * F.lit(1000))
        .cast("double")
        .alias("value"),
    )
    eng = Engine(
        spark,
        staged_path(sf_dir, "aliasq_store", tables=("events",)),
        policies=[Policy(name="hourly", pattern=".*", steps=(3600,),
                         agg="max")],
    )
    # exact raw bounds from the store-build pass (observe) — no second
    # full raw scan (r16, guide §1.1); both union branches carry ev's ts
    # verbatim, so the written points' min/max equals the old bounds agg
    # over the power branch alone
    lo_s, hi_s = eng.write(power.unionByName(freq), observe_bounds=True)
    lo = lo_s - lo_s % 86400
    out = eng.render(
        "aliasQuery(chan.*.power, 'power', 'freq', 'Channel %d MHz')",
        lo, hi_s + 1,
    )
    return out.select(
        "metric",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.col("value").cast("double").alias("value"),
    )


_ALIASQ_SQL = f"""
WITH bounds AS (
  SELECT (MIN({_ES}) - MIN({_ES}) % 86400) AS lo,
         ((MAX({_ES}) + 1) // 3600) * 3600 AS hi
  FROM events
),
mets AS (
  SELECT UNNEST(['click','error','purchase','signup','view']) AS etype
),
hourly AS (
  SELECT event_type AS etype,
         CAST((({_ES}) // 3600) * 3600 AS BIGINT) AS h,
         CAST(MAX(FLOOR(value)) AS DOUBLE) AS pv,
         CAST(MAX(FLOOR(value) + ascii(event_type) * 1000) AS DOUBLE) AS fv
  FROM events GROUP BY 1, 2
),
-- safeLast of the freq sibling: the value at its last non-gap slot
last_freq AS (
  SELECT etype, arg_max(fv, h) AS cur FROM hourly GROUP BY etype
)
SELECT 'Channel ' || CAST(CAST(lf.cur AS BIGINT) AS VARCHAR) || ' MHz'
         AS metric,
       CAST(g.h AS BIGINT) AS bucket_ts, hr.pv AS value
FROM (SELECT UNNEST(generate_series(lo, hi, 3600)) AS h FROM bounds) g
CROSS JOIN mets m
JOIN last_freq lf ON lf.etype = m.etype
LEFT JOIN hourly hr ON hr.h = g.h AND hr.etype = m.etype
ORDER BY 1, 2
"""


QUERIES = {
    "graphite_render_aliasquery": graphite_render_aliasquery,
}

ORACLE = {
    "graphite_render_aliasquery": _ALIASQ_SQL,
}
