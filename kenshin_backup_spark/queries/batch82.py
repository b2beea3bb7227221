"""Batch-82 query (round 11): the pie render surface certified
end-to-end.

``graphite_render_pie`` drives ``Engine.render_pie`` — graphite-web's
``&graphType=pie&pieMode=...`` branch (render/views.py over
render/functions.py's ``PieFunctions``), the last render-API surface
next to the line graph — through all three kernels in one result:
each ``chan.<etype>.power`` series collapses to one slice value per
mode (average / maximum / minimum), plus a literal ``name:value``
slice (the other pie target form views.py accepts).

Determinism: the store holds ``floor()``-ed integers under a
max-aggregated hourly policy, so every slice kernel reduces exact
integer-valued doubles — max/min are exact, and average is one binary64
division of an exact integer sum (≤ 2^53) by an exact count, bit-equal
in Spark and DuckDB regardless of reduction order. Gap slots are NULL
in the rendered frame and both engines' aggregates ignore NULLs, so the
grid clamp cancels out of every kernel.

Scale notes (100 TB): the pie reduction is ONE gap-ignoring aggregate
keyed on the series name, stacked directly on the render plan — a
map-side-combined groupBy, no shuffle beyond the render's own; the
literal slice is a 1-row plan that never touches the store.
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


def graphite_render_pie(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three pieMode kernels + a literal slice through
    Engine.render_pie (see module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    power = ev.select(
        F.concat(F.lit("chan."), "event_type", F.lit(".power")).alias(
            "metric"
        ),
        "ts",
        F.floor("value").cast("double").alias("value"),
    )
    eng = Engine(
        spark,
        staged_path(sf_dir, "pie_store", tables=("events",)),
        policies=[Policy(name="hourly", pattern=".*", steps=(3600,),
                         agg="max")],
    )
    # exact raw bounds from the store-build pass (observe) — kills the
    # second full raw scan the bounds agg used to run (r16, guide §1.1)
    lo_s, hi_s = eng.write(power, observe_bounds=True)
    lo = lo_s - lo_s % 86400
    out: DataFrame | None = None
    # all three pie modes reduce the SAME fetched frame: share one leaf
    # fetch/persist across the modes (request-scoped memo, r16)
    memo: dict = {}
    for mode in ("average", "maximum", "minimum"):
        part = eng.render_pie(
            "chan.*.power", lo, hi_s + 1, pie_mode=mode, memo=memo
        ).select(F.lit(mode).alias("mode"), "metric", "value")
        out = part if out is None else out.unionByName(part)
    lit = eng.render_pie("other:42.5", lo, hi_s + 1).select(
        F.lit("literal").alias("mode"), "metric", "value"
    )
    return out.unionByName(lit)


_PIE_SQL = f"""
WITH hourly AS (
  SELECT 'chan.' || event_type || '.power' AS metric,
         CAST((({_ES}) // 3600) * 3600 AS BIGINT) AS h,
         CAST(MAX(FLOOR(value)) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
),
slices AS (
  SELECT metric,
         AVG(v) AS average, MAX(v) AS maximum, MIN(v) AS minimum
  FROM hourly GROUP BY metric
)
SELECT 'average' AS mode, metric, CAST(average AS DOUBLE) AS value
FROM slices
UNION ALL
SELECT 'maximum', metric, CAST(maximum AS DOUBLE) FROM slices
UNION ALL
SELECT 'minimum', metric, CAST(minimum AS DOUBLE) FROM slices
UNION ALL
SELECT 'literal', 'other', CAST(42.5 AS DOUBLE)
"""


QUERIES = {
    "graphite_render_pie": graphite_render_pie,
}

ORACLE = {
    "graphite_render_pie": _PIE_SQL,
}
