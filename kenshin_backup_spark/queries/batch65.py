"""Batch-65 query (round 4): multi-resolution rollup in ONE scan.

``tsdb_multires_rollup`` — the dashboard warm-up job that populates the
1h / 6h / 1d levels of a rollup ladder in a single pass: each event row
is replicated to its three granularities via an exploded granularity
array (ONE in-pipeline Expand-style Generate — the
``tsdb_hopping_window`` lesson), then aggregated per (granularity,
bucket, metric) with map-side partial combine. The naive alternative —
three separate rollup queries — scans the fact table three times; at
100 TB the single-scan Expand shape is the difference between one and
three passes over the lake.

The oracle is the UNION ALL of three independent rollups, so the hash
match proves the replicated-scan plan computes exactly what the
three-pass plan would.

Scale notes: Generate fan-out is a constant ×3 (in-pipeline, no
shuffle); the aggregate shuffles once on (gran, bucket, metric) with
partial aggregation below the exchange; output volume is the ladder's
own size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL, QAVG_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")

GRANULARITIES = (3600, 21600, 86400)


def tsdb_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h/6h/1d rollup levels from one scan (see module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    expanded = ev.select(
        F.col("event_type").alias("metric"),
        es.alias("es"),
        F.floor(F.col("value") * 1_000_000).cast("long").alias("vq"),
        F.explode(
            F.array(*[F.lit(g) for g in GRANULARITIES])
        ).alias("gran"),
    )
    return (
        expanded.groupBy(
            F.col("gran").cast("long").alias("gran"),
            (F.col("es") - F.col("es") % F.col("gran"))
            .cast("long")
            .alias("bucket_ts"),
            "metric",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            (F.sum("vq") / F.lit(1_000_000.0) / F.count(F.lit(1)))
            .cast("double")
            .alias("avg_v"),
        )
    )


def _level_sql(gran: int) -> str:
    return f"""
SELECT CAST({gran} AS BIGINT) AS gran,
       CAST(({_ES} // {gran}) * {gran} AS BIGINT) AS bucket_ts,
       event_type AS metric,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       {QAVG_SQL.format(x="value")} AS avg_v
FROM events GROUP BY 2, 3"""


_MULTIRES_SQL = "\nUNION ALL\n".join(_level_sql(g) for g in GRANULARITIES)


QUERIES = {
    "tsdb_multires_rollup": tsdb_multires_rollup,
}

ORACLE = {
    "tsdb_multires_rollup": _MULTIRES_SQL,
}
