"""Batch-64 query (round 4): graphite 1.1 tagged-metric querying.

``graphite_series_by_tag`` — the tagged-path surface graphite added in
1.1 (``name;tag1=v1;tag2=v2`` + ``seriesByTag``): events are published
as tagged series (``requests;type=<event_type>;dc=<east|west>``, dc
derived deterministically from user_id), then queried with::

    seriesByTag('type=~^(click|view)$', 'dc=east')

and rolled up hourly per full tagged path. Tag predicates compile to
scan-side regexp probes (`operators/seriesfns.tag_value`) — the same
predicate shape a 100 TB deployment would push into a (tag, value)
inverted index; no parsing UDF anywhere.

The oracle repeats the tagging, the two tag predicates, and the hourly
quantized rollup in DuckDB, so the hash certifies the tag grammar
(exact + regex operators), the path construction, and the rollup in one
row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL, QAVG_SQL
from kenshin_backup_spark.operators.seriesfns import series_by_tag
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")


def graphite_series_by_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """seriesByTag over tagged event series (see module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        F.concat(
            F.lit("requests;type="),
            F.col("event_type"),
            F.lit(";dc="),
            F.when(F.col("user_id") % 2 == 0, "east").otherwise("west"),
        ).alias("metric"),
        "ts",
        "value",
    )
    picked = series_by_tag(tagged, "type=~^(click|view)$", "dc=east")
    es = F.unix_timestamp("ts").cast("long")
    return (
        picked.groupBy(
            "metric", (es - es % 3600).cast("long").alias("bucket_ts")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            (
                F.sum(F.floor(F.col("value") * 1_000_000).cast("long"))
                / F.lit(1_000_000.0)
                / F.count("value")
            )
            .cast("double")
            .alias("avg_v"),
        )
    )


_TAG_SQL = f"""
WITH tagged AS (
  SELECT 'requests;type=' || event_type || ';dc='
           || CASE WHEN user_id % 2 = 0 THEN 'east' ELSE 'west' END AS metric,
         ts, value
  FROM events
),
picked AS (
  SELECT * FROM tagged
  WHERE regexp_matches(regexp_extract(metric, '(?:^|;)type=([^;]*)', 1),
                       '^(click|view)$')
    AND regexp_extract(metric, '(?:^|;)dc=([^;]*)', 1) = 'east'
)
SELECT metric, CAST(({_ES} // 3600) * 3600 AS BIGINT) AS bucket_ts,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       {QAVG_SQL.format(x="value")} AS avg_v
FROM picked GROUP BY 1, 2
"""


QUERIES = {
    "graphite_series_by_tag": graphite_series_by_tag,
}

ORACLE = {
    "graphite_series_by_tag": _TAG_SQL,
}
