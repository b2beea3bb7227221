"""Batch-61 query (round 4): user path analysis.

``events_top_paths`` — the product-analytics "path analysis" view: the
20 most-travelled 3-step event-type paths (ordered triples of
consecutive events per user), with traversal counts and the share of
all 3-step paths. Consecutiveness is defined by per-user event order
(ts, then event_id for exact ties) — the same total order every other
sequence query in the registry uses.

Scale notes (100 TB): the lead windows partition on ``user_id`` (one
hash exchange, both leads reuse it); path counting is a map-side
partial aggregate on a key space bounded by |event_types|³; the top-20
uses ``orderBy().limit()`` (TakeOrderedAndProject) with the rank window
over the 20 surviving rows; the total attaches as a broadcast scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")

TOP_N = 20


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 3-step event-type paths (see module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    steps = (
        ev.select("user_id", "event_id", es.alias("es"),
                  F.col("event_type").alias("e1"))
        .withColumn("e2", F.lead("e1", 1).over(w))
        .withColumn("e3", F.lead("e1", 2).over(w))
        .where(F.col("e3").isNotNull())
    )
    paths = steps.groupBy(
        F.concat_ws(">", "e1", "e2", "e3").alias("path")
    ).agg(F.count(F.lit(1)).alias("n_traversals"))
    total = paths.agg(F.sum("n_traversals").alias("total"))
    top = (
        paths.crossJoin(F.broadcast(total))
        .orderBy(F.desc("n_traversals"), F.asc("path"))
        .limit(TOP_N)
    )
    w_rank = Window.orderBy(F.desc("n_traversals"), F.asc("path"))
    return top.withColumn(
        "rank", F.row_number().over(w_rank).cast("long")
    ).select(
        "rank",
        "path",
        F.col("n_traversals").cast("long").alias("n_traversals"),
        (F.col("n_traversals") / F.col("total").cast("double"))
        .cast("double")
        .alias("share"),
    )


_PATHS_SQL = f"""
WITH steps AS (
  SELECT e1,
         lead(e1, 1) OVER (PARTITION BY user_id ORDER BY es, event_id) AS e2,
         lead(e1, 2) OVER (PARTITION BY user_id ORDER BY es, event_id) AS e3
  FROM (SELECT user_id, event_id, {_ES} AS es, event_type AS e1 FROM events)
),
paths AS (
  SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n_traversals
  FROM steps WHERE e3 IS NOT NULL GROUP BY 1
),
total AS (SELECT SUM(n_traversals) AS total FROM paths)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_traversals DESC, path ASC)
            AS BIGINT) AS rank,
       path, CAST(n_traversals AS BIGINT) AS n_traversals,
       CAST(n_traversals / CAST(total AS DOUBLE) AS DOUBLE) AS share
FROM paths CROSS JOIN total
ORDER BY n_traversals DESC, path ASC
LIMIT {TOP_N}
"""


QUERIES = {
    "events_top_paths": events_top_paths,
}

ORACLE = {
    "events_top_paths": _PATHS_SQL,
}
