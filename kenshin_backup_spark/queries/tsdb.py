"""TSDB-core queries — the reference-parity surface (SURVEY.md §2.1–2.3, §3.2).

The ``events`` table plays the reference's role of the metric stream:
``event_type`` is the metric name, ``ts``/``value`` the datapoint
(FIXTURES.md). Every query here exercises a reference semantic: bucket
alignment, the five agg kernels, xFilesFactor, gap-fill fetch, archive
cascade, policy assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.cache import persist_tracked
from kenshin_backup_spark.functions.deterministic import (
    EPOCH_S_SQL,
    QAVG_SQL,
    QSUM_SQL,
)
from kenshin_backup_spark.operators.fetch import gap_fill
from kenshin_backup_spark.operators.rollup import (
    align_epoch,
    cascade,
    finalize,
    rollup_partials,
)
from kenshin_backup_spark.sources import load_table

_ES = EPOCH_S_SQL.format(x="ts")


def _hour_grid_wide(spark: SparkSession, sf_dir: str, step: int) -> DataFrame:
    """events → wide rollup at ``step`` seconds, gap-filled on the global
    [min,max] aligned grid × all event types. The Phase-0 flagship shape."""
    ev = load_table(spark, sf_dir, "events")
    # ONE scan of raw events: grid bounds and the key set derive from the
    # (tiny) aggregated partials, not from re-scans of the fact table —
    # at 100 TB the three-scan variant costs 3× the IO for nothing.
    parts = rollup_partials(ev, key_cols=["event_type"], step_seconds=step).transform(persist_tracked)
    wide = finalize(parts)
    bounds = parts.agg(F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(step))).alias("bucket_ts")
    )
    keys = parts.select("event_type").distinct()
    filled = gap_fill(grid, wide, key_cols=["event_type"], keys=keys)
    return filled.select(
        "event_type",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_points"),
        "sum_value",
        "avg_value",
        "min_value",
        "max_value",
        "last_value",
    )


def tsdb_rollup_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: per-metric 1-hour tumbling rollup with all five reference
    agg kernels + gap-fill (SURVEY §7 Phase 0)."""
    return _hour_grid_wide(spark, sf_dir, 3600)


def _rollup_wide_sql(step: int) -> str:
    qsum_v = QSUM_SQL.format(x="value")
    return f"""
WITH e AS (
  SELECT event_type, value,
         CAST({_ES} AS BIGINT) AS es,
         CAST(({_ES} // {step}) * {step} AS BIGINT) AS bucket_ts
  FROM events
),
agg AS (
  SELECT event_type, bucket_ts,
         COUNT(value) AS cnt,
         {qsum_v} AS sum_value,
         MIN(value) AS min_value,
         MAX(value) AS max_value
  FROM e GROUP BY 1, 2
),
lastv AS (
  SELECT event_type, bucket_ts, value AS last_value FROM (
    SELECT event_type, bucket_ts, value,
           ROW_NUMBER() OVER (
             PARTITION BY event_type, bucket_ts
             ORDER BY es DESC, value DESC) AS rn
    FROM e WHERE value IS NOT NULL) t
  WHERE rn = 1
),
bounds AS (SELECT MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi FROM e),
grid AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, {step})) AS BIGINT) AS bucket_ts
  FROM bounds
),
keys AS (SELECT DISTINCT event_type FROM events)
SELECT k.event_type,
       g.bucket_ts,
       COALESCE(a.cnt, 0) AS n_points,
       CASE WHEN a.cnt > 0 THEN a.sum_value END AS sum_value,
       CASE WHEN a.cnt > 0
            THEN CAST(a.sum_value / a.cnt AS DOUBLE) END AS avg_value,
       CASE WHEN a.cnt > 0 THEN a.min_value END AS min_value,
       CASE WHEN a.cnt > 0 THEN a.max_value END AS max_value,
       CASE WHEN a.cnt > 0 THEN l.last_value END AS last_value
FROM keys k
CROSS JOIN grid g
LEFT JOIN agg a ON a.event_type = k.event_type AND a.bucket_ts = g.bucket_ts
LEFT JOIN lastv l ON l.event_type = k.event_type AND l.bucket_ts = g.bucket_ts
"""


def tsdb_rollup_cascade_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive cascade (reference ``propagate``, SURVEY §2.3 A7): build the
    1-day level FROM the materialized 1-hour partials — (sum, count) carry,
    never avg-of-avg. Oracle computes 1-day directly from raw points, so a
    hash match proves cascade == direct."""
    ev = load_table(spark, sf_dir, "events")
    hour = rollup_partials(ev, key_cols=["event_type"], step_seconds=3600)
    day = cascade(hour, key_cols=["event_type"], step_seconds=86400)
    wide = finalize(day)
    return wide.select(
        "event_type",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.col("cnt").cast("long").alias("n_points"),
        "sum_value",
        "avg_value",
        "min_value",
        "max_value",
        "last_value",
    )


_CASCADE_SQL = f"""
WITH e AS (
  SELECT event_type, value,
         CAST({_ES} AS BIGINT) AS es,
         CAST(({_ES} // 86400) * 86400 AS BIGINT) AS bucket_ts
  FROM events
),
agg AS (
  SELECT event_type, bucket_ts,
         COUNT(value) AS n_points,
         {QSUM_SQL.format(x="value")} AS sum_value,
         {QAVG_SQL.format(x="value")} AS avg_value,
         MIN(value) AS min_value,
         MAX(value) AS max_value
  FROM e GROUP BY 1, 2
),
lastv AS (
  SELECT event_type, bucket_ts, value AS last_value FROM (
    SELECT event_type, bucket_ts, value,
           ROW_NUMBER() OVER (
             PARTITION BY event_type, bucket_ts
             ORDER BY es DESC, value DESC) AS rn
    FROM e WHERE value IS NOT NULL) t
  WHERE rn = 1
)
SELECT a.event_type, a.bucket_ts, a.n_points, a.sum_value, a.avg_value,
       a.min_value, a.max_value, l.last_value
FROM agg a
LEFT JOIN lastv l ON l.event_type = a.event_type AND l.bucket_ts = a.bucket_ts
"""


def tsdb_fetch_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference fetch shape (SURVEY §3.2): one metric ('click'), 30-minute
    step, aligned grid over the full data range, gaps as NULL, ``average``
    kernel — the exact ``fetch(path, from, until)`` read surface."""
    step = 1800
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "click")
    parts = rollup_partials(ev, key_cols=["event_type"], step_seconds=step).transform(persist_tracked)
    vals = finalize(parts, agg="average")
    bounds = parts.agg(F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(step))).alias("bucket_ts")
    )
    keys = parts.select("event_type").distinct()
    filled = gap_fill(grid, vals.select("event_type", "bucket_ts", "value"),
                      key_cols=["event_type"], keys=keys)
    return filled.select(
        "event_type",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.col("value").alias("avg_value"),
    )


_FETCH_SQL = f"""
WITH e AS (
  SELECT event_type, value,
         CAST(({_ES} // 1800) * 1800 AS BIGINT) AS bucket_ts
  FROM events WHERE event_type = 'click'
),
agg AS (
  SELECT event_type, bucket_ts,
         {QAVG_SQL.format(x="value")} AS avg_value
  FROM e WHERE value IS NOT NULL GROUP BY 1, 2
),
bounds AS (SELECT MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi FROM e),
grid AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, 1800)) AS BIGINT) AS bucket_ts
  FROM bounds
)
SELECT 'click' AS event_type, g.bucket_ts, a.avg_value
FROM grid g
LEFT JOIN agg a ON a.bucket_ts = g.bucket_ts
"""


def tsdb_xff_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xFilesFactor guard (SURVEY §2.3 A6): 1-hour buckets of minute-slotted
    data; expected slots/bucket = 60; bucket kept only when the fraction of
    filled minute slots ≥ 0.5, else the bucket reads back as a gap (NULL)."""
    step, fine, xff = 3600, 60, 0.5
    ev = load_table(spark, sf_dir, "events")
    # known slots = distinct filled minute slots (reference counts slots,
    # not points: two points in one minute fill one slot).
    slots = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        align_epoch("ts", fine).alias("slot_ts"),
        "value",
    )
    per_bucket = (
        slots.groupBy(
            "event_type",
            ((F.col("slot_ts") - (F.col("slot_ts") % step))).cast("long").alias("bucket_ts"),
        )
        .agg(
            F.countDistinct("slot_ts").alias("known_slots"),
            F.count("value").alias("n_points"),
            (F.sum(F.floor(F.col("value") * 1000000).cast("long"))
             / F.lit(1000000.0)).cast("double").alias("sum_all"),
        )
    )
    guard = (F.col("known_slots").cast("double") / F.lit(float(step // fine))) >= F.lit(xff)
    return per_bucket.select(
        "event_type",
        "bucket_ts",
        F.col("known_slots").cast("long").alias("known_slots"),
        F.when(guard, F.col("sum_all")).alias("sum_value"),
        F.when(guard, (F.col("sum_all") / F.col("n_points")).cast("double")).alias("avg_value"),
    )


_XFF_SQL = f"""
WITH s AS (
  SELECT event_type,
         CAST(({_ES} // 60) * 60 AS BIGINT) AS slot_ts,
         value
  FROM events WHERE value IS NOT NULL
),
b AS (
  SELECT event_type,
         CAST((slot_ts // 3600) * 3600 AS BIGINT) AS bucket_ts,
         COUNT(DISTINCT slot_ts) AS known_slots,
         COUNT(value) AS n_points,
         {QSUM_SQL.format(x="value")} AS sum_all
  FROM s GROUP BY 1, 2
)
SELECT event_type, bucket_ts, known_slots,
       CASE WHEN known_slots / 60.0 >= 0.5 THEN sum_all END AS sum_value,
       CASE WHEN known_slots / 60.0 >= 0.5
            THEN CAST(sum_all / n_points AS DOUBLE) END AS avg_value
FROM b
"""


def tsdb_policy_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-schema policy assignment (SURVEY §3.3): ordered regex list,
    first match wins, evaluated as a codegen'd when-chain; aggregated to
    per-policy metric counts so the output is small and stable."""
    from kenshin_backup_spark.operators.policies import Policy, assign_policy

    policies = [
        Policy(name="errors", pattern="^err"),
        Policy(name="commerce", pattern="(purchase|signup)"),
        Policy(name="traffic", pattern="(click|view)"),
    ]
    ev = load_table(spark, sf_dir, "events")
    assigned = assign_policy(ev, policies, metric_col="event_type")
    return (
        assigned.groupBy("policy")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_metrics"),
        )
        .select("policy", F.col("n_events").cast("long"), F.col("n_metrics").cast("long"))
    )


_POLICY_SQL = """
SELECT CASE
         WHEN regexp_matches(event_type, '^err') THEN 'errors'
         WHEN regexp_matches(event_type, '(purchase|signup)') THEN 'commerce'
         WHEN regexp_matches(event_type, '(click|view)') THEN 'traffic'
         ELSE 'default'
       END AS policy,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_metrics
FROM events GROUP BY 1
"""


def tsdb_fetch_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetch + graphite keepLastValue(): the gap-filled 30-min 'click'
    series with gaps forward-filled from the last seen value — the
    render-path composition users run on sparse series."""
    from kenshin_backup_spark.operators.seriesfns import keep_last_value

    base = tsdb_fetch_gapfill(spark, sf_dir).select(
        F.col("event_type").alias("metric"), "bucket_ts",
        F.col("avg_value").alias("value"),
    )
    filled = keep_last_value(base)
    return filled.select(
        F.col("metric").alias("event_type"),
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.col("value").cast("double").alias("filled_value"),
    )


_KEEPLAST_SQL = f"""
WITH e AS (
  SELECT event_type, value,
         CAST(({_ES} // 1800) * 1800 AS BIGINT) AS bucket_ts
  FROM events WHERE event_type = 'click'
),
agg AS (
  SELECT event_type, bucket_ts,
         {QAVG_SQL.format(x="value")} AS avg_value
  FROM e WHERE value IS NOT NULL GROUP BY 1, 2
),
bounds AS (SELECT MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi FROM e),
grid AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, 1800)) AS BIGINT) AS bucket_ts
  FROM bounds
),
series AS (
  SELECT 'click' AS event_type, g.bucket_ts, a.avg_value
  FROM grid g LEFT JOIN agg a ON a.bucket_ts = g.bucket_ts
)
SELECT event_type, bucket_ts,
       CAST(LAST_VALUE(avg_value IGNORE NULLS) OVER (
              PARTITION BY event_type ORDER BY bucket_ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS DOUBLE) AS filled_value
FROM series
"""


QUERIES = {
    "tsdb_rollup_1h": tsdb_rollup_1h,
    "tsdb_fetch_keep_last": tsdb_fetch_keep_last,
    "tsdb_rollup_cascade_1d": tsdb_rollup_cascade_1d,
    "tsdb_fetch_gapfill": tsdb_fetch_gapfill,
    "tsdb_xff_guard": tsdb_xff_guard,
    "tsdb_policy_assign": tsdb_policy_assign,
}

ORACLE = {
    "tsdb_rollup_1h": _rollup_wide_sql(3600),
    "tsdb_fetch_keep_last": _KEEPLAST_SQL,
    "tsdb_rollup_cascade_1d": _CASCADE_SQL,
    "tsdb_fetch_gapfill": _FETCH_SQL,
    "tsdb_xff_guard": _XFF_SQL,
    "tsdb_policy_assign": _POLICY_SQL,
}
