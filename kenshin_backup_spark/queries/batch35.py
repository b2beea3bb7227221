"""Batch-35 queries (round 4): ladder maintenance round-trip.

``tsdb_ladder_roundtrip`` drives the ENTIRE reference maintenance path in
one oracle-checked query: materialize a two-level retention ladder
(SURVEY §4.2 build), expire date partitions past each level's retention
horizon (the ring buffer's implicit forgetting), compact the fine level's
small files, then serve a fetch from the maintained ladder. The fetch
range lies inside the fine level's retention, so the result must equal a
direct rollup over raw events — a hash match proves expiry dropped ONLY
dead partitions and compaction preserved every row.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL, QSUM_SQL
from kenshin_backup_spark.operators.fetch import Archive
from kenshin_backup_spark.operators.ladder import (
    Ladder,
    build_ladder,
    compact_level,
    expire_retention,
    fetch_from_ladder,
)
from kenshin_backup_spark.operators.rollup import finalize
from kenshin_backup_spark.sources import load_table
from kenshin_backup_spark.sources.tables import staged_path

_ES = EPOCH_S_SQL.format(x="ts")

#: Fine level: 10-minute buckets, 10-day retention. Coarse: 1-hour buckets,
#: 40-day retention — at sf0.01 (~30 days of events) expiry genuinely drops
#: fine-level date partitions while the fetch window stays fully covered.
_FINE = Archive(step_seconds=600, points=1440)
_COARSE = Archive(step_seconds=3600, points=960)
_FETCH_SPAN = 2 * 86400  # trailing 2 days — inside fine retention


def tsdb_ladder_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build → expire → compact → fetch over a materialized ladder.

    The ladder is (re)built from scratch under a fingerprint-keyed staging
    dir on every call (idempotent; stale testdata generations are reaped by
    ``staged_path``). ``now`` is the max event time floored to the fine
    step, captured with ``df.observe`` ON the level-0 build pass itself
    (r16; the r15 form re-scanned the just-built fine level — a
    series×buckets-row pass — for the same scalar). The query reads the
    raw table exactly once and derives ``now`` with zero extra jobs
    (guide §1.1 "how many full passes are unavoidable"). Flooring
    is output-invariant: the fetch span (2 d) and both retention horizons
    are multiples of the fine step, so every bound the fetch derives —
    ``floor(now - span, step)``, ``floor(now, step)``, archive selection,
    clamping — is identical under ``now`` and ``floor(now, step)`` (the
    oracle's grid is byte-identical), and the expire cutoff can only move
    ≤ step-1 s EARLIER, i.e. retain a boundary partition the exact ``now``
    might drop — never drop one the fetch window (deep inside retention)
    could see.
    """
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.col("event_type").alias("metric"), "ts", "value"
    )

    root = staged_path(sf_dir, "ladder_rt", tables=("events",))
    shutil.rmtree(root, ignore_errors=True)
    ladder = Ladder(root=root, archives=(_FINE, _COARSE), key_cols=("metric",))
    # r16: capture max raw ts on the level-0 build pass itself (observe);
    # floor is monotone, so floor(max es, step) == max(floor(es, step)) ==
    # the fine level's max(bucket_ts) — the same now as the r15 fine-level
    # scan, with ZERO extra jobs (that scan is series×buckets rows, a real
    # pass at 100 TB). build_ladder's first action over pts is the fine
    # write — a full pass — so the observation can never see partial data.
    ob = Observation()
    es = F.unix_timestamp("ts").cast("long")
    build_ladder(pts.observe(ob, F.max(es).alias("hi")), ladder)
    now_ts = int(ob.get["hi"])
    now_ts -= now_ts % _FINE.step_seconds
    expire_retention(ladder, now_ts=now_ts)
    compact_level(spark, ladder, _FINE.step_seconds)

    fetched = fetch_from_ladder(
        spark,
        ladder,
        metric_glob="*",
        from_ts=now_ts - _FETCH_SPAN,
        until_ts=now_ts,
        now_ts=now_ts,
    )
    wide = finalize(fetched)
    return wide.select(
        "metric",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_points"),
        "sum_value",
        "avg_value",
        "min_value",
        "max_value",
    )


_LADDER_RT_SQL = f"""
WITH e AS (
  SELECT event_type AS metric, value,
         CAST({_ES} AS BIGINT) AS es,
         CAST(({_ES} // {_FINE.step_seconds}) * {_FINE.step_seconds} AS BIGINT)
           AS bucket_ts
  FROM events
),
nowt AS (SELECT MAX(es) AS now_ts FROM e),
bounds AS (
  SELECT ((now_ts - {_FETCH_SPAN}) // {_FINE.step_seconds})
           * {_FINE.step_seconds} AS lo,
         (now_ts // {_FINE.step_seconds}) * {_FINE.step_seconds} AS hi
  FROM nowt
),
agg AS (
  SELECT metric, bucket_ts,
         COUNT(value) AS cnt,
         {QSUM_SQL.format(x="value")} AS sum_value,
         MIN(value) AS min_value,
         MAX(value) AS max_value
  FROM e GROUP BY 1, 2
),
grid AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, {_FINE.step_seconds})) AS BIGINT)
           AS bucket_ts
  FROM bounds
),
keys AS (SELECT DISTINCT metric FROM e)
SELECT k.metric,
       g.bucket_ts,
       COALESCE(a.cnt, 0) AS n_points,
       CASE WHEN a.cnt > 0 THEN a.sum_value END AS sum_value,
       CASE WHEN a.cnt > 0
            THEN CAST(a.sum_value / a.cnt AS DOUBLE) END AS avg_value,
       CASE WHEN a.cnt > 0 THEN a.min_value END AS min_value,
       CASE WHEN a.cnt > 0 THEN a.max_value END AS max_value
FROM keys k
CROSS JOIN grid g
LEFT JOIN agg a ON a.metric = k.metric AND a.bucket_ts = g.bucket_ts
"""


def tsdb_ladder_coarse_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive SELECTION through the materialized ladder: the fetch range
    starts OUTSIDE the fine level's retention, so ``select_archive`` must
    fall back to the coarse 1-hour archive — the reference's
    finest-adequate-archive routing driven end-to-end (the single-level
    ``tsdb_fetch_gapfill`` never exercises the fallback). The ladder is
    built fresh under its own staging tag so this query is independent of
    ``tsdb_ladder_roundtrip``'s expire/compact mutations.

    ``now`` = ``floor(max event ts, 600)`` is captured with ``df.observe``
    on the level-0 build pass (r16; equals the fine level's max bucket_ts
    the r15 form re-scanned for) — output-invariant exactly as in
    :func:`tsdb_ladder_roundtrip`: the
    12 d/20 d offsets are multiples of the coarse step and
    ``floor(floor(x, 600), 3600) == floor(x, 3600)`` (600 | 3600), so
    the coarse fetch bounds, archive selection, and clamping are all
    unchanged."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(F.col("event_type").alias("metric"), "ts", "value")
    root = staged_path(sf_dir, "ladder_coarse", tables=("events",))
    shutil.rmtree(root, ignore_errors=True)
    ladder = Ladder(root=root, archives=(_FINE, _COARSE), key_cols=("metric",))
    # same observe-on-build now recovery as tsdb_ladder_roundtrip (r16):
    # floor(max es, 600) == the fine level's max(bucket_ts), zero extra jobs
    ob = Observation()
    es = F.unix_timestamp("ts").cast("long")
    build_ladder(pts.observe(ob, F.max(es).alias("hi")), ladder)
    now_ts = int(ob.get["hi"])
    now_ts -= now_ts % _FINE.step_seconds

    fetched = fetch_from_ladder(
        spark,
        ladder,
        metric_glob="*",
        from_ts=now_ts - 20 * 86400,  # beyond fine retention (10 d) → coarse
        until_ts=now_ts - 12 * 86400,
        now_ts=now_ts,
    )
    wide = finalize(fetched)
    return wide.select(
        "metric",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_points"),
        "sum_value",
        "avg_value",
        "min_value",
        "max_value",
    )


_LADDER_COARSE_SQL = f"""
WITH e AS (
  SELECT event_type AS metric, value,
         CAST({_ES} AS BIGINT) AS es,
         CAST(({_ES} // {_COARSE.step_seconds}) * {_COARSE.step_seconds} AS BIGINT)
           AS bucket_ts
  FROM events
),
nowt AS (SELECT MAX(es) AS now_ts FROM e),
bounds AS (
  SELECT ((now_ts - {20 * 86400}) // {_COARSE.step_seconds})
           * {_COARSE.step_seconds} AS lo,
         ((now_ts - {12 * 86400}) // {_COARSE.step_seconds})
           * {_COARSE.step_seconds} AS hi
  FROM nowt
),
agg AS (
  SELECT metric, bucket_ts,
         COUNT(value) AS cnt,
         {QSUM_SQL.format(x="value")} AS sum_value,
         MIN(value) AS min_value,
         MAX(value) AS max_value
  FROM e GROUP BY 1, 2
),
grid AS (
  SELECT CAST(UNNEST(generate_series(lo, hi, {_COARSE.step_seconds})) AS BIGINT)
           AS bucket_ts
  FROM bounds
),
keys AS (SELECT DISTINCT metric FROM e)
SELECT k.metric,
       g.bucket_ts,
       COALESCE(a.cnt, 0) AS n_points,
       CASE WHEN a.cnt > 0 THEN a.sum_value END AS sum_value,
       CASE WHEN a.cnt > 0
            THEN CAST(a.sum_value / a.cnt AS DOUBLE) END AS avg_value,
       CASE WHEN a.cnt > 0 THEN a.min_value END AS min_value,
       CASE WHEN a.cnt > 0 THEN a.max_value END AS max_value
FROM keys k
CROSS JOIN grid g
LEFT JOIN agg a ON a.metric = k.metric AND a.bucket_ts = g.bucket_ts
"""


# --- skew-salted rollup, driver-faced ---------------------------------------

def tsdb_rollup_salted_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew lever driver-faced: level-0 rollup through
    ``rollup_partials_salted`` (pre-aggregate on (metric, salt) so one hot
    metric spreads across reducers, then merge the salted partials). All
    partial state is associative, so the result must be BIT-IDENTICAL to
    the unsalted rollup — the oracle is the plain direct SQL rollup, and a
    hash match proves salting is pure plan shape, not semantics."""
    from kenshin_backup_spark.operators.rollup import (
        finalize as fin,
        rollup_partials_salted,
    )

    ev = load_table(spark, sf_dir, "events")
    parts = rollup_partials_salted(
        ev.select(F.col("event_type").alias("metric"), "ts", "value"),
        key_cols=["metric"],
        step_seconds=3600,
        salt_buckets=8,
    )
    wide = fin(parts)
    return wide.select(
        "metric",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.col("cnt").cast("long").alias("n_points"),
        "sum_value",
        "avg_value",
        "min_value",
        "max_value",
    )


_SALTED_SQL = f"""
WITH e AS (
  SELECT event_type AS metric, value,
         CAST(({_ES} // 3600) * 3600 AS BIGINT) AS bucket_ts
  FROM events
)
SELECT metric, bucket_ts,
       COUNT(value) AS n_points,
       {QSUM_SQL.format(x="value")} AS sum_value,
       CAST({QSUM_SQL.format(x="value")} / COUNT(value) AS DOUBLE) AS avg_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM e GROUP BY 1, 2
"""


# --- policy-driven rollup (S6 → A-family integration) -----------------------

#: Ordered storage-schema config (first match wins), exercising per-policy
#: step AND kernel AND xFilesFactor in one plan. Patterns are un-anchored
#: regexes like carbon's.
_POLICIES = (
    ("errors", "^error", 600, "sum", 0.0),
    ("money", "^purchase", 1800, "max", 0.0),
    ("default", ".*", 3600, "average", 0.0),
)


def tsdb_policy_driven_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup where EACH metric's bucket step and aggregation kernel come
    from its storage-schema policy (the reference's per-schema retentions +
    aggregationMethod applied together): policy assignment is the ordered
    first-match ``when`` chain (``operators/policies.py``), the bucket
    width is a per-row column, and the output value picks the policy's
    kernel from the shared partial state.

    At 100 TB this is ONE scan + ONE hash aggregate keyed
    (metric, bucket): the policy fields are scan-side expressions, so
    heterogeneous retention ladders cost nothing extra over a uniform
    rollup."""
    from kenshin_backup_spark.operators.policies import Policy, assign_policy

    ev = load_table(spark, sf_dir, "events")
    pols = [
        Policy(name=n, pattern=p, steps=(step,), agg=agg, xff=xff)
        for n, p, step, agg, xff in _POLICIES
    ]
    base = assign_policy(
        ev.select(F.col("event_type").alias("metric"), "ts", "value"),
        pols,
        metric_col="metric",
    )
    step = F.lit(None).cast("long")
    agg = F.lit(None).cast("string")
    for n, _, s, a, _x in reversed(_POLICIES):
        step = F.when(F.col("policy") == n, F.lit(s)).otherwise(step)
        agg = F.when(F.col("policy") == n, F.lit(a)).otherwise(agg)
    es = F.unix_timestamp("ts").cast("long")
    with_cfg = base.select(
        "metric",
        "policy",
        step.alias("step_seconds"),
        agg.alias("agg"),
        (es - F.pmod(es, step)).cast("long").alias("bucket_ts"),
        "value",
    )
    parts = with_cfg.groupBy(
        "metric", "policy", "agg", "step_seconds", "bucket_ts"
    ).agg(
        F.count("value").alias("n_points"),
        F.sum(F.floor(F.col("value") * 1_000_000).cast("long")).alias("sum_q"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
    sum_v = (F.col("sum_q") / 1_000_000.0).cast("double")
    value = (
        F.when(F.col("agg") == "sum", sum_v)
        .when(F.col("agg") == "average", (sum_v / F.col("n_points")).cast("double"))
        .when(F.col("agg") == "max", F.col("max_v"))
        .when(F.col("agg") == "min", F.col("min_v"))
    )
    return parts.select(
        "metric",
        "policy",
        F.col("step_seconds").cast("long").alias("step_seconds"),
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.col("n_points").cast("long").alias("n_points"),
        value.cast("double").alias("value"),
    )


def _policy_rollup_sql() -> str:
    policy_case = " ".join(
        f"WHEN regexp_matches(event_type, '{p}') THEN '{n}'"
        for n, p, _s, _a, _x in _POLICIES
    )
    step_case = " ".join(
        f"WHEN policy = '{n}' THEN {s}" for n, _p, s, _a, _x in _POLICIES
    )
    agg_case = " ".join(
        f"WHEN policy = '{n}' THEN '{a}'" for n, _p, _s, a, _x in _POLICIES
    )
    return f"""
WITH base AS (
  SELECT event_type AS metric, value,
         CAST({_ES} AS BIGINT) AS es,
         CASE {policy_case} ELSE 'default' END AS policy
  FROM events
),
cfg AS (
  SELECT metric, value, es, policy,
         CASE {step_case} END AS step_seconds,
         CASE {agg_case} END AS agg
  FROM base
),
parts AS (
  SELECT metric, policy, agg, step_seconds,
         CAST(es - es % step_seconds AS BIGINT) AS bucket_ts,
         COUNT(value) AS n_points,
         SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS sum_q,
         MIN(value) AS min_v,
         MAX(value) AS max_v
  FROM cfg GROUP BY 1, 2, 3, 4, 5
)
SELECT metric, policy,
       CAST(step_seconds AS BIGINT) AS step_seconds,
       bucket_ts,
       CAST(n_points AS BIGINT) AS n_points,
       CAST(CASE agg
              WHEN 'sum' THEN CAST(sum_q AS DOUBLE) / 1000000
              WHEN 'average' THEN (CAST(sum_q AS DOUBLE) / 1000000) / n_points
              WHEN 'max' THEN max_v
              WHEN 'min' THEN min_v
            END AS DOUBLE) AS value
FROM parts
"""


QUERIES = {
    "tsdb_ladder_roundtrip": tsdb_ladder_roundtrip,
    "tsdb_ladder_coarse_fetch": tsdb_ladder_coarse_fetch,
    "tsdb_rollup_salted_1h": tsdb_rollup_salted_1h,
    "tsdb_policy_driven_rollup": tsdb_policy_driven_rollup,
}

ORACLE = {
    "tsdb_ladder_roundtrip": _LADDER_RT_SQL,
    "tsdb_ladder_coarse_fetch": _LADDER_COARSE_SQL,
    "tsdb_rollup_salted_1h": _SALTED_SQL,
    "tsdb_policy_driven_rollup": _policy_rollup_sql(),
}
