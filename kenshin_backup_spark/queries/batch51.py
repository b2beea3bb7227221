"""Batch-51 queries (round 4): histogram shard-merge proof and malformed
CSV ingestion.

- ``tsdb_histogram_shard_merge`` — proves the mergeability claim the
  histogram-percentile operator's scale story rests on: build per-shard
  histograms (user_id mod 8 as the shard key), merge them by integer
  addition, interpolate p95 from the MERGED counts — and the oracle
  computes the same p95 from a single global histogram. Hash equality =
  shard-merge ≡ global, the property that lets 1000 executors aggregate
  histograms locally and ship only bucket counts. (Same pattern as
  ``tsdb_rollup_salted_1h``: the oracle is the unsharded computation.)
- ``source_csv_malformed_handling`` — schema-on-read robustness: a
  staged CSV export with deliberately corrupted rows (every 100th line)
  is read back in PERMISSIVE mode with a ``_corrupt_record`` column; the
  report counts clean vs corrupt rows and aggregates only the clean
  ones. The oracle recomputes from parquet, excluding exactly the rows
  corrupted by construction — equality proves the reader neither drops
  good rows nor leaks bad ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import EPOCH_S_SQL, QSUM_SQL
from kenshin_backup_spark.queries.batch39 import _LE, _PCT
from kenshin_backup_spark.sources import load_table
from kenshin_backup_spark.sources.tables import staged_path

_ES = EPOCH_S_SQL.format(x="ts")


def tsdb_histogram_shard_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p95 from per-shard histograms merged by integer addition — must
    equal the single-pass global histogram (the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    idx = F.lit(0)
    for b in _LE:
        idx = idx + F.when(F.col("value") > b, 1).otherwise(0)
    per_shard = (
        ev.select(
            "event_type",
            F.pmod(F.col("user_id"), F.lit(8)).alias("shard"),
            idx.alias("b"),
        )
        .groupBy("event_type", "shard", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # the merge step: pure integer addition of shard histograms
    merged = per_shard.groupBy("event_type", "b").agg(
        F.sum("cnt").alias("cnt")
    )
    w_cum = (
        W.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = merged.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "total", F.sum("cnt").over(W.partitionBy("event_type"))
    )
    target = F.lit(_PCT) * F.col("total").cast("double")
    hit = cum.where(F.col("cum").cast("double") >= target)
    first = (
        hit.withColumn(
            "rn", F.row_number().over(W.partitionBy("event_type").orderBy("b"))
        )
        .where(F.col("rn") == 1)
    )
    bounds = F.array(*[F.lit(float(b)) for b in _LE])
    lo = F.when(F.col("b") == 0, F.lit(0.0)).otherwise(
        F.element_at(bounds, F.col("b").cast("int"))
    )
    hi = F.when(F.col("b") >= len(_LE), F.element_at(bounds, len(_LE))).otherwise(
        F.element_at(bounds, F.col("b").cast("int") + 1)
    )
    prev_cum = (F.col("cum") - F.col("cnt")).cast("double")
    interp = lo + (hi - lo) * (target - prev_cum) / F.col("cnt").cast("double")
    p95 = F.when(F.col("b") >= len(_LE), F.element_at(bounds, len(_LE))).otherwise(
        interp
    )
    return first.select(
        "event_type",
        F.col("total").cast("long").alias("n_samples"),
        F.col("b").cast("long").alias("bucket_idx"),
        p95.alias("p95_interp"),
    )


_LE_SQL = ", ".join(str(b) for b in _LE)

#: oracle: the UNSHARDED global histogram (merge ≡ global is the claim)
_SHARD_MERGE_SQL = f"""
WITH le AS (SELECT [{_LE_SQL}] AS bounds),
tagged AS (
  SELECT event_type, len(list_filter(bounds, x -> value > x)) AS b
  FROM events CROSS JOIN le
),
counts AS (SELECT event_type, b, COUNT(*) AS cnt FROM tagged GROUP BY 1, 2),
cum AS (
  SELECT event_type, b, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY b
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS total
  FROM counts
),
first_hit AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY b) AS rn
    FROM cum
    WHERE CAST(cum AS DOUBLE)
          >= CAST({_PCT} AS DOUBLE) * CAST(total AS DOUBLE)
  ) WHERE rn = 1
)
SELECT event_type,
       CAST(total AS BIGINT) AS n_samples,
       CAST(b AS BIGINT) AS bucket_idx,
       CASE WHEN b >= {len(_LE)} THEN CAST(bounds[{len(_LE)}] AS DOUBLE)
            ELSE (CASE WHEN b = 0 THEN CAST(0 AS DOUBLE)
                       ELSE CAST(bounds[b] AS DOUBLE) END)
                 + (CASE WHEN b >= {len(_LE)}
                         THEN CAST(bounds[{len(_LE)}] AS DOUBLE)
                         ELSE CAST(bounds[b + 1] AS DOUBLE) END
                    - CASE WHEN b = 0 THEN CAST(0 AS DOUBLE)
                           ELSE CAST(bounds[b] AS DOUBLE) END)
                   * (CAST({_PCT} AS DOUBLE) * CAST(total AS DOUBLE)
                      - CAST(cum - cnt AS DOUBLE))
                   / CAST(cnt AS DOUBLE)
       END AS p95_interp
FROM first_hit CROSS JOIN le
"""


def source_csv_malformed_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export events as CSV with every 100th row corrupted, read back in
    PERMISSIVE mode, report clean/corrupt counts + clean-row rollup."""
    import os

    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    # corrupt rows deterministically: event_id % 100 == 0 rows become a
    # garbage line with too few, non-numeric fields
    line = F.when(
        F.col("event_id") % 100 == 0, F.lit("###corrupt###,not-a-number")
    ).otherwise(
        F.concat_ws(
            ",",
            F.col("event_id").cast("string"),
            F.col("event_type"),
            es.cast("string"),
            F.col("value").cast("string"),
        )
    )
    stage = staged_path(sf_dir, "csv_malformed", tables=("events",))
    ev.select(line.alias("value")).write.mode("overwrite").text(stage)
    schema = (
        "event_id long, event_type string, es long, value double, "
        "_corrupt_record string"
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(stage)
    )
    # A malformed row surfaces EITHER via _corrupt_record OR as a silent
    # null-fill of the unparseable required key (Spark's PERMISSIVE mode
    # null-fills failed fields without marking short rows corrupt) — a
    # robust ingestion gate checks both.
    corrupt = (
        F.col("_corrupt_record").isNotNull() | F.col("event_id").isNull()
    ).cast("int")
    return back.groupBy("event_type").agg(
        F.sum(F.lit(1) - corrupt).cast("long").alias("n_clean"),
        F.sum(corrupt).cast("long").alias("n_corrupt"),
        (
            F.sum(
                F.when(
                    corrupt == 0,
                    F.floor(F.col("value") * 1000000).cast("long"),
                ).otherwise(0)
            )
            / F.lit(1e6)
        )
        .cast("double")
        .alias("sum_value"),
    )


#: corrupt lines parse event_type as 'not-a-number'? No: the corrupt line
#: has 2 fields; field 2 lands in event_type. The oracle mirrors the
#: grouping: corrupt rows surface under event_type 'not-a-number'.
_CSV_MAL_SQL = f"""
WITH tagged AS (
  SELECT CASE WHEN event_id % 100 = 0 THEN 'not-a-number'
              ELSE event_type END AS event_type,
         CASE WHEN event_id % 100 = 0 THEN 1 ELSE 0 END AS corrupt,
         value
  FROM events
)
SELECT event_type,
       CAST(SUM(1 - corrupt) AS BIGINT) AS n_clean,
       CAST(SUM(corrupt) AS BIGINT) AS n_corrupt,
       CAST(CAST(SUM(CASE WHEN corrupt = 0
                          THEN CAST(FLOOR(value * 1000000) AS BIGINT)
                          ELSE 0 END) AS DOUBLE) / 1000000 AS DOUBLE)
         AS sum_value
FROM tagged GROUP BY 1
"""


QUERIES = {
    "tsdb_histogram_shard_merge": tsdb_histogram_shard_merge,
    "source_csv_malformed_handling": source_csv_malformed_handling,
}

ORACLE = {
    "tsdb_histogram_shard_merge": _SHARD_MERGE_SQL,
    "source_csv_malformed_handling": _CSV_MAL_SQL,
}
