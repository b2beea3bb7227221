"""Generic series ingestion / migration (SURVEY.md §2.1 S8).

The reference ships a Whisper→Kenshin file converter; byte-level ``.wsp``
compat is a non-goal (survey), but the *migration story* — "take an
existing store's exported series and load them into this engine" — is
this module: normalize any long-format export (parquet/CSV/JSON, arbitrary
column names, epoch or timestamp time) into the canonical
``(metric, ts, value)`` frame and materialize a rollup ladder from it.

Scale notes (100 TB migration): this is one pass over the export + the
ladder build's cascading aggregates; no driver-side iteration. Exports
arrive in any partition layout; the rollup shuffle re-keys by metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.operators.ladder import Ladder, build_ladder
from kenshin_backup_spark.session import tune


def read_series_export(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "parquet",
    metric_col: str = "metric",
    ts_col: str = "ts",
    value_col: str = "value",
    schema: str | None = None,
    **reader_options,
) -> DataFrame:
    """Load a long-format series export and normalize to the canonical
    ``(metric: string, ts: timestamp, value: double)`` frame.

    Epoch-seconds/millis BIGINT time columns are converted; string metrics
    and numeric values are cast. Rows that fail normalization are dropped
    (the reference converter skips unparseable points the same way).
    """
    tune(spark)
    reader = spark.read.format(fmt)
    if schema:
        reader = reader.schema(schema)
    for k, v in reader_options.items():
        reader = reader.option(k, v)
    df = reader.load(path)

    t = F.col(ts_col)
    ts_type = dict(df.dtypes)[ts_col]
    if ts_type in ("bigint", "int", "long"):
        # heuristic: epoch millis beyond year ~33658 as seconds
        t = F.when(t > F.lit(10_000_000_000), F.timestamp_millis(t)).otherwise(
            F.timestamp_seconds(t)
        )
    elif ts_type == "string":
        t = F.to_timestamp(t)

    out = df.select(
        F.col(metric_col).cast("string").alias("metric"),
        t.alias("ts"),
        F.col(value_col).try_cast("double").alias("value"),
    )
    return out.where(
        F.col("metric").isNotNull() & F.col("ts").isNotNull() & F.col("value").isNotNull()
    )


def migrate_to_ladder(
    spark: SparkSession,
    export_path: str,
    ladder: Ladder,
    *,
    fmt: str = "parquet",
    **normalize_kwargs,
) -> None:
    """One-shot migration: export → canonical frame → materialized ladder
    (all levels, fine→coarse cascade)."""
    points = read_series_export(spark, export_path, fmt=fmt, **normalize_kwargs)
    build_ladder(points, ladder)
