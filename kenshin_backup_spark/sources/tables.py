"""Parquet table loaders for the driver-generated testdata.

The driver testdata is a TPC-H-ish star schema plus an ``events`` stream
table and LLM-pipeline fixtures (``documents``, ``embeddings``); schemas are
documented in FIXTURES.md (verified from parquet footers).

Scale notes (100 TB): ``spark.read.parquet`` gives the vectorized reader,
predicate pushdown, and column pruning for free. At production scale the
fact tables would be written partitioned by date and bucketed by their join
key (SURVEY.md §4.2); the loaders here read whatever layout exists and rely
on Catalyst pruning — the query code never assumes physical layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from kenshin_backup_spark.session import tune

#: Every table the driver materializes per scale factor (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at every scale factor.
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; applies engine runtime confs first."""
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_time(df)
    return df


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the event-time column to TimestampType regardless of how
    the parquet writer encoded it. The testdata's encoding has changed
    between driver rounds, so all three observed encodings are handled:

    - TIMESTAMP(NANOS) surfaces as epoch-nanos BIGINT under
      ``spark.sql.legacy.parquet.nanosAsLong``; integer DIV keeps full
      precision (ns values exceed double's 2^53).
    - plain ``timestamp[us]`` (isAdjustedToUTC=false) reads as
      TIMESTAMP_NTZ under Spark 4's ``inferTimestampNTZ`` default; with the
      session tz pinned to UTC the cast to TIMESTAMP is value-preserving.
      (``withWatermark`` rejects NTZ event time, so this is load-bearing
      for the streaming path, not a cosmetic cast.)
    - TIMESTAMP (LTZ) passes through untouched.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(col, F.expr(f"timestamp_micros({col} DIV 1000)"))
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register all testdata tables as temp views (for the SQL surface)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
