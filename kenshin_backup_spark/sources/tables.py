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
    # TIMESTAMP(NANOS) columns surface as epoch-nanos BIGINT under
    # spark.sql.legacy.parquet.nanosAsLong: convert to TimestampType (µs).
    # Integer DIV keeps full precision (ns values exceed double's 2^53).
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register all testdata tables as temp views (for the SQL surface)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
