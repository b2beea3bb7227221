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
    return normalize_ntz(df)


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to TIMESTAMP (session tz is pinned
    UTC, so the cast is value-preserving). The testdata's temporal columns
    have flipped physical encoding between driver rounds (ms → us/NTZ);
    most functions treat NTZ/LTZ alike under UTC, but event-time APIs
    (withWatermark) and interval arithmetic do not — normalizing at load
    makes every downstream operator encoding-agnostic."""
    from pyspark.sql import functions as F

    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
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


def staging_fingerprint(
    sf_dir: str, tables: tuple[str, ...] = ("events", "orders", "lineitem")
) -> str:
    """Content fingerprint of the source tables a /tmp staging copy derives
    from. The driver REGENERATES testdata between rounds at the same paths;
    a staging dir keyed only by path would silently replay last round's
    data. Keying the dir by (size, mtime_ns) of the sources makes every
    regeneration a cache miss."""
    import hashlib

    parts = []
    for t in tables:
        st = os.stat(f"{sf_dir}/{t}.parquet")
        parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def staged_path(
    sf_dir: str,
    tag: str,
    *,
    base: str = "/tmp/kenshin_stage",
    tables: tuple[str, ...] = ("events", "orders", "lineitem"),
) -> str:
    """Fingerprint-keyed staging directory for derived /tmp copies of the
    testdata, with stale-generation reaping: siblings carrying the same
    ``tag`` but an old fingerprint (left behind by a prior testdata
    regeneration) are deleted, so staging disk stays bounded across driver
    rounds instead of growing one copy per regeneration."""
    import glob
    import shutil

    safe = sf_dir.strip("/").replace("/", "_")
    parent = f"{base}/{safe}"
    path = f"{parent}/{tag}_{staging_fingerprint(sf_dir, tables=tables)}"
    for stale in glob.glob(f"{parent}/{tag}_*"):
        if stale != path:
            shutil.rmtree(stale, ignore_errors=True)
    return path


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register all testdata tables as temp views (for the SQL surface)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
