"""Driver-facing query registry.

Each submodule exposes ``QUERIES: dict[name -> (spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[name -> DuckDB SQL]``. The driver runs both sides at
sf0.01 and compares row-count + schema + order-insensitive value hash, so:

- every computed column is aliased identically in both engines;
- output columns are restricted to STRING / BIGINT / DOUBLE;
- float aggregations use the quantized-exact helpers in
  :mod:`kenshin_backup_spark.functions.deterministic` on BOTH sides;
- queries with no ORACLE entry are approximate/streaming ops the driver
  checks rows-only (``__spark_entry__.py`` contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kenshin_backup_spark.queries import (
    advanced,
    batch4,
    batch5,
    batch6,
    batch7,
    batch8,
    batch9,
    batch10,
    batch11,
    batch12,
    batch13,
    batch14,
    batch15,
    batch16,
    batch17,
    batch18,
    batch19,
    batch20,
    batch21,
    llm,
    relational,
    relational2,
    streaming_q,
    tsdb,
)

_MODULES = (
    tsdb,
    relational,
    llm,
    streaming_q,
    advanced,
    relational2,
    batch4,
    batch5,
    batch6,
    batch7,
    batch8,
    batch9,
    batch10,
    batch11,
    batch12,
    batch13,
    batch14,
    batch15,
    batch16,
    batch17,
    batch18,
    batch19,
    batch20,
    batch21,
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
