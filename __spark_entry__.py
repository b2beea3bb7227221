"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in :mod:`kenshin_backup_spark`; this module is the
thin driver-facing shim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kenshin_backup_spark import queries as _registry
from kenshin_backup_spark.queries.tsdb import tsdb_rollup_1h


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's semantic core end-to-end (SURVEY.md §7
    Phase 0): per-metric 1-hour tumbling rollup over the events stream with
    all five reference agg kernels (average/sum/last/max/min), exact
    (sum,count)-carried averages, and gap-filled fetch grid.
    """
    return tsdb_rollup_1h(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query; approximate operators
    (LSH) are intentionally omitted → rows-only checks."""
    return _registry.oracle_sql()
