"""SparkSession construction and runtime tuning.

Two entry points:

- :func:`get_spark` — build a session for local runs (tests, bench).
- :func:`tune` — apply the runtime-settable knobs to an *externally owned*
  session (the driver passes its own ``SparkSession`` into ``entry()`` /
  ``queries()``; we must not assume its static config, so everything the
  engine depends on for correctness is set here at runtime).

Correctness-critical: ``spark.sql.session.timeZone=UTC``. The DuckDB oracle
sees parquet timestamps as UTC-naive; Spark interprets them in the session
time zone. Pinning UTC makes ``date_trunc``/``unix_timestamp`` agree with
DuckDB's ``date_trunc``/``epoch`` (SURVEY.md §7 hard-part 6).

Scale notes (100 TB): these local settings mirror what a 1000-executor
cluster deployment would set per-job — AQE on (runtime shuffle coalescing +
skew-join splitting), shuffle partitions sized to ~2-3× total cores,
broadcast threshold sized to the dimension tables.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime-settable confs applied to ANY session the engine touches.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    # Correctness-critical on pyspark 3.5.x (ADVICE r13): the engine's
    # out-of-range-node contract — aliasByNode(x, 9) on a 3-part name
    # raises (python IndexError ↔ Spark INVALID_ARRAY_INDEX) — holds
    # only under ANSI mode. Spark 4 defaults ANSI ON; 3.5 defaults OFF,
    # where element_at silently yields NULL names instead. Pinning it
    # here makes the supported floor behave like the verified 4.x.
    "spark.sql.ansi.enabled": "true",
    # Runtime-settable (unlike most sizing knobs): an externally owned
    # session keeps Spark's default 200, which over-parallelizes local
    # data into 200-task shuffles; match the core count like get_spark
    # does. On a real cluster a deployment sets ~2-3× total cores.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # dims (region/nation/supplier/customer/part) are broadcast-sized at
    # every SF; 64 MB keeps them broadcast even at sf100-equivalent.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The events table has shipped ts as TIMESTAMP(NANOS), timestamp_ntz,
    # and plain TIMESTAMP across driver rounds. Spark rejects NANOS by
    # default; this conf reads it as epoch-nanos BIGINT, and
    # sources.tables.normalize_event_time converts whichever encoding
    # appears to TimestampType at load.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session.

    Idempotent and cheap; every public query entry point calls this so the
    engine behaves identically under the driver's session and our own.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Non-settable in this deployment: keep going; only timeZone is
            # correctness-critical and it is always runtime-settable.
            pass
    return spark


def get_spark(app_name: str = "kenshin_backup_spark") -> SparkSession:
    """Build (or reuse) a local session sized for this container.

    local[N] is a single JVM: ``spark.driver.memory`` is the only memory
    knob. Shuffle partitions match core count — 200 would over-parallelize
    sub-GB local data (and on a real cluster this is set to ~2-3× cores).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/kenshin_spark_warehouse")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)
