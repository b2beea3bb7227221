"""Batch-40 queries (round 4): byte-level wire/file format round-trips.

These upgrade the two survey rows that were "partial by design" to real
byte-format support, each proven by an oracle-checked round-trip (the
DuckDB oracle computes the same aggregate straight from the parquet
events, so a hash match proves the bytes lost nothing):

- ``source_whisper_roundtrip`` (S8) — hourly per-metric averages are
  written into REAL whisper ``.wsp`` ring-buffer files (one per metric,
  written inside ``applyInPandas`` — the per-metric-file layout whisper
  itself mandates), read back with the ``binaryFile`` + ``mapInPandas``
  migration reader, and re-emitted. IEEE f64 bytes round-trip exactly.
- ``source_pickle_batches`` (S2) — RAW event points travel through the
  carbon pickle batch codec (length-prefixed multi-message streams,
  ≤1000 points per message) and are aggregated only after decode, so the
  full raw fidelity of the wire format is what the oracle checks.

At 100 TB: both readers parallelize over files with zero driver
involvement (a whisper store is millions of per-metric files — exactly
the binaryFile unit of work). The fixture WRITERS group by metric
because the formats are per-metric by definition; a migration at scale
runs the read direction, which has no such grouping.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kenshin_backup_spark.functions.deterministic import (
    EPOCH_S_SQL,
    QAVG_SQL,
    QSUM_SQL,
)
from kenshin_backup_spark.sources import load_table
from kenshin_backup_spark.sources.pickle_proto import (
    encode_batches,
    read_pickle_batches,
    write_pickle_files,
)
from kenshin_backup_spark.sources.tables import staged_path
from kenshin_backup_spark.sources.whisper import read_whisper, write_wsp

_ES = EPOCH_S_SQL.format(x="ts")
_STEP = 3600


def source_whisper_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly averages → real ``.wsp`` bytes → migration reader → the
    same averages (S8 round-trip; see module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts").cast("long")
    hourly = (
        ev.select(
            F.col("event_type").alias("metric"),
            ((es / _STEP).cast("long") * _STEP).alias("bucket_ts"),
            "value",
        )
        .groupBy("metric", "bucket_ts")
        .agg(
            (
                (F.sum(F.floor(F.col("value") * 1000000).cast("long")) / F.lit(1e6))
                / F.count("value")
            )
            .cast("double")
            .alias("avg_value")
        )
    )
    stage = staged_path(sf_dir, "wsp_rt", tables=("events",))

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        metric = pdf["metric"].iloc[0]
        import os

        os.makedirs(stage, exist_ok=True)
        n = write_wsp(
            os.path.join(stage, f"{metric}.wsp"),
            zip(pdf["bucket_ts"], pdf["avg_value"]),
            step=_STEP,
        )
        return pd.DataFrame({"metric": [metric], "n_slots": [n]})

    # materialize the fixture files (bounded: metrics × slots rows)
    hourly.groupBy("metric").applyInPandas(
        _write, "metric string, n_slots long"
    ).count()

    return read_whisper(spark, f"{stage}/*.wsp").select(
        "metric",
        F.col("ts").cast("long").alias("bucket_ts"),
        F.col("value").alias("avg_value"),
    )


_WSP_SQL = f"""
SELECT event_type AS metric,
       CAST(({_ES} // {_STEP}) * {_STEP} AS BIGINT) AS bucket_ts,
       {QAVG_SQL.format(x="value")} AS avg_value
FROM events GROUP BY 1, 2
"""


def source_pickle_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw points → carbon pickle batch streams → decode → hourly rollup
    (S2 round-trip; the aggregate happens AFTER decode so the oracle
    checks the codec's raw fidelity)."""
    ev = load_table(spark, sf_dir, "events")
    raw = ev.select(
        F.col("event_type").alias("metric"),
        F.unix_timestamp("ts").cast("long").alias("ts"),
        "value",
    )
    stage = staged_path(sf_dir, "pickle_rt", tables=("events",))

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        metric = pdf["metric"].iloc[0]
        pdf = pdf.sort_values(["ts", "value"])
        payload = encode_batches(
            zip(pdf["metric"], pdf["ts"], pdf["value"]), batch_size=1000
        )
        write_pickle_files(stage, metric, payload)
        return pd.DataFrame({"metric": [metric], "n_points": [len(pdf)]})

    raw.groupBy("metric").applyInPandas(
        _write, "metric string, n_points long"
    ).count()

    decoded = read_pickle_batches(spark, f"{stage}/*.pkl")
    bucket = ((F.col("ts") / _STEP).cast("long") * _STEP).alias("bucket_ts")
    return decoded.groupBy("metric", bucket).agg(
        F.count(F.lit(1)).alias("n_points"),
        (F.sum(F.floor(F.col("value") * 1000000).cast("long")) / F.lit(1e6))
        .cast("double")
        .alias("sum_value"),
    )


_PICKLE_SQL = f"""
SELECT event_type AS metric,
       CAST(({_ES} // {_STEP}) * {_STEP} AS BIGINT) AS bucket_ts,
       COUNT(*) AS n_points,
       {QSUM_SQL.format(x="value")} AS sum_value
FROM events GROUP BY 1, 2
"""


def source_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw points → hand-written Avro Object Container Files → parallel
    ``binaryFile``+``mapInPandas`` decode → hourly rollup (round-5: the
    Avro FORMAT half of the Kafka/Avro production transport, implemented
    from the published OCF spec like the r4 whisper/pickle codecs; the
    broker transport itself stays environment-gated). The aggregate runs
    AFTER decode, so the oracle checks the codec's raw f64/varint
    fidelity. No independent Avro implementation exists in this container
    (no fastavro/avro/duckdb-avro), so cross-engine validation is the
    same semantic-fidelity standard as the whisper row; the byte layout
    is additionally pinned structurally in tests/test_whisper_pickle.py."""
    from kenshin_backup_spark.sources.avro_codec import (
        encode_container,
        read_avro_points,
        write_avro_files,
    )

    ev = load_table(spark, sf_dir, "events")
    raw = ev.select(
        F.col("event_type").alias("metric"),
        F.unix_timestamp("ts").cast("long").alias("ts"),
        "value",
    )
    stage = staged_path(sf_dir, "avro_rt", tables=("events",))

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        # one container file per metric = many files = the segment-dump
        # layout the parallel reader targets; deterministic row order so
        # the staged bytes are reproducible under the fingerprint key
        metric = pdf["metric"].iloc[0]
        pdf = pdf.sort_values(["ts", "value"])
        payload = encode_container(
            zip(pdf["metric"], pdf["ts"], pdf["value"]), block_size=1000
        )
        write_avro_files(stage, metric, payload)
        return pd.DataFrame({"metric": [metric], "n_points": [len(pdf)]})

    raw.groupBy("metric").applyInPandas(
        _write, "metric string, n_points long"
    ).count()

    decoded = read_avro_points(spark, f"{stage}/*.avro")
    bucket = ((F.col("ts") / _STEP).cast("long") * _STEP).alias("bucket_ts")
    return decoded.groupBy("metric", bucket).agg(
        F.count(F.lit(1)).alias("n_points"),
        (F.sum(F.floor(F.col("value") * 1000000).cast("long")) / F.lit(1e6))
        .cast("double")
        .alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


_AVRO_SQL = f"""
SELECT event_type AS metric,
       CAST(({_ES} // {_STEP}) * {_STEP} AS BIGINT) AS bucket_ts,
       COUNT(*) AS n_points,
       {QSUM_SQL.format(x="value")} AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events GROUP BY 1, 2
"""


def streaming_avro_ingest_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Kafka-archive replay shape end-to-end: per-metric Avro OCF
    segment files → STREAMING ``binaryFile`` ingest with
    ``maxFilesPerTrigger=2`` backpressure (several micro-batches; files
    arrive whole-metric, i.e. massively out of event-time order across
    batches, so the watermark horizon spans the corpus like the
    update-sink query) → micro-batch decode in ``mapInPandas`` → 1h
    tumbling rollup, complete mode → finalize. Oracle = the direct batch
    rollup, so one hash certifies the streaming transport, the codec
    under micro-batch replay order, and the rollup math together."""
    from kenshin_backup_spark.sources.avro_codec import (
        encode_container,
        read_avro_stream,
        write_avro_files,
    )
    from kenshin_backup_spark.streaming.ingest import (
        run_stream_to_memory,
        streaming_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    raw = ev.select(
        F.col("event_type").alias("metric"),
        F.unix_timestamp("ts").cast("long").alias("ts"),
        "value",
    )
    stage = staged_path(sf_dir, "avro_stream", tables=("events",))

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        metric = pdf["metric"].iloc[0]
        pdf = pdf.sort_values(["ts", "value"])
        write_avro_files(
            stage,
            metric,
            encode_container(zip(pdf["metric"], pdf["ts"], pdf["value"])),
        )
        return pd.DataFrame({"metric": [metric], "n_points": [len(pdf)]})

    raw.groupBy("metric").applyInPandas(
        _write, "metric string, n_points long"
    ).count()

    stream = read_avro_stream(spark, stage, max_files_per_trigger=2)
    rolled = streaming_rollup(
        stream, key_col="metric", step_seconds=_STEP, watermark="3650 days"
    )
    out = run_stream_to_memory(spark, rolled, output_mode="complete")
    from kenshin_backup_spark.operators.rollup import finalize

    wide = finalize(out)
    return wide.select(
        "metric",
        F.col("bucket_ts").cast("long").alias("bucket_ts"),
        F.col("cnt").cast("long").alias("n_points"),
        "sum_value",
        "avg_value",
        "min_value",
        "max_value",
        "last_value",
    )


_AVRO_STREAM_SQL = f"""
WITH e AS (
  SELECT event_type AS metric, value,
         CAST({_ES} AS BIGINT) AS es,
         CAST(({_ES} // {_STEP}) * {_STEP} AS BIGINT) AS bucket_ts
  FROM events
),
agg AS (
  SELECT metric, bucket_ts,
         COUNT(value) AS n_points,
         {QSUM_SQL.format(x="value")} AS sum_value,
         {QAVG_SQL.format(x="value")} AS avg_value,
         MIN(value) AS min_value,
         MAX(value) AS max_value
  FROM e GROUP BY 1, 2
),
lastv AS (
  SELECT metric, bucket_ts, value AS last_value FROM (
    SELECT metric, bucket_ts, value,
           ROW_NUMBER() OVER (PARTITION BY metric, bucket_ts
                              ORDER BY es DESC, value DESC) AS rn
    FROM e
  ) WHERE rn = 1
)
SELECT a.metric, a.bucket_ts, a.n_points, a.sum_value, a.avg_value,
       a.min_value, a.max_value, l.last_value
FROM agg a JOIN lastv l USING (metric, bucket_ts)
"""


QUERIES = {
    "source_whisper_roundtrip": source_whisper_roundtrip,
    "source_pickle_batches": source_pickle_batches,
    "source_avro_roundtrip": source_avro_roundtrip,
    "streaming_avro_ingest_rollup": streaming_avro_ingest_rollup,
}

ORACLE = {
    "source_whisper_roundtrip": _WSP_SQL,
    "source_pickle_batches": _PICKLE_SQL,
    "source_avro_roundtrip": _AVRO_SQL,
    "streaming_avro_ingest_rollup": _AVRO_STREAM_SQL,
}
