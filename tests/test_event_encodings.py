"""The testdata's events.ts parquet encoding has changed between driver
rounds (TIMESTAMP(NANOS) in r1 → plain timestamp[us]/NTZ in r2, which broke
``withWatermark`` and with it the whole round-2 bench). These tests pin the
loader contract: batch AND watermarked-streaming rollups produce identical
results for every encoding the testdata has ever shipped —

- TIMESTAMP(NANOS)   (reads as BIGINT under nanosAsLong)
- timestamp[us] NTZ  (isAdjustedToUTC=false → TIMESTAMP_NTZ in Spark 4)
- timestamp[us] UTC  (isAdjustedToUTC=true → TIMESTAMP)

so the next encoding flip is a no-op instead of a lost round.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kenshin_backup_spark.sources.tables import normalize_event_time

ENCODINGS = ("nanos", "ntz", "utc")

_BASE = dt.datetime(2024, 3, 1, 0, 0, 0)


def _rows():
    out = []
    for i in range(200):
        out.append(
            {
                "event_id": i,
                "ts": _BASE + dt.timedelta(seconds=137 * i),
                "user_id": i % 7,
                "event_type": ["click", "view", "purchase"][i % 3],
                "value": float(i) / 4.0,
                "props": "{}",
            }
        )
    return out


def _write_events(dirpath, encoding: str) -> str:
    """Write events.parquet under ``dirpath`` with the given ts encoding;
    returns the sf_dir-shaped directory (so load_table/_events_stream read
    it exactly like the driver testdata)."""
    rows = _rows()
    ts_type = {
        "nanos": pa.timestamp("ns"),
        "ntz": pa.timestamp("us"),
        "utc": pa.timestamp("us", tz="UTC"),
    }[encoding]
    table = pa.table(
        {
            "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
            "ts": pa.array([r["ts"] for r in rows]).cast(ts_type),
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
            "value": pa.array([r["value"] for r in rows], pa.float64()),
            "props": pa.array([r["props"] for r in rows], pa.string()),
        }
    )
    # version 2.6 preserves nanosecond TIMESTAMP(NANOS) physical encoding
    pq.write_table(table, f"{dirpath}/events.parquet", version="2.6")
    return str(dirpath)


def _footer_type(path: str) -> str:
    return str(pq.read_schema(path).field("ts").type)


def test_encodings_actually_differ(tmp_path):
    """Sanity: the three writers produce three distinct physical encodings
    (otherwise the parametrization below tests nothing)."""
    seen = set()
    for enc in ENCODINGS:
        d = tmp_path / enc
        d.mkdir()
        _write_events(d, enc)
        seen.add(_footer_type(f"{d}/events.parquet"))
    assert seen == {"timestamp[ns]", "timestamp[us]", "timestamp[us, tz=UTC]"}


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_batch_load_normalizes_ts(spark, tmp_path, encoding):
    from kenshin_backup_spark.sources import load_table

    sf_dir = _write_events(tmp_path, encoding)
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # value-preserving: first event is exactly the base instant (UTC tz)
    first = df.orderBy("event_id").select("ts").first()[0]
    assert first.replace(tzinfo=None) == _BASE


@pytest.fixture(scope="module")
def _batch_expected(spark, tmp_path_factory):
    """Reference rollup computed from the UTC encoding via the batch path."""
    from kenshin_backup_spark.queries.streaming_q import streaming_rollup_1h

    d = tmp_path_factory.mktemp("enc_ref")
    sf_dir = _write_events(d, "utc")
    return sorted(
        tuple(r) for r in streaming_rollup_1h(spark, sf_dir).collect()
    )


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_streaming_watermark_rollup_every_encoding(
    spark, tmp_path, encoding, _batch_expected
):
    """The round-2 regression, pinned: a watermarked streaming rollup must
    run (withWatermark accepts the normalized ts) and produce the same
    result for every encoding."""
    from kenshin_backup_spark.queries.streaming_q import streaming_rollup_1h

    sf_dir = _write_events(tmp_path, encoding)
    got = sorted(tuple(r) for r in streaming_rollup_1h(spark, sf_dir).collect())
    assert len(got) > 0
    assert got == _batch_expected


def test_normalize_event_time_passthrough(spark):
    """Non-ts frames and already-TIMESTAMP frames pass through unchanged."""
    df = spark.range(3).selectExpr("id", "timestamp_seconds(id) AS ts")
    out = normalize_event_time(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    df2 = spark.range(3)
    assert normalize_event_time(df2).columns == ["id"]


def test_all_tables_load_with_no_ntz_columns(spark):
    """load_table normalizes every TIMESTAMP_NTZ column (any table) to
    TIMESTAMP — orders/lineitem date columns have also flipped encodings
    between rounds."""
    from kenshin_backup_spark.sources import TABLES, load_table

    for t in TABLES:
        df = load_table(spark, "/root/testdata/sf0.001", t)
        ntz = [c for c, ty in df.dtypes if ty == "timestamp_ntz"]
        assert ntz == [], f"{t}: {ntz}"
