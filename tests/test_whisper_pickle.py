"""Byte-level codec tests: whisper ring buffers and carbon pickle frames
(SURVEY.md §2.1 S8/S2). Pure-python first (exact byte semantics), then
the Spark readers over real files."""

from __future__ import annotations

import struct

import pytest

from kenshin_backup_spark.sources.pickle_proto import (
    decode_stream,
    encode_batches,
)
from kenshin_backup_spark.sources.whisper import (
    ARCHIVE_INFO,
    METADATA,
    POINT,
    decode_wsp,
    read_whisper,
    wsp_info,
    write_wsp,
)


def test_wsp_write_read_exact(tmp_path):
    pts = [(1000 * 3600 + i * 3600, 1.5 * i + 0.1) for i in range(10)]
    path = str(tmp_path / "m.wsp")
    n = write_wsp(path, pts, step=3600)
    assert n == 10
    with open(path, "rb") as f:
        rows = sorted(decode_wsp(f.read()))
    assert [(ts, v) for _, _, ts, v in rows] == pts  # IEEE-exact round-trip


def test_wsp_slot_alignment_and_last_write_wins(tmp_path):
    path = str(tmp_path / "m.wsp")
    # two points land in the same 60s slot: the later write wins
    write_wsp(path, [(120, 1.0), (130, 2.0), (180, 3.0)], step=60)
    with open(path, "rb") as f:
        rows = sorted(decode_wsp(f.read()))
    assert [(ts, v) for _, _, ts, v in rows] == [(120, 2.0), (180, 3.0)]


def test_wsp_ring_wraparound(tmp_path):
    path = str(tmp_path / "m.wsp")
    # capacity 3, 5 sequential slots: the final ring holds the last 3
    # (wrapping overwrites the oldest), which is whisper's semantics
    write_wsp(
        path, [(600 + i * 60, float(i)) for i in range(5)], step=60, capacity=3
    )
    with open(path, "rb") as f:
        rows = sorted(decode_wsp(f.read()))
    assert [(ts, v) for _, _, ts, v in rows] == [
        (720, 2.0),
        (780, 3.0),
        (840, 4.0),
    ]


def test_wsp_info_header(tmp_path):
    path = str(tmp_path / "m.wsp")
    write_wsp(path, [(60, 1.0), (120, 2.0)], step=60, agg="max", xff=0.25)
    with open(path, "rb") as f:
        info = wsp_info(f.read())
    assert info["aggregation"] == "max"
    assert info["xff"] == 0.25
    assert info["archives"] == [(60, 2)]
    assert info["max_retention"] == 120


def test_wsp_multi_archive_decode():
    """The reader handles N archives generically (the writer emits one;
    real whisper files carry several — build one by hand)."""
    header = METADATA.pack(1, 7200, 0.5, 2)
    a1_off = METADATA.size + 2 * ARCHIVE_INFO.size
    a2_off = a1_off + 2 * POINT.size
    archives = ARCHIVE_INFO.pack(a1_off, 60, 2) + ARCHIVE_INFO.pack(a2_off, 3600, 1)
    pts = POINT.pack(60, 1.5) + POINT.pack(120, 2.5) + POINT.pack(3600, 4.0)
    rows = sorted(decode_wsp(header + archives + pts))
    assert rows == [(0, 60, 60, 1.5), (0, 60, 120, 2.5), (1, 3600, 3600, 4.0)]


def test_wsp_empty_slots_skipped(tmp_path):
    path = str(tmp_path / "m.wsp")
    # first and sixth slot written, capacity spans 6 — the 4 middle slots
    # keep interval=0 (whisper's never-written marker) and must not
    # surface. (Epoch 0 itself is unrepresentable in whisper for the same
    # reason — the format reserves interval 0 for emptiness.)
    write_wsp(path, [(600, 1.0), (900, 2.0)], step=60)
    with open(path, "rb") as f:
        rows = list(decode_wsp(f.read()))
    assert sorted(rows) == [(0, 60, 600, 1.0), (0, 60, 900, 2.0)]


def test_pickle_codec_round_trip_multi_message():
    rows = [(f"m{i % 3}", 1000 + i, 0.1 * i) for i in range(2500)]
    blob = encode_batches(rows, batch_size=1000)
    # 2500 points at ≤1000/message → 3 length-prefixed frames
    n_frames = 0
    off = 0
    while off < len(blob):
        (size,) = struct.unpack_from(">L", blob, off)
        off += 4 + size
        n_frames += 1
    assert n_frames == 3
    back = list(decode_stream(blob))
    assert back == [(m, ts, float(v)) for m, ts, v in rows]  # exact


def test_pickle_truncated_frame_raises():
    blob = encode_batches([("m", 1, 1.0)])
    with pytest.raises(ValueError):
        list(decode_stream(blob[:-1]))
    with pytest.raises(ValueError):
        list(decode_stream(blob + b"\x00\x00"))


def test_read_whisper_spark(spark, tmp_path):
    for metric, base in (("cpu", 3600), ("mem", 7200)):
        write_wsp(
            str(tmp_path / f"{metric}.wsp"),
            [(base + i * 3600, float(i)) for i in range(4)],
            step=3600,
        )
    df = read_whisper(spark, str(tmp_path / "*.wsp"))
    out = {(r.metric, r.ts): r.value for r in df.collect()}
    assert len(out) == 8
    assert out[("cpu", 3600)] == 0.0
    assert out[("mem", 7200 + 3 * 3600)] == 3.0


# --- Avro OCF codec (round 5) ----------------------------------------------


def test_avro_round_trip_exact():
    from kenshin_backup_spark.sources.avro_codec import (
        decode_container,
        encode_container,
    )

    rows = [("evt.click;dc=east", 1_000 + i, i * 0.125) for i in range(2_500)]
    rows += [("neg", -5, -1e300), ("big", 2**40, 6.02e23), ("zero", 0, -0.0)]
    enc = encode_container(rows, block_size=700)
    back = list(decode_container(enc))
    assert back == [(m, int(t), float(v)) for m, t, v in rows]


def test_avro_header_layout():
    """Structural pin of the OCF spec parts: magic, metadata map with
    schema+codec, 16-byte sync marker repeated after each block."""
    from kenshin_backup_spark.sources.avro_codec import (
        AVRO_MAGIC,
        encode_container,
    )

    enc = encode_container([("m", 1, 1.0)], block_size=10)
    assert enc[:4] == AVRO_MAGIC
    assert b"avro.schema" in enc and b"avro.codec" in enc and b"null" in enc
    assert b'"name":"MetricPoint"' in enc
    # one data block => the 16-byte sync marker appears exactly twice
    # (end of header, end of block)
    marker = enc[-16:]
    assert enc.count(marker) == 2


def test_avro_empty_and_block_boundary():
    from kenshin_backup_spark.sources.avro_codec import (
        decode_container,
        encode_container,
    )

    assert list(decode_container(encode_container([]))) == []
    # exactly one full block
    rows = [("m", i, float(i)) for i in range(1000)]
    assert len(list(decode_container(encode_container(rows, block_size=1000)))) == 1000


def test_avro_corruption_raises():
    from kenshin_backup_spark.sources.avro_codec import (
        decode_container,
        encode_container,
    )

    enc = encode_container([("m", i, float(i)) for i in range(50)])
    with pytest.raises(ValueError):
        list(decode_container(enc[:-8]))  # truncated final block
    with pytest.raises(ValueError):
        list(decode_container(b"Nope" + enc[4:]))  # bad magic
    with pytest.raises(ValueError):
        list(decode_container(enc.replace(b"null", b"flat")))  # codec
    corrupt = bytearray(enc)
    corrupt[-1] ^= 0xFF  # flip a sync-marker byte
    with pytest.raises(ValueError):
        list(decode_container(bytes(corrupt)))


def test_read_avro_points_spark(spark, tmp_path):
    from kenshin_backup_spark.sources.avro_codec import (
        encode_container,
        read_avro_points,
        write_avro_files,
    )

    rows_a = [("a", i, float(i)) for i in range(10)]
    rows_b = [("b", i, 2.0 * i) for i in range(7)]
    write_avro_files(str(tmp_path), "a", encode_container(rows_a))
    write_avro_files(str(tmp_path), "b", encode_container(rows_b))
    got = sorted(
        map(tuple, read_avro_points(spark, str(tmp_path) + "/*.avro").collect())
    )
    assert got == sorted(rows_a + rows_b)


def test_read_avro_stream_micro_batches(spark, tmp_path):
    """Streaming OCF ingest: several segment files drained under a
    maxFilesPerTrigger bound must surface every decoded row exactly once."""
    from kenshin_backup_spark.sources.avro_codec import (
        encode_container,
        read_avro_stream,
        write_avro_files,
    )
    from kenshin_backup_spark.streaming.ingest import run_stream_to_memory

    import pyspark.sql.functions as F

    expect = []
    for m in ("a", "b", "c"):
        rows = [(m, 3600 * i, float(i)) for i in range(4)]
        expect += rows
        write_avro_files(str(tmp_path), m, encode_container(rows))
    stream = read_avro_stream(spark, str(tmp_path), max_files_per_trigger=1)
    out = run_stream_to_memory(
        spark,
        stream.select(
            "metric", F.unix_timestamp("ts").cast("long").alias("ts"), "value"
        ),
        output_mode="append",
    )
    assert sorted(map(tuple, out.collect())) == sorted(expect)


def test_avro_truncated_header_sync_raises():
    """A file cut at/inside the header sync marker must raise, not decode
    as an empty container (fails-closed contract)."""
    from kenshin_backup_spark.sources.avro_codec import (
        decode_container,
        encode_container,
    )

    enc = encode_container([])
    with pytest.raises(ValueError, match="sync"):
        list(decode_container(enc[:-6]))
