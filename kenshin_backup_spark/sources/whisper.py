"""Byte-level Whisper (``.wsp``) file support (SURVEY.md §2.1 S8).

The reference ships a Whisper→Kenshin converter; this module gives the
Spark engine the same migration capability against REAL whisper bytes.
The on-disk format is public (graphite-project/whisper):

- header ``metadata``: big-endian ``(aggregationType: u32,
  maxRetention: u32, xFilesFactor: f32, archiveCount: u32)``;
- ``archiveCount`` × ``archiveInfo``: ``(offset: u32,
  secondsPerPoint: u32, points: u32)``;
- each archive: ``points`` × ``(interval: u32, value: f64)`` as a ring
  buffer — slot 0 holds the archive's base interval; an interval of 0
  marks a never-written slot.

``read_whisper`` is the migration reader: ``binaryFile`` datasource →
Arrow-batched ``mapInPandas`` decode. A whisper store is millions of
small per-metric files, which is exactly the shape this parallelizes:
files are the unit of work, one task decodes many files per Arrow batch,
and nothing touches the driver. Values round-trip exactly (IEEE f64
bytes in, the same f64 out).

``write_wsp`` is a minimal single-archive writer used by tests and the
oracle-checked round-trip query (``source_whisper_roundtrip``) — enough
to produce files byte-compatible with the public reader semantics.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

METADATA = struct.Struct(">LLfL")
ARCHIVE_INFO = struct.Struct(">LLL")
POINT = struct.Struct(">Ld")

#: whisper aggregationType codes (public format)
AGG_CODES = {"average": 1, "sum": 2, "last": 3, "max": 4, "min": 5}
AGG_NAMES = {v: k for k, v in AGG_CODES.items()}


def write_wsp(
    path: str,
    points: Iterable[tuple[int, float]],
    *,
    step: int,
    agg: str = "average",
    xff: float = 0.5,
    capacity: int | None = None,
) -> int:
    """Write a single-archive whisper file holding ``points``
    ``(epoch_seconds, value)``. Timestamps align down to ``step``; later
    writes to the same slot win (whisper update semantics). Returns the
    number of occupied slots.

    ``capacity`` defaults to exactly the spanned slot count, so nothing
    ring-wraps; pass a smaller value to exercise wrap-around."""
    slots: dict[int, float] = {}
    for ts, value in points:
        slots[int(ts) - (int(ts) % step)] = float(value)
    if not slots:
        raise ValueError("write_wsp: no points")
    if 0 in slots:
        # the format reserves interval 0 as the never-written marker; a
        # point there would silently vanish on read — refuse loudly
        raise ValueError("write_wsp: epoch-0-aligned point is unrepresentable")
    base = min(slots)
    cap = capacity if capacity is not None else (max(slots) - base) // step + 1
    buf = bytearray(METADATA.size + ARCHIVE_INFO.size + cap * POINT.size)
    METADATA.pack_into(buf, 0, AGG_CODES[agg], cap * step, xff, 1)
    offset = METADATA.size + ARCHIVE_INFO.size
    ARCHIVE_INFO.pack_into(buf, METADATA.size, offset, step, cap)
    for interval in sorted(slots):
        idx = ((interval - base) // step) % cap
        POINT.pack_into(buf, offset + idx * POINT.size, interval, slots[interval])
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(bytes(buf))
    os.replace(tmp, path)
    return len({((iv - base) // step) % cap for iv in slots})


def decode_wsp(content: bytes) -> Iterator[tuple[int, int, int, float]]:
    """Decode whisper bytes → ``(archive_idx, step, interval, value)``
    rows, skipping never-written slots (interval 0). Pure function —
    usable inside executors and in plain tests."""
    _agg, _max_ret, _xff, n_arch = METADATA.unpack_from(content, 0)
    archives = [
        ARCHIVE_INFO.unpack_from(content, METADATA.size + i * ARCHIVE_INFO.size)
        for i in range(n_arch)
    ]
    for a_idx, (offset, step, n_points) in enumerate(archives):
        for p in range(n_points):
            interval, value = POINT.unpack_from(content, offset + p * POINT.size)
            if interval != 0:
                yield a_idx, step, interval, value


def wsp_info(content: bytes) -> dict:
    """Header/info read (S6 over real bytes): aggregation method, max
    retention, xFilesFactor, and per-archive (step, points)."""
    agg, max_ret, xff, n_arch = METADATA.unpack_from(content, 0)
    return {
        "aggregation": AGG_NAMES.get(agg, str(agg)),
        "max_retention": max_ret,
        "xff": round(float(xff), 6),
        "archives": [
            ARCHIVE_INFO.unpack_from(content, METADATA.size + i * ARCHIVE_INFO.size)[1:]
            for i in range(n_arch)
        ],
    }


_READ_SCHEMA = (
    "metric string, archive long, step long, ts long, value double"
)


def read_whisper(spark: SparkSession, path_glob: str) -> DataFrame:
    """Read a tree of ``.wsp`` files into a long frame
    ``(metric, archive, step, ts, value)``.

    The metric name is the file's base name without extension (whisper
    stores encode the dotted metric path as directories; callers with a
    nested store can post-process the ``binaryFile`` ``path`` column the
    same way). Decode runs in ``mapInPandas`` — per-file ring-buffer
    unpack, no driver involvement, Arrow-batched output."""
    files = spark.read.format("binaryFile").load(path_glob)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                metric = os.path.splitext(os.path.basename(path))[0]
                for a_idx, step, interval, value in decode_wsp(bytes(content)):
                    rows.append((metric, a_idx, step, interval, value))
            yield pd.DataFrame(
                rows, columns=["metric", "archive", "step", "ts", "value"]
            )

    return files.select("path", "content").mapInPandas(_decode, _READ_SCHEMA)
