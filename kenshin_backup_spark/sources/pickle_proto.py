"""Graphite pickle batch protocol (SURVEY.md §2.1 S2) — the real codec.

Carbon's pickle receiver frames each message as a 4-byte big-endian
length followed by a pickle payload of ``[(metric, (timestamp, value)),
...]``. This module implements that wire codec over files: the encoder
produces length-prefixed multi-message streams, the decoder parses them
back inside ``mapInPandas``. The SOCKET listener itself stays
environment-gated (no broker/daemon in this container), but the byte
format — the part the reference actually defines — is real and
round-trips exactly (pickle protocol 2 stores IEEE f64 bytes).

Trust boundary: ``pickle.loads`` executes the payload's opcodes, so this
decoder — like carbon's own receiver — must only ever face TRUSTED
feeds. The round-trip query decodes bytes this same module encoded.
"""

from __future__ import annotations

import os
import pickle
import struct
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_LEN = struct.Struct(">L")


def encode_batches(
    rows: Iterable[tuple[str, int, float]], *, batch_size: int = 1000
) -> bytes:
    """Encode ``(metric, ts, value)`` rows as a stream of length-prefixed
    carbon pickle messages of ≤ ``batch_size`` datapoints each."""
    out = bytearray()
    batch: list[tuple[str, tuple[int, float]]] = []

    def _flush() -> None:
        if batch:
            payload = pickle.dumps(batch, protocol=2)
            out.extend(_LEN.pack(len(payload)))
            out.extend(payload)
            batch.clear()

    for metric, ts, value in rows:
        batch.append((str(metric), (int(ts), float(value))))
        if len(batch) >= batch_size:
            _flush()
    _flush()
    return bytes(out)


def decode_stream(content: bytes) -> Iterator[tuple[str, int, float]]:
    """Decode a length-prefixed pickle message stream back to
    ``(metric, ts, value)`` rows. Pure function — usable in executors and
    plain tests. Raises on truncated frames (a partial message means a
    corrupt capture, not a skippable point)."""
    offset = 0
    n = len(content)
    while offset < n:
        if offset + _LEN.size > n:
            raise ValueError("truncated length prefix")
        (size,) = _LEN.unpack_from(content, offset)
        offset += _LEN.size
        if offset + size > n:
            raise ValueError("truncated pickle frame")
        for metric, (ts, value) in pickle.loads(content[offset : offset + size]):
            yield str(metric), int(ts), float(value)
        offset += size


_READ_SCHEMA = "metric string, ts long, value double"


def read_pickle_batches(spark: SparkSession, path_glob: str) -> DataFrame:
    """Read files of length-prefixed carbon pickle messages into a long
    ``(metric, ts, value)`` frame via Arrow-batched ``mapInPandas`` —
    files are the unit of parallelism, nothing touches the driver."""
    files = spark.read.format("binaryFile").load(path_glob)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(decode_stream(bytes(content)))
            yield pd.DataFrame(rows, columns=["metric", "ts", "value"])

    return files.select("content").mapInPandas(_decode, _READ_SCHEMA)


def write_pickle_files(dir_path: str, name: str, payload: bytes) -> str:
    """Atomically write one encoded stream file (tmp + rename)."""
    os.makedirs(dir_path, exist_ok=True)
    path = os.path.join(dir_path, f"{name}.pkl")
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    return path
