"""Multimodal column operators (SURVEY.md §2.9 X4).

Pattern: media payloads are opaque ``BinaryType`` columns carried next to a
typed metadata struct; decode / feature-extraction runs as Arrow-batched
Pandas functions over ``mapInPandas``. The driver testdata has no binary
table, so :func:`with_binary_payload` derives a deterministic binary column
from ``documents.text`` (UTF-8 bytes) — the *plumbing* (schema, batch
iteration, partitioning) is identical to real image/audio payloads.

The actual media decode (image resize, audio resample, video frame-sample)
would need PIL/ffmpeg etc., which this container does not ship — those
steps are STUBBED behind ``decode_stub`` with a deterministic fake feature
extractor, clearly marked. Swap ``_fake_decode`` for a real decoder and
nothing else changes.

Scale notes (100 TB): payload columns dominate bytes; real pipelines store
them in their own parquet column (or external object store + pointer) so
column pruning skips them unless asked for. mapInPandas streams
Arrow batches (bounded memory per task); never collect payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the stubbed decoder — mirrors a real image pipeline's
#: (id, format, width, height, n_frames, feature vector).
DECODE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, width long, height long, "
    "n_frames long, feature array<double>"
)


def with_binary_payload(
    df: DataFrame, *, text_col: str = "text", out_col: str = "payload"
) -> DataFrame:
    """Attach a BinaryType payload + metadata struct derived from text
    (deterministic stand-in for real media bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )
    return df.withColumn(out_col, payload).withColumn("media_meta", meta)


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """STUB decoder (deterministic fake). A real deployment replaces this
    with PIL/ffmpeg/torchaudio; the container ships none of them
    (import-gated by design). Derives pseudo width/height/frames and a
    4-dim feature from the byte length via exact integer/IEEE arithmetic,
    so the whole mapInPandas pipeline remains oracle-checkable in SQL."""
    n = len(payload)
    width = 64 + (n % 577)
    height = 64 + ((n * 31) % 421)
    n_frames = 1 + (n % 7)
    feature = [
        n / 1000.0,
        ((n * 2654435761) % 997) / 997.0,
        float(width * height),
        float(n_frames),
    ]
    return width, height, n_frames, feature


def decode_stub(df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode pipeline over mapInPandas (X4 plumbing).

    Each task receives pandas batches with the binary column; a real
    decoder would emit pixels/frames/features the same way.
    """
    import pandas as pd

    id_c, pay_c = id_col, payload_col

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_c], pdf[pay_c]):
                b = bytes(payload)
                width, height, n_frames, feature = _fake_decode(b)
                rows.append(
                    {
                        "doc_id": int(i),
                        "mime": "application/octet-stream",
                        "n_bytes": len(b),
                        "width": width,
                        "height": height,
                        "n_frames": n_frames,
                        "feature": feature,
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "doc_id", "mime", "n_bytes", "width", "height", "n_frames", "feature"
            ])

    return df.select(id_c, pay_c).mapInPandas(_decode, DECODE_SCHEMA)


def frame_sample_stub(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload", every: int = 2
) -> DataFrame:
    """STUB video frame sampler: emits one row per sampled fake frame
    (1:N mapInPandas output — the row-expanding shape of real frame
    extraction)."""
    import pandas as pd

    id_c, pay_c = id_col, payload_col

    def _frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for i, payload in zip(pdf[id_c], pdf[pay_c]):
                b = bytes(payload)
                _, _, n_frames, _ = _fake_decode(b)
                for f in range(0, n_frames, every):
                    out.append(
                        {
                            "doc_id": int(i),
                            "frame_idx": f,
                            "frame_bytes": b[f::max(n_frames, 1)][:64],
                        }
                    )
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame_bytes"])

    return df.select(id_c, pay_c).mapInPandas(
        _frames, "doc_id long, frame_idx long, frame_bytes binary"
    )
