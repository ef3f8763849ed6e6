"""Multimodal (image/audio/video) column operators.

Media content rides as opaque ``binary`` columns with typed metadata — the
lakehouse-native layout for multimodal training data. The Spark-side plumbing
(schemas, Arrow batch shapes, mapInPandas signatures, partition sizing) is
real and tested; the actual codec step is STUBBED because no image/audio
libraries ship in this container — ``decode_images(..., fake=True)`` produces
a deterministic fake so the pipeline shape can be exercised end-to-end, and
``fake=False`` raises ``NotImplementedError`` where a real decoder (PIL,
ffmpeg, soundfile) would plug in.

Scale notes: decode is a narrow ``mapInPandas`` (no shuffle); batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor
memory stays flat regardless of corpus size. Heavy payloads should set
``maxRecordsPerBatch`` low (e.g. 64) — bytes per batch is what matters.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the image-decode stage: one row per input, typed metadata
#: plus the (possibly resized) pixel payload.
IMAGE_DECODE_SCHEMA = (
    "id bigint, width int, height int, channels int, format string, pixels binary"
)

#: Output schema of audio frame-sampling: one row per sampled frame.
AUDIO_FRAMES_SCHEMA = "id bigint, frame_idx int, sample_rate int, frame binary"


def binary_metadata(df: DataFrame, bin_col: str, id_col: str = "doc_id") -> DataFrame:
    """Typed metadata for an opaque binary column: byte size, content md5,
    magic-header hex. Pure built-in expressions — runs at scan speed."""
    b = F.col(bin_col)
    return df.select(
        id_col,
        F.octet_length(b).cast("int").alias("n_bytes"),
        F.md5(b).alias("content_md5"),
        F.hex(F.expr(f"substring({bin_col}, 1, 8)")).alias("header_hex"),
    )


def decode_images(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "id",
    resize: tuple[int, int] | None = None,
    fake: bool = False,
) -> DataFrame:
    """Decode image bytes → (width, height, channels, format, pixels).

    Arrow-batched ``mapInPandas``: each task pulls record batches, decodes
    rows in bulk, yields typed batches. With ``fake=True`` the "decode" is a
    deterministic function of the content hash (stable across runs/executors)
    so tests can exercise schema, batching and downstream ops.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                # Real implementation: PIL.Image.open(io.BytesIO(b)) per row,
                # optional resize, np.asarray → bytes. Libraries absent here.
                raise NotImplementedError(
                    "image codec not available in this environment; "
                    "pass fake=True to exercise the pipeline plumbing"
                )
            rows = []
            for rid, b in zip(pdf[id_col], pdf[bin_col]):
                h = hashlib.md5(bytes(b)).digest()
                w = resize[0] if resize else 16 + h[0] % 64
                ht = resize[1] if resize else 16 + h[1] % 64
                rows.append(
                    {
                        "id": int(rid),
                        "width": int(w),
                        "height": int(ht),
                        "channels": 3,
                        "format": "fake/rgb8",
                        # deterministic fake pixel payload: hash-seeded bytes
                        "pixels": (h * ((w * ht * 3) // len(h) + 1))[: w * ht * 3],
                    }
                )
            yield pd.DataFrame(rows, columns=["id", "width", "height", "channels", "format", "pixels"])

    return df.mapInPandas(_decode, IMAGE_DECODE_SCHEMA)


def sample_audio_frames(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "id",
    n_frames: int = 4,
    frame_bytes: int = 256,
    fake: bool = False,
) -> DataFrame:
    """Sample ``n_frames`` evenly spaced fixed-size frames from each audio
    payload — one output row per frame (1→N mapInPandas)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio codec not available; pass fake=True for plumbing tests"
                )
            rows = []
            for rid, b in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(b)
                step = max(1, (len(raw) - frame_bytes) // max(1, n_frames - 1))
                for i in range(n_frames):
                    off = min(i * step, max(0, len(raw) - frame_bytes))
                    rows.append(
                        {
                            "id": int(rid),
                            "frame_idx": i,
                            "sample_rate": 16000,
                            "frame": raw[off : off + frame_bytes],
                        }
                    )
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "sample_rate", "frame"])

    return df.mapInPandas(_sample, AUDIO_FRAMES_SCHEMA)
