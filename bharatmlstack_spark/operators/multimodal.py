"""Multimodal (image/audio/video) columns: opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-friendly
batch iteration (mapInPandas), Arrow batch shapes, deterministic fallback
features — while the actual codec work (image decode, resampling, frame
extraction) is STUBBED: the runtime here has no PIL/ffmpeg/torchaudio, so
each decode hook either raises NotImplementedError (strict) or produces a
deterministic fake derived from the bytes (fake mode, used by tests and
fixtures). Swap `_decode_image_real` etc. with real implementations on a
cluster that ships the codec libs; nothing else changes.

Schema convention:
    media_id   BIGINT
    modality   STRING ('image' | 'audio' | 'video')
    content    BINARY              -- opaque payload
    meta       STRUCT<mime STRING, width INT, height INT,
                      sample_rate INT, duration_ms BIGINT>
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, modality string, n_bytes long, feature array<float>"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes binary"


def _decode_image_real(content: bytes, meta) -> np.ndarray:  # pragma: no cover
    """Real decoder hook — requires an imaging lib absent from this
    runtime. Replace on a codec-equipped cluster."""
    raise NotImplementedError(
        "image decode requires PIL/cv2; not available in this environment"
    )


def _fake_feature(content: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature: byte-histogram folded to `dim`
    buckets, L2-normalized. Fully reproducible across runs/engines."""
    if len(content) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(content, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
    n = np.linalg.norm(hist)
    return (hist / n if n else hist).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = 8, strict_decode: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over binary content.

    Arrow-batched: each partition streams pandas batches; per batch one
    vectorized pass. ``strict_decode=True`` exercises the real-codec path
    (raises NotImplementedError here, by design).
    """

    # capture helpers as locals: cloudpickle then ships them BY VALUE, so
    # executors do not need this package on their import path (module-level
    # references pickle by name and break on workers without the package)
    fake_feature = _fake_feature
    decode_real = _decode_image_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict_decode:
                for content, meta in zip(pdf["content"], pdf["meta"]):
                    decode_real(content, meta)
            feats = [
                fake_feature(bytes(c) if c is not None else b"", dim)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """Frame sampling STUB with real batch plumbing: slices the binary
    payload at fixed strides (a real impl would seek keyframes). Output is
    one row per sampled 'frame'."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                for i in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(data[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return media.filter(F.col("modality") == "video").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id long, content binary, "
    "meta struct<mime string, width int, height int, "
    "sample_rate int, duration_ms bigint>"
)


def resize_images(
    media: DataFrame, width: int = 32, height: int = 32, strict_decode: bool = False
) -> DataFrame:
    """Image resize STUB with real batch plumbing: output meta carries the
    target dimensions and the payload is deterministically re-derived at
    the target byte budget (w*h). A real impl decodes + resamples in the
    same mapInPandas slot; schema/partitioning/batch shape are identical.
    Non-image rows pass through untouched."""
    decode_real = _decode_image_real
    budget = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, metas = [], []
            for modality, content, meta in zip(
                pdf["modality"], pdf["content"], pdf["meta"]
            ):
                data = bytes(content) if content is not None else b""
                meta = dict(meta) if meta is not None else {}
                if modality == "image":
                    if strict_decode:
                        decode_real(data, meta)
                    # deterministic fake "resample": tile/truncate to budget
                    reps = -(-budget // max(len(data), 1)) if data else 1
                    data = (data * reps)[:budget] if data else b"\x00" * budget
                    meta["width"], meta["height"] = width, height
                contents.append(data)
                metas.append(meta)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "content": contents, "meta": metas}
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def synthetic_media(spark, n: int = 16) -> DataFrame:
    """Deterministic fixture: binary payloads derived from the row id."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        content = bytes((i * 7 + j) % 256 for j in range(64 + (i % 5) * 32))
        meta = (
            "application/octet-stream",
            64 if modality == "image" else None,
            48 if modality == "image" else None,
            16000 if modality == "audio" else None,
            1000 * (i + 1) if modality == "video" else None,
        )
        rows.append((i, modality, content, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
