"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a metadata struct
(modality, width/height/sample_rate, codec). Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` kernels so the
JVM never copies payload bytes row-at-a-time.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so
the codec step is STUBBED: ``decoder="fake"`` produces deterministic
features derived from the payload bytes (so the Spark-side plumbing —
schema, batching, partition flow — is fully real and testable), and
``decoder="real"`` raises NotImplementedError at the exact seam where a
codec would plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "media_id long, modality string, n_bytes int, features array<float>"
)


def synthetic_media(spark: SparkSession, n: int = 256, seed: int = 5) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = rng.bytes(64 + (i % 5) * 32)
        meta = {
            "width": 640 if modality != "audio" else None,
            "height": 480 if modality != "audio" else None,
            "sample_rate": 16000 if modality == "audio" else None,
            "codec": {"image": "png", "audio": "pcm16", "video": "h264"}[modality],
        }
        rows.append((i, modality, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_features(payload: pd.Series) -> pd.Series:
    """Deterministic stand-in for a decode+embed kernel: FEATURE_DIM moments
    of the raw bytes. O(batch) numpy — the real kernel would be the same
    shape with a codec call in the middle."""
    out = []
    for b in payload:
        arr = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.float32)
        chunks = np.array_split(arr, FEATURE_DIM)
        out.append(np.array([float(c.mean()) if len(c) else 0.0 for c in chunks], dtype=np.float32))
    return pd.Series(out)


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """mapInPandas feature extraction over binary payloads."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "codec libraries (PIL/ffmpeg) not available in this "
                    "environment; plug the real decode here"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "features": _fake_features(pdf["payload"]),
                }
            )

    return media.mapInPandas(kernel, FEATURES_SCHEMA)


def resize(media: DataFrame, width: int = 224, height: int = 224,
           decoder: str = "fake") -> DataFrame:
    """Resize stub: emits payloads scaled to the target dims.

    Real implementation decodes, resizes (PIL/opencv), re-encodes; the fake
    kernel deterministically re-samples the payload bytes to
    width*height//64 bytes so batch shapes, output schema, and the
    metadata update are all real.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "image codec not available here; plug decode+resize in"
                )
            target = max(1, width * height // 64)
            out_payload = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if len(arr) == 0:
                    # linspace(0, -1) would index an empty array negatively
                    out_payload.append(bytearray(target))  # zero-filled
                    continue
                idx = np.linspace(0, len(arr) - 1, num=target).astype(np.int64)
                out_payload.append(bytearray(arr[idx].tobytes()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload": out_payload,
                    "width": np.int32(width),
                    "height": np.int32(height),
                }
            )

    return media.filter(F.col("modality").isin("image", "video")).mapInPandas(
        kernel, "media_id long, modality string, payload binary, width int, height int"
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 32, decoder: str = "fake") -> DataFrame:
    """Frame-sampling stub: emits one row per sampled 'frame' (byte offset).

    Real implementation would demux video and sample frames; the Spark-side
    shape (one-to-many mapInPandas) is identical.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError("video demux not available here")
            rows = {"media_id": [], "frame_idx": [], "offset": []}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                n = len(b) // every_n_bytes
                rows["media_id"].extend([mid] * n)
                rows["frame_idx"].extend(range(n))
                rows["offset"].extend(i * every_n_bytes for i in range(n))
            yield pd.DataFrame(rows)

    return media.filter(F.col("modality") == "video").mapInPandas(
        kernel, "media_id long, frame_idx int, offset int"
    )
