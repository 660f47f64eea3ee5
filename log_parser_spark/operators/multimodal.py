"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a metadata struct
(modality, width/height/sample_rate, codec). Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` kernels so the
JVM never copies payload bytes row-at-a-time.

The heavyweight decode libraries (PIL/ffmpeg/torchaudio) are NOT in this
container. ``decoder="fake"`` produces deterministic features derived from
the raw payload bytes (so the Spark-side plumbing — schema, batching,
partition flow — is fully real and testable regardless of codec).
``decoder="real"`` runs a REAL dependency-free codec for the formats this
module implements itself:

  - ``ppm``  — binary PPM (P6) images: header parse (incl. comments) +
    raw RGB pixels, decoded/encoded with numpy only,
  - ``wav``  — RIFF/WAVE PCM16 audio: chunk walk + int16 samples.

``extract_features`` and ``resize`` decode these end-to-end (pixel/sample
domain features; nearest-neighbor pixel resize re-encoded as PPM). Formats
that genuinely need an external codec (png/h264 demux) still raise
NotImplementedError at the exact seam where one would plug in.
"""

from __future__ import annotations

import struct
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


def synthetic_real_media(spark: SparkSession, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic media table whose payloads are REAL encoded files:
    alternating PPM (P6) images and WAV (PCM16) audio — decodable end-to-end
    by the built-in codecs, no external fixture or library needed."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 8 + (i % 4) * 4, 6 + (i % 3) * 4
            px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            rows.append((
                i, "image", bytearray(encode_ppm(px)),
                {"width": w, "height": h, "sample_rate": None, "codec": "ppm"},
            ))
        else:
            rate = 16000
            samples = (np.sin(np.linspace(0, 20, 256 + i)) * 12000).astype(np.int16)
            rows.append((
                i, "audio", bytearray(encode_wav(samples, rate)),
                {"width": None, "height": None, "sample_rate": rate, "codec": "wav"},
            ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------- codecs
# Dependency-free PPM(P6) + WAV(PCM16) — public formats simple enough to
# implement from their specs, which turns the "real decoder" seam into
# working code without PIL/ffmpeg.


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as binary PPM (P6)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) pixels, got {pixels.shape}")
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        pixels, dtype=np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode binary PPM (P6) to an (H, W, 3) uint8 array. Handles the
    spec's whitespace/comment rules in the header."""
    data = bytes(data)
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    toks: list[int] = []
    i = 2
    while len(toks) < 3:
        c = data[i:i + 1]
        if c in (b" ", b"\t", b"\r", b"\n"):
            i += 1
        elif c == b"#":  # comment to end-of-line
            while i < len(data) and data[i:i + 1] != b"\n":
                i += 1
        elif c == b"":
            raise ValueError("truncated PPM header")
        else:
            j = i
            while j < len(data) and data[j:j + 1] not in (
                    b" ", b"\t", b"\r", b"\n"):
                j += 1
            toks.append(int(data[i:j]))
            i = j
    w, h, maxval = toks
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported (maxval={maxval})")
    i += 1  # exactly one whitespace byte after maxval per spec
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
    return px.reshape(h, w, 3).copy()


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode mono int16 samples as a minimal RIFF/WAVE PCM16 file."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(pcm),
    )
    return hdr + pcm


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE PCM16 to (mono int16 samples, sample_rate). Walks
    chunks (some writers insert LIST/fact between fmt and data)."""
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, fmt, pcm = 12, None, None
    while i + 8 <= len(data):
        cid, size = data[i:i + 4], struct.unpack("<I", data[i + 4:i + 8])[0]
        body = data[i + 8:i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_format}, bits={bits})")
    samples = np.frombuffer(pcm, dtype="<i2")
    if channels > 1:  # downmix to mono deterministically
        # np.round before the int16 cast: a bare astype truncates toward
        # zero, biasing samples low vs the conventional rounded average
        samples = np.round(
            samples.reshape(-1, channels).mean(axis=1)
        ).astype(np.int16)
    return samples, rate


def _real_decode(payload: bytes, codec: str | None) -> np.ndarray:
    """Decode a payload to its signal domain (flat float32)."""
    if codec == "ppm":
        return decode_ppm(payload).astype(np.float32).ravel()
    if codec == "wav":
        return decode_wav(payload)[0].astype(np.float32)
    raise NotImplementedError(
        f"no built-in codec for {codec!r}; PIL/ffmpeg not available in this "
        "environment — plug the real decode here"
    )


def _chunk_means(arr: np.ndarray) -> np.ndarray:
    chunks = np.array_split(arr, FEATURE_DIM)
    return np.array(
        [float(c.mean()) if len(c) else 0.0 for c in chunks], dtype=np.float32
    )


def _fake_features(payload: pd.Series) -> pd.Series:
    """Deterministic stand-in for a decode+embed kernel: FEATURE_DIM moments
    of the raw bytes. O(batch) numpy — the real kernel would be the same
    shape with a codec call in the middle."""
    out = []
    for b in payload:
        arr = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.float32)
        out.append(_chunk_means(arr))
    return pd.Series(out)


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    ``decoder="real"`` decodes each payload with the codec named in
    ``meta.codec`` (built-in: ppm, wav) and computes the FEATURE_DIM
    chunk-mean features in the SIGNAL domain (pixels/samples) rather than
    over raw file bytes; unknown codecs raise at the seam."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                feats = pd.Series(
                    [
                        _chunk_means(_real_decode(bytes(b), m["codec"] if m else None))
                        for b, m in zip(pdf["payload"], pdf["meta"])
                    ],
                    index=pdf.index,
                )
            else:
                feats = _fake_features(pdf["payload"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "features": feats,
                }
            )

    return media.mapInPandas(kernel, FEATURES_SCHEMA)


def resize(media: DataFrame, width: int = 224, height: int = 224,
           decoder: str = "fake") -> DataFrame:
    """Resize images to (width, height).

    ``decoder="real"``: decodes PPM payloads, nearest-neighbor-resamples the
    pixel grid with one numpy fancy-index (no per-pixel Python), re-encodes
    as PPM — a genuine decode→transform→encode round trip. Non-PPM codecs
    raise at the seam (png/h264 need external libs). ``decoder="fake"``
    deterministically re-samples raw payload bytes so batch shapes, output
    schema, and the metadata update stay testable for any codec.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = []
            if decoder == "real":
                for b, m in zip(pdf["payload"], pdf["meta"]):
                    codec = m["codec"] if m else None
                    if codec != "ppm":
                        raise NotImplementedError(
                            f"no built-in resize for codec {codec!r}; "
                            "plug PIL/opencv decode+resize here"
                        )
                    px = decode_ppm(bytes(b))
                    h0, w0 = px.shape[:2]
                    yi = (np.arange(height) * h0 // height).clip(0, h0 - 1)
                    xi = (np.arange(width) * w0 // width).clip(0, w0 - 1)
                    out_payload.append(bytearray(encode_ppm(px[yi][:, xi])))
            else:
                target = max(1, width * height // 64)
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
