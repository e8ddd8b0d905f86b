"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The sandbox has no image/audio libraries (no Pillow/ffmpeg), so REAL codec
decode is stubbed behind an import-try that raises NotImplementedError;
everything Spark-side — schema, partitioning, mapInPandas signatures,
Arrow batch shapes, resize/feature/frame-sample math — is real and tested
against a documented deterministic fake container:

    FAKE-IMG: b"FIMG" | u16 w | u16 h | u8 c | w*h*c u8 pixels
    FAKE-AUD: b"FAUD" | u32 sample_rate | u32 n | n f32 samples
    FAKE-VID: b"FVID" | u16 w | u16 h | u16 n_frames | frames of w*h u8

Payloads derive from a key via splitmix64, so media tables synthesize
deterministically at any scale (generated per-batch on executors — the
driver never materializes them).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("channels", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("format", StringType()),
                ]
            ),
        ),
    ]
)


def _splitmix(x: np.ndarray) -> np.ndarray:
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _fake_pixels(media_id: int, n: int) -> np.ndarray:
    words = _splitmix(
        np.arange(n // 8 + 1, dtype=np.uint64) + np.uint64(media_id * 7919)
    )
    return words.view(np.uint8)[:n]


def encode_fake_image(media_id: int, w: int, h: int, c: int) -> bytes:
    return struct.pack("<4sHHB", b"FIMG", w, h, c) + _fake_pixels(
        media_id, w * h * c
    ).tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Decode to (h, w, c) uint8. PNG decodes for real (pure-numpy codec,
    functions/png.py — round 4); JPEG/WebP would plug Pillow into this one
    function and remain stubbed in this sandbox. The fake container keeps
    downstream shapes testable independently of any codec."""
    if payload[:4] == b"FIMG":
        w, h, c = struct.unpack_from("<HHB", payload, 4)
        return (
            np.frombuffer(payload, dtype=np.uint8, offset=9, count=w * h * c)
            .reshape(h, w, c)
        )
    from geotiff_spark.functions.png import PNG_MAGIC, decode_png

    if payload[:8] == PNG_MAGIC:
        arr = decode_png(payload)
        if arr.dtype != np.uint8:
            arr = (arr >> 8).astype(np.uint8)  # 16-bit → high byte
        return arr
    try:  # pragma: no cover - not installed in this sandbox
        from PIL import Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "real JPEG/WebP codecs unavailable in this environment; "
            "payload is neither PNG nor a FAKE-IMG container"
        ) from None
    raise NotImplementedError("real-codec path not wired")


def synth_media_row(mid: int) -> dict:
    """One deterministic media row for id `mid` — shared by the Spark
    generator and the driver-side oracle builder (oracle_raster.py)."""
    mid = int(mid)
    r = int(_splitmix(np.array([mid], dtype=np.uint64))[0])
    kind = ("image", "audio", "video")[mid % 3]
    if kind == "image":
        w, h, c = 16 + r % 48, 16 + (r >> 8) % 48, 3
        payload = encode_fake_image(mid, w, h, c)
        meta = (w, h, c, None, None, "FIMG")
    elif kind == "audio":
        sr, ns = 16000, 256 + r % 1024
        samples = (
            (_fake_pixels(mid, ns * 4).view(np.uint32) % 2000)
            .astype(np.float32) / 1000.0 - 1.0
        )[:ns]
        payload = struct.pack("<4sII", b"FAUD", sr, ns) + samples.tobytes()
        meta = (None, None, 1, sr, None, "FAUD")
    else:
        w, h, nf = 8 + r % 24, 8 + (r >> 8) % 24, 4 + r % 12
        payload = struct.pack("<4sHHH", b"FVID", w, h, nf) + _fake_pixels(
            mid, w * h * nf
        ).tobytes()
        meta = (w, h, 1, None, nf, "FVID")
    return {
        "media_id": mid,
        "kind": kind,
        "payload": payload,
        "meta": dict(
            zip(
                ("width", "height", "channels",
                 "sample_rate", "n_frames", "format"),
                meta,
            )
        ),
    }


def synth_media(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic media table: ids 0..n-1 cycle image/audio/video."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([synth_media_row(mid) for mid in pdf["id"]])

    rng = spark.range(0, n, numPartitions=partitions or 8)
    return rng.mapInPandas(gen, schema=MEDIA_SCHEMA)


def synth_png_row(mid: int) -> dict:
    """One deterministic REAL-PNG media row: pixels from the same
    splitmix stream as FAKE-IMG, encoded through the numpy PNG encoder
    with per-image varying dims, filter schedule and color type (gray /
    RGB / RGBA / palette) so decode exercises every filter and color
    path. Shared by the Spark generator and the oracle builder."""
    from geotiff_spark.functions.png import encode_png

    mid = int(mid)
    r = int(_splitmix(np.array([mid], dtype=np.uint64))[0])
    w, h = 8 + r % 40, 8 + (r >> 8) % 40
    c = (1, 3, 4)[mid % 3]
    arr = _fake_pixels(mid, w * h * c).reshape(h, w, c)
    if mid % 7 == 0:
        idx = (arr[:, :, :1] % 32).astype(np.uint8)
        plte = _fake_pixels(mid + 13, 96).reshape(32, 3)
        payload = encode_png(idx, filters=mid % 5, palette=plte)
        c = 3
    elif mid % 11 == 3:
        # 16-bit gray/RGB branch (decode_image keeps the high byte)
        c16 = 1 if c == 1 else 3
        lo = _fake_pixels(mid + 29, w * h * c16).reshape(h, w, c16)
        arr16 = (
            arr[:, :, :c16].astype(np.uint16) << 8
        ) | lo.astype(np.uint16)
        payload = encode_png(arr16, filters=mid % 5)
        c = c16
    else:
        payload = encode_png(arr, filters=None if mid % 2 else mid % 5)
    return {
        "media_id": mid,
        "kind": "image",
        "payload": payload,
        "meta": {
            "width": w, "height": h, "channels": c,
            "sample_rate": None, "n_frames": None, "format": "PNG",
        },
    }


def synth_png_media(
    spark: SparkSession, n: int, partitions: int | None = None
) -> DataFrame:
    """Deterministic REAL-PNG image table (ids 0..n-1), generated on
    executors per Arrow batch — the corpus behind png_image_features."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([synth_png_row(mid) for mid in pdf["id"]])

    rng = spark.range(0, n, numPartitions=partitions or 8)
    return rng.mapInPandas(gen, schema=MEDIA_SCHEMA)


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        # scalar per-channel means (not array<double>): flat columns
        # sort/hash cleanly in any downstream canonicalizer
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("std_gray", DoubleType()),
    ]
)


def image_features(media: DataFrame) -> DataFrame:
    """Decode → per-channel mean + gray std, one mapInPandas pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(bytes(payload))
                means = arr.reshape(-1, arr.shape[2]).mean(axis=0)
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": arr.shape[1],
                        "height": arr.shape[0],
                        "mean_r": float(means[0]),
                        "mean_g": float(means[1]) if len(means) > 1 else None,
                        "mean_b": float(means[2]) if len(means) > 2 else None,
                        "std_gray": float(arr.mean(axis=2).std()),
                    }
                )
            yield pd.DataFrame(rows)

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
    )


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, re-encoded into the same container."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(bytes(payload))
                h, w, c = arr.shape
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                resized = arr[yi][:, xi]
                rows.append(
                    {
                        "media_id": int(mid),
                        "payload": struct.pack("<4sHHB", b"FIMG", out_w, out_h, c)
                        + resized.tobytes(),
                    }
                )
            yield pd.DataFrame(rows)

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, schema=out_schema)
    )


def sample_video_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Explode every `every`-th frame as its own image row."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                if payload[:4] != b"FVID":
                    raise NotImplementedError("real video codecs unavailable")
                w, h, nf = struct.unpack_from("<HHH", payload, 4)
                frames = np.frombuffer(
                    payload, dtype=np.uint8, offset=10, count=w * h * nf
                ).reshape(nf, h, w)
                for i in range(0, nf, every):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": i,
                            "frame": struct.pack("<4sHHB", b"FIMG", w, h, 1)
                            + frames[i].tobytes(),
                        }
                    )
            yield pd.DataFrame(rows)

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, schema=out_schema)
    )


def decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode FAKE-AUD to (sample_rate, float32 samples). Real codecs are
    unavailable here — a real deployment plugs ffmpeg/soundfile into this
    one function, exactly like decode_image."""
    if payload[:4] == b"FAUD":
        sr, n = struct.unpack_from("<II", payload, 4)
        return sr, np.frombuffer(payload, dtype=np.float32, offset=12, count=n)
    raise NotImplementedError(
        "real audio codecs unavailable in this environment; "
        "payload is not a FAKE-AUD container"
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_sec", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", IntegerType()),
        StructField("peak", DoubleType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Decode → duration / RMS / zero-crossing count / peak, one
    mapInPandas pass (the audio analog of image_features)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                sr, s = decode_audio(bytes(payload))
                s64 = s.astype(np.float64)
                rows.append(
                    {
                        "media_id": int(mid),
                        "sample_rate": sr,
                        "n_samples": len(s),
                        "duration_sec": len(s) / sr,
                        "rms": float(np.sqrt(np.mean(s64 * s64))),
                        "zero_crossings": int(
                            np.count_nonzero(np.diff(np.signbit(s64)))
                        ),
                        "peak": float(np.abs(s64).max()),
                    }
                )
            yield pd.DataFrame(rows)

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)
    )
