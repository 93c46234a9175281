"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with the Spark-side plumbing (schema, partitioning, Arrow batch
shape) real and tested, and the actual codec work stubbed — the
image/audio libraries are not in this container.

Layout convention (one table per modality, or a union table with a
``modality`` discriminator):

    media(doc_id: long, modality: string, payload: binary,
          meta: struct<mime: string, width: int, height: int,
                       duration_ms: int, sample_rate: int>)

Every operator below is a ``mapInPandas`` kernel over Arrow record
batches: payloads arrive as zero-copy byte views, outputs are fixed-width
feature rows — the shape a real decode/extract stage would have at 100 TB
(map-only, no shuffle; partition by input file).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_sha256", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def synthesize_media(
    spark: SparkSession, n: int, seed: int = 42
) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes are a
    seeded PRNG stream; metadata is plausible."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        modalities = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(seed * 7_919 + i)
                modality = modalities[i % 3]
                payload = rng.integers(0, 256, size=256 + i % 512, dtype=np.uint8)
                rows.append(
                    (
                        i,
                        modality,
                        payload.tobytes(),
                        (
                            f"{modality}/fake",
                            64 + i % 64 if modality != "audio" else None,
                            48 + i % 48 if modality != "audio" else None,
                            1000 + i % 9000 if modality != "image" else None,
                            16000 if modality == "audio" else None,
                        ),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "modality", "payload", "meta"]
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an image payload to an HxWxC (or HxW for grayscale) uint8
    array. UNCOMPRESSED formats are decoded in pure numpy — PPM/PGM
    (P2/P3/P5/P6) and BI_RGB BMP (8/24/32-bit) need no codec library.
    Compressed formats (JPEG/PNG/...) still require PIL/opencv, which
    this container doesn't ship — those raise NotImplementedError, the
    declared stub boundary."""
    if payload[:2] in (b"P2", b"P3", b"P5", b"P6"):
        return _decode_pnm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        "compressed image decode requires PIL/opencv — not available in "
        "this container; PPM/PGM/BMP decode natively"
    )


def _pnm_tokens(payload: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read n whitespace-separated integer header tokens, skipping
    '#' comments, returning (values, index after last token)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    return vals, i


def _decode_pnm(payload: bytes) -> np.ndarray:
    magic = payload[:2]
    (w, h, maxval), i = _pnm_tokens(payload, 3, 2)
    if maxval > 255:
        raise NotImplementedError("16-bit PNM not supported")
    channels = 3 if magic in (b"P3", b"P6") else 1
    count = w * h * channels
    if magic in (b"P5", b"P6"):
        # single whitespace byte after maxval, then raw samples
        data = np.frombuffer(payload, dtype=np.uint8, count=count, offset=i + 1)
    else:
        data = np.array(payload[i:].split()[:count], dtype=np.uint8)
    img = data.reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img


def _decode_bmp(payload: bytes) -> np.ndarray:
    """BI_RGB (uncompressed) BMP: 8-bit palette-grayscale, 24-bit BGR,
    or 32-bit BGRA; rows 4-byte padded, bottom-up (or top-down when the
    height field is negative). Returns RGB (or grayscale) uint8."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0:
        raise NotImplementedError("compressed BMP requires codec libs")
    top_down = h < 0
    h = abs(h)
    stride = (w * (bpp // 8) + 3) & ~3
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)
    if not top_down:
        raw = raw[::-1]
    if bpp == 8:
        return raw[:, :w].copy()
    px = raw[:, : w * (bpp // 8)].reshape(h, w, bpp // 8)
    return px[:, :, 2::-1].copy()  # BGR(A) -> RGB


def encode_ppm(img: np.ndarray) -> bytes:
    """RGB uint8 HxWx3 -> binary PPM (P6)."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """RGB uint8 HxWx3 -> uncompressed 24-bit BMP (BI_RGB, bottom-up)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    header = (
        b"BM"
        + (54 + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + data


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fmt", StringType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)


def decode_image_stats(media: DataFrame) -> DataFrame:
    """(doc_id, payload) -> per-image dimension + channel-mean rows
    through the REAL decode path — the map-only decode/feature stage of
    a 100 TB media pipeline (no shuffle; Arrow-batched)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(payload))
                fmt = "ppm" if bytes(payload[:1]) == b"P" else "bmp"
                means = img.reshape(img.shape[0], img.shape[1], -1).mean(
                    axis=(0, 1)
                )
                if means.size == 1:
                    means = np.repeat(means, 3)
                rows.append(
                    (
                        int(doc_id),
                        fmt,
                        int(img.shape[0]),
                        int(img.shape[1]),
                        float(means[0]),
                        float(means[1]),
                        float(means[2]),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_STATS_SCHEMA.fields])

    return media.select("doc_id", "payload").mapInPandas(
        kernel, IMAGE_STATS_SCHEMA
    )


def _fake_feature_vector(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a decode→embed stage: byte-histogram
    moments. Replaces `decode_image` + a model forward pass, keeping the
    batch shapes and dtypes of the real thing."""
    b = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(b >> 5, minlength=dim)[:dim].astype(np.float32)
    total = hist.sum() or 1.0
    return (hist / total).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """media → per-item feature rows.

    Arrow-batched; at scale this is the GPU/codec stage — map-only,
    partitioned by input split, no shuffle. The feature function is the
    deterministic fake (see `decode_image` for the real hook).
    """
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, modality, payload in zip(
                pdf["doc_id"], pdf["modality"], pdf["payload"]
            ):
                payload = bytes(payload)
                rows.append(
                    (
                        int(doc_id),
                        modality,
                        len(payload),
                        hashlib.sha256(payload).hexdigest(),
                        _fake_feature_vector(payload, dim).tolist(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in FEATURE_SCHEMA.fields],
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plan: (doc_id, frame_ts_ms) rows derived from
    metadata — pure column expressions (``sequence``), the real sampler
    would feed these timestamps to the stubbed decoder."""
    v = media.filter(F.col("modality") == "video")
    return v.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
