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
    """STUB — a real deployment decodes with PIL/opencv (not in this
    container). The Spark plumbing around this call is real."""
    raise NotImplementedError(
        "image decode requires PIL/opencv — not available in this container"
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
