"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed through Arrow-batched UDFs.

The Spark-side machinery here is real and tested — schema contracts,
partitioning, ``mapInPandas`` batch shapes, deterministic feature
extraction over raw bytes. The actual codec work (JPEG decode, audio
resample, video frame extraction) requires native libraries that are
NOT in this runtime, so the decode kernels are explicit stubs: they
either raise ``NotImplementedError`` (strict mode) or produce a
documented deterministic fake (test mode), behind the same interface
a real kernel would implement.

At scale: media rows are large and skewed — the loader repartitions
by a byte-size-aware key so one task never gets all the big files,
and the feature extractor streams Arrow batches (never materialises
a partition of raw media in Python lists).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("content", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
    ]), True),
])

FEATURE_DIM = 16


def media_frame(spark, rows) -> DataFrame:
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def size_bucketed(df: DataFrame, target_bytes: int = 64 << 20) -> DataFrame:
    """Repartition media so each task carries ~*target_bytes* of
    content: the salt key spreads big files across tasks (media tables
    are heavily size-skewed; without this one executor decodes all the
    movies while the rest idle)."""
    n = max(df.rdd.getNumPartitions(), 1)
    return df.withColumn(
        "__size_salt",
        (F.crc32(F.col("media_id").cast("string"))
         + F.coalesce(F.length("content"), F.lit(0)) / F.lit(target_bytes)).cast("long"),
    ).repartition(n, "__size_salt").drop("__size_salt")


def decode_image(content: bytes) -> "object":
    """STUB — real implementation needs an image codec (PIL/opencv),
    not present in this runtime."""
    raise NotImplementedError(
        "image decode requires an image codec library (e.g. PIL); "
        "not available in this runtime — use fake_features for plumbing tests"
    )


def fake_features(content: bytes | None, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature kernel: sha256-seeded vector.
    Same bytes → same vector, on any machine — lets every piece of
    Spark plumbing (schema, batching, partitioning, joins downstream)
    be tested for real while the codec is stubbed."""
    if content is None:
        return [0.0] * dim
    h = hashlib.sha256(content).digest()
    return [h[i] / 255.0 for i in range(dim)]


def extract_features(
    df: DataFrame,
    kernel: Callable[[bytes | None], list[float]] = fake_features,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """(media_id, features array<float>) via mapInPandas: Arrow batches
    stream through Python, one batch at a time — memory stays bounded
    by the Arrow batch size regardless of partition size."""

    out_schema = f"{id_col} bigint, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "features": [kernel(c) for c in pdf[content_col]],
            })

    return df.mapInPandas(run, out_schema)


def resize_image(content: bytes, width: int, height: int) -> bytes:
    """STUB — real implementation needs an image codec (PIL/opencv),
    not present in this runtime."""
    raise NotImplementedError(
        "image resize requires an image codec library (e.g. PIL); "
        "not available in this runtime — use fake_resize for plumbing tests"
    )


def fake_resize(content: bytes | None, width: int, height: int) -> bytes | None:
    """Deterministic stand-in resize kernel: re-keys the bytes with the
    target dimensions (same input + target → same output), preserving
    the invariant a real kernel has — output depends on (content, w, h)
    only."""
    if content is None:
        return None
    return hashlib.sha256(content + f":{width}x{height}".encode()).digest()


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    kernel: Callable[[bytes, int, int], bytes] = fake_resize,
    content_col: str = "content",
) -> DataFrame:
    """Resize every image row to (width, height), updating content and
    the meta dimensions; non-image rows pass through untouched. Runs as
    Arrow-batched ``mapInPandas`` over the size-bucketed layout so one
    task never holds all the large files; memory stays bounded by the
    Arrow batch size."""
    schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["media_type"] == "image"
            pdf = pdf.copy()
            pdf.loc[is_img, content_col] = pdf.loc[is_img, content_col].map(
                lambda c: kernel(c, width, height) if c is not None else None
            )
            pdf.loc[is_img, "meta"] = pdf.loc[is_img, "meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            yield pdf

    return df.mapInPandas(run, schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp, derived from metadata only (the decode of each frame is
    the stubbed kernel). Shows the explode shape a real sampler uses:
    metadata-driven row expansion BEFORE touching bytes, so the
    expensive decode runs once per needed frame, not per video."""
    return (
        df.where(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
