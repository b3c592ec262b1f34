"""Multimodal column plumbing (beyond-reference surface).

Images/audio/video are carried as opaque ``binary`` columns with a
typed metadata struct — the Spark-side schema, partitioning, and
Arrow-batched UDF plumbing are real and tested; the actual media decode
is STUBBED (no image/audio libraries in this container) behind
``DecodeNotAvailable`` with a deterministic-fake fallback so the
pipeline shape can be exercised end to end.

Scale posture: binary payloads never pass through a shuffle — feature
extraction is ``mapInPandas`` (per-partition, Arrow batches), and any
downstream joins/groupBys use only the extracted scalar features.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


class DecodeNotAvailable(NotImplementedError):
    """Raised when a real media decoder is requested in this container."""


def decode_image(content: bytes):  # pragma: no cover - real decoder absent
    """STUB: real implementation would use PIL/opencv (not installed)."""
    raise DecodeNotAvailable(
        "image decode requires PIL/opencv, not available in this environment"
    )


def _fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake embedding: bytes of sha256 scaled to [0,1).
    Stands in for a real encoder so plumbing is testable."""
    h = hashlib.sha256(content).digest()
    return [b / 256.0 for b in h[:dim]]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    Uses mapInPandas so each executor processes whole record batches;
    the binary column is consumed here and dropped from the output, so
    nothing heavy crosses a shuffle afterwards.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": content.map(lambda b: len(b) if b is not None else 0),
                    "content_sha": content.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "feature": content.map(
                        lambda b: _fake_feature(b, dim) if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat documents.text as opaque binary payloads, giving a
    deterministic media table for exercising the pipeline."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("image").alias("media_type"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
        T.StructField("frame_sha", T.StringType(), True),
    ]
)


def sample_frames(media: DataFrame, frame_size: int = 64, stride: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video/audio payloads.

    Real decoders would emit decoded frames; without media libs the
    "frames" are fixed-size byte windows taken every ``stride`` windows
    — the Spark-side shape (binary in, many typed rows out, Arrow
    batches, no shuffle of payloads) is exactly the production plan.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_bytes": [], "frame_sha": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                n = len(content)
                for idx, off in enumerate(range(0, n, frame_size * stride)):
                    frame = bytes(content[off : off + frame_size])
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(frame)
                    out["frame_sha"].append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FRAME_SCHEMA)


def resize_image(content: bytes, width: int, height: int):  # pragma: no cover
    """STUB: real implementation would use PIL (not installed here)."""
    raise DecodeNotAvailable(
        "image resize requires PIL/opencv, not available in this environment"
    )


def thumbnail_features(media: DataFrame, dim: int = 4) -> DataFrame:
    """Resize-then-embed pipeline shape with the resize stubbed to a
    deterministic byte-decimation (every k-th byte), then the fake
    encoder. The operator chain (binary -> smaller binary -> feature)
    matches a production thumbnail pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = pdf["content"].map(
                lambda b: bytes(b[::8]) if b is not None else None
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": thumbs.map(lambda b: len(b) if b is not None else 0),
                    "content_sha": thumbs.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "feature": thumbs.map(
                        lambda b: _fake_feature(b, dim) if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
