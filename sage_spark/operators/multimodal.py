"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery (schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing) is real and tested; the actual media decoders
are stubbed because the image/audio libraries are not in this container —
each stub either raises NotImplementedError (strict mode) or produces a
deterministic fake (test mode), clearly marked.

Design notes for 100 TB of media:
* binary payloads ride in their own column so column pruning skips them
  unless a stage touches bytes;
* `spark.sql.files.maxPartitionBytes` + the row-group layout bound executor
  memory per task; decode stages use mapInPandas with small
  maxRecordsPerBatch so one Arrow batch of decoded frames fits in memory;
* features (embeddings, dimensions, durations) are written to a sidecar
  table keyed on content hash, so re-decoding is never needed downstream.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("media_type", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_json", T.StringType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.LongType(), True),
        T.StructField("frame_sha256", T.StringType(), True),
    ]
)


def _decode_image_stub(payload: bytes, strict: bool) -> tuple[int, int, int]:
    """STUB: real path uses Pillow/cv2 (absent here). Deterministic fake
    derives plausible dimensions from the content hash so the plumbing is
    testable end-to-end."""
    if strict:
        raise NotImplementedError(
            "image decode requires Pillow/opencv, not installed in this "
            "container; deploy with the media extras to enable"
        )
    digest = hashlib.sha256(payload or b"").digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    return width, height, 3


def extract_image_features(media: DataFrame, *, strict: bool = False, embed_dim: int = 16) -> DataFrame:
    """Decode + feature-extract stage: one Arrow batch of binary payloads in,
    one batch of (dims, embedding) out. Partitioning, batching, and schema
    are production-real; only the pixel decode is stubbed."""
    src = media.filter(F.col("media_type") == "image").select("media_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, payload in zip(batch["media_id"], batch["payload"]):
                data = bytes(payload) if payload is not None else b""
                width, height, channels = _decode_image_stub(data, strict)
                digest = hashlib.sha256(data).digest()
                rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
                vec = rng.standard_normal(embed_dim)
                vec = (vec / (np.linalg.norm(vec) or 1.0)).astype(np.float32)
                rows.append(
                    {
                        "media_id": media_id,
                        "content_sha256": hashlib.sha256(data).hexdigest(),
                        "width": width,
                        "height": height,
                        "n_channels": channels,
                        "embedding": vec.tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return src.mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, *, every_ms: int = 1000, max_frames: int = 8, strict: bool = False) -> DataFrame:
    """Frame-sampling stage (video -> frame rows). STUB decode: frame count
    and hashes derive deterministically from content; the real path swaps in
    pyav/ffmpeg inside the same kernel."""
    src = media.filter(F.col("media_type") == "video").select("media_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, payload in zip(batch["media_id"], batch["payload"]):
                data = bytes(payload) if payload is not None else b""
                if strict:
                    raise NotImplementedError("video decode requires pyav/ffmpeg; not installed here")
                digest = hashlib.sha256(data).digest()
                n = 1 + digest[2] % max_frames
                for i in range(n):
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_index": i,
                            "frame_ts_ms": i * every_ms,
                            "frame_sha256": hashlib.sha256(data + i.to_bytes(4, "big")).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    return src.mapInPandas(kernel, schema=FRAME_SAMPLE_SCHEMA)
