"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery (schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing) is real and tested. Container-header decode
(PNG / GIF / JPEG / BMP dimensions, bit depth, channel count) is REAL and
pure-stdlib (``struct`` over the header bytes — no Pillow needed);
pixel-level decode and learned embeddings remain environment-gated stubs
(Pillow/cv2 absent in this container): unrecognized payloads raise
NotImplementedError in strict mode or produce a clearly-marked
deterministic fake otherwise.

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
        T.StructField("fmt", T.StringType(), True),  # png|gif|jpeg|bmp|unknown
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("fmt", T.StringType(), True),  # wav|unknown
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
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


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG start-of-frame markers carrying dimensions (C4/C8/CC are not SOFs)
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def parse_image_header(data: bytes) -> tuple[str, int, int, int, int] | None:
    """Real container-header parse, pure stdlib: returns (fmt, width,
    height, bit_depth, n_channels) for PNG / GIF / JPEG / BMP payloads,
    None when the bytes are not a recognized container. Reads only the
    fixed-offset header fields — no pixel decode, no image library."""
    import struct

    if len(data) >= 26 and data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR":
        width, height = struct.unpack(">II", data[16:24])
        bit_depth, color_type = data[24], data[25]
        return ("png", width, height, bit_depth, _PNG_CHANNELS.get(color_type, 0))
    if len(data) >= 11 and data[:6] in (b"GIF87a", b"GIF89a"):
        width, height = struct.unpack("<HH", data[6:10])
        packed = data[10]
        bit_depth = ((packed >> 4) & 0x07) + 1  # color-resolution field
        return ("gif", width, height, bit_depth, 3)
    if len(data) >= 4 and data[:2] == b"\xff\xd8":
        pos = 2
        while pos + 9 < len(data):
            if data[pos] != 0xFF:
                break
            marker = data[pos + 1]
            if marker in _JPEG_SOF:
                bit_depth = data[pos + 4]
                height, width = struct.unpack(">HH", data[pos + 5 : pos + 9])
                return ("jpeg", width, height, bit_depth, data[pos + 9])
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no payload
                pos += 2
                continue
            (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            pos += 2 + seg_len
        return None
    if len(data) >= 30 and data[:2] == b"BM":
        width, height = struct.unpack("<ii", data[18:26])
        (bpp,) = struct.unpack("<H", data[28:30])
        return ("bmp", width, abs(height), bpp, max(1, bpp // 8))
    return None


def _decode_image(
    payload: bytes, strict: bool, digest: bytes | None = None
) -> tuple[str, int, int, int, int]:
    """Header decode with an environment-gated fallback: recognized
    containers parse for real (parse_image_header); anything else is where
    the pixel-level path (Pillow/cv2, absent here) would take over — strict
    mode raises, test mode derives a clearly-fake deterministic shape from
    the content hash so the plumbing stays testable end-to-end. Callers
    that already hold the payload's sha256 pass it via ``digest`` so the
    fallback never re-hashes the payload."""
    parsed = parse_image_header(payload or b"")
    if parsed is not None:
        return parsed
    if strict:
        raise NotImplementedError(
            "payload is not a PNG/GIF/JPEG/BMP container; pixel-level decode "
            "requires Pillow/opencv, not installed in this container — deploy "
            "with the media extras to enable"
        )
    if digest is None:
        digest = hashlib.sha256(payload or b"").digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    return ("unknown", width, height, 8, 3)


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
                # one sha256 pass per payload: the digest seeds the stub
                # embedding, .hex() IS hexdigest(), and the decode fallback
                # reuses it — the payload hash dominates per-row cost on
                # MB-size media (guide §4 per-task work)
                digest = hashlib.sha256(data).digest()
                fmt, width, height, bit_depth, channels = _decode_image(data, strict, digest=digest)
                rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
                vec = rng.standard_normal(embed_dim)
                vec = (vec / (np.linalg.norm(vec) or 1.0)).astype(np.float32)
                rows.append(
                    {
                        "media_id": media_id,
                        "content_sha256": digest.hex(),
                        "fmt": fmt,
                        "width": width,
                        "height": height,
                        "bit_depth": bit_depth,
                        "n_channels": channels,
                        "embedding": vec.tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return src.mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


def parse_audio_header(data: bytes) -> tuple[str, int, int, int, int] | None:
    """Real RIFF/WAVE container-header parse, pure stdlib: returns (fmt,
    sample_rate, n_channels, bit_depth, n_frames) for PCM WAV payloads,
    None when the bytes are not a recognized container. Walks the chunk
    list (word-aligned, per the RIFF spec) reading only the fmt and data
    chunk headers — no sample decode, no audio library."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    sample_rate = n_channels = bits = None
    n_data = None
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"fmt " and size >= 16 and pos + 8 + 16 <= len(data):
            _, n_channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", data[pos + 8 : pos + 24]
            )
        elif tag == b"data":
            n_data = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if not sample_rate or not n_channels or not bits or n_data is None:
        return None
    block_align = n_channels * max(1, bits // 8)
    return ("wav", sample_rate, n_channels, bits, n_data // block_align)


def _decode_audio(
    payload: bytes, strict: bool, digest: bytes | None = None
) -> tuple[str, int, int, int, int]:
    """Header decode with an environment-gated fallback, the audio twin of
    _decode_image: recognized WAV containers parse for real; anything else
    (mp3/flac/ogg need a codec library, absent here) raises in strict mode
    or derives a clearly-fake deterministic shape from the content hash
    (reused via ``digest`` when the caller already computed it)."""
    parsed = parse_audio_header(payload or b"")
    if parsed is not None:
        return parsed
    if strict:
        raise NotImplementedError(
            "payload is not a PCM WAV container; compressed-codec decode "
            "(mp3/flac/ogg) requires libsndfile/ffmpeg, not installed in "
            "this container — deploy with the media extras to enable"
        )
    if digest is None:
        digest = hashlib.sha256(payload or b"").digest()
    return ("unknown", 16000, 1 + digest[0] % 2, 16, 1000 + digest[1] * 16)


def extract_audio_features(media: DataFrame, *, strict: bool = False, embed_dim: int = 16) -> DataFrame:
    """Audio decode + feature-extract stage, mirroring
    extract_image_features: one Arrow batch of binary payloads in, one
    batch of (rate/channels/depth/frames/duration, embedding) out.
    Partitioning, batching, and schema are production-real; only the
    sample-level path (codec decode, learned embeddings) is stubbed."""
    src = media.filter(F.col("media_type") == "audio").select("media_id", "payload")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, payload in zip(batch["media_id"], batch["payload"]):
                data = bytes(payload) if payload is not None else b""
                # one sha256 pass per payload (see extract_image_features)
                digest = hashlib.sha256(data).digest()
                fmt, rate, channels, bits, frames = _decode_audio(data, strict, digest=digest)
                rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
                vec = rng.standard_normal(embed_dim)
                vec = (vec / (np.linalg.norm(vec) or 1.0)).astype(np.float32)
                rows.append(
                    {
                        "media_id": media_id,
                        "content_sha256": digest.hex(),
                        "fmt": fmt,
                        "sample_rate": rate,
                        "n_channels": channels,
                        "bit_depth": bits,
                        "n_frames": frames,
                        "duration_ms": frames * 1000 // rate if rate else None,
                        "embedding": vec.tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return src.mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)


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
                # hash the payload ONCE and fork per-frame states from it:
                # sha256(data + suffix) == copy-of-sha256(data).update(suffix)
                # (streaming-hash property), so an 8-frame sample no longer
                # re-hashes a MB-size payload 8 times
                base = hashlib.sha256(data)
                digest = base.digest()
                n = 1 + digest[2] % max_frames
                for i in range(n):
                    h = base.copy()
                    h.update(i.to_bytes(4, "big"))
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_index": i,
                            "frame_ts_ms": i * every_ms,
                            "frame_sha256": h.hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    return src.mapInPandas(kernel, schema=FRAME_SAMPLE_SCHEMA)
