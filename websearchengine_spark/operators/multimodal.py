"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are STUBS
(deterministic fakes clearly marked below); everything Spark-side — schema,
batch shapes, partitioning, UDF signatures — is real and tested.  On a
real deployment only ``_decode_image_stub`` / ``_frame_sample_stub`` change
(swap in PIL/ffmpeg), the pipeline stays identical.

Scale notes: media blobs dominate row size, so the operators (a) never
shuffle blobs — feature extraction happens map-side and drops the binary
as early as possible; (b) emit fixed-width feature vectors whose size is
independent of blob size; (c) rely on ``spark.sql.files.maxPartitionBytes``
to bound task input (blobs stream through Arrow in bounded record
batches).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("blob", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("blob_bytes", T.LongType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def _decode_image_stub(blob: bytes) -> np.ndarray:
    """STUB decode: a real deployment replaces this with PIL/libvips.
    Deterministic fake — md5-seeded pseudo-pixels so tests are stable.
    Raises like a real decoder would on empty input."""
    if not blob:
        raise ValueError("empty media blob")
    digest = hashlib.md5(blob).digest()
    seed = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    return np.resize(seed, (8, 8)) / 255.0


def _frame_sample_stub(blob: bytes, n_frames: int) -> list[np.ndarray]:
    """STUB frame sampler (video): deterministic fake frames derived from
    slices of the blob hash; a real deployment shells to ffmpeg."""
    if not blob:
        raise ValueError("empty media blob")
    return [
        _decode_image_stub(blob + bytes([i])) for i in range(n_frames)
    ]


def extract_features(media: DataFrame, batch_hint: int = 64) -> DataFrame:
    """(media_id, kind, blob_bytes, content_hash, feature[16]) — map-side
    decode + pooled feature vector; the binary column is dropped in the
    same task that read it."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, kinds, sizes, hashes, feats = [], [], [], [], []
            for mid, kind, blob in zip(b["media_id"], b["kind"], b["blob"]):
                blob = bytes(blob)
                px = _decode_image_stub(blob)
                pooled = px.mean(axis=0)
                vec = np.resize(pooled, FEATURE_DIM).astype(np.float32)
                ids.append(mid)
                kinds.append(kind)
                sizes.append(len(blob))
                hashes.append(hashlib.md5(blob).hexdigest())
                feats.append(vec.tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kinds,
                    "blob_bytes": sizes,
                    "content_hash": hashes,
                    "feature": pd.Series(feats, dtype=object),
                }
            )

    return media.select("media_id", "kind", "blob").mapInPandas(
        _gen, FEATURE_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame_feature", T.ArrayType(T.FloatType()), False),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """(media_id, frame_no, frame_feature) — per-video frame sampling; one
    input row fans out to ``n_frames`` rows inside the same task (no
    shuffle, no blob movement)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, nos, feats = [], [], []
            for mid, blob in zip(b["media_id"], b["blob"]):
                for i, frame in enumerate(_frame_sample_stub(bytes(blob), n_frames)):
                    ids.append(mid)
                    nos.append(i)
                    feats.append(
                        np.resize(frame.mean(axis=0), FEATURE_DIM)
                        .astype(np.float32)
                        .tolist()
                    )
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_no": pd.array(nos, dtype="int32"),
                    "frame_feature": pd.Series(feats, dtype=object),
                }
            )

    return media.select("media_id", "blob").mapInPandas(_gen, FRAME_SCHEMA)


def synth_media_df(spark, n: int = 24) -> DataFrame:
    """Deterministic fake media table for tests (no external data)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        blob = (f"media-{i}-".encode() * (i % 5 + 1)) + bytes(range(i % 7 + 1))
        rows.append(
            (
                i,
                kind,
                f"application/x-fake-{kind}",
                blob,
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                1000 * i if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
