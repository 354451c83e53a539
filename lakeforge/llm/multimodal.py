"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed via Arrow-batched ``mapInPandas``.

The media decode itself is STUBBED (this container ships no image/audio
libs — see ``decode_image_stub``); everything Spark-side is real and
tested: the schema contract, the batch iteration shape, the partitioning
strategy, and the deterministic fake feature extractor used by tests.

Scale notes:
- Media bytes NEVER shuffle: featurize before any groupBy/join and carry
  only (id, features, metadata) forward.
- ``repartition`` before mapInPandas controls batch memory: payload_bytes
  x rows_per_batch must fit the Python worker
  (``spark.sql.execution.arrow.maxRecordsPerBatch`` caps rows per batch).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# The media-table contract: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def decode_image_stub(content: bytes) -> "np.ndarray":
    """Real image decode (PIL/opencv) — NOT AVAILABLE in this container.

    Raises so callers can't silently ship fake decodes to production;
    ``extract_features`` uses the deterministic byte-histogram fake
    instead, which exercises the identical Spark plumbing.
    """
    raise NotImplementedError(
        "media decode requires an image library not present in this "
        "environment; wire PIL/torchvision here on a real cluster"
    )


def _fake_features(content: bytes) -> np.ndarray:
    """Deterministic stand-in featurizer: 16-bin byte histogram, L1-normed."""
    if content is None or len(content) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(content, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(np.float32)
    return hist / max(len(arr), 1)


def extract_features(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """Featurize media payloads via Arrow-batched mapInPandas.

    Drops the payload column on output — bytes never travel past this op.
    """
    if partitions:
        media = media.repartition(partitions)

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_features(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(c) if c is not None else 0 for c in pdf["content"]
                    ],
                    "features": feats,
                }
            )

    return media.mapInPandas(featurize, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp.

    The frame grab itself is stubbed (no codec libs); the explode shape,
    schema, and timestamp arithmetic are the real operator.
    """
    n_frames = (F.coalesce(F.col("duration_ms"), F.lit(0)) / F.lit(every_ms)).cast(
        "long"
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias(
                "frame_idx"
            ),
        )
        .withColumn("ts_ms", F.col("frame_idx") * F.lit(every_ms))
    )


AUDIO_CHUNK_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("chunk_idx", LongType(), False),
        StructField("start_ms", LongType(), False),
        StructField("end_ms", LongType(), False),
        StructField("content", BinaryType(), True),
    ]
)


def chunk_audio(
    media: DataFrame, chunk_ms: int = 10_000, partitions: int | None = None
) -> DataFrame:
    """Audio chunking plumbing via mapInPandas: split each clip into
    fixed-duration windows (the ASR/embedding pre-step).

    The codec is stubbed — chunk payloads are byte slices proportional to
    the time window — but the chunk-boundary arithmetic (ceil division,
    ragged last chunk), the one-in/many-out batch shape, and the contract
    that downstream sees bounded-size payloads are the real operator.
    Chunks inherit the parent's partition: no shuffle is introduced, and
    each output payload is <= chunk_ms worth of bytes — the property that
    keeps per-row memory flat no matter how long the input clips are.
    """
    if partitions:
        media = media.repartition(partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "chunk_idx": [], "start_ms": [], "end_ms": [],
                "content": [],
            }
            for mid, content, dur in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                if content is None or dur is None or dur <= 0:
                    continue
                n_chunks = -(-int(dur) // chunk_ms)  # ceil
                for i in range(n_chunks):
                    start = i * chunk_ms
                    end = min((i + 1) * chunk_ms, int(dur))
                    # stub slice: bytes proportional to the time window
                    b0 = len(content) * start // int(dur)
                    b1 = len(content) * end // int(dur)
                    out["media_id"].append(mid)
                    out["chunk_idx"].append(i)
                    out["start_ms"].append(start)
                    out["end_ms"].append(end)
                    out["content"].append(bytes(content[b0:b1]))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, schema=AUDIO_CHUNK_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("content", BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame, target_w: int, target_h: int, partitions: int | None = None
) -> DataFrame:
    """Image resize plumbing via mapInPandas: metadata is recomputed for
    real; the pixel transform is the deterministic byte-subsample fake (a
    real cluster swaps PIL's ``resize`` into ``_fake_resize``).

    Same scale contract as extract_features: payloads stream through one
    Arrow batch at a time and the op is the LAST place bytes exist at full
    size — downstream sees the (smaller) resized payloads only.
    """
    if partitions:
        media = media.repartition(partitions)

    def _fake_resize(content, w0, h0):
        if content is None or not w0 or not h0 or w0 <= 0 or h0 <= 0:
            return None
        # Keep a deterministic byte subsample proportional to the pixel
        # ratio — preserves "output smaller than input" without a codec.
        ratio = min(1.0, (target_w * target_h) / float(w0 * h0))
        n = max(1, int(len(content) * ratio))
        return bytes(content[:n])

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [target_w if c is not None else None for c in pdf["content"]],
                    "height": [target_h if c is not None else None for c in pdf["content"]],
                    "content": [
                        _fake_resize(c, w, h)
                        for c, w, h in zip(pdf["content"], pdf["width"], pdf["height"])
                    ],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )
