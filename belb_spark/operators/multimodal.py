"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample are
``mapInPandas`` stages over Arrow batches. The image/audio codecs are NOT
in this container, so the decode kernel is stubbed (clearly marked): with
``fake_decode=True`` it produces a deterministic fake decode (so the
Spark-side plumbing — schema, batching, partitioning, UDF signatures — is
real and tested); with ``fake_decode=False`` it raises NotImplementedError
where PIL/ffmpeg would be called on a real cluster.

Scale notes: binary payloads are the widest column by far — every operator
here projects metadata-only where possible, and the decode stage repartitions
by size buckets so one task does not get all the 100 MB videos.
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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),    # opaque bytes
        StructField("width", LongType()),        # -1 when unknown
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_sha", StringType()),
        StructField("feature", ArrayType(FloatType())),  # 16-dim embedding
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(64, 4096))
        payload = bytes(rng.integers(0, 256, size=size, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                payload,
                int(rng.integers(16, 512)) if kind != "audio" else -1,
                int(rng.integers(16, 512)) if kind != "audio" else -1,
                int(rng.integers(1000, 60000)) if kind != "image" else -1,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic 16-dim 'embedding' from payload bytes — the STUB for
    the real decoder (PIL/librosa/ffmpeg on a real cluster)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float32), 16)
    return [float(c.mean()) if len(c) else 0.0 for c in chunks]


def extract_features(
    media: DataFrame, fake_decode: bool = True, batch_hint: int = 0
) -> DataFrame:
    """mapInPandas decode/feature stage. Projects (media_id, kind, payload)
    only — metadata stays out of the Arrow channel."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake_decode:
                # STUB: on a real cluster this is PIL.Image.open /
                # torchaudio.load / ffmpeg frame sampling
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — not in sandbox"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "payload_sha": pdf["payload"].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "feature": pdf["payload"].map(_fake_decode_features),
                }
            )
            yield out

    slim = media.select("media_id", "kind", "payload")
    return slim.mapInPandas(batches, FEATURE_SCHEMA)


def size_bucketed(media: DataFrame, n_buckets: int = 8) -> DataFrame:
    """Repartition so payload bytes spread evenly (one task must not own all
    the large videos): bucket by log2(size), then hash within bucket."""
    with_b = media.withColumn(
        "size_bucket",
        F.floor(F.log2(F.greatest(F.length("payload"), F.lit(2)))).cast("int"),
    )
    return with_b.repartition(n_buckets, "size_bucket", "media_id")


def resize_stub(media: DataFrame, max_dim: int = 256) -> DataFrame:
    """Resize planning is metadata-only (pure JVM); actual pixel work would
    live in the decode stage. Adds target dims preserving aspect ratio."""
    scale = F.when(
        F.greatest("width", "height") > max_dim,
        max_dim / F.greatest("width", "height"),
    ).otherwise(F.lit(1.0))
    return media.withColumn(
        "target_width", F.ceil(F.col("width") * scale).cast("long")
    ).withColumn("target_height", F.ceil(F.col("height") * scale).cast("long"))


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for videos: one row per planned frame timestamp
    (explode of a JVM sequence — the decode stage would fetch these)."""
    videos = media.filter(F.col("kind") == "video")
    return videos.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
