"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample are
``mapInPandas`` stages over Arrow batches. Decode paths (VERDICT r3 #9):

- ``fake_decode=True``: deterministic fake decode from raw bytes — the
  plumbing-only path (schema, batching, partitioning, UDF signatures).
- ``fake_decode=False``: REAL decode for the two codec-free containers a
  bare numpy can parse — binary PPM images (:func:`decode_ppm`) and PCM16
  RIFF/WAVE audio (:func:`decode_wav`) — with features computed from the
  decoded pixels/samples. Containers that need external codecs (PNG, JPEG,
  MP4) raise NotImplementedError: that is the documented PIL/ffmpeg slot
  on a real cluster.

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


# ------------------------------------------------- real in-sandbox decoders
# Two codec-free container formats decoded with numpy alone (VERDICT r3 #9),
# so fake_decode=False exercises a REAL byte→pixels/samples→feature path end
# to end. Formats needing external codecs (PNG/JPEG/MP4) still raise — that
# NotImplementedError is the documented PIL/ffmpeg slot.

def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) → (height, width, 3) uint8 pixels.
    Header: 'P6' <ws> width <ws> height <ws> maxval <single ws> raster;
    '#' comments allowed between tokens."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte before the raster
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * 3
    raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return raster.reshape(h, w, 3)


def decode_wav(payload: bytes) -> np.ndarray:
    """RIFF/WAVE PCM16 → (n_samples, n_channels) float32 in [-1, 1).
    Walks the chunk list (tolerates extra chunks like LIST/fact)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n_channels, bits, data = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_format = int.from_bytes(body[0:2], "little")
            n_channels = int.from_bytes(body[2:4], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_format != 1 or bits != 16:
                raise ValueError("only PCM16 WAV supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if n_channels is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(
        data, dtype="<i2", count=len(data) // 2
    ).astype(np.float32) / 32768.0
    return samples.reshape(-1, n_channels)


def _real_decode_features(payload: bytes, kind: str) -> list[float]:
    """16-dim feature from DECODED content: images → 4×4 grid of grayscale
    means (so the feature reflects pixel geometry, not container bytes);
    audio → RMS over 16 equal time windows."""
    if kind == "image" and payload[:2] == b"P6":
        px = decode_ppm(payload).astype(np.float32)
        gray = px.mean(axis=2)
        h, w = gray.shape
        rs = np.array_split(np.arange(h), 4)
        cs = np.array_split(np.arange(w), 4)
        return [
            float(gray[np.ix_(r, c)].mean()) if len(r) and len(c) else 0.0
            for r in rs
            for c in cs
        ]
    if kind == "audio" and payload[:4] == b"RIFF":
        mono = decode_wav(payload).mean(axis=1)
        chunks = np.array_split(mono, 16)
        return [
            float(np.sqrt((c * c).mean())) if len(c) else 0.0 for c in chunks
        ]
    raise NotImplementedError(
        f"real decode for kind={kind!r} with this container requires "
        "PIL/ffmpeg — not in sandbox (PPM images and PCM16 WAV decode here)"
    )


def synth_ppm_bytes(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic P6 PPM payload (test/datagen helper)."""
    rng = np.random.default_rng(seed)
    raster = rng.integers(0, 256, size=width * height * 3, dtype=np.uint8)
    return b"P6\n# synth\n%d %d\n255\n" % (width, height) + raster.tobytes()


def synth_wav_bytes(n_samples: int, n_channels: int = 1, rate: int = 8000,
                    seed: int = 0) -> bytes:
    """Deterministic PCM16 RIFF/WAVE payload (test/datagen helper)."""
    rng = np.random.default_rng(seed)
    data = rng.integers(-32768, 32768, size=n_samples * n_channels,
                        dtype=np.int16).tobytes()
    block = n_channels * 2
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + n_channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    chunks = fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def extract_features(
    media: DataFrame, fake_decode: bool = True, batch_hint: int = 0
) -> DataFrame:
    """mapInPandas decode/feature stage. Projects (media_id, kind, payload)
    only — metadata stays out of the Arrow channel."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if fake_decode:
                feats = pdf["payload"].map(_fake_decode_features)
            else:
                # real decode: PPM images and PCM16 WAV audio decode with
                # numpy alone; other containers raise NotImplementedError
                # (the PIL/ffmpeg slot on a real cluster)
                feats = pd.Series(
                    [
                        _real_decode_features(b, k)
                        for b, k in zip(pdf["payload"], pdf["kind"])
                    ],
                    index=pdf.index,
                    dtype=object,
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "payload_sha": pdf["payload"].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "feature": feats,
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


# ------------------------------------------------ JVM-side payload builders
# Deterministic container payloads built with PURE JVM expressions
# (hex-string assembly + unhex) so an end-to-end decode query needs no
# Python until the single mapInPandas decode stage, and the decoded
# features have a closed form an external SQL oracle can recompute.

def _byte_hex(v) -> "F.Column":
    """2-char hex of a 0..255 long column."""
    return F.lpad(F.hex(v), 2, "0")


def synth_ppm_col(seed_col, width: int = 4, height: int = 4) -> "F.Column":
    """Binary P6 PPM payload column: pixel p (row-major) has all three
    channels equal to (seed*31 + p*17) % 256. With width=height=4 the
    4×4-grid grayscale feature of :func:`_real_decode_features` is exactly
    feature[k] = (seed*31 + k*17) % 256 — the closed form a SQL oracle
    recomputes without decoding."""
    header_hex = f"P6\n{width} {height}\n255\n".encode().hex()
    raster = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), F.lit(width * height - 1)),
            lambda p: F.repeat(
                _byte_hex(F.pmod(seed_col * 31 + p * 17, F.lit(256))), 3
            ),
        ),
    )
    return F.unhex(F.concat(F.lit(header_hex), raster))


def synth_wav_col(seed_col, n_samples: int = 32) -> "F.Column":
    """Binary mono PCM16 RIFF/WAVE payload column: sample i carries value
    v_w = ((seed*5 + w*9) % 100) * 40 where w = i // (n_samples/16) — every
    16th-window is constant, and v_w < 4096 keeps v², v/32768 and the
    window RMS exactly representable in float32, so the decoded RMS feature
    satisfies round(feature[w] * 32768) == v_w exactly (the SQL-oracle
    closed form)."""
    if n_samples % 16:
        raise ValueError("n_samples must be a multiple of 16")
    per_win = n_samples // 16
    data_bytes = n_samples * 2
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    header = (
        b"RIFF" + (4 + len(fmt) + 8 + data_bytes).to_bytes(4, "little")
        + b"WAVE" + fmt + b"data" + data_bytes.to_bytes(4, "little")
    )
    v = lambda i: F.pmod(  # noqa: E731 — local closure over seed_col
        seed_col * 5 + F.floor(i / per_win).cast("long") * 9, F.lit(100)
    ) * 40
    samples = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), F.lit(n_samples - 1)),
            lambda i: F.concat(
                _byte_hex(F.pmod(v(i), F.lit(256))),
                _byte_hex(F.floor(v(i) / 256).cast("long")),
            ),
        ),
    )
    return F.unhex(F.concat(F.lit(header.hex()), samples))
