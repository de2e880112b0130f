"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata.

The decode step is STUBBED (pillow/ffmpeg are not in this container): decode
functions raise NotImplementedError unless `fake=True`, in which case a
deterministic fake decoder produces stable feature vectors so the Spark-side
plumbing — schema, Arrow batch shape, mapInPandas partitioning — is real and
tested. Swapping in a real decoder changes only `_decode_image_real`.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), True),     # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

FEATURE_SCHEMA = ("media_id long, kind string, n_bytes long, "
                  "feature array<float>, frames int")


def _decode_image_real(payload: bytes):
    raise NotImplementedError(
        "image decode requires pillow/libjpeg — not available in this "
        "container; use fake=True for the deterministic stand-in")


def _decode_fake(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic fake 'decoder': feature = normalized bytes of a
    blake2b digest. Stable across runs/executors."""
    h = hashlib.blake2b(payload or b"", digest_size=dim).digest()
    v = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    n = float(np.linalg.norm(v)) or 1.0
    return v / n


def extract_features(media: DataFrame, fake: bool = True,
                     batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Partitioning: upstream should `repartition` by size so decode work
    balances; Arrow batches bound per-batch memory (payloads never
    accumulate beyond one batch per task).
    """
    if not fake:
        _decode_image_real(b"")  # raises — real decoder not present

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_fake(p).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b else 0),
                "feature": feats,
                "frames": [1] * len(pdf),
            })

    return media.mapInPandas(gen, FEATURE_SCHEMA)


RESIZED_SCHEMA = ("media_id long, kind string, payload binary, "
                  "width int, height int")
FRAME_SCHEMA = ("media_id long, frame_idx int, ts_ms long, payload binary")


def _resize_real(payload: bytes, w: int, h: int):
    raise NotImplementedError(
        "image resize requires pillow — not available in this container; "
        "use fake=True for the deterministic stand-in")


def resize_images(media: DataFrame, width: int = 32, height: int = 32,
                  fake: bool = True) -> DataFrame:
    """Resize plumbing (image rows only): mapInPandas binary→binary with
    typed size metadata. The fake path emits a deterministic
    width*height-byte payload keyed by (payload, w, h) — the schema,
    filtering, and Arrow batch shape are the real contract; swapping in
    pillow changes only `_resize_real`."""
    if not fake:
        _resize_real(b"", width, height)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["kind"] == "image"]
            out = [
                bytes(hashlib.blake2b(
                    (p or b"") + width.to_bytes(4, "big")
                    + height.to_bytes(4, "big"),
                    digest_size=32).digest() * ((width * height + 31) // 32)
                )[: width * height]
                for p in img["payload"]
            ]
            yield pd.DataFrame({
                "media_id": img["media_id"],
                "kind": img["kind"],
                "payload": out,
                "width": [width] * len(img),
                "height": [height] * len(img),
            })

    return media.mapInPandas(gen, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 5000,
                  fake: bool = True) -> DataFrame:
    """Frame-sampling plumbing (video rows only): one input row explodes
    to ceil(duration/every_ms) frame rows inside the SAME mapInPandas
    batch (1→N row fan-out is the real contract a video decoder needs).
    Fake frame payload = digest(payload, frame_idx); deterministic."""
    if not fake:
        _resize_real(b"", 0, 0)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vid = pdf[pdf["kind"] == "video"]
            mid: list = []
            idx: list = []
            ts: list = []
            pay: list = []
            for m, p, dur in zip(vid["media_id"], vid["payload"],
                                 vid["duration_ms"]):
                dur = int(dur or 0)
                n_frames = max(1, (dur + every_ms - 1) // every_ms)
                for i in range(n_frames):
                    mid.append(m)
                    idx.append(i)
                    ts.append(i * every_ms)
                    pay.append(hashlib.blake2b(
                        (p or b"") + i.to_bytes(4, "big"),
                        digest_size=24).digest())
            yield pd.DataFrame({"media_id": mid, "frame_idx": idx,
                                "ts_ms": ts, "payload": pay})

    return media.mapInPandas(gen, FRAME_SCHEMA)


def synthesize_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table for tests."""
    import random
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.randrange(256) for _ in range(64 + i % 128))
        rows.append((i, kind, payload, f"application/x-{kind}",
                     64 if kind == "image" else None,
                     64 if kind == "image" else None,
                     1000 * (i % 30) if kind != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
