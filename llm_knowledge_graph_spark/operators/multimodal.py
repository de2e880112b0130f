"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata.

IMAGE decode is REAL (round 4): a pure-stdlib decoder handles PNG
(zlib inflate + struct chunk walk + all five scanline filters of the
spec — None/Sub/Up/Average/Paeth, 8-bit grey and RGB, non-interlaced)
and binary PPM (P6), with a matching minimal PNG encoder so tests and
the driver query synthesize REAL payloads and roundtrip them exactly.
`extract_features(fake=False)` and `resize_images(fake=False)` run end
to end on those payloads. AUDIO decode is REAL too (round 4, second
batch): stdlib `wave` handles mono 16-bit PCM WAV, featurized with an
integer-exact amplitude histogram. VIDEO frame decode remains the one
stub behind NotImplementedError (container parsing genuinely needs
ffmpeg, which this container lacks); `fake=True` keeps the
deterministic stand-in for all kinds so the Spark-side plumbing —
schema, Arrow batch shape, mapInPandas partitioning, 1→N frame fan-out
— is exercised for every modality either way.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_encode(arr: np.ndarray, filter_choice=0) -> bytes:
    """Minimal stdlib PNG writer: 8-bit greyscale (h, w) / (h, w, 1) or
    RGB (h, w, 3), non-interlaced. ``filter_choice`` is a per-row filter
    type (int 0-4) or a callable row→type — cycling it exercises every
    decoder filter branch in the roundtrip tests."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in (1, 3):
        raise ValueError(f"unsupported channel count {ch}")
    color = 0 if ch == 1 else 2
    stride = w * ch
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = arr[y].reshape(-1).astype(np.int32)
        f = filter_choice(y) if callable(filter_choice) else filter_choice
        if f == 0:
            filt = line
        elif f == 1:   # Sub
            left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            filt = line - left
        elif f == 2:   # Up
            filt = line - prev
        elif f == 3:   # Average
            left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            filt = line - ((left + prev) >> 1)
        elif f == 4:   # Paeth
            left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]])
            upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
            pred = np.array([_paeth(int(a), int(b), int(c))
                             for a, b, c in zip(left, prev, upleft)],
                            dtype=np.int32)
            filt = line - pred
        else:
            raise ValueError(f"bad filter {f}")
        raw.append(f)
        raw.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + chunk(b"IEND", b""))


def _png_decode(data: bytes) -> np.ndarray:
    """Stdlib PNG reader for the encoder's subset of the spec (8-bit
    grey/RGB, non-interlaced) with FULL filter support (types 0-4) and a
    CRC check per chunk. Returns uint8 (h, w, channels).

    Known limitation (round-5 ADVICE): the Average/Paeth filter rows
    unfilter with a per-pixel Python loop over the stride — their
    predictors are nonlinear in the already-reconstructed left
    neighbour, so the recurrence doesn't vectorize. Acceptable for the
    bounded synthetic test corpus (24 tiny images); at real-payload
    scale this operator would swap in libpng/Pillow behind the same UDF
    signature (the Spark-side plumbing — schema, partitioning, Arrow
    batch shape — is what this stdlib decoder proves). The None/Up
    paths are vectorized mod-256 adds, and Sub is a per-channel-lane
    uint8 cumsum (wraparound accumulation IS the mod-256 recurrence)."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    ihdr = None
    idat = bytearray()
    pos = 8
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color not in (0, 2) or comp or filt or interlace:
        raise NotImplementedError(
            f"PNG variant unsupported by the stdlib decoder: depth={depth} "
            f"color={color} interlace={interlace} (8-bit grey/RGB only)")
    ch = 1 if color == 0 else 3
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    for y in range(h):
        f = raw[p]
        p += 1
        line = np.frombuffer(raw, np.uint8, count=stride, offset=p).copy()
        p += stride
        if f == 0:
            cur = line
        elif f == 2:                      # Up: vectorized mod-256 add
            cur = line + prev
        elif f == 1:                      # Sub: per-lane uint8 cumsum
            cur = np.cumsum(line.reshape(w, ch), axis=0,
                            dtype=np.uint8).reshape(stride)
        elif f in (3, 4):                 # left-dependent: sequential in x
            cur = line.astype(np.int32)
            pv = prev.astype(np.int32)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                if f == 3:
                    pred = (a + int(pv[x])) >> 1
                else:
                    c = int(pv[x - ch]) if x >= ch else 0
                    pred = _paeth(a, int(pv[x]), c)
                cur[x] = (cur[x] + pred) & 0xFF
            cur = cur.astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, ch)


def ppm_encode(arr: np.ndarray) -> bytes:
    """Binary PPM (P6) writer: uint8 RGB (h, w, 3)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError("PPM is RGB-only")
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def _ppm_decode(data: bytes) -> np.ndarray:
    """Binary PPM (P6) reader (maxval 255, '#' comments allowed)."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    fields: list = []
    p = 2
    while len(fields) < 3:
        while p < len(data) and data[p:p + 1].isspace():
            p += 1
        if data[p:p + 1] == b"#":
            while p < len(data) and data[p] != 0x0A:
                p += 1
            continue
        start = p
        while p < len(data) and not data[p:p + 1].isspace():
            p += 1
        fields.append(int(data[start:p]))
    p += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("PPM maxval != 255 unsupported")
    pix = np.frombuffer(data, np.uint8, count=h * w * 3, offset=p)
    return pix.reshape(h, w, 3).copy()


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Real image decode, stdlib-only: PNG (full filter set, 8-bit
    grey/RGB) or binary PPM. Other formats (JPEG etc.) genuinely need
    external codecs and raise."""
    if payload and payload.startswith(_PNG_SIG):
        return _png_decode(payload)
    if payload and payload.startswith(b"P6"):
        return _ppm_decode(payload)
    raise NotImplementedError(
        "only PNG/PPM have a stdlib decode path; JPEG/WebP need "
        "pillow/libjpeg — not available in this container")


def _image_feature(arr: np.ndarray, bins: int = 16) -> np.ndarray:
    """Deterministic real feature: L2-normalized ``bins``-bin luminance
    histogram (integer-exact binning — uint8 >> 4 for 16 bins)."""
    if arr.shape[2] == 3:
        # integer Rec.601-ish luma: (77R + 150G + 29B) >> 8, exact in int32
        a = arr.astype(np.int32)
        lum = ((77 * a[..., 0] + 150 * a[..., 1] + 29 * a[..., 2]) >> 8)
    else:
        lum = arr[..., 0].astype(np.int32)
    hist = np.bincount((lum >> 4).reshape(-1), minlength=bins)[:bins]
    v = hist.astype(np.float32)
    n = float(np.linalg.norm(v)) or 1.0
    return v / n


def wav_encode(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal REAL WAV encoder (stdlib `wave`): mono 16-bit PCM from an
    int16 sample array. Little-endian explicitly — WAV's wire format —
    so payloads are byte-identical across platforms."""
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Real audio decode, stdlib-only: mono 16-bit PCM WAV → (int16
    samples, rate). Other encodings (MP3/OGG/multi-channel/float WAV)
    genuinely need external codecs and raise — honest strictness,
    matching the PNG/PPM-only image path."""
    import io
    import wave
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2 or w.getnchannels() != 1:
                raise NotImplementedError(
                    "only mono 16-bit PCM WAV has a stdlib decode path")
            samples = np.frombuffer(
                w.readframes(w.getnframes()), dtype="<i2")
            return samples, w.getframerate()
    except (wave.Error, EOFError) as e:
        # non-RIFF bytes (MP3/OGG/...) — same loud-failure contract as
        # the non-PNG/PPM image path, never fabricated samples
        raise NotImplementedError(
            f"only WAV has a stdlib decode path ({e})") from e


def _audio_feature(samples: np.ndarray, bins: int = 16) -> np.ndarray:
    """Deterministic real audio feature: L2-normalized ``bins``-bin
    amplitude histogram (integer-exact binning — the shifted uint16
    sample's top log2(bins) bits; bins must be a power of two), the
    audio twin of the image luma histogram."""
    if bins & (bins - 1):
        raise ValueError(f"bins must be a power of two, got {bins}")
    shift = 16 - (bins.bit_length() - 1)
    hist = np.bincount(
        ((samples.astype(np.int32) + 32768) >> shift), minlength=bins)[:bins]
    v = hist.astype(np.float32)
    n = float(np.linalg.norm(v)) or 1.0
    return v / n


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

    ``fake=True``: deterministic digest features for EVERY kind (the
    plumbing stand-in). ``fake=False``: REAL decode — image rows are
    PNG/PPM-decoded and featurized with the luminance histogram, audio
    rows are WAV-decoded (stdlib `wave`) and featurized with the
    amplitude histogram; video rows pass through with a null feature
    (frame decode needs ffmpeg, which this container lacks — nulls,
    not fabricated values).

    Partitioning: upstream should `repartition` by size so decode work
    balances; Arrow batches bound per-batch memory (payloads never
    accumulate beyond one batch per task).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = [
                    _decode_fake(p).tolist() if p is not None else None
                    for p in pdf["payload"]
                ]
            else:
                feats = []
                for k, p in zip(pdf["kind"], pdf["payload"]):
                    if p is None or k == "video":
                        feats.append(None)
                    elif k == "image":
                        feats.append(
                            _image_feature(_decode_image_real(p)).tolist())
                    elif k == "audio":
                        feats.append(
                            _audio_feature(_wav_decode(p)[0]).tolist())
                    else:
                        feats.append(None)
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


def _resize_real(payload: bytes, w: int, h: int) -> bytes:
    """Real resize: decode (PNG/PPM) → deterministic nearest-neighbor
    resample (integer index arithmetic, no float rounding ambiguity) →
    re-encode as PNG filter-0."""
    arr = _decode_image_real(payload)
    src_h, src_w = arr.shape[:2]
    ys = (np.arange(h, dtype=np.int64) * src_h) // h
    xs = (np.arange(w, dtype=np.int64) * src_w) // w
    return png_encode(arr[ys][:, xs], filter_choice=0)


def resize_images(media: DataFrame, width: int = 32, height: int = 32,
                  fake: bool = True) -> DataFrame:
    """Resize over image rows: mapInPandas binary→binary with typed size
    metadata. ``fake=True`` emits a deterministic digest payload (the
    plumbing stand-in); ``fake=False`` runs the REAL decode → nearest-
    neighbor resample → PNG re-encode, so the output payload is itself a
    decodable image of exactly (height, width)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["kind"] == "image"]
            if fake:
                out = [
                    bytes(hashlib.blake2b(
                        (p or b"") + width.to_bytes(4, "big")
                        + height.to_bytes(4, "big"),
                        digest_size=32).digest()
                        * ((width * height + 31) // 32)
                    )[: width * height]
                    for p in img["payload"]
                ]
            else:
                # null payloads pass through as null rows (same contract
                # as extract_features' null features — never fabricate,
                # never fail the stage on a missing payload)
                out = [None if p is None else _resize_real(p, width, height)
                       for p in img["payload"]]
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
        # the one remaining stub: video frame decode genuinely needs
        # ffmpeg (no stdlib container parser exists) — fail loudly
        raise NotImplementedError(
            "video frame decode requires ffmpeg — not available in this "
            "container; use fake=True for the deterministic stand-in")

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


def synthesize_image_media(spark, n: int = 24, seed: int = 7) -> DataFrame:
    """Deterministic REAL image table: valid PNG payloads (grey and RGB,
    cycling every scanline filter type 0-4) and binary PPMs, with honest
    (width, height) metadata — the fake=False test/driver corpus."""
    import random
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        h, w = 5 + i % 7, 4 + (i * 3) % 9
        if i % 3 == 2:                      # PPM, RGB
            arr = np.array([[(rng.randrange(256), rng.randrange(256),
                              rng.randrange(256)) for _ in range(w)]
                            for _ in range(h)], dtype=np.uint8)
            payload, mime = ppm_encode(arr), "image/x-portable-pixmap"
        else:                               # PNG: grey or RGB
            ch = 1 if i % 3 == 0 else 3
            arr = np.array([[rng.randrange(256)
                             for _ in range(w * ch)] for _ in range(h)],
                           dtype=np.uint8).reshape(h, w, ch)
            payload = png_encode(arr, filter_choice=lambda y: y % 5)
            mime = "image/png"
        rows.append((i, "image", bytearray(payload), mime, w, h, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthesize_audio_media(spark, n: int = 16, seed: int = 9,
                           start_id: int = 1000) -> DataFrame:
    """Deterministic REAL audio table: valid mono 16-bit PCM WAV
    payloads (seeded random int16 samples at mixed rates) with honest
    duration_ms metadata — the fake=False test/driver corpus.
    ``start_id`` keeps media_id disjoint from synthesize_image_media so
    unions of the two stay joinable on media_id."""
    import random
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rate = (8000, 16000)[i % 2]
        n_frames = rate // 100 * (1 + i % 5)   # 10-50 ms of audio
        samples = np.array([rng.randrange(-32768, 32768)
                            for _ in range(n_frames)], dtype=np.int16)
        rows.append((start_id + i, "audio",
                     bytearray(wav_encode(samples, rate)),
                     "audio/wav", None, None,
                     n_frames * 1000 // rate))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


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
