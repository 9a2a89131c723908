"""Pure-Python media codecs + REAL decode through the Spark pipeline."""

from __future__ import annotations

import math

import numpy as np
import pytest

from real_time_video_streaming_analytics_lakehouse_spark.operators.media_codecs import (
    audio_features,
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav_pcm16,
    image_features,
    resize_nearest,
)


def _gradient(h, w):
    """Deterministic RGB test image: distinct per-pixel values."""
    a = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            a[y, x] = ((y * 7 + x) % 256, (x * 5) % 256, (y * 11) % 256)
    return a


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (16, 9)])
def test_ppm_roundtrip(h, w):
    img = _gradient(h, w)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_ppm_header_comments_and_whitespace():
    img = _gradient(2, 2)
    data = encode_ppm(img)
    # inject a comment line into the header, per the spec
    hacked = data.replace(b"P6\n", b"P6\n# a comment\n", 1)
    assert np.array_equal(decode_ppm(hacked), img)
    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (16, 9)])
def test_bmp_roundtrip_with_row_padding(h, w):
    # w=5 and w=9 exercise non-zero 4-byte row padding
    img = _gradient(h, w)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError, match="BMP"):
        decode_bmp(b"JUNKJUNKJUNK")


def test_wav_roundtrip_and_features():
    rate = 8000
    t = np.arange(800)
    tone = (10000 * np.sin(2 * math.pi * 440 * t / rate)).astype(np.int16)
    data = encode_wav_pcm16(tone, sample_rate=rate)
    got_rate, ch, samples = decode_wav(data)
    assert (got_rate, ch) == (rate, 1)
    assert np.array_equal(samples[:, 0], tone)
    f = audio_features(samples)
    # 440 Hz over 0.1 s -> ~88 zero crossings; RMS of a sine = amp/sqrt(2)
    assert 80 <= f["zero_crossings"] <= 96
    assert f["rms"] == pytest.approx(10000 / 32768 / math.sqrt(2), rel=0.01)


def test_resize_nearest_exact_semantics():
    img = _gradient(4, 4)
    half = resize_nearest(img, 2, 2)
    # nearest with floor mapping picks source pixels (0,0),(0,2),(2,0),(2,2)
    assert np.array_equal(half, img[::2, ::2])
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 3)
    assert np.array_equal(up[::2, ::2], img)


def test_image_features_closed_form():
    img = np.full((2, 2, 3), 100, dtype=np.uint8)
    f = image_features(img)
    assert f["mean_r"] == f["mean_g"] == f["mean_b"] == 100.0
    assert f["luma_mean"] == pytest.approx(100.0)
    assert f["luma_std"] == pytest.approx(0.0)


def test_spark_pipeline_decodes_real_formats(spark):
    """REAL decode end-to-end through the Arrow-batched operators:
    true dimensions from the bytes, resize fingerprints computed over
    actually-resized re-encoded payloads, content-statistic embeddings."""
    import hashlib

    from real_time_video_streaming_analytics_lakehouse_spark.operators.media_codecs import (
        encode_bmp as ebmp,
        encode_ppm as eppm,
    )
    from real_time_video_streaming_analytics_lakehouse_spark.operators.multimodal import (
        decode_media_features,
        media_embeddings,
        resize_images,
    )

    img = _gradient(100, 40)  # taller than wide: height binds at 64x64
    tone = (8000 * np.sin(np.arange(1600) / 3.0)).astype(np.int16)
    rows = [
        (1, bytearray(eppm(img)), "ppm", 0),
        (2, bytearray(ebmp(img)), "bmp", 0),
        (3, bytearray(encode_wav_pcm16(tone, 8000)), "wav", 0),
        (4, bytearray(b"\x10\x20\x05" + b"fakejpegbytes"), "jpeg", 0),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_format string, payload_len int"
    )
    dec = {r["doc_id"]: r for r in decode_media_features(media).collect()}
    assert (dec[1]["width"], dec[1]["height"], dec[1]["n_frames"]) == (40, 100, 1)
    assert (dec[2]["width"], dec[2]["height"]) == (40, 100)
    assert (dec[3]["width"], dec[3]["height"], dec[3]["n_frames"]) == (1, 8000, 1600)
    # fake path still drives compressed formats
    assert dec[4]["width"] == 0x10 % 128 + 1

    res = {r["doc_id"]: r for r in
           resize_images(media.filter("doc_id <= 2")).collect()}
    # height binds: 100 -> 64, width 40*64//100 = 25
    for d in (1, 2):
        assert (res[d]["new_width"], res[d]["new_height"]) == (25, 64)
    resized = resize_nearest(img, 25, 64)
    assert res[1]["resized_fp"] == hashlib.md5(eppm(resized)).hexdigest()
    assert res[2]["resized_fp"] == hashlib.md5(ebmp(resized)).hexdigest()

    emb = {r["doc_id"]: r["embedding"] for r in media_embeddings(media).collect()}
    f = image_features(img)
    assert emb[1][0] == pytest.approx(f["mean_r"] / 255.0)
    assert emb[1] == pytest.approx(emb[2])  # same pixels, either codec
    assert emb[3][0] == pytest.approx(
        audio_features(decode_wav(bytes(rows[2][1]))[2])["rms"]
    )
