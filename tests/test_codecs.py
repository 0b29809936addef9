"""Pure-Python codec tests (operators/codecs.py): byte-exact round
trips, header-edge handling, and the Spark-side resize path."""

from __future__ import annotations

import numpy as np
import pytest

from quackml_spark.operators.codecs import (
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    ppm_frames,
    resize_nearest,
)


def test_ppm_round_trip():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(7, 13, 3), dtype=np.uint8)
    out = decode_ppm(encode_ppm(px))
    np.testing.assert_array_equal(out, px)


def test_ppm_comments_and_whitespace():
    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    raw = b"P6\n# a comment\n 4\t2 \n# another\n255\n" + px.tobytes()
    np.testing.assert_array_equal(decode_ppm(raw), px)


def test_ppm_truncated_raises():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(encode_ppm(px)[:-5])


def test_ppm_frames_concat():
    frames = [
        np.full((2, 4, 3), i * 10, dtype=np.uint8) for i in range(5)
    ]
    payload = b"".join(encode_ppm(f) for f in frames)
    out = list(ppm_frames(payload))
    assert len(out) == 5
    for got, want in zip(out, frames):
        np.testing.assert_array_equal(got, want)


def test_wav_round_trip():
    rng = np.random.default_rng(2)
    s = rng.integers(-32768, 32767, size=999, dtype=np.int16)
    out, rate = decode_wav(encode_wav(s, 16000))
    assert rate == 16000
    np.testing.assert_array_equal(out, s)


def test_wav_extra_chunk_skipped():
    s = np.arange(10, dtype=np.int16)
    data = encode_wav(s, 8000)
    # splice a LIST chunk between fmt and data (odd size → word-aligned)
    head, tail = data[:36], data[36:]
    import struct

    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    out, rate = decode_wav(head + extra + tail)
    np.testing.assert_array_equal(out, s)


def test_wav_rejects_stereo():
    s = np.zeros(10, dtype=np.int16)
    data = bytearray(encode_wav(s, 8000))
    data[22] = 2  # channels field
    with pytest.raises(ValueError, match="mono"):
        decode_wav(bytes(data))


def test_resize_nearest_identity_and_downscale():
    px = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    np.testing.assert_array_equal(resize_nearest(px, 4, 2), px)
    half = resize_nearest(px, 2, 1)
    assert half.shape == (1, 2, 3)
    np.testing.assert_array_equal(half[0, 0], px[0, 0])
    np.testing.assert_array_equal(half[0, 1], px[0, 2])


def test_spark_resize_image_path(spark, sf_dir):
    from quackml_spark.operators.multimodal import codec_media_table, resize_image

    media = codec_media_table(spark, sf_dir)
    resized = resize_image(media, max_dim=8)
    rows = resized.limit(20).collect()
    assert rows
    for r in rows:
        assert max(r["width"], r["height"]) == 8
        px = decode_ppm(bytes(r["payload"]))
        assert px.shape == (r["height"], r["width"], 3)


# ---------------------------------------------------------------------------
# property tests: ANY image/sample content round-trips byte-exactly
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(1, 32),
    h=st.integers(1, 32),
    seed=st.integers(0, 2**31 - 1),
)
def test_ppm_round_trip_property(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(px)), px)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(0, 4096),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_round_trip_property(n, rate, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=n).astype(np.int16)
    out, r = decode_wav(encode_wav(s, rate))
    assert r == rate
    np.testing.assert_array_equal(out, s)


@settings(max_examples=30, deadline=None)
@given(
    n_frames=st.integers(1, 8),
    w=st.integers(1, 8),
    h=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
def test_ppm_frames_property(n_frames, w, h, seed):
    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for _ in range(n_frames)
    ]
    out = list(ppm_frames(b"".join(encode_ppm(f) for f in frames)))
    assert len(out) == n_frames
    for got, want in zip(out, frames):
        np.testing.assert_array_equal(got, want)


def test_ppm_frames_width_255_regression():
    """A frame whose width token is 255 used to break the next-frame
    offset (the old code searched for the literal b"255\n", which the
    header token "255 2\n" also contains). The offset now comes from
    the header parse itself."""
    rng = np.random.default_rng(7)
    frames = [
        rng.integers(0, 256, size=(2, 255, 3), dtype=np.uint8),
        rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8),
    ]
    out = list(ppm_frames(b"".join(encode_ppm(f) for f in frames)))
    assert len(out) == 2
    for got, want in zip(out, frames):
        np.testing.assert_array_equal(got, want)


def test_audio_features_dominant_frequency_on_sine(spark):
    """The rfft path must locate a synthesized tone's spectral peak
    (within the rate/n resolution), count its zero crossings exactly
    (2 per cycle), and report its RMS (amp/sqrt(2) for a pure sine)."""
    import math

    import numpy as np

    from quackml_spark.operators.codecs import WAV_MIME, encode_wav
    from quackml_spark.operators.multimodal import audio_features

    rate, n = 8000, 4000  # 0.5 s -> 2 Hz resolution
    rows = []
    for doc_id, freq in ((1, 440.0), (2, 1000.0)):
        t = np.arange(n) / rate
        s = (8000 * np.sin(2 * math.pi * freq * t)).astype(np.int16)
        rows.append((doc_id, "audio", WAV_MIME, bytearray(encode_wav(s, rate))))
    df = spark.createDataFrame(
        rows, "doc_id long, modality string, mime string, payload binary"
    )
    out = {r["doc_id"]: r for r in audio_features(df).collect()}
    for doc_id, freq in ((1, 440.0), (2, 1000.0)):
        r = out[doc_id]
        assert abs(r["dominant_freq_hz"] - freq) <= rate / n + 1e-9
        # 2 sign transitions per full cycle over 0.5 s
        assert abs(r["n_zero_cross"] - 2 * freq * 0.5) <= 2
        assert abs(r["rms"] - 8000 / math.sqrt(2)) < 40


def test_audio_features_silence_and_empty(spark):
    import numpy as np

    from quackml_spark.operators.codecs import WAV_MIME, encode_wav
    from quackml_spark.operators.multimodal import audio_features

    rows = [
        (1, "audio", WAV_MIME, bytearray(encode_wav(np.zeros(100, dtype=np.int16)))),
        (2, "audio", WAV_MIME, bytearray(encode_wav(np.zeros(0, dtype=np.int16)))),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, modality string, mime string, payload binary"
    )
    out = {r["doc_id"]: r for r in audio_features(df).collect()}
    assert out[1]["rms"] == 0.0 and out[1]["dominant_freq_hz"] == 0.0
    assert out[2]["n_samples"] == 0 and out[2]["rms"] == 0.0


def _ppm_media_rows(images):
    """[(doc_id, (h,w,3) uint8 array)] -> media rows."""
    from quackml_spark.operators.codecs import PPM_MIME, encode_ppm

    return [
        (doc_id, "image", PPM_MIME, bytearray(encode_ppm(px)))
        for doc_id, px in images
    ]


def test_dhash_robust_to_noise_separates_distinct(spark):
    """A lightly-noised copy stays within hamming<=4 of its original
    (exact pixel_md5 dedup misses it); a structurally different image
    lands far away."""
    import numpy as np

    from quackml_spark.operators.multimodal import dhash_images, dhash_near_dup_pairs

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    noisy = np.clip(
        base.astype(np.int16) + rng.randint(-6, 7, base.shape), 0, 255
    ).astype(np.uint8)
    other = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        _ppm_media_rows([(1, base), (2, noisy), (3, other)]),
        "doc_id long, modality string, mime string, payload binary",
    )
    hashes = dhash_images(df)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dhash_near_dup_pairs(hashes, max_hamming=4).collect()
    }
    assert (1, 2) in pairs  # noisy copy found
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_dhash_band_candidates_equal_bruteforce(spark):
    """The pigeonhole band join must find EXACTLY the pairs a
    brute-force hamming scan finds at the same threshold."""
    import numpy as np

    from quackml_spark.operators.multimodal import dhash_images, dhash_near_dup_pairs

    rng = np.random.RandomState(11)
    imgs = []
    base = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    for i in range(12):
        px = base.copy()
        # progressively larger perturbations
        px[: i + 1] = np.clip(
            px[: i + 1].astype(np.int16) + rng.randint(-40, 41, px[: i + 1].shape),
            0,
            255,
        ).astype(np.uint8)
        imgs.append((i, px))
    df = spark.createDataFrame(
        _ppm_media_rows(imgs),
        "doc_id long, modality string, mime string, payload binary",
    )
    hashes = {r["doc_id"]: r["dhash"] & ((1 << 64) - 1)
              for r in dhash_images(df).collect()}
    brute = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for a in hashes
        for b in hashes
        if a < b and bin(hashes[a] ^ hashes[b]).count("1") <= 3
    }
    banded = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dhash_near_dup_pairs(
            dhash_images(df), max_hamming=3, band_bits=8
        ).collect()
    }
    assert banded == brute


def test_decode_wav_rejects_truncated_and_odd_sizes():
    """The declared data-chunk size is untrusted input: oversized
    declarations silently truncated the sample stream; odd sizes
    crashed frombuffer with an opaque message (review catch)."""
    import struct

    import numpy as np
    import pytest as _pytest

    from quackml_spark.operators.codecs import decode_wav, encode_wav

    good = encode_wav(np.arange(10, dtype=np.int16))
    # declare 4 more bytes than exist
    oversized = good[:40] + struct.pack("<I", 24) + good[44:]
    with _pytest.raises(ValueError, match="truncated"):
        decode_wav(oversized)
    odd = good[:40] + struct.pack("<I", 19) + good[44:]
    with _pytest.raises(ValueError, match="odd byte size"):
        decode_wav(odd)


def test_canonical_pixel_md5_keeps_odd_sized_images(spark):
    """An image whose dimensions are not integer multiples of the canon
    grid must still appear in the dedup report (as its own raw-hash
    class) — it used to vanish entirely (review catch)."""
    from quackml_spark.operators.codecs import encode_ppm
    from quackml_spark.operators.multimodal import canonical_pixel_md5

    import numpy as np

    def img(seed, w, h):
        i = np.arange(w * h * 3, dtype=np.int64)
        return encode_ppm(((seed * 31 + i * 7) % 256).astype(np.uint8).reshape(h, w, 3))

    rows = [
        (0, "image", "image/x-portable-pixmap", 8, 4, None, img(1, 8, 4)),
        (1, "image", "image/x-portable-pixmap", 10, 4, None, img(2, 10, 4)),  # 10 % 8 != 0
    ]
    media = spark.createDataFrame(
        rows,
        "doc_id bigint, modality string, mime string, width int, "
        "height int, duration_s double, payload binary",
    )
    out = {r["doc_id"]: r["canon_md5"] for r in canonical_pixel_md5(media).collect()}
    assert set(out) == {0, 1}
    assert out[1].startswith("raw:")
