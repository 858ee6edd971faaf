"""Progressive JPEG (SOF2) codec tests.

The strongest pin is equivalence: for the same image and quantizers the
progressive encoder emits the SAME quantized DCT coefficients as the
baseline encoder — only the scan structure differs — so the decoder must
reconstruct bit-identical pixels from both streams. Any error in spectral
selection, successive approximation (DC shift / AC magnitude split), EOB
runs, correction-bit ordering, or the multi-scan coefficient accumulation
breaks exact equality somewhere across the hypothesis shapes.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from avro_diff_spark.jpeg import (
    _SCRIPT_GRAY,
    decode_jpeg,
    encode_jpeg,
    encode_progressive_jpeg,
)


def _rand_img(seed: int, h: int, w: int, ch: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, ch)).astype(np.uint8)
    return img[:, :, 0] if ch == 1 else img


@settings(max_examples=40, deadline=None)
@given(
    st.integers(0, 10_000),
    st.integers(1, 40),
    st.integers(1, 40),
    st.sampled_from([1, 3]),
    st.sampled_from(["4:4:4", "4:2:0", "4:2:2"]),
    st.sampled_from([25, 60, 90]),
)
def test_progressive_equals_baseline(seed, h, w, ch, sub, quality):
    img = _rand_img(seed, h, w, ch)
    base = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=sub))
    prog = decode_jpeg(
        encode_progressive_jpeg(img, quality=quality, subsampling=sub)
    )
    assert prog.shape == base.shape
    assert np.array_equal(prog, base)


def test_blockwise_flat_is_exact():
    """The engineered-exactness construction behind the oracle query: flat
    DQT=16 + blockwise-flat even luma ⇒ the lossy round trip is lossless,
    progressive included."""
    mid = 1234
    w, h = 8 + mid % 25, 8 + mid % 18
    bx = np.arange(w) // 8
    by = np.arange(h) // 8
    v = 2 * (9 + (mid * 31 + bx[None, :] * 7 + by[:, None] * 13) % 111)
    rgb = np.stack([v + 14, v - 4, v - 18], axis=-1).astype(np.uint8)
    q16 = np.full((8, 8), 16, np.int64)
    out = decode_jpeg(
        encode_progressive_jpeg(rgb, subsampling="4:2:0", quant_tables=(q16, q16))
    )
    assert np.array_equal(out, rgb)


def test_eob_runs_span_blocks():
    """A large flat image makes every AC band zero for long block runs —
    the EOBn > EOB0 encoder/decoder path with extension bits."""
    img = np.full((64, 64), 130, np.uint8)
    out = decode_jpeg(encode_progressive_jpeg(img, quality=90))
    assert np.array_equal(out, decode_jpeg(encode_jpeg(img, quality=90)))


def test_custom_scan_script_spectral_only():
    """Spectral selection without successive approximation (Al=0
    everywhere) is a valid script; single-band-per-scan slicing must
    reassemble the full spectrum."""
    img = _rand_img(7, 24, 17, 1)
    scans = [
        ((0,), 0, 0, 0, 0),
        ((0,), 1, 2, 0, 0),
        ((0,), 3, 9, 0, 0),
        ((0,), 10, 63, 0, 0),
    ]
    out = decode_jpeg(encode_progressive_jpeg(img, quality=80, scans=scans))
    assert np.array_equal(out, decode_jpeg(encode_jpeg(img, quality=80)))


def test_deep_successive_approximation():
    """Three AC refinement levels on one band exercise repeated
    correction-bit passes over the same coefficients."""
    img = _rand_img(11, 16, 16, 1)
    scans = [
        ((0,), 0, 0, 0, 3),
        ((0,), 1, 63, 0, 3),
        ((0,), 0, 0, 1, 2),
        ((0,), 0, 0, 1, 1),
        ((0,), 0, 0, 1, 0),
        ((0,), 1, 63, 3, 2),
        ((0,), 1, 63, 2, 1),
        ((0,), 1, 63, 1, 0),
    ]
    # DC successive approximation only goes one bit per refinement scan
    out = decode_jpeg(encode_progressive_jpeg(img, quality=70, scans=scans))
    assert np.array_equal(out, decode_jpeg(encode_jpeg(img, quality=70)))


def test_default_scripts_shape():
    """Default scripts follow libjpeg jpeg_simple_progression: DC first
    (shifted), every AC band covered, every Al refined down to 0."""
    img = _rand_img(3, 9, 9, 3)
    payload = encode_progressive_jpeg(img)
    assert payload[:2] == b"\xff\xd8"
    assert b"\xff\xc2" in payload  # SOF2
    assert payload.count(b"\xff\xda") == 10  # 10 scans in the color script
    gray = encode_progressive_jpeg(img[:, :, 0], scans=_SCRIPT_GRAY)
    assert gray.count(b"\xff\xda") == len(_SCRIPT_GRAY)


def test_truncated_progressive_raises():
    img = _rand_img(5, 12, 12, 1)
    payload = encode_progressive_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) // 3])
