"""From-scratch PNG codec tests (avro_diff_spark/png.py, round 5).

The decoder backs the multimodal tier's real compressed-image path
(multimodal.real_image_decoder), so it earns the same treatment as the
raw-Snappy decoder: hypothesis fuzz over shapes/filters/color types, exact
pixel assertions, scope-violation rejection, and the end-to-end
image_features path on Spark.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from avro_diff_spark.png import SIGNATURE, _chunk, decode_png, encode_png


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_fuzz(w, h, ch, seed):
    """Any 8-bit image round-trips exactly under per-row random filters —
    every predictor branch (None/Sub/Up/Average/Paeth) is hit."""
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, (h, w, ch), dtype=np.uint8)
    filters = rng.randint(0, 5, h).tolist()
    back = decode_png(encode_png(arr, filters=filters))
    assert back.shape == arr.shape
    assert (back == arr).all()


def test_each_filter_alone():
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (9, 11, 3), dtype=np.uint8)
    for ft in range(5):
        assert (decode_png(encode_png(arr, filters=ft)) == arr).all(), ft


def test_palette_decode():
    rng = np.random.RandomState(5)
    pal = np.array([[i, 255 - i, (i * 3) % 256] for i in range(256)], dtype=np.uint8)
    idx = rng.randint(0, 256, (5, 7), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 7, 5, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(5))
    data = (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(data) == pal[idx]).all()


def test_idat_may_split_across_chunks():
    """The spec allows any number of IDAT chunks; the zlib stream is their
    concatenation."""
    arr = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    data = encode_png(arr)
    # re-frame: split the single IDAT into two chunks
    pos = len(SIGNATURE)
    chunks = []
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        chunks.append((ctype, body))
        pos += 12 + length
    out = SIGNATURE
    for ctype, body in chunks:
        if ctype == b"IDAT" and len(body) > 2:
            out += _chunk(b"IDAT", body[:2]) + _chunk(b"IDAT", body[2:])
        else:
            out += _chunk(ctype, body)
    assert (decode_png(out) == arr).all()


def test_rejects_out_of_scope_and_corrupt():
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    good = encode_png(arr)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good)
    # flip one IDAT byte: chunk CRC must catch it
    bad = bytearray(good)
    idat_at = good.index(b"IDAT") + 4
    bad[idat_at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # 16-bit depth is out of scope
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    data = SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"")) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(data)


def test_real_image_decoder_png_stats():
    from avro_diff_spark.multimodal import auto_image_decoder, real_image_decoder

    arr = np.arange(7 * 5 * 3, dtype=np.int64) % 256
    img = arr.astype(np.uint8).reshape(5, 7, 3)
    payload = encode_png(img, filters=[0, 1, 2, 3, 4])
    feats = real_image_decoder(payload)
    assert feats == {
        "width": 7,
        "height": 5,
        "channels": 3,
        "mean_byte": float(arr.sum()) / arr.size,
    }
    assert auto_image_decoder(payload) == feats


def test_image_features_png_on_spark(spark, sf_dir):
    """End-to-end: synth_png_media -> image_features(real decoder) matches
    the closed-form pixel law for every document (the query the driver
    hash-checks, asserted here exactly in Python)."""
    from avro_diff_spark import multimodal as MM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    out = MM.image_features(
        MM.synth_png_media(docs, "doc_id"), decoder=MM.real_image_decoder
    ).collect()
    assert len(out) == 40
    for r in out:
        mid = r["media_id"]
        w, h = 1 + mid % 13, 1 + mid % 7
        n = w * h * 3
        expected_mean = float(sum((mid * 31 + i) % 256 for i in range(n))) / n
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert r["mean_byte"] == expected_mean, mid
