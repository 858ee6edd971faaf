"""From-scratch baseline JPEG codec tests (avro_diff_spark/jpeg.py).

Self-round-trip alone cannot pin table layouts (a zigzag error on both
sides cancels), so the decoder is ALSO pinned against a hand-assembled
bytestream whose entropy bits were derived by hand from the T.81 Annex K
canonical code assignment, with expected pixels computed by an
independent longhand IDCT.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from avro_diff_spark.jpeg import (
    HUFF_AC_LUMA,
    HUFF_DC_LUMA,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    quality_tables,
)

Q16 = np.full((8, 8), 16, np.int64)


def _longhand_idct(coef: np.ndarray) -> np.ndarray:
    """Independent orthonormal 2-D IDCT (explicit loops, math.cos)."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    au = math.sqrt(1 / 8) if u == 0 else 0.5
                    av = math.sqrt(1 / 8) if v == 0 else 0.5
                    s += (
                        au * av * coef[u, v]
                        * math.cos((2 * y + 1) * u * math.pi / 16)
                        * math.cos((2 * x + 1) * v * math.pi / 16)
                    )
            out[y, x] = s
    return out


def _dht(tc: int, th: int, spec) -> bytes:
    bits, values = spec
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def test_decode_hand_assembled_stream():
    """8x8 grayscale, DQT all 16, one block: DC diff +4 (code 100 + bits
    100), AC at zigzag index 1 = +2 (code 01 + bits 10), EOB (1010),
    1-padded to 0x91 0xAB. Pins canonical Huffman assignment, zigzag DC/AC
    placement, dequantization, and the IDCT normalization against values
    derived outside the codec."""
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([16] * 64)
    sof = b"\xff\xc0" + struct.pack(">H", 11) + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    payload = (
        b"\xff\xd8" + dqt + sof
        + _dht(0, 0, HUFF_DC_LUMA) + _dht(1, 0, HUFF_AC_LUMA)
        + sos + bytes([0x91, 0xAB]) + b"\xff\xd9"
    )
    out = decode_jpeg(payload)
    assert out.shape == (8, 8, 1)
    coef = np.zeros((8, 8))
    coef[0, 0] = 4 * 16
    r, c = ZIGZAG[1]
    coef[r, c] = 2 * 16
    expected = np.clip(np.round(_longhand_idct(coef) + 128.0), 0, 255).astype(np.uint8)
    assert (out[:, :, 0] == expected).all()


def test_flat_grayscale_exact_roundtrip():
    img = np.full((24, 17), 140, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant_tables=(Q16, Q16)))
    assert out.shape == (24, 17, 1)
    assert (out[:, :, 0] == 140).all()


def test_blockwise_flat_grayscale_exact():
    rng = np.random.default_rng(7)
    blocks = (2 * rng.integers(0, 128, size=(3, 4))).astype(np.uint8)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)[:21, :29]
    out = decode_jpeg(encode_jpeg(img, quant_tables=(Q16, Q16)))
    assert (out[:, :, 0] == img).all()


def test_color_420_fixture_law_exact():
    """The synth_jpeg_media law: blockwise-flat luma, flat chroma, 4:2:0 —
    decoded RGB must be bit-exactly (v+14, v-4, v-18)."""
    for mid in (0, 1, 17, 371, 499):
        w, h = 8 + mid % 25, 8 + mid % 18
        bx, by = np.arange(w) // 8, np.arange(h) // 8
        v = 2 * (9 + (mid * 31 + bx[None, :] * 7 + by[:, None] * 13) % 111)
        rgb = np.stack([v + 14, v - 4, v - 18], -1).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(rgb, subsampling="4:2:0", quant_tables=(Q16, Q16)))
        assert (dec == rgb).all(), f"id={mid}"


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:2", "4:2:0"])
@pytest.mark.parametrize("restart_interval", [0, 2])
def test_natural_color_roundtrip_psnr(subsampling, restart_interval):
    x, y = np.meshgrid(np.arange(40), np.arange(33))
    img = np.stack([(x * 5 + y) % 256, (x + y * 3) % 256, (x * 2 + y * 2) % 256], -1).astype(np.uint8)
    dec = decode_jpeg(
        encode_jpeg(img, quality=92, subsampling=subsampling, restart_interval=restart_interval)
    )
    assert dec.shape == img.shape
    mse = np.mean((dec.astype(float) - img) ** 2)
    psnr = 10 * np.log10(255**2 / mse)
    assert psnr > (35 if subsampling == "4:4:4" else 26), psnr


def test_natural_gray_high_quality_psnr():
    x, y = np.meshgrid(np.arange(64), np.arange(48))
    img = ((x * 3 + y * 2 + np.sin(x / 5) * 40) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))[:, :, 0]
    mse = np.mean((dec.astype(float) - img) ** 2)
    assert 10 * np.log10(255**2 / mse) > 40


def test_sixteen_bit_dqt_decodes():
    """A 16-bit-precision DQT (Pq=1) must parse to the same table."""
    img = np.full((8, 8), 200, np.uint8)
    payload = bytearray(encode_jpeg(img, quant_tables=(Q16, Q16)))
    # rewrite the 8-bit DQT segment as 16-bit precision in place
    i = payload.index(b"\xff\xdb")
    zz16 = b"".join(struct.pack(">H", 16) for _ in range(64))
    seg16 = b"\xff\xdb" + struct.pack(">H", 2 + 1 + 128) + bytes([0x10]) + zz16
    payload = payload[:i] + seg16 + payload[i + 4 + 65 :]
    out = decode_jpeg(bytes(payload))
    assert (out[:, :, 0] == 200).all()


def test_rejects_progressive_and_garbage():
    img = np.full((8, 8), 100, np.uint8)
    payload = bytearray(encode_jpeg(img))
    payload[payload.index(b"\xff\xc0") + 1] = 0xC9  # SOF0 -> SOF9 (arithmetic)
    with pytest.raises(ValueError, match="unsupported JPEG mode"):
        decode_jpeg(bytes(payload))
    # a baseline stream relabeled SOF2 is structurally invalid as
    # progressive (its single scan claims the whole spectrum with Ss=0)
    payload[payload.index(b"\xff\xc9") + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan"):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(img)[:40])  # truncated before SOS


def test_quality_tables_are_annex_k_at_50():
    ql, qc = quality_tables(50)
    from avro_diff_spark.jpeg import QUANT_CHROMA, QUANT_LUMA

    assert (ql == QUANT_LUMA).all() and (qc == QUANT_CHROMA).all()
    ql1, _ = quality_tables(100)
    assert (ql1 == 1).all()


def test_auto_decoder_routes_jpeg_real():
    from avro_diff_spark.multimodal import auto_image_decoder

    img = np.full((16, 9), 120, np.uint8)
    stats = auto_image_decoder(encode_jpeg(img, quant_tables=(Q16, Q16)))
    assert (stats["width"], stats["height"], stats["channels"]) == (9, 16, 1)
    assert stats["mean_byte"] == 120.0


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31),
    quality=st.integers(70, 100),
)
def test_roundtrip_psnr_property_gray(w, h, seed, quality):
    """Any grayscale image at quality >= 70 reconstructs above 28 dB and
    with exact shape — including 1-pixel strips and non-multiple-of-8
    sizes (crop/pad paths)."""
    rng = np.random.default_rng(seed)
    # smooth-ish content (pure noise is the adversarial case for DCT and
    # has no PSNR guarantee at any codec's settings)
    base = rng.integers(0, 256, size=(max(1, h // 4) + 1, max(1, w // 4) + 1))
    img = np.kron(base, np.ones((4, 4)))[:h, :w].astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=quality))
    assert dec.shape == (h, w, 1)
    mse = np.mean((dec[:, :, 0].astype(float) - img) ** 2)
    if mse > 0:
        assert 10 * np.log10(255**2 / mse) > 28, (w, h, quality, mse)


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 33),
    h=st.integers(1, 26),
    seed=st.integers(0, 2**31),
    subsampling=st.sampled_from(["4:4:4", "4:2:2", "4:2:0"]),
)
def test_roundtrip_shape_property_color(w, h, seed, subsampling):
    """Every (size, subsampling) combination round-trips with the exact
    input shape — MCU padding and chroma up/downsampling never leak into
    the output geometry."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling=subsampling))
    assert dec.shape == (h, w, 3)
