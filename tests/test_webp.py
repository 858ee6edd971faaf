"""WebP lossless (VP8L) codec tests.

The encoder emits literals-only streams, so the decoder's LZ77, color
cache, meta prefix, and transform paths are pinned by HAND-ASSEMBLED
bitstreams built per the public spec (RFC 9649) with closed-form expected
pixels — the same strategy as the GIF LZW and JPEG Huffman pins. The
encoder side is pinned by exact round-trips (VP8L is lossless).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from avro_diff_spark import webp as W


# ---------------------------------------------------------------- round trip

@settings(max_examples=40, deadline=None)
@given(
    st.integers(0, 10_000),
    st.integers(1, 24),
    st.integers(1, 24),
    st.sampled_from([1, 3, 4]),
)
def test_roundtrip_exact(seed, h, w, ch):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, ch)).astype(np.uint8)
    if ch == 1:
        img = img[:, :, 0]
    out = W.decode_webp(W.encode_webp(img))
    if ch == 1:
        assert np.array_equal(out, np.stack([img] * 3, axis=-1))
    elif ch == 4 and (img[:, :, 3] == 255).all():
        assert np.array_equal(out, img[:, :, :3])
    else:
        assert np.array_equal(out, img)


def test_constant_alpha_costs_one_symbol():
    """RGB input (alpha constant 255) must take the 1-symbol simple-code
    path — the per-pixel alpha cost is zero bits."""
    rng = np.random.RandomState(1)
    rgb = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    rgba = np.dstack([rgb, np.full((16, 16), 255, np.uint8)])
    assert len(W.encode_webp(rgb)) == len(W.encode_webp(rgba))


# ------------------------------------------------- hand-assembled bitstreams

def _container(body: bytes) -> bytes:
    body = b"\x2f" + body
    vp8l = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _header(bw: W._BitWriter, w: int, h: int) -> None:
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(0, 1)  # alpha hint
    bw.write_bits(0, 3)  # version


def _emit_normal_code(bw: W._BitWriter, lengths: dict[int, int], alphabet: int) -> dict:
    """Spec-form 'normal' prefix code: every one of the 19 code-length
    symbols gets a 5-bit code (Kraft 19/32 < 1, valid), then each alphabet
    slot's length is a literal. Returns symbol -> (code, len)."""
    bw.write_bits(0, 1)  # not simple
    bw.write_bits(15, 4)  # num_code_lengths = 19
    for _ in W._CL_ORDER:
        bw.write_bits(5, 3)
    bw.write_bits(0, 1)  # no explicit max_symbol
    cl_codes = W._canonical_codes(dict.fromkeys(range(19), 5))
    for sym in range(alphabet):
        code, ln = cl_codes[lengths.get(sym, 0)]
        bw.write_code(code, ln)
    nonzero = {s: l for s, l in lengths.items() if l}
    if len(nonzero) == 1:
        # single-symbol codes consume zero bits (decoder special case)
        return {next(iter(nonzero)): (0, 0)}
    return W._canonical_codes(nonzero)


def _one_symbol(bw: W._BitWriter, sym: int) -> None:
    """Simple prefix code with a single (0-bit) symbol."""
    bw.write_bits(1, 1)
    bw.write_bits(0, 1)
    bw.write_bits(1, 1)
    bw.write_bits(sym, 8)


def test_color_cache_and_lz77_direct_distance():
    """3 literals, one cache hit, then an LZ77 copy with a direct
    (code > 120) distance — decoded per spec against closed-form pixels."""
    w, h = 5, 2
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write_bits(0, 1)  # no transforms
    bw.write_bits(1, 1)  # color cache
    bw.write_bits(4, 4)  # cache_bits = 4
    bw.write_bits(0, 1)  # no meta prefix
    # green alphabet: 256 + 24 + 16; code: greens {10, 20}, length sym 256
    # (lz77 length 1..4 via extra bits), cache slot for pixel1
    px1 = (0xFF << 24) | (30 << 16) | (10 << 8) | 40
    slot1 = ((0x1E35A7BD * px1) & 0xFFFFFFFF) >> (32 - 4)
    g = _emit_normal_code(
        bw, {10: 2, 20: 2, 256: 2, 280 + slot1: 2}, 256 + 24 + 16
    )
    r = _emit_normal_code(bw, {30: 1, 31: 1}, 256)
    b = _emit_normal_code(bw, {40: 1, 41: 1}, 256)
    _one_symbol(bw, 255)  # alpha
    # distance symbol 13 + 5 extra bits 27 -> value 124 -> direct dist 4
    d = _emit_normal_code(bw, {13: 1}, 40)

    # pixel 0: (a=255, r=30, g=10, b=40) — lands in cache slot1
    bw.write_code(*g[10]); bw.write_code(*r[30]); bw.write_code(*b[40])
    # pixel 1: (255, 31, 20, 41)
    bw.write_code(*g[20]); bw.write_code(*r[31]); bw.write_code(*b[41])
    # pixel 2: (255, 30, 20, 40)
    bw.write_code(*g[20]); bw.write_code(*r[30]); bw.write_code(*b[40])
    # pixel 3: cache hit for pixel 0's ARGB
    bw.write_code(*g[280 + slot1])
    # pixels 4..9: six single-pixel LZ77 copies at direct distance 4
    for _ in range(6):
        bw.write_code(*g[256])  # length symbol 0 -> length 1
        bw.write_code(*d[13])
        bw.write_bits(27, 5)    # 96 + 27 + 1 = 124 -> dist 124 - 120 = 4
    payload = _container(bw.finish())
    out = W.decode_webp(payload)
    exp = np.zeros((2, 5, 3), np.uint8)
    exp[0, 0] = (30, 10, 40)
    exp[0, 1] = (31, 20, 41)
    exp[0, 2] = (30, 20, 40)
    exp[0, 3] = (30, 10, 40)          # cache hit
    exp[0, 4] = exp[0, 0]             # dist 4 copies
    exp[1, 0] = exp[0, 1]
    exp[1, 1] = exp[0, 2]
    exp[1, 2] = exp[0, 3]
    exp[1, 3] = exp[0, 4]
    exp[1, 4] = exp[1, 0]
    assert np.array_equal(out, exp)


def test_lz77_plane_code_row_above():
    """Distance code 1 maps to (dx=0, dy=1) = one row up."""
    w, h = 4, 2
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write_bits(0, 1)
    bw.write_bits(0, 1)  # no cache
    bw.write_bits(0, 1)  # no meta
    g = _emit_normal_code(bw, {5: 3, 6: 3, 7: 3, 8: 3, 256 + 2: 3}, 280)
    r = _emit_normal_code(bw, {1: 1}, 256)
    b = _emit_normal_code(bw, {2: 1}, 256)
    _one_symbol(bw, 255)
    d = _emit_normal_code(bw, {0: 1}, 40)  # distance code 1 -> (0, 1)
    for gv in (5, 6, 7, 8):
        bw.write_code(*g[gv]); bw.write_code(*r[1]); bw.write_code(*b[2])
    # second row: one copy, length symbol 2 -> value 3, then literal
    bw.write_code(*g[256 + 2])
    bw.write_code(*d[0])
    bw.write_code(*g[5]); bw.write_code(*r[1]); bw.write_code(*b[2])
    out = W.decode_webp(_container(bw.finish()))
    assert [tuple(px) for px in out[0]] == [(1, 5, 2), (1, 6, 2), (1, 7, 2), (1, 8, 2)]
    assert [tuple(px) for px in out[1]] == [(1, 5, 2), (1, 6, 2), (1, 7, 2), (1, 5, 2)]


def test_subtract_green_transform():
    w, h = 2, 1
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write_bits(1, 1)  # a transform
    bw.write_bits(2, 2)  # SUBTRACT_GREEN
    bw.write_bits(0, 1)  # no more transforms
    bw.write_bits(0, 1)  # no cache
    bw.write_bits(0, 1)  # no meta
    g = _emit_normal_code(bw, {100: 1, 200: 1}, 280)
    r = _emit_normal_code(bw, {10: 1, 60: 1}, 256)
    b = _emit_normal_code(bw, {20: 1, 250: 1}, 256)
    _one_symbol(bw, 255)
    _one_symbol(bw, 0)  # distance (unused)
    bw.write_code(*g[100]); bw.write_code(*r[10]); bw.write_code(*b[20])
    bw.write_code(*g[200]); bw.write_code(*r[60]); bw.write_code(*b[250])
    out = W.decode_webp(_container(bw.finish()))
    assert tuple(out[0, 0]) == ((10 + 100) % 256, 100, (20 + 100) % 256)
    assert tuple(out[0, 1]) == ((60 + 200) % 256, 200, (250 + 200) % 256)


def test_predictor_transform_left_mode():
    """Predictor sub-image of mode 1 (left): row pixels are cumulative
    sums of residuals; first pixel adds black (0xff000000)."""
    w, h = 4, 1
    bw2 = W._BitWriter()
    _header(bw2, w, h)
    bw2.write_bits(1, 1)
    bw2.write_bits(0, 2)
    bw2.write_bits(2, 3)
    bw2.write_bits(0, 1)  # sub-image: no color cache
    sg = _emit_normal_code(bw2, {1: 1}, 280)
    _one_symbol(bw2, 0)  # red
    _one_symbol(bw2, 0)  # blue
    _one_symbol(bw2, 0)  # alpha
    _one_symbol(bw2, 0)  # distance
    bw2.write_code(*sg[1])  # the single mode pixel: green=1 (left)
    bw2.write_bits(0, 1)  # main image: no more transforms
    bw2.write_bits(0, 1)  # no cache
    bw2.write_bits(0, 1)  # no meta
    mg = _emit_normal_code(bw2, {3: 1, 0: 1}, 280)
    mr = _emit_normal_code(bw2, {2: 1, 0: 1}, 256)
    mb = _emit_normal_code(bw2, {1: 1, 0: 1}, 256)
    _one_symbol(bw2, 0)  # alpha residual 0: black pred already carries 255
    _one_symbol(bw2, 0)
    # residuals: (r,g,b) = (2,3,1) every pixel — cumulative under 'left'
    for _ in range(4):
        bw2.write_code(*mg[3]); bw2.write_code(*mr[2]); bw2.write_code(*mb[1])
    out = W.decode_webp(_container(bw2.finish()))
    # pixel0 = black + residual = (2,3,1); then cumulative +(2,3,1) each
    assert [tuple(px) for px in out[0]] == [(2, 3, 1), (4, 6, 2), (6, 9, 3), (8, 12, 4)]


def test_palette_transform_with_bundling():
    """4-entry palette -> width_bits=2 (4 indices per packed green byte)."""
    w, h = 6, 1
    palette = [(0xFF << 24) | (r << 16) | (g << 8) | b
               for r, g, b in [(9, 8, 7), (20, 30, 40), (1, 2, 3), (250, 251, 252)]]
    # palette stream stores per-channel deltas from the previous entry
    deltas = []
    prev = 0
    for p in palette:
        deltas.append((
            (((p >> 24) - (prev >> 24)) & 0xFF) << 24
            | ((((p >> 16) & 0xFF) - ((prev >> 16) & 0xFF)) & 0xFF) << 16
            | ((((p >> 8) & 0xFF) - ((prev >> 8) & 0xFF)) & 0xFF) << 8
            | (((p & 0xFF) - (prev & 0xFF)) & 0xFF)
        ))
        prev = p
    bw = W._BitWriter()
    _header(bw, w, h)
    bw.write_bits(1, 1)
    bw.write_bits(3, 2)  # COLOR_INDEXING
    bw.write_bits(3, 8)  # palette size - 1
    # palette sub-image (4x1): literals
    bw.write_bits(0, 1)  # no cache
    pg = _emit_normal_code(bw, {(d >> 8) & 0xFF: 3 for d in deltas} | {0: 3}, 280)
    pr = _emit_normal_code(bw, {(d >> 16) & 0xFF: 3 for d in deltas} | {0: 3}, 256)
    pb = _emit_normal_code(bw, {d & 0xFF: 3 for d in deltas} | {0: 3}, 256)
    pa = _emit_normal_code(bw, {(d >> 24) & 0xFF: 3 for d in deltas} | {0: 3}, 256)
    _one_symbol(bw, 0)
    for dlt in deltas:
        bw.write_code(*pg[(dlt >> 8) & 0xFF])
        bw.write_code(*pr[(dlt >> 16) & 0xFF])
        bw.write_code(*pb[dlt & 0xFF])
        bw.write_code(*pa[(dlt >> 24) & 0xFF])
    bw.write_bits(0, 1)  # no more transforms
    bw.write_bits(0, 1)  # no cache
    bw.write_bits(0, 1)  # no meta
    # packed width = ceil(6/4) = 2; indices 0,1,2,3 | 2,1 -> greens:
    g0 = 0 | (1 << 2) | (2 << 4) | (3 << 6)
    g1 = 2 | (1 << 2)
    mg = _emit_normal_code(bw, {g0: 1, g1: 1}, 280)
    _one_symbol(bw, 0)
    _one_symbol(bw, 0)
    _one_symbol(bw, 0)
    _one_symbol(bw, 0)
    bw.write_code(*mg[g0])
    bw.write_code(*mg[g1])
    out = W.decode_webp(_container(bw.finish()))
    rgbs = [(9, 8, 7), (20, 30, 40), (1, 2, 3), (250, 251, 252), (1, 2, 3), (20, 30, 40)]
    assert [tuple(px) for px in out[0]] == rgbs


# ------------------------------------------------------------------ errors

def _vp8x_wrap(payload: bytes, *, extra: list[tuple[bytes, bytes]] = ()) -> bytes:
    """Re-wrap a plain RIFF+VP8L file as a VP8X extended container, the way
    libwebp does whenever metadata or the alpha flag is present: VP8X
    feature header first, then any metadata chunks, then the VP8L chunk."""
    vp8l_chunk = payload[12:]  # fourcc+size+data(+pad) of the sole chunk
    # canvas size from the VP8L header: 14-bit fields after the 0x2F byte
    bits = int.from_bytes(payload[12 + 8 + 1 : 12 + 8 + 5], "little")
    cw = (bits & 0x3FFF) + 1
    chh = ((bits >> 14) & 0x3FFF) + 1
    vp8x = struct.pack("<4sIB3s", b"VP8X", 10, 0x08, b"\0\0\0")
    vp8x += (cw - 1).to_bytes(3, "little") + (chh - 1).to_bytes(3, "little")
    body = b"WEBP" + vp8x
    for fourcc, data in extra:
        body += fourcc + struct.pack("<I", len(data)) + data + (b"\0" if len(data) & 1 else b"")
    body += vp8l_chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_vp8x_container_with_metadata_decodes():
    """libwebp wraps lossless VP8L in VP8X when EXIF/ICC/alpha-flag output
    is requested — the nested VP8L must decode identically (round-5
    ADVICE: these were wrongly rejected as lossy-adjacent)."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (6, 5, 3)).astype(np.uint8)
    plain = W.encode_webp(img)
    wrapped = _vp8x_wrap(plain, extra=[(b"EXIF", b"\x01\x02\x03"), (b"XMP ", b"<x/>")])
    assert np.array_equal(W.decode_webp(wrapped), img)


def test_vp8x_animated_still_rejected():
    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (3, 3, 3)).astype(np.uint8)
    wrapped = _vp8x_wrap(W.encode_webp(img), extra=[(b"ANIM", b"\0" * 6)])
    with pytest.raises(ValueError, match="unsupported WebP variant"):
        W.decode_webp(wrapped)


def test_rejects_lossy_and_garbage():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (4, 4, 3)).astype(np.uint8)
    payload = bytearray(W.encode_webp(img))
    with pytest.raises(ValueError, match="RIFF"):
        W.decode_webp(b"not webp at all")
    lossy = payload[:12] + b"VP8 " + payload[16:]
    with pytest.raises(ValueError, match="unsupported WebP variant"):
        W.decode_webp(bytes(lossy))
    with pytest.raises(ValueError):
        W.decode_webp(bytes(payload[: len(payload) // 2]))
