"""From-scratch GIF codec tests (avro_diff_spark/gif.py).

Self-round-trip alone cannot pin the LZW code-width schedule (a
symmetric off-by-one on both sides cancels), so the decoder is ALSO
pinned against a hand-assembled bytestream whose LZW bits were packed by
hand from the GIF89a specification.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from avro_diff_spark.gif import decode_gif, encode_gif
from avro_diff_spark import gif as G

PAL4 = np.array([[10, 20, 30], [200, 100, 0], [0, 0, 255], [255, 255, 255]], np.uint8)


def _hand_gif(
    *, lzw: bytes, w: int = 4, h: int = 1, min_code: int = 2,
    global_pal: bool = True, iflags: int = 0, pre_image: bytes = b"",
) -> bytes:
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x81 if global_pal else 0x00, 0, 0)
    if global_pal:
        out += PAL4.tobytes()
    out += pre_image
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    if not global_pal:
        out[-1] |= 0x81  # local color table, 4 entries
        out += PAL4.tobytes()
    out.append(min_code)
    out.append(len(lzw))
    out += lzw
    out += b"\x00\x3b"
    return bytes(out)


def test_decode_hand_assembled_lzw_stream():
    """Pixels [1, 1, 0, 0], min code size 2: codes (clear=4, 1, 1, 0)
    at 3 bits, then — because the decoder's table crosses 2^3 after the
    third data code — (0, eoi=5) at 4 bits. LSB-first packing of
    100 001 001 000 0000 0101 gives bytes 4C 00 05. Pins the canonical
    width-growth schedule and bit order against spec-derived values."""
    payload = _hand_gif(lzw=bytes([0x4C, 0x00, 0x05]))
    out = decode_gif(payload)
    assert (out == PAL4[np.array([[1, 1, 0, 0]])]).all()


def test_roundtrip_palette_sizes_and_width_growth():
    rng = np.random.default_rng(3)
    for n in (2, 4, 16, 256):
        pal = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
        idx = rng.integers(0, n, size=(37, 53)).astype(np.uint8)
        dec = decode_gif(encode_gif(idx, pal))
        assert (dec == pal[idx]).all(), n


def test_roundtrip_twelve_bit_table_and_clear():
    """Random 256-color noise forces the code table to 12 bits and past
    4096 entries (emitting a mid-stream clear)."""
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, size=(256, 3)).astype(np.uint8)
    idx = rng.integers(0, 256, size=(200, 300)).astype(np.uint8)
    dec = decode_gif(encode_gif(idx, pal))
    assert (dec == pal[idx]).all()


def test_interlaced_decode():
    """Rows are stored in the four-pass interlace order; the decoder must
    de-interlace them back."""
    rng = np.random.default_rng(5)
    h, w = 13, 9
    idx = rng.integers(0, 4, size=(h, w)).astype(np.uint8)
    order = [y for off, stride in ((0, 8), (4, 8), (2, 4), (1, 2)) for y in range(off, h, stride)]
    payload = bytearray(encode_gif(idx[order], PAL4))
    desc = payload.index(b"\x2c")
    payload[desc + 9] |= 0x40  # set the interlace flag
    dec = decode_gif(bytes(payload))
    assert (dec == PAL4[idx]).all()


def test_local_color_table_and_extension_skipping():
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control extension
    comment = b"\x21\xfe\x05hello\x00"
    payload = _hand_gif(
        lzw=bytes([0x4C, 0x00, 0x05]), global_pal=False, pre_image=gce + comment
    )
    out = decode_gif(payload)
    assert (out == PAL4[np.array([[1, 1, 0, 0]])]).all()


def test_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG?not really")
    good = encode_gif(np.zeros((4, 4), np.uint8), PAL4)
    with pytest.raises(ValueError):
        decode_gif(good[:20])
    with pytest.raises(ValueError, match="palette size"):
        encode_gif(np.zeros((2, 2), np.uint8), PAL4[:3])


def test_auto_decoder_routes_gif_real():
    from avro_diff_spark.multimodal import auto_image_decoder

    idx = np.tile(np.arange(4, dtype=np.uint8), (6, 2))
    stats = auto_image_decoder(encode_gif(idx, PAL4))
    assert (stats["width"], stats["height"], stats["channels"]) == (8, 6, 3)
    assert stats["mean_byte"] == pytest.approx(float(PAL4[idx].mean()))


from hypothesis import given, settings, strategies as st


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 50),
    h=st.integers(1, 50),
    nbits=st.integers(1, 8),
    seed=st.integers(0, 2**31),
)
def test_gif_roundtrip_property(w, h, nbits, seed):
    """GIF is lossless: ANY indices/palette round-trip bit-exactly, at
    every palette size, including 1-pixel images and streams that grow
    the LZW table across width boundaries."""
    rng = np.random.default_rng(seed)
    n = 1 << nbits
    pal = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
    idx = rng.integers(0, n, size=(h, w)).astype(np.uint8)
    dec = decode_gif(encode_gif(idx, pal))
    assert (dec == pal[idx]).all()


def test_animation_roundtrip_frames_and_delays():
    """encode_gif_animation -> decode_gif_frames: every composited frame
    equals the palette lookup of its indices, delays survive."""
    rng = np.random.RandomState(3)
    palette = rng.randint(0, 256, (8, 3)).astype(np.uint8)
    frames = [
        (rng.randint(0, 8, (7, 9)).astype(np.uint8), 10 * (i + 1)) for i in range(4)
    ]
    blob = G.encode_gif_animation(frames, palette, loop=0)
    got = G.decode_gif_frames(blob)
    assert len(got) == 4
    for (idx, delay), (rgb, d) in zip(frames, got):
        assert d == delay
        assert np.array_equal(rgb, palette[idx])
    # first-frame helper agrees
    assert np.array_equal(G.decode_gif(blob), palette[frames[0][0]])


def test_partial_frame_transparency_and_disposal():
    """Hand-built delta-frame animation: frame 2 paints a partial rect
    with a transparent index, so unpainted and transparent pixels keep
    frame 1's canvas; disposal 2 then restores the rect to background
    before frame 3."""
    import struct as S

    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]], np.uint8)

    def img_block(x0, y0, idx):
        h, w = idx.shape
        out = b"\x2c" + S.pack("<HHHHB", x0, y0, w, h, 0) + bytes([2])
        data = G._lzw_encode(idx.tobytes(), 2)
        body = b""
        for i in range(0, len(data), 255):
            body += bytes([len(data[i:i+255])]) + data[i:i+255]
        return out + body + b"\x00"

    def gce(disposal, delay, transparent=None):
        flags = (disposal << 2) | (1 if transparent is not None else 0)
        return b"\x21\xf9\x04" + bytes([flags]) + S.pack("<H", delay) + bytes(
            [transparent or 0]
        ) + b"\x00"

    base = np.full((4, 4), 1, np.uint8)  # all red
    patch = np.array([[2, 0], [0, 3]], np.uint8)  # green/transparent(0)/blue
    blob = (
        b"GIF89a" + S.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0) + pal.tobytes()
        + gce(0, 5) + img_block(0, 0, base)
        + gce(2, 7, transparent=0) + img_block(1, 1, patch)
        + gce(0, 9) + img_block(0, 0, base)
        + b"\x3b"
    )
    frames = G.decode_gif_frames(blob)
    assert [d for _, d in frames] == [5, 7, 9]
    f1, f2, f3 = (f for f, _ in frames)
    assert (f1 == pal[1]).all()
    want2 = np.tile(pal[1], (4, 4, 1)).astype(np.uint8)
    want2[1, 1] = pal[2]   # painted green
    want2[2, 2] = pal[3]   # painted blue
    # (1,2) and (2,1) were transparent index 0 -> keep red
    assert np.array_equal(f2, want2)
    assert (f3 == pal[1]).all()  # frame 3 repaints everything after disposal-2


def test_disposal_restore_previous_rejected():
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    blob = G.encode_gif_animation([(np.zeros((2, 2), np.uint8), 1)], pal)
    # splice a disposal-3 GCE before the image descriptor
    i = blob.index(b"\x2c")
    bad = blob[:i] + b"\x21\xf9\x04" + bytes([3 << 2]) + b"\x00\x00\x00\x00" + blob[i:]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="disposal 3"):
        G.decode_gif_frames(bad)
