"""Pure-Python GIF codec (decode + encode), zero dependencies.

Why this exists: after PNG (png.py) and baseline JPEG (jpeg.py), GIF is
the last common legacy image container the multimodal decode hook treated
as opaque. The format is fully public (GIF87a/89a specification): a
logical screen descriptor, optional global/local color tables, and image
data as variable-code-width LZW — implementable from scratch the same way
as the raw-Snappy decoder in sources/ocf.py. No reference-repo code
exists for this (the reference, yuana97/Avro_Diff src/index.js, is
Avro/text only — SURVEY.md §1.1).

Scope (documented, deliberate):

- decode: GIF87a + GIF89a, global and local color tables, interlaced and
  non-interlaced; ``decode_gif_frames`` decodes FULL ANIMATIONS with the
  GIF89a compositing model (Graphic Control Extension delays, disposal
  none/in-place/restore-background — restore-previous rejected — and
  per-frame transparency keeping the underlying canvas, the delta-frame
  mechanism); ``decode_gif`` keeps the first-frame-still contract for
  the image-features path.
- encode: exists for fixture generation and round-trip testing — single
  frame (``encode_gif``) or full-screen animations with per-frame delays
  and the NETSCAPE loop extension (``encode_gif_animation``), global
  color table, real variable-width LZW with clear codes.
- GIF is lossless (a palette lookup), so decoded pixel stats follow the
  encoder's input exactly — which lets a SQL oracle mirror them in
  closed form (pipelines.q_image_features_gif) without decoding.

Decode runs inside Arrow-batched ``mapInPandas`` (multimodal
.image_features), so per-image Python cost is the codec itself, never
row-at-a-time Spark plumbing.
"""

from __future__ import annotations

import struct

import numpy as np

#: interlace pass layout: (row offset, row stride) per pass
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _read_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain (len byte + data, 0-terminated)."""
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-block chain")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += payload[pos : pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """Variable-code-width GIF LZW: codes start at min_code_size+1 bits,
    grow at table size 2^width up to 12 bits; CLEAR resets the table."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh_table() -> list[bytes]:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh_table()
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = fresh_table()
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return out
    return out


def decode_gif_frames(payload: bytes) -> list[tuple[np.ndarray, int]]:
    """Decode ALL frames of a GIF87a/89a animation → [(rgb (H, W, 3)
    uint8 canvas after the frame is composited, delay in centiseconds)].

    The animation model per the GIF89a spec: each image descriptor
    paints a (possibly partial) rectangle onto the logical screen; the
    preceding Graphic Control Extension carries the frame delay and the
    DISPOSAL method — 0/1 leave the canvas in place for the next frame
    to paint over, 2 restores the painted rectangle to the background
    color, 3 (restore-to-previous) is rejected (rare, and silently
    approximating it would corrupt frames). Transparency (GCE flag bit
    0) keeps the underlying canvas pixel wherever the transparent index
    appears — the mechanism delta-frame GIFs use.
    """
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, bg_idx, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_table = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_table = np.frombuffer(payload, np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    bg_rgb = (
        global_table[bg_idx]
        if global_table is not None and bg_idx < len(global_table)
        else np.zeros(3, np.uint8)
    )
    canvas = np.tile(bg_rgb, (sh, sw, 1)).astype(np.uint8)
    frames: list[tuple[np.ndarray, int]] = []
    delay, disposal, transparent = 0, 0, None
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-block chain
            label = payload[pos + 1]
            data, pos = _read_blocks(payload, pos + 2)
            if label == 0xF9 and len(data) >= 4:  # Graphic Control Extension
                gflags = data[0]
                delay = int.from_bytes(data[1:3], "little")
                disposal = (gflags >> 2) & 0x7
                transparent = data[3] if gflags & 0x1 else None
                if disposal == 3:
                    raise ValueError("GIF disposal 3 (restore previous) unsupported")
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        x0, y0, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        table = global_table
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(payload, np.uint8, count=3 * n, offset=pos).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame without a color table")
        min_code_size = payload[pos]
        data, pos = _read_blocks(payload, pos + 1)
        idx = np.frombuffer(
            bytes(_lzw_decode(data, min_code_size, w * h)), np.uint8, count=w * h
        )
        grid = idx.reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            out_rows = np.empty((h, w), np.uint8)
            src = 0
            for off, stride in _INTERLACE:
                for y in range(off, h, stride):
                    out_rows[y] = grid[src]
                    src += 1
            grid = out_rows
        if idx.max(initial=0) >= len(table):
            raise ValueError("GIF index outside color table")
        region = canvas[y0 : y0 + h, x0 : x0 + w]
        painted = table[grid]
        if transparent is not None:
            mask = grid != transparent
            region[mask] = painted[mask]
        else:
            region[:] = painted
        frames.append((canvas.copy(), delay))
        if disposal == 2:  # restore the painted rectangle to background
            canvas[y0 : y0 + h, x0 : x0 + w] = bg_rgb
        delay, disposal, transparent = 0, 0, None
    if not frames:
        raise ValueError("no image descriptor in GIF")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first frame of a GIF87a/89a to (h, w, 3) uint8 RGB."""
    return decode_gif_frames(payload)[0][0]


class _LzwWriter:
    """LSB-first bit packer for GIF LZW codes."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._n
        self._n += width
        while self._n >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def flush(self) -> None:
        if self._n:
            self.out.append(self._acc & 0xFF)
            self._acc = 0
            self._n = 0


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _LzwWriter()
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    w.write(clear, width)
    cur = b""
    for byte in indices:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        w.write(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        # the decoder's table trails next_code by one (it appends an entry
        # only on the FOLLOWING code), so it crosses 2^width when
        # next_code == 2^width + 1 — bump exactly then
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == (1 << 12):  # table full: emit clear, restart
            w.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([byte])
    if cur:
        w.write(table[cur], width)
    w.write(eoi, width)
    w.flush()
    return bytes(w.out)


def encode_gif_animation(
    frames: list[tuple[np.ndarray, int]],
    palette: np.ndarray,
    *,
    loop: int | None = 0,
) -> bytes:
    """Encode an animation: ``frames`` is [(indices (h, w) uint8, delay
    centiseconds)] over one global ``palette``; every frame paints the
    full logical screen (disposal 0, no transparency — the simple
    producer shape). ``loop`` adds the NETSCAPE2.0 application
    extension (0 = loop forever, None = play once, no extension)."""
    palette = np.asarray(palette, dtype=np.uint8)
    n = len(palette)
    if n & (n - 1) or not 2 <= n <= 256:
        raise ValueError("palette size must be a power of two in [2, 256]")
    first = np.asarray(frames[0][0], dtype=np.uint8)
    h, w = first.shape
    depth = max(1, (n - 1).bit_length())
    min_code_size = max(2, depth)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette.tobytes()
    if loop is not None:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    for indices, delay in frames:
        indices = np.asarray(indices, dtype=np.uint8)
        if indices.shape != (h, w):
            raise ValueError("all frames must match the logical screen size")
        if indices.max(initial=0) >= n:
            raise ValueError("index outside palette")
        out += b"\x21\xf9\x04" + bytes([0]) + struct.pack("<H", delay) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code_size)
        data = _lzw_encode(indices.tobytes(), min_code_size)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode one frame: ``indices`` (h, w) uint8 into ``palette``
    (n, 3) uint8, n a power of two in [2, 256]. Non-interlaced, global
    color table, GIF89a."""
    indices = np.asarray(indices, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = indices.shape
    n = len(palette)
    if n & (n - 1) or not 2 <= n <= 256:
        raise ValueError("palette size must be a power of two in [2, 256]")
    if indices.max(initial=0) >= n:
        raise ValueError("index outside palette")
    depth = max(1, (n - 1).bit_length())
    min_code_size = max(2, depth)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code_size)
    data = _lzw_encode(indices.tobytes(), min_code_size)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
