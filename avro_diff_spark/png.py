"""Pure-Python PNG codec (decode + encode), zero dependencies beyond zlib.

Why this exists: the multimodal tier's image decode hook needed a REAL
compressed-format decoder, and this container has no Pillow/libpng. PNG is
deflate-based, so the whole format is implementable from the public spec
(RFC 2083 / W3C PNG): an 8-byte signature, CRC-framed chunks, one zlib
stream of filter-prefixed scanlines, and five per-scanline predictors
(None/Sub/Up/Average/Paeth). Same from-scratch pattern as the raw-Snappy
decoder in sources/ocf.py.

Scope (documented, deliberate):

- bit depth 8; color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
  6 (RGBA); interlace 0 (non-interlaced). That covers the overwhelming
  majority of real PNGs; 16-bit/1-2-4-bit/Adam7 raise ValueError and fall
  through :func:`avro_diff_spark.multimodal.auto_image_decoder` to the
  deterministic fake.
- chunk CRCs are verified (cheap, zlib.crc32); ancillary chunks are
  skipped; tRNS transparency is ignored (features don't use alpha from
  palette images).
- the encoder exists for fixture generation and round-trip testing: any
  per-row filter type 0-4 can be requested, so tests exercise every
  unfilter branch against known pixels.

Decode is batch-friendly: it runs inside Arrow-batched ``mapInPandas``
(multimodal.image_features), so per-image Python cost is the decode itself,
never row-at-a-time Spark plumbing.
"""

from __future__ import annotations

import struct
import zlib

SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: samples per pixel for each supported color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, h: int, rowbytes: int, bpp: int) -> bytearray:
    """Invert the per-scanline predictors: raw is h rows of
    (1 filter byte + rowbytes); returns h*rowbytes of reconstructed bytes."""
    out = bytearray(h * rowbytes)
    prev_off = -rowbytes
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        row_off = y * rowbytes
        out[row_off : row_off + rowbytes] = raw[pos : pos + rowbytes]
        pos += rowbytes
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, rowbytes):
                out[row_off + i] = (out[row_off + i] + out[row_off + i - bpp]) & 0xFF
        elif ft == 2:  # Up
            if y:
                for i in range(rowbytes):
                    out[row_off + i] = (out[row_off + i] + out[prev_off + i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowbytes):
                left = out[row_off + i - bpp] if i >= bpp else 0
                up = out[prev_off + i] if y else 0
                out[row_off + i] = (out[row_off + i] + ((left + up) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowbytes):
                left = out[row_off + i - bpp] if i >= bpp else 0
                up = out[prev_off + i] if y else 0
                ul = out[prev_off + i - bpp] if (y and i >= bpp) else 0
                out[row_off + i] = (out[row_off + i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft} on row {y}")
        prev_off = row_off
    return out


def decode_png(payload: bytes):
    """payload → (h, w, channels) uint8 ndarray (palette resolved to RGB).

    Raises ValueError on anything outside the supported scope (see module
    docstring) — callers route those to a fallback decoder.
    """
    import numpy as np

    if payload[: len(SIGNATURE)] != SIGNATURE:
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(SIGNATURE)
    ihdr = None
    plte = None
    idat = bytearray()
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = bytes(data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in _CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color_type}, "
            f"interlace={interlace})"
        )
    ch = _CHANNELS[color_type]
    rowbytes = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (rowbytes + 1):
        raise ValueError("PNG scanline data has wrong length")
    flat = _unfilter(raw, h, rowbytes, ch)
    arr = np.frombuffer(bytes(flat), np.uint8).reshape(h, w, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        arr = pal[arr[:, :, 0]]
    return arr


def _filter_row(cur: bytes, prev: bytes, bpp: int, ft: int) -> bytes:
    """Forward predictor for the encoder (exact inverse of _unfilter)."""
    n = len(cur)
    out = bytearray(n)
    for i in range(n):
        x = cur[i]
        left = cur[i - bpp] if i >= bpp else 0
        up = prev[i] if prev else 0
        ul = prev[i - bpp] if (prev and i >= bpp) else 0
        if ft == 0:
            out[i] = x
        elif ft == 1:
            out[i] = (x - left) & 0xFF
        elif ft == 2:
            out[i] = (x - up) & 0xFF
        elif ft == 3:
            out[i] = (x - ((left + up) >> 1)) & 0xFF
        elif ft == 4:
            out[i] = (x - _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft}")
    return bytes(out)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr, *, filters=None, level: int = 6) -> bytes:
    """(h, w) or (h, w, channels) uint8 ndarray → PNG bytes.

    ``filters`` picks the per-row predictor: an int applied to every row, a
    sequence of per-row ints, or None for filter 0 — deterministic output
    for a given (pixels, filters, level), which is what fixture generation
    and the DuckDB oracles need.
    """
    import numpy as np

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = arr.reshape(h, w * ch)
    if filters is None:
        per_row = [0] * h
    elif isinstance(filters, int):
        per_row = [filters] * h
    else:
        per_row = list(filters)
        if len(per_row) != h:
            raise ValueError(f"filters has {len(per_row)} entries for {h} rows")
    raw = bytearray()
    prev = b""
    for y in range(h):
        cur = rows[y].tobytes()
        raw.append(per_row[y])
        raw += _filter_row(cur, prev, ch, per_row[y])
        prev = cur
    body = zlib.compress(bytes(raw), level)
    return SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", body) + _chunk(b"IEND", b"")
