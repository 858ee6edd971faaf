"""Pure-Python WebP lossless (VP8L) codec, numpy only.

Why this exists: WebP was the last image format the multimodal tier's
decode hook (multimodal.real_image_decoder) could not decode for real —
this container has no Pillow/libwebp. The lossless variant is fully
specified in the public WebP Lossless Bitstream Specification (RFC 9649),
so it is implementable from scratch the same way as the raw-Snappy
decoder (sources/ocf.py), the PNG/GIF codecs, and the T.81 JPEG codec.
No reference-repo code exists for this (the reference, yuana97/Avro_Diff
src/index.js, is Avro/text only — SURVEY.md §1.1).

Scope (documented, deliberate):

- decode: the full VP8L feature set — LSB-first bitstream, canonical
  prefix codes (simple 1/2-symbol and code-length-coded forms, deflate
  bit order), meta prefix codes (entropy image), color cache, LZ77
  backward references (direct distances and the 120-entry 2D
  neighborhood plane-code table), and all four transforms applied in
  reverse order: PREDICTOR (all 14 modes, spec edge rules),
  COLOR (signed 3.5 fixed-point cross-channel deltas), SUBTRACT_GREEN,
  and COLOR_INDEXING (palette with sub-byte pixel bundling). VP8X
  extended containers are walked through to their nested VP8L chunk
  (libwebp wraps lossless data in VP8X whenever metadata or the alpha
  flag is present); only genuinely lossy (VP8) and animated (ANIM/ANMF)
  payloads raise ValueError and fall through
  multimodal.auto_image_decoder to the deterministic fake.
- encode: exists for fixture generation and round-trip testing — emits a
  spec-minimal but fully valid VP8L stream: no transforms, no color
  cache, no LZ77 (literals only), per-channel prefix codes chosen as
  simple codes when a channel has ≤ 2 distinct values (the common
  constant-alpha case costs ~11 bits) and a complete flat 8-bit
  canonical code otherwise. Lossless, so decode(encode(x)) == x exactly.

Decode runs inside Arrow-batched ``mapInPandas`` (multimodal
.image_features), so per-image Python cost is the codec itself, never
row-at-a-time Spark plumbing.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O: VP8L is LSB-first (values read low-bit-first); canonical prefix
# codes are packed MSB-of-code-first, the deflate convention.
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read_bit(self) -> int:
        if self.byte >= len(self.data):
            raise ValueError("truncated VP8L bitstream")
        b = (self.data[self.byte] >> self.bit) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.byte += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.read_bit() << i
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write_bits(self, value: int, n: int) -> None:
        self._acc |= (value & ((1 << n) - 1)) << self._n
        self._n += n
        while self._n >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Write a canonical prefix code MSB-first (deflate convention)."""
        for i in range(length - 1, -1, -1):
            self.write_bits((code >> i) & 1, 1)

    def finish(self) -> bytes:
        if self._n:
            self.out.append(self._acc & 0xFF)
            self._acc, self._n = 0, 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical over (length, symbol) order."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for sym in sorted(lengths, key=lambda s: (lengths[s], s)):
        ln = lengths[sym]
        code <<= ln - prev_len
        codes[sym] = (code, ln)
        code += 1
        prev_len = ln
    return codes


class _PrefixCode:
    """Bit-serial decoder for one canonical prefix code."""

    def __init__(self, lengths: dict[int, int]) -> None:
        self.single = None
        nonzero = {s: l for s, l in lengths.items() if l > 0}
        if len(nonzero) == 1:
            self.single = next(iter(nonzero))
            self.table = {}
            return
        self.table = {
            (ln, code): sym for sym, (code, ln) in _canonical_codes(nonzero).items()
        }

    @classmethod
    def simple(cls, symbols: list[int]) -> "_PrefixCode":
        pc = cls.__new__(cls)
        if len(symbols) == 1:
            pc.single = symbols[0]
            pc.table = {}
        else:
            pc.single = None
            pc.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
        return pc

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.read_bit()
            length += 1
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


#: order in which code-length-code lengths are transmitted (spec §6.2.2)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)


def _read_prefix_code(br: _BitReader, alphabet: int) -> _PrefixCode:
    if br.read_bits(1):  # simple code
        num_symbols = br.read_bits(1) + 1
        if br.read_bits(1):  # first symbol is 8 bits
            sym0 = br.read_bits(8)
        else:
            sym0 = br.read_bits(1)
        syms = [sym0]
        if num_symbols == 2:
            syms.append(br.read_bits(8))
        return _PrefixCode.simple(syms)
    num_cl = 4 + br.read_bits(4)
    cl_lengths: dict[int, int] = {}
    for i in range(num_cl):
        ln = br.read_bits(3)
        if ln:
            cl_lengths[_CL_ORDER[i]] = ln
    cl_code = _PrefixCode(cl_lengths)
    if br.read_bits(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.read_bits(3)
        max_symbol = 2 + br.read_bits(length_nbits)
    else:
        max_symbol = alphabet
    lengths: dict[int, int] = {}
    symbol = 0
    prev_len = 8
    while symbol < alphabet and max_symbol > 0:
        max_symbol -= 1
        s = cl_code.decode(br)
        if s < 16:
            if s:
                lengths[symbol] = s
                prev_len = s
            symbol += 1
        elif s == 16:
            rep = 3 + br.read_bits(2)
            for _ in range(rep):
                if symbol < alphabet:
                    lengths[symbol] = prev_len
                symbol += 1
        elif s == 17:
            symbol += 3 + br.read_bits(3)
        else:  # 18
            symbol += 11 + br.read_bits(7)
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 helpers (spec §4.2.2)
# ---------------------------------------------------------------------------


def _lz77_value(br: _BitReader, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read_bits(extra) + 1


#: 120-entry (dx, dy) neighborhood for short distance codes (spec table)
_DIST_TABLE = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (4, 8), (-4, 8), (6, 7), (-6, 7), (7, 6), (-7, 6), (8, 4), (3, 8),
    (-3, 8), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _plane_code_to_distance(width: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_TABLE[code - 1]
    dist = dy * width + dx
    return dist if dist >= 1 else 1


# ---------------------------------------------------------------------------
# entropy-coded image decoding (recursive: main image + sub-images)
# ---------------------------------------------------------------------------


def _div_round_up(a: int, shift: int) -> int:
    return (a + (1 << shift) - 1) >> shift


def _decode_image(br: _BitReader, w: int, h: int, level0: bool):
    """Decode one image stream to a list of w*h packed ARGB ints plus, at
    level0, the transform list (applied by the caller in reverse)."""
    transforms = []
    if level0:
        seen = set()
        while br.read_bits(1):
            ttype = br.read_bits(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype == 0:  # PREDICTOR
                size_bits = br.read_bits(3) + 2
                sw, sh = _div_round_up(w, size_bits), _div_round_up(h, size_bits)
                sub = _decode_image(br, sw, sh, False)
                transforms.append(("predictor", size_bits, sub))
            elif ttype == 1:  # COLOR
                size_bits = br.read_bits(3) + 2
                sw, sh = _div_round_up(w, size_bits), _div_round_up(h, size_bits)
                sub = _decode_image(br, sw, sh, False)
                transforms.append(("color", size_bits, sub))
            elif ttype == 2:  # SUBTRACT_GREEN
                transforms.append(("subtract_green",))
            else:  # COLOR_INDEXING
                psize = br.read_bits(8) + 1
                pal = _decode_image(br, psize, 1, False)
                # palette entries are stored as deltas, per channel mod 256
                out = []
                prev = 0
                for p in pal:
                    cur = (
                        ((((p >> 24) + (prev >> 24)) & 0xFF) << 24)
                        | ((((p >> 16) + (prev >> 16)) & 0xFF) << 16)
                        | ((((p >> 8) + (prev >> 8)) & 0xFF) << 8)
                        | (((p + prev) & 0xFF))
                    )
                    out.append(cur)
                    prev = cur
                if psize <= 2:
                    width_bits = 3
                elif psize <= 4:
                    width_bits = 2
                elif psize <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append(("palette", width_bits, out))
                if width_bits:
                    w = _div_round_up(w, width_bits)

    # color cache info
    cache_bits = 0
    if br.read_bits(1):
        cache_bits = br.read_bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"invalid color cache bits {cache_bits}")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    # meta prefix codes (spatially-coded image only)
    meta = None
    huffman_bits = 0
    n_groups = 1
    if level0 and br.read_bits(1):
        huffman_bits = br.read_bits(3) + 2
        mw, mh = _div_round_up(w, huffman_bits), _div_round_up(h, huffman_bits)
        meta_img = _decode_image(br, mw, mh, False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_img]
        n_groups = max(meta) + 1

    green_alphabet = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alphabet),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )

    pixels = [0] * (w * h)
    pos = 0
    total = w * h
    mw = _div_round_up(w, huffman_bits) if meta else 0
    while pos < total:
        if meta:
            x, y = pos % w, pos // w
            g = groups[meta[(y >> huffman_bits) * mw + (x >> huffman_bits)]]
        else:
            g = groups[0]
        s = g[0].decode(br)
        if s < 256:
            red = g[1].decode(br)
            blue = g[2].decode(br)
            alpha = g[3].decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            pixels[pos] = px
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif s < 280:
            length = _lz77_value(br, s - 256)
            dcode = _lz77_value(br, g[4].decode(br))
            dist = _plane_code_to_distance(w, dcode)
            if dist > pos or pos + length > total:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                px = pixels[pos - dist]
                pixels[pos] = px
                if cache is not None:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
                pos += 1
        else:
            if cache is None:
                raise ValueError("color cache symbol without color cache")
            pixels[pos] = cache[s - 280]
            pos += 1
    return (pixels, transforms, w) if level0 else pixels


# ---------------------------------------------------------------------------
# inverse transforms (spec §4; applied in reverse decode order)
# ---------------------------------------------------------------------------


def _avg2(a, b):
    return (
        ((((a >> 24) + (b >> 24)) >> 1) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8)
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _clip255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _select(top, left, topleft):
    d = 0
    for sh in (24, 16, 8, 0):
        a = (top >> sh) & 0xFF
        b = (left >> sh) & 0xFF
        c = (topleft >> sh) & 0xFF
        d += abs(b - c) - abs(a - c)
    return top if d <= 0 else left


def _clamp_add_sub_full(a, b, c):
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clip255(((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)) << sh
    return out


def _clamp_add_sub_half(a, b, c):
    # per channel: ave = (a + b) >> 1; clip(ave + trunc((ave - c) / 2))
    out = 0
    for sh in (24, 16, 8, 0):
        ave = (((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)) >> 1
        d = ave - ((c >> sh) & 0xFF)
        half = d // 2 if d >= 0 else -((-d) // 2)  # C truncation
        out |= _clip255(ave + half) << sh
    return out


def _add_pixels(pred, residual):
    return (
        ((((pred >> 24) + (residual >> 24)) & 0xFF) << 24)
        | (((((pred >> 16) & 0xFF) + ((residual >> 16) & 0xFF)) & 0xFF) << 16)
        | (((((pred >> 8) & 0xFF) + ((residual >> 8) & 0xFF)) & 0xFF) << 8)
        | (((pred & 0xFF) + (residual & 0xFF)) & 0xFF)
    )


def _apply_predictor_inverse(pixels, w, h, size_bits, sub):
    sw = _div_round_up(w, size_bits)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[i - 1]  # left
            elif x == 0:
                pred = pixels[i - w]  # top
            else:
                mode = (sub[(y >> size_bits) * sw + (x >> size_bits)] >> 8) & 0xFF
                left = pixels[i - 1]
                top = pixels[i - w]
                tl = pixels[i - w - 1]
                tr = pixels[i - w + 1]  # last column: leftmost of this row
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(left, tr), top)
                elif mode == 6:
                    pred = _avg2(left, tl)
                elif mode == 7:
                    pred = _avg2(left, top)
                elif mode == 8:
                    pred = _avg2(tl, top)
                elif mode == 9:
                    pred = _avg2(top, tr)
                elif mode == 10:
                    pred = _avg2(_avg2(left, tl), _avg2(top, tr))
                elif mode == 11:
                    pred = _select(top, left, tl)
                elif mode == 12:
                    pred = _clamp_add_sub_full(left, top, tl)
                elif mode == 13:
                    pred = _clamp_add_sub_half(left, top, tl)
                else:
                    raise ValueError(f"invalid predictor mode {mode}")
            pixels[i] = _add_pixels(pred, pixels[i])


def _ctd(t: int, c: int) -> int:
    """ColorTransformDelta: signed 3.5 fixed-point (int8(t)*int8(c)) >> 5."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _apply_color_inverse(pixels, w, h, size_bits, sub):
    sw = _div_round_up(w, size_bits)
    for y in range(h):
        base = y * w
        srow = (y >> size_bits) * sw
        for x in range(w):
            i = base + x
            px = pixels[i]
            cte = sub[srow + (x >> size_bits)]
            # ColorTransformElement packing (spec / libwebp
            # ColorCodeToMultipliers): green_to_red in bits 0-7,
            # green_to_blue in 8-15, red_to_blue in 16-23
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            g = (px >> 8) & 0xFF
            r = ((px >> 16) & 0xFF)
            b = px & 0xFF
            r = (r + _ctd(g2r, g)) & 0xFF
            b = (b + _ctd(g2b, g) + _ctd(r2b, r)) & 0xFF
            pixels[i] = (px & 0xFF00FF00) | (r << 16) | b


def _apply_subtract_green_inverse(pixels):
    for i, px in enumerate(pixels):
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        pixels[i] = (px & 0xFF00FF00) | (r << 16) | b


def _apply_palette_inverse(pixels, w, h, width_bits, palette):
    if width_bits == 0:
        out = []
        for px in pixels:
            idx = (px >> 8) & 0xFF
            out.append(palette[idx] if idx < len(palette) else 0)
        return out, w
    packed_w = _div_round_up(w, width_bits)
    bits_per_idx = 8 >> width_bits
    mask = (1 << bits_per_idx) - 1
    per = 1 << width_bits
    out = [0] * (w * h)
    for y in range(h):
        for xs in range(packed_w):
            g = (pixels[y * packed_w + xs] >> 8) & 0xFF
            for j in range(per):
                x = (xs << width_bits) + j
                if x >= w:
                    break
                idx = (g >> (j * bits_per_idx)) & mask
                out[y * w + x] = palette[idx] if idx < len(palette) else 0
    return out, w


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a lossless WebP (RIFF + VP8L) to (h, w, 3) RGB uint8, or
    (h, w, 4) RGBA when the image carries non-opaque alpha."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload (missing RIFF/WEBP)")
    pos = 12
    vp8l = None
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if fourcc == b"VP8L":
            vp8l = payload[pos + 8 : pos + 8 + size]
            break
        if fourcc in (b"VP8 ", b"ANIM", b"ANMF"):
            # genuinely undecodable here: lossy VP8 bitstream / animation.
            # VP8X itself is just the extended-container feature header —
            # libwebp wraps lossless VP8L in it whenever metadata or the
            # alpha flag is set — so it (and ICCP/EXIF/XMP metadata
            # chunks) are skipped and the walk continues to the payload.
            raise ValueError(f"unsupported WebP variant {fourcc.decode().strip()!r}")
        pos += 8 + size + (size & 1)
    if vp8l is None:
        raise ValueError("no VP8L chunk found")
    if vp8l[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(vp8l, 1)
    w = br.read_bits(14) + 1
    h = br.read_bits(14) + 1
    br.read_bits(1)  # alpha hint
    if br.read_bits(3) != 0:
        raise ValueError("unsupported VP8L version")
    pixels, transforms, dec_w = _decode_image(br, w, h, True)
    kinds = {t[0] for t in transforms}
    if "palette" in kinds and kinds & {"predictor", "color", "subtract_green"}:
        # bundled-width interaction between color indexing and the pixel
        # transforms; libwebp's encoder never combines them either
        raise ValueError("unsupported VP8L transform combination")
    for t in reversed(transforms):
        if t[0] == "palette":
            pixels, dec_w = _apply_palette_inverse(pixels, w, h, t[1], t[2])
        elif t[0] == "subtract_green":
            _apply_subtract_green_inverse(pixels)
        elif t[0] == "color":
            _apply_color_inverse(pixels, w, h, t[1], t[2])
        else:  # predictor
            _apply_predictor_inverse(pixels, w, h, t[1], t[2])
    arr = np.array(pixels, dtype=np.uint32).reshape(h, w)
    rgba = np.stack(
        [
            (arr >> 16) & 0xFF,
            (arr >> 8) & 0xFF,
            arr & 0xFF,
            (arr >> 24) & 0xFF,
        ],
        axis=-1,
    ).astype(np.uint8)
    if (rgba[:, :, 3] == 255).all():
        return rgba[:, :, :3]
    return rgba


def _emit_prefix_code(bw: _BitWriter, values: np.ndarray, alphabet: int):
    """Emit a prefix code for one channel and return symbol->(code, len).

    ≤ 2 distinct values → simple code; otherwise a complete flat 8-bit
    canonical code over 0..255 (the 8-length run is transmitted with
    code-length symbols {8, 16, 18})."""
    distinct = sorted({int(v) for v in values.flat}) if values.size else [0]
    if len(distinct) == 1:
        bw.write_bits(1, 1)  # simple
        bw.write_bits(0, 1)  # one symbol
        bw.write_bits(1, 1)  # 8-bit symbol
        bw.write_bits(distinct[0], 8)
        return {distinct[0]: (0, 0)}
    if len(distinct) == 2:
        bw.write_bits(1, 1)  # simple
        bw.write_bits(1, 1)  # two symbols
        bw.write_bits(1, 1)  # 8-bit first symbol
        bw.write_bits(distinct[0], 8)
        bw.write_bits(distinct[1], 8)
        return {distinct[0]: (0, 1), distinct[1]: (1, 1)}
    # normal code: lengths[0..255] = 8, rest of alphabet 0
    bw.write_bits(0, 1)
    bw.write_bits(15, 4)  # num_code_lengths = 19
    cl_lengths = {8: 1, 16: 2, 18: 2}
    for sym in _CL_ORDER:
        bw.write_bits(cl_lengths.get(sym, 0), 3)
    bw.write_bits(0, 1)  # no explicit max_symbol
    cl_codes = _canonical_codes(cl_lengths)
    code, ln = cl_codes[8]
    bw.write_code(code, ln)  # symbol 0 has length 8
    remaining = 255
    code16, ln16 = cl_codes[16]
    while remaining:
        rep = min(6, remaining)
        if rep < 3:
            # emit literals instead of an under-range repeat
            for _ in range(rep):
                bw.write_code(code, ln)
            remaining = 0
            break
        bw.write_code(code16, ln16)
        bw.write_bits(rep - 3, 2)
        remaining -= rep
    left = alphabet - 256
    code18, ln18 = cl_codes[18]
    while left > 0:
        rep = min(138, max(11, left))
        if left < 11:
            break  # reader stops once alphabet is filled anyway
        bw.write_code(code18, ln18)
        bw.write_bits(rep - 11, 7)
        left -= rep
    return _canonical_codes(dict.fromkeys(range(256), 8))


def encode_webp(arr: np.ndarray) -> bytes:
    """Encode (h, w) grayscale, (h, w, 3) RGB, or (h, w, 4) RGBA uint8 as
    a lossless WebP (VP8L, literals only — see module docstring)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=-1)
    h, w, ch = a.shape
    if ch == 3:
        alpha = np.full((h, w), 255, np.uint8)
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    elif ch == 4:
        r, g, b, alpha = a[:, :, 0], a[:, :, 1], a[:, :, 2], a[:, :, 3]
    else:
        raise ValueError(f"unsupported channel count {ch}")
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("VP8L dimensions must be in [1, 16384]")

    bw = _BitWriter()
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(0, 1)  # alpha hint
    bw.write_bits(0, 3)  # version
    bw.write_bits(0, 1)  # no transforms
    bw.write_bits(0, 1)  # no color cache
    bw.write_bits(0, 1)  # no meta prefix codes
    gcodes = _emit_prefix_code(bw, g, 256 + 24)
    rcodes = _emit_prefix_code(bw, r, 256)
    bcodes = _emit_prefix_code(bw, b, 256)
    acodes = _emit_prefix_code(bw, alpha, 256)
    # distance code: unused, one-symbol simple code
    bw.write_bits(1, 1)
    bw.write_bits(0, 1)
    bw.write_bits(0, 1)
    bw.write_bits(0, 1)  # symbol 0, 1-bit form
    for y in range(h):
        for x in range(w):
            for codes, plane in ((gcodes, g), (rcodes, r), (bcodes, b), (acodes, alpha)):
                code, ln = codes[int(plane[y, x])]
                if ln:
                    bw.write_code(code, ln)
    body = b"\x2f" + bw.finish()
    vp8l = b"VP8L" + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
