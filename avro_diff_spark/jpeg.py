"""Pure-Python baseline JPEG codec (decode + encode), numpy only.

Why this exists: the multimodal tier's image decode hook
(multimodal.real_image_decoder) covers BMP/PPM/PNG for real, but JPEG —
the dominant format in any real image corpus — fell through to the
deterministic fake because this container has no Pillow/libjpeg. Baseline
sequential JPEG is fully specified in the public ITU-T T.81 spec (Annex F
entropy coding, Annex K reference tables), so it is implementable from
scratch the same way as the raw-Snappy decoder (sources/ocf.py) and the
PNG codec (png.py). No reference-repo code exists for this (the reference,
yuana97/Avro_Diff src/index.js, is Avro/text only — SURVEY.md §1.1).

Scope (documented, deliberate):

- decode: baseline DCT (SOF0) AND progressive DCT (SOF2, T.81 Annex G:
  spectral selection + successive approximation — DC/AC first and
  refinement passes, EOB runs, interleaved DC scans, per-component
  non-interleaved AC scans), 8-bit samples, Huffman entropy coding,
  1-component grayscale and 3-component YCbCr with any integer sampling
  factors (covers 4:4:4 / 4:2:2 / 4:2:0), restart markers (DRI/RST0-7),
  16-bit DQT precision, multi-table DQT/DHT segments. Arithmetic coding
  (SOF9+), 12-bit, hierarchical, and 4-component CMYK raise ValueError
  and fall through multimodal.auto_image_decoder to the deterministic
  fake.
- encode: exists for fixture generation and round-trip testing —
  grayscale or RGB input, 4:4:4 or 4:2:0 subsampling, Annex K Huffman
  tables, IJG-style quality scaling of the Annex K quantization tables or
  caller-supplied tables, optional restart interval. A progressive
  encoder (:func:`encode_progressive_jpeg`) emits the libjpeg
  ``jpeg_simple_progression`` scan script (or a caller script) with full
  successive approximation, so decode(progressive) == decode(baseline)
  exactly for the same image and quantizers — the coefficient stream is
  identical, only its scan order differs.
- both sides use the orthonormal 2-D DCT as an 8x8 matrix sandwich in
  float64 (FDCT ``C @ (x-128) @ C.T``, IDCT ``C.T @ X @ C + 128``), so a
  DC-only block reconstructs its flat value bit-exactly — which is what
  lets a SQL oracle mirror decoded pixel stats in closed form
  (pipelines.q_image_features_jpeg) without decoding anything.

Decode runs inside Arrow-batched ``mapInPandas`` (multimodal
.image_features), so per-image Python cost is the codec itself, never
row-at-a-time Spark plumbing.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants from the public T.81 spec
# ---------------------------------------------------------------------------

#: zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient.
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

#: Annex K.1 luminance / K.2 chrominance quantization tables (natural order).
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)
QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)

#: Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL) per class.
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: C[u, x]."""
    x = np.arange(8)
    u = np.arange(8)[:, None]
    c = np.cos((2 * x[None, :] + 1) * u * np.pi / 16)
    s = np.where(u == 0, np.sqrt(1.0 / 8.0), 0.5)
    return s * c


_C = _dct_matrix()


def fdct2(block: np.ndarray) -> np.ndarray:
    """Forward 2-D DCT of an 8x8 level-shifted block (float64 in/out)."""
    return _C @ block @ _C.T


def idct2(coef: np.ndarray) -> np.ndarray:
    """Inverse 2-D DCT; returns the level-shifted spatial block."""
    return _C.T @ coef @ _C


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG-style quality (1-100) scaling of the Annex K tables."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        q = (base * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int64))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# Huffman machinery (canonical codes from BITS/HUFFVAL, T.81 Annex C)
# ---------------------------------------------------------------------------

def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol map for bit-serial decoding."""
    return {(ln, code): sym for sym, (code, ln) in _build_codes(bits, values).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self._n -= 8
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (spec: fill with 1s)."""
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)


class _BitReader:
    """Reads entropy-coded bits, de-stuffing 0xFF00 and stopping (or
    resuming, for RSTn) at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2
                else:
                    raise ValueError("hit marker inside entropy stream")
            else:
                self.pos += 1
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self._n = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("expected restart marker")

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to a signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """Signed value -> (category s, s value bits) for entropy encoding."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1) & ((1 << s) - 1)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG to a
    (h, w, channels) uint8 array (channels 1 for grayscale, 3 for
    YCbCr->RGB)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, comps) where comps = [(cid, hi, vi, tq)]
    restart_interval = 0
    progressive = False
    coefs: dict[int, np.ndarray] = {}  # cid -> (by, bx, 64) zigzag coeffs
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        if pos + 2 + seglen > len(payload):
            raise ValueError("truncated JPEG segment")
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq:
                    vals = np.frombuffer(body, ">u2", count=64, offset=p).astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(body, np.uint8, count=64, offset=p).astype(np.int64)
                    p += 64
                t = np.zeros((8, 8), np.int64)
                for k, (r, c) in enumerate(ZIGZAG):
                    t[r, c] = vals[k]
                qtables[tq] = t
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                values = list(body[p + 17 : p + 17 + n])
                htables[(tc, th)] = _build_decoder(bits, values)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision = body[0]
            if precision != 8:
                raise ValueError(f"unsupported sample precision {precision}")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported component count {ncomp}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
            if progressive:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                coefs = {
                    cid: np.zeros((mcuy * vi, mcux * hi, 64), np.int32)
                    for cid, hi, vi, _ in comps
                }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG mode (SOF marker 0x{marker:02x})")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_tables = {}
            scan_comps = []
            for i in range(ns):
                cs, tda = body[1 + 2 * i : 3 + 2 * i]
                scan_tables[cs] = (tda >> 4, tda & 0xF)
                scan_comps.append(cs)
            if not progressive:
                return _decode_scan(
                    payload, pos + 2 + seglen, frame, scan_tables,
                    qtables, htables, restart_interval,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            pos = _decode_prog_scan(
                payload, pos + 2 + seglen, frame, scan_comps, scan_tables,
                htables, restart_interval, coefs, ss, se, ahal >> 4, ahal & 0xF,
            )
            # skip pad bits / stray RSTs up to the next framed marker
            n = len(payload)
            while pos + 1 < n and not (
                payload[pos] == 0xFF
                and payload[pos + 1] != 0x00
                and not (0xD0 <= payload[pos + 1] <= 0xD7)
            ):
                pos += 1
            continue
        pos += 2 + seglen
    if progressive and coefs:
        return _reconstruct_progressive(frame, coefs, qtables)
    raise ValueError("no SOS marker found")


def _decode_scan(payload, pos, frame, scan_tables, qtables, htables, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        cid: np.zeros((mcuy * vi * 8, mcux * hi * 8), np.float64)
        for cid, hi, vi, _ in comps
    }
    reader = _BitReader(payload, pos)
    preds = {cid: 0 for cid, *_ in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                reader.restart()
                preds = {cid: 0 for cid in preds}
            for cid, hi, vi, tq in comps:
                dc_tab = htables.get((0, scan_tables[cid][0]))
                ac_tab = htables.get((1, scan_tables[cid][1]))
                if dc_tab is None or ac_tab is None:
                    raise ValueError("missing Huffman table for scan")
                q = qtables[tq]
                for v in range(vi):
                    for u in range(hi):
                        coef = np.zeros((8, 8), np.int64)
                        s = reader.decode_symbol(dc_tab)
                        diff = _extend(reader.receive(s), s)
                        preds[cid] += diff
                        coef[0, 0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tab)
                            r, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            rr, cc = ZIGZAG[k]
                            coef[rr, cc] = _extend(reader.receive(size), size)
                            k += 1
                        block = idct2((coef * q).astype(np.float64)) + 128.0
                        y0 = (my * vi + v) * 8
                        x0 = (mx * hi + u) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            n_mcu += 1
    return _assemble(planes, comps, h, w, hmax, vmax)


def _assemble(planes, comps, h, w, hmax, vmax) -> np.ndarray:
    """Clamp component planes, upsample to full resolution, crop, and
    color-convert (shared by the baseline and progressive paths)."""
    full = []
    for cid, hi, vi, _ in comps:
        p = np.clip(np.round(planes[cid]), 0, 255)
        p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return full[0].astype(np.uint8)[:, :, None]
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive decoding (T.81 Annex G.2): each SOS deposits one spectral /
# approximation slice into the per-component coefficient arrays; the IDCT
# runs once at EOI over the accumulated coefficients.
# ---------------------------------------------------------------------------

def _comp_blocks(frame, cid):
    """(nbh, nbw): the component's OWN block grid — what non-interleaved
    scans cover (spec A.2.2; the MCU-padded grid applies only to
    interleaved scans)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    hi, vi = next((c[1], c[2]) for c in comps if c[0] == cid)
    cw = -(-w * hi // hmax)
    ch = -(-h * vi // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_prog_scan(
    payload, pos, frame, scan_comps, scan_tables, htables,
    restart_interval, coefs, ss, se, ah, al,
):
    """Decode one progressive scan into ``coefs``; returns the stream
    position after the scan's entropy data."""
    h, w, comps = frame
    by_cid = {c[0]: c for c in comps}
    reader = _BitReader(payload, pos)
    p1, m1 = 1 << al, -1 << al

    def check_restart(n_mcu, state):
        if restart_interval and n_mcu and n_mcu % restart_interval == 0:
            reader.restart()
            state["preds"] = dict.fromkeys(state["preds"], 0)
            state["eobrun"] = 0

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("DC scan must have Se=0")
        state = {"preds": {cs: 0 for cs in scan_comps}, "eobrun": 0}
        if len(scan_comps) > 1:  # interleaved: full MCU grid incl. padding
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            n_mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    check_restart(n_mcu, state)
                    for cs in scan_comps:
                        _, hi, vi, _ = by_cid[cs]
                        for v in range(vi):
                            for u in range(hi):
                                _dc_unit(
                                    reader, coefs[cs], my * vi + v, mx * hi + u,
                                    htables, scan_tables[cs][0], ah, al, state, cs,
                                )
                    n_mcu += 1
        else:
            cs = scan_comps[0]
            nbh, nbw = _comp_blocks(frame, cs)
            n_mcu = 0
            for by in range(nbh):
                for bx in range(nbw):
                    check_restart(n_mcu, state)
                    _dc_unit(
                        reader, coefs[cs], by, bx,
                        htables, scan_tables[cs][0], ah, al, state, cs,
                    )
                    n_mcu += 1
        return reader.pos

    # AC scan: spec G.1.1.1.1 — exactly one component, never interleaved
    if len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    cs = scan_comps[0]
    ac_tab = htables.get((1, scan_tables[cs][1]))
    if ac_tab is None:
        raise ValueError("missing AC Huffman table for scan")
    nbh, nbw = _comp_blocks(frame, cs)
    arr = coefs[cs]
    state = {"preds": {}, "eobrun": 0}
    n_mcu = 0
    for by in range(nbh):
        for bx in range(nbw):
            check_restart(n_mcu, state)
            block = arr[by, bx]
            if ah == 0:
                _ac_first_unit(reader, block, ac_tab, ss, se, al, state)
            else:
                _ac_refine_unit(reader, block, ac_tab, ss, se, p1, m1, state)
            n_mcu += 1
    return reader.pos


def _dc_unit(reader, arr, by, bx, htables, td, ah, al, state, cs):
    if ah == 0:  # first pass: huffman diff, shifted by the point transform
        dc_tab = htables.get((0, td))
        if dc_tab is None:
            raise ValueError("missing DC Huffman table for scan")
        s = reader.decode_symbol(dc_tab)
        diff = _extend(reader.receive(s), s)
        state["preds"][cs] += diff
        arr[by, bx, 0] = state["preds"][cs] << al
    else:  # refinement: one bit per block (G.2.1)
        if reader.read_bit():
            arr[by, bx, 0] |= 1 << al


def _ac_first_unit(reader, block, ac_tab, ss, se, al, state):
    """First AC pass for one block (G.2.2 / decode flowchart F.2.2.2
    extended with EOB runs)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode_symbol(ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += reader.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        block[k] = _extend(reader.receive(s), s) << al
        k += 1


def _ac_refine_unit(reader, block, ac_tab, ss, se, p1, m1, state):
    """AC refinement pass for one block (G.2.2: correction bits for
    history-nonzero coefficients, ±1<<Al insertions for newly
    significant ones, EOB runs still carrying correction bits)."""

    def correct(k):
        # history-nonzero coefficient: one correction bit
        if reader.read_bit() and (int(block[k]) & p1) == 0:
            block[k] += p1 if block[k] >= 0 else m1

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = reader.decode_symbol(ac_tab)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r != 15:  # EOBn: run of blocks ending here
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += reader.receive(r)
                    break
                # ZRL: skip 16 zero-history positions (correcting nonzeros)
            else:
                if s != 1:
                    raise ValueError("AC refinement size must be 1")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if block[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                block[k] = val
            k += 1
    if state["eobrun"] > 0:
        # inside an EOB run: only correction bits for nonzero history
        while k <= se:
            if block[k] != 0:
                correct(k)
            k += 1
        state["eobrun"] -= 1


#: natural-order row/col lookup for vectorized un-zigzag
_ZZ_ROWS = np.array([rc[0] for rc in ZIGZAG])
_ZZ_COLS = np.array([rc[1] for rc in ZIGZAG])


def _reconstruct_progressive(frame, coefs, qtables) -> np.ndarray:
    """Dequantize + IDCT the accumulated coefficient arrays (vectorized
    over all blocks of a component at once) and assemble the image."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = {}
    for cid, hi, vi, tq in comps:
        arr = coefs[cid]  # (by, bx, 64) zigzag
        by, bx = arr.shape[:2]
        q = qtables[tq]
        nat = np.zeros((by, bx, 8, 8), np.float64)
        nat[:, :, _ZZ_ROWS, _ZZ_COLS] = arr
        nat *= q[None, None, :, :]
        blocks = _C.T[None, :, :] @ nat.reshape(-1, 8, 8) @ _C[None, :, :]
        planes[cid] = (
            blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
            + 128.0
        )
    return _assemble(planes, comps, h, w, hmax, vmax)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _encode_block(writer, coef_q, pred, dc_codes, ac_codes):
    """Entropy-encode one quantized block; returns the new DC predictor."""
    zz = [int(coef_q[r, c]) for r, c in ZIGZAG]
    diff = zz[0] - pred
    s, bits = _magnitude(diff)
    code, ln = dc_codes[s]
    writer.write(code, ln)
    if s:
        writer.write(bits, s)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s, bits = _magnitude(zz[k])
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(bits, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return zz[0]


def _pad_edge(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Pad to multiples of (bh, bw) by edge replication."""
    h, w = plane.shape
    ph = -(-h // bh) * bh
    pw = -(-w // bw) * bw
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    zz = bytes(int(table[r, c]) for r, c in ZIGZAG)
    return b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + bytes([tq]) + zz


def _dht_segment(tc: int, th: int, spec) -> bytes:
    bits, values = spec
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def encode_jpeg(
    arr: np.ndarray,
    *,
    quality: int = 90,
    subsampling: str = "4:4:4",
    quant_tables: tuple[np.ndarray, np.ndarray] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8 to a
    baseline JFIF JPEG with the Annex K Huffman tables."""
    arr = np.asarray(arr, dtype=np.float64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in (1, 3):
        raise ValueError(f"unsupported channel count {ch}")
    if quant_tables is None:
        ql, qc = quality_tables(quality)
    else:
        ql, qc = (np.asarray(t, dtype=np.int64) for t in quant_tables)
    if ch == 1:
        comps = [(1, 1, 1, 0)]  # (cid, hi, vi, tq)
        planes = {1: arr[:, :, 0]}
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "4:4:4":
            hy = vy = 1
        elif subsampling == "4:2:0":
            hy = vy = 2
        elif subsampling == "4:2:2":
            hy, vy = 2, 1
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        comps = [(1, hy, vy, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        # subsample chroma by block mean over the sampling cell
        def down(p, fh, fv):
            if fh == 1 and fv == 1:
                return p
            pp = _pad_edge(p, fv, fh)
            return pp.reshape(pp.shape[0] // fv, fv, pp.shape[1] // fh, fh).mean(axis=(1, 3))

        planes = {1: y, 2: down(cb, hy, vy), 3: down(cr, hy, vy)}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad every component plane to its MCU-grid size by edge replication
    padded = {}
    for cid, hi, vi, _ in comps:
        target_h = mcuy * vi * 8
        target_w = mcux * hi * 8
        p = planes[cid]
        p = np.pad(
            p,
            ((0, max(0, target_h - p.shape[0])), (0, max(0, target_w - p.shape[1]))),
            mode="edge",
        )
        padded[cid] = p[:target_h, :target_w]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += _dqt_segment(0, ql)
    if ch == 3:
        out += _dqt_segment(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hi, vi, tq in comps:
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, HUFF_DC_LUMA)
    out += _dht_segment(1, 0, HUFF_AC_LUMA)
    if ch == 3:
        out += _dht_segment(0, 1, HUFF_DC_CHROMA)
        out += _dht_segment(1, 1, HUFF_AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        td_ta = 0x00 if cid == 1 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])  # Ss/Se/AhAl (baseline fixed)
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _build_codes(*HUFF_DC_LUMA)
    ac_l = _build_codes(*HUFF_AC_LUMA)
    dc_c = _build_codes(*HUFF_DC_CHROMA)
    ac_c = _build_codes(*HUFF_AC_CHROMA)
    writer = _BitWriter()
    preds = {cid: 0 for cid, *_ in comps}
    n_mcu, rst = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                writer.align()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = {cid: 0 for cid in preds}
            for cid, hi, vi, tq in comps:
                q = ql if tq == 0 else qc
                dc_codes = dc_l if cid == 1 else dc_c
                ac_codes = ac_l if cid == 1 else ac_c
                for v in range(vi):
                    for u in range(hi):
                        y0 = (my * vi + v) * 8
                        x0 = (mx * hi + u) * 8
                        block = padded[cid][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coef = fdct2(block)
                        coef_q = np.round(coef / q).astype(np.int64)
                        preds[cid] = _encode_block(writer, coef_q, preds[cid], dc_codes, ac_codes)
            n_mcu += 1
    writer.align()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (T.81 Annex G.1): emits the libjpeg
# jpeg_simple_progression scan script by default. The Annex K AC tables
# lack the EOBn symbols (0x10..0xE0) progressive needs, so AC scans use a
# flat 8-bit table over every run/size + EOBn + ZRL symbol (176 < 255
# codes, all-ones code unused as the spec requires).
# ---------------------------------------------------------------------------

_PROG_AC_SYMBOLS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 11)}
    | {r << 4 for r in range(15)}  # EOB0..EOB14
    | {0xF0}  # ZRL
)
PROG_AC_TABLE = (
    [0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0],
    _PROG_AC_SYMBOLS,
)

#: libjpeg jpeg_simple_progression scripts: (comp_indices, Ss, Se, Ah, Al)
_SCRIPT_COLOR = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]
_SCRIPT_GRAY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]


class _ProgACState:
    """Per-scan AC entropy state: EOB run + buffered correction bits
    (refinement bits owed for blocks inside the pending EOB run)."""

    def __init__(self, writer, ac_codes):
        self.writer = writer
        self.ac_codes = ac_codes
        self.eobrun = 0
        self.pending_bits: list[int] = []

    def flush(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, ln = self.ac_codes[nbits << 4]
            self.writer.write(code, ln)
            if nbits:
                self.writer.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for bit in self.pending_bits:
            self.writer.write(bit, 1)
        self.pending_bits = []


def _encode_ac_first(block, ss, se, al, st: _ProgACState):
    """First AC pass for one block's band (G.1.2.2: point transform =
    magnitude shift, EOB runs accumulate across blocks)."""
    w, codes = st.writer, st.ac_codes
    r = 0
    wrote = False
    for k in range(ss, se + 1):
        v = int(block[k])
        t = (abs(v) >> al) * (1 if v >= 0 else -1)
        if t == 0:
            r += 1
            continue
        if not wrote:
            st.flush()
            wrote = True
        while r > 15:
            code, ln = codes[0xF0]
            w.write(code, ln)
            r -= 16
        s, bits = _magnitude(t)
        code, ln = codes[(r << 4) | s]
        w.write(code, ln)
        w.write(bits, s)
        r = 0
    if r > 0 or not wrote:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush()


def _encode_ac_refine(block, ss, se, al, st: _ProgACState):
    """AC refinement pass for one block's band (G.1.2.3): newly
    significant coefficients emit run/1 + sign, history-nonzero ones emit
    correction bits — buffered so bits owed inside an EOB run land right
    after the EOBn code, exactly where the decoder reads them."""
    w, codes = st.writer, st.ac_codes
    absv = [abs(int(block[k])) >> al for k in range(ss, se + 1)]
    eob = 0  # index AFTER the last newly-significant coefficient
    for i, t in enumerate(absv):
        if t == 1:
            eob = i + 1
    r = 0
    local_bits: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        # ZRLs must be emitted at EVERY nonzero while a newly-significant
        # coefficient still lies ahead (i < eob) — this keeps the pending
        # zero run ≤ 15 whenever a correction bit is buffered, which is
        # what guarantees the decoder's positional walk consumes the
        # buffered bits exactly where they were emitted. Past the last
        # new-significant coefficient the zeros fold into the EOB run
        # instead (whose decoder walk reads every remaining bit).
        while r > 15 and i < eob:
            st.flush()
            code, ln = codes[0xF0]
            w.write(code, ln)
            r -= 16
            for bit in local_bits:
                w.write(bit, 1)
            local_bits = []
        if t > 1:  # history-nonzero: correction bit rides with next symbol
            local_bits.append(t & 1)
            continue
        # newly significant (t == 1)
        st.flush()
        code, ln = codes[(r << 4) | 1]
        w.write(code, ln)
        w.write(1 if int(block[ss + i]) >= 0 else 0, 1)
        for bit in local_bits:
            w.write(bit, 1)
        local_bits = []
        r = 0
    if r > 0 or local_bits:
        st.eobrun += 1
        st.pending_bits.extend(local_bits)
        if st.eobrun == 0x7FFF or len(st.pending_bits) > 900:
            st.flush()


def encode_progressive_jpeg(
    arr: np.ndarray,
    *,
    quality: int = 90,
    subsampling: str = "4:4:4",
    quant_tables: tuple[np.ndarray, np.ndarray] | None = None,
    scans: list[tuple[tuple[int, ...], int, int, int, int]] | None = None,
) -> bytes:
    """Encode grayscale/RGB uint8 to a progressive (SOF2) JFIF JPEG.

    The DCT coefficients are identical to :func:`encode_jpeg`'s for the
    same quantizers — only the scan order differs — so decoding the two
    outputs yields bit-identical pixels (pinned by the round-trip
    property test)."""
    arr = np.asarray(arr, dtype=np.float64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in (1, 3):
        raise ValueError(f"unsupported channel count {ch}")
    if quant_tables is None:
        ql, qc = quality_tables(quality)
    else:
        ql, qc = (np.asarray(t, dtype=np.int64) for t in quant_tables)
    if ch == 1:
        comps = [(1, 1, 1, 0)]
        planes = {1: arr[:, :, 0]}
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "4:4:4":
            hy = vy = 1
        elif subsampling == "4:2:0":
            hy = vy = 2
        elif subsampling == "4:2:2":
            hy, vy = 2, 1
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        comps = [(1, hy, vy, 0), (2, 1, 1, 1), (3, 1, 1, 1)]

        def down(p, fh, fv):
            if fh == 1 and fv == 1:
                return p
            pp = _pad_edge(p, fv, fh)
            return pp.reshape(pp.shape[0] // fv, fv, pp.shape[1] // fh, fh).mean(axis=(1, 3))

        planes = {1: y, 2: down(cb, hy, vy), 3: down(cr, hy, vy)}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # quantized coefficients for every (padded) block, zigzag order
    coefs = {}
    for cid, hi, vi, tq in comps:
        q = ql if tq == 0 else qc
        target_h, target_w = mcuy * vi * 8, mcux * hi * 8
        p = planes[cid]
        p = np.pad(
            p,
            ((0, max(0, target_h - p.shape[0])), (0, max(0, target_w - p.shape[1]))),
            mode="edge",
        )[:target_h, :target_w]
        by, bx = target_h // 8, target_w // 8
        blocks = p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
        coef = _C[None, None] @ blocks @ _C.T[None, None]
        coef_q = np.round(coef / q[None, None]).astype(np.int64)
        coefs[cid] = coef_q[:, :, _ZZ_ROWS, _ZZ_COLS]  # (by, bx, 64)

    if scans is None:
        scans = _SCRIPT_COLOR if ch == 3 else _SCRIPT_GRAY

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += _dqt_segment(0, ql)
    if ch == 3:
        out += _dqt_segment(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hi, vi, tq in comps:
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, HUFF_DC_LUMA)
    out += _dht_segment(1, 0, PROG_AC_TABLE)
    if ch == 3:
        out += _dht_segment(0, 1, HUFF_DC_CHROMA)
        out += _dht_segment(1, 1, PROG_AC_TABLE)

    dc_codes = {0: _build_codes(*HUFF_DC_LUMA), 1: _build_codes(*HUFF_DC_CHROMA)}
    ac_codes = _build_codes(*PROG_AC_TABLE)

    frame = (h, w, comps)
    for comp_idx, ss, se, ah, al in scans:
        scan_comps = [comps[i] for i in comp_idx]
        sos = bytes([len(scan_comps)])
        for cid, *_ in scan_comps:
            td = 0 if cid == 1 else 1
            sos += bytes([cid, (td << 4) | (0 if cid == 1 else 1)])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

        writer = _BitWriter()
        if ss == 0:  # DC scan
            preds = {cid: 0 for cid, *_ in scan_comps}
            if len(scan_comps) > 1:
                units = [
                    (cid, my * vi + v, mx * hi + u)
                    for my in range(mcuy)
                    for mx in range(mcux)
                    for cid, hi, vi, _ in scan_comps
                    for v in range(vi)
                    for u in range(hi)
                ]
            else:
                cid = scan_comps[0][0]
                nbh, nbw = _comp_blocks(frame, cid)
                units = [(cid, by, bx) for by in range(nbh) for bx in range(nbw)]
            for cid, by, bx in units:
                dc = int(coefs[cid][by, bx, 0])
                if ah == 0:
                    val = dc >> al  # DC point transform is arithmetic shift
                    diff = val - preds[cid]
                    preds[cid] = val
                    s, bits = _magnitude(diff)
                    code, ln = dc_codes[0 if cid == 1 else 1][s]
                    writer.write(code, ln)
                    if s:
                        writer.write(bits, s)
                else:
                    writer.write((dc >> al) & 1, 1)
        else:  # AC scan: single component
            if len(scan_comps) != 1:
                raise ValueError("progressive AC scan must be single-component")
            cid = scan_comps[0][0]
            nbh, nbw = _comp_blocks(frame, cid)
            st = _ProgACState(writer, ac_codes)
            for by in range(nbh):
                for bx in range(nbw):
                    band = coefs[cid][by, bx]
                    if ah == 0:
                        _encode_ac_first(band, ss, se, al, st)
                    else:
                        _encode_ac_refine(band, ss, se, al, st)
            st.flush()
        writer.align()
        out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
