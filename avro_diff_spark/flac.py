"""From-scratch FLAC codec (RFC 9639), zero dependencies beyond numpy.

Lossless audio for the multimodal tier: after RIFF/PCM WAV, FLAC is the
format real audio corpora actually contain, and — like PNG, GIF, VP8L and
snappy before it (same repo pattern) — it is fully publicly specified and
losslessly verifiable, so decoded feature stats stay closed-form
oracle-able.

- decode: the full frame feature set — STREAMINFO + metadata-block walk,
  frame header parsing (all block-size / sample-rate / bit-depth codes,
  UTF-8-coded frame number, CRC-8 verified), subframe types CONSTANT,
  VERBATIM, FIXED (orders 0-4) and LPC (any order, quantized
  coefficients with arithmetic shift), partitioned Rice-coded residuals
  (4- and 5-bit parameters, escape-to-raw partitions), wasted bits, all
  four channel assignments (independent, left-side, right-side,
  mid-side with the side channel's extra bit), and the frame CRC-16.
- encode: exists for fixture generation and round-trip testing — emits
  spec-valid fixed-blocksize streams: CONSTANT where a block is flat,
  otherwise the best of FIXED orders 0-4 by residual magnitude (or
  VERBATIM when forced/cheaper), Rice parameters chosen by exact size
  search with escape-to-raw fallback, stereo decorrelation selectable
  (independent / left-side / right-side / mid-side / auto-smallest),
  correct CRC-8/CRC-16 and the STREAMINFO MD5 of the unencoded samples.
  FLAC is lossless, so decode(encode(x)) == x exactly.

Decode runs inside Arrow-batched ``mapInPandas``
(multimodal.audio_features with auto_audio_decoder) — the correct Spark
shape when the codec itself is the workload: the scan stays JVM-side and
narrow, Python sees only the payload column in Arrow batches.

No reference parity: the reference (yuana97/Avro_Diff) has no media
surface (SURVEY.md §2); this extends the beyond-reference multimodal
tier with real audio decode beyond RIFF/PCM (round-5 verdict item 5).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = ["decode_flac", "encode_flac"]


# ---------------------------------------------------------------------------
# CRCs (RFC 9639 §9.2): CRC-8 poly x^8+x^2+x+1 (0x07), CRC-16 poly
# x^16+x^15+x^2+1 (0x8005), both init 0, MSB-first
# ---------------------------------------------------------------------------

def _make_crc8_table() -> list[int]:
    table = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07 if c & 0x80 else c << 1) & 0xFF
        table.append(c)
    return table


def _make_crc16_table() -> list[int]:
    table = []
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005 if c & 0x8000 else c << 1) & 0xFFFF
        table.append(c)
    return table


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16[(c >> 8) ^ b] ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# bit I/O (MSB-first — FLAC is a big-endian bitstream)
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, byte_pos: int = 0) -> None:
        self.data = data
        self.pos = byte_pos  # byte index
        self.bit = 0  # bits consumed within data[pos]

    def read(self, nbits: int) -> int:
        out = 0
        while nbits > 0:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(nbits, avail)
            cur = self.data[self.pos]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            nbits -= take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return out

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1

    def eof(self) -> bool:
        return self.pos >= len(self.data)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then the terminating 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0, "unaligned bit writer"
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

#: fixed-predictor coefficients by order (RFC 9639 §6.4.2)
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                    8192: 13, 16384: 14, 32768: 15}
_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_BPS_FROM_CODE = {v: k for k, v in _BPS_CODES.items()}


def _utf8_number_encode(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (extended to 36 bits, RFC §9.1.5)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8), (6, 0xFC), (7, 0xFE)):
        if n < (1 << (6 * (nbytes - 1) + (7 - nbytes) if nbytes < 7 else 36)):
            out = bytearray(nbytes)
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (n & 0x3F)
                n >>= 6
            out[0] = lead | n
            return bytes(out)
    raise ValueError("frame number out of range")


def _utf8_number_decode(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    for mask, lead, nb in (
        (0xE0, 0xC0, 2), (0xF0, 0xE0, 3), (0xF8, 0xF0, 4),
        (0xFC, 0xF8, 5), (0xFE, 0xFC, 6), (0xFF, 0xFE, 7),
    ):
        if first & mask == lead:
            nbytes = nb
            val = first & (0xFF >> (nb + 1)) if nb < 7 else 0
            break
    else:
        raise ValueError("bad UTF-8-coded frame number")
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8-coded frame number continuation")
        val = (val << 6) | (b & 0x3F)
    return val


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _decode_residual(br: _BitReader, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    n_parts = 1 << porder
    if blocksize % n_parts:
        raise ValueError("partition count does not divide block size")
    out: list[int] = []
    for part in range(n_parts):
        n = (blocksize >> porder) - (order if part == 0 else 0)
        if n < 0:
            raise ValueError("predictor order exceeds first partition")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            if raw == 0:
                out.extend([0] * n)
            else:
                out.extend(br.read_signed(raw) for _ in range(n))
        else:
            for _ in range(n):
                q = br.read_unary()
                v = (q << param) | br.read(param)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _decode_subframe(br: _BitReader, blocksize: int, bps: int) -> list[int]:
    if br.read(1) != 0:
        raise ValueError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        v = br.read_signed(eff)
        samples = [v] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [br.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED, order = stype - 8
        order = stype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        samples = list(warm)
        for r in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(pred + r)
    elif stype >= 32:  # LPC, order = (stype & 31) + 1
        order = (stype & 31) + 1
        warm = [br.read_signed(eff) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC coefficient precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift is forbidden (RFC 9639)")
        coefs = [br.read_signed(precision) for _ in range(order)]
        resid = _decode_residual(br, blocksize, order)
        samples = list(warm)
        for r in resid:
            acc = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append((acc >> shift) + r)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(payload: bytes, *, verify_md5: bool = False):
    """Decode a FLAC stream → (samples int32 ndarray of shape
    (n_samples, n_channels), sample_rate, bits_per_sample). Verifies the
    sync code, header CRC-8 and frame CRC-16 of every frame; with
    ``verify_md5`` also the STREAMINFO MD5 of the decoded audio."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC marker)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated metadata block header")
        hdr = int.from_bytes(payload[pos : pos + 4], "big")
        last, btype, length = hdr >> 31, (hdr >> 24) & 0x7F, hdr & 0xFFFFFF
        body = payload[pos + 4 : pos + 4 + length]
        if btype == 0:
            streaminfo = body
        pos += 4 + length
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("missing STREAMINFO")
    si = int.from_bytes(streaminfo[10:18], "big")
    si_rate = si >> 44
    si_channels = ((si >> 41) & 0x7) + 1
    si_bps = ((si >> 36) & 0x1F) + 1
    total_samples = si & ((1 << 36) - 1)
    md5_expect = streaminfo[18:34]

    channels_out: list[list[int]] = [[] for _ in range(si_channels)]
    br = _BitReader(payload, pos)
    while not br.eof():
        frame_start = br.pos
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("bad frame sync code")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_assign = br.read(4)
        bps_code = br.read(3)
        br.read(1)  # reserved
        _utf8_number_decode(br)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 0:
            rate = si_rate
        elif sr_code in _SAMPLE_RATES:
            rate = _SAMPLE_RATES[sr_code]
        elif sr_code == 12:
            rate = br.read(8) * 1000
        elif sr_code == 13:
            rate = br.read(16)
        elif sr_code == 14:
            rate = br.read(16) * 10
        else:
            raise ValueError("invalid sample rate code")
        bps = si_bps if bps_code == 0 else _BPS_FROM_CODE.get(bps_code)
        if bps is None:
            raise ValueError("reserved bit depth code")
        header_crc = crc8(payload[frame_start : br.pos])
        if br.read(8) != header_crc:
            raise ValueError("frame header CRC-8 mismatch")

        if ch_assign <= 7:
            n_ch = ch_assign + 1
            subs = [_decode_subframe(br, blocksize, bps) for _ in range(n_ch)]
        elif ch_assign in (8, 9, 10):
            n_ch = 2
            extra = [0, 1] if ch_assign == 8 else [1, 0] if ch_assign == 9 else [0, 1]
            a = _decode_subframe(br, blocksize, bps + extra[0])
            b = _decode_subframe(br, blocksize, bps + extra[1])
            if ch_assign == 8:  # left/side: right = left - side
                subs = [a, [x - s for x, s in zip(a, b)]]
            elif ch_assign == 9:  # right/side: left = right + side
                subs = [[x + s for x, s in zip(b, a)], b]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(a, b):
                    mm = (m << 1) | (s & 1)
                    left.append((mm + s) >> 1)
                    right.append((mm - s) >> 1)
                subs = [left, right]
        else:
            raise ValueError("reserved channel assignment")
        if n_ch != si_channels:
            raise ValueError("frame channel count differs from STREAMINFO")
        br.align()
        frame_crc = crc16(payload[frame_start : br.pos])
        if br.read(16) != frame_crc:
            raise ValueError("frame CRC-16 mismatch")
        for ch in range(n_ch):
            channels_out[ch].extend(subs[ch])

    samples = np.array(channels_out, dtype=np.int64).T.copy()
    if total_samples:
        samples = samples[:total_samples]
    if verify_md5 and md5_expect != b"\x00" * 16:
        if _samples_md5(samples, si_bps) != md5_expect:
            raise ValueError("decoded audio MD5 mismatch")
    return samples.astype(np.int32), si_rate, si_bps


def _samples_md5(samples: np.ndarray, bps: int) -> bytes:
    """MD5 of the unencoded audio: interleaved, little-endian,
    bps//8 bytes per sample (RFC 9639 STREAMINFO)."""
    nbytes = (bps + 7) // 8
    flat = samples.astype(np.int64).reshape(-1)
    raw = bytearray()
    mask = (1 << (8 * nbytes)) - 1
    for v in flat.tolist():
        raw += int(v & mask).to_bytes(nbytes, "little")
    return hashlib.md5(bytes(raw)).digest()


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _zigzag(r: int) -> int:
    return (r << 1) if r >= 0 else ((-r) << 1) - 1


def _write_residual(bw: _BitWriter, resid: list[int]) -> None:
    """Rice-code one partition (order 0) with the exact-size-optimal
    parameter, escaping to raw fixed-width when that is smaller."""
    zz = [_zigzag(r) for r in resid]
    best_param, best_cost = 0, None
    for param in range(15):
        cost = sum(z >> param for z in zz) + len(zz) * (1 + param)
        if best_cost is None or cost < best_cost:
            best_param, best_cost = param, cost
    raw_bits = max((abs(r).bit_length() + 1 for r in resid), default=0)
    raw_cost = 5 + raw_bits * len(resid)
    bw.write(0, 2)  # method 0: 4-bit params
    bw.write(0, 4)  # partition order 0
    if resid and raw_cost < best_cost:
        bw.write(15, 4)  # escape
        bw.write(raw_bits, 5)
        for r in resid:
            bw.write_signed(r, raw_bits)
    else:
        bw.write(best_param, 4)
        for z in zz:
            bw.write_unary(z >> best_param)
            bw.write(z & ((1 << best_param) - 1), best_param)


def _encode_subframe(bw: _BitWriter, samples: list[int], bps: int, *, force_verbatim: bool = False) -> None:
    n = len(samples)
    if not force_verbatim and n and all(s == samples[0] for s in samples):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(samples[0], bps)
        return
    best = None
    if not force_verbatim:
        for order, coefs in _FIXED_COEFS.items():
            if order > min(n - 1, 4) or (order and n <= order):
                continue
            resid = [
                samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
                for i in range(order, n)
            ]
            # compare candidates by their cheapest rice parameter's cost
            zz = [_zigzag(r) for r in resid]
            cost = order * bps + min(
                (sum(z >> p for z in zz) + len(zz) * (1 + p) for p in range(15)),
                default=0,
            )
            if best is None or cost < best[0]:
                best = (cost, order, resid)
    verbatim_cost = n * bps
    if best is None or verbatim_cost < best[0]:
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for s in samples:
            bw.write_signed(s, bps)
        return
    _, order, resid = best
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED
    bw.write(0, 1)
    for s in samples[:order]:
        bw.write_signed(s, bps)
    _write_residual(bw, resid)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16_000,
    bits_per_sample: int = 16,
    *,
    block_size: int = 4096,
    stereo: str = "auto",
    force_verbatim: bool = False,
) -> bytes:
    """Encode int samples (shape (n,) mono or (n, ch)) as a spec-valid
    FLAC stream. ``stereo`` ∈ auto|independent|left_side|right_side|
    mid_side (2-channel input only; auto picks the smallest per frame)."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if ch > 8:
        raise ValueError("FLAC supports at most 8 channels")
    lo, hi = -(1 << (bits_per_sample - 1)), (1 << (bits_per_sample - 1)) - 1
    if arr.size and (arr.min() < lo or arr.max() > hi):
        raise ValueError("samples exceed bits_per_sample range")

    frames = bytearray()
    for frame_no, start in enumerate(range(0, max(n, 1), block_size)):
        block = arr[start : start + block_size]
        bs = len(block)
        if bs == 0:
            break
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed-blocksize stream
        bs_code = _BLOCKSIZE_CODES.get(bs, 7)
        hdr.write(bs_code, 4)
        sr_code = next((c for c, r in _SAMPLE_RATES.items() if r == sample_rate), None)
        if sr_code is None:
            sr_code = 13 if sample_rate < 1 << 16 else 0
        hdr.write(sr_code, 4)

        def subframes_for(mode: str) -> tuple[int, list[tuple[list[int], int]]]:
            if mode == "independent":
                return (ch - 1), [(block[:, c].tolist(), bits_per_sample) for c in range(ch)]
            left, right = block[:, 0].tolist(), block[:, 1].tolist()
            side = [l - r for l, r in zip(left, right)]
            if mode == "left_side":
                return 8, [(left, bits_per_sample), (side, bits_per_sample + 1)]
            if mode == "right_side":
                return 9, [(side, bits_per_sample + 1), (right, bits_per_sample)]
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            return 10, [(mid, bits_per_sample), (side, bits_per_sample + 1)]

        if ch == 2 and stereo != "independent":
            modes = (
                ["left_side", "right_side", "mid_side", "independent"]
                if stereo == "auto"
                else [stereo]
            )
        else:
            modes = ["independent"]
        best_body = None
        best_assign = 0
        for mode in modes:
            assign, subs = subframes_for(mode)
            body = _BitWriter()
            for s, bps in subs:
                _encode_subframe(body, s, bps, force_verbatim=force_verbatim)
            body.align()
            bb = body.getvalue()
            if best_body is None or len(bb) < len(best_body):
                best_body, best_assign = bb, assign
        hdr.write(best_assign, 4)
        hdr.write(_BPS_CODES[bits_per_sample], 3)
        hdr.write(0, 1)  # reserved
        head = hdr.getvalue() + _utf8_number_encode(frame_no)
        if bs_code == 7:
            head += struct.pack(">H", bs - 1)
        if sr_code == 13:
            head += struct.pack(">H", sample_rate)
        head += bytes([crc8(head)])
        frame = head + best_body
        frame += struct.pack(">H", crc16(frame))
        frames += frame

    si = _BitWriter()
    si.write(min(block_size, max(n, 1)), 16)  # min block size
    si.write(block_size if n > block_size else max(n, 1), 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(n, 36)
    streaminfo = si.getvalue() + _samples_md5(arr, bits_per_sample)
    meta = bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    return b"fLaC" + meta + bytes(frames)
