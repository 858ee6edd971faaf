"""FLAC codec (RFC 9639) tests.

The encoder emits CONSTANT/VERBATIM/FIXED subframes, so those decode
paths (plus Rice coding, escape partitions, stereo decorrelation, CRCs,
multi-block streams) are pinned by exact round-trips — FLAC is lossless.
The LPC subframe path, which the encoder never produces, is pinned by a
HAND-ASSEMBLED bitstream built per the public spec with closed-form
expected samples — the same strategy as the WebP/GIF/JPEG codec pins.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from avro_diff_spark import flac as FL


# ---------------------------------------------------------------- round trip

@settings(max_examples=30, deadline=None)
@given(
    st.integers(0, 10_000),
    st.integers(1, 700),
    st.sampled_from([1, 2]),
    st.sampled_from(["auto", "independent", "left_side", "right_side", "mid_side"]),
)
def test_roundtrip_exact(seed, n, ch, stereo):
    rng = np.random.RandomState(seed)
    x = rng.randint(-(1 << 15), 1 << 15, (n, ch)).astype(np.int32)
    if ch == 1:
        x = x[:, 0]
    blob = FL.encode_flac(x, 16_000, 16, stereo=stereo, block_size=256)
    out, rate, bps = FL.decode_flac(blob, verify_md5=True)
    assert (rate, bps) == (16_000, 16)
    want = x[:, None] if x.ndim == 1 else x
    assert np.array_equal(out, want)


def test_constant_and_smooth_signals_compress():
    t = np.arange(4000)
    smooth = (2000 * np.sin(t / 60)).astype(np.int32)
    blob = FL.encode_flac(smooth)
    out, _, _ = FL.decode_flac(blob, verify_md5=True)
    assert np.array_equal(out[:, 0], smooth)
    # fixed predictors + rice must beat raw PCM on a smooth signal
    assert len(blob) < smooth.size * 2 * 0.5
    const = FL.encode_flac(np.full(4000, 123, np.int32))
    assert len(const) < 200  # one CONSTANT subframe per frame


def test_verbatim_forced_roundtrip():
    rng = np.random.RandomState(1)
    x = rng.randint(-100, 100, 333).astype(np.int32)
    out, _, _ = FL.decode_flac(
        FL.encode_flac(x, force_verbatim=True), verify_md5=True
    )
    assert np.array_equal(out[:, 0], x)


def test_crc_corruption_detected():
    x = np.arange(-100, 100, dtype=np.int32)
    blob = bytearray(FL.encode_flac(x))
    # flip a bit inside the last frame's audio payload (past STREAMINFO:
    # 4 marker + 4 header + 34 body = 42; frame starts right after)
    blob[-4] ^= 0x10
    # either the CRC-16 catches it, or the corrupted rice stream derails
    # first — both are hard failures, never silent wrong samples
    with pytest.raises(ValueError, match="CRC|truncated|sync"):
        FL.decode_flac(bytes(blob))
    with pytest.raises(ValueError, match="fLaC"):
        FL.decode_flac(b"not flac")


def test_streaminfo_md5_verified():
    x = np.arange(500, dtype=np.int32) % 97
    blob = bytearray(FL.encode_flac(x))
    blob[42 - 16] ^= 0xFF  # corrupt one MD5 byte (MD5 = last 16 of STREAMINFO)
    with pytest.raises(ValueError, match="MD5"):
        FL.decode_flac(bytes(blob), verify_md5=True)
    FL.decode_flac(bytes(blob))  # without verify_md5 the stream still decodes


# ------------------------------------------------------- hand-assembled LPC

def _frame_wrap(body_bits: FL._BitWriter, blocksize: int, *, bps_code: int = 4) -> bytes:
    """Wrap subframe bits in a valid single-frame mono FLAC stream."""
    hdr = FL._BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)  # reserved + fixed-blocksize
    hdr.write(7, 4)  # 16-bit blocksize at end of header
    hdr.write(5, 4)  # 16 kHz
    hdr.write(0, 4)  # mono
    hdr.write(bps_code, 3)
    hdr.write(0, 1)
    head = hdr.getvalue() + FL._utf8_number_encode(0)
    head += (blocksize - 1).to_bytes(2, "big")
    head += bytes([FL.crc8(head)])
    body_bits.align()
    frame = head + body_bits.getvalue()
    frame += FL.crc16(frame).to_bytes(2, "big")

    si = FL._BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 48)
    si.write(16_000, 20)
    si.write(0, 3)  # mono
    si.write(15, 5)  # 16 bps
    si.write(blocksize, 36)
    streaminfo = si.getvalue() + b"\x00" * 16  # MD5 unset
    meta = bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    return b"fLaC" + meta + bytes(frame)


def test_lpc_subframe_hand_assembled():
    """LPC order-2, precision 4, shift 1, coefficients [3, -1] (i.e.
    pred = (3*s[i-1] - s[i-2]) >> 1), residuals rice(param=2) — decoded
    samples must equal the closed-form recurrence."""
    warm = [100, 103]
    resid = [1, -2, 3, 0, -1, 2, -3, 1, 0, 2, -1, 1, 2, 0]
    blocksize = len(warm) + len(resid)

    bw = FL._BitWriter()
    bw.write(0, 1)  # pad
    bw.write(32 + 1, 6)  # LPC, order 2
    bw.write(0, 1)  # no wasted bits
    for w in warm:
        bw.write_signed(w, 16)
    bw.write(3, 4)  # precision-1 -> 4 bits
    bw.write_signed(1, 5)  # shift
    bw.write_signed(3, 4)  # c0 (applies to s[i-1])
    bw.write_signed(-1, 4)  # c1 (applies to s[i-2])
    bw.write(0, 2)  # rice method 0
    bw.write(0, 4)  # partition order 0
    bw.write(2, 4)  # rice param 2
    for r in resid:
        z = (r << 1) if r >= 0 else ((-r) << 1) - 1
        bw.write_unary(z >> 2)
        bw.write(z & 3, 2)

    out, rate, bps = FL.decode_flac(_frame_wrap(bw, blocksize))
    want = list(warm)
    for r in resid:
        want.append(((3 * want[-1] - want[-2]) >> 1) + r)
    assert out[:, 0].tolist() == want
    assert (rate, bps) == (16_000, 16)


def test_escape_partition_hand_assembled():
    """A rice-escaped partition (param=15 -> 5-bit raw width) decodes as
    fixed-width two's-complement residuals."""
    warm = [7]
    resid = [100, -100, 55, -1]
    blocksize = len(warm) + len(resid)
    bw = FL._BitWriter()
    bw.write(0, 1)
    bw.write(8 + 1, 6)  # FIXED order 1
    bw.write(0, 1)
    bw.write_signed(warm[0], 16)
    bw.write(0, 2)  # method 0
    bw.write(0, 4)  # partition order 0
    bw.write(15, 4)  # ESCAPE
    bw.write(8, 5)  # 8 raw bits per residual
    for r in resid:
        bw.write_signed(r, 8)
    out, _, _ = FL.decode_flac(_frame_wrap(bw, blocksize))
    want = list(warm)
    for r in resid:
        want.append(want[-1] + r)
    assert out[:, 0].tolist() == want


def test_wasted_bits_hand_assembled():
    """wasted-bits flag: samples decode at bps-k and shift back left."""
    vals = [4, 8, -12, 16, -4, 0]  # all divisible by 4 -> 2 wasted bits
    blocksize = len(vals)
    bw = FL._BitWriter()
    bw.write(0, 1)
    bw.write(1, 6)  # VERBATIM
    bw.write(1, 1)  # wasted flag
    bw.write(0b01, 2)  # unary 1 -> wasted = 2
    for v in vals:
        bw.write_signed(v >> 2, 14)  # 16 - 2 wasted
    out, _, _ = FL.decode_flac(_frame_wrap(bw, blocksize))
    assert out[:, 0].tolist() == vals


# ------------------------------------------------------------ spark surface

def test_audio_features_flac_matches_wav(spark, sf_dir):
    """The FLAC query decodes to exactly the WAV query's stats — the two
    payloads encode the same closed-form law, losslessly."""
    from avro_diff_spark.pipelines import q_audio_features_flac, q_audio_features_wav

    flac_rows = {r.media_id: r for r in q_audio_features_flac(spark, sf_dir).collect()}
    wav_rows = {r.media_id: r for r in q_audio_features_wav(spark, sf_dir).collect()}
    assert flac_rows.keys() == wav_rows.keys()
    for k, fr in flac_rows.items():
        wr = wav_rows[k]
        assert (fr.n_samples, fr.duration_s, fr.mean_amplitude) == (
            wr.n_samples,
            wr.duration_s,
            wr.mean_amplitude,
        )


def test_header_code_paths_hand_assembled():
    """Block-size code 1 (=192) and the explicit sample-rate forms
    (code 12: 8-bit kHz, code 14: 16-bit tens-of-Hz) decode per spec —
    paths the encoder's standard-code preference never emits."""
    vals = list(range(-96, 96))  # 192 samples
    for sr_code, sr_field_bits, sr_field_val, want_rate in (
        (12, 8, 32, 32_000),      # 32 kHz as 8-bit kHz count
        (14, 16, 4410, 44_100),   # 44.1 kHz as 16-bit tens of Hz
    ):
        hdr = FL._BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 2)
        hdr.write(1, 4)  # block size code 1 -> 192
        hdr.write(sr_code, 4)
        hdr.write(0, 4)  # mono
        hdr.write(4, 3)  # 16 bps
        hdr.write(0, 1)
        head = hdr.getvalue() + FL._utf8_number_encode(0)
        head += sr_field_val.to_bytes(sr_field_bits // 8, "big")
        head += bytes([FL.crc8(head)])

        body = FL._BitWriter()
        body.write(0, 1)
        body.write(1, 6)  # VERBATIM
        body.write(0, 1)
        for v in vals:
            body.write_signed(v, 16)
        body.align()
        frame = head + body.getvalue()
        frame += FL.crc16(frame).to_bytes(2, "big")

        si = FL._BitWriter()
        si.write(192, 16); si.write(192, 16); si.write(0, 48)
        si.write(want_rate, 20); si.write(0, 3); si.write(15, 5); si.write(192, 36)
        streaminfo = si.getvalue() + b"\x00" * 16
        meta = bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
        out, rate, bps = FL.decode_flac(b"fLaC" + meta + frame)
        assert out[:, 0].tolist() == vals
        assert (rate, bps) == (want_rate, 16)


def test_utf8_frame_numbers_roundtrip_all_widths():
    """The UTF-8-style coded number survives encode->decode across every
    byte-length class up to the 36-bit maximum."""
    for n in (0, 127, 128, 2047, 2048, 65535, 1 << 20, 1 << 25, 1 << 30, (1 << 36) - 1):
        blob = FL._utf8_number_encode(n)
        br = FL._BitReader(blob)
        assert FL._utf8_number_decode(br) == n, n
