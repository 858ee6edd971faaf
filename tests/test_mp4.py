"""ISO-BMFF container codec (avro_diff_spark/mp4.py): hand-assembled
spec streams, largesize/to-EOF boxes, forward-compat skipping, malformed
inputs, and the encoder↔parser round trip."""

from __future__ import annotations

import struct

from avro_diff_spark.mp4 import encode_mp4_skeleton, parse_mp4


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def test_round_trip_all_fields():
    for mid in [0, 1, 7, 41, 976, 977, 12345]:
        tracks = [{"handler": b"vide", "width": 320, "height": 240}]
        if mid % 2:
            tracks.append({"handler": b"soun"})
        payload = encode_mp4_skeleton(
            timescale=1000,
            duration=1000 + (mid % 977) * 40,
            tracks=tracks,
            mdat=bytes(mid % 100),
        )
        meta = parse_mp4(payload)
        assert meta == {
            "brand": "isom",
            "timescale": 1000,
            "duration": 1000 + (mid % 977) * 40,
            "n_tracks": len(tracks),
            "handlers": ["vide", "soun"][: len(tracks)],
            "width": 320,
            "height": 240,
            "mdat_bytes": mid % 100,
        }


def test_hand_assembled_minimal_and_unknown_boxes_skipped():
    # spec §4.2: unknown box types are skipped by size (forward compat)
    ftyp = _box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42")
    junk = _box(b"junk", b"\xde\xad\xbe\xef" * 3)
    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00"                   # version/flags
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", 600, 2400)       # timescale, duration
        + b"\x00" * 80,
    )
    moov = _box(b"moov", junk + mvhd)
    meta = parse_mp4(ftyp + junk + moov)
    assert meta["brand"] == "mp42"
    assert meta["timescale"] == 600 and meta["duration"] == 2400
    assert meta["n_tracks"] == 0 and meta["mdat_bytes"] == 0


def test_mvhd_version1_and_largesize_mdat():
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mvhd_v1 = _box(
        b"mvhd",
        b"\x01\x00\x00\x00"
        + struct.pack(">QQ", 0, 0)            # 64-bit times
        + struct.pack(">I", 90000)            # timescale
        + struct.pack(">Q", 123456789)        # 64-bit duration
        + b"\x00" * 80,
    )
    data = b"x" * 24
    mdat_large = (
        struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(data)) + data
    )
    meta = parse_mp4(ftyp + _box(b"moov", mvhd_v1) + mdat_large)
    assert meta["timescale"] == 90000 and meta["duration"] == 123456789
    assert meta["mdat_bytes"] == len(data)


def test_to_eof_box_and_malformed_inputs():
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    data = b"z" * 10
    mdat_eof = struct.pack(">I", 0) + b"mdat" + data  # size 0 = to EOF
    assert parse_mp4(ftyp + mdat_eof)["mdat_bytes"] == len(data)

    assert parse_mp4(b"") is None
    assert parse_mp4(b"not a movie at all") is None
    assert parse_mp4(_box(b"moov", b"")) is None  # must start with ftyp
    # a box whose declared size overruns the buffer stops the walk clean
    bad = ftyp + struct.pack(">I", 4096) + b"mdat" + b"tiny"
    assert parse_mp4(bad)["mdat_bytes"] == 0
    # truncated largesize header
    trunc = ftyp + struct.pack(">I", 1) + b"mdat" + b"\x00\x00"
    assert parse_mp4(trunc)["mdat_bytes"] == 0


def test_spark_synth_and_metadata_follow_the_law(spark):
    from pyspark.sql import functions as F

    from avro_diff_spark import multimodal as MM

    ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    media = MM.synth_mp4_media(ids, "doc_id")
    got = {r.media_id: r for r in MM.mp4_metadata(media).collect()}
    assert len(got) == 40
    for mid in range(40):
        r = got[mid]
        assert r.brand == "isom" and r.timescale == 1000
        assert r.duration == 1000 + (mid % 977) * 40
        assert r.n_tracks == 1 + mid % 3
        assert r.handlers == ",".join(["vide", "soun", "text"][: 1 + mid % 3])
        assert (r.width, r.height) == (16 * (1 + mid % 8), 16 * (1 + mid % 5))
        assert r.mdat_bytes == 32 + mid % 64


def test_property_round_trip_fuzz():
    """Hypothesis fuzz of the encoder↔parser round trip over the full
    parameter space, plus parser robustness on arbitrary byte soup."""
    from hypothesis import given, settings, strategies as st

    handler_sets = st.lists(
        st.sampled_from([b"vide", b"soun", b"text", b"hint"]), max_size=4
    )

    @settings(max_examples=60, deadline=None)
    @given(
        ts=st.integers(min_value=1, max_value=2**31 - 1),
        dur=st.integers(min_value=0, max_value=2**31 - 1),
        hs=handler_sets,
        w=st.integers(min_value=0, max_value=65535),
        h=st.integers(min_value=0, max_value=65535),
        n=st.integers(min_value=0, max_value=256),
    )
    def rt(ts, dur, hs, w, h, n):
        tracks = []
        for j, hd in enumerate(hs):
            tr = {"handler": hd}
            if j == 0 and hd == b"vide":
                tr["width"], tr["height"] = w, h
            tracks.append(tr)
        meta = parse_mp4(
            encode_mp4_skeleton(
                timescale=ts, duration=dur, tracks=tracks, mdat=b"q" * n
            )
        )
        assert meta["timescale"] == ts and meta["duration"] == dur
        assert meta["n_tracks"] == len(tracks)
        assert meta["handlers"] == [hd.decode() for hd in hs]
        assert meta["mdat_bytes"] == n
        if hs and hs[0] == b"vide" and (w or h):
            assert (meta["width"], meta["height"]) == (w, h)

    rt()

    @settings(max_examples=80, deadline=None)
    @given(st.binary(max_size=256))
    def soup(b):
        parse_mp4(b)  # never throws, whatever the bytes

    soup()
