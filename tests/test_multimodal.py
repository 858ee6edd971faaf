"""Multimodal binary-column plumbing tests.

The decode itself is a documented deterministic fake (no image/audio libs in
this container — multimodal.py module docstring); what these tests pin down
is the Spark-side contract: schemas, Arrow batch shape, 1:1 vs 1:N
cardinality, partition survival, and the pure-Column metadata path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_diff_spark import multimodal as MM


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return MM.synth_media(docs, "text", "doc_id").cache()


def test_synth_media_schema(media):
    assert dict(media.dtypes) == {
        "media_id": "bigint",
        "kind": "string",
        "payload": "binary",
    }
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_media_metadata_matches_bytes(spark, media):
    meta = MM.media_metadata(media)
    row = meta.orderBy("media_id").first()
    src = media.orderBy("media_id").first()
    assert row["n_bytes"] == len(src["payload"])
    import hashlib

    assert row["payload_md5"] == hashlib.md5(bytes(src["payload"])).hexdigest()
    assert row["container"] == "unknown"


def test_sniff_container_magics(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n")), (2, bytearray(b"\xff\xd8\xffdata")),
         (3, bytearray(b"RIFFxxxxWAVE")), (4, bytearray(b"plain text"))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r["c"] for r in df.select("media_id", MM.sniff_container(F.col("payload")).alias("c")).collect()}
    assert got == {1: "png", 2: "jpeg", 3: "riff", 4: "unknown"}


def _make_bmp(width: int, height: int) -> bytes:
    """Minimal 24-bit uncompressed BMP with a deterministic gradient."""
    import struct

    channels = 3
    stride = ((width * channels + 3) // 4) * 4
    pixel_bytes = stride * height
    offset = 14 + 40
    header = b"BM" + struct.pack("<IHHI", offset + pixel_bytes, 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    rows = bytearray()
    for y in range(height):
        row = bytearray((x * 7 + y * 13 + c) % 256 for x in range(width) for c in range(3))
        row += b"\x00" * (stride - len(row))
        rows += row
    return header + dib + bytes(rows)


def _make_ppm(width: int, height: int) -> bytes:
    body = bytes((i * 11) % 256 for i in range(width * height * 3))
    return f"P6\n# test\n{width} {height}\n255\n".encode() + body


def test_real_decoder_bmp_ppm_pixels(spark):
    """real_image_decoder reads ACTUAL pixels from the public BMP/PPM specs;
    auto_image_decoder falls back to the fake only for other formats."""
    import numpy as np

    bmp, ppm = _make_bmp(5, 4), _make_ppm(6, 3)
    d = MM.real_image_decoder(bmp)
    assert (d["width"], d["height"], d["channels"]) == (5, 4, 3)
    exp = np.array(
        [(x * 7 + y * 13 + c) % 256 for y in range(4) for x in range(5) for c in range(3)]
    ).mean()
    assert abs(d["mean_byte"] - exp) < 1e-9

    p = MM.real_image_decoder(ppm)
    assert (p["width"], p["height"], p["channels"]) == (6, 3, 3)
    assert abs(p["mean_byte"] - np.array([(i * 11) % 256 for i in range(54)]).mean()) < 1e-9

    # auto: real for BMP/PPM, fake for arbitrary bytes
    assert MM.auto_image_decoder(bmp)["width"] == 5
    assert MM.auto_image_decoder(b"zz-not-an-image")["channels"] == 3

    # and through the Spark mapInPandas path
    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(ppm)), (3, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: (r["width"], r["height"])
        for r in MM.image_features(df, decoder=MM.auto_image_decoder).collect()
    }
    assert rows[1] == (5, 4) and rows[2] == (6, 3)
    # container sniffing recognizes the real formats
    got = {
        r["media_id"]: r["c"]
        for r in df.select(
            "media_id", MM.sniff_container(F.col("payload")).alias("c")
        ).collect()
    }
    assert got == {1: "bmp", 2: "ppm", 3: "unknown"}


def test_real_wav_pcm_decoder(spark):
    import struct

    import numpy as np

    # build a 16-bit stereo PCM WAV: 4 frames, known samples
    samples = np.array([[100, 200], [-100, 300], [0, 0], [32000, -32000]], dtype=np.int16)
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    arr, rate = MM.wav_pcm_decoder(wav)
    assert rate == 8000 and arr.size == 4
    assert list(arr) == [150.0, 100.0, 0.0, 0.0]  # mono-mixed

    feats = MM.audio_features(
        spark.createDataFrame([(1, bytearray(wav))], "media_id long, payload binary"),
        decoder=MM.auto_audio_decoder(),
    ).collect()[0]
    assert feats["n_samples"] == 4 and abs(feats["duration_s"] - 4 / 8000) < 1e-12
    assert abs(feats["mean_amplitude"] - np.abs([150.0, 100.0, 0.0, 0.0]).mean()) < 1e-9


def test_image_features_one_to_one_and_deterministic(media):
    feats = MM.image_features(media)
    assert feats.count() == media.count()
    r = feats.filter(F.col("media_id") == 0).first()
    payload = bytes(media.filter(F.col("media_id") == 0).first()["payload"])
    expected = MM.fake_image_decoder(payload)
    assert (r["width"], r["height"], r["channels"]) == (
        expected["width"], expected["height"], expected["channels"],
    )
    assert r["mean_byte"] == pytest.approx(expected["mean_byte"])


def test_pil_decoder_is_explicit_stub(media):
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed; stub path not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        MM.pil_image_decoder(b"\x89PNG")


def test_audio_features_schema_and_values(media):
    feats = MM.audio_features(media, sample_rate=16_000)
    r = feats.filter(F.col("media_id") == 0).first()
    payload = bytes(media.filter(F.col("media_id") == 0).first()["payload"])
    assert r["n_samples"] == len(payload)
    assert r["duration_s"] == pytest.approx(len(payload) / 16_000)


def test_frame_sample_cardinality_and_coverage(media):
    frames = MM.frame_sample(media, frame_bytes=64, max_frames=8)
    per_doc = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("mx")
    )
    bad = per_doc.filter((F.col("n") < 1) | (F.col("n") > 8) | (F.col("mx") != F.col("n") - 1))
    assert bad.count() == 0
    # every frame's bytes must come from the payload (spot-check doc 0)
    f0 = frames.filter((F.col("media_id") == 0) & (F.col("frame_idx") == 0)).first()
    payload = bytes(media.filter(F.col("media_id") == 0).first()["payload"])
    assert bytes(f0["frame_bytes"]) == payload[: f0["frame_len"]]


def test_map_in_pandas_survives_repartition(media):
    feats = MM.image_features(media.repartition(7))
    assert feats.rdd.getNumPartitions() == 7
    assert feats.count() == media.count()


def test_audio_analysis_known_signal(spark):
    """Hand-built 16-bit mono WAV: samples [100, -50, 0, 200, -200, -1]
    → peak 200, zero crossings at (100,-50), (200,-200) and (0→... 0*200
    is NOT a strict sign flip), rms = sqrt(sum(s^2)/6)."""
    import struct

    import numpy as np

    samples = np.array([100, -50, 0, 200, -200, -1], dtype="<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    r = MM.audio_analysis(
        spark.createDataFrame([(1, bytearray(wav))], "media_id long, payload binary"),
        decoder=MM.auto_audio_decoder(),
    ).collect()[0]
    assert r["n_samples"] == 6
    assert r["peak_amplitude"] == 200.0
    # strict sign flips: (100,-50) and (200,-200); (-50,0),(0,200),(-200,-1) are not
    assert r["n_zero_crossings"] == 2
    expected_rms = float(np.sqrt((samples.astype(np.int64) ** 2).sum() / 6))
    assert r["rms"] == expected_rms


def test_exif_build_parse_roundtrip_both_endians():
    """build_exif_app1 -> parse_exif round-trips every field under both
    TIFF byte orders, and parse returns None for EXIF-less payloads."""
    from avro_diff_spark.multimodal import build_exif_app1, parse_exif

    for order in ("II", "MM"):
        app1 = build_exif_app1(
            byte_order=order, orientation=6, x_resolution=300, description="hello exif"
        )
        jpeg = b"\xff\xd8" + app1 + b"\xff\xd9"
        meta = parse_exif(jpeg)
        assert meta == {
            "byte_order": order,
            "description": "hello exif",
            "orientation": 6,
            "x_resolution": (300, 1),
        }
    assert parse_exif(b"\xff\xd8\xff\xd9") is None
    assert parse_exif(b"not a jpeg") is None


def test_exif_injection_does_not_change_decoded_pixels(spark, sf_dir):
    """The JPEG decoder must skip the injected APP1: image features of
    the EXIF-carrying fixtures equal the plain fixtures' exactly."""
    from avro_diff_spark import multimodal as MM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    plain = {
        r.media_id: r
        for r in MM.image_features(
            MM.synth_jpeg_media(docs, "doc_id"), decoder=MM.real_image_decoder
        ).collect()
    }
    withexif = {
        r.media_id: r
        for r in MM.image_features(
            MM.synth_jpeg_exif_media(docs, "doc_id"), decoder=MM.real_image_decoder
        ).collect()
    }
    assert plain.keys() == withexif.keys() and len(plain) == 40
    for k in plain:
        assert plain[k] == withexif[k]


def test_exif_metadata_survives_malformed_exif(spark):
    """A truncated/garbage EXIF body must yield null metadata, never a
    failed task (round-6 review: struct.error escaped the except)."""
    from avro_diff_spark.multimodal import exif_metadata

    rows = [
        (1, b"\xff\xd8\xff\xe1\x00\x08Exif\x00\x00"),  # APP1 with empty TIFF
        (2, b"\xff\xd8\xff\xe1\x00\x10Exif\x00\x00II\x2a\x00\xff\xff\xff\xff"),
        (3, b"junk not jpeg"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in exif_metadata(df).collect()}
    assert len(got) == 3
    for r in got.values():
        assert r.orientation is None and r.byte_order is None


def test_video_frame_stats_samples_composited_frames(spark):
    """Frame sampling runs on the COMPOSITED sequence: a delta-frame
    animation (partial rect + transparency) yields sampled stats of the
    full canvas after compositing, not of the raw patches."""
    import numpy as np

    from avro_diff_spark.gif import encode_gif_animation
    from avro_diff_spark.multimodal import video_frame_stats

    pal = np.array([[0, 0, 0], [100, 0, 0], [0, 100, 0], [0, 0, 100]], np.uint8)
    frames = [(np.full((4, 4), c, np.uint8), 2 + c) for c in (1, 2, 3, 1, 2)]
    blob = encode_gif_animation(frames, pal)
    df = spark.createDataFrame([(7, bytearray(blob))], "media_id long, payload binary")
    got = sorted(
        (r.frame_idx, r.n_frames, r.delay_cs, r.mean_r, r.mean_g, r.mean_b)
        for r in video_frame_stats(df, every_k=2).collect()
    )
    assert got == [
        (0, 5, 3, 100.0, 0.0, 0.0),
        (2, 5, 5, 0.0, 0.0, 100.0),
        (4, 5, 4, 0.0, 100.0, 0.0),
    ]


def test_dhash32_law_and_robustness():
    """Round 15: the 32-bit dHash law — bit j*4+i set iff the sampled
    gray brightens left-to-right — plus the perceptual properties the
    hash exists for: invariance to re-encoding and (here, exact
    nearest-grid) upscaling, locality under a small retouch, and the
    gray reduction honoring BT.601 (not a channel max)."""
    import numpy as np

    from avro_diff_spark.multimodal import dhash32_of_array
    from avro_diff_spark.png import decode_png, encode_png

    rng = [(g * 31 + 7 * x * x + 13 * y * y) % 251 for g in (3,) for x in (0,) for y in (0,)]
    assert rng  # keep the comprehension honest

    # hand-computed tiny case: 5x8 image == the sample grid itself
    arr = np.zeros((8, 5, 3), np.uint8)
    for j in range(8):
        for i in range(5):
            arr[j, i, :] = (i + j) % 5 * 10  # strictly increasing in i until wrap
    h = dhash32_of_array(arr)
    for j in range(8):
        for i in range(4):
            want = ((i + 1 + j) % 5 * 10) > ((i + j) % 5 * 10)
            assert bool(h >> (j * 4 + i) & 1) == want

    # PNG round-trip invariance (lossless re-encode)
    assert dhash32_of_array(decode_png(encode_png(arr))) == h

    # exact 2x nearest upscale: sampled grid points map to the same
    # source pixels, hash unchanged
    up = np.repeat(np.repeat(arr, 2, axis=0), 2, axis=1)
    assert dhash32_of_array(up) == h

    # a single-pixel retouch at a sampled point flips at most its
    # adjacent comparisons (locality)
    touched = arr.copy()
    touched[0, 0, :] = 255
    d = bin(dhash32_of_array(touched) ^ h).count("1")
    assert 1 <= d <= 2

    # BT.601: green dominates blue — a green-vs-blue swap must move bits
    a = np.zeros((8, 5, 3), np.uint8)
    a[:, 1:, 1] = 200  # bright green right of column 0
    b = np.zeros((8, 5, 3), np.uint8)
    b[:, 1:, 2] = 200  # same in blue
    assert dhash32_of_array(a) == dhash32_of_array(b)  # both brighten
    c = np.zeros((8, 5, 3), np.uint8)
    c[:, 0, 2] = 200  # blue left, green right
    c[:, 1:, 1] = 110
    # 587*110 > 114*200 -> still brightens; a max-channel gray would tie
    assert dhash32_of_array(c) != 0

    # grayscale single-channel path
    g1 = np.arange(40, dtype=np.uint8).reshape(8, 5, 1)
    assert dhash32_of_array(g1) == 0xFFFFFFFF  # strictly increasing rows


def test_image_dhash_and_phash_near_dups(spark):
    """The Spark pass equals the per-row law; the paired fixture's
    variants land within the Hamming ball while the threshold also
    excludes some pairs (both sides of the cutoff exercised)."""
    from pyspark.sql import functions as F

    from avro_diff_spark.multimodal import (
        decode_image_array,
        dhash32_of_array,
        image_dhash,
        synth_phash_media,
    )
    from avro_diff_spark.operators.dedup import phash_near_dups

    docs = spark.range(0, 120).select(F.col("id").alias("doc_id"))
    media = synth_phash_media(docs, "doc_id").localCheckpoint()
    got = {r.media_id: r.dhash for r in image_dhash(media).collect()}
    want = {
        r.media_id: dhash32_of_array(decode_image_array(bytes(r.payload)))
        for r in media.collect()
    }
    assert got == want

    pairs = phash_near_dups(media, max_hamming=2).collect()
    variant = {(r.doc_a, r.doc_b) for r in pairs if r.doc_b == r.doc_a + 1 and r.doc_a % 2 == 0}
    # most variant pairs are within distance 2 (fixture law), not all
    assert 30 <= len(variant) < 60
    assert all(0 <= r.hamming <= 2 for r in pairs)
    # blocking is lossless: pairs == brute force over the hashes
    import itertools

    brute = {
        (a, b)
        for a, b in itertools.combinations(sorted(got), 2)
        if bin(got[a] ^ got[b]).count("1") <= 2
    }
    assert {(r.doc_a, r.doc_b) for r in pairs} == brute


def test_audio_ahash_law_and_near_dups(spark):
    """Round 15: the 32-bit energy-envelope hash — all-integer window
    sums with cross-product mean comparisons — plus its perceptual
    properties (re-encode invariance via FLAC, exact-resample
    invariance), and the paired fixture exercising both sides of the
    Hamming threshold with lossless blocking."""
    import numpy as np
    from pyspark.sql import functions as F

    from avro_diff_spark.multimodal import (
        audio_ahash,
        audio_ahash32_of_samples,
        synth_audio_pairs,
        wav_pcm_decoder,
    )
    from avro_diff_spark.operators.dedup import audio_near_dups

    # hand-checked tiny law: 66 samples, |s| rising per window -> all bits
    up = np.arange(66, dtype=np.float64)
    assert audio_ahash32_of_samples(up) == 0xFFFFFFFF
    assert audio_ahash32_of_samples(-up) == 0xFFFFFFFF  # abs law
    assert audio_ahash32_of_samples(up[::-1]) == 0

    # exact 3x repeat-resample preserves window means -> hash unchanged
    sig = np.array([((7 * t * t + 13 * t) % 401) - 200 for t in range(330)], float)
    assert audio_ahash32_of_samples(np.repeat(sig, 3)) == audio_ahash32_of_samples(sig)

    docs = spark.range(0, 120).select(F.col("id").alias("doc_id"))
    media = synth_audio_pairs(docs, "doc_id").localCheckpoint()
    got = {r.media_id: r.ahash for r in audio_ahash(media).collect()}
    want = {
        r.media_id: audio_ahash32_of_samples(wav_pcm_decoder(bytes(r.payload))[0])
        for r in media.collect()
    }
    assert got == want

    pairs = audio_near_dups(media, max_hamming=2).collect()
    variant = {
        (r.doc_a, r.doc_b)
        for r in pairs
        if r.doc_b == r.doc_a + 1 and r.doc_a % 2 == 0
    }
    assert 30 <= len(variant) <= 60  # most variant pairs in, threshold real
    assert all(0 <= r.hamming <= 2 for r in pairs)
    import itertools

    brute = {
        (a, b)
        for a, b in itertools.combinations(sorted(got), 2)
        if bin(got[a] ^ got[b]).count("1") <= 2
    }
    assert {(r.doc_a, r.doc_b) for r in pairs} == brute
