"""Multimodal (image / audio / video) column handling.

North-star extension (BASELINE.json) — the reference is text/Avro only
(SURVEY.md §1.1); no reference code exists. Design:

- Media is an opaque ``binary`` payload column plus typed metadata columns —
  the layout a 100 TB lakehouse actually uses (payload in parquet binary or
  object-store pointers; metadata queryable without touching bytes).
- Metadata extraction (size, digest, container sniffing) is pure Column
  expressions — JVM-side, codegen, no Python in the scan path.
- Decode / feature-extraction / frame-sampling run as Arrow-batched
  ``mapInPandas`` pipelines: the Spark-side plumbing (schema, batching,
  cardinality change, partition preservation) is real and tested.

Decode status: BMP, PPM, PNG, baseline JPEG, **and GIF** decode for REAL
— :func:`real_image_decoder` reads 24/32-bit BMP and binary PPM pixels
with struct+numpy straight from the public file-format specs, PNG (8-bit
gray/RGB/palette/alpha, all five scanline filters) through the
from-scratch zlib-based codec in :mod:`avro_diff_spark.png`, baseline
sequential JPEG (grayscale + YCbCr 4:4:4/4:2:2/4:2:0, restart markers)
through the from-scratch Huffman+DCT codec in
:mod:`avro_diff_spark.jpeg` (progressive SOF2 included — spectral
selection + successive approximation), and GIF87a/89a (variable-width
LZW, global/local palettes, interlace) through
:mod:`avro_diff_spark.gif` — zero extra dependencies. Lossy WebP (VP8)
is a documented *deterministic fake* (:func:`fake_image_decoder`)
behind the ``decoder=`` hook (:func:`auto_image_decoder` =
real-when-possible, fake otherwise; ``pil_image_decoder`` raises
``NotImplementedError`` until Pillow is installed), and the tier is
DECLARED COMPLETE at this boundary — SURVEY.md §7.4 records the
decision: a conformant VP8 intra decoder needs RFC 6386's default
entropy tables (several KB of spec constants unavailable here), and a
decoder pinned only against a same-source encoder would be fake
conformance. Everything around the decoder — batch shape, schemas,
partitioning — is the production code path either way.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

#: magic prefixes for container sniffing (pure byte compares, JVM-side).
_MAGIC = {
    "png": b"\x89PNG",
    "jpeg": b"\xff\xd8\xff",
    "riff": b"RIFF",  # wav/avi containers
    "flac": b"fLaC",
    "gif": b"GIF8",
    "bmp": b"BM",
    "ppm": b"P6",
}


def synth_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Deterministic media table for tests/benchmarks: payload = UTF-8 bytes
    of ``text_col``, kind cycles image/audio/video by id. Real pipelines read
    payloads from parquet binary columns; nothing downstream cares which."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def synth_png_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL PNG payload per row, generated executor-side.

    Closed-form pixel law (so a SQL oracle can mirror the decoded stats
    without decoding): for ``id``, the image is RGB with
    ``width = 1 + id % 13``, ``height = 1 + id % 7``, and flattened byte
    ``i`` (row-major, channel-minor) equal to ``(id * 31 + i) % 256``;
    the per-row PNG filter type cycles ``(id + y) % 5``, so a corpus
    exercises every predictor branch of the decoder. Generation is
    Arrow-batched ``mapInPandas`` over just the id column — the same
    plumbing shape a real corpus uses to carry parquet binary payloads.
    """
    from collections.abc import Iterator as _It

    narrow = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from avro_diff_spark.png import encode_png

        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"].values:
                mid = int(mid)
                w, h = 1 + mid % 13, 1 + mid % 7
                flat = (np.arange(w * h * 3, dtype=np.int64) * 1 + mid * 31) % 256
                arr = flat.astype(np.uint8).reshape(h, w, 3)
                filters = [(mid + y) % 5 for y in range(h)]
                payloads.append(encode_png(arr, filters=filters))
            yield pd.DataFrame({"media_id": pdf["media_id"].values, "payload": payloads})

    return narrow.mapInPandas(run, schema="media_id long, payload binary")


def synth_jpeg_media(df: DataFrame, id_col: str, *, progressive: bool = False) -> DataFrame:
    """Deterministic REAL baseline-JPEG payload per row, generated
    executor-side, whose *decoded* pixels follow a closed-form law (so a
    SQL oracle can mirror decoded stats without decoding).

    JPEG is lossy, so exactness has to be engineered: the image is
    blockwise-flat — every 8x8 luma block is one value, chroma is globally
    flat — which makes every AC coefficient 0 and every DC coefficient an
    exact multiple of the quantizer step (flat DQT=16, even block values),
    so quantization round-trips losslessly and the orthonormal IDCT
    reproduces the flat value bit-exactly.

    Law for ``id``: ``w = 8 + id % 25``, ``h = 8 + id % 18``; the luma of
    pixel (x, y) is ``v = 2*(9 + (id*31 + (x//8)*7 + (y//8)*13) % 111)``
    (even, in [18, 240] so no channel clips); chroma is Cb=118, Cr=138
    everywhere. The RGB payload pixels are the exact YCbCr inverse of
    that (R=v+14, G=v-4, B=v-18 after rounding), encoded 4:2:0 — the
    round trip through the encoder's forward color transform shifts each
    flat plane by a constant < half a quantizer step, so decoded RGB is
    exactly (v+14, v-4, v-18) again. Exercises multi-block DC differential
    coding, MCU interleave, chroma subsample/upsample, and crop.

    ``progressive=True`` emits the same coefficients as a progressive
    (SOF2) stream via the libjpeg-style scan script — the decoded-pixel
    law (and therefore the oracle) is identical by construction.
    """
    from collections.abc import Iterator as _It

    narrow = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from avro_diff_spark.jpeg import encode_jpeg, encode_progressive_jpeg

        enc = encode_progressive_jpeg if progressive else encode_jpeg
        q16 = np.full((8, 8), 16, np.int64)
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"].values:
                mid = int(mid)
                w, h = 8 + mid % 25, 8 + mid % 18
                bx = np.arange(w) // 8
                by = np.arange(h) // 8
                v = 2 * (9 + (mid * 31 + bx[None, :] * 7 + by[:, None] * 13) % 111)
                rgb = np.stack([v + 14, v - 4, v - 18], axis=-1).astype(np.uint8)
                payloads.append(
                    enc(rgb, subsampling="4:2:0", quant_tables=(q16, q16))
                )
            yield pd.DataFrame({"media_id": pdf["media_id"].values, "payload": payloads})

    return narrow.mapInPandas(run, schema="media_id long, payload binary")


def synth_gif_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL GIF payload per row (real variable-width LZW,
    global color table), generated executor-side. GIF is lossless, so the
    closed-form law IS the decoded result: for ``id``,
    ``w = 5 + id % 28``, ``h = 5 + id % 19``, a 16-color palette with
    entry ``j`` = ``((id*13 + j*29) % 256, (id*7 + j*31) % 256,
    (id*11 + j*37) % 256)``, and pixel (x, y) indexing entry
    ``(id + x*3 + y*5) % 16``."""
    from collections.abc import Iterator as _It

    narrow = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from avro_diff_spark.gif import encode_gif

        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"].values:
                mid = int(mid)
                w, h = 5 + mid % 28, 5 + mid % 19
                j = np.arange(16)
                pal = np.stack(
                    [(mid * 13 + j * 29) % 256, (mid * 7 + j * 31) % 256, (mid * 11 + j * 37) % 256],
                    axis=1,
                ).astype(np.uint8)
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                idx = ((mid + x * 3 + y * 5) % 16).astype(np.uint8)
                payloads.append(encode_gif(idx, pal))
            yield pd.DataFrame({"media_id": pdf["media_id"].values, "payload": payloads})

    return narrow.mapInPandas(run, schema="media_id long, payload binary")


def synth_webp_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL lossless-WebP (VP8L) payload per row, generated
    executor-side. VP8L is lossless, so the closed-form law IS the
    decoded result: for ``id``, ``w = 4 + id % 21``, ``h = 4 + id % 15``,
    and pixel (x, y) is ``R = (id*7 + x*3 + y*11) % 256``,
    ``G = (id*13 + x*5 + y*3) % 256``, ``B = (id*3 + x*7 + y*5) % 256``."""
    from collections.abc import Iterator as _It

    narrow = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from avro_diff_spark.webp import encode_webp

        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"].values:
                mid = int(mid)
                w, h = 4 + mid % 21, 4 + mid % 15
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                rgb = np.stack(
                    [
                        (mid * 7 + x * 3 + y * 11) % 256,
                        (mid * 13 + x * 5 + y * 3) % 256,
                        (mid * 3 + x * 7 + y * 5) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                payloads.append(encode_webp(rgb))
            yield pd.DataFrame({"media_id": pdf["media_id"].values, "payload": payloads})

    return narrow.mapInPandas(run, schema="media_id long, payload binary")


def synth_wav_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL RIFF/WAVE 16-bit PCM payload per row with a
    closed-form sample law: for ``id``, ``n = 160 + id % 241`` mono
    samples at 16 kHz, sample ``i`` equal to
    ``((id*7 + i*13) % 4096) - 2048``. PCM is lossless, so the decoded
    feature stats mirror the law exactly and a SQL oracle can reproduce
    them without touching bytes."""
    from collections.abc import Iterator as _It

    narrow = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import struct as _struct

        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"].values:
                mid = int(mid)
                n = 160 + mid % 241
                samples = (((mid * 7 + np.arange(n) * 13) % 4096) - 2048).astype("<i2")
                data = samples.tobytes()
                fmt = _struct.pack("<HHIIHH", 1, 1, 16_000, 32_000, 2, 16)
                payloads.append(
                    b"RIFF"
                    + _struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
                    + b"WAVE"
                    + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
                    + b"data" + _struct.pack("<I", len(data)) + data
                )
            yield pd.DataFrame({"media_id": pdf["media_id"].values, "payload": payloads})

    return narrow.mapInPandas(run, schema="media_id long, payload binary")


def synth_audio_pairs(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL 16-bit PCM WAV payloads in NEAR-DUPLICATE
    pairs — the audio-dedup fixture (round 15, the audio sibling of
    :func:`synth_phash_media`). Ids ``2g``/``2g+1`` share one base
    signal; the odd variant re-levels two window regions, so the pair's
    energy-envelope hash differs in a few bits (a re-mastered/clipped
    copy) while different groups are unrelated.

    Closed-form law (oracle-replayable without decoding): ``g = id //
    2``, ``n = 800 + g % 257`` mono samples, sample ``t`` equal to
    ``((g·31 + t²·7 + (g % 11)·t) % 401) − 200`` — quadratic term plus
    a g-dependent coefficient keep the hash population diverse (the
    phash fixture lesson; measured 4368 distinct hashes / max
    multiplicity 6 at 5000 ids). The odd variant maps ``s → ((s + 350)
    % 401) − 200`` on windows 0 and 16 of the 33-window split
    (``t ∈ [⌊w·n/33⌋, ⌊(w+1)·n/33⌋)``), flipping at most ~4 of the 32
    comparison bits."""
    from collections.abc import Iterator as _It

    narrow = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import struct as _struct

        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"].values:
                mid = int(mid)
                g, var = mid // 2, mid % 2
                n = 800 + g % 257
                t = np.arange(n, dtype=np.int64)
                s = (g * 31 + t * t * 7 + (g % 11) * t) % 401 - 200
                if var:
                    for w in (0, 16):
                        lo, hi = (w * n) // 33, ((w + 1) * n) // 33
                        s[lo:hi] = (s[lo:hi] + 350) % 401 - 200
                data = s.astype("<i2").tobytes()
                fmt = _struct.pack("<HHIIHH", 1, 1, 16_000, 32_000, 2, 16)
                payloads.append(
                    b"RIFF"
                    + _struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
                    + b"WAVE"
                    + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
                    + b"data" + _struct.pack("<I", len(data)) + data
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].values, "payload": payloads}
            )

    return narrow.mapInPandas(run, schema="media_id long, payload binary")


def audio_ahash32_of_samples(samples) -> int:
    """The 32-bit energy-envelope hash of one decoded mono signal — the
    audio sibling of :func:`dhash32_of_array`, same posture: split the
    signal into 33 equal windows (``[⌊w·n/33⌋, ⌊(w+1)·n/33⌋)``), take
    each window's integer absolute-amplitude sum, and set bit ``i`` iff
    the mean energy RISES from window ``i`` to ``i+1`` — compared
    exactly as the cross-product ``E_{i+1}·len_i > E_i·len_{i+1}`` so
    no division ever happens. Pure integer arithmetic end-to-end:
    bit-exact on any engine, replayable in SQL from a closed-form
    sample law. Robust to re-encoding (lossless codecs), uniform gain
    that preserves energy ordering, and resampling that preserves the
    envelope — the transformations that defeat byte-exact audio dedup.
    PCM decoder floats are exact integers (16-bit samples in float64),
    so the int64 conversion is lossless."""
    import numpy as np

    s = np.abs(np.asarray(samples, dtype=np.float64)).astype(np.int64)
    n = s.size
    bounds = [(w * n) // 33 for w in range(34)]
    e = [int(s[bounds[w] : bounds[w + 1]].sum()) for w in range(33)]
    ln = [bounds[w + 1] - bounds[w] for w in range(33)]
    out = 0
    for i in range(32):
        if e[i + 1] * ln[i] > e[i] * ln[i + 1]:
            out |= 1 << i
    return out


def audio_ahash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    *,
    decoder=None,
) -> DataFrame:
    """``(media_id, ahash)`` — the 32-bit energy-envelope hash
    (:func:`audio_ahash32_of_samples`) of each audio payload, decoded
    by the REAL from-scratch codecs (WAV PCM; FLAC via
    :func:`flac_decoder` when passed) in one Arrow-batched
    ``mapInPandas`` pass. Map-only; Hamming-band pairing downstream
    (``dedup.audio_near_dups``) is where candidates meet."""
    dec = decoder if decoder is not None else wav_pcm_decoder
    narrow = df.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            hashes = pdf["payload"].map(
                lambda b: audio_ahash32_of_samples(dec(bytes(b))[0])
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "ahash": hashes.astype("int64").values,
                }
            )

    return narrow.mapInPandas(run, schema="media_id long, ahash long")


def synth_flac_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL FLAC payload per row encoding the SAME
    closed-form sample law as :func:`synth_wav_media` (``n = 160 + id %
    241`` 16 kHz samples, sample ``i`` = ``((id*7 + i*13) % 4096) -
    2048``) through the from-scratch RFC 9639 encoder. Even ids encode
    MONO; odd ids encode STEREO with both channels equal to the law and
    mid-side decorrelation forced, so the decoder's stereo
    reconstruction runs on half the corpus while the mono-mix — and
    therefore the WAV oracle SQL — is unchanged. FLAC is lossless, so
    decoded feature stats mirror the law exactly; format handling is
    what's under test."""
    from collections.abc import Iterator as _It

    narrow = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from avro_diff_spark.flac import encode_flac

        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"].values:
                mid = int(mid)
                n = 160 + mid % 241
                samples = (((mid * 7 + np.arange(n) * 13) % 4096) - 2048).astype(np.int32)
                if mid % 2:
                    stereo = np.stack([samples, samples], axis=1)
                    payloads.append(encode_flac(stereo, 16_000, 16, stereo="mid_side"))
                else:
                    payloads.append(encode_flac(samples, 16_000, 16))
            yield pd.DataFrame({"media_id": pdf["media_id"].values, "payload": payloads})

    return narrow.mapInPandas(run, schema="media_id long, payload binary")


def synth_gif_anim_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL animated-GIF payload per row (the from-scratch
    GIF89a codec: per-frame Graphic Control Extensions, NETSCAPE loop,
    LZW) under a closed-form law so a SQL oracle mirrors sampled-frame
    stats without decoding: for ``id``, ``w = 6 + id % 10``, ``h = 4 +
    id % 7``, ``n_frames = 2 + id % 4``; frame ``f`` is a CONSTANT
    palette index ``(f*5 + id) % 16`` with delay ``4 + f`` cs, over the
    16-color palette ``pal[j] = ((id*37 + j*11) % 256, (id*13 + j*29) %
    256, (id*7 + j*53) % 256)``."""
    from collections.abc import Iterator as _It

    narrow = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from avro_diff_spark.gif import encode_gif_animation

        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"].values:
                mid = int(mid)
                w, h = 6 + mid % 10, 4 + mid % 7
                j = np.arange(16)
                pal = np.stack(
                    [
                        (mid * 37 + j * 11) % 256,
                        (mid * 13 + j * 29) % 256,
                        (mid * 7 + j * 53) % 256,
                    ],
                    axis=1,
                ).astype(np.uint8)
                frames = [
                    (np.full((h, w), (f * 5 + mid) % 16, np.uint8), 4 + f)
                    for f in range(2 + mid % 4)
                ]
                payloads.append(encode_gif_animation(frames, pal, loop=0))
            yield pd.DataFrame({"media_id": pdf["media_id"].values, "payload": payloads})

    return narrow.mapInPandas(run, schema="media_id long, payload binary")


VIDEO_FRAME_STATS_SCHEMA = (
    "media_id long, frame_idx int, n_frames int, delay_cs int, "
    "width int, height int, mean_r double, mean_g double, mean_b double"
)


def video_frame_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    *,
    every_k: int = 2,
) -> DataFrame:
    """REAL frame sampling over animated-GIF payloads: decode the frame
    sequence (full GCE/compositing semantics), keep every ``every_k``-th
    frame, emit per-sampled-frame stats — the frame-extraction pass of a
    video-corpus pipeline, on a container the from-scratch codec
    actually decodes (video proper stays behind the stub hooks). Same
    Arrow-batched ``mapInPandas`` shape as image/audio features."""
    narrow = df.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        from avro_diff_spark.gif import decode_gif_frames

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"].values, pdf["payload"].values):
                frames = decode_gif_frames(bytes(b))
                n = len(frames)
                for f in range(0, n, every_k):
                    rgb, delay = frames[f]
                    rows.append(
                        (
                            mid,
                            f,
                            n,
                            delay,
                            rgb.shape[1],
                            rgb.shape[0],
                            float(rgb[:, :, 0].mean()),
                            float(rgb[:, :, 1].mean()),
                            float(rgb[:, :, 2].mean()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "frame_idx",
                    "n_frames",
                    "delay_cs",
                    "width",
                    "height",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                ],
            )

    return narrow.mapInPandas(run, schema=VIDEO_FRAME_STATS_SCHEMA)


def build_exif_app1(
    *,
    byte_order: str,
    orientation: int,
    x_resolution: int,
    description: str,
) -> bytes:
    """A spec-valid EXIF APP1 segment (JEITA CP-3451 / TIFF 6.0, both
    public): ``Exif\\0\\0`` + TIFF header + IFD0 with ImageDescription
    (ASCII, out-of-line), Orientation (SHORT, inline) and XResolution
    (RATIONAL, out-of-line), entries in ascending tag order. ``byte_order``
    is ``II`` (little) or ``MM`` (big) — fixtures alternate to exercise
    both endiannesses of the reader."""
    import struct

    e = "<" if byte_order == "II" else ">"
    desc = description.encode() + b"\x00"
    tiff_hdr = byte_order.encode() + struct.pack(e + "HI", 42, 8)
    n_entries = 3
    ifd_size = 2 + n_entries * 12 + 4
    data_off = 8 + ifd_size  # from TIFF header start
    entries = b""
    # 0x010E ImageDescription, ASCII, out-of-line
    entries += struct.pack(e + "HHII", 0x010E, 2, len(desc), data_off)
    # 0x0112 Orientation, SHORT, inline (left-justified in the 4-byte slot)
    entries += struct.pack(e + "HHI", 0x0112, 3, 1) + struct.pack(e + "H", orientation) + b"\x00\x00"
    # 0x011A XResolution, RATIONAL, out-of-line after the description
    entries += struct.pack(e + "HHII", 0x011A, 5, 1, data_off + len(desc))
    ifd = struct.pack(e + "H", n_entries) + entries + struct.pack(e + "I", 0)
    data = desc + struct.pack(e + "II", x_resolution, 1)
    body = b"Exif\x00\x00" + tiff_hdr + ifd + data
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def parse_exif(payload: bytes) -> dict[str, Any] | None:
    """Extract EXIF IFD0 metadata from a JPEG payload without decoding
    pixels: walk the marker segments for APP1/``Exif``, honor the TIFF
    byte order, and read ASCII / SHORT / LONG / RATIONAL entries. Returns
    None when no EXIF segment exists. Pure byte work — runs Arrow-batched
    in :func:`exif_metadata`."""
    import struct

    if payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            return _parse_tiff_ifd0(body[6:])
        if marker == 0xDA:  # start of scan: no EXIF ahead of the entropy data
            return None
        pos += 2 + seg_len
    return None


def _parse_tiff_ifd0(t: bytes) -> dict[str, Any]:
    import struct

    order = t[:2]
    e = "<" if order == b"II" else ">"
    if struct.unpack_from(e + "H", t, 2)[0] != 42:
        raise ValueError("bad TIFF magic")
    ifd = struct.unpack_from(e + "I", t, 4)[0]
    n = struct.unpack_from(e + "H", t, ifd)[0]
    names = {0x010E: "description", 0x0112: "orientation", 0x011A: "x_resolution"}
    out: dict[str, Any] = {"byte_order": order.decode()}
    for i in range(n):
        off = ifd + 2 + i * 12
        tag, typ, cnt = struct.unpack_from(e + "HHI", t, off)
        name = names.get(tag)
        if name is None:
            continue
        if typ == 2:  # ASCII, NUL-terminated
            p = struct.unpack_from(e + "I", t, off + 8)[0] if cnt > 4 else off + 8
            out[name] = t[p : p + cnt].rstrip(b"\x00").decode()
        elif typ == 3:  # SHORT (inline when count 1)
            out[name] = struct.unpack_from(e + "H", t, off + 8)[0]
        elif typ == 4:  # LONG
            out[name] = struct.unpack_from(e + "I", t, off + 8)[0]
        elif typ == 5:  # RATIONAL
            p = struct.unpack_from(e + "I", t, off + 8)[0]
            num, den = struct.unpack_from(e + "II", t, p)
            out[name] = (num, den)
    return out


def synth_jpeg_exif_media(df: DataFrame, id_col: str) -> DataFrame:
    """The baseline-JPEG fixtures of :func:`synth_jpeg_media` with a
    spec-valid EXIF APP1 injected after SOI, under a closed-form law:
    byte order ``II``/``MM`` alternating by id, ``orientation = 1 + id %
    8``, ``x_resolution = (72 + id % 10, 1)``, description ``doc<id>`` —
    so an oracle reproduces the extracted metadata without parsing."""
    base = synth_jpeg_media(df, id_col)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = []
            for mid, b in zip(pdf["media_id"].values, pdf["payload"].values):
                mid = int(mid)
                app1 = build_exif_app1(
                    byte_order="II" if mid % 2 == 0 else "MM",
                    orientation=1 + mid % 8,
                    x_resolution=72 + mid % 10,
                    description=f"doc{mid}",
                )
                b = bytes(b)
                payloads.append(b[:2] + app1 + b[2:])
            yield pd.DataFrame({"media_id": pdf["media_id"].values, "payload": payloads})

    return base.mapInPandas(run, schema="media_id long, payload binary")


EXIF_METADATA_SCHEMA = (
    "media_id long, byte_order string, orientation int, "
    "x_resolution long, description string"
)


def exif_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """EXIF IFD0 metadata per JPEG payload via Arrow-batched
    ``mapInPandas`` — the metadata-harvest pass an image-corpus pipeline
    runs long before (and much cheaper than) pixel decode. Missing/
    malformed EXIF yields nulls, never a failed task."""
    narrow = df.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct

        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"].values, pdf["payload"].values):
                try:
                    meta = parse_exif(bytes(b)) or {}
                except (ValueError, IndexError, KeyError, struct.error):
                    meta = {}
                xres = meta.get("x_resolution")
                rows.append(
                    (
                        mid,
                        meta.get("byte_order"),
                        meta.get("orientation"),
                        xres[0] if isinstance(xres, tuple) else None,
                        meta.get("description"),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "byte_order",
                    "orientation",
                    "x_resolution",
                    "description",
                ],
            )

    return narrow.mapInPandas(run, schema=EXIF_METADATA_SCHEMA)


def sniff_container(payload: Column) -> Column:
    """Container format from the payload's magic bytes; 'unknown' otherwise."""
    expr: Column = F.lit("unknown")
    for name, magic in reversed(_MAGIC.items()):
        expr = F.when(
            F.startswith(payload, F.lit(magic)), F.lit(name)
        ).otherwise(expr)
    return expr


def media_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Byte-level metadata without decoding: size, md5 digest, container.

    Pure Column expressions — at 100 TB this is a projection over the parquet
    scan (payload column read, nothing shipped to Python)."""
    p = F.col(payload_col)
    return df.select(
        F.col(id_col),
        *[c for c in ("kind",) if c in df.columns],
        F.length(p).alias("n_bytes"),
        F.md5(p).alias("payload_md5"),
        sniff_container(p).alias("container"),
    )


# --------------------------------------------------------------------------
# decoders (the pluggable stub boundary)
# --------------------------------------------------------------------------

#: decoder contract: bytes -> dict(width, height, channels, mean_byte)
Decoder = Callable[[bytes], dict[str, Any]]


def fake_image_decoder(payload: bytes) -> dict[str, Any]:
    """Deterministic FAKE decode (no image libs in this container): width and
    height from the first two payload bytes, fixed 3 channels, mean over all
    bytes. Stable across engines/runs; replaces a real PIL/libjpeg decode."""
    n = len(payload)
    return {
        "width": 1 + payload[0] if n > 0 else 0,
        "height": 1 + payload[1] if n > 1 else 0,
        "channels": 3 if n > 0 else 0,
        "mean_byte": (sum(payload) / n) if n > 0 else 0.0,
    }


def decode_image_array(payload: bytes):
    """REAL pixel decode to an ``(h, w, channels)`` uint8 array, zero
    dependencies: 24/32-bit uncompressed BMP (BITMAPINFOHEADER, public
    spec: pixel offset at byte 10, width/height at 18/22, bpp at 28,
    compression 0), binary PPM ``P6``, PNG (8-bit depth, color types
    0/2/3/4/6, non-interlaced — the zlib-based from-scratch codec in
    :mod:`avro_diff_spark.png`), baseline AND progressive JPEG
    (SOF0/SOF2, Huffman, any sampling factors — the from-scratch codec
    in :mod:`avro_diff_spark.jpeg`), and GIF87a/89a (variable-width LZW
    — :mod:`avro_diff_spark.gif`). Raises ValueError for anything else
    — WebP-lossy needs more codec surface; route it through
    :func:`pil_image_decoder` or a custom hook. The pixel source for
    both :func:`real_image_decoder` (stats) and :func:`image_dhash`
    (perceptual hashing)."""
    import struct

    import numpy as np

    if payload[:3] == b"\xff\xd8\xff":
        from avro_diff_spark.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from avro_diff_spark.webp import decode_webp

        return decode_webp(payload)  # lossy VP8 raises -> caller fallback
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from avro_diff_spark.gif import decode_gif

        return decode_gif(payload)
    if payload[:4] == b"\x89PNG":
        from avro_diff_spark.png import decode_png

        return decode_png(payload)
    if payload[:2] == b"BM":
        offset = struct.unpack_from("<I", payload, 10)[0]
        width, height = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        compression = struct.unpack_from("<I", payload, 30)[0]
        if compression != 0 or bpp not in (24, 32):
            raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
        channels = bpp // 8
        h = abs(height)
        stride = ((width * channels + 3) // 4) * 4  # rows pad to 4 bytes
        px = np.frombuffer(payload, np.uint8, count=stride * h, offset=offset)
        return px.reshape(h, stride)[:, : width * channels].reshape(
            h, width, channels
        )
    if payload[:2] == b"P6":
        # header: P6 <ws> width <ws> height <ws> maxval <single ws> raw RGB;
        # '#' comments allowed between tokens
        pos, tokens = 2, []
        while len(tokens) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while pos < len(payload) and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        width, height, maxval = tokens
        if maxval > 255:
            raise ValueError("16-bit PPM unsupported")
        px = np.frombuffer(payload, np.uint8, count=width * height * 3, offset=pos)
        return px.reshape(height, width, 3)
    raise ValueError("not an uncompressed BMP/PPM payload")


def real_image_decoder(payload: bytes) -> dict[str, Any]:
    """REAL stats decode over :func:`decode_image_array`'s pixels — the
    format surface and the mean-byte law are unchanged (the BMP mean
    runs over the same stride-trimmed bytes, just shaped (h, w, c))."""
    arr = decode_image_array(payload)
    return {
        "width": arr.shape[1],
        "height": arr.shape[0],
        "channels": arr.shape[2],
        "mean_byte": float(arr.mean()) if arr.size else 0.0,
    }


def auto_image_decoder(payload: bytes) -> dict[str, Any]:
    """Real decode when the format allows it, deterministic fake otherwise
    — the sensible default for mixed corpora in this container."""
    import struct

    try:
        return real_image_decoder(payload)
    except (ValueError, IndexError, struct.error):
        return fake_image_decoder(payload)


def pil_image_decoder(payload: bytes) -> dict[str, Any]:
    """Real decoder slot. STUB: Pillow is not installed in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - exercised only without PIL
        raise NotImplementedError(
            "real image decode needs Pillow; install it or use "
            "fake_image_decoder (the deterministic test stub)"
        ) from e
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))  # pragma: no cover
    import numpy as np  # pragma: no cover

    arr = np.asarray(img)  # pragma: no cover
    return {  # pragma: no cover
        "width": img.width,
        "height": img.height,
        "channels": arr.shape[2] if arr.ndim == 3 else 1,
        "mean_byte": float(arr.mean()),
    }


IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, channels int, mean_byte double"
)


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    *,
    decoder: Decoder = fake_image_decoder,
) -> DataFrame:
    """Per-image features via Arrow-batched ``mapInPandas``.

    Only (id, payload) are shipped to Python — project before the map so the
    parquet scan prunes every other column. Cardinality 1:1."""
    narrow = df.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            feats = pdf["payload"].map(lambda b: decoder(bytes(b)))
            out = pd.DataFrame(list(feats))
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return narrow.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def synth_phash_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL PNG payloads in NEAR-DUPLICATE pairs — the
    perceptual-dedup fixture (round 15). Ids ``2g`` and ``2g+1`` share
    one base image; the odd variant perturbs three pixels, so the pair's
    dHash differs in a few bits (a re-encoded/touched-up copy, the case
    perceptual dedup exists for) while different groups are unrelated.

    Closed-form law (so a SQL oracle can mirror the dHash without
    decoding): for ``id``, ``g = id // 2``, ``w = 12 + g % 13``,
    ``h = 10 + g % 7``, gray pixel (R=G=B) at (x, y) is
    ``p = (g*31 + x²·(7 + g % 16) + y²·13 + x·y·5) % 251`` — the
    quadratic terms and the g-dependent coefficient keep the dHash
    population diverse (a plain gradient collapsed to ~700 distinct
    hashes at 60k images — measured — which is quadratic-blowup bait
    for any blocking dedup; this law measures 41k distinct at 60k with
    a max multiplicity of 15). The odd variant replaces ``p`` with
    ``(p + 90) % 256`` at exactly (0, 0), (0, h//2) and ((2*w)//5, 0)
    — three of :func:`image_dhash`'s sampled grid points, flipping at
    most 4 of the 32 comparison bits (inside a Hamming-2 ball for most
    groups, outside it for some — the threshold is exercised both
    ways). Same Arrow plumbing as the other synths."""
    from collections.abc import Iterator as _It

    narrow = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from avro_diff_spark.png import encode_png

        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"].values:
                mid = int(mid)
                g, var = mid // 2, mid % 2
                w, h = 12 + g % 13, 10 + g % 7
                a = 7 + g % 16
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                p = (g * 31 + x * x * a + y * y * 13 + x * y * 5) % 251
                if var:
                    for px, py in ((0, 0), (0, h // 2), ((2 * w) // 5, 0)):
                        p[py, px] = (p[py, px] + 90) % 256
                arr = np.repeat(p.astype(np.uint8)[:, :, None], 3, axis=2)
                payloads.append(encode_png(arr))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].values, "payload": payloads}
            )

    return narrow.mapInPandas(run, schema="media_id long, payload binary")


def dhash32_of_array(arr) -> int:
    """The 32-bit difference hash of one decoded ``(h, w, c)`` uint8
    array — the per-image law :func:`image_dhash` applies per row and
    the fixture oracle replays in SQL.

    dHash (public: Krawetz, "Kind of Like That", 2013) downsamples to a
    tiny gray grid and sets one bit per horizontally-adjacent pair that
    brightens left-to-right — robust to re-encoding, scaling and mild
    retouching, which is exactly what byte-exact dedup misses. Two
    deliberate, documented choices keep it bit-exact across engines
    (the simhash32 posture — dedup.py's integer-range note):

    - **32 bits** (5 sample columns × 8 rows → 8·4 comparisons), not
      the classic 64: block-banded candidate keys stay in comfortable
      int64 oracle range and `simhash_blocks` applies unchanged.
    - **Fixed-grid point sampling**, not interpolation: sample
      ``x_i = (i·w)//5``, ``y_j = (j·h)//8`` — pure integer selection
      any engine reproduces exactly; an area-average resize would put
      an IEEE reduction in front of every comparison.

    Gray is integer BT.601 milli-luma ``299·R + 587·G + 114·B`` (no
    division — only comparisons matter); 1/2-channel images use
    channel 0 ×1000; alpha is ignored. Bit ``j·4 + i`` is set iff
    ``gray(x_{i+1}, y_j) > gray(x_i, y_j)``."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    c = arr.shape[2] if arr.ndim == 3 else 1
    px = arr.reshape(h, w, c).astype(np.int64)
    if c >= 3:
        lum = 299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
    else:
        lum = 1000 * px[:, :, 0]
    xs = [(i * w) // 5 for i in range(5)]
    ys = [(j * h) // 8 for j in range(8)]
    g = lum[np.ix_(ys, xs)]
    bits = g[:, 1:] > g[:, :-1]  # (8 rows, 4 comparisons)
    out = 0
    for j in range(8):
        for i in range(4):
            if bits[j, i]:
                out |= 1 << (j * 4 + i)
    return out


def image_dhash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    *,
    decoder=decode_image_array,
) -> DataFrame:
    """``(media_id, dhash)`` — the 32-bit perceptual difference hash
    (:func:`dhash32_of_array`) of each image payload, decoded by the
    REAL from-scratch codecs (:func:`decode_image_array`) inside one
    Arrow-batched ``mapInPandas`` pass. Map-only — the corpus never
    shuffles here; Hamming-band blocking downstream
    (``dedup.phash_near_dups``) is where candidates meet."""
    narrow = df.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            hashes = pdf["payload"].map(
                lambda b: dhash32_of_array(decoder(bytes(b)))
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "dhash": hashes.astype("int64").values,
                }
            )

    return narrow.mapInPandas(run, schema="media_id long, dhash long")


AUDIO_FEATURES_SCHEMA = "media_id long, n_samples long, duration_s double, mean_amplitude double"

#: audio decoder contract: bytes -> (samples float64 ndarray, sample_rate)
AudioDecoder = Callable[[bytes], tuple["np.ndarray", int]]


def wav_pcm_decoder(payload: bytes):
    """REAL decode for RIFF/WAVE PCM (the uncompressed .wav layout, public
    spec): walks the chunk list for ``fmt `` (audio format 1 = PCM,
    8/16-bit) and ``data``, returns (mono-mixed float64 samples, rate).
    Raises ValueError for compressed/float formats."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    if bits == 16:
        arr = np.frombuffer(data, np.int16, count=len(data) // 2).astype(np.float64)
    else:  # 8-bit WAV is unsigned, centered at 128
        arr = np.frombuffer(data, np.uint8).astype(np.float64) - 128.0
    if channels > 1:
        arr = arr[: (arr.size // channels) * channels].reshape(-1, channels).mean(axis=1)
    return arr, rate


def flac_decoder(payload: bytes):
    """REAL decode for FLAC (RFC 9639) via the from-scratch codec in
    :mod:`avro_diff_spark.flac` — CONSTANT/VERBATIM/FIXED/LPC subframes,
    Rice residuals, stereo decorrelation, CRC-verified frames. Returns
    (mono-mixed float64 samples, rate) like :func:`wav_pcm_decoder`."""
    import numpy as np

    from avro_diff_spark.flac import decode_flac

    samples, rate, _bps = decode_flac(payload)
    arr = samples.astype(np.float64)
    return (arr.mean(axis=1) if arr.shape[1] > 1 else arr[:, 0]), rate


def fake_audio_decoder(sample_rate: int = 16_000) -> AudioDecoder:
    """Deterministic FAKE: payload bytes as signed 8-bit samples at a fixed
    rate (no audio libs needed; stable across engines/runs)."""

    def decode(payload: bytes):
        import numpy as np

        return np.frombuffer(payload, dtype=np.int8).astype(np.float64), sample_rate

    return decode


def auto_audio_decoder(sample_rate: int = 16_000) -> AudioDecoder:
    """Real PCM WAV / FLAC decode when the payload is one (dispatched on
    the container magic), int8 fake otherwise."""

    def decode(payload: bytes):
        import struct

        try:
            if payload[:4] == b"fLaC":
                return flac_decoder(payload)
            return wav_pcm_decoder(payload)
        except (ValueError, IndexError, struct.error):
            return fake_audio_decoder(sample_rate)(payload)

    return decode


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    *,
    sample_rate: int = 16_000,
    decoder: AudioDecoder | None = None,
) -> DataFrame:
    """Per-payload audio features via Arrow-batched ``mapInPandas``.

    Default decoder is the deterministic int8 fake (oracle-stable); pass
    ``decoder=auto_audio_decoder()`` to decode real PCM WAV payloads.
    Batch-shaped like a soxr/librosa pipeline: numpy over Arrow batches,
    zero row-at-a-time Python."""
    dec = decoder or fake_audio_decoder(sample_rate)
    narrow = df.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"].values, pdf["payload"].values):
                arr, rate = dec(bytes(b))
                rows.append(
                    (
                        mid,
                        arr.size,
                        arr.size / rate,
                        float(np.abs(arr).mean()) if arr.size else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "duration_s", "mean_amplitude"]
            )

    return narrow.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


AUDIO_ANALYSIS_SCHEMA = (
    "media_id long, n_samples long, peak_amplitude double, "
    "n_zero_crossings long, rms double"
)


def audio_analysis(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    *,
    sample_rate: int = 16_000,
    decoder: AudioDecoder | None = None,
) -> DataFrame:
    """Signal-level audio statistics beyond :func:`audio_features`: peak
    amplitude, zero-crossing count (a crossing = adjacent samples with
    strictly opposite signs), and RMS energy — the cheap VAD/clipping/
    silence screens of an audio-corpus QA pass. Every stat is chosen to
    be integer-exact up to ONE final float op (|max|, crossing count,
    sqrt of an exact integer ratio), so a SQL oracle reproduces them
    bit-for-bit from a closed-form sample law. Same Arrow-batched
    ``mapInPandas`` shape as :func:`audio_features`."""
    dec = decoder or fake_audio_decoder(sample_rate)
    narrow = df.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"].values, pdf["payload"].values):
                arr, _rate = dec(bytes(b))
                if arr.size:
                    peak = float(np.abs(arr).max())
                    zc = int(np.count_nonzero(arr[1:] * arr[:-1] < 0))
                    rms = float(np.sqrt((arr * arr).sum() / arr.size))
                else:
                    peak, zc, rms = 0.0, 0, 0.0
                rows.append((mid, arr.size, peak, zc, rms))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_samples", "peak_amplitude", "n_zero_crossings", "rms"],
            )

    return narrow.mapInPandas(run, schema=AUDIO_ANALYSIS_SCHEMA)


FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_bytes binary, frame_len int"


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    *,
    frame_bytes: int = 64,
    max_frames: int = 8,
) -> DataFrame:
    """Sample up to ``max_frames`` fixed-stride chunks per payload — the
    video-frame-sampling shape (1:N cardinality change through mapInPandas).

    FAKE frame extraction (chunks, not ffmpeg keyframes) with real plumbing:
    the output is one row per frame, stride chosen so frames cover the whole
    payload evenly."""
    narrow = df.select(F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload"))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"].values, pdf["payload"].values):
                data = bytes(b)
                n_frames = min(max_frames, max(1, len(data) // frame_bytes))
                stride = max(1, len(data) // n_frames)
                for i in range(n_frames):
                    chunk = data[i * stride : i * stride + frame_bytes]
                    rows.append((mid, i, chunk, len(chunk)))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_bytes", "frame_len"]
            )

    return narrow.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def synth_mp4_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL ISO-BMFF (MP4) container per row with a
    closed-form metadata law (avro_diff_spark.mp4 — ISO/IEC 14496-12):
    for ``id``, movie timescale 1000, duration ``1000 + (id % 977)·40``,
    ``1 + id % 3`` tracks (handlers vide, then soun, then text), the
    video track sized ``16·(1 + id % 8) × 16·(1 + id % 5)``, and an mdat
    of ``32 + id % 64`` bytes ``(id·17 + i) % 256``. The SQL oracle
    reproduces every extracted field from the law without touching
    bytes; the parser↔encoder round trip is pinned in
    tests/test_mp4.py."""
    from collections.abc import Iterator as _It

    narrow = df.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from avro_diff_spark.mp4 import encode_mp4_skeleton

        handlers = [b"vide", b"soun", b"text"]
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"].values:
                mid = int(mid)
                tracks = []
                for j in range(1 + mid % 3):
                    tr: dict = {"handler": handlers[j]}
                    if j == 0:
                        tr["width"] = 16 * (1 + mid % 8)
                        tr["height"] = 16 * (1 + mid % 5)
                    tracks.append(tr)
                n = 32 + mid % 64
                mdat = bytes((mid * 17 + i) % 256 for i in range(n))
                payloads.append(
                    encode_mp4_skeleton(
                        timescale=1000,
                        duration=1000 + (mid % 977) * 40,
                        tracks=tracks,
                        mdat=mdat,
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].values, "payload": payloads}
            )

    return narrow.mapInPandas(run, schema="media_id long, payload binary")


def mp4_metadata(media: DataFrame) -> DataFrame:
    """Container metadata for MP4 payloads — the video slot of the
    metadata tier (brand, movie timescale/duration, track count and
    handler list, visual dimensions, sample-data byte count), parsed by
    the from-scratch ISO-BMFF box walker on the EXECUTOR (Arrow-batched
    ``mapInPandas`` over the binary column; non-MP4 payloads yield
    nulls). No codec decode — sample bytes stay opaque, the honest
    boundary of a training pipeline's media pass."""
    from collections.abc import Iterator as _It

    def run(batches: _It["pd.DataFrame"]) -> _It["pd.DataFrame"]:
        import pandas as pd

        from avro_diff_spark.mp4 import parse_mp4

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                meta = parse_mp4(bytes(payload)) if payload is not None else None
                if meta is None:
                    rows.append((int(mid), None, None, None, None, None, None, None, None))
                else:
                    rows.append(
                        (
                            int(mid),
                            meta["brand"],
                            meta["timescale"],
                            meta["duration"],
                            meta["n_tracks"],
                            ",".join(meta["handlers"]),
                            meta["width"],
                            meta["height"],
                            meta["mdat_bytes"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "brand", "timescale", "duration", "n_tracks",
                    "handlers", "width", "height", "mdat_bytes",
                ],
            )

    return media.mapInPandas(
        run,
        schema=(
            "media_id long, brand string, timescale long, duration long, "
            "n_tracks long, handlers string, width long, height long, "
            "mdat_bytes long"
        ),
    )
