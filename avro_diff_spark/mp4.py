"""Minimal ISO-BMFF (MP4) container codec — from scratch against the
PUBLIC spec (ISO/IEC 14496-12, the ISO base media file format; boxes =
[size u32][type 4cc][payload], size 1 ⇒ 64-bit largesize follows, size 0
⇒ box extends to EOF; moov/trak/mdia/minf/stbl are pure containers).

Scope is container METADATA, the video analogue of the engine's EXIF
path: brand, movie timescale/duration, per-track handler types, visual
track dimensions (tkhd 16.16 fixed point), and mdat payload length. No
codec payload decoding — sample data stays opaque bytes, exactly how a
100 TB training pipeline treats video before the (external) decode step.

No reference parity: yuana97/Avro_Diff has no media surface
(SURVEY.md §2); beyond-reference tier.
"""

from __future__ import annotations

import struct

__all__ = ["encode_mp4_skeleton", "parse_mp4"]

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, payload: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(typ, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


def encode_mp4_skeleton(
    *,
    brand: bytes = b"isom",
    timescale: int = 1000,
    duration: int = 0,
    tracks: list[dict] | None = None,
    mdat: bytes = b"",
) -> bytes:
    """A structurally valid MP4: ftyp + moov(mvhd + one trak per entry)
    + mdat. Each track dict: ``handler`` (b'vide'/b'soun'/...), optional
    ``width``/``height`` (ints, stored 16.16). Everything the parser
    reads back is written here — the round-trip is the codec pin."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mp41")
    mvhd = _full(
        b"mvhd",
        struct.pack(">II", 0, 0)            # creation/modification time
        + struct.pack(">II", timescale, duration)
        + struct.pack(">i", 0x00010000)      # rate 1.0
        + struct.pack(">h", 0x0100)          # volume 1.0
        + b"\x00" * 10                       # reserved
        + _unit_matrix()
        + b"\x00" * 24                       # pre_defined
        + struct.pack(">I", len(tracks or []) + 1),
    )
    boxes = [mvhd]
    for i, tr in enumerate(tracks or []):
        w, h = int(tr.get("width", 0)), int(tr.get("height", 0))
        tkhd = _full(
            b"tkhd",
            struct.pack(">II", 0, 0)
            + struct.pack(">I", i + 1)       # track id
            + b"\x00" * 4
            + struct.pack(">I", duration)
            + b"\x00" * 8
            + struct.pack(">hhh", 0, 0, 0x0100 if tr["handler"] == b"soun" else 0)
            + b"\x00" * 2
            + _unit_matrix()
            + struct.pack(">II", w << 16, h << 16),
            flags=7,
        )
        hdlr = _full(
            b"hdlr",
            struct.pack(">I", 0) + tr["handler"] + b"\x00" * 12 + b"t\x00",
        )
        mdhd = _full(
            b"mdhd",
            struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, duration)
            + struct.pack(">HH", 0x55C4, 0),  # language 'und', pre_defined
        )
        mdia = _box(b"mdia", mdhd + hdlr + _box(b"minf", _box(b"stbl", b"")))
        boxes.append(_box(b"trak", tkhd + mdia))
    moov = _box(b"moov", b"".join(boxes))
    return ftyp + moov + _box(b"mdat", mdat)


def _unit_matrix() -> bytes:
    return struct.pack(
        ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
    )


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) walking [start, end) —
    the spec's box grammar incl. largesize and to-EOF boxes; truncated
    or corrupt sizes stop the walk (metadata extraction must never
    throw on bad bytes)."""
    off = start
    while off + 8 <= end:
        size = struct.unpack_from(">I", buf, off)[0]
        typ = buf[off + 4 : off + 8]
        body = off + 8
        if size == 1:
            if off + 16 > end:
                return
            size = struct.unpack_from(">Q", buf, off + 8)[0]
            body = off + 16
        elif size == 0:
            size = end - off
        if size < body - off or off + size > end:
            return
        yield typ, body, off + size
        off += size


def parse_mp4(payload: bytes) -> dict | None:
    """Container metadata, or None when the bytes are not ISO-BMFF
    (first top-level box must be ftyp). Unknown boxes are skipped by
    size — the spec's forward-compat rule — so files with extra boxes
    still parse."""
    out = {
        "brand": None,
        "timescale": None,
        "duration": None,
        "n_tracks": 0,
        "handlers": [],
        "width": None,
        "height": None,
        "mdat_bytes": 0,
    }
    top = list(_iter_boxes(payload, 0, len(payload)))
    if not top or top[0][0] != b"ftyp":
        return None
    for typ, s, e in top:
        if typ == b"ftyp" and e - s >= 4:
            out["brand"] = payload[s : s + 4].decode("latin-1")
        elif typ == b"mdat":
            out["mdat_bytes"] += e - s
        elif typ == b"moov":
            _parse_moov(payload, s, e, out)
    return out


def _parse_moov(buf: bytes, start: int, end: int, out: dict) -> None:
    for typ, s, e in _iter_boxes(buf, start, end):
        if typ == b"mvhd" and e - s >= 20:
            version = buf[s]
            if version == 1:
                out["timescale"] = struct.unpack_from(">I", buf, s + 20)[0]
                out["duration"] = struct.unpack_from(">Q", buf, s + 24)[0]
            else:
                out["timescale"] = struct.unpack_from(">I", buf, s + 12)[0]
                out["duration"] = struct.unpack_from(">I", buf, s + 16)[0]
        elif typ == b"trak":
            out["n_tracks"] += 1
            _parse_trak(buf, s, e, out)


def _parse_trak(buf: bytes, start: int, end: int, out: dict) -> None:
    handler = None
    dims = None
    for typ, s, e in _iter_boxes(buf, start, end):
        if typ == b"tkhd" and e - s >= 84:
            version = buf[s]
            # width/height are the LAST 8 bytes of tkhd in both versions
            w_fx, h_fx = struct.unpack_from(">II", buf, e - 8)
            if w_fx or h_fx:
                dims = (w_fx >> 16, h_fx >> 16)
        elif typ == b"mdia":
            for t2, s2, e2 in _iter_boxes(buf, s, e):
                if t2 == b"hdlr" and e2 - s2 >= 12:
                    handler = buf[s2 + 8 : s2 + 12].decode("latin-1")
    if handler:
        out["handlers"].append(handler)
    if dims and handler == "vide" and out["width"] is None:
        out["width"], out["height"] = dims
