"""Property-based tests for the pure-Python Avro OCF codec.

The codec (sources/ocf.py) implements the public Avro binary spec by hand;
binary codecs earn fuzzing: zigzag varint edges (negative, ±2^63-ish),
unicode strings, empty collections, deep nesting, and null-union branches
are exactly where hand-rolled encoders break. Hypothesis drives rows
through write_ocf → iter_ocf and asserts exact roundtrip for both codecs.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from avro_diff_spark.sources import ocf

SCHEMA = {
    "type": "record",
    "name": "prop",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "small", "type": "int"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "ratio", "type": ["null", "double"]},
        {"name": "flag", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        {"name": "tags", "type": {"type": "array", "items": ["null", "string"]}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {
            "name": "sub",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "sub_r",
                    "fields": [
                        {"name": "x", "type": "long"},
                        {"name": "ys", "type": {"type": "array", "items": "double"}},
                    ],
                },
            ],
        },
    ],
}

_int64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_int32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
# exact-roundtrip doubles: finite, and NaN excluded (NaN != NaN breaks ==)
_double = st.floats(allow_nan=False, allow_infinity=True, width=64)

_row = st.fixed_dictionaries(
    {
        "id": _int64,
        "small": _int32,
        "name": st.none() | st.text(max_size=40),
        "ratio": st.none() | _double,
        "flag": st.booleans(),
        "raw": st.binary(max_size=32),
        "tags": st.lists(st.none() | st.text(max_size=10), max_size=5),
        "attrs": st.dictionaries(st.text(max_size=8), _int64, max_size=4),
        "sub": st.none()
        | st.fixed_dictionaries(
            {"x": _int64, "ys": st.lists(_double, max_size=4)}
        ),
    }
)


@settings(max_examples=60, deadline=None)
@given(rows=st.lists(_row, max_size=20), codec=st.sampled_from(["null", "deflate"]))
def test_ocf_roundtrip_exact(tmp_path_factory, rows, codec):
    path = str(tmp_path_factory.mktemp("ocf") / "prop.avro")
    ocf.write_ocf(path, SCHEMA, rows, codec=codec, block_rows=7)
    with open(path, "rb") as f:
        back = list(ocf.iter_ocf(f.read()))
    assert back == rows


@settings(max_examples=120, deadline=None)
@given(n=_int64)
def test_zigzag_varint_roundtrip(n):
    buf = bytearray()
    ocf._write_long(buf, n)
    got, pos = ocf._read_long(bytes(buf), 0)
    assert got == n and pos == len(buf)
