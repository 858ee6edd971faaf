"""Avro schema resolution in the pure-Python OCF path (round-5 hardening).

The reference reads with avro-js, whose createResolver machinery applies
the Avro spec's full Schema Resolution rules whenever a readerSchema is
given; spark-avro's ``avroSchema`` option does the same on the connector
path. Until this round the fallback path treated a caller schema as a mere
field-name projection — these tests pin the real contract: promotions,
field match by name/alias, writer-only skip, reader defaults, enum symbol
mapping, and union re-resolution, codec-level and Spark-level.
"""

from __future__ import annotations

import os
import tempfile
from datetime import date
from decimal import Decimal

import pytest
from hypothesis import given, settings, strategies as st

from avro_diff_spark.sources import ocf


def _rec(name, *fields):
    return {"type": "record", "name": name, "fields": list(fields)}


def _f(name, type_, **kw):
    return {"name": name, "type": type_, **kw}


def _roundtrip(rows, writer, reader):
    fd, p = tempfile.mkstemp(suffix=".avro")
    os.close(fd)
    try:
        ocf.write_ocf(p, writer, rows, codec="null")
        with open(p, "rb") as f:
            return list(ocf.iter_ocf(f.read(), reader_schema=reader))
    finally:
        os.unlink(p)


# ---------------------------------------------------------------- promotions

def test_numeric_promotions():
    writer = _rec("r", _f("a", "int"), _f("b", "int"), _f("c", "long"), _f("d", "float"))
    reader = _rec("r", _f("a", "long"), _f("b", "double"), _f("c", "double"), _f("d", "double"))
    out = _roundtrip([{"a": -7, "b": 41, "c": 1 << 40, "d": 2.5}], writer, reader)
    assert out == [{"a": -7, "b": 41.0, "c": float(1 << 40), "d": 2.5}]
    assert isinstance(out[0]["a"], int) and isinstance(out[0]["b"], float)


def test_string_bytes_promotions():
    writer = _rec("r", _f("s", "string"), _f("b", "bytes"))
    reader = _rec("r", _f("s", "bytes"), _f("b", "string"))
    out = _roundtrip([{"s": "héllo", "b": "wörld".encode()}], writer, reader)
    assert out == [{"s": "héllo".encode(), "b": "wörld"}]


def test_incompatible_types_raise():
    with pytest.raises(ValueError):
        ocf.make_resolver(_rec("r", _f("a", "double")), _rec("r", _f("a", "int")))
    with pytest.raises(ValueError):
        ocf.make_resolver(_rec("r", _f("a", "string")), _rec("r", _f("a", "long")))


# ------------------------------------------------- field match / skip / defaults

def test_field_reorder_skip_and_default():
    writer = _rec(
        "r",
        _f("a", "int"),
        _f("gone_map", {"type": "map", "values": "string"}),  # reader drops: skipped
        _f("b", "string"),
        _f("gone_arr", {"type": "array", "items": "long"}),
    )
    reader = _rec(
        "r",
        _f("b", "string"),
        _f("a", "long"),
        _f("added", "string", default="filler"),
        _f("added_n", ["null", "long"], default=None),
    )
    out = _roundtrip(
        [{"a": 3, "gone_map": {"k": "v"}, "b": "x", "gone_arr": [1, 2, 3]}], writer, reader
    )
    assert out == [{"a": 3, "b": "x", "added": "filler", "added_n": None}]


def test_reader_field_without_default_raises():
    with pytest.raises(ValueError, match="declares no default"):
        ocf.make_resolver(_rec("r", _f("a", "int")), _rec("r", _f("a", "int"), _f("z", "int")))


def test_alias_rename():
    writer = _rec("r", _f("old_name", "int"))
    reader = _rec("r", _f("new_name", "int", aliases=["old_name"]))
    assert _roundtrip([{"old_name": 9}], writer, reader) == [{"new_name": 9}]


def test_container_defaults_are_fresh_per_record():
    writer = _rec("r", _f("a", "int"))
    reader = _rec(
        "r",
        _f("a", "int"),
        _f("tags", {"type": "array", "items": "string"}, default=["x"]),
    )
    out = _roundtrip([{"a": 1}, {"a": 2}], writer, reader)
    out[0]["tags"].append("mutated")
    assert out[1]["tags"] == ["x"]


def test_default_conversions():
    writer = _rec("r", _f("a", "int"))
    reader = _rec(
        "r",
        _f("a", "int"),
        _f("raw", "bytes", default="\xff\x01"),  # latin-1 code points
        _f("d", {"type": "int", "logicalType": "date"}, default=19000),
        _f(
            "dec",
            {"type": "bytes", "logicalType": "decimal", "precision": 9, "scale": 2},
            default="\x01\x00",  # unscaled 256 → 2.56
        ),
        _f("nested", _rec("n", _f("x", "long"), _f("y", "string", default="yy")), default={"x": 5}),
    )
    (row,) = _roundtrip([{"a": 0}], writer, reader)
    assert row["raw"] == b"\xff\x01"
    assert row["d"] == date(1970, 1, 1).fromordinal(date(1970, 1, 1).toordinal() + 19000)
    assert row["dec"] == Decimal("2.56")
    assert row["nested"] == {"x": 5, "y": "yy"}


# ------------------------------------------------------------------ enums

def test_enum_symbol_mapping_and_default():
    writer = _rec("r", _f("e", {"type": "enum", "name": "E", "symbols": ["A", "B", "C"]}))
    reader_ok = _rec(
        "r", _f("e", {"type": "enum", "name": "E", "symbols": ["C", "A", "UNK"], "default": "UNK"})
    )
    rows = [{"e": "A"}, {"e": "B"}, {"e": "C"}]
    assert [r["e"] for r in _roundtrip(rows, writer, reader_ok)] == ["A", "UNK", "C"]

    reader_nodef = _rec("r", _f("e", {"type": "enum", "name": "E", "symbols": ["A"]}))
    with pytest.raises(ValueError, match="no default"):
        _roundtrip([{"e": "B"}], writer, reader_nodef)


# ------------------------------------------------------------------ unions

def test_union_both_sides_with_promotion():
    writer = _rec("r", _f("v", ["null", "int"]))
    reader = _rec("r", _f("v", ["null", {"type": "long", "logicalType": "timestamp-micros"}]))
    out = _roundtrip([{"v": 86_400_000_000}, {"v": None}], writer, reader)
    assert out[1]["v"] is None
    assert out[0]["v"].date() == date(1970, 1, 2)


def test_writer_nonunion_reader_union_and_reverse():
    writer = _rec("r", _f("v", "int"))
    reader = _rec("r", _f("v", ["null", "double"]))
    assert _roundtrip([{"v": 4}], writer, reader) == [{"v": 4.0}]

    writer2 = _rec("r", _f("v", ["null", "int"]))
    reader2 = _rec("r", _f("v", "long"))
    assert _roundtrip([{"v": 4}], writer2, reader2) == [{"v": 4}]
    with pytest.raises(ValueError):  # null branch taken, reader not nullable
        _roundtrip([{"v": None}], writer2, reader2)


def test_nested_record_resolution():
    writer = _rec(
        "r",
        _f("inner", _rec("i", _f("a", "int"), _f("drop", "string"))),
        _f("arr", {"type": "array", "items": _rec("e", _f("q", "int"))}),
    )
    reader = _rec(
        "r",
        _f("inner", _rec("i", _f("a", "double"), _f("extra", "long", default=7))),
        _f("arr", {"type": "array", "items": _rec("e", _f("q", "long"))}),
    )
    (row,) = _roundtrip(
        [{"inner": {"a": 2, "drop": "zz"}, "arr": [{"q": 1}, {"q": 2}]}], writer, reader
    )
    assert row == {"inner": {"a": 2.0, "extra": 7}, "arr": [{"q": 1}, {"q": 2}]}


# ------------------------------------------------ skipper byte-exactness fuzz

_SKIP_SCHEMA = _rec(
    "s",
    _f("i", "int"),
    _f("s", "string"),
    _f("u", ["null", "double"]),
    _f("m", {"type": "map", "values": {"type": "array", "items": "long"}}),
    _f("fx", {"type": "fixed", "name": "f4", "size": 4}),
)


@settings(max_examples=50, deadline=None)
@given(
    st.integers(-(2**31), 2**31 - 1),
    st.text(max_size=20),
    st.none() | st.floats(allow_nan=False),
    st.dictionaries(st.text(max_size=5), st.lists(st.integers(-(2**40), 2**40), max_size=4), max_size=3),
    st.binary(min_size=4, max_size=4),
    st.integers(-(2**20), 2**20),
)
def test_skipper_lands_on_next_value(i, s, u, m, fx, tail):
    """Skipping a value must advance pos EXACTLY past it: encode a record
    then a sentinel long, skip the record, read the sentinel."""
    out = bytearray()
    ocf._encode({"i": i, "s": s, "u": u, "m": m, "fx": fx}, _SKIP_SCHEMA, out)
    ocf._encode(tail, "long", out)
    skip = ocf.make_skipper(_SKIP_SCHEMA)
    pos = skip(bytes(out), 0)
    got, end = ocf._decode(bytes(out), pos, "long")
    assert got == tail and end == len(out)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-(2**31), 2**31 - 1), st.text(max_size=12), st.booleans()),
        min_size=1,
        max_size=30,
    )
)
def test_resolution_fuzz_roundtrip(rows):
    """Arbitrary rows survive a reorder+promote+default+skip resolution."""
    writer = _rec("r", _f("n", "int"), _f("t", "string"), _f("b", "boolean"))
    reader = _rec(
        "r",
        _f("b", "boolean"),
        _f("n", "double"),
        _f("v", "long", default=11),
    )
    data = [{"n": n, "t": t, "b": b} for n, t, b in rows]
    out = _roundtrip(data, writer, reader)
    assert out == [{"n": float(r["n"]), "b": r["b"], "v": 11} for r in data]


# ------------------------------------------------------------ Spark-level

def test_read_avro_resolves_reader_schema(spark, tmp_path):
    """End to end: OCF written under writer schema v1, read under an evolved
    reader schema — promotion + alias + default + drop, distributed."""
    import json

    from avro_diff_spark.sources.avro import read_avro

    writer = _rec(
        "topLevelRecord",
        _f("id", "long"),
        _f("qty", "int"),
        _f("old_status", "string"),
        _f("legacy", "string"),
    )
    rows = [{"id": i, "qty": i % 10, "old_status": "S%d" % (i % 3), "legacy": "x"} for i in range(500)]
    p = str(tmp_path / "v1.avro")
    ocf.write_ocf(p, writer, rows, codec="deflate")

    reader = _rec(
        "topLevelRecord",
        _f("id", "long"),
        _f("qty", "long"),
        _f("status", "string", aliases=["old_status"]),
        _f("prio", "string", default="NONE"),
    )
    df = read_avro(spark, p, avro_schema=json.dumps(reader))
    assert [f.name for f in df.schema.fields] == ["id", "qty", "status", "prio"]
    assert df.schema["qty"].dataType.simpleString() == "bigint"
    got = {r["id"]: r for r in df.collect()}
    assert len(got) == 500
    assert got[7]["qty"] == 7 and got[7]["status"] == "S1" and got[7]["prio"] == "NONE"
