"""OCF interop: decode the REFERENCE'S OWN fixture files, not our output.

Round-trip tests (test_ocf_property.py) prove self-consistency; these prove
spec compliance: every decodable container file shipped with the reference
(avro/sample_avro, the two Instructure accounts, avro/submissions) decodes
with the pure-Python codec — including the snappy ones, which exercise the
from-scratch raw-Snappy decoder — and the four files with Avro-JSON dumps
match them value-for-value. Two files are byte-corrupted in the snapshot
(multibyte sequences replaced by U+FFFD, SURVEY.md §5) and are asserted to
*fail*, not skipped silently.

Row counts below come from the files themselves, cross-checked against the
shipped dumps; note avro/sample_avro/README.txt:7 claims 1000 records for
userdata4.avro but the file (and its userdata4.json dump) holds 1003.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from avro_diff_spark import key_diff
from avro_diff_spark.sources import ocf
from avro_diff_spark.sources.avro import read_avro

REF = "/root/reference/avro"

# (relative path, codec, rows) for every decodable fixture in the snapshot
FIXTURES = [
    ("sample_avro/userdata1.avro", "snappy", 1000),
    ("sample_avro/userdata2.avro", "snappy", 998),
    ("sample_avro/userdata3.avro", "snappy", 1000),
    ("sample_avro/userdata4.avro", "null", 1003),
    ("sample_avro/userdata5.avro", "snappy", 1000),
    ("fake_account_tc_guid_1/assignments.avro", "snappy", 70),
    ("fake_account_tc_guid_1/courses.avro", "snappy", 1),
    ("fake_account_tc_guid_1/sections.avro", "snappy", 11),
    ("fake_account_tc_guid_1/studentAssets.avro", "snappy", 170),
    ("fake_account_tc_guid_1/studentAssignments.avro", "snappy", 12421),
    ("fake_account_tc_guid_1/students.avro", "snappy", 180),
    ("fake_account_tc_guid_2/assetStudents.avro", "snappy", 235),
    ("fake_account_tc_guid_2/assignments.avro", "snappy", 70),
    ("fake_account_tc_guid_2/courses.avro", "snappy", 1),
    ("fake_account_tc_guid_2/sections.avro", "snappy", 11),
    ("fake_account_tc_guid_2/studentAssets.avro", "snappy", 170),
    ("fake_account_tc_guid_2/studentAssignments.avro", "snappy", 12490),
    ("submissions/studentAssignmentsOld.avro", "snappy", 12421),
]

# byte-corrupted in the snapshot — schema-extraction only (SURVEY.md §5)
CORRUPTED = [
    "fake_account_tc_guid_1/assetStudents.avro",
    "fake_account_tc_guid_2/students.avro",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixture corpus not present"
)


def _load(rel: str) -> bytes:
    with open(os.path.join(REF, rel), "rb") as f:
        return f.read()


def _unwrap(v, schema):
    """Avro-JSON decoding → plain values (unions carry branch-name wrappers,
    e.g. ``{"double": 49756.53}``; SURVEY.md §5 fixture notes)."""
    branch, nullable = ocf.nullable_branch(schema)
    if nullable:
        if v is None:
            return None
        assert isinstance(v, dict) and len(v) == 1, v
        v = next(iter(v.values()))
    t = ocf._type_name(branch)
    if t == "record":
        return {f["name"]: _unwrap(v.get(f["name"]), f["type"]) for f in branch["fields"]}
    if t == "array":
        return [_unwrap(x, branch["items"]) for x in v]
    if t == "map":
        return {k: _unwrap(x, branch["values"]) for k, x in v.items()}
    return v


@pytest.mark.parametrize("rel,codec,n_rows", FIXTURES, ids=[f[0] for f in FIXTURES])
def test_decode_reference_fixture(rel, codec, n_rows):
    data = _load(rel)
    schema, got_codec, _, _ = ocf.read_ocf_header(data)
    assert got_codec == codec
    rows = list(ocf.iter_ocf(data))
    assert len(rows) == n_rows


@pytest.mark.parametrize("rel", CORRUPTED)
def test_corrupted_fixture_raises(rel):
    with pytest.raises(Exception):
        list(ocf.iter_ocf(_load(rel)))


@pytest.mark.parametrize(
    "stem",
    [
        "sample_avro/userdata1",
        "sample_avro/userdata2",
        "sample_avro/userdata3",
        "sample_avro/userdata4",
        "fake_account_tc_guid_2/assetStudents",
    ],
)
def test_values_match_shipped_json_dump(stem):
    """Third-party-written bytes → exactly the rows the dump declares."""
    data = _load(stem + ".avro")
    schema, _, _, _ = ocf.read_ocf_header(data)
    rows = list(ocf.iter_ocf(data))
    with open(os.path.join(REF, stem + ".json")) as f:
        dump = [_unwrap(json.loads(ln), schema) for ln in f if ln.strip()]
    assert rows == dump


def test_nested_map_of_record_of_map_decodes():
    """students.weeklyMessageAggregates: map<record{..., map<record>}> —
    the deepest schema in the corpus (SURVEY.md §1.2)."""
    rows = list(ocf.iter_ocf(_load("fake_account_tc_guid_1/students.avro")))
    r = next(r for r in rows if r.get("weeklyMessageAggregates"))
    wk = r["weeklyMessageAggregates"]
    inner = next(iter(wk.values()))
    assert isinstance(inner, dict) and "dailyMessageAggregates" in inner
    daily = inner["dailyMessageAggregates"]
    assert isinstance(daily, dict)
    if daily:
        assert isinstance(next(iter(daily.values())), dict)


def test_spark_reads_nested_reference_fixture(spark):
    df = read_avro(spark, os.path.join(REF, "fake_account_tc_guid_1/students.avro"))
    field = df.schema["weeklyMessageAggregates"].dataType
    assert isinstance(field, T.MapType)
    assert isinstance(field.valueType, T.StructType)
    assert df.count() == 180
    n_with = df.filter(F.size(F.map_keys("weeklyMessageAggregates")) > 0).count()
    assert n_with > 0


def test_key_diff_on_reference_pair_mirrors_sample_output(spark):
    """The reference's own demo config (src/sampleOutput.js:4-13): userdata1
    vs userdata2 on key ``id`` with keepFields projection, snappy codec."""
    keep = ["id", "first_name", "last_name", "email"]
    old = read_avro(spark, os.path.join(REF, "sample_avro/userdata1.avro"), keep_fields=keep)
    new = read_avro(spark, os.path.join(REF, "sample_avro/userdata2.avro"), keep_fields=keep)
    assert old.columns == keep and new.columns == keep
    diff = key_diff(old, new, ["id"], include_payload=False)
    counts = {r["diff_kind"]: r["n"] for r in diff.groupBy("diff_kind").agg(F.count("*").alias("n")).collect()}
    old_n, new_n = 1000, 998
    # bucket conservation (SURVEY.md §5e) for unique-key inputs
    assert counts.get("removed", 0) + counts.get("changed", 0) + counts.get("unchanged", 0) == old_n
    assert counts.get("added", 0) + counts.get("changed", 0) + counts.get("unchanged", 0) == new_n
    # key uniqueness across buckets (the reference's jest invariant,
    # src/index.test.js:17-24)
    assert diff.select("id").distinct().count() == diff.count()


def test_self_diff_reference_nested_fixture_all_unchanged(spark):
    """diff(f, f) on a REAL reference file with the nested submission record
    → everything unchanged (the reference's nullTest/snappyTest invariant,
    src/sampleDataTestNull.js:4-6 via SURVEY.md §5b) — here on actual
    snappy-compressed third-party bytes."""
    p = os.path.join(REF, "submissions/studentAssignmentsOld.avro")
    df = read_avro(spark, p)
    diff = key_diff(df, df, ["studentId", "assignmentId"], include_payload=False)
    kinds = {r["diff_kind"] for r in diff.select("diff_kind").distinct().collect()}
    assert kinds == {"unchanged"}
    assert diff.count() == 12421
