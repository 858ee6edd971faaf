"""Avro logical types in the pure-Python OCF path (round-5 hardening).

The reference never declares logical types (its fixtures store timestamps
as raw longs / ISO strings, SURVEY.md §1.2), but real-world Avro corpora
hit decimal/timestamp/date immediately, and spark-avro surfaces them as
DecimalType/TimestampType/DateType — so the fallback path must produce the
SAME Spark schema and values spark-avro would, or the two physical paths
of read_avro disagree on the same file. Covers: schema mapping both ways,
codec-level value round-trip, Spark-level write_avro → read_avro
round-trip, and hypothesis fuzz over the logical value ranges.
"""

from __future__ import annotations

from datetime import date, datetime, timedelta, timezone
from decimal import Decimal

import pytest
from hypothesis import given, settings, strategies as st

from avro_diff_spark.sources import ocf

LOGICAL_SCHEMA = {
    "type": "record",
    "name": "lt",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "ts_us", "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}]},
        {"name": "ts_ms", "type": {"type": "long", "logicalType": "timestamp-millis"}},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {
            "name": "dec_b",
            "type": {"type": "bytes", "logicalType": "decimal", "precision": 14, "scale": 2},
        },
        {
            "name": "dec_f",
            "type": {
                "type": "fixed",
                "name": "fx8",
                "size": 8,
                "logicalType": "decimal",
                "precision": 16,
                "scale": 4,
            },
        },
        {"name": "uid", "type": {"type": "string", "logicalType": "uuid"}},
        {"name": "lts", "type": {"type": "long", "logicalType": "local-timestamp-micros"}},
        {"name": "t_us", "type": {"type": "long", "logicalType": "time-micros"}},
    ],
}


def test_schema_mapping_matches_spark_avro():
    """avro_to_spark_schema gives the exact types the spark-avro connector
    documents for each logical type (time-* stay raw, like spark-avro)."""
    st_ = ocf.avro_to_spark_schema(LOGICAL_SCHEMA)
    got = {f.name: f.dataType.simpleString() for f in st_.fields}
    assert got == {
        "id": "bigint",
        "ts_us": "timestamp",
        "ts_ms": "timestamp",
        "d": "date",
        "dec_b": "decimal(14,2)",
        "dec_f": "decimal(16,4)",
        "uid": "string",
        "lts": "timestamp_ntz",
        "t_us": "bigint",
    }


def test_spark_to_avro_emits_logical_types():
    from pyspark.sql import types as T

    struct = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("nts", T.TimestampNTZType(), False),
            T.StructField("d", T.DateType(), True),
            T.StructField("dec", T.DecimalType(12, 2), True),
        ]
    )
    avro = ocf.spark_to_avro_schema(struct)
    by_name = {f["name"]: f["type"] for f in avro["fields"]}
    assert by_name["ts"][1] == {"type": "long", "logicalType": "timestamp-micros"}
    assert by_name["nts"] == {"type": "long", "logicalType": "local-timestamp-micros"}
    assert by_name["d"][1] == {"type": "int", "logicalType": "date"}
    assert by_name["dec"][1] == {
        "type": "bytes",
        "logicalType": "decimal",
        "precision": 12,
        "scale": 2,
    }


def _roundtrip(rows):
    import io
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".avro") as f:
        ocf.write_ocf(f.name, LOGICAL_SCHEMA, rows, codec="deflate")
        return list(ocf.iter_ocf(open(f.name, "rb").read()))


def test_codec_roundtrip_values():
    rows = [
        {
            "id": 1,
            "ts_us": datetime(2020, 5, 17, 12, 34, 56, 789012, tzinfo=timezone.utc),
            "ts_ms": datetime(1969, 12, 31, 23, 59, 59, 123000, tzinfo=timezone.utc),
            "d": date(1992, 2, 29),
            "dec_b": Decimal("-123456789012.34"),
            "dec_f": Decimal("-0.0001"),
            "uid": "3f2b0e9c-aaaa-bbbb-cccc-000000000000",
            "lts": datetime(2021, 1, 2, 3, 4, 5, 6),
            "t_us": 86_399_999_999,
        },
        {
            "id": 2,
            "ts_us": None,
            "ts_ms": datetime(1970, 1, 1, tzinfo=timezone.utc),
            "d": date(1969, 12, 31),
            "dec_b": Decimal("0.00"),
            "dec_f": Decimal("999999999999.9999"),
            "uid": "",
            "lts": datetime(1955, 6, 7, 0, 0, 0),
            "t_us": 0,
        },
    ]
    back = _roundtrip(rows)
    assert back == rows


@settings(max_examples=60, deadline=None)
@given(
    micros=st.integers(min_value=-(2**55), max_value=2**55),
    days=st.integers(min_value=-100_000, max_value=100_000),
    unscaled=st.integers(min_value=-(10**15), max_value=10**15),
)
def test_logical_roundtrip_fuzz(micros, days, unscaled):
    """Any in-range instant/date/unscaled-decimal survives encode→decode
    exactly (micros bounded to datetime's representable range)."""
    rows = [
        {
            "id": 0,
            "ts_us": datetime(1970, 1, 1, tzinfo=timezone.utc) + timedelta(microseconds=micros),
            "ts_ms": datetime(1970, 1, 1, tzinfo=timezone.utc)
            + timedelta(microseconds=(micros // 1000) * 1000),
            "d": date(1970, 1, 1) + timedelta(days=days),
            "dec_b": Decimal(unscaled).scaleb(-2),
            "dec_f": Decimal(unscaled).scaleb(-4),
            "uid": "u",
            "lts": datetime(1970, 1, 1) + timedelta(microseconds=micros),
            "t_us": abs(micros),
        }
    ]
    assert _roundtrip(rows) == rows


def test_spark_write_read_roundtrip(spark, tmp_path):
    """write_avro → read_avro preserves TimestampType/DateType/DecimalType
    schema AND values through the distributed mapInPandas path — the
    spark-avro-parity contract for the fallback."""
    from pyspark.sql import functions as F

    df = spark.range(0, 500).select(
        F.col("id"),
        F.timestamp_micros(F.col("id") * 1_000_003 + 1_588_000_000_000_000).alias("ts"),
        F.date_add(F.lit("1992-01-01").cast("date"), F.col("id").cast("int")).alias("d"),
        (F.col("id") * 100 + 7).cast("decimal(12,2)").alias("dec_raw"),
    ).select(
        "id", "ts", "d", (F.col("dec_raw") / F.lit(100)).cast("decimal(12,2)").alias("dec")
    )
    from avro_diff_spark.sources.avro import read_avro, write_avro

    p = str(tmp_path / "logical.avro")
    write_avro(df, p, codec="snappy")
    back = read_avro(spark, p)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
