"""Round-13 pins for the distributed sink plumbing (sources/sink.py).

The round-12 verdict flagged write_warc/write_avro's shared-filesystem
assumption; the sink now dispatches between an executor-direct route
(plain local paths) and a JVM-Hadoop-FileSystem route (any other URI —
and forceable for local paths, which is how these tests exercise it
without an HDFS cluster). Pins: route dispatch, byte-identical output
across routes, atomic commit (no .tmp residue), stale-part cleanup, and
unchanged round-trips.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from avro_diff_spark.sources.sink import resolve_via


def test_resolve_via_dispatch():
    assert resolve_via("/tmp/x", "auto") == "executor"
    # file:// is a URI — os/open would treat it as a literal path, so it
    # routes through Hadoop like any other scheme
    assert resolve_via("file:///tmp/x", "auto") == "driver-fs"
    assert resolve_via("hdfs://nn:8020/x", "auto") == "driver-fs"
    assert resolve_via("s3a://bucket/x", "auto") == "driver-fs"
    assert resolve_via("hdfs://nn/x", "executor") == "executor"
    with pytest.raises(ValueError):
        resolve_via("/tmp/x", "both")


def _parts(d: str) -> dict[str, bytes]:
    out = {}
    for n in sorted(os.listdir(d)):
        if n.startswith("part-"):
            with open(os.path.join(d, n), "rb") as f:
                out[n] = f.read()
    return out


def test_avro_routes_byte_identical(spark, tmp_path):
    from avro_diff_spark.sources.avro import read_avro, write_avro

    df = spark.range(0, 100, 1, 4).selectExpr("id", "id * 2 AS v")
    write_avro(df, str(tmp_path / "ex"), via="executor")
    write_avro(df, str(tmp_path / "dr"), via="driver-fs")
    ex, dr = _parts(str(tmp_path / "ex")), _parts(str(tmp_path / "dr"))
    assert list(ex) == list(dr) and len(ex) == 4
    assert ex == dr  # same partitions -> same container bytes on both routes
    back = read_avro(spark, str(tmp_path / "dr"))
    assert sorted(r["v"] for r in back.collect()) == [2 * i for i in range(100)]
    # atomic commit: no tmp residue on either route
    for d in ("ex", "dr"):
        assert not [n for n in os.listdir(tmp_path / d) if n.startswith(".tmp-")]


def test_warc_routes_byte_identical(spark, tmp_path):
    from avro_diff_spark.sources.warc import read_warc, write_warc

    df = spark.createDataFrame(
        [(f"https://ex.com/{i}", f"<html>{i}</html>".encode()) for i in range(20)],
        "target_uri string, body binary",
    ).repartition(3)
    write_warc(df, str(tmp_path / "ex"), via="executor")
    write_warc(df, str(tmp_path / "dr"), via="driver-fs")
    assert _parts(str(tmp_path / "ex")) == _parts(str(tmp_path / "dr"))
    back = read_warc(spark, str(tmp_path / "dr"))
    assert back.count() == 20


def test_stale_parts_cleared_on_rewrite(spark, tmp_path):
    from avro_diff_spark.sources.avro import write_avro

    df8 = spark.range(0, 80, 1, 8).selectExpr("id")
    df2 = spark.range(0, 80, 1, 2).selectExpr("id")
    for via in ("executor", "driver-fs"):
        d = tmp_path / via
        write_avro(df8, str(d), via=via)
        assert len(_parts(str(d))) == 8
        write_avro(df2, str(d), via=via)  # fewer parts: old layout must go
        assert len(_parts(str(d))) == 2


def test_file_uri_destination_works_end_to_end(spark, tmp_path):
    """A file:// URI destination round-trips through the Hadoop route
    (the executor path would mkdir a literal 'file:' directory)."""
    from avro_diff_spark.sources.avro import read_avro, write_avro

    df = spark.range(0, 20, 1, 2).selectExpr("id")
    write_avro(df, f"file://{tmp_path}/out")
    back = read_avro(spark, str(tmp_path / "out"))
    assert sorted(r.id for r in back.collect()) == list(range(20))
