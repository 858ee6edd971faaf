"""Avro source round-trip + CLI smoke tests.

The reference's whole surface is Avro OCF inputs (SURVEY.md §2.1); prove the
spark-avro path end-to-end where the module is on the classpath: write
testdata as Avro (snappy + deflate like the reference's codec matrix), read
via read_avro with keep/ignore projection, and diff.

This container's Spark distribution does NOT ship the external spark-avro
module (production clusters add ``--packages org.apache.spark:spark-avro``),
so the Avro-codec tests auto-skip here and the same scenarios run on parquet
— the format choice is orthogonal to every operator's semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_diff_spark import key_diff
from avro_diff_spark.snapshots import orders_new, orders_old
from avro_diff_spark.sources.avro import avro_available, read_avro, read_parquet


@pytest.fixture(scope="module")
def orders_files(spark, sf_dir, tmp_path_factory):
    """(old_path, new_path, fmt): Avro with two codecs when available, else parquet."""
    base = tmp_path_factory.mktemp("io")
    if avro_available(spark):
        old_p, new_p = str(base / "orders_old.avro"), str(base / "orders_new.avro")
        orders_old(spark, sf_dir).write.format("avro").option("compression", "snappy").save(old_p)
        orders_new(spark, sf_dir).write.format("avro").option("compression", "deflate").save(new_p)
        return old_p, new_p, "avro"
    old_p, new_p = str(base / "orders_old.pq"), str(base / "orders_new.pq")
    orders_old(spark, sf_dir).write.parquet(old_p)
    orders_new(spark, sf_dir).write.parquet(new_p)
    return old_p, new_p, "parquet"


def _read(spark, path, fmt, **kw):
    return read_avro(spark, path, **kw) if fmt == "avro" else read_parquet(spark, path, **kw)


def test_roundtrip_diff_matches_parquet_diff(spark, sf_dir, orders_files):
    """Codec / file-format choice must not change results (SURVEY.md §5c)."""
    old_p, new_p, fmt = orders_files
    old, new = _read(spark, old_p, fmt), _read(spark, new_p, fmt)
    d_file = key_diff(old, new, ["o_orderkey"], include_payload=False)
    d_parq = key_diff(
        orders_old(spark, sf_dir), orders_new(spark, sf_dir), ["o_orderkey"], include_payload=False
    )
    a = {(r["o_orderkey"], r["diff_kind"]) for r in d_file.collect()}
    b = {(r["o_orderkey"], r["diff_kind"]) for r in d_parq.collect()}
    assert a == b


def test_keep_ignore_projection(spark, orders_files):
    old_p, _, fmt = orders_files
    df = _read(
        spark,
        old_p,
        fmt,
        keep_fields=["o_orderkey", "o_totalprice", "o_custkey"],
        ignore_fields=["o_custkey"],
    )
    assert df.columns == ["o_orderkey", "o_totalprice"]


def test_timestamp_survives(spark, orders_files):
    old_p, _, fmt = orders_files
    df = _read(spark, old_p, fmt)
    assert df.filter(F.col("o_orderdate").isNull()).count() == 0


def test_read_avro_clear_error_when_module_missing(spark, tmp_path):
    if avro_available(spark):
        pytest.skip("spark-avro present; the missing-module error path is moot")
    with pytest.raises(RuntimeError, match="spark-avro"):
        read_avro(spark, str(tmp_path / "nope.avro"))


def test_cli_key_diff_prints_stats(spark, orders_files, capsys):
    old_p, new_p, fmt = orders_files
    from avro_diff_spark import cli

    rc = cli.key_diff_main([old_p, new_p, "o_orderkey", "--limit", "3", "--format", fmt])
    assert rc == 0
    out = capsys.readouterr().out
    assert "# of added rows:" in out and "# of unchanged rows:" in out


def test_cli_venn_diff_correct_labels(spark, orders_files, capsys, tmp_path):
    old_p, new_p, fmt = orders_files
    from avro_diff_spark import cli

    sink = str(tmp_path / "venn_out")
    rc = cli.venn_diff_main([old_p, new_p, "--output", sink, "--format", fmt])
    assert rc == 0
    out = capsys.readouterr().out
    assert "# of removed rows:" in out
    written = spark.read.parquet(sink)
    assert written.columns == ["venn_kind", "row_json", "n_occurrences"]
    assert written.count() > 0
