"""Avro source round-trip + CLI smoke tests.

The reference's whole surface is Avro OCF inputs (SURVEY.md §2.1). This
container's Spark distribution does NOT ship the external spark-avro module,
so these tests prove the pure-Python OCF fallback end-to-end instead: write
testdata as real container files (deflate + null codecs, mirroring the
reference's codec matrix at src/index.js:335-352), read via read_avro's
distributed binaryFile+mapInPandas path, project, and diff. When spark-avro
IS present (real clusters), read_avro routes through it with the same
semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_diff_spark import key_diff
from avro_diff_spark.functions.canonical import ts_micros
from avro_diff_spark.snapshots import orders_new, orders_old
from avro_diff_spark.sources import ocf
from avro_diff_spark.sources.avro import read_avro, read_parquet, write_avro


def _prep(df):
    # timestamps ride as raw epoch-micros longs (reference stores timestamps
    # as raw longs, SURVEY.md §1.2; the OCF converter rejects TimestampType)
    return df.withColumn("o_orderdate", ts_micros(F.col("o_orderdate")))


@pytest.fixture(scope="module")
def orders_files(spark, sf_dir, tmp_path_factory):
    """(old_path, new_path): real Avro OCFs, one per codec."""
    base = tmp_path_factory.mktemp("io")
    old_p, new_p = str(base / "orders_old.avro"), str(base / "orders_new.avro")
    write_avro(_prep(orders_old(spark, sf_dir)), old_p, codec="deflate")
    write_avro(_prep(orders_new(spark, sf_dir)), new_p, codec="null")
    return old_p, new_p


def test_roundtrip_diff_matches_parquet_diff(spark, sf_dir, orders_files):
    """Codec / file-format choice must not change results (SURVEY.md §5c)."""
    old_p, new_p = orders_files
    d_file = key_diff(read_avro(spark, old_p), read_avro(spark, new_p),
                      ["o_orderkey"], include_payload=False)
    d_parq = key_diff(
        orders_old(spark, sf_dir), orders_new(spark, sf_dir), ["o_orderkey"], include_payload=False
    )
    a = {(r["o_orderkey"], r["diff_kind"]) for r in d_file.collect()}
    b = {(r["o_orderkey"], r["diff_kind"]) for r in d_parq.collect()}
    assert a == b


def test_keep_ignore_projection(spark, orders_files):
    old_p, _ = orders_files
    df = read_avro(
        spark,
        old_p,
        keep_fields=["o_orderkey", "o_totalprice", "o_custkey"],
        ignore_fields=["o_custkey"],
    )
    assert df.columns == ["o_orderkey", "o_totalprice"]


def test_reader_schema_override_projects(spark, orders_files):
    # the reference's readerSchema trick (src/index.js:39-51): a narrowed
    # schema decodes only the declared fields
    old_p, _ = orders_files
    narrowed = {
        "type": "record",
        "name": "topLevelRecord",
        "fields": [
            {"name": "o_orderkey", "type": ["null", "long"]},
            {"name": "o_totalprice", "type": ["null", "double"]},
        ],
    }
    df = read_avro(spark, old_p, avro_schema=narrowed)
    assert df.columns == ["o_orderkey", "o_totalprice"]
    assert df.filter(F.col("o_totalprice").isNull()).count() == 0


def test_nested_types_roundtrip(spark, tmp_path):
    """record/array/map/union/enum/fixed/bytes through both codecs."""
    schema = {
        "type": "record", "name": "t", "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "flags", "type": {"type": "array", "items": "int"}},
            {"name": "attrs", "type": {"type": "map", "values": ["null", "string"]}},
            {"name": "sub", "type": ["null", {"type": "record", "name": "s", "fields": [
                {"name": "x", "type": "long"}, {"name": "y", "type": ["null", "string"]}]}]},
            {"name": "raw", "type": "bytes"},
            {"name": "kind", "type": {"type": "enum", "name": "k", "symbols": ["A", "B"]}},
        ],
    }
    rows = [
        {"id": 1, "name": "a", "flags": [1, -2], "attrs": {"k": "v", "n": None},
         "sub": {"x": 9, "y": None}, "raw": b"\x00\x01", "kind": "A"},
        {"id": -(2**53) - 7, "name": None, "flags": [], "attrs": {},
         "sub": None, "raw": b"", "kind": "B"},
    ]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"t_{codec}.avro")
        ocf.write_ocf(p, schema, rows, codec=codec)
        with open(p, "rb") as f:
            assert list(ocf.iter_ocf(f.read())) == rows
        df = read_avro(spark, p)
        got = df.orderBy(F.col("id").desc()).collect()
        assert got[0]["sub"]["x"] == 9 and got[0]["attrs"]["k"] == "v"
        # exact int64 beyond 2^53 — the reference's documented precision
        # loss (README.md:27) does not occur here
        assert got[1]["id"] == -(2**53) - 7


def test_multi_file_directory_scan(spark, sf_dir, tmp_path):
    d = str(tmp_path / "many")
    import os

    os.makedirs(d)
    src = _prep(orders_old(spark, sf_dir)).limit(30).collect()
    schema = ocf.spark_to_avro_schema(
        _prep(orders_old(spark, sf_dir)).schema
    )
    for i in range(3):
        ocf.write_ocf(
            f"{d}/part-{i}.avro", schema,
            [r.asDict() for r in src[i * 10 : (i + 1) * 10]],
        )
    df = read_avro(spark, d)
    assert df.count() == 30
    assert df.rdd.getNumPartitions() >= 1


def test_zero_record_ocf(spark, tmp_path):
    # header-only container files (a real shape: empty partitions land as
    # 0-record OCFs) must read as an empty DataFrame with the right schema
    schema = {"type": "record", "name": "t", "fields": [{"name": "id", "type": "long"}]}
    p = str(tmp_path / "empty.avro")
    ocf.write_ocf(p, schema, [], codec="deflate")
    with open(p, "rb") as f:
        assert list(ocf.iter_ocf(f.read())) == []
    df = read_avro(spark, p)
    assert df.count() == 0
    assert df.schema.simpleString() == "struct<id:bigint>"


def test_read_avro_missing_path_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_avro(spark, str(tmp_path / "nope.avro"))


def test_cli_key_diff_prints_stats(spark, orders_files, capsys):
    old_p, new_p = orders_files
    from avro_diff_spark import cli

    rc = cli.key_diff_main([old_p, new_p, "o_orderkey", "--limit", "3", "--format", "avro"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "# of added rows:" in out and "# of unchanged rows:" in out


def test_cli_avro_schema_override(spark, orders_files, tmp_path, capsys):
    # --avro-schema FILE = the reference's CONFIG.schema reader override
    import json

    old_p, new_p = orders_files
    narrowed = {
        "type": "record",
        "name": "topLevelRecord",
        "fields": [
            {"name": "o_orderkey", "type": ["null", "long"]},
            {"name": "o_totalprice", "type": ["null", "double"]},
        ],
    }
    sf = tmp_path / "reader.avsc"
    sf.write_text(json.dumps(narrowed))
    from avro_diff_spark import cli

    rc = cli.key_diff_main(
        [old_p, new_p, "o_orderkey", "--format", "avro", "--avro-schema", str(sf), "--limit", "2"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    # only the two declared fields survive: payload structs render with
    # exactly 2 elements ({key, price}), and changed rows exist because
    # o_totalprice is still compared
    assert "# of changed rows:" in out and "o_custkey" not in out
    import re

    payload = re.search(r"\{(\d+), ([\d.]+)\}", out)
    assert payload, out


def test_cli_prints_in_lex_key_order(spark, tmp_path, capsys):
    # lexCompare parity (reference src/index.js:288-307): coerced STRING
    # keys sort lexicographically, so "10" prints before "2"
    old = spark.createDataFrame([(2, "a"), (10, "b"), (1, "c")], "k int, v string")
    new = spark.createDataFrame([(2, "a"), (10, "B"), (1, "c")], "k int, v string")
    op, np_ = str(tmp_path / "o.pq"), str(tmp_path / "n.pq")
    old.write.parquet(op)
    new.write.parquet(np_)
    from avro_diff_spark import cli

    rc = cli.key_diff_main([op, np_, "k", "--format", "parquet"])
    assert rc == 0
    out = capsys.readouterr().out
    keys = [
        line.split("|")[1].strip()
        for line in out.splitlines()
        if line.startswith("|") and line.split("|")[1].strip() not in ("k", "")
    ]
    assert keys == ["1", "10", "2"]


def test_cli_venn_diff_correct_labels(spark, orders_files, capsys, tmp_path):
    old_p, new_p = orders_files
    from avro_diff_spark import cli

    sink = str(tmp_path / "venn_out")
    rc = cli.venn_diff_main([old_p, new_p, "--output", sink, "--format", "avro"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "# of removed rows:" in out
    written = spark.read.parquet(sink)
    assert written.columns == ["venn_kind", "row_json", "n_occurrences"]
    assert written.count() > 0


def test_write_avro_distributed_one_part_per_partition(spark, tmp_path):
    """Default write path: executor-side encode, one OCF per non-empty
    partition, no driver collect; read_avro reads the directory back."""
    import os

    from pyspark.sql import functions as F

    df = (
        spark.range(0, 10_000)
        .repartition(4)
        .withColumn("s", F.format_string("row-%d", "id"))
    )
    p = str(tmp_path / "out.avro")
    write_avro(df, p, codec="deflate")
    parts = sorted(os.listdir(p))
    assert len(parts) == 4
    assert all(x.startswith("part-") and x.endswith(".avro") for x in parts)
    back = read_avro(spark, p)
    assert sorted(r["id"] for r in back.collect()) == list(range(10_000))

    # rewriting with fewer partitions must not leave stale parts behind
    write_avro(df.coalesce(2), p, codec="null")
    assert len(os.listdir(p)) == 2
    assert read_avro(spark, p).count() == 10_000


def test_write_avro_single_file_streams_via_driver(spark, tmp_path):
    import os

    df = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "k long, v string")
    p = str(tmp_path / "one.avro")
    write_avro(df, p, codec="snappy", single_file=True)
    assert os.path.isfile(p)
    assert sorted(r["k"] for r in read_avro(spark, p).collect()) == list(range(100))


def test_cli_avro_output_roundtrip(spark, orders_files, tmp_path, capsys):
    """--output-format avro closes the 'Avro in, Avro out' loop: diff two
    OCFs, sink the result as OCF via the distributed encoder, re-read it,
    and get the identical diff back (structs, arrays, and the diff_kind
    discriminator all survive the container round-trip)."""
    old_p, new_p = orders_files
    from avro_diff_spark import cli

    out_p = str(tmp_path / "diff_out.avro")
    rc = cli.key_diff_main(
        [old_p, new_p, "o_orderkey", "--output", out_p, "--output-format", "avro"]
    )
    assert rc == 0
    assert f"wrote {out_p}" in capsys.readouterr().out

    back = read_avro(spark, out_p)
    want = key_diff(
        read_avro(spark, old_p), read_avro(spark, new_p), ["o_orderkey"]
    )
    assert sorted(back.columns) == sorted(want.columns)
    got_rows = {
        (r.o_orderkey, r.diff_kind, tuple(r.changed_fields or []))
        for r in back.collect()
    }
    want_rows = {
        (r.o_orderkey, r.diff_kind, tuple(r.changed_fields or []))
        for r in want.collect()
    }
    assert got_rows == want_rows and got_rows


def test_key_diff_skewed_hot_key_runbook(spark):
    """100 TB runbook pin (README 'Skewed keys'): a pathologically hot key
    (~20% of all rows on both sides — a duplicate-key contract violation
    that would blow the full-outer join up quadratically, here 4000×4000 =
    16M rows for ONE key) is caught by the key_collisions audit, bounded
    by the deterministic pre-diff dedup step, and the diff then classifies
    every key exactly once. The session keeps AQE skew-join handling on,
    so residual hot ORIGINAL keys split at runtime instead of pinning one
    straggler task."""
    from avro_diff_spark import key_collisions

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"

    n = 20_000
    hot = n // 5

    def snap(mutate: bool):
        v = (F.col("id") % 1000).alias("v")
        if mutate:
            v = (
                F.when((F.col("id") % 10 == 0) & (F.col("id") >= hot), F.col("id") % 1000 + 1)
                .otherwise(F.col("id") % 1000)
                .alias("v")
            )
        return spark.range(n).select(
            F.when(F.col("id") < hot, F.lit(7)).otherwise(F.col("id")).alias("k"), v
        )

    base, new = snap(False), snap(True)

    # step 1 (audit): the collision detector flags the hot key with its size
    coll = {(r["k"], r["n_rows"]) for r in key_collisions(base, ["k"]).collect()}
    assert coll == {("7", hot)}

    # step 2 (bound): deterministic pre-diff dedup — min row per coerced key
    def dedup(df):
        from pyspark.sql import Window

        w = Window.partitionBy("k").orderBy("v")
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    d = key_diff(dedup(base), dedup(new), ["k"])
    counts = {
        r["diff_kind"]: r["n"]
        for r in d.groupBy("diff_kind").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert d.filter(F.col("k") == "7").count() == 1
    assert counts.get("changed", 0) == sum(1 for i in range(hot, n) if i % 10 == 0)
    assert sum(counts.values()) == (n - hot) + 1  # every key exactly once


def test_cli_dedup_exact_and_minhash(spark, tmp_path, capsys):
    """dedup subcommand: exact survivors keep one doc per identical text
    (min id), minhash clusters collapse near-identical docs, and the
    parquet sink round-trips."""
    from avro_diff_spark.cli import dedup_main

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),   # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog todays"),  # near dup
        (4, "completely different text about spark and parquet files"),
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    rc = dedup_main([src, "--method", "exact", "--emit", "clusters"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "# of input rows: 4" in out
    assert "# of distinct groups: 3" in out

    sink = str(tmp_path / "survivors")
    rc = dedup_main(
        [src, "--method", "minhash", "--threshold", "0.5", "--output", sink]
    )
    assert rc == 0
    kept = {r.doc_id for r in spark.read.parquet(sink).collect()}
    assert 1 in kept and 4 in kept and 2 not in kept  # 2 collapses into 1
    out = capsys.readouterr().out
    assert "# of input rows: 4" in out


def test_cli_dedup_perceptual_methods(spark, tmp_path, capsys):
    """Round 15: --method phash/audiohash dedup binary media payloads
    perceptually — the engineered pair fixtures collapse to one
    survivor per group through the shared clusters path."""
    from pyspark.sql import functions as F

    from avro_diff_spark import multimodal as MM
    from avro_diff_spark.cli import dedup_main

    docs = spark.range(0, 8).select(F.col("id").alias("doc_id"))

    img = str(tmp_path / "img")
    MM.synth_phash_media(docs, "doc_id").withColumnRenamed(
        "media_id", "doc_id"
    ).write.parquet(img)
    rc = dedup_main([img, "--method", "phash", "--max-hamming", "2",
                     "--emit", "clusters"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "# of input rows: 8" in out
    # every 2g/2g+1 pair within the ball collapses: groups <= 8, >= 4
    n_groups = int(out.split("# of distinct groups: ")[1].split()[0])
    assert 4 <= n_groups < 8

    wav = str(tmp_path / "wav")
    MM.synth_audio_pairs(docs, "doc_id").withColumnRenamed(
        "media_id", "doc_id"
    ).write.parquet(wav)
    rc = dedup_main([wav, "--method", "audiohash", "--max-hamming", "2",
                     "--emit", "pairs"])
    assert rc == 0
    assert capsys.readouterr().out.strip()


def test_cli_profile_reports_stats_skew_and_hist(spark, tmp_path, capsys):
    from avro_diff_spark import cli

    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1, "hot", 10.0), (2, "hot", 20.0), (3, "cold", None)],
        "k bigint, g string, v double",
    ).write.parquet(p)
    rc = cli.profile_main(
        [p, "--skew-keys", "g", "--top", "2", "--hist", "v:0:30:3"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "k " in out and "distinct        3" in out
    assert "nulls        1" in out  # the v column
    assert "#1   (hot)" in out and "rows        2" in out
    assert "histogram of v" in out
    assert "[  1]" in out and "[  2]" in out
    assert "[  0]" not in out  # empty buckets absent (GROUP BY law)


def test_cli_profile_rejects_malformed_hist_spec(spark, tmp_path, capsys):
    import pytest as _pytest

    from avro_diff_spark import cli

    p = str(tmp_path / "t2.parquet")
    spark.createDataFrame([(1.0,)], "v double").write.parquet(p)
    with _pytest.raises(SystemExit) as ei:
        cli.profile_main([p, "--hist", "v:0:100"])
    assert ei.value.code == 2


def test_cli_table_refresh_join(spark, tmp_path, capsys):
    from avro_diff_spark import cli
    from avro_diff_spark.sources.versioned import commit_snapshot, read_version

    fp, dp, vp = (str(tmp_path / x) for x in ("f", "d", "v"))
    commit_snapshot(
        spark.createDataFrame([(1, 10, "a")], "k bigint, fk bigint, val string"), fp
    )
    commit_snapshot(spark.createDataFrame([(10, "x")], "pk bigint, attr string"), dp)
    rc = cli.table_main(
        ["refresh-join", vp, "--fact", fp, "--dim", dp,
         "--key", "k", "--fk", "fk", "--pk", "pk"]
    )
    assert rc == 0
    assert "refreshed" in capsys.readouterr().out
    assert read_version(spark, vp).count() == 1
    # second call: already current
    rc = cli.table_main(
        ["refresh-join", vp, "--fact", fp, "--dim", dp,
         "--key", "k", "--fk", "fk", "--pk", "pk"]
    )
    assert rc == 0 and "already current" in capsys.readouterr().out
    # missing flags -> usage error
    assert cli.table_main(["refresh-join", vp]) == 2
