"""expectation_report (operators/quality.py): rule classes, null
semantics, single-aggregate composition, and error cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_diff_spark.operators.quality import expectation_report


def _report(df_report):
    return {
        r["rule"]: (r["violations"], r["n_checked"]) for r in df_report.collect()
    }


def test_scan_unique_and_fk_rules(spark):
    df = spark.createDataFrame(
        [
            (1, 10, "a", 5.0),
            (2, 10, "a", -1.0),  # dup key (k1,k2); negative value
            (2, 10, "b", None),  # null value
            (3, 99, "c", 2.0),  # k_ref 99 missing from the dim
            (4, None, "c", 3.0),  # NULL FK: not a violation (SQL semantics)
        ],
        "k1 int, k_ref int, k2 string, v double",
    )
    # duplicate of (2,10,'a')? no — (k1,k2) pairs: (1,a),(2,a),(2,b),(3,c),(4,c): unique
    df = df.unionByName(
        spark.createDataFrame([(1, 10, "a", 7.0)], "k1 int, k_ref int, k2 string, v double")
    )
    dim = spark.createDataFrame([(10,), (20,)], "ref int")
    rep = _report(
        expectation_report(
            df,
            violations={
                "v_not_null": F.col("v").isNull(),
                "v_nonneg": F.col("v") < 0,
            },
            unique={"unique_k1_k2": ["k1", "k2"]},
            fk={"fk_ref": (dim, "k_ref", "ref")},
        )
    )
    assert rep == {
        "v_not_null": (1, 6),
        "v_nonneg": (1, 6),
        "unique_k1_k2": (1, 6),
        "fk_ref": (1, 6),
    }


def test_fk_only_report(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    dim = spark.createDataFrame([(1,), (2,)], "ref int")
    rep = _report(expectation_report(df, fk={"fk": (dim, "k", "ref")}))
    assert rep == {"fk": (1, 3)}


def test_report_is_one_row_per_rule_in_order(spark):
    df = spark.createDataFrame([(1,)], "k int")
    out = expectation_report(
        df, violations={"a": F.lit(False), "b": F.lit(True)}
    ).collect()
    assert [r["rule"] for r in out] == ["a", "b"]
    assert [r["violations"] for r in out] == [0, 1]


def test_errors(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="no rules"):
        expectation_report(df)
    with pytest.raises(ValueError, match="duplicate"):
        expectation_report(
            df,
            violations={"r": F.lit(True)},
            unique={"r": ["k"]},
        )


def test_empty_table_total(spark):
    """Zero-row input: every rule reports (0, 0), no NULL sums leak."""
    df = spark.createDataFrame([], "k int, v double")
    dim = spark.createDataFrame([(1,)], "ref int")
    rep = _report(
        expectation_report(
            df,
            violations={"v_not_null": F.col("v").isNull()},
            unique={"u": ["k"]},
            fk={"fk": (dim, "k", "ref")},
        )
    )
    assert rep == {"v_not_null": (0, 0), "u": (0, 0), "fk": (0, 0)}


def test_cli_dq_report(spark, tmp_path, capsys):
    """dq CLI: rule parsing, report print, exit 1 on violations / 0 clean."""
    from avro_diff_spark.cli import dq_main

    src = str(tmp_path / "d.parquet")
    ref = str(tmp_path / "ref.parquet")
    spark.createDataFrame(
        [(1, 5.0, 10), (1, -2.0, 10), (2, None, 99)], "k int, v double, r int"
    ).write.parquet(src)
    spark.createDataFrame([(10,), (20,)], "ref int").write.parquet(ref)
    rc = dq_main(
        [
            src,
            "--format", "parquet",
            "--not-null", "v",
            "--unique", "k",
            "--violation", "v_nonneg:v < 0",
            "--fk", f"r:{ref}:ref",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL not_null_v: 1 violations / 3 rows" in out
    assert "FAIL unique_k: 1 violations / 3 rows" in out
    assert "FAIL v_nonneg: 1 violations / 3 rows" in out
    assert "FAIL fk_r: 1 violations / 3 rows" in out
    # clean dataset -> rc 0
    clean = str(tmp_path / "clean.parquet")
    spark.createDataFrame([(1, 5.0)], "k int, v double").write.parquet(clean)
    rc = dq_main([clean, "--format", "parquet", "--not-null", "v"])
    assert rc == 0
    assert "ok   not_null_v: 0 violations / 1 rows" in capsys.readouterr().out


def test_cli_dq_fk_with_uri_colons(spark, tmp_path, capsys):
    """--fk COL:REF_PATH:REF_COL must tolerate colons inside REF_PATH
    (s3://, hdfs:// — here a file: URI)."""
    from avro_diff_spark.cli import dq_main

    src = str(tmp_path / "d.parquet")
    ref = str(tmp_path / "ref.parquet")
    spark.createDataFrame([(10,), (99,)], "r int").write.parquet(src)
    spark.createDataFrame([(10,), (20,)], "ref int").write.parquet(ref)
    rc = dq_main([src, "--format", "parquet", "--fk", f"r:file://{ref}:ref"])
    out = capsys.readouterr().out
    assert rc == 1 and "FAIL fk_r: 1 violations / 2 rows" in out
