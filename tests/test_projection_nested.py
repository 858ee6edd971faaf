"""Dot-path keep/ignore projection into nested structs.

Goes past the reference's top-level-only ``filteredSchema`` (its TODO at
reference src/index.js:24): keep/ignore entries may name nested leaves;
ancestor structs are rebuilt pruned, untouched subtrees pass through
unchanged, and (for columnar sources) Catalyst's nested-schema pruning
narrows the physical ReadSchema to the surviving leaves.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from avro_diff_spark.sources.avro import project_fields, read_avro, read_parquet, write_avro


@pytest.fixture(scope="module")
def nested(spark):
    rows = [
        Row(
            k=i,
            customer=Row(cid=i * 10, status="S" if i % 2 else "T"),
            pricing=Row(total=float(i), meta=Row(ts=1000 + i, prio=f"P{i % 3}")),
        )
        for i in range(1, 6)
    ]
    return spark.createDataFrame(rows)


def _names(df):
    return df.schema.simpleString()


def test_keep_nested_leaf_prunes_siblings(nested):
    out = project_fields(nested, keep_fields=["k", "customer.cid"])
    assert _names(out) == "struct<k:bigint,customer:struct<cid:bigint>>"
    assert out.orderBy("k").select("customer.cid").rdd.map(lambda r: r[0]).collect() == [
        10, 20, 30, 40, 50,
    ]


def test_keep_whole_struct_passes_subtree(nested):
    out = project_fields(nested, keep_fields=["pricing"])
    assert _names(out) == (
        "struct<pricing:struct<total:double,meta:struct<ts:bigint,prio:string>>>"
    )


def test_ignore_nested_leaf_keeps_siblings(nested):
    out = project_fields(nested, ignore_fields=["pricing.meta.ts"])
    assert _names(out) == (
        "struct<k:bigint,customer:struct<cid:bigint,status:string>,"
        "pricing:struct<total:double,meta:struct<prio:string>>>"
    )
    got = out.orderBy("k").select("pricing.meta.prio").first()[0]
    assert got == "P1"


def test_keep_and_ignore_compose(nested):
    out = project_fields(
        nested,
        keep_fields=["k", "pricing"],
        ignore_fields=["pricing.meta"],
    )
    assert _names(out) == "struct<k:bigint,pricing:struct<total:double>>"


def test_struct_fully_pruned_disappears(nested):
    # ignoring every child of customer removes customer itself
    out = project_fields(nested, ignore_fields=["customer.cid", "customer.status"])
    assert _names(out) == (
        "struct<k:bigint,pricing:struct<total:double,meta:struct<ts:bigint,prio:string>>>"
    )


def test_top_level_semantics_unchanged(nested):
    out = project_fields(nested, keep_fields=["k", "customer"], ignore_fields=["customer"])
    assert out.columns == ["k"]


def test_parquet_scan_readschema_pruned(spark, nested, tmp_path):
    """The rebuilt-struct projection must still push into the columnar scan:
    the parquet ReadSchema may not contain the ignored leaf."""
    p = str(tmp_path / "nested.parquet")
    nested.write.parquet(p)
    out = read_parquet(spark, p, keep_fields=["k", "pricing"], ignore_fields=["pricing.meta.ts"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    read_schema = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "prio" in read_schema
    assert "ts" not in read_schema
    assert "customer" not in read_schema


def test_avro_path_nested_keep_ignore(spark, nested, tmp_path):
    """End-to-end over the engine's flagship format: write a nested OCF via
    the pure-Python codec, read it back with dot-path keep/ignore."""
    p = str(tmp_path / "nested.avro")
    write_avro(nested, p, codec="deflate", single_file=True)
    out = read_avro(
        spark, p, keep_fields=["k", "pricing"], ignore_fields=["pricing.meta.ts"]
    )
    assert _names(out) == "struct<k:bigint,pricing:struct<total:double,meta:struct<prio:string>>>"
    rows = out.orderBy("k").collect()
    assert [r.k for r in rows] == [1, 2, 3, 4, 5]
    assert rows[0].pricing.total == 1.0
    assert rows[0].pricing.meta.prio == "P1"


def test_cli_dot_path_projection(spark, nested, tmp_path, capsys):
    """The CLI's --keep-fields/--ignore-fields accept dot-paths end to end:
    the ignored nested leaf must not reach the diff (so a change to it
    classifies as unchanged)."""
    from avro_diff_spark import cli

    old_p = str(tmp_path / "old.parquet")
    new_p = str(tmp_path / "new.parquet")
    nested.write.parquet(old_p)
    # mutate ONLY the ignored leaf
    nested.withColumn(
        "pricing",
        F.col("pricing").withField("meta", F.col("pricing.meta").withField("ts", F.lit(9))),
    ).write.parquet(new_p)

    rc = cli.key_diff_main(
        [old_p, new_p, "k", "--format", "parquet", "--ignore-fields", "pricing.meta.ts"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "# of changed rows: 0" in out
    assert "# of unchanged rows: 5" in out
