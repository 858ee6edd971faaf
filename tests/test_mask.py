"""Pins for deterministic pseudonymization (functions/mask.py)."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from avro_diff_spark.functions.mask import mask_columns, mask_token


def test_mask_token_laws(spark):
    df = spark.createDataFrame(
        [("alice",), ("bob",), ("alice",), (None,)], "v string"
    )
    out = df.select("v", mask_token(F.col("v"), salt="s1").alias("t")).collect()
    by_v = {}
    for r in out:
        by_v.setdefault(r.v, set()).add(r.t)
    assert len(by_v["alice"]) == 1          # deterministic: joinable
    assert by_v["alice"] != by_v["bob"]     # distinct values stay distinct
    assert by_v[None] == {None}             # NULL passthrough
    tok = next(iter(by_v["alice"]))
    assert tok.startswith("tok_") and len(tok) == 4 + 16
    # salt changes every token (unlinkable across exports)
    out2 = df.where(F.col("v") == "alice").select(
        mask_token(F.col("v"), salt="s2").alias("t")
    ).collect()
    assert out2[0].t != tok


def test_mask_columns_preserves_schema_and_joins(spark):
    a = spark.createDataFrame([(1, "x", 10), (2, "y", 20)], "k long, name string, v long")
    m = mask_columns(a, ["name"], salt="s")
    assert m.columns == a.columns
    # masked tables still join on masked keys consistently
    b = mask_columns(
        spark.createDataFrame([("x", 7)], "name string, w long"), ["name"], salt="s"
    )
    j = m.join(b, "name").collect()
    assert len(j) == 1 and j[0].k == 1 and j[0].w == 7

    import pytest

    with pytest.raises(ValueError):
        mask_columns(a, ["nope"], salt="s")
