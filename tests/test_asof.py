"""as-of join semantics: latest quote at-or-before the probe timestamp,
deterministic tie-breaks, left behavior for unmatched probes."""

from __future__ import annotations

from avro_diff_spark.operators.asof import asof_join


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_asof_basic_and_ties(spark):
    quotes = spark.createDataFrame(
        [
            # (qid, key, ts, px)
            (1, "a", 10, 1.0),
            (2, "a", 20, 2.0),
            (3, "a", 20, 3.0),  # equal-ts tie: higher qid must win
            (4, "a", 40, 4.0),
            (5, "b", 99, 9.0),
        ],
        "qid long, key string, ts long, px double",
    )
    probes = spark.createDataFrame(
        [
            (100, "a", 5),    # before any quote -> nulls
            (101, "a", 20),   # same-instant quote matches; tie -> qid 3
            (102, "a", 39),   # between quotes -> qid 3
            (103, "a", 40),   # exactly at quote -> qid 4
            (104, "c", 50),   # key with no quotes -> nulls
        ],
        "pid long, key string, ts long",
    )
    out = asof_join(
        probes, quotes, on="key", ts="ts", seq="qid", quote_cols=["qid", "px"]
    ).select("pid", "last_qid", "last_px")
    assert _rows(out) == {
        (100, None, None),
        (101, 3, 3.0),
        (102, 3, 3.0),
        (103, 4, 4.0),
        (104, None, None),
    }


def test_asof_composite_key(spark):
    quotes = spark.createDataFrame(
        [(1, "x", 1, 10, 1.0), (2, "x", 2, 10, 2.0)],
        "qid long, k1 string, k2 long, ts long, px double",
    )
    probes = spark.createDataFrame(
        [(7, "x", 1, 15), (8, "x", 2, 15), (9, "x", 3, 15)],
        "pid long, k1 string, k2 long, ts long",
    )
    out = asof_join(
        probes, quotes, on=["k1", "k2"], ts="ts", seq="qid", quote_cols=["px"]
    ).select("pid", "last_px")
    assert _rows(out) == {(7, 1.0), (8, 2.0), (9, None)}


def test_asof_probe_columns_preserved(spark):
    quotes = spark.createDataFrame([(1, "a", 10, 5.0)], "qid long, key string, ts long, px double")
    probes = spark.createDataFrame([(1, "a", 12, "payload")], "pid long, key string, ts long, extra string")
    out = asof_join(probes, quotes, on="key", ts="ts", seq="qid", quote_cols=["px"])
    assert set(out.columns) == {"pid", "key", "ts", "extra", "last_px"}
    assert _rows(out.select("pid", "extra", "last_px")) == {(1, "payload", 5.0)}
