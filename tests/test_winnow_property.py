"""Property test: Spark winnowing == an independent pure-Python reference.

The sparse-table doubling formulation in functions/text.py winnow_hashes is
the optimized form; this pins it against the naive definition (min of every
w-window over the k-gram polynomial hashes, distinct, sorted) on random
corpora — edge cases included by construction: empty strings, all-space
strings, texts shorter than k, between k and k+w grams, and repeated
characters (tied minima).

Alphabet stays space + alphanumerics so Python's str.strip()/lower() agree
with Spark's trim()/lower() (Spark trim removes 0x20 only).
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from avro_diff_spark.functions import text as TX


def _py_winnow(text: str, k: int = 5, w: int = 8) -> list[int]:
    norm = re.sub(r"\s+", " ", text.strip().lower())
    codes = [ord(c) % 128 for c in norm]
    hs = [
        sum(codes[i + j] * TX.POLY_B ** (k - 1 - j) for j in range(k))
        for i in range(len(codes) - k + 1)
    ]
    if not hs:
        return []
    if len(hs) < w:
        mins = [min(hs)]
    else:
        mins = [min(hs[i : i + w]) for i in range(len(hs) - w + 1)]
    return sorted(set(mins))


@given(
    st.lists(
        st.text(alphabet=" abcdefgh123XY", min_size=0, max_size=40),
        min_size=1,
        max_size=12,
    )
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_winnow_matches_naive_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    got = {
        r.doc_id: list(r.fps)
        for r in df.select(
            "doc_id", TX.char_codes(F.col("text")).alias("c")
        )
        .select("doc_id", TX.winnow_hashes(F.col("c"), k=5, w=8).alias("fps"))
        .collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_winnow(t), f"text={t!r}"
