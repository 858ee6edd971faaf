"""Duplicate-key detection (the reference's "data test").

Reference: ``keyCollisionTest`` runs the whole diff, then scans every result
bucket's id arrays for comma-joined duplicates via a Set
(src/dataTest.js:4-25; same logic in the jest test src/index.test.js:10-24).

Spark-first: detect collisions directly on each input *before* diffing —
``groupBy(key).count().filter(count > 1)`` — a single partial-aggregated
shuffle on the key, no diff required. Keys are coerced to strings exactly as
the diff does (``constructKey`` parity, src/index.js:272-278) so a collision
here is precisely a collision there.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from avro_diff_spark.operators.key_diff import coerce_key


def key_collisions(df: DataFrame, key: Sequence[str]) -> DataFrame:
    """Rows per duplicated key. Columns: key fields (string) + ``n_rows``."""
    key = list(key)
    keyed = df.select(*[coerce_key(F.col(k)).alias(k) for k in key])
    return (
        keyed.groupBy(*key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def assert_unique_keys(df: DataFrame, key: Sequence[str]) -> None:
    """Raise ``ValueError`` listing up to 20 duplicate keys, if any exist.

    Library convenience mirroring the reference's console error
    (src/dataTest.js:20) but fail-fast.
    """
    dups = key_collisions(df, key).limit(20).collect()
    if dups:
        raise ValueError(f"duplicate keys under {list(key)}: {[tuple(r) for r in dups]}")
