"""Avro source with keep/ignore projection and reader-schema override.

Reference parity (see SURVEY.md §2.1):
- scan: reference streams an Avro OCF via ``readAvroFile`` (reference
  src/index.js:363-370); here one Avro file ⇒ one DataFrame via the built-in
  spark-avro module, which handles null/deflate/snappy codecs natively
  (reference hand-wires snappy + CRC stripping, src/index.js:319-352).
- schema-from-header (src/index.js:377-386) ⇒ automatic in spark-avro.
- schema override (src/config.js:2, src/index.js:393-401) ⇒
  ``.option("avroSchema", json)``.
- keep/ignore projection compiled into the readerSchema (src/index.js:39-51)
  ⇒ ``select``/``drop``: Catalyst ColumnPruning pushes the projection into the
  Avro reader, reproducing the decode-time pushdown. Unlike the reference
  (top-level fields only — its acknowledged TODO at src/index.js:24), nested
  field pruning also works here via ``spark.sql.optimizer.nestedSchemaPruning``.

No global CONFIG singleton (reference src/config.js:1-12): everything is a
keyword argument.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def _project(df: DataFrame, keep: Sequence[str] | None, ignore: Sequence[str] | None) -> DataFrame:
    """keep ∧ ¬ignore over top-level columns; either side None = no-op.

    Mirrors ``filteredSchema`` (reference src/index.js:39-51): a field
    survives iff (keep is null or field ∈ keep) and (ignore is null or
    field ∉ ignore). Column order of the original schema is preserved.
    """
    if keep is None and ignore is None:
        return df
    keep_set = set(keep) if keep is not None else None
    ignore_set = set(ignore) if ignore is not None else set()
    cols = [
        c
        for c in df.columns
        if (keep_set is None or c in keep_set) and c not in ignore_set
    ]
    return df.select(*cols)


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro DataSource module is on the session classpath.

    spark-avro is "built-in but external" (shipped separately from the Spark
    distribution); production clusters add it with
    ``--packages org.apache.spark:spark-avro_2.13:<spark-version>``.
    """
    try:
        # AvroDataSourceV2 is the service-registered entry point of the
        # external spark-avro module; probing AvroFileFormat is not enough
        # (a stub of it ships in the base distribution).
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.avro.AvroDataSourceV2"
        )
        return True
    except Exception:
        return False


def read_avro(
    spark: SparkSession,
    path: str | Sequence[str],
    *,
    keep_fields: Sequence[str] | None = None,
    ignore_fields: Sequence[str] | None = None,
    avro_schema: str | dict | None = None,
) -> DataFrame:
    """Read one or more Avro Object Container Files as a DataFrame.

    Improvements over the reference, for free from Spark: directory/glob
    paths (the reference takes single file paths only, bin/key_diff.js:8),
    exact int64 (the reference loses precision on long > 2^53,
    README.md:27), and distributed scans.
    """
    if not avro_available(spark):
        raise RuntimeError(
            "The spark-avro module is not on this session's classpath. "
            "Launch with --packages org.apache.spark:spark-avro_2.13:"
            f"{spark.version} (or add the jar to spark.jars)."
        )
    reader = spark.read.format("avro")
    if avro_schema is not None:
        if isinstance(avro_schema, dict):
            avro_schema = json.dumps(avro_schema)
        reader = reader.option("avroSchema", avro_schema)
    df = reader.load(list(path) if isinstance(path, (list, tuple)) else path)
    return _project(df, keep_fields, ignore_fields)


def read_parquet(
    spark: SparkSession,
    path: str | Sequence[str],
    *,
    keep_fields: Sequence[str] | None = None,
    ignore_fields: Sequence[str] | None = None,
) -> DataFrame:
    """Parquet twin of :func:`read_avro` (testdata and sinks are parquet)."""
    df = spark.read.parquet(*(path if isinstance(path, (list, tuple)) else [path]))
    return _project(df, keep_fields, ignore_fields)
