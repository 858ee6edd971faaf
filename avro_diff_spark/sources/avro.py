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
    """keep ∧ ¬ignore projection; either side None = no-op. Field order of
    the original schema is preserved at every level.

    Mirrors ``filteredSchema`` (reference src/index.js:39-51): a field
    survives iff (keep is null or field ∈ keep) and (ignore is null or
    field ∉ ignore) — and goes PAST the reference, whose projection stops
    at top-level fields (its acknowledged TODO, src/index.js:24): entries
    may be dot-paths into nested structs (``pricing.meta.priority``). Path
    semantics generalize the top-level rule:

    - a keep path keeps the named node, every ancestor struct it needs
      (pruned to the kept descendants), and its whole subtree;
    - an ignore path drops the named node's subtree; surviving siblings
      keep their place in a rebuilt struct.

    Pruned structs are rebuilt with nested ``struct()`` expressions —
    declarative column work, so Catalyst's nested-schema pruning
    (``spark.sql.optimizer.nestedSchemaPruning.enabled``, on by default)
    narrows the physical scan to exactly the surviving leaves: at scale the
    projection is decode-time pushdown, same as the reference compiling its
    keep/ignore into the Avro reader schema, but per-leaf instead of
    per-top-level-field.
    """
    from pyspark.sql import functions as F, types as T

    if keep is None and ignore is None:
        return df
    keep_paths = [tuple(k.split(".")) for k in keep] if keep is not None else None
    ignore_paths = {tuple(i.split(".")) for i in ignore} if ignore is not None else set()

    def _kept(path: tuple) -> bool:
        """keep-side verdict for a node: kept if no keep list, or the path
        is an ancestor or descendant-or-self of some keep entry."""
        if keep_paths is None:
            return True
        for kp in keep_paths:
            if path[: len(kp)] == kp or kp[: len(path)] == path:
                return True
        return False

    def _prune(col, dt, path: tuple):
        """(column, modified) for the surviving subtree at ``path``, or
        (None, True) if fully pruned. Non-struct nodes are atomic: kept or
        dropped whole. An untouched struct passes through as the original
        column — no gratuitous rebuild in the plan."""
        if path in ignore_paths or not _kept(path):
            return None, True
        if isinstance(dt, T.StructType):
            children = [
                (f.name, *_prune(col.getField(f.name), f.dataType, path + (f.name,)))
                for f in dt.fields
            ]
            survivors = [(n, c) for n, c, _ in children if c is not None]
            if not survivors:
                return None, True
            if len(survivors) == len(dt.fields) and not any(m for _, _, m in children):
                return col, False
            return F.struct(*[c.alias(n) for n, c in survivors]), True
        return col, False

    out = []
    for f in df.schema.fields:
        c, _ = _prune(F.col(f.name), f.dataType, (f.name,))
        if c is not None:
            out.append(c.alias(f.name))
    return df.select(*out)


def project_fields(
    df: DataFrame,
    keep_fields: Sequence[str] | None = None,
    ignore_fields: Sequence[str] | None = None,
) -> DataFrame:
    """Public keep ∧ ¬ignore projection over top-level columns OR dot-paths
    into nested structs — the standalone form of the ``keep_fields`` /
    ``ignore_fields`` kwargs every reader takes (see :func:`_project`)."""
    return _project(df, keep_fields, ignore_fields)


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

    Two physical paths, same semantics:

    - spark-avro on the classpath → the native connector (block-splittable
      scans, all codecs, logical types). Preferred on real clusters.
    - otherwise → the pure-Python OCF codec (sources/ocf.py) run
      DISTRIBUTED: a byte-range split grid over the files (Hadoop-style
      sync-marker splits, so even ONE large container file parallelizes)
      with every range decoding in Arrow-batched ``mapInPandas`` on
      executors. No driver materialization; schema comes from one file's
      header read driver-side. ``avro_schema`` override on this path
      supports the projection use (reader schema with a field subset —
      the reference's only use of it, src/index.js:39-51).
    """
    if avro_available(spark):
        reader = spark.read.format("avro")
        if avro_schema is not None:
            if isinstance(avro_schema, dict):
                avro_schema = json.dumps(avro_schema)
            reader = reader.option("avroSchema", avro_schema)
        df = reader.load(list(path) if isinstance(path, (list, tuple)) else path)
        return _project(df, keep_fields, ignore_fields)
    df = _read_avro_fallback(spark, path, avro_schema=avro_schema)
    return _project(df, keep_fields, ignore_fields)


def read_avro_stream(
    spark: SparkSession,
    path: str,
    *,
    avro_schema: str | dict | None = None,
    schema_from: str | None = None,
) -> DataFrame:
    """Streaming Avro ingest: watch a directory for arriving OCFs and
    decode each as it lands — the reference's flagship format meeting
    Structured Streaming (the reference itself is batch-only,
    SURVEY.md §1.1/§2.8).

    Built on the ``binaryFile`` streaming file source (exactly-once file
    tracking, checkpointed progress — restarts pick up only unseen files)
    with the pure-Python OCF codec decoding in Arrow-batched
    ``mapInPandas`` on executors. Schema must be known up front (a
    streaming contract): pass a reader ``avro_schema`` — full spec schema
    resolution applies per file, so a directory where producers evolved
    the writer schema mid-stream still yields ONE uniform frame — or
    point ``schema_from`` at any existing OCF to copy its writer schema;
    by default the directory is probed for one ``.avro`` file.

    Scale shape: one task per arriving file (each file decodes whole —
    the landed-file granularity every streaming file pipeline has);
    intra-file byte-range splitting stays a batch-path feature. Memory is
    bounded by the largest single file, the binaryFile source's own
    contract.
    """
    import pandas as pd

    from avro_diff_spark.sources import ocf

    if avro_schema is not None:
        reader_schema = (
            json.loads(avro_schema) if isinstance(avro_schema, str) else avro_schema
        )
        decode_schema = reader_schema
    else:
        probe = schema_from or path
        try:
            found = _local_avro_files(probe)
        except FileNotFoundError:
            found = []
        if not found:
            raise ValueError(
                f"read_avro_stream: no .avro file under {probe!r} to probe the "
                "schema from (a stream's schema must be known before any file "
                "arrives) — pass avro_schema=, or schema_from= pointing at an "
                "existing container file"
            )
        with open(found[0], "rb") as f:
            decode_schema, _, _, _ = ocf.read_header_from_file(f)
        reader_schema = None
    spark_schema = ocf.avro_to_spark_schema(decode_schema)
    names = [f.name for f in spark_schema.fields]

    raw = (
        spark.readStream.format("binaryFile")
        # the binaryFile source's fixed schema, stated explicitly —
        # streaming sources never infer
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
    )

    def decode(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                rows = []
                for rec in ocf.iter_ocf(bytes(blob), reader_schema=reader_schema):
                    rows.append(rec if reader_schema else {n: rec.get(n) for n in names})
                    if len(rows) >= 4096:  # bound memory per Arrow batch
                        yield pd.DataFrame.from_records(rows, columns=names)
                        rows = []
                if rows:
                    yield pd.DataFrame.from_records(rows, columns=names)

    return raw.mapInPandas(decode, spark_schema)


def _local_avro_files(path: str | Sequence[str]) -> list[str]:
    """Resolve local file/dir/glob path(s) to concrete .avro file paths."""
    import glob as _glob
    import os

    paths = list(path) if isinstance(path, (list, tuple)) else [path]
    out: list[str] = []
    for p in paths:
        p = p.removeprefix("file:")
        if os.path.isdir(p):
            out.extend(sorted(_glob.glob(os.path.join(p, "*.avro"))))
        elif any(ch in p for ch in "*?["):
            out.extend(sorted(_glob.glob(p)))
        elif os.path.exists(p):
            out.append(p)
    if not out:
        raise FileNotFoundError(f"no Avro files at {path!r}")
    return out


def _read_avro_fallback(
    spark: SparkSession,
    path: str | Sequence[str],
    *,
    avro_schema: str | dict | None = None,
    split_size: int | None = None,
) -> DataFrame:
    """Distributed OCF scan without spark-avro (see :func:`read_avro`).

    Parallelism is a byte-range grid over every file (``split_size`` bytes
    per task, Hadoop-input-split style): a single multi-GB container file
    fans out across executors, not just many-file datasets. Each task syncs
    to the first block boundary in its range and decodes only the blocks it
    owns (:func:`avro_diff_spark.sources.ocf.iter_ocf_file_range`), holding
    one range — not one file — in memory. The split list is tiny driver
    state (path, start, stop per ``split_size`` bytes); the explicit-n
    round-robin repartition pins one task per split against AQE coalescing.

    ``split_size`` defaults adaptively: total bytes spread over
    ``defaultParallelism`` tasks, clamped to [64 KiB, 32 MiB]. Pure-Python
    decode throughput is the bottleneck of this path (~25k rec/s/core), so
    small datasets must still fan out across every core — a fixed 32 MiB
    Hadoop-style split would decode a half-MB fixture in ONE task. The
    64 KiB floor keeps splits at least a compressed-block long (4096-row
    blocks), so no task's range is all-sync-scan/no-blocks.
    """
    import os

    import pandas as pd

    from avro_diff_spark.sources import ocf

    files = _local_avro_files(path)
    if split_size is None:
        total = sum(os.path.getsize(fp) for fp in files)
        par = spark.sparkContext.defaultParallelism
        split_size = min(32 << 20, max(64 << 10, total // max(par, 1)))
    if avro_schema is not None:
        schema = json.loads(avro_schema) if isinstance(avro_schema, str) else avro_schema
    else:
        # schema from the first file's header — a bounded driver-side read
        with open(files[0], "rb") as f:
            schema, _, _, _ = ocf.read_header_from_file(f)
    spark_schema = ocf.avro_to_spark_schema(schema)
    names = [f.name for f in spark_schema.fields]
    # A caller-supplied schema is a true Avro READER schema: per-task
    # decode resolves writer-shaped bytes into it (field match by
    # name/alias, writer-only fields skipped, reader defaults, numeric
    # promotions — ocf.make_resolver), exactly what spark-avro's
    # ``avroSchema`` option does on the connector path.
    reader = schema if avro_schema is not None else None

    splits = [
        (fp, s, min(s + split_size, os.path.getsize(fp)))
        for fp in files
        for s in range(0, max(os.path.getsize(fp), 1), split_size)
    ]
    split_df = spark.createDataFrame(splits, "path: string, start: long, stop: long")
    if len(splits) > 1:
        split_df = split_df.repartition(len(splits))

    def decode(batches):
        for pdf in batches:
            for fp, s, e in zip(pdf["path"], pdf["start"], pdf["stop"]):
                rows = []
                for rec in ocf.iter_ocf_file_range(fp, int(s), int(e), reader_schema=reader):
                    rows.append(rec)
                    if len(rows) >= 4096:  # bound task memory per Arrow batch
                        yield pd.DataFrame.from_records(rows, columns=names)
                        rows = []
                if rows:
                    yield pd.DataFrame.from_records(rows, columns=names)

    return split_df.mapInPandas(decode, spark_schema)


def write_avro(
    df: DataFrame,
    path: str,
    *,
    codec: str = "null",
    record_name: str = "topLevelRecord",
    single_file: bool = False,
    via: str = "auto",
) -> None:
    """Write a DataFrame as Avro OCF(s) via the pure-Python codec.

    Default is DISTRIBUTED: ``path`` becomes a directory of one container
    file per non-empty partition (``part-NNNNN.avro``), each encoded
    executor-side with rows streaming straight through
    :func:`ocf.write_ocf_to` — no driver materialization, memory bounded
    by the encoder's block size. Parts commit atomically (tmp + rename)
    through :func:`sources.sink.write_parts`: plain local paths write
    executor-direct, while ``hdfs://`` / ``s3a://`` / any other Hadoop
    URI routes through the JVM ``FileSystem`` API (``via='auto'``
    dispatch; see sources/sink.py for the three routes' contracts —
    URI schemes pyarrow.fs can open stage executor-side, round 14).
    :func:`read_avro` reads the directory back transparently. The
    row→dict hop goes through ``Row.asDict`` (not Arrow/pandas)
    deliberately: pandas would coerce nullable int columns to float-NaN
    and corrupt the encoding.

    ``single_file=True`` keeps the one-file shape some fixtures/CLI flows
    need; rows then stream through the driver partition-by-partition
    (``toLocalIterator``), which is still O(block) memory but serial — use
    it only when one file genuinely matters. Production clusters with
    spark-avro on the classpath should prefer ``df.write.format('avro')``
    for bulk row data. Timestamp/decimal columns must be projected to
    long/double first (the converter raises otherwise).
    """
    from avro_diff_spark.sources import ocf
    from avro_diff_spark.sources.sink import write_parts

    schema = ocf.spark_to_avro_schema(df.schema, name=record_name)

    if single_file:
        rows = (r.asDict(recursive=True) for r in df.toLocalIterator())
        ocf.write_ocf(path, schema, rows, codec=codec)
        return

    def encode(idx: int, it, out) -> bool:
        first = next(it, None)
        if first is None:  # no file for empty partitions
            return False
        from itertools import chain

        ocf.write_ocf_to(
            out,
            schema,
            (r.asDict(recursive=True) for r in chain([first], it)),
            codec=codec,
        )
        return True

    write_parts(df, path, encode, ".avro", via=via)


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
