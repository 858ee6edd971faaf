"""Structured Streaming source over a versioned table's commit log —
"tail the table": each APPEND commit replays as (part of) a micro-batch,
so a downstream query consumes exactly the rows each commit added, in
commit order, with the log as the only coordination point.

This is the Delta streaming-source shape (a table as a stream of
AddFiles) built on the PUBLIC PySpark Python Data Source API
(pyspark.sql.datasource, SPARK-44076 / Spark 4): offsets are commit
versions, ``partitions(start, end)`` maps each newly committed version
to its add-actions (one InputPartition per data file — file-level
parallelism, the same unit Delta's source schedules), and ``read``
decodes one parquet file with pyarrow on the EXECUTOR, reattaching the
partition-column values recorded in the log. Non-append commits
(overwrite/compaction) are rejected by default exactly like Delta's
source — pass ``ignore_changes=True`` to skip them (their rewritten
files are NOT replayed; downstream sees appends only).

Composes with the engine's CDC half: ``stream_table(...)`` piped into
``streaming.diff.key_diff_stream`` classifies the commit firehose
against any baseline — see tests/test_versioned_stream.py.

No reference parity: yuana97/Avro_Diff has no streaming surface
(SURVEY.md §2); beyond-reference tier.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from avro_diff_spark.sources.versioned import (
    _commit_files,
    latest_version,
    table_schema,
)

__all__ = [
    "VersionedTableStreamSource",
    "VersionedTableChangesSource",
    "stream_table",
    "stream_changes",
]


def _typed_pv_value(s: str | None, dt):
    """A log partitionValue string → the python value matching the Spark
    type (the same cast read_version applies via Column.cast, done
    driver/executor-side here because the data source yields rows)."""
    import datetime

    from pyspark.sql import types as T

    if s is None:
        return None
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(s)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return float(s)
    if isinstance(dt, T.BooleanType):
        return s.lower() == "true"
    if isinstance(dt, T.DateType):
        return datetime.date.fromisoformat(s)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return datetime.datetime.fromisoformat(s)
    return s


try:  # the Python Data Source API needs pyspark>=4; gate for older envs
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _FilePartition(InputPartition):
        def __init__(
            self,
            path: str,
            pv_typed: list,
            field_names: list[str],
            phys_names: list[str] | None = None,
        ):
            self.path = path
            self.pv_typed = pv_typed  # [(col, value), ...] already typed
            self.field_names = field_names
            # physical column names aligned with field_names (column
            # mapping: files store stable physical names after renames)
            self.phys_names = phys_names or field_names

    class _VersionedStreamReader(DataSourceStreamReader):
        def __init__(self, schema, options: dict):
            self.table_path = options["path"]
            self.start = int(options.get("starting_version", "0"))
            self.ignore_changes = (
                str(options.get("ignore_changes", "false")).lower() == "true"
            )
            self.schema = schema

        def initialOffset(self) -> dict:
            return {"version": self.start - 1}

        def latestOffset(self) -> dict:
            return {"version": latest_version(self.table_path)}

        def partitions(self, start: dict, end: dict):
            from avro_diff_spark.sources.versioned import _column_mapping

            by_version = dict(_commit_files(self.table_path))
            names = [f.name for f in self.schema.fields]
            types = {f.name: f.dataType for f in self.schema.fields}
            mapping, _ = _column_mapping(self.table_path, end["version"])
            inv = {p: l for l, p in mapping.items()}
            phys = [mapping.get(n, n) for n in names]
            parts = []
            from avro_diff_spark.sources.versioned import _live_adds

            for v in range(start["version"] + 1, end["version"] + 1):
                if v not in by_version:
                    continue  # vacuumed log entries keep their numbers; gaps impossible otherwise
                with open(by_version[v]) as fh:
                    commit = json.load(fh)
                # an OVERWRITE's adds are the complete new table state, so
                # at the stream's starting version it IS the initial
                # snapshot (Delta's startingVersion semantics); later
                # overwrites are rewrites the append feed cannot express
                actions = commit["actions"]
                if v == self.start and commit["mode"] not in (
                    "append",
                    "overwrite",
                ):
                    # a replace/meta/delete/update/merge commit's own adds
                    # are NOT the table state (a compaction re-adds only
                    # the files it packed; a meta commit adds nothing) —
                    # the initial snapshot is the full live set at the
                    # starting version (round-8 ADVICE)
                    adds, _ = _live_adds(self.table_path, v)
                    if any(info.get("dvs") for info in adds.values()):
                        raise ValueError(
                            f"starting_version {v} of {self.table_path!r} "
                            "has live deletion vectors, which a table "
                            "stream's snapshot read cannot apply — run "
                            "compact_table (it materializes DVs away) and "
                            "start from that version"
                        )
                    actions = [
                        {"add": f, "pv": info.get("pv")}
                        for f, info in sorted(adds.items())
                    ]
                elif commit["mode"] == "meta" and v != self.start:
                    continue  # constraint/rename/drop: no rows to replay
                elif commit["mode"] == "replace" and v != self.start:
                    continue  # compaction: dataChange=false, rows already replayed
                elif commit["mode"] != "append" and v != self.start:
                    if self.ignore_changes:
                        continue
                    raise ValueError(
                        f"version {v} of {self.table_path!r} is a non-append "
                        f"({commit['mode']}) commit — a table stream replays "
                        "appends only; pass ignore_changes=True to skip "
                        "rewrite/delete commits (their files are not replayed)"
                    )
                for a in actions:
                    if "add" not in a:
                        continue
                    pv = {
                        inv.get(c, c): s for c, s in (a.get("pv") or {}).items()
                    }  # recorded pv keys are physical
                    parts.append(
                        _FilePartition(
                            os.path.join(self.table_path, a["add"]),
                            [
                                (c, _typed_pv_value(s, types[c]))
                                for c, s in pv.items()
                                if c in types
                            ],
                            names,
                            phys,
                        )
                    )
            return parts

        def read(self, partition):
            # executor-side single-file decode: pyarrow, schema-aligned by
            # PHYSICAL NAME (files may predate an additive evolution or a
            # rename), partition columns reattached from the log values
            import pyarrow.parquet as pq

            tbl = pq.read_table(partition.path)
            cols = {c: tbl.column(c).to_pylist() for c in tbl.column_names}
            pv = dict(partition.pv_typed)
            n = tbl.num_rows
            series = [
                cols[p] if p in cols else [pv.get(name)] * n
                for name, p in zip(partition.field_names, partition.phys_names)
            ]
            yield from zip(*series)

        def commit(self, end: dict) -> None:
            pass  # progress is tracked by the query checkpoint

    class _ChangePartition(InputPartition):
        """One CDF work unit: a data file read whole (``ct`` fixed) or at
        its newly-masked DV positions (``sidecars`` set; per-row ct from
        the sidecar's ``ct`` column when present, else ``ct``)."""

        def __init__(
            self,
            path: str,
            pv_typed: list,
            field_names: list[str],
            ct: str | None,
            version: int,
            sidecars: list[str] | None = None,
            dv_key: str | None = None,
            phys_names: list[str] | None = None,
        ):
            self.path = path
            self.pv_typed = pv_typed
            self.field_names = field_names
            self.ct = ct
            self.version = version
            self.sidecars = sidecars
            self.dv_key = dv_key
            self.phys_names = phys_names or field_names

    class _ChangesStreamReader(DataSourceStreamReader):
        """Streaming CDF over the commit log — Delta's ``readChangeFeed``
        stream, derived STRUCTURALLY from each commit's actions (no keyed
        diff, no stored change files): append adds are inserts; a DV
        commit's newly-masked positions are its deletes / update
        preimages (read from the file the vector points at); a
        merge-on-read commit's adds carry their change type (``ct``) and
        its mixed vector tags rows in the sidecar. ``replace``
        (compaction/clustering) commits change no logical rows and
        replay as NOTHING — the Delta dataChange=false rule. Overwrites
        and restores cannot be expressed as row changes without a keyed
        diff: they fail the stream unless ``ignore_changes=True`` skips
        them (batch :func:`avro_diff_spark.sources.versioned.read_changes`
        covers them via the diff path)."""

        def __init__(self, schema, options: dict):
            self.table_path = options["path"]
            self.start = int(options.get("starting_version", "0"))
            self.ignore_changes = (
                str(options.get("ignore_changes", "false")).lower() == "true"
            )
            self.schema = schema

        def initialOffset(self) -> dict:
            return {"version": self.start - 1}

        def latestOffset(self) -> dict:
            return {"version": latest_version(self.table_path)}

        def _add_partitions(self, commit, v, names, types, default_ct, inv, phys):
            parts = []
            for a in commit["actions"]:
                if "add" not in a:
                    continue
                if a.get("dvs"):
                    raise ValueError(
                        f"version {v} snapshot add carries deletion vectors — "
                        "compact the table before streaming its changes from "
                        "this version"
                    )
                ct = a.get("ct") or default_ct
                if ct is None:
                    raise ValueError(
                        f"version {v} of {self.table_path!r} is a merge commit "
                        "without change-type tags (written by an older engine); "
                        "use batch read_changes for this range"
                    )
                pv = {inv.get(c, c): s for c, s in (a.get("pv") or {}).items()}
                parts.append(
                    _ChangePartition(
                        os.path.join(self.table_path, a["add"]),
                        [
                            (c, _typed_pv_value(s, types[c]))
                            for c, s in pv.items()
                            if c in types
                        ],
                        names,
                        ct,
                        v,
                        phys_names=phys,
                    )
                )
            return parts

        def partitions(self, start: dict, end: dict):
            from avro_diff_spark.sources.versioned import _column_mapping, _live_adds

            by_version = dict(_commit_files(self.table_path))
            data_fields = self.schema.fields[:-2]  # drop _change_type/_commit_version
            names = [f.name for f in data_fields]
            types = {f.name: f.dataType for f in data_fields}
            mapping, _ = _column_mapping(self.table_path, end["version"])
            inv = {p: l for l, p in mapping.items()}
            phys = [mapping.get(n, n) for n in names]
            parts = []
            for v in range(start["version"] + 1, end["version"] + 1):
                if v not in by_version:
                    continue
                with open(by_version[v]) as fh:
                    commit = json.load(fh)
                mode = commit["mode"]
                if mode == "replace":
                    continue  # compaction rewrites no logical rows
                if mode == "meta":
                    continue  # constraint/rename/drop: no row changes
                if mode == "append" or (mode == "overwrite" and v == self.start):
                    parts += self._add_partitions(
                        commit, v, names, types, "insert", inv, phys
                    )
                    continue
                if mode in ("delete", "update", "merge"):
                    default_ct = {
                        "delete": "delete",
                        "update": "update_preimage",
                        "merge": None,
                    }[mode]
                    dv_acts = [a["dv"] for a in commit["actions"] if "dv" in a]
                    if dv_acts:
                        live = _live_adds(self.table_path, v - 1)[0]
                        for d in dv_acts:
                            info = live.get(d["for"], {})
                            pv = {
                                inv.get(c, c): s
                                for c, s in (info.get("pv") or {}).items()
                            }
                            parts.append(
                                _ChangePartition(
                                    os.path.join(self.table_path, d["for"]),
                                    [
                                        (c, _typed_pv_value(s, types[c]))
                                        for c, s in pv.items()
                                        if c in types
                                    ],
                                    names,
                                    default_ct,
                                    v,
                                    sidecars=[
                                        p
                                        if os.path.isabs(p)
                                        else os.path.join(self.table_path, p)
                                        for p in d["paths"]
                                    ],
                                    dv_key=d["for"],
                                    phys_names=phys,
                                )
                            )
                    parts += self._add_partitions(
                        commit, v, names, types,
                        "update_postimage" if mode == "update" else None,
                        inv, phys,
                    )
                    continue
                if self.ignore_changes:
                    continue
                raise ValueError(
                    f"version {v} of {self.table_path!r} is a {mode} commit — "
                    "an overwrite/restore cannot be replayed as row changes; "
                    "pass ignore_changes=True to skip it or use batch "
                    "read_changes (keyed diff) for this range"
                )

            return parts

        def read(self, partition):
            import pyarrow.parquet as pq

            tbl = pq.read_table(partition.path)
            cols = {c: tbl.column(c).to_pylist() for c in tbl.column_names}
            pv = dict(partition.pv_typed)
            meta = (partition.version,)
            if partition.sidecars is None:
                n = tbl.num_rows
                series = [
                    cols[p] if p in cols else [pv.get(name)] * n
                    for name, p in zip(partition.field_names, partition.phys_names)
                ]
                ct = [partition.ct] * n
                yield from (
                    row + (c,) + meta for row, c in zip(zip(*series), ct)
                )
                return
            hits: list[tuple[int, str | None]] = []
            for sp in partition.sidecars:
                sc = pq.read_table(sp)
                fcol = sc.column("f").to_pylist()
                icol = sc.column("idx").to_pylist()
                ccol = (
                    sc.column("ct").to_pylist()
                    if "ct" in sc.column_names
                    else [None] * len(icol)
                )
                hits += [
                    (i, c)
                    for f, i, c in zip(fcol, icol, ccol)
                    if f == partition.dv_key
                ]
            for i, c in sorted(hits):
                yield tuple(
                    cols[p][i] if p in cols else pv.get(name)
                    for name, p in zip(partition.field_names, partition.phys_names)
                ) + (c or partition.ct,) + meta

        def commit(self, end: dict) -> None:
            pass

    class VersionedTableChangesSource(DataSource):
        """``spark.readStream.format("versioned_table_changes")`` — the
        table's change feed as a stream: the committed schema plus
        ``_change_type`` and ``_commit_version``."""

        @classmethod
        def name(cls) -> str:
            return "versioned_table_changes"

        def schema(self):
            from pyspark.sql import types as T

            sch = table_schema(self.options["path"])
            if sch is None:
                raise ValueError(
                    f"no committed schema at {self.options['path']!r} — "
                    "commit at least one version before streaming"
                )
            return T.StructType(
                list(sch.fields)
                + [
                    T.StructField("_change_type", T.StringType()),
                    T.StructField("_commit_version", T.LongType()),
                ]
            )

        def streamReader(self, schema):
            return _ChangesStreamReader(schema, self.options)

    class VersionedTableStreamSource(DataSource):
        """``spark.readStream.format("versioned_table")`` — options:
        ``path`` (the table), ``starting_version`` (default 0),
        ``ignore_changes`` (skip overwrite commits instead of failing)."""

        @classmethod
        def name(cls) -> str:
            return "versioned_table"

        def schema(self):
            sch = table_schema(self.options["path"])
            if sch is None:
                raise ValueError(
                    f"no committed schema at {self.options['path']!r} — "
                    "commit at least one version before streaming"
                )
            return sch

        def streamReader(self, schema):
            return _VersionedStreamReader(schema, self.options)

except ImportError:  # pragma: no cover - pyspark<4 fallback
    VersionedTableStreamSource = None  # type: ignore[assignment]
    VersionedTableChangesSource = None  # type: ignore[assignment]


def stream_table(
    spark: SparkSession,
    table_path: str,
    *,
    starting_version: int = 0,
    starting_ts=None,
    ignore_changes: bool = False,
) -> DataFrame:
    """Open a versioned table as a streaming DataFrame of its append
    commits (registers the data source idempotently). Schema is the
    table's committed schema; rows arrive in commit order, one
    micro-batch per trigger covering all newly committed versions.

    ``starting_ts`` (datetime or epoch micros) is Delta's inclusive
    ``startingTimestamp``: the stream begins at the earliest commit
    whose time is ≥ the timestamp; before the first commit → the whole
    table, after the last → only future commits."""
    if VersionedTableStreamSource is None:  # pragma: no cover
        raise RuntimeError("versioned_table streaming needs pyspark >= 4")
    if starting_ts is not None:
        from avro_diff_spark.sources.versioned import first_version_at_or_after

        starting_version = first_version_at_or_after(table_path, starting_ts)
    spark.dataSource.register(VersionedTableStreamSource)
    return (
        spark.readStream.format("versioned_table")
        .option("path", table_path)
        .option("starting_version", str(starting_version))
        .option("ignore_changes", "true" if ignore_changes else "false")
        .load()
    )


def stream_changes(
    spark: SparkSession,
    table_path: str,
    *,
    starting_version: int = 0,
    starting_ts=None,
    ignore_changes: bool = False,
) -> DataFrame:
    """Open a versioned table's CHANGE FEED as a streaming DataFrame —
    Delta's ``readStream.option("readChangeFeed", "true")``: the table
    schema plus ``_change_type`` ∈ {insert, delete, update_preimage,
    update_postimage} and ``_commit_version``, derived structurally from
    each commit's actions (appends → inserts; deletion-vector commits →
    deletes / update pre-images read at the masked positions; merge-on-
    read commits via their per-clause tags; compactions → nothing).
    Divergence from the batch keyed-diff path by design: an append whose
    key already exists streams as ``insert`` (the physical truth),
    where :func:`read_changes` classifies it as an update — identical on
    key-unique tables, which is the CDC contract's precondition.

    ``starting_ts`` follows Delta's inclusive ``startingTimestamp``
    (see :func:`stream_table`)."""
    if VersionedTableStreamSource is None:  # pragma: no cover
        raise RuntimeError("versioned_table streaming needs pyspark >= 4")
    if starting_ts is not None:
        from avro_diff_spark.sources.versioned import first_version_at_or_after

        starting_version = first_version_at_or_after(table_path, starting_ts)
    spark.dataSource.register(VersionedTableChangesSource)
    return (
        spark.readStream.format("versioned_table_changes")
        .option("path", table_path)
        .option("starting_version", str(starting_version))
        .option("ignore_changes", "true" if ignore_changes else "false")
        .load()
    )
