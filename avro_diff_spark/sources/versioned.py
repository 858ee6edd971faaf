"""Versioned parquet tables: a minimal transaction-log layout for
snapshot commits, time travel, and cross-version diffing.

The public lakehouse log design (the Delta Lake protocol paper, Armbrust
et al., VLDB 2020, and the open Delta/Iceberg specs) reduced to its
core: a table directory holds immutable parquet data files plus a
``_log/`` of numbered JSON commit files; each commit lists ``add`` /
``remove`` file actions; the live file set of version N is the replay of
commits 0..N. Readers never list the data directory (object-store
listings are eventually consistent and slow at 100 TB — the log IS the
source of truth), writers stage data files first and publish the commit
LAST via an atomic rename, so a crashed writer leaves only unreferenced
files, never a torn table.

This intentionally implements the single-writer subset (no optimistic
concurrency / conflict checking) — enough for the engine's snapshot /
time-travel / diff surface; multi-writer coordination is a metastore
concern, not a read-path one.

No reference parity: yuana97/Avro_Diff diffs two explicit file paths
(SURVEY.md §2) — versioned diffing (``key_diff_versions``) composes this
log with the SAME keyed-diff operator, so "diff the last two commits of
a table" becomes one call instead of bookkeeping file paths by hand.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "commit_snapshot",
    "read_version",
    "latest_version",
    "table_history",
    "key_diff_versions",
    "compact_table",
    "vacuum",
    "commit_stream",
    "table_schema",
]

_LOG = "_log"


def _log_dir(table_path: str) -> str:
    return os.path.join(table_path, _LOG)


def _commit_files(table_path: str) -> list[tuple[int, str]]:
    d = _log_dir(table_path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.endswith(".json"):
            try:
                out.append((int(name[:-5]), os.path.join(d, name)))
            except ValueError:
                continue
    return sorted(out)


def latest_version(table_path: str) -> int:
    """Highest committed version, or -1 for a nonexistent/empty table."""
    commits = _commit_files(table_path)
    return commits[-1][0] if commits else -1


def _file_column_stats(table_path: str, rel_file: str, cols: list[str]) -> dict:
    """Per-file min/max straight from the parquet footer (pyarrow,
    driver-side metadata only — the same numbers a scan's pruning uses),
    JSON-encoded. Columns whose stats are unavailable are omitted
    (readers treat missing stats as may-match)."""
    import datetime

    import pyarrow.parquet as pq

    md = pq.ParquetFile(os.path.join(table_path, rel_file)).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out: dict = {}
    for c in cols:
        if c not in idx:
            continue
        lo, hi = None, None
        ok = True
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(idx[c]).statistics
            if s is None or not s.has_min_max:
                ok = False
                break
            lo = s.min if lo is None else min(lo, s.min)
            hi = s.max if hi is None else max(hi, s.max)
        if ok and isinstance(lo, (int, float, str)) and not isinstance(lo, bool):
            out[c] = [lo, hi]
        elif ok and isinstance(lo, (datetime.date, datetime.datetime)):
            out[c] = [lo.isoformat(), hi.isoformat()]
    return out


def table_schema(table_path: str, version: int | None = None):
    """The committed Spark schema as of ``version`` (default latest), or
    None for pre-schema-tracking commits."""
    from pyspark.sql import types as T

    if version is None:
        version = latest_version(table_path)
    for v, path in reversed(_commit_files(table_path)):
        if v > version:
            continue
        with open(path) as fh:
            c = json.load(fh)
        if "schema" in c:
            return T.StructType.fromJson(json.loads(c["schema"]))
        if c["mode"] == "overwrite":
            break  # older commits' schemas were replaced wholesale
    return None


def _check_append_schema(df: DataFrame, current, *, schema_evolution: bool):
    """Delta-style enforcement: an append must match the committed
    schema; with ``schema_evolution`` it may ADD nullable fields, but an
    existing field's type can never change silently."""
    if current is None:
        return
    cur = {f.name: f.dataType for f in current.fields}
    new = {f.name: f.dataType for f in df.schema.fields}
    changed = sorted(n for n in new if n in cur and new[n] != cur[n])
    if changed:
        raise ValueError(
            f"append changes existing column types {changed} — rewrite via "
            "an overwrite commit instead (types never drift silently)"
        )
    extra = sorted(set(new) - set(cur))
    missing = sorted(set(cur) - set(new))
    if (extra or missing) and not schema_evolution:
        raise ValueError(
            f"append schema mismatch (new columns {extra}, absent columns "
            f"{missing}) — pass schema_evolution=True to evolve additively"
        )


def commit_snapshot(
    df: DataFrame,
    table_path: str,
    *,
    mode: str = "overwrite",
    stats_cols: list[str] | None = None,
    schema_evolution: bool = False,
) -> int:
    """Commit ``df`` as the next version of the table. ``overwrite``
    replaces the live file set; ``append`` adds to it. Returns the new
    version number. With ``stats_cols``, each add action carries the
    listed columns' per-file min/max (harvested from the parquet footers
    at commit time — the Delta data-skipping stats), which
    :func:`read_version` ``prune=`` consults to skip files without
    opening them.

    Every commit records the Spark schema; appends are ENFORCED against
    the committed schema (the Delta rule: silent drift is how tables
    rot) — additive evolution (new nullable columns) is opt-in via
    ``schema_evolution=True``, type changes always require an overwrite.

    Write protocol (the crash-safety order every log-structured table
    uses): (1) write the data files into a staging subdirectory of the
    table — one distributed parquet write, any size; (2) fsync-rename
    the numbered commit JSON into ``_log/`` as the LAST step. A reader
    replaying the log either sees the full commit or none of it."""
    version = latest_version(table_path) + 1
    if mode == "append":
        _check_append_schema(
            df, table_schema(table_path, version - 1), schema_evolution=schema_evolution
        )
    added = _stage_data(df, table_path, version)
    actions: list[dict] = []
    if mode == "overwrite":
        actions += [{"remove": f} for f in _live_files(table_path, version - 1)]
    elif mode != "append":
        raise ValueError(f"unknown commit mode {mode!r}")
    if stats_cols:
        actions += [
            {"add": f, "stats": _file_column_stats(table_path, f, stats_cols)}
            for f in added
        ]
    else:
        actions += [{"add": f} for f in added]
    _publish_commit(
        table_path,
        version,
        {
            "version": version,
            "mode": mode,
            "n_rows": _footer_rows(table_path, added),
            "schema": df.schema.json(),
            "actions": actions,
        },
    )
    return version


def _stage_data(df: DataFrame, table_path: str, version: int) -> list[str]:
    """Write the data files into a fresh staging subdirectory; return the
    relative parquet paths."""
    stage = os.path.join(table_path, f"v{version:06d}-{uuid.uuid4().hex[:8]}")
    df.write.mode("errorifexists").parquet(stage)
    return sorted(
        os.path.join(os.path.basename(stage), f)
        for f in os.listdir(stage)
        if f.endswith(".parquet")
    )


def _footer_rows(table_path: str, rel_files: list[str]) -> int:
    """Row count from the parquet footers — driver-side metadata only, no
    second Spark job over the just-written data."""
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(os.path.join(table_path, f)).metadata.num_rows
        for f in rel_files
    )


def _publish_commit(table_path: str, version: int, commit: dict) -> None:
    """The atomic publish step shared by every writer: refuse an existing
    version, write the JSON to a tmp name, fsync, rename LAST."""
    os.makedirs(_log_dir(table_path), exist_ok=True)
    tmp = os.path.join(_log_dir(table_path), f".{version:06d}.json.tmp")
    final = os.path.join(_log_dir(table_path), f"{version:06d}.json")
    if os.path.exists(final):
        raise RuntimeError(f"version {version} already committed (concurrent writer?)")
    with open(tmp, "w") as fh:
        json.dump(commit, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, final)


def _live_adds(table_path: str, version: int) -> tuple[dict[str, dict], set]:
    """(live file → its commit-time stats, distinct schema JSONs of the
    commits whose files are still live) at ``version`` — the schema set
    tells readers whether the live files span an additive evolution."""
    live: dict[str, dict] = {}
    owner: dict[str, str | None] = {}
    for v, path in _commit_files(table_path):
        if v > version:
            break
        with open(path) as fh:
            commit = json.load(fh)
        for a in commit["actions"]:
            if "add" in a:
                live[a["add"]] = a.get("stats", {})
                owner[a["add"]] = commit.get("schema")
            else:
                del live[a["remove"]]
                del owner[a["remove"]]
    return live, {s for s in owner.values() if s is not None}


def _live_files(table_path: str, version: int) -> list[str]:
    return sorted(_live_adds(table_path, version)[0])


def read_version(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    *,
    prune: tuple[str, object, object] | None = None,
) -> DataFrame:
    """Read the table as of ``version`` (default: latest) — time travel.
    The file list comes from the log replay, never a directory listing,
    so concurrent staged-but-uncommitted writes are invisible.

    ``prune=(col, lo, hi)`` applies log-level data skipping BEFORE any
    file opens: only files whose commit-time [min, max] for ``col``
    intersects [lo, hi] are read (files without stats are kept — missing
    stats mean may-match), plus the matching row filter on top, so the
    result equals an unpruned read filtered to the range. At 100 TB this
    is the difference between a footer fetch per file and none at all —
    the manifest alone answers which files matter."""
    if version is None:
        version = latest_version(table_path)
    if version < 0:
        raise ValueError(f"no commits at {table_path!r}")
    adds, schemas = _live_adds(table_path, version)
    if not adds:
        raise ValueError(f"version {version} of {table_path!r} has no live files")
    # mergeSchema only when the live files actually span an additive
    # evolution (>1 distinct committed schema): keeps the common case at
    # zero extra footer reads while evolved tables read union-schema'd
    reader = spark.read.option("mergeSchema", "true") if len(schemas) > 1 else spark.read
    files = sorted(adds)
    if prune is not None:
        import datetime

        col, lo, hi = prune
        # stats for date/timestamp columns are stored as ISO strings (JSON
        # has no temporal types); coerce the caller's native bounds the
        # same way so the comparison stays apples-to-apples — ISO-8601
        # string order IS chronological order
        lo_s, hi_s = (
            v.isoformat() if isinstance(v, (datetime.date, datetime.datetime)) else v
            for v in (lo, hi)
        )
        kept = []
        for f in files:
            s = adds[f].get(col)
            if s is None or (not (s[1] < lo_s or s[0] > hi_s)):
                kept.append(f)
        files = kept
        if not files:
            return (
                reader.parquet(*[os.path.join(table_path, f) for f in sorted(adds)])
                .filter(F.lit(False))
            )
    df = reader.parquet(*[os.path.join(table_path, f) for f in files])
    if prune is not None:
        col, lo, hi = prune
        df = df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
    return df


def table_history(table_path: str) -> list[dict]:
    """One dict per commit: version, mode, row count, files added/removed
    — the ``DESCRIBE HISTORY`` surface, straight from the log."""
    out = []
    for _, path in _commit_files(table_path):
        with open(path) as fh:
            c = json.load(fh)
        out.append(
            {
                "version": c["version"],
                "mode": c["mode"],
                "n_rows": c["n_rows"],
                "n_added": sum(1 for a in c["actions"] if "add" in a),
                "n_removed": sum(1 for a in c["actions"] if "remove" in a),
            }
        )
    return out


def compact_table(
    spark: SparkSession, table_path: str, *, target_files: int = 8
) -> int:
    """Small-file compaction (the ``OPTIMIZE`` half without reclustering):
    rewrite the CURRENT live file set as ``target_files`` files and
    publish it as an overwriting commit. Readers of older versions are
    untouched — their files stay referenced by earlier commits until
    :func:`vacuum`. Returns the new version."""
    df = read_version(spark, table_path).coalesce(target_files)
    return commit_snapshot(df, table_path, mode="overwrite")


def vacuum(table_path: str, *, keep_versions: int = 1) -> list[str]:
    """Delete data files unreferenced by the last ``keep_versions``
    versions (and truncate time travel older than that) — the storage
    reclamation step after overwrites/compactions. Also sweeps staged
    directories no commit ever published (crashed writers). Returns the
    deleted file paths. Single-writer contract like the rest of the log."""
    import shutil

    last = latest_version(table_path)
    if last < 0:
        return []
    keep_from = max(last - keep_versions + 1, 0)
    needed: set[str] = set()
    for v in range(keep_from, last + 1):
        needed.update(_live_files(table_path, v))
    deleted: list[str] = []
    for entry in sorted(os.listdir(table_path)):
        full = os.path.join(table_path, entry)
        if entry == _LOG or not os.path.isdir(full):
            continue
        for f in sorted(os.listdir(full)):
            rel = os.path.join(entry, f)
            if f.endswith(".parquet") and rel not in needed:
                os.remove(os.path.join(table_path, rel))
                deleted.append(rel)
        if not any(f.endswith(".parquet") for f in os.listdir(full)):
            shutil.rmtree(full)
    return deleted


def commit_stream(
    stream_df: DataFrame,
    table_path: str,
    *,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Stream into a versioned table: each micro-batch lands as one
    APPEND commit via ``foreachBatch``, carrying its (app, epoch) id in
    the commit JSON. Structured Streaming replays the last in-flight
    batch after a crash/restart, so the sink dedupes on that pair — a
    batch already committed is skipped, giving exactly-once table
    contents on top of the source's checkpointed progress. This is the
    Delta txnAppId/txnVersion idempotent-write pattern enforced by the
    log itself; the app id is the checkpoint path, because epochs
    restart at 0 under a FRESH checkpoint and only the pair identifies
    a replay.

    Returns the started StreamingQuery (AvailableNow by default —
    drain-what-exists semantics for tests and backfills)."""

    app_id = os.path.abspath(checkpoint)

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # per-app epochs are monotone, so the NEWEST commit from this app
        # carries its max epoch — walk the log backwards and stop at the
        # first match instead of reading every commit per batch (Delta's
        # txn-snapshot lookup, O(1) amortized instead of O(commits))
        for _, path in reversed(_commit_files(table_path)):
            with open(path) as fh:
                c = json.load(fh)
            if c.get("app") == app_id:
                if c.get("epoch", -1) >= epoch_id:
                    return  # replayed batch: already durable in the log
                break
        version = latest_version(table_path) + 1
        added = _stage_data(batch_df, table_path, version)
        _publish_commit(
            table_path,
            version,
            {
                "version": version,
                "mode": "append",
                "app": app_id,
                "epoch": epoch_id,
                "n_rows": _footer_rows(table_path, added),
                "schema": batch_df.schema.json(),
                "actions": [{"add": f} for f in added],
            },
        )

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def key_diff_versions(
    spark: SparkSession,
    table_path: str,
    keys: list[str],
    *,
    v_old: int,
    v_new: int | None = None,
    **kwargs,
) -> DataFrame:
    """Keyed diff between two VERSIONS of one table — the reference's
    two-file diff (src/index.js keyed diff surface) lifted onto the
    commit log: added/removed/changed/unchanged classification of
    version ``v_new`` (default latest) against ``v_old``."""
    from avro_diff_spark.operators.key_diff import key_diff

    old = read_version(spark, table_path, v_old)
    new = read_version(spark, table_path, v_new)
    return key_diff(old, new, keys, **kwargs)
