"""Versioned parquet tables: a minimal transaction-log layout for
snapshot commits, time travel, partition/stats pruning, CDC, and
cross-version diffing.

The public lakehouse log design (the Delta Lake protocol paper, Armbrust
et al., VLDB 2020, and the open Delta/Iceberg specs) reduced to its
core: a table directory holds immutable parquet data files plus a
``_log/`` of numbered JSON commit files; each commit lists ``add`` /
``remove`` file actions; the live file set of version N is the replay of
commits 0..N. Readers never list the data directory (object-store
listings are eventually consistent and slow at 100 TB — the log IS the
source of truth), writers stage data files first and publish the commit
LAST via an atomic link, so a crashed writer leaves only unreferenced
files, never a torn table.

Deletion vectors (round 8): :func:`delete_where` / :func:`update_where`
default to merge-on-read — matching rows are identified by scan-time
``(file, row_index)`` provenance, written as a parquet sidecar, and
attached to their files by a metadata commit; :func:`read_version`
masks them with one anti-join, overwrites/compaction materialize them
away, vacuum treats live sidecars as referenced data, and shallow
clones re-attach them. A point-delete in a 1 GB file writes a few KB
instead of rewriting 1 GB — the Delta/Iceberg DV read path.

Checkpoints (round 8): every ``_CHECKPOINT_INTERVAL`` commits the
publisher writes ``NNNNNN.checkpoint.json`` — the full replayed state
(live adds with stats/pv/bloom/schema/DVs, merged schema, partitioning,
constraints) plus a ``_last_checkpoint`` pointer, exactly Delta's
layout. Reads replay checkpoint + tail instead of the whole log:
O(interval), not O(n-commits), the first wall every long-lived
streaming table hits.

Concurrency model (round 7): the commit publish is an atomic
claim-by-hardlink of the numbered log entry, so two writers can never
both own one version. APPEND commits rebase-and-retry on a lost race
(the Delta optimistic-concurrency rule for blind appends under
WriteSerializable: disjoint AddFile sets commute); OVERWRITE commits
fail on any concurrent commit (their remove-set was computed against a
stale snapshot) and surface a clear retry error. This is still a
local-filesystem log (``os.link`` atomicity); an object-store port would
swap the claim primitive for a conditional PUT, exactly as Delta's
LogStore abstraction does.

Partitioned tables (round 7): ``commit_snapshot(partition_by=[cols])``
stages with hive-style directories and records Delta-style
``partitionValues`` per add action; :func:`read_version` prunes
partitions straight from the log — the coarse skip every lakehouse user
reaches for before stats pruning — and reconstructs the partition
columns from the recorded values (the files themselves don't carry
them), typed per the committed schema.

No reference parity: yuana97/Avro_Diff diffs two explicit file paths
(SURVEY.md §2) — versioned diffing (``key_diff_versions``) composes this
log with the SAME keyed-diff operator, and :func:`read_changes` lifts it
to a Delta-CDF-style change feed between versions.
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
    "version_as_of",
    "first_version_at_or_after",
    "table_history",
    "table_files",
    "table_count",
    "table_ndv",
    "merge_stream",
    "key_diff_versions",
    "read_changes",
    "merge_into",
    "delete_where",
    "update_where",
    "compact_table",
    "vacuum",
    "commit_stream",
    "last_committed_epoch",
    "table_schema",
    "table_constraints",
    "add_constraint",
    "drop_constraint",
    "clone_table",
    "checkpoint_log",
    "agg_delta",
    "refresh_agg_table",
    "refresh_join_table",
    "commit_txn_marker",
    "commit_app_meta",
    "latest_app_meta",
    "CommitConflict",
]

_LOG = "_log"
_VACUUM = "_vacuum.json"
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"
_CKPT_SUFFIX = ".checkpoint.json"
_LAST_CKPT = "_last_checkpoint"
# Delta's default: a checkpoint every 10 commits. Readers replay
# checkpoint + tail instead of the whole log — at 10^5 commits (a year
# of streaming micro-batches) the difference between opening 10 files
# and 10^5 per read.
_CHECKPOINT_INTERVAL = 10
# Above this many live partition-value combinations, read_version stops
# building one literal-pv scan per combination (tens of thousands of
# plan nodes at high-cardinality partitioning) and switches to one scan
# per STAGING DIRECTORY with Spark's native hive-partition discovery.
# Lowered 64 -> 8 (optimization round 16): a 16-bucket index table paid
# ~16 x (read + pv reattach + union) of driver/py4j round trips and
# repeated analysis per read_version call — measured ~2 s of pure
# driver build time per stored-index probe — where the staged-dir read
# is 1-3 scans with native hive partition pruning on the pv columns
# (results, types, pruning and DV masking pinned equal by
# test_high_cardinality_partitioning_reads_bounded_plan).
_MAX_LITERAL_PV_GROUPS = 8


def _read_commit(path: str) -> dict:
    """Single choke point for commit-JSON reads — tests monkeypatch this
    to pin that checkpointed reads open only the tail of the log."""
    with open(path) as fh:
        return json.load(fh)


class CommitConflict(RuntimeError):
    """Another writer published this version first (lost the atomic
    claim). Appends rebase and retry automatically; overwrites surface
    this so the caller can re-read and re-derive the overwrite."""


def _log_dir(table_path: str) -> str:
    return os.path.join(table_path, _LOG)


def _commit_files(table_path: str) -> list[tuple[int, str]]:
    d = _log_dir(table_path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.endswith(".json") and name != _VACUUM:
            try:
                out.append((int(name[:-5]), os.path.join(d, name)))
            except ValueError:
                continue
    return sorted(out)


def latest_version(table_path: str) -> int:
    """Highest committed version, or -1 for a nonexistent/empty table."""
    commits = _commit_files(table_path)
    return commits[-1][0] if commits else -1


def _checkpoint_path(table_path: str, version: int) -> str:
    return os.path.join(_log_dir(table_path), f"{version:06d}{_CKPT_SUFFIX}")


def _usable_checkpoint(table_path: str, version: int) -> tuple[int, dict] | None:
    """The newest checkpoint at or below ``version`` (time travel below
    the last checkpoint falls back to an older one, or to full replay).
    One directory listing — the same listing every log read already
    performs; no data files are opened."""
    d = _log_dir(table_path)
    if not os.path.isdir(d):
        return None
    best = -1
    for name in os.listdir(d):
        if name.endswith(_CKPT_SUFFIX):
            try:
                v = int(name[: -len(_CKPT_SUFFIX)])
            except ValueError:
                continue
            if best < v <= version:
                best = v
    if best < 0:
        return None
    try:
        with open(_checkpoint_path(table_path, best)) as fh:
            return best, json.load(fh)
    except (OSError, ValueError):
        return None  # torn/missing checkpoint: fall back to full replay


def checkpoint_log(table_path: str, version: int | None = None) -> str:
    """Write a checkpoint of the table state at ``version`` (default
    latest): the live add-set with all per-add metadata (stats, pv,
    bloom, owner schema, deletion vectors), the merged table schema, the
    partitioning, and the CHECK constraints — everything a reader needs,
    so :func:`read_version` replays only the commits AFTER it. Written
    atomically (tmp + rename; a half-written checkpoint is never
    visible) and advertised via the ``_last_checkpoint`` pointer, the
    Delta layout. Checkpoints are derived data: deleting one only costs
    replay time. :func:`_publish_commit` calls this automatically every
    ``_CHECKPOINT_INTERVAL`` commits."""
    if version is None:
        version = latest_version(table_path)
    live, _ = _live_adds(table_path, version)
    adds: dict[str, dict] = {}
    for f, info in live.items():
        slim = {k: v for k, v in info.items() if v not in (None, [], {})}
        adds[f] = slim
    sch = table_schema(table_path, version)
    # commit-time index for version_as_of: previous checkpoint's map +
    # the tail — O(interval) amortized, never a full-log rewalk
    prev = _usable_checkpoint(table_path, version)
    ts_map: dict[str, int] = dict(prev[1].get("ts", {})) if prev else {}
    # newest app_meta PER KEY at or below this checkpoint (the O(1) side
    # of latest_app_meta): previous checkpoint's map + the tail, so a
    # stats/tracking lookup never has to walk commits below a checkpoint.
    # Folded per key because different commit families carry different
    # meta (collection stats vs source tracking vs streaming txn) and the
    # newest commit overall may carry none of the wanted keys.
    am_map: dict[str, dict] = (
        dict(prev[1].get("app_meta_latest", {})) if prev else {}
    )
    prev_v = prev[0] if prev else -1
    if prev is not None and "app_meta_latest" not in prev[1]:
        # old-format checkpoint: fold the full log once here so THIS
        # checkpoint carries the complete map
        prev_v_am = -1
    else:
        prev_v_am = prev_v
    for v, path in _commit_files(table_path):
        if prev_v < v <= version or prev_v_am < v <= version:
            c = _read_commit(path)
            if prev_v < v:
                ts_map[str(v)] = c.get("ts_us", 0)
            am = c.get("app_meta")
            if am:
                for key in am:
                    am_map[key] = {"version": v, "meta": dict(am)}
    ck = {
        "version": version,
        "adds": adds,
        "partition_by": _table_partitioning(table_path, version),
        "constraints": table_constraints(table_path, version),
        "ts": ts_map,
        "app_meta_latest": am_map,
    }
    if sch is not None:
        ck["schema"] = sch.json()
    cm, cm_retired = _column_mapping(table_path, version)
    if cm:
        ck["column_mapping"], ck["retired_physical"] = cm, cm_retired
    cl = _table_clustering_raw(table_path, version)
    if cl:
        ck["cluster"] = cl
    nd = _table_ndv_phys(table_path, version)
    if nd:
        ck["ndv"] = nd
    p = _checkpoint_path(table_path, version)
    tmp = p + f".{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as fh:
        json.dump(ck, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, p)
    ptr_tmp = os.path.join(_log_dir(table_path), f".{_LAST_CKPT}.tmp")
    with open(ptr_tmp, "w") as fh:
        json.dump({"version": version}, fh)
    os.replace(ptr_tmp, os.path.join(_log_dir(table_path), _LAST_CKPT))
    return p


def _vacuum_watermark(table_path: str) -> int:
    """Earliest readable version (0 when never vacuumed). Versions below
    it had their unshared data files deleted — the log entries remain
    for lineage, but time travel to them must fail CLEARLY instead of
    deep inside a Spark scan (round-6 ADVICE)."""
    p = os.path.join(_log_dir(table_path), _VACUUM)
    if not os.path.exists(p):
        return 0
    with open(p) as fh:
        return int(json.load(fh)["earliest"])


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
        lo, hi, nn = None, None, 0
        ok = True
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(idx[c]).statistics
            if s is None or not s.has_min_max:
                ok = False
                break
            lo = s.min if lo is None else min(lo, s.min)
            hi = s.max if hi is None else max(hi, s.max)
            if nn is not None and s.null_count is not None:
                nn += s.null_count
            else:
                nn = None
        if ok and isinstance(lo, (int, float, str)) and not isinstance(lo, bool):
            out[c] = [lo, hi] if nn is None else [lo, hi, nn]
        elif ok and isinstance(lo, (datetime.date, datetime.datetime)):
            out[c] = (
                [lo.isoformat(), hi.isoformat()]
                if nn is None
                else [lo.isoformat(), hi.isoformat(), nn]
            )
    return out


# Add sets at or under this size harvest stats from parquet footers on
# the driver (a handful of local metadata reads beats a Spark job);
# larger ones run ONE distributed aggregation — a 50k-file commit costs
# one map-side-combined Spark job, not 50k serial driver footer fetches.
_DRIVER_FOOTER_MAX_FILES = 32


def _stats_jsonable(v):
    """A collected min/max value → its JSON log encoding, or None when
    the type doesn't participate in stats (matching the footer path:
    int/float/str plus ISO-encoded temporal; never bool)."""
    import datetime

    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    return None


def _harvest_stats(
    spark: SparkSession, table_path: str, rel_files: list[str], stats_cols: list[str]
) -> tuple[dict[str, int], dict[str, dict]]:
    """(per-file row counts, per-file column min/max) for a just-staged
    add set — the metadata every add action carries. Small sets use the
    driver footer loop; everything else is ONE distributed aggregation
    over the staged files (``input_file_name`` groupBy with map-side
    partial agg — one output row per file), the same shape the bloom
    harvest uses (round-8 brief: no O(files) serial driver work on the
    commit path)."""
    if len(rel_files) <= _DRIVER_FOOTER_MAX_FILES:
        import pyarrow.parquet as pq

        rows = {
            f: pq.ParquetFile(os.path.join(table_path, f)).metadata.num_rows
            for f in rel_files
        }
        stats = (
            {f: _file_column_stats(table_path, f, stats_cols) for f in rel_files}
            if stats_cols
            else {}
        )
        return rows, {f: s for f, s in stats.items() if s}
    from urllib.parse import unquote, urlparse

    df = spark.read.parquet(*[os.path.join(table_path, f) for f in rel_files])
    cols = [c for c in stats_cols if c in df.columns]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.min(c).alias(f"__lo_{i}"))
        aggs.append(F.max(c).alias(f"__hi_{i}"))
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{i}")
        )
    collected = (
        df.groupBy(F.input_file_name().alias("__f")).agg(*aggs).collect()
    )
    root = os.path.abspath(table_path)
    rows: dict[str, int] = {f: 0 for f in rel_files}  # empty files: 0 rows
    stats: dict[str, dict] = {}
    for r in collected:
        rel = os.path.relpath(unquote(urlparse(r["__f"]).path), root)
        rows[rel] = r["__n"]
        st: dict = {}
        for i, c in enumerate(cols):
            lo = _stats_jsonable(r[f"__lo_{i}"])
            hi = _stats_jsonable(r[f"__hi_{i}"])
            nn = int(r[f"__nn_{i}"])
            if lo is not None and hi is not None:
                # third element: the Delta nullCount — powers IS NULL
                # file skipping (prune_eq=(col, None))
                st[c] = [lo, hi, nn]
            elif nn > 0:
                # an ALL-NULL file still records its null count: range
                # pruning treats None bounds as may-match, the IS NULL
                # lookup keeps it
                st[c] = [None, None, nn]
        if st:
            stats[rel] = st
    return rows, stats


_BLOOM_M = 1024  # bits per per-file bloom filter
_BLOOM_K = 4  # hash functions (md5 hex chunks)


def _bloom_positions(value: str) -> list[int]:
    """The k bit positions of a value: four 32-bit chunks of its md5,
    mod m — the SAME arithmetic the distributed harvest computes with
    built-in Column functions, so reader and writer can never drift."""
    import hashlib

    h = hashlib.md5(value.encode()).hexdigest()
    return [int(h[i * 8 : (i + 1) * 8], 16) % _BLOOM_M for i in range(_BLOOM_K)]


def _compute_blooms(
    spark: SparkSession, table_path: str, rel_files: list[str], cols: list[str]
) -> dict[str, dict[str, str]]:
    """Per-file bloom bitmaps for ``cols``, harvested in ONE distributed
    pass over the just-staged files (never a driver-side data read): the
    bit positions are pure Column md5 arithmetic, only the ≤(files × m)
    position sets come back to the driver. Values are keyed by their
    string cast (int/string/date columns — the point-lookup types);
    NULLs are not added (bloom pruning answers non-null equality)."""
    import base64
    from urllib.parse import unquote, urlparse

    paths = [os.path.join(table_path, f) for f in rel_files]
    probe = spark.read.parquet(*paths)
    bad = [
        c
        for c in cols
        if c in dict(probe.dtypes) and dict(probe.dtypes)[c] == "boolean"
    ]
    if bad:
        # Spark's string cast ('true') and Python str() ('True') disagree,
        # so a boolean bloom would silently never match at read time — and
        # a 2-value domain has no point-lookup selectivity anyway
        raise ValueError(
            f"bloom_cols {bad} are boolean — blooms answer point lookups "
            "on int/string/date columns (round-7 ADVICE)"
        )
    df = probe.select(
        F.input_file_name().alias("__f"),
        *[F.col(c).cast("string").alias(c) for c in cols],
    )
    root = os.path.abspath(table_path)
    out: dict[str, dict[str, str]] = {}
    for c in cols:
        s = F.col(c)
        pos = F.explode(
            F.array(
                *[
                    (
                        F.conv(F.substring(F.md5(s), 1 + 8 * i, 8), 16, 10).cast(
                            "long"
                        )
                        % _BLOOM_M
                    )
                    for i in range(_BLOOM_K)
                ]
            )
        )
        # pack the bitmap DISTRIBUTED: per file, fold the position set
        # into _BLOOM_M/8 byte values, so the driver collects 128 small
        # ints per (file, column) instead of up to _BLOOM_M positions —
        # an 8x smaller collect at a 50k-file commit
        packed = F.transform(
            F.sequence(F.lit(0), F.lit(_BLOOM_M // 8 - 1)),
            # positions are a SET, so within one byte each bit appears
            # once: the OR is an exact sum of 2^(p&7) (pow(2, k<=7) is
            # integer-exact in IEEE doubles; shiftleft would need a
            # literal shift amount)
            lambda b: F.aggregate(
                F.filter(F.col("__ps"), lambda p: F.shiftright(p, 3) == b),
                F.lit(0).cast("long"),
                lambda acc, p: acc
                + F.pow(F.lit(2.0), p.bitwiseAND(F.lit(7))).cast("long"),
            ),
        )
        rows = (
            df.filter(s.isNotNull())
            .select("__f", pos.alias("__p"))
            .groupBy("__f")
            .agg(F.collect_set("__p").alias("__ps"))
            .select("__f", packed.alias("__bytes"))
            .collect()
        )
        for r in rows:
            rel = os.path.relpath(unquote(urlparse(r["__f"]).path), root)
            bits = bytes(int(x) for x in r["__bytes"])
            out.setdefault(rel, {})[c] = base64.b64encode(bits).decode()
    return out


def _may_match_eq(add: dict, col: str, value) -> bool:
    """Log-level skip decision for a POINT lookup: partitionValues give
    an exact answer, the per-file bloom gives a no-false-negative
    membership answer, min/max stats bound the range — all from the
    manifest, zero file opens. ``value=None`` is the IS NULL lookup:
    identity partition values answer it exactly; otherwise the recorded
    per-file null count (stats third element, the Delta nullCount) skips
    files with zero nulls in the column."""
    import base64

    pv = add.get("pv") or {}
    if value is None:
        if col in pv:
            return pv[col] is None
        s = (add.get("stats") or {}).get(col)
        if s is not None and len(s) > 2 and s[2] == 0:
            return False  # recorded zero nulls: no IS NULL row here
        return True
    if col in pv:
        v = pv[col]
        if v is None:
            return False
        return _typed_value(v, value) == _typed_value(str(_bound_str(value)), value)
    bl = (add.get("bloom") or {}).get(col)
    if bl is not None:
        # normalize to Spark's string cast (booleans lowercase, timestamp
        # fractions trimmed) so the reader hashes the exact bytes the
        # distributed harvest hashed; an unmappable rendering (tz-aware
        # datetime) skips the bloom and keeps the file
        probe = _spark_cast_str(value)
        if probe is not None:
            bits = base64.b64decode(bl)
            for p in _bloom_positions(probe):
                if not (bits[p // 8] >> (p % 8)) & 1:
                    return False
    return _may_match(add, col, value, value)


#: the two widening chains Spark's parquet readers promote natively
#: (SPARK-44368 family): byte -> short -> int -> long, float -> double.
#: Cross-chain promotion (long -> double) is lossy and never implicit.
_WIDEN_RANK = {
    "byte": ("int", 0),
    "short": ("int", 1),
    "integer": ("int", 2),
    "long": ("int", 3),
    "float": ("fp", 0),
    "double": ("fp", 1),
}


def _widen_type(a, b):
    """The wider of two Spark types on one widening chain, or None when
    they are incompatible (different chains / non-numeric)."""
    if a == b:
        return a
    ra, rb = _WIDEN_RANK.get(a.typeName()), _WIDEN_RANK.get(b.typeName())
    if ra and rb and ra[0] == rb[0]:
        return a if ra[1] >= rb[1] else b
    return None


def table_schema(table_path: str, version: int | None = None):
    """The committed Spark schema as of ``version`` (default latest), or
    None for pre-schema-tracking commits. Additive evolution folds in:
    the result is the FIELD-ORDER-PRESERVING union of the committed
    schemas since the last overwrite, so a column added by one append
    and omitted by a later one (legal with schema_evolution) stays in
    the table schema — readers and the append type gate both see it."""
    from pyspark.sql import types as T

    if version is None:
        version = latest_version(table_path)
    ck = _usable_checkpoint(table_path, version)
    ck_v = ck[0] if ck is not None else -1
    chain: list = []
    saw_overwrite = False
    for v, path in reversed(_commit_files(table_path)):
        if v > version:
            continue
        if v <= ck_v:
            break  # checkpoint summarizes everything at or below it
        c = _read_commit(path)
        if "schema" in c:
            chain.append(T.StructType.fromJson(json.loads(c["schema"])))
        if c["mode"] == "overwrite" or (c["mode"] == "meta" and "schema" in c):
            # overwrite replaces the schema wholesale; a schema-bearing
            # meta commit (rename/drop column) records the COMPLETE
            # post-change logical schema, so older names must not union
            # back in
            saw_overwrite = True
            break
    if ck is not None and not saw_overwrite and "schema" in ck[1]:
        # the checkpoint's merged schema is the oldest-since-overwrite base
        chain.append(T.StructType.fromJson(json.loads(ck[1]["schema"])))
    if not chain:
        return None
    merged: list = []
    pos: dict[str, int] = {}
    for sch in reversed(chain):  # oldest-since-overwrite first
        for f in sch.fields:
            if f.name not in pos:
                pos[f.name] = len(merged)
                merged.append(f)
            else:
                # type widening (round 9): commits after a widened append
                # legally record a wider type for an existing column —
                # the table schema resolves to the WIDEST on the chain
                # (the gate rejects incompatible drift, so None only
                # happens on pre-gate logs; first-seen wins there)
                i = pos[f.name]
                w = _widen_type(merged[i].dataType, f.dataType)
                if w is not None and w != merged[i].dataType:
                    merged[i] = T.StructField(f.name, w, True)
    return T.StructType(merged)


def _check_append_schema(df: DataFrame, table_path: str, version: int, *, schema_evolution):
    """Delta-style enforcement: an append must match the table schema;
    with ``schema_evolution`` it may ADD nullable fields, but an
    existing field's type can never change silently. Types are validated
    against the UNION of the distinct still-live schemas — not just the
    most recent commit's — so a column legally omitted by one append
    cannot be reintroduced later with a drifted type (round-6 ADVICE).

    ``schema_evolution="widen"`` (round 9 — Delta's TYPE WIDENING)
    additionally allows an existing column's type to move ALONG a
    widening chain in either direction (byte→short→int→long,
    float→double): the table schema resolves to the widest recorded
    type and the read path hands Spark's parquet readers the wide
    requested schema, which they promote natively — old files are never
    rewritten. Incompatible drift (string→int, long→double) is still
    refused."""
    from pyspark.sql import types as T

    widen = schema_evolution == "widen"
    current = table_schema(table_path, version)
    if current is None:
        return
    new = {f.name: f.dataType for f in df.schema.fields}
    live_schemas = _live_adds(table_path, version)[1]
    seen: dict[str, object] = {f.name: f.dataType for f in current.fields}
    for sj in live_schemas:
        for f in T.StructType.fromJson(json.loads(sj)).fields:
            seen.setdefault(f.name, f.dataType)
    changed = sorted(
        n
        for n in new
        if n in seen
        and new[n] != seen[n]
        and not (widen and _widen_type(new[n], seen[n]) is not None)
    )
    if changed:
        hint = (
            "rewrite via an overwrite commit instead (types never drift "
            "silently; schema_evolution='widen' admits only the "
            "byte→short→int→long and float→double chains)"
            if widen
            else "rewrite via an overwrite commit instead (types never "
            "drift silently), or pass schema_evolution='widen' for "
            "chain-compatible numeric widening"
        )
        raise ValueError(f"append changes existing column types {changed} — {hint}")
    cur_names = {f.name for f in current.fields}
    extra = sorted(set(new) - cur_names)
    missing = sorted(cur_names - set(new))
    if (extra or missing) and not schema_evolution:
        raise ValueError(
            f"append schema mismatch (new columns {extra}, absent columns "
            f"{missing}) — pass schema_evolution=True to evolve additively"
        )


def _check_retired(df: DataFrame, table_path: str, mapping: dict, retired: list) -> None:
    """Refuse an append introducing a logical column whose identity
    physical name is RETIRED (a later reader would resurrect the dropped
    column's dead data from old files) or already in use as another
    logical column's physical (an alias collision after a concurrent
    rename). Zero-cost when column mapping was never activated."""
    if not mapping:
        return
    in_use = set(mapping.values())
    for c in df.columns:
        if c in mapping:
            continue
        if c in retired:
            raise ValueError(
                f"column name {c!r} was dropped from {table_path!r} — "
                "appending it would resurrect the dropped data; pick a "
                "new name or rewrite via an overwrite commit"
            )
        if c in in_use:
            raise ValueError(
                f"column name {c!r} is the physical name of a renamed "
                f"column of {table_path!r} — pick a different name"
            )


def last_committed_epoch(table_path: str, app_id: str) -> int:
    """The newest epoch ``app_id`` committed to the table (−1 if none)
    — the Delta txnAppId/txnVersion snapshot lookup streaming sinks
    dedupe micro-batch replays on. ``app_id`` is an OPAQUE string
    compared verbatim against the stamp (Delta's txnAppId semantics —
    round 12: stamps used to be abspath-normalized while lookups were
    not, so a relative/logical app id silently never matched and the
    idempotence guard was inert; commits stamped by the old normalized
    form still match callers that pass absolute paths, which every
    in-tree caller does). Per-app epochs are monotone, so the walk
    stops at the first commit from this app (O(1) amortized for a
    table written by the app)."""
    for _, path in reversed(_commit_files(table_path)):
        c = _read_commit(path)
        if c.get("app") == app_id:
            return c.get("epoch", -1)
    return -1


def commit_snapshot(
    df: DataFrame,
    table_path: str,
    *,
    mode: str = "overwrite",
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    schema_evolution: bool = False,
    partition_evolution: bool = False,
    partition_by: list[str] | None = None,
    app_meta: dict | None = None,
    txn: tuple[str, int] | None = None,
    max_retries: int = 10,
) -> int:
    """Commit ``df`` as the next version of the table. ``overwrite``
    replaces the live file set; ``append`` adds to it. Returns the new
    version number. With ``stats_cols``, each add action carries the
    listed columns' per-file min/max (harvested from the parquet footers
    at commit time — the Delta data-skipping stats), which
    :func:`read_version` ``prune=`` consults to skip files without
    opening them. With ``bloom_cols``, each add action also carries a
    per-file bloom bitmap per listed column (harvested in one
    distributed Column-expression pass over the just-staged files —
    never a driver-side data read), which ``prune_eq=`` consults for
    POINT lookups: min/max stats cannot skip a needle inside a file's
    range, a bloom can, with zero false negatives by construction. With ``partition_by``, data files land in hive-style
    partition directories and each add action records the Delta-style
    ``partitionValues`` (``pv``) — the log-level partition pruning
    :func:`read_version` applies before any stats check, and appends
    must keep the table's partitioning.

    Every commit records the Spark schema; appends are ENFORCED against
    the committed schema (the Delta rule: silent drift is how tables
    rot) — additive evolution (new nullable columns) is opt-in via
    ``schema_evolution=True``, type changes always require an overwrite,
    and the type gate checks every still-live schema, not just the
    newest.

    Write protocol (the crash-safety order every log-structured table
    uses): (1) write the data files into a staging subdirectory of the
    table — one distributed parquet write, any size; (2) atomically
    claim the numbered commit JSON in ``_log/`` as the LAST step. A
    reader replaying the log either sees the full commit or none of it.
    An APPEND that loses the claim race rebases onto the new latest
    version (re-running the schema gate there) and retries — blind adds
    commute; an OVERWRITE that loses the race raises
    :class:`CommitConflict` because its remove-set is stale."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unknown commit mode {mode!r}")
    version = latest_version(table_path) + 1
    mapping, retired = _column_mapping(table_path, version - 1)
    phys_pb = _phys_specs(partition_by, mapping) if partition_by else list(partition_by or [])
    if mode == "append":
        _check_append_schema(df, table_path, version - 1, schema_evolution=schema_evolution)
        _check_retired(df, table_path, mapping, retired)
        prev_pb = _table_partitioning(table_path, version - 1)
        if prev_pb is not None and phys_pb != prev_pb and not partition_evolution:
            raise ValueError(
                f"append partitioning {partition_by or []} != table partitioning "
                f"{prev_pb} — repartition via an overwrite commit, or pass "
                "partition_evolution=True (Iceberg model: old files keep "
                "their spec, pruning consults each file's own recorded "
                "transform)"
            )
    _check_constraints(df, table_path, version - 1)
    stage_mapping = dict(mapping)  # the mapping the files are staged under
    added = _stage_data(_to_physical(df, mapping), table_path, version, phys_pb)
    rels = [f for f, _ in added]
    file_rows, file_stats = _harvest_stats(
        df.sparkSession, table_path, rels, _phys_cols(stats_cols, mapping)
    )
    n_rows = sum(file_rows.values())
    blooms = (
        _compute_blooms(
            df.sparkSession, table_path, rels, _phys_cols(bloom_cols, mapping)
        )
        if bloom_cols
        else {}
    )

    def actions_for(v: int) -> list[dict]:
        acts: list[dict] = []
        if mode == "overwrite":
            acts += [{"remove": f} for f in _live_files(table_path, v - 1)]
        for f, pv in added:
            a: dict = {"add": f, "n": file_rows.get(f, 0)}
            if pv is not None:
                a["pv"] = pv
            st = file_stats.get(f)
            if st:
                a["stats"] = st
            if f in blooms:
                a["bloom"] = blooms[f]
            acts.append(a)
        return acts

    import time

    cur_df = df  # re-projected to fresh logical names on a lost race
    for _ in range(max(max_retries, 1)):
        commit = {
            "version": version,
            "mode": mode,
            "ts_us": int(time.time() * 1_000_000),
            "n_rows": n_rows,
            "schema": cur_df.schema.json(),
            "actions": actions_for(version),
        }
        if phys_pb:
            commit["partition_by"] = phys_pb
        if mapping:
            # keep the logical→physical map total over the table columns:
            # an overwrite re-bases it on its own columns, an evolving
            # append registers its new columns as identity entries
            new_map = (
                {c: mapping.get(c, c) for c in cur_df.columns}
                if mode == "overwrite"
                else {**mapping, **{c: c for c in cur_df.columns if c not in mapping}}
            )
            commit["set_mapping"] = new_map
            commit["retired_physical"] = retired
        if app_meta:
            commit["app_meta"] = dict(app_meta)
        if txn is not None:
            # Delta txnAppId/txnVersion: lets idempotent writers dedupe
            # replays via last_committed_epoch
            commit["app"], commit["epoch"] = str(txn[0]), int(txn[1])
        try:
            _publish_commit(table_path, version, commit)
            return version
        except CommitConflict:
            if mode != "append":
                raise
            # rebase: someone else won this version — re-validate against
            # the new table state and claim the next slot (staged files
            # are untouched — physical names are rename-stable, so even a
            # concurrent rename_column cannot invalidate them; the
            # staging dir's vNNN prefix is cosmetic)
            version = latest_version(table_path) + 1
            mapping, retired = _column_mapping(table_path, version - 1)
            # a concurrent rename changes the logical vocabulary: gates,
            # schema, and set_mapping all speak the FRESH names (round-8
            # ADVICE), bridged through the rename-stable physical names
            cur_df = _rebase_logical(df, mapping, stage_mapping)
            _check_append_schema(
                cur_df, table_path, version - 1, schema_evolution=schema_evolution
            )
            _check_constraints(cur_df, table_path, version - 1)
            _check_retired(cur_df, table_path, mapping, retired)
            # phys_pb stays the STAGE-TIME translation (mirrors
            # commit_stream): the hive layout is already baked into the
            # staged files and physical names are rename-stable, so
            # re-translating the caller's logical partition names through
            # the FRESH mapping would mis-resolve after a concurrent
            # rename of an already-renamed partition column — spuriously
            # failing the guard below or (with partition_evolution=True)
            # recording a physical spec the staged files don't have
            prev_pb = _table_partitioning(table_path, version - 1)
            if prev_pb is not None and phys_pb != prev_pb and not partition_evolution:
                raise ValueError(
                    f"append partitioning {partition_by or []} != table "
                    f"partitioning {prev_pb} after concurrent commit"
                )
    raise CommitConflict(
        f"append to {table_path!r} lost the publish race {max_retries} times"
    )


def _table_partitioning(table_path: str, version: int) -> list | None:
    """The table's partition columns at ``version``: the last commit's
    ``partition_by`` since the most recent overwrite ([] = explicitly
    unpartitioned), or None when the table predates partition tracking
    or is empty."""
    ck = _usable_checkpoint(table_path, version)
    ck_v = ck[0] if ck is not None else -1
    for v, path in reversed(_commit_files(table_path)):
        if v > version:
            continue
        if v <= ck_v:
            break
        c = _read_commit(path)
        pb = c.get("partition_by", [])
        if pb or c["mode"] == "overwrite":
            return list(pb)
        if any("add" in a for a in c["actions"]):
            return list(pb)
    if ck is not None:
        pb = ck[1].get("partition_by")
        return list(pb) if pb is not None else None
    return None


def _parse_hive_path(rel_under_stage: str) -> dict | None:
    """``col=value`` directory segments → partitionValues dict (Spark's
    hive-style layout; values are percent-escaped, null is the hive
    default-partition sentinel). None when the path has no partition
    directories."""
    from urllib.parse import unquote

    segs = rel_under_stage.split(os.sep)[:-1]
    if not segs:
        return None
    pv: dict = {}
    for s in segs:
        if "=" not in s:
            return None
        k, _, v = s.partition("=")
        pv[unquote(k)] = None if v == _HIVE_NULL else unquote(v)
    return pv or None


def _stage_data(
    df: DataFrame, table_path: str, version: int, partition_by: list[str] | None = None
) -> list[tuple[str, dict | None]]:
    """Write the data files into a fresh staging subdirectory; return
    (relative parquet path, partitionValues) per file."""
    stage = os.path.join(table_path, f"v{version:06d}-{uuid.uuid4().hex[:8]}")
    dir_cols: list[str] = []
    for spec in partition_by or []:
        t = _parse_partition_spec(spec)
        if t is None:
            dir_cols.append(spec)
            continue
        kind, src, param, name = t
        if src not in df.columns:
            raise ValueError(f"partition transform {spec!r}: no column {src!r}")
        if name in df.columns:
            raise ValueError(
                f"partition transform {spec!r} derives column {name!r}, "
                "which already exists in the data"
            )
        # the derived value names the hive directory only — partitionBy
        # drops it from the files, the SOURCE column stays in the data
        df = df.withColumn(name, _transform_column(df, kind, src, param))
        dir_cols.append(name)
    writer = df.write.mode("errorifexists")
    if dir_cols:
        writer = writer.partitionBy(*dir_cols)
    writer.parquet(stage)
    base = os.path.basename(stage)
    out: list[tuple[str, dict | None]] = []
    for dp, _, fns in os.walk(stage):
        for fn in fns:
            if not fn.endswith(".parquet"):
                continue
            rel_under = os.path.relpath(os.path.join(dp, fn), stage)
            out.append((os.path.join(base, rel_under), _parse_hive_path(rel_under)))
    return sorted(out)


def _publish_commit(table_path: str, version: int, commit: dict) -> None:
    """The atomic publish step shared by every writer: write the JSON to
    a tmp name, fsync, then CLAIM the numbered slot with ``os.link`` —
    which fails (EEXIST) if any other writer got there first, unlike
    ``os.rename``'s silent replace, closing the check-then-rename race.
    Raises :class:`CommitConflict` on a lost claim."""
    os.makedirs(_log_dir(table_path), exist_ok=True)
    tmp = os.path.join(
        _log_dir(table_path), f".{version:06d}-{uuid.uuid4().hex[:8]}.json.tmp"
    )
    final = os.path.join(_log_dir(table_path), f"{version:06d}.json")
    with open(tmp, "w") as fh:
        json.dump(commit, fh)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, final)
    except FileExistsError:
        raise CommitConflict(
            f"version {version} already committed by a concurrent writer"
        ) from None
    finally:
        os.unlink(tmp)
    if version > 0 and version % _CHECKPOINT_INTERVAL == 0:
        # the commit is already durable — a checkpoint failure must not
        # make the caller believe the commit failed (it would re-commit);
        # checkpoints are derived data, the next interval retries anyway
        try:
            checkpoint_log(table_path, version)
        except Exception:
            import warnings

            warnings.warn(
                f"checkpoint at version {version} of {table_path!r} failed; "
                "readers fall back to longer log replay",
                RuntimeWarning,
                stacklevel=2,
            )


def _live_adds(table_path: str, version: int) -> tuple[dict[str, dict], set]:
    """(live file → its add action {stats, pv}, distinct schema JSONs of
    the commits whose files are still live) at ``version`` — the schema
    set tells readers whether the live files span an additive
    evolution."""
    live: dict[str, dict] = {}
    ck = _usable_checkpoint(table_path, version)
    ck_v = -1
    if ck is not None:
        ck_v, state = ck
        for f, slim in state["adds"].items():
            live[f] = {
                "stats": slim.get("stats", {}),
                "pv": slim.get("pv"),
                "bloom": slim.get("bloom"),
                "n": slim.get("n"),
                "schema": slim.get("schema"),
                "dvs": list(slim.get("dvs", [])),
                "dv_f": slim.get("dv_f"),
            }
    for v, path in _commit_files(table_path):
        if v <= ck_v:
            continue
        if v > version:
            break
        commit = _read_commit(path)
        for a in commit["actions"]:
            if "add" in a:
                live[a["add"]] = {
                    "stats": a.get("stats", {}),
                    "pv": a.get("pv"),
                    "bloom": a.get("bloom"),
                    # per-file row count (round 8) — lets clone/metadata
                    # consumers sum rows without any footer fetch
                    "n": a.get("n"),
                    # per-add schema_json wins (shallow clones preserve the
                    # source's per-file owner schema through the one clone
                    # commit); otherwise the committing schema owns the file
                    "schema": a.get("schema_json") or commit.get("schema"),
                    # deletion vectors re-attach on restore/clone adds; a
                    # plain re-add (rewrite) starts clean
                    "dvs": list(a.get("dvs", [])),
                    # the file key the DV sidecar rows carry — differs from
                    # the add key only for clone references (absolute adds
                    # keep the source's relative sidecar key)
                    "dv_f": a.get("dv_f"),
                }
            elif "dv" in a:
                d = a["dv"]
                if d["for"] in live:
                    live[d["for"]]["dvs"].append(
                        {"paths": d["paths"], "n": d["n"]}
                    )
            elif "stats_update" in a:
                # stats backfill (compute_stats): attach/refresh skipping
                # metadata on an EXISTING live file — no data movement
                u = a["stats_update"]
                if u["for"] in live:
                    info = live[u["for"]]
                    if u.get("stats"):
                        info["stats"] = {**(info.get("stats") or {}), **u["stats"]}
                    if u.get("bloom"):
                        info["bloom"] = {**(info.get("bloom") or {}), **u["bloom"]}
                    if u.get("n") is not None and info.get("n") is None:
                        info["n"] = u["n"]
            else:
                del live[a["remove"]]
    return live, {i["schema"] for i in live.values() if i["schema"] is not None}


def _live_files(table_path: str, version: int) -> list[str]:
    return sorted(_live_adds(table_path, version)[0])


def _is_temporal(bound) -> bool:
    import datetime

    return isinstance(bound, (datetime.date, datetime.datetime))


def _bound_str(v) -> object:
    """Caller-native prune bound → the log's JSON representation (ISO
    strings for temporal types; space-normalized so timestamp partition
    values like '2024-01-01 00:00:00' compare too)."""
    import datetime

    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
    return v


def _spark_cast_str(v) -> str | None:
    """``v`` formatted as Spark's CAST(x AS STRING) would render it — the
    exact bytes the distributed write-side harvest hashed into blooms and
    bucket() partition values, so the driver-side probe hashes the SAME
    string. Spark trims trailing zeros from a timestamp's fractional
    seconds and drops the dot entirely at .000000 ('…00:00:00.5', not
    Python isoformat's '…00:00:00.500000' — round-8 ADVICE: the mismatch
    silently pruned files containing the matching row). Returns None for
    values whose Spark rendering is session-dependent (tz-aware
    datetimes) — the caller keeps the file, staying conservative."""
    import datetime

    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            return None  # session-timezone dependent rendering
        s = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            s += (".%06d" % v.microsecond).rstrip("0")
        return s
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def _canon_frac(s: str) -> str:
    """Canonicalize a temporal string's fractional seconds: trim trailing
    zeros, drop an empty fraction — so '…00:00:00.500000' (Python
    isoformat) and '…00:00:00.5' (Spark cast) compare equal. Trimmed
    fractions stay lexicographically monotonic (absent digits read as
    zeros, and a trimmed fraction never ends in '0'), so range pruning
    over stats strings is unaffected."""
    if "." not in s:
        return s
    head, _, frac = s.rpartition(".")
    if not frac.isdigit():
        return s
    frac = frac.rstrip("0")
    return f"{head}.{frac}" if frac else head


def _typed_value(s: str, bound) -> object:
    """A pv/stats STRING coerced to the prune bound's comparison domain:
    numeric bounds compare numerically, temporal bounds by
    separator-normalized ISO string, everything else as RAW strings.
    The T→space normalization applies ONLY when the caller's bound is a
    date/datetime — mangling ordinary strings is non-monotonic ('CAT'
    would sort as 'CA ') and silently prunes files containing matching
    rows, the worst lakehouse read-path failure (round-7 ADVICE)."""
    if isinstance(bound, bool):
        return s.lower() == "true"
    if isinstance(bound, int) and not isinstance(bound, bool):
        try:
            return int(s)
        except ValueError:
            return float(s)
    if isinstance(bound, float):
        return float(s)
    if _is_temporal(bound):
        return _canon_frac(str(s).replace("T", " "))
    return str(s)


_TRANSFORM_RE = None  # compiled lazily below


def _parse_partition_spec(spec: str):
    """An Iceberg-style HIDDEN-PARTITIONING spec → ``(kind, src, param,
    dir_name)``, or None for a plain identity column. Supported:
    ``days(col)`` / ``hours(col)`` / ``months(col)`` (temporal
    bucketing), ``bucket(N, col)`` (crc32 hash mod N), ``truncate(W,
    col)`` (string prefix / integer floor-to-width). The data column
    STAYS in the data files; the derived value only names the hive
    directory and the recorded partitionValue — so queries predicate on
    the source column and the log prunes through the transform
    (``read_version`` ``prune=``/``prune_eq=``), the Iceberg pitch: no
    ``WHERE event_date = ...`` double-predicates, no partition column
    leaking into the schema."""
    global _TRANSFORM_RE
    import re

    if _TRANSFORM_RE is None:
        _TRANSFORM_RE = re.compile(
            r"^\s*(days|hours|months|bucket|truncate)\s*\(\s*"
            r"(?:(\d+)\s*,\s*)?(\w+)\s*\)\s*$"
        )
    m = _TRANSFORM_RE.match(spec)
    if m is None:
        if "(" in spec:
            raise ValueError(
                f"unknown partition transform {spec!r} — supported: "
                "days(col), hours(col), months(col), bucket(N,col), "
                "truncate(W,col), or a plain column name"
            )
        return None
    kind, param, src = m.group(1), m.group(2), m.group(3)
    if kind in ("bucket", "truncate"):
        if not param:
            raise ValueError(f"{kind} transform needs a width: {kind}(N,{src})")
        param = int(param)
        if param <= 0:
            raise ValueError(f"{kind} width must be positive in {spec!r}")
        name = f"{src}__{'bucket' if kind == 'bucket' else 'trunc'}{param}"
    else:
        if param:
            raise ValueError(f"{kind} transform takes one argument: {kind}({src})")
        param = None
        name = f"{src}__{kind[:-1]}"  # days -> __day etc.
    return kind, src, param, name


def _transform_column(df: DataFrame, kind: str, src: str, param) -> Column:
    """The Spark Column computing a partition transform at write time —
    pure built-in expressions, codegen'd, no UDF."""
    c = F.col(src)
    if kind == "days":
        return F.datediff(c.cast("date"), F.to_date(F.lit("1970-01-01")))
    if kind == "hours":
        return F.floor(
            F.unix_micros(c.cast("timestamp")) / F.lit(3_600_000_000)
        ).cast("long")
    if kind == "months":
        return (F.year(c) - F.lit(1970)) * F.lit(12) + F.month(c) - F.lit(1)
    if kind == "bucket":
        # crc32 over the utf-8 of Spark's string cast — reproducible
        # driver-side with zlib.crc32 for manifest-only pruning; pmod
        # keeps the executor and driver on the same residue class
        return F.pmod(F.crc32(F.encode(c.cast("string"), "UTF-8")), F.lit(param))
    if kind == "truncate":
        dt = dict(df.dtypes).get(src, "string")
        if dt in ("tinyint", "smallint", "int", "bigint"):
            return c - F.pmod(c, F.lit(param))  # floor-to-width, Iceberg ints
        return F.substring(c, 1, param)
    raise ValueError(f"unknown transform kind {kind!r}")


def _transform_value(kind: str, v, param):
    """Driver-side twin of :func:`_transform_column` for prune bounds.
    Returns None when the bound's type cannot be mapped (the caller then
    keeps the file — pruning stays conservative)."""
    import datetime
    import zlib

    if kind == "days":
        if isinstance(v, datetime.datetime):
            v = v.date()
        if isinstance(v, datetime.date):
            return (v - datetime.date(1970, 1, 1)).days
        return None
    if kind == "hours":
        if isinstance(v, datetime.datetime):
            return int((v - datetime.datetime(1970, 1, 1)).total_seconds() // 3600)
        if isinstance(v, datetime.date):
            return (v - datetime.date(1970, 1, 1)).days * 24
        return None
    if kind == "months":
        if isinstance(v, (datetime.date, datetime.datetime)):
            return (v.year - 1970) * 12 + v.month - 1
        return None
    if kind == "bucket":
        if isinstance(v, bool) or not isinstance(v, (int, str, datetime.date)):
            return None  # bucket prunes int/string/temporal point lookups only
        s = _spark_cast_str(v)  # the exact bytes F.crc32 hashed at write
        return None if s is None else zlib.crc32(s.encode("utf-8")) % param
    if kind == "truncate":
        if isinstance(v, bool):
            return None
        if isinstance(v, int):
            return v - (v % param)  # Python % is floor-mod, matching pmod
        if isinstance(v, str):
            return v[:param]
        return None
    return None


_MANGLED_RE = None


def _parse_mangled(pv_key: str):
    """Invert a transform dir name back to ``(kind, src, param)`` —
    ``ts__day`` → ('days','ts',None), ``uid__bucket16`` →
    ('bucket','uid',16) — or None for identity partition values. Lets
    :func:`_may_match` prune each file against ITS OWN recorded
    transform, so PARTITION EVOLUTION (files written under different
    specs coexisting in one table, the Iceberg model) needs no central
    spec registry: the manifest key carries the spec."""
    global _MANGLED_RE
    import re

    if _MANGLED_RE is None:
        _MANGLED_RE = re.compile(
            r"^(.+)__(?:(day|hour|month)|(bucket|trunc)(\d+))$"
        )
    m = _MANGLED_RE.match(pv_key)
    if m is None:
        return None
    src = m.group(1)
    if m.group(2):
        return {"day": "days", "hour": "hours", "month": "months"}[m.group(2)], src, None
    kind = "bucket" if m.group(3) == "bucket" else "truncate"
    return kind, src, int(m.group(4))


def _column_mapping(table_path: str, version: int) -> tuple[dict, list]:
    """(logical name → physical name, retired physical names) in force
    at ``version``. ``({}, [])`` means the table has never renamed or
    dropped a column — identity semantics, and every mapping-aware code
    path stays zero-cost. Once active, the latest ``set_mapping``
    metadata action (each carries the FULL map) wins; checkpoints store
    the state so resolution replays checkpoint + tail like every other
    metadata read."""
    ck = _usable_checkpoint(table_path, version)
    ck_v = ck[0] if ck is not None else -1
    for v, path in reversed(_commit_files(table_path)):
        if v > version:
            continue
        if v <= ck_v:
            break
        c = _read_commit(path)
        if "set_mapping" in c:
            return dict(c["set_mapping"]), list(c.get("retired_physical", []))
    if ck is not None and "column_mapping" in ck[1]:
        return (
            dict(ck[1]["column_mapping"]),
            list(ck[1].get("retired_physical", [])),
        )
    return {}, []


def _to_physical(df: DataFrame, mapping: dict) -> DataFrame:
    """Rename a LOGICAL frame's columns to their stable physical names
    for staging. Columns outside the mapping (brand-new logical columns
    an evolving append introduces) keep their names — the caller records
    them into the mapping."""
    if not mapping:
        return df
    return df.select(
        *[F.col(c).alias(mapping.get(c, c)) for c in df.columns]
    )


def _phys_cols(cols, mapping: dict) -> list:
    return [mapping.get(c, c) for c in (cols or [])]


def _rebase_logical(df: DataFrame, fresh: dict, stage: dict) -> DataFrame:
    """Project a frame whose files were staged under mapping ``stage``
    to the logical names in force under ``fresh``, bridged through the
    stable physical names: a column renamed by a CONCURRENT commit shows
    up under its NEW name, so the rebased publish's schema, constraint
    checks, and set_mapping all speak the current logical vocabulary —
    a stale name would silently revert the rename ('latest set_mapping
    wins') and union the old name back into the table schema (round-8
    ADVICE). Columns unknown to both mappings keep their names."""
    inv = {p: l for l, p in fresh.items()}
    names = {c: inv.get(stage.get(c, c), c) for c in df.columns}
    if all(c == n for c, n in names.items()):
        return df
    return df.select(*[F.col(c).alias(n) for c, n in names.items()])


def _phys_specs(partition_by, mapping: dict) -> list:
    """Translate partition specs (identity columns or transforms) from
    logical to physical source names. Stored commit partition_by is
    always PHYSICAL — physical names never change, so specs recorded
    before a rename stay valid forever."""
    if not mapping:
        return list(partition_by or [])
    out = []
    for spec in partition_by or []:
        t = _parse_partition_spec(spec)
        if t is None:
            out.append(mapping.get(spec, spec))
        else:
            kind, src, param, _ = t
            p = mapping.get(src, src)
            if kind in ("bucket", "truncate"):
                out.append(f"{kind}({param},{p})")
            else:
                out.append(f"{kind}({p})")
    return out


def _norm_range_prunes(prune) -> list[tuple]:
    """``prune=`` → a list of (col, lo, hi) specs: one tuple, or a list
    of tuples (conjunction)."""
    if prune is None:
        return []
    if prune and isinstance(prune[0], (list, tuple)):
        return [tuple(p) for p in prune]
    return [tuple(prune)]


def _norm_eq_prunes(prune_eq) -> list[tuple[str, list]]:
    """``prune_eq=`` → a list of (col, [candidate values]) specs: one
    (col, value) tuple or a list of them; a value that is itself a
    list/tuple/set is an IN-list."""
    if prune_eq is None:
        return []
    specs = (
        [tuple(p) for p in prune_eq]
        if isinstance(prune_eq, list)
        else [tuple(prune_eq)]
    )
    out = []
    for col, v in specs:
        vs = list(v) if isinstance(v, (list, tuple, set)) else [v]
        if not vs:
            raise ValueError(f"empty IN-list for prune_eq column {col!r}")
        out.append((col, vs))
    return out


def _apply_prune_filters(df: DataFrame, ranges, eqs) -> DataFrame:
    """The residual row filters matching the manifest skips — pruning
    decides which FILES open, these decide which ROWS survive. NULL
    candidates use isNull (equality with NULL is three-valued and would
    drop every row)."""
    for col, lo, hi in ranges:
        df = df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
    for col, vs in eqs:
        non_null = [v for v in vs if v is not None]
        cond = None
        if non_null:
            cond = (
                F.col(col) == F.lit(non_null[0])
                if len(non_null) == 1
                else F.col(col).isin(non_null)
            )
        if len(non_null) < len(vs):  # a None candidate: IS NULL matches
            cond = F.col(col).isNull() if cond is None else cond | F.col(col).isNull()
        df = df.filter(cond)
    return df


def _may_match(add: dict, col: str, lo, hi) -> bool:
    """Log-level skip decision for one file: partitionValues give an
    exact point interval; stats give [min, max]; missing both means
    may-match. Entirely from the manifest — zero file opens."""
    lo_b, hi_b = _bound_str(lo), _bound_str(hi)
    pv = add.get("pv") or {}
    if col in pv:
        v = pv[col]
        if v is None:
            return False  # a range predicate never matches NULL
        tv = _typed_value(v, lo)
        return not (tv < _typed_value(str(lo_b), lo) or tv > _typed_value(str(hi_b), hi))
    # hidden partitioning: prune through each TRANSFORM the file itself
    # recorded (the pv KEY names the spec — ``ts__day=19784`` — so files
    # written under different partition specs each prune by their own,
    # the Iceberg partition-evolution model). Monotonic transforms admit
    # range pruning (the file's single transform value must fall in
    # [T(lo), T(hi)]); bucket only answers point lookups (lo == hi).
    # Unmappable bound types keep the file.
    for name, v in pv.items():
        t = _parse_mangled(name)
        if t is None or t[1] != col:
            continue
        kind, _, param = t
        if v is None:
            return False  # all rows have NULL col — no range/point match
        if kind == "bucket":
            if lo == hi:
                tv = _transform_value(kind, lo, param)
                if tv is not None and int(v) != tv:
                    return False
            continue
        t_lo, t_hi = _transform_value(kind, lo, param), _transform_value(kind, hi, param)
        if t_lo is None or t_hi is None:
            continue
        fv = v if isinstance(t_lo, str) else int(v)
        if fv < t_lo or fv > t_hi:
            return False
    s = (add.get("stats") or {}).get(col)
    if s is None or s[0] is None or s[1] is None:
        return True
    if isinstance(lo_b, str):
        # temporal bounds normalize both separators and fractional-second
        # trailing zeros (trimmed fractions stay order-preserving); plain
        # strings compare raw (round-7 ADVICE: no mangling of ordinary data)
        norm = (
            (lambda x: _canon_frac(str(x).replace("T", " ")))
            if _is_temporal(lo)
            else str
        )
        return not (norm(s[1]) < norm(lo_b) or norm(s[0]) > norm(hi_b))
    return not (s[1] < lo_b or s[0] > hi_b)


def version_as_of(table_path: str, ts) -> int:
    """The version a timestamp resolves to — the latest commit whose
    recorded commit time is ≤ ``ts`` (datetime or epoch micros int):
    Delta's ``AS OF TIMESTAMP`` rule. Commits predating timestamp
    tracking count as always-eligible. Raises if ``ts`` is before the
    first commit."""
    import datetime

    if isinstance(ts, datetime.datetime):
        ts = int(ts.timestamp() * 1_000_000)
    best = None
    ck = _usable_checkpoint(table_path, latest_version(table_path))
    ck_v = -1
    if ck is not None and "ts" in ck[1]:
        # the checkpoint's commit-time index answers everything at or
        # below it — only the tail commits are opened
        ck_v = ck[0]
        for vs, t in ck[1]["ts"].items():
            if t <= ts and (best is None or int(vs) > best):
                best = int(vs)
    for v, path in _commit_files(table_path):
        if v <= ck_v:
            continue
        c = _read_commit(path)
        if c.get("ts_us", 0) <= ts:
            best = v
    if best is None:
        raise ValueError(
            f"timestamp {ts} predates the first commit of {table_path!r}"
        )
    return best


def first_version_at_or_after(table_path: str, ts) -> int:
    """The earliest version whose commit time is ≥ ``ts`` (datetime or
    epoch micros int) — Delta's inclusive ``startingTimestamp`` rule for
    streaming reads. A ``ts`` before the first commit resolves to
    version 0 (the whole table streams); a ``ts`` after the last commit
    resolves to ``latest + 1`` (the stream starts empty and picks up
    future commits). Commits predating timestamp tracking are treated
    as always-before ``ts``."""
    import datetime

    if isinstance(ts, datetime.datetime):
        ts = int(ts.timestamp() * 1_000_000)
    latest = latest_version(table_path)
    best = None
    ck = _usable_checkpoint(table_path, latest)
    ck_v = -1
    if ck is not None and "ts" in ck[1]:
        ck_v = ck[0]
        for vs, t in ck[1]["ts"].items():
            if t >= ts and (best is None or int(vs) < best):
                best = int(vs)
    if best is None:
        # nothing at-or-after ts at or below the checkpoint (or no
        # usable commit-time index) — scan tail commits, earliest wins
        for v, path in _commit_files(table_path):
            if v <= ck_v:
                continue
            c = _read_commit(path)
            if c.get("ts_us", 0) >= ts:
                best = v
                break
    return latest + 1 if best is None else best


def read_version(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    *,
    as_of=None,
    prune: tuple[str, object, object] | None = None,
    prune_eq: tuple[str, object] | None = None,
    _provenance: str | None = None,
) -> DataFrame:
    """Read the table as of ``version`` (default: latest) — time travel.
    The file list comes from the log replay, never a directory listing,
    so concurrent staged-but-uncommitted writes are invisible. Versions
    truncated by :func:`vacuum` raise a clear error instead of failing
    mid-scan on missing files.

    ``prune=(col, lo, hi)`` applies log-level data skipping BEFORE any
    file opens: partition values first (a partitioned column prunes
    whole partitions straight from the manifest — the coarse skip every
    lakehouse query starts with), then commit-time [min, max] stats
    (files without either are kept — missing metadata means may-match),
    plus the matching row filter on top, so the result equals an
    unpruned read filtered to the range. At 100 TB this is the
    difference between a footer fetch per file and none at all — the
    manifest alone answers which files matter.

    ``prune_eq=(col, value)`` is the POINT-lookup skip: partition values
    answer exactly, commit-time bloom bitmaps (``bloom_cols=``) answer
    membership with no false negatives, min/max stats bound the range —
    still zero file opens — plus the equality row filter on top.
    Composable with ``prune=``. ``value=None`` is the IS NULL lookup
    (recorded null counts skip zero-null files). Round 9: both accept
    LISTS of specs (conjunction across columns), and a ``prune_eq``
    value may itself be a list/tuple/set — an IN-list, keeping a file
    if ANY candidate may match (the batched point-lookup shape).

    ``as_of`` (datetime or epoch micros) resolves to a version by commit
    time — Delta's ``AS OF TIMESTAMP`` — mutually exclusive with
    ``version``.

    Partitioned tables reconstruct the partition columns from the
    recorded ``pv`` (the data files don't carry them), cast per the
    committed schema — one scan per live partition value, unioned;
    Catalyst folds the literals, so the plan stays a plain multi-path
    scan.

    Deletion vectors (round 8): live files carrying DV sidecars (from
    merge-on-read :func:`delete_where`/:func:`update_where`) are masked
    by ONE anti-join on ``(file, row_index)`` — scan-time
    ``_metadata.row_index`` provenance against the union of the live
    sidecar rows, zero data rewritten at delete time, the Delta/Iceberg
    merge-on-read read path. ``_provenance`` (internal) keeps the
    scan-time lineage columns: 'file' adds ``__file`` (the source file
    URI — survives joins, unlike ``input_file_name`` which is undefined
    after a shuffle), 'pos' adds ``__file`` + ``__row_idx``."""
    if as_of is not None:
        if version is not None:
            raise ValueError("pass version= or as_of=, not both")
        version = version_as_of(table_path, as_of)
    if version is None:
        version = latest_version(table_path)
    if version < 0:
        raise ValueError(f"no commits at {table_path!r}")
    wm = _vacuum_watermark(table_path)
    if version < wm:
        raise ValueError(
            f"version {version} of {table_path!r} was vacuumed; earliest "
            f"readable version is {wm}"
        )
    adds, schemas = _live_adds(table_path, version)
    if not adds:
        raise ValueError(f"version {version} of {table_path!r} has no live files")
    files = sorted(adds)
    # column mapping: the manifest (pv/stats/blooms) and the data files
    # are keyed by stable PHYSICAL names; callers speak logical. Resolve
    # once; {} = never renamed/dropped, every translation is identity.
    mapping, _retired = _column_mapping(table_path, version)
    # multi-predicate pruning (round 9): prune= accepts one (col, lo, hi)
    # or a LIST of them (conjunction — a file survives only if every
    # range may match); prune_eq= accepts one (col, value), a list of
    # them, and/or an IN-list value (tuple/set/list — a file survives if
    # ANY candidate may match that column). Real point-lookup batches
    # predicate on several columns at once; each extra predicate is
    # another manifest-only intersection, zero file opens.
    ranges = _norm_range_prunes(prune)
    eqs = _norm_eq_prunes(prune_eq)
    for col, lo, hi in ranges:
        pcol = mapping.get(col, col)
        files = [f for f in files if _may_match(adds[f], pcol, lo, hi)]
    for eq_col, eq_vs in eqs:
        pcol = mapping.get(eq_col, eq_col)
        files = [
            f
            for f in files
            if any(_may_match_eq(adds[f], pcol, v) for v in eq_vs)
        ]
    if (ranges or eqs) and not files:
        empty = read_version(spark, table_path, version).filter(F.lit(False))
        return _apply_prune_filters(empty, ranges, eqs)
    schema = table_schema(table_path, version)
    types = {f.name: f.dataType for f in schema.fields} if schema else {}
    if mapping:
        # the assembled frame is PHYSICAL until the projection below;
        # pv reattachment and casts therefore key by physical name
        types = {mapping.get(n, n): t for n, t in types.items()}
    # reader strategy over the live files:
    # - one committed schema: plain read, zero extra footer work
    # - several schemas, same types: mergeSchema (additive evolution)
    # - several schemas with a TYPE conflict (type widening, round 9):
    #   hand the readers the WIDE physical requested schema — Spark's
    #   parquet readers promote narrow files natively (int32->int64,
    #   float->double) and null-fill absent columns, so widened tables
    #   read without rewriting a single old file
    reader, widened = spark.read, False
    if len(schemas) > 1:
        from pyspark.sql import types as T

        seen_t: dict[str, object] = {}
        for sj in schemas:
            for f in T.StructType.fromJson(json.loads(sj)).fields:
                if seen_t.setdefault(f.name, f.dataType) != f.dataType:
                    widened = True
        # recorded add schemas carry the LOGICAL names of their commit
        # era, so a widen straddling a rename is invisible to the
        # name-keyed conflict check — under column mapping the requested
        # physical schema is the robust read for any multi-schema table
        if mapping:
            widened = True
        if widened and schema is not None:
            phys = T.StructType(
                [
                    T.StructField(mapping.get(f.name, f.name), f.dataType, True)
                    for f in schema.fields
                ]
            )
            reader = spark.read.schema(phys)
        else:
            reader = spark.read.option("mergeSchema", "true")

    def _with_pv(df: DataFrame, pv: dict) -> DataFrame:
        for c, v in pv.items():
            if types and c not in types:
                continue  # transform dir value (hidden partitioning) —
                # the source column is in the data files; the derived
                # value is manifest metadata, not a table column
            lit = F.lit(v) if v is not None else F.lit(None)
            df = df.withColumn(c, lit.cast(types.get(c, "string")))
        return df

    dv_files = [f for f in files if adds[f].get("dvs")]
    need_pos = _provenance in ("file", "pos") or bool(dv_files)

    def _attach_pos(g: DataFrame) -> DataFrame:
        # scan-time row identity: survives every later join
        return g.select(
            "*",
            F.col("_metadata.file_path").alias("__fp"),
            F.col("_metadata.row_index").alias("__ri"),
        )

    groups: dict[tuple, list[str]] = {}
    for f in files:
        pv = adds[f].get("pv")
        key = tuple(sorted(pv.items())) if pv else ()
        groups.setdefault(key, []).append(f)
    parts = []
    # a widened table always takes the literal-pv path: the requested
    # wide schema and hive partition discovery don't compose (discovery
    # wants partition columns outside the data schema)
    literal_path = widened or len(groups) <= _MAX_LITERAL_PV_GROUPS
    # literal-path reads always REQUEST the committed physical schema:
    # a plain spark.read.parquet per pv-group costs one driver footer
    # fetch per group for schema inference (measured ~70 ms × groups on
    # a warm probe; a real remote-store round trip per group at scale),
    # while the log already knows the schema. Parquet readers null-fill
    # absent columns and promote narrow types natively, so this is the
    # same mechanism the widened path has always relied on. Data files
    # never contain pv columns — they reattach as literals below —
    # so the requested schema excludes them. The hive-discovery branch
    # keeps inference (an explicit schema and partition discovery don't
    # compose).
    lit_reader = reader
    if literal_path and schema is not None:
        from pyspark.sql import types as T

        # pv keys are PHYSICAL names — compare against the requested
        # physical name, not the logical one (under column mapping a
        # data column's logical name may coincide with a pv column's
        # physical name; filtering on f.name would silently drop it)
        pv_names = {c for f in files for c in (adds[f].get("pv") or {})}
        lit_reader = spark.read.schema(
            T.StructType(
                [
                    T.StructField(mapping.get(f.name, f.name), f.dataType, True)
                    for f in schema.fields
                    if mapping.get(f.name, f.name) not in pv_names
                ]
            )
        )
    if literal_path:
        # one scan per live partition-value combination, pv columns
        # reattached as folded literals — the zero-inference path
        # (null partition values sort last in the deterministic order)
        for key in sorted(
            groups, key=lambda k: [(c, v is None, v or "") for c, v in k]
        ):
            g = lit_reader.parquet(*[os.path.join(table_path, f) for f in groups[key]])
            if need_pos:
                g = _attach_pos(g)
            if key:
                g = _with_pv(g, dict(key))
            parts.append(g)
    else:
        # High-cardinality partitioning: a scan per pv combination would
        # build tens of thousands of plan nodes. Group by STAGING
        # DIRECTORY instead (≤ one per commit, vastly fewer than pv
        # combos) and let Spark's native hive-partition discovery
        # reconstruct the pv columns from the directory names — with
        # type INFERENCE disabled (a value '01' must stay the string
        # '01', exactly like the literal path), then cast per the
        # committed schema. Identical results, bounded plan size.
        stage_groups: dict[str, list[str]] = {}
        for f in files:
            depth = len(adds[f].get("pv") or {})
            full = f if os.path.isabs(f) else os.path.join(table_path, f)
            root = full
            for _ in range(depth + 1):
                root = os.path.dirname(root)
            stage_groups.setdefault(root, []).append(full)
        infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
        old_infer = spark.conf.get(infer_key)
        spark.conf.set(infer_key, "false")
        try:
            for root in sorted(stage_groups):
                g = reader.option("basePath", root).parquet(*sorted(stage_groups[root]))
                if need_pos:
                    g = _attach_pos(g)
                parts.append(g)
        finally:
            spark.conf.set(infer_key, old_infer)
    # balanced-tree union (optimization round 16): every DataFrame op
    # eagerly re-analyzes its whole tree, so a left-deep fold over n
    # parts costs O(n²) analysis on the driver; pairing halves per
    # round keeps it O(n log n). Row order across parts is not a table
    # contract (partitioning-invariance pins), and the part sequence is
    # unchanged anyway — only the union tree's shape differs.
    while len(parts) > 1:
        parts = [
            parts[i].unionByName(parts[i + 1], allowMissingColumns=True)
            if i + 1 < len(parts)
            else parts[i]
            for i in range(0, len(parts), 2)
        ]
    df = parts[0]
    if not literal_path:
        # inferred pv columns arrive as strings — cast to committed
        # types; transform dir columns (hidden partitioning) are not
        # table columns and leave the frame here
        pv_names = {c for f in files for c in (adds[f].get("pv") or {})}
        for c in pv_names:
            if c in types:
                df = df.withColumn(c, F.col(c).cast(types[c]))
            else:
                df = df.drop(c)
    if mapping:
        # physical → logical projection: rename mapped columns into the
        # committed logical schema (order-preserving), drop retired
        # physicals, keep scan-time provenance columns
        order = schema.names if schema else sorted(mapping)
        df = df.select(
            *[
                F.col(mapping.get(l, l)).alias(l)
                for l in order
                if mapping.get(l, l) in df.columns
            ],
            *[c for c in ("__fp", "__ri") if c in df.columns],
        )
    if schema and any(groups):  # pv columns were appended — restore order
        ordered = [c for c in schema.names if c in df.columns]
        df = df.select(*ordered, *[c for c in df.columns if c not in ordered])
    if dv_files:
        df = _apply_dvs(spark, table_path, df, adds, files, dv_files)
    df = _apply_prune_filters(df, ranges, eqs)
    if _provenance is None:
        if need_pos:
            df = df.drop("__fp", "__ri")
    elif _provenance == "file":
        df = df.withColumnRenamed("__fp", "__file").drop("__ri")
    elif _provenance == "pos":
        df = df.withColumnRenamed("__fp", "__file").withColumnRenamed(
            "__ri", "__row_idx"
        )
    else:
        raise ValueError(f"_provenance={_provenance!r} (file|pos)")
    return df


def _dv_key(add_key: str, info: dict) -> str:
    """The key a file's DV sidecar rows carry: the original committed
    key — differs from the live add key only for shallow-clone
    references (absolute adds keep the source's relative sidecar key)."""
    return info.get("dv_f") or add_key


def _suffix_segments(adds: dict[str, dict], files: list[str]) -> int:
    """How many trailing path segments identify a file: the staging
    directory (unique uuid per commit) + the hive partition directories
    + the filename. Uniform across a live set (partitioning is enforced
    per table)."""
    depths = {len(adds[f].get("pv") or {}) for f in files}
    if len(depths) != 1:
        raise ValueError(
            "live files span mixed partition depths — cannot map deletion "
            "vectors by path suffix"
        )
    return 2 + depths.pop()


def _disk_suffix(path: str, n_seg: int) -> str:
    """Driver-side join key for a file: its last ``n_seg`` ON-DISK path
    segments, with '+' mapped to space — the exact image of the Spark
    side's URI-encode-then-url_decode round trip (percent-escapes
    restore verbatim; a literal '+' survives URI encoding and form
    decoding turns it into a space on both sides)."""
    return "/".join(path.split(os.sep)[-n_seg:]).replace("+", " ")


def _spark_suffix(n_seg: int) -> Column:
    """The matching executor-side key from ``__fp`` (a URI-encoded
    ``_metadata.file_path``): slice the RAW URI segments (on-disk names
    never contain '/', so encoded slashes can't split), then url_decode
    back to the on-disk form."""
    return F.url_decode(
        F.concat_ws("/", F.slice(F.split(F.col("__fp"), "/"), -n_seg, n_seg))
    )


def _apply_dvs(
    spark: SparkSession,
    table_path: str,
    df: DataFrame,
    adds: dict[str, dict],
    files: list[str],
    dv_files: list[str],
) -> DataFrame:
    """Mask DV-deleted rows: ONE broadcast map from path suffix to DV
    key (the staging uuid makes suffixes globally unique — asserted),
    then ONE anti-join against the union of the live sidecar rows.
    Files without DVs keep a null key and pass the anti-join untouched."""
    n_seg = _suffix_segments(adds, files)
    suffixes = [_disk_suffix(f, n_seg) for f in files]
    if len(set(suffixes)) != len(suffixes):
        raise ValueError(
            "duplicate data-file path suffixes in the live set — cannot "
            "map deletion vectors by file identity"
        )
    mapping = [
        (_disk_suffix(f, n_seg), _dv_key(f, adds[f])) for f in dv_files
    ]
    map_df = spark.createDataFrame(mapping, "__sfx string, __dvkey string")
    dv_paths = sorted(
        {p for f in dv_files for d in adds[f]["dvs"] for p in d["paths"]}
    )
    dv_abs = [p if os.path.isabs(p) else os.path.join(table_path, p) for p in dv_paths]
    dvr = spark.read.parquet(*dv_abs).select(
        F.col("f").alias("__dvkey"), F.col("idx").alias("__ri")
    )
    return (
        df.withColumn("__sfx", _spark_suffix(n_seg))
        .join(F.broadcast(map_df), "__sfx", "left")
        .join(dvr, ["__dvkey", "__ri"], "left_anti")
        .drop("__sfx", "__dvkey")
    )


def compute_stats(
    spark: SparkSession,
    table_path: str,
    stats_cols: list[str],
    *,
    bloom_cols: list[str] | None = None,
    ndv_cols: list[str] | None = None,
    max_retries: int = 10,
) -> int | None:
    """``ANALYZE TABLE … COMPUTE STATISTICS`` — BACKFILL skipping
    metadata onto files already committed without it: harvest per-file
    min/max (and optional bloom bitmaps) for the live files missing
    them, in the same ONE distributed pass commit-time harvesting uses,
    and publish a metadata-only commit of ``stats_update`` actions — no
    data moves, every old commit's files become prunable retroactively.
    Columns are LOGICAL names (translated through column mapping).
    Files immutable ⇒ the stats stay valid under any concurrent commit;
    a lost publish race just re-claims the next slot. Returns the new
    version, or None when nothing was missing."""
    import time

    version = latest_version(table_path)
    if version < 0:
        raise ValueError(f"no table at {table_path!r}")
    mapping, _ = _column_mapping(table_path, version)
    pcols = _phys_cols(stats_cols, mapping)
    pblooms = _phys_cols(bloom_cols, mapping) if bloom_cols else []
    adds, _ = _live_adds(table_path, version)
    need_stats = sorted(
        f
        for f, info in adds.items()
        if any(c not in (info.get("stats") or {}) for c in pcols)
        or info.get("n") is None
    )
    need_bloom = sorted(
        f
        for f, info in adds.items()
        if any(c not in (info.get("bloom") or {}) for c in pblooms)
    ) if pblooms else []
    if not need_stats and not need_bloom and not ndv_cols:
        return None
    file_rows, file_stats = (
        _harvest_stats(spark, table_path, need_stats, pcols)
        if need_stats
        else ({}, {})
    )
    blooms = (
        _compute_blooms(spark, table_path, need_bloom, pblooms)
        if need_bloom
        else {}
    )
    actions = []
    for f in sorted(set(need_stats) | set(need_bloom)):
        u: dict = {"for": f}
        if f in file_stats and file_stats[f]:
            u["stats"] = file_stats[f]
        if f in file_rows:
            u["n"] = file_rows[f]
        if f in blooms:
            u["bloom"] = blooms[f]
        if len(u) > 1:
            actions.append({"stats_update": u})
    ndv: dict[str, int] = {}
    if ndv_cols:
        # TABLE-LEVEL approximate distinct counts via the deterministic
        # HLL sketch (functions/sketches.py) — one bounded-state
        # aggregation per analyzed column over the CURRENT logical view
        # (deletion vectors applied), recorded under the rename-stable
        # PHYSICAL name; surfaced by table_ndv / table_detail
        from avro_diff_spark.functions import sketches as SK

        snap_df = read_version(spark, table_path, version)
        for c in ndv_cols:
            if c not in snap_df.columns:
                raise ValueError(f"unknown ndv column {c!r}")
            est = SK.hll_estimate(SK.hll_registers(snap_df, c)).collect()[0]
            ndv[mapping.get(c, c)] = int(round(SK.hll_corrected_estimate(est)))
    if not actions and not ndv:
        return None
    for _ in range(max(max_retries, 1)):
        v = latest_version(table_path) + 1
        commit = {
            "version": v,
            "mode": "meta",
            "ts_us": int(time.time() * 1_000_000),
            "n_rows": 0,
            "actions": actions,
        }
        if ndv:
            commit["ndv_update"] = ndv
        try:
            _publish_commit(table_path, v, commit)
            return v
        except CommitConflict:
            continue  # files are immutable — the harvested stats stay valid
    raise CommitConflict(
        f"compute_stats on {table_path!r} lost the publish race {max_retries} times"
    )


def _table_ndv_phys(table_path: str, version: int) -> dict[str, int]:
    """The physically-keyed NDV map at ``version``: checkpoint base +
    replay of later ``ndv_update`` commits (latest per column wins) —
    the same O(tail) shape every other metadata replay uses."""
    ndv: dict[str, int] = {}
    ck = _usable_checkpoint(table_path, version)
    ck_v = -1
    if ck is not None:
        ck_v = ck[0]
        ndv.update(ck[1].get("ndv", {}))
    for v, path in _commit_files(table_path):
        if v <= ck_v:
            continue
        if v > version:
            break
        ndv.update(_read_commit(path).get("ndv_update", {}))
    return ndv


def table_ndv(table_path: str, version: int | None = None) -> dict[str, int]:
    """Approximate per-column distinct counts recorded by
    :func:`compute_stats` ``ndv_cols=`` (``ANALYZE TABLE … FOR
    COLUMNS``): column name (current logical) → HLL-estimated NDV as of
    the last analyze. Metadata-only read; keys are stored PHYSICALLY so
    the numbers survive renames."""
    if version is None:
        version = latest_version(table_path)
    mapping, _ = _column_mapping(table_path, version)
    inv = {p: l for l, p in mapping.items()}
    return {
        inv.get(c, c): n for c, n in _table_ndv_phys(table_path, version).items()
    }


def table_detail(table_path: str, version: int | None = None) -> dict:
    """``DESCRIBE DETAIL`` — one driver-side metadata read summarizing
    the table at ``version`` (default latest): version, file/row/byte
    counts (from the manifest's per-add ``n`` and on-disk sizes; zero
    footer opens for round-8+ tables), partitioning spec, recorded
    clustering, CHECK constraints, column names (logical), active
    column-mapping state, deletion-vector count, checkpoint version, and
    the vacuum watermark."""
    if version is None:
        version = latest_version(table_path)
    if version < 0:
        raise ValueError(f"no table at {table_path!r}")
    adds, _ = _live_adds(table_path, version)
    n_dvs = sum(len(i["dvs"]) for i in adds.values())
    n_rows = sum(i.get("n") or 0 for i in adds.values()) - sum(
        d["n"] for i in adds.values() for d in i["dvs"]
    )
    size = 0
    for f in adds:
        p = f if os.path.isabs(f) else os.path.join(table_path, f)
        try:
            size += os.path.getsize(p)
        except OSError:
            pass
    sch = table_schema(table_path, version)
    mapping, retired = _column_mapping(table_path, version)
    cl = _table_clustering_raw(table_path, version)
    ck = _usable_checkpoint(table_path, version)
    return {
        "version": version,
        "num_files": len(adds),
        "num_rows": n_rows,
        "size_bytes": size,
        "num_deletion_vectors": n_dvs,
        "partition_by": _table_partitioning(table_path, version) or [],
        "clustering": (
            {"cols": cl["cols"], "curve": cl["curve"]} if cl else None
        ),
        "columns": [f.name for f in sch.fields] if sch is not None else None,
        "column_mapping_active": bool(mapping),
        "retired_columns": list(retired),
        "constraints": table_constraints(table_path, version),
        "checkpoint_version": ck[0] if ck is not None else None,
        "vacuum_watermark": _vacuum_watermark(table_path),
        "ndv": table_ndv(table_path, version) or None,
    }


def table_history(table_path: str) -> list[dict]:
    """One dict per commit: version, mode, row count, files added/removed
    — the ``DESCRIBE HISTORY`` surface, straight from the log. Versions
    below the vacuum watermark are flagged ``vacuumed`` (their data
    files may be gone; the log entries remain for lineage)."""
    wm = _vacuum_watermark(table_path)
    out = []
    for _, path in _commit_files(table_path):
        c = _read_commit(path)
        out.append(
            {
                "version": c["version"],
                "mode": c["mode"],
                "ts_us": c.get("ts_us"),
                "n_rows": c["n_rows"],
                "n_added": sum(1 for a in c["actions"] if "add" in a),
                "n_removed": sum(1 for a in c["actions"] if "remove" in a),
                "vacuumed": c["version"] < wm,
            }
        )
    return out


def table_files(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """The live file manifest at ``version`` (default latest) as a
    DataFrame — the Iceberg ``.files`` / Delta ``DESCRIBE DETAIL``
    inspection surface, answered ENTIRELY from the log (zero file
    opens at any table size): one row per live data file with its
    recorded row count, partition values, data-skipping coverage
    (which columns carry min/max stats / bloom bitmaps), and
    deletion-vector state. This is what an operator looks at before
    deciding to OPTIMIZE (small-file counts), re-cluster (stats
    coverage), or vacuum."""
    from pyspark.sql import types as T

    adds, _ = _live_adds(table_path, latest_version(table_path) if version is None else version)
    schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("partition_values", T.MapType(T.StringType(), T.StringType())),
            T.StructField("stats_cols", T.ArrayType(T.StringType())),
            T.StructField("bloom_cols", T.ArrayType(T.StringType())),
            T.StructField("n_dvs", T.LongType()),
            T.StructField("dv_deleted_rows", T.LongType()),
        ]
    )
    rows = [
        (
            f,
            info.get("n"),
            info.get("pv"),
            sorted((info.get("stats") or {}).keys()),
            sorted((info.get("bloom") or {}).keys()),
            len(info.get("dvs") or []),
            sum(d["n"] for d in (info.get("dvs") or [])),
        )
        for f, info in sorted(adds.items())
    ]
    return spark.createDataFrame(rows, schema)


def table_count(table_path: str, version: int | None = None) -> int | None:
    """``SELECT COUNT(*)`` answered from the manifest alone: the sum of
    every live file's recorded row count minus its deletion vectors'
    masked rows — zero file opens, zero Spark jobs, any table size (the
    metadata-only count Delta/Iceberg serve from their stats). Returns
    None when some live file predates per-add row counts (round-8 logs)
    — the caller falls back to a scan rather than trusting a partial
    sum."""
    adds, _ = _live_adds(
        table_path, latest_version(table_path) if version is None else version
    )
    total = 0
    for info in adds.values():
        if info.get("n") is None:
            return None
        total += info["n"] - sum(d["n"] for d in (info.get("dvs") or []))
    return total


def table_constraints(table_path: str, version: int | None = None) -> dict[str, str]:
    """The CHECK constraints in force at ``version`` (default latest):
    name → SQL expression, the replay of every ``constraints_add`` /
    ``constraints_drop`` metadata action up to that version. Constraints
    are table METADATA — they survive overwrites (the Delta rule)."""
    if version is None:
        version = latest_version(table_path)
    cons: dict[str, str] = {}
    ck = _usable_checkpoint(table_path, version)
    ck_v = -1
    if ck is not None:
        ck_v = ck[0]
        cons.update(ck[1].get("constraints", {}))
    for v, path in _commit_files(table_path):
        if v <= ck_v:
            continue
        if v > version:
            break
        c = _read_commit(path)
        for a in c.get("constraints_add", []):
            cons[a["name"]] = a["expr"]
        for n in c.get("constraints_drop", []):
            cons.pop(n, None)
    return cons


def _check_constraints(df: DataFrame, table_path: str, version: int) -> None:
    """Refuse a data commit whose rows violate any CHECK constraint in
    force. SQL CHECK semantics: a NULL predicate result passes (only
    FALSE violates). One combined scan when everything passes; the
    per-constraint re-check runs only on the failure path to name the
    violated constraint."""
    cons = table_constraints(table_path, version)
    if not cons:
        return
    import functools

    combined = functools.reduce(
        lambda a, b: a & b, (F.expr(e) for e in cons.values())
    )
    if df.filter(~combined).isEmpty():
        return
    for name, e in sorted(cons.items()):
        if not df.filter(~F.expr(e)).isEmpty():
            raise ValueError(
                f"CHECK constraint {name!r} violated by this commit: ({e})"
            )
    raise ValueError("CHECK constraint violated by this commit")


def add_constraint(
    spark: SparkSession,
    table_path: str,
    name: str,
    expr: str,
    *,
    max_retries: int = 10,
) -> int:
    """``ALTER TABLE ADD CONSTRAINT`` — Delta CHECK-constraint semantics:
    validate ``expr`` holds over the CURRENT table contents, then record
    it in a metadata-only commit; every later data commit (append,
    overwrite, targeted replace, streaming micro-batch) is validated
    against it before publishing and refused on violation. NULL
    predicate results pass (SQL CHECK). A lost publish race re-validates
    against the newer snapshot and retries — the constraint must hold
    over whatever data raced in ahead of it. Returns the new version."""
    import time

    if latest_version(table_path) < 0:
        raise ValueError(f"no table at {table_path!r}")
    if name in table_constraints(table_path):
        raise ValueError(f"constraint {name!r} already exists")
    for _ in range(max(max_retries, 1)):
        version = latest_version(table_path) + 1
        bad = read_version(spark, table_path, version - 1).filter(~F.expr(expr))
        if not bad.isEmpty():
            raise ValueError(
                f"existing rows violate CHECK constraint {name!r}: ({expr})"
            )
        commit = {
            "version": version,
            "mode": "meta",
            "ts_us": int(time.time() * 1_000_000),
            "n_rows": 0,
            "actions": [],
            "constraints_add": [{"name": name, "expr": expr}],
        }
        try:
            _publish_commit(table_path, version, commit)
            return version
        except CommitConflict:
            continue  # someone committed data meanwhile: re-validate on it
    raise CommitConflict(
        f"add_constraint on {table_path!r} lost the publish race {max_retries} times"
    )


def drop_constraint(table_path: str, name: str, *, max_retries: int = 10) -> int:
    """``ALTER TABLE DROP CONSTRAINT``: a metadata-only commit removing
    the named CHECK constraint. Returns the new version."""
    import time

    if name not in table_constraints(table_path):
        raise ValueError(f"no constraint {name!r} on {table_path!r}")
    for _ in range(max(max_retries, 1)):
        version = latest_version(table_path) + 1
        commit = {
            "version": version,
            "mode": "meta",
            "ts_us": int(time.time() * 1_000_000),
            "n_rows": 0,
            "actions": [],
            "constraints_drop": [name],
        }
        try:
            _publish_commit(table_path, version, commit)
            return version
        except CommitConflict:
            continue  # drops commute with any concurrent commit
    raise CommitConflict(
        f"drop_constraint on {table_path!r} lost the publish race {max_retries} times"
    )


def _constraint_references(table_path: str, version: int, col: str) -> str | None:
    import re

    for name, expr in table_constraints(table_path, version).items():
        if re.search(rf"\b{re.escape(col)}\b", expr):
            return name
    return None


def rename_column(
    table_path: str, old: str, new: str, *, max_retries: int = 10
) -> int:
    """``ALTER TABLE RENAME COLUMN`` — Delta column mapping (name mode):
    a metadata-only commit that re-points the LOGICAL name at the same
    stable PHYSICAL column, so zero data files are touched at any scale
    and every existing file (and its stats/blooms/partitionValues, which
    are keyed physically) keeps serving reads under the new name.
    Readers project physical → logical at scan time; writers translate
    logical → physical at staging; time travel below the rename still
    shows the old name (schemas are per-version). Constraints whose
    expression references the column block the rename (re-create them
    against the new name). Returns the new version."""
    import time

    from pyspark.sql import types as T

    for _ in range(max(max_retries, 1)):
        version = latest_version(table_path) + 1
        sch = table_schema(table_path, version - 1)
        if sch is None:
            raise ValueError(f"no committed schema at {table_path!r}")
        names = [f.name for f in sch.fields]
        if old not in names:
            raise ValueError(f"no column {old!r} in {names}")
        if new in names:
            raise ValueError(f"column {new!r} already exists")
        cname = _constraint_references(table_path, version - 1, old)
        if cname:
            raise ValueError(
                f"constraint {cname!r} references {old!r} — drop it, rename, "
                "and re-add it against the new name"
            )
        mapping, retired = _column_mapping(table_path, version - 1)
        if not mapping:
            mapping = {n: n for n in names}  # activation: physical = current
        if new in retired or (new in mapping.values() and mapping.get(old) != new):
            # a logical name that shadows a live or retired PHYSICAL name
            # would make manifest keys ambiguous forever
            raise ValueError(
                f"{new!r} is (or was) a physical column name of "
                f"{table_path!r} — pick a different name"
            )
        mapping[new] = mapping.pop(old)
        fields = [
            T.StructField(new if f.name == old else f.name, f.dataType, f.nullable)
            for f in sch.fields
        ]
        commit = {
            "version": version,
            "mode": "meta",
            "ts_us": int(time.time() * 1_000_000),
            "n_rows": 0,
            "actions": [],
            "schema": T.StructType(fields).json(),
            "set_mapping": mapping,
            "retired_physical": retired,
        }
        try:
            _publish_commit(table_path, version, commit)
            return version
        except CommitConflict:
            continue  # re-derive against the rebased latest state
    raise CommitConflict(
        f"rename_column on {table_path!r} lost the publish race {max_retries} times"
    )


def drop_column(table_path: str, col: str, *, max_retries: int = 10) -> int:
    """``ALTER TABLE DROP COLUMN`` — metadata-only (Delta column-mapping
    semantics): the physical column stays in every existing file but its
    name is RETIRED from the mapping, so readers never project it and
    writers never populate it; storage is reclaimed lazily as
    compaction/overwrites rewrite files. Time travel below the drop
    still shows the column. A later append may NOT introduce a new
    column with a retired physical name (it would resurrect dead data) —
    the append gate refuses it. Partitioning or constraints referencing
    the column block the drop. Returns the new version."""
    import time

    from pyspark.sql import types as T

    for _ in range(max(max_retries, 1)):
        version = latest_version(table_path) + 1
        sch = table_schema(table_path, version - 1)
        if sch is None:
            raise ValueError(f"no committed schema at {table_path!r}")
        names = [f.name for f in sch.fields]
        if col not in names:
            raise ValueError(f"no column {col!r} in {names}")
        if len(names) == 1:
            raise ValueError("cannot drop the only column")
        cname = _constraint_references(table_path, version - 1, col)
        if cname:
            raise ValueError(f"constraint {cname!r} references {col!r}")
        mapping, retired = _column_mapping(table_path, version - 1)
        if not mapping:
            mapping = {n: n for n in names}
        phys = mapping[col]
        for spec in _table_partitioning(table_path, version - 1) or []:
            t = _parse_partition_spec(spec)
            src = spec if t is None else t[1]
            if src == phys:
                raise ValueError(
                    f"partition spec {spec!r} references {col!r} — "
                    "repartition via an overwrite first"
                )
        del mapping[col]
        retired = sorted(set(retired) | {phys})
        fields = [f for f in sch.fields if f.name != col]
        commit = {
            "version": version,
            "mode": "meta",
            "ts_us": int(time.time() * 1_000_000),
            "n_rows": 0,
            "actions": [],
            "schema": T.StructType(fields).json(),
            "set_mapping": mapping,
            "retired_physical": retired,
        }
        try:
            _publish_commit(table_path, version, commit)
            return version
        except CommitConflict:
            continue
    raise CommitConflict(
        f"drop_column on {table_path!r} lost the publish race {max_retries} times"
    )


def compact_table(
    spark: SparkSession,
    table_path: str,
    *,
    target_files: int = 8,
    target_rows_per_file: int | None = None,
    cluster_by: list[str] | None = None,
    curve: str = "zorder",
    bits: int = 16,
    stats_cols: list[str] | None = None,
    min_file_rows: int | None = None,
) -> int:
    """Small-file compaction — and, with ``cluster_by``, the full
    ``OPTIMIZE ... ZORDER BY`` surface: rewrite the CURRENT live file
    set as ``target_files`` files, clustered on the Z-order or Hilbert
    address of ``cluster_by`` (operators/layout.py — driver-computed
    quantile cut points + space-filling-curve write, fully distributed:
    no window, no single-task funnel), and publish it as one overwriting
    commit. Clustered rewrites
    default ``stats_cols`` to ``cluster_by``, so the tightened per-file
    ranges land in the log and :func:`read_version` ``prune=`` skips
    files on ANY clustered column without a footer fetch. A partitioned
    table recompacts PARTITIONED (its partitioning is preserved, so
    partition pruning survives the rewrite). Readers of older versions
    are untouched — their files stay referenced by earlier commits
    until :func:`vacuum`. Returns the new version.

    ``target_rows_per_file`` (round 9) sizes the rewrite by ROWS instead
    of a fixed file count: the target file count derives from the
    manifest's live row total (or the packed subset's, under
    ``min_file_rows``), so the same maintenance job stays correctly
    sized as the table grows 100x.

    ``min_file_rows`` (round 8) switches to INCREMENTAL bin-packing —
    the shape a real auto-OPTIMIZE runs: only files whose recorded row
    count is below the threshold (or that carry deletion vectors, which
    the rewrite materializes away) are read, packed, and swapped via a
    REPLACE commit; well-sized files are untouched metadata. Compacting
    the daily small-file tail of a 100 TB table costs the tail, not the
    table. Returns the current version unchanged when nothing
    qualifies. Mutually exclusive with ``cluster_by`` (clustering is a
    global property — a subset rewrite cannot establish it)."""
    version = latest_version(table_path)
    partition_by = _table_partitioning(table_path, version) or None
    mapping, _ = _column_mapping(table_path, version)
    if min_file_rows is not None:
        rec = None
        if cluster_by:
            # INCREMENTAL clustering (the liquid-clustering shape): the
            # small-file tail re-clusters against the cut-point grid the
            # last FULL clustered compaction recorded — zero re-sampling,
            # new files land in the established curve address space. A
            # table without a matching recorded clustering must run the
            # full rewrite first (a subset cannot establish the grid).
            rec = _table_clustering(table_path, version)
            phys_cb = _phys_cols(cluster_by, mapping)
            if rec is None or rec["cols"] != phys_cb or rec["curve"] != curve:
                raise ValueError(
                    f"no recorded {curve} clustering on {phys_cb} — run a "
                    "full clustered compaction (without min_file_rows) "
                    "first; cluster_by= on a subset reuses its stored grid"
                )
        adds, _ = _live_adds(table_path, version)
        small = sorted(
            f
            for f, info in adds.items()
            if info.get("dvs")
            or info.get("n") is None  # pre-round-8 adds: no count — rewrite
            or info["n"] < min_file_rows
        )
        if not small or (
            len(small) == 1 and not adds[small[0]].get("dvs")
        ):
            # nothing to pack, or a single small DV-free file a rewrite
            # cannot improve (the single-file-bin skip every OPTIMIZE
            # applies — without it the pass would rewrite forever)
            return version
        if target_rows_per_file is not None:
            import math

            small_rows = sum(adds[f].get("n") or 0 for f in small)
            target_files = max(1, math.ceil(small_rows / target_rows_per_file))
        n_seg = _suffix_segments(adds, sorted(adds))
        small_sfx = [_disk_suffix(f, n_seg) for f in small]
        sub = (
            read_version(spark, table_path, version, _provenance="file")
            .withColumnRenamed("__file", "__fp")
            .withColumn("__sfx", _spark_suffix(n_seg))
            .filter(F.col("__sfx").isin(small_sfx))
            .drop("__sfx", "__fp")
        )
        extra = None
        if cluster_by:
            from avro_diff_spark.operators import layout as L

            fn = L.zorder_key if curve == "zorder" else L.hilbert_key
            key = "__zkey" if curve == "zorder" else "__hkey"
            cuts = {c: rec["cuts"][mapping.get(c, c)] for c in cluster_by}
            keyed = fn(sub, list(cluster_by), bits=rec["bits"], cuts=cuts)
            sub = (
                keyed.repartitionByRange(target_files, F.col(key))
                .sortWithinPartitions(key)
                .drop(key)
            )
            stats_cols = stats_cols or list(cluster_by)
            extra = {"cluster": _table_clustering_raw(table_path, version)}
        else:
            sub = sub.coalesce(target_files)
        return _commit_replace_files(
            sub,
            table_path,
            small,
            partition_by=partition_by,
            stats_cols=stats_cols,
            extra=extra,
        )
    # read the SNAPSHOTTED version, not implicit latest: the remove list
    # below comes from `version`, so an append landing between the two
    # must stay additive — an unpinned read would fold its rows into the
    # rewrite while its file also stays live, duplicating them (round-8
    # ADVICE). Pinned, the concurrent file is neither read nor removed.
    if target_rows_per_file is not None:
        # ROW-targeted sizing (round 9): derive the file count from the
        # manifest's live row total (net of DVs) — the OPTIMIZE sizing
        # knob a real table sets once instead of re-guessing target_files
        # as it grows; falls back to target_files when some live add
        # predates per-add counts
        import math

        total = table_count(table_path, version)
        if total is not None:
            target_files = max(1, math.ceil(total / target_rows_per_file))
    df = read_version(spark, table_path, version)
    extra = None
    if cluster_by:
        from avro_diff_spark.operators import layout as L

        if curve == "zorder":
            keyed, used = L.zorder_key(df, cluster_by, bits=bits, return_cuts=True)
            key = "__zkey"
        elif curve == "hilbert":
            keyed, used = L.hilbert_key(df, cluster_by, bits=bits, return_cuts=True)
            key = "__hkey"
        else:
            raise ValueError(f"unknown curve {curve!r} (zorder|hilbert)")
        df = (
            keyed.repartitionByRange(target_files, F.col(key))
            .sortWithinPartitions(key)
            .drop(key)
        )
        stats_cols = stats_cols or list(cluster_by)
        # record the grid (physical column keys — rename-stable) so later
        # incremental passes cluster new data against the SAME cut points
        extra = {
            "cluster": {
                "cols": _phys_cols(cluster_by, mapping),
                "curve": curve,
                "bits": min(bits, L._MAX_BITS),
                "cuts": {
                    mapping.get(c, c): [_ser_cut(v) for v in used[c]]
                    for c in cluster_by
                },
            }
        }
    else:
        df = df.coalesce(target_files)
    # published as a REPLACE commit: same rows, new physical layout —
    # the Delta dataChange=false marker streaming sources key on to skip
    # compactions instead of replaying (or failing on) the rewrite
    return _commit_replace_files(
        df,
        table_path,
        _live_files(table_path, version),
        partition_by=partition_by,
        stats_cols=stats_cols,
        extra=extra,
    )


def vacuum(
    table_path: str,
    *,
    keep_versions: int = 1,
    older_than=None,
    dry_run: bool = False,
) -> list[str]:
    """Delete data files unreferenced by the last ``keep_versions``
    versions (and truncate time travel older than that) — the storage
    reclamation step after overwrites/compactions. Also sweeps staged
    directories no commit ever published (crashed writers). Records the
    truncation watermark in the log so :func:`read_version` refuses
    vacuumed versions with a clear error (round-6 ADVICE). Returns the
    deleted file paths. ``dry_run=True`` returns the would-delete list
    without removing anything or moving the watermark (the ``VACUUM …
    DRY RUN`` safety valve). ``older_than`` (datetime or epoch micros;
    round 9) is the TIME-based retention every production table
    actually configures — Delta's ``RETAIN n HOURS`` / Iceberg's
    ``expire_snapshots(older_than=)``: versions still readable as of
    that timestamp are kept (resolved through :func:`version_as_of`),
    everything older is reclaimed; combinable with ``keep_versions``
    (the MORE retentive of the two wins — retention must never shrink
    below an explicit floor). Single-writer contract like the rest of
    the log."""
    import shutil

    last = latest_version(table_path)
    if last < 0:
        return []
    keep_from = max(last - keep_versions + 1, 0)
    if older_than is not None:
        # keep every version >= the snapshot in force at `older_than`; a
        # cutoff predating the first commit keeps the whole history
        try:
            keep_from = min(keep_from, version_as_of(table_path, older_than))
        except ValueError:
            keep_from = 0
    needed: set[str] = set()
    for v in range(keep_from, last + 1):
        adds = _live_adds(table_path, v)[0]
        needed.update(adds)
        for info in adds.values():  # live DV sidecars are referenced data
            for d in info["dvs"]:
                needed.update(p for p in d["paths"] if not os.path.isabs(p))
    deleted: list[str] = []
    for entry in sorted(os.listdir(table_path)):
        full = os.path.join(table_path, entry)
        if entry == _LOG or not os.path.isdir(full):
            continue
        for dp, _, fns in os.walk(full, topdown=False):
            for f in sorted(fns):
                rel = os.path.relpath(os.path.join(dp, f), table_path)
                if f.endswith(".parquet") and rel not in needed:
                    if not dry_run:
                        os.remove(os.path.join(table_path, rel))
                    deleted.append(rel)
        if not dry_run and not any(
            f.endswith(".parquet") for dp, _, fns in os.walk(full) for f in fns
        ):
            shutil.rmtree(full)
    if dry_run:
        return deleted
    if keep_from > _vacuum_watermark(table_path):
        p = os.path.join(_log_dir(table_path), _VACUUM)
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"earliest": keep_from}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, p)
    return deleted


def clone_table(src_path: str, dst_path: str, *, version: int | None = None) -> int:
    """Zero-copy SHALLOW CLONE (Delta's ``CREATE TABLE ... SHALLOW
    CLONE``): the clone's first commit references the source's live data
    files by ABSOLUTE path — no data moves, the clone of a 100 TB table
    is one driver-side metadata write. Stats, partitionValues, per-file
    owner schemas, partitioning, and CHECK constraints all carry over,
    so pruning and enforcement behave identically on the clone. Writes
    to the clone land under its own directory and never touch the
    source; :func:`vacuum` on the clone sweeps only the clone's
    directory, so externally-referenced source files are never deleted
    from the clone side. Caveat (Delta's too): vacuum on the SOURCE can
    remove files the clone still references — clones are cheap
    experiment snapshots, not backups. Returns the clone's version (0)."""
    import time

    if version is None:
        version = latest_version(src_path)
    if version < 0:
        raise ValueError(f"no table at {src_path!r}")
    wm = _vacuum_watermark(src_path)
    if version < wm:
        raise ValueError(
            f"version {version} of {src_path!r} was vacuumed; earliest "
            f"cloneable version is {wm}"
        )
    adds, schemas = _live_adds(src_path, version)
    if not adds:
        raise ValueError(f"version {version} of {src_path!r} has no live files")
    if latest_version(dst_path) >= 0:
        raise ValueError(f"clone target {dst_path!r} already has commits")
    src_root = os.path.abspath(src_path)
    union_schema = table_schema(src_path, version)
    actions: list[dict] = []
    for f in sorted(adds):
        info = adds[f]
        a: dict = {"add": f if os.path.isabs(f) else os.path.join(src_root, f)}
        if info.get("n") is not None:
            a["n"] = info["n"]
        if info.get("pv") is not None:
            a["pv"] = info["pv"]
        if info.get("stats"):
            a["stats"] = info["stats"]
        if info.get("bloom"):
            a["bloom"] = info["bloom"]
        if len(schemas) > 1 and info.get("schema") is not None:
            # live files span an additive evolution: keep each file's
            # owner schema so the clone's readers still mergeSchema
            a["schema_json"] = info["schema"]
        if info.get("dvs"):
            # deletion vectors re-attach with ABSOLUTE sidecar paths and
            # the source's sidecar key, so the clone masks the same rows
            a["dvs"] = [
                {
                    "paths": [
                        p if os.path.isabs(p) else os.path.join(src_root, p)
                        for p in d["paths"]
                    ],
                    "n": d["n"],
                }
                for d in info["dvs"]
            ]
            a["dv_f"] = _dv_key(f, info)
        actions.append(a)
    if all("n" in a for a in actions):
        n_rows = sum(a["n"] for a in actions) - sum(
            d["n"] for a in actions for d in a.get("dvs", [])
        )  # zero footer fetches; per-add n is the raw pre-DV file count
    else:
        # pre-round-8 source commits without per-add counts: footer loop
        import pyarrow.parquet as pq

        n_rows = sum(pq.ParquetFile(a["add"]).metadata.num_rows for a in actions)
    commit: dict = {
        "version": 0,
        "mode": "overwrite",
        "ts_us": int(time.time() * 1_000_000),
        "n_rows": n_rows,
        "actions": actions,
        "cloned_from": {"table": src_root, "version": version},
    }
    if union_schema is not None:
        commit["schema"] = union_schema.json()
    pb = _table_partitioning(src_path, version)
    if pb:
        commit["partition_by"] = pb
    cons = table_constraints(src_path, version)
    if cons:
        commit["constraints_add"] = [
            {"name": n, "expr": e} for n, e in sorted(cons.items())
        ]
    cm, cm_retired = _column_mapping(src_path, version)
    if cm:
        # the clone reads the same physical files — the logical mapping
        # must travel with them
        commit["set_mapping"], commit["retired_physical"] = cm, cm_retired
    os.makedirs(dst_path, exist_ok=True)
    _publish_commit(dst_path, 0, commit)
    return 0


def restore_table(table_path: str, version: int | None = None, *, ts=None) -> int:
    """``RESTORE TABLE ... TO VERSION AS OF`` (Delta's rollback): publish
    a NEW commit whose live state — file set, per-file stats/blooms/
    partitionValues, deletion vectors, partitioning, and CHECK
    constraints — equals the table's state at the target ``version`` (or
    at timestamp ``ts`` via :func:`version_as_of`). History is
    PRESERVED: restore moves the table forward to an old state rather
    than truncating the log, so the bad versions stay time-travelable
    and :func:`read_changes` across the restore commit emits the
    compensating change rows downstream consumers need.

    Metadata-only at any scale: zero data files are read, written, or
    moved — the commit re-references the target version's files with
    their recorded add actions (the same zero-footer re-add
    :func:`clone_table` uses), so restoring a 100 TB table is one
    driver-side log write. Files already vacuumed are the one hard
    limit: targets below the vacuum watermark raise (their data is
    gone). Concurrent writers conflict like any overwrite. Returns the
    new version number."""
    import time

    if (version is None) == (ts is None):
        raise ValueError("pass exactly one of version= or ts=")
    if ts is not None:
        version = version_as_of(table_path, ts)
    latest = latest_version(table_path)
    if version < 0 or version > latest:
        raise ValueError(
            f"no version {version} of {table_path!r} (latest is {latest})"
        )
    wm = _vacuum_watermark(table_path)
    if version < wm:
        raise ValueError(
            f"version {version} of {table_path!r} was vacuumed; earliest "
            f"restorable version is {wm}"
        )
    adds, schemas = _live_adds(table_path, version)
    # full overwrite of the live set: removes first, target re-adds after
    # (replay order lets a file live in both states end up added) — this
    # also RESETS deletion-vector state to the target's, which a
    # surgical diff of the two file sets would silently keep
    actions: list[dict] = [{"remove": f} for f in _live_files(table_path, latest)]
    for f in sorted(adds):
        info = adds[f]
        a: dict = {"add": f}
        if info.get("n") is not None:
            a["n"] = info["n"]
        if info.get("pv") is not None:
            a["pv"] = info["pv"]
        if info.get("stats"):
            a["stats"] = info["stats"]
        if info.get("bloom"):
            a["bloom"] = info["bloom"]
        if len(schemas) > 1 and info.get("schema") is not None:
            a["schema_json"] = info["schema"]
        if info.get("dvs"):
            a["dvs"] = [dict(d) for d in info["dvs"]]
            a["dv_f"] = _dv_key(f, info)
        actions.append(a)
    n_rows = sum(a.get("n") or 0 for a in actions if "add" in a) - sum(
        d["n"] for a in actions for d in a.get("dvs", [])
    )
    # constraints are metadata actions, so the restore commit carries the
    # DELTA between the sets in force now vs at the target
    cur_cons = table_constraints(table_path, latest)
    tgt_cons = table_constraints(table_path, version)
    drops = sorted(n for n in cur_cons if tgt_cons.get(n) != cur_cons[n])
    re_adds = [
        {"name": n, "expr": e}
        for n, e in sorted(tgt_cons.items())
        if cur_cons.get(n) != e
    ]
    commit: dict = {
        "version": latest + 1,
        "mode": "overwrite",
        "ts_us": int(time.time() * 1_000_000),
        "n_rows": n_rows,
        "actions": actions,
        "restore_of": version,
    }
    schema = table_schema(table_path, version)
    if schema is not None:
        commit["schema"] = schema.json()
    pb = _table_partitioning(table_path, version)
    if pb:
        commit["partition_by"] = pb
    if drops:
        commit["constraints_drop"] = drops
    if re_adds:
        commit["constraints_add"] = re_adds
    tgt_map, tgt_retired = _column_mapping(table_path, version)
    cur_map, _ = _column_mapping(table_path, latest)
    if tgt_map or cur_map:
        # column mapping is metadata: RESTORE reverts it with the data
        # (an explicit identity map when the target predates activation)
        commit["set_mapping"] = tgt_map or (
            {f.name: f.name for f in schema.fields} if schema else {}
        )
        commit["retired_physical"] = tgt_retired
    _publish_commit(table_path, latest + 1, commit)
    return latest + 1


def commit_stream(
    stream_df: DataFrame,
    table_path: str,
    *,
    checkpoint: str,
    trigger_available_now: bool = True,
    partition_by: list[str] | None = None,
    app_meta: dict | None = None,
    auto_compact_every: int | None = None,
    auto_compact_min_rows: int = 10_000,
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

    ``auto_compact_every=N`` runs Delta-style AUTO COMPACTION after
    every Nth committed batch: the incremental bin-packing pass
    (``compact_table(min_file_rows=auto_compact_min_rows)``) packs the
    small-file tail the stream itself produced into well-sized files as
    a REPLACE (dataChange=false) commit — downstream table streams skip
    it, readers see identical rows, and the micro-batch cadence that
    would otherwise accrete one file per trigger forever stays bounded.
    Failures of the maintenance pass never fail the data batch.

    Returns the started StreamingQuery (AvailableNow by default —
    drain-what-exists semantics for tests and backfills)."""

    app_id = os.path.abspath(checkpoint)
    committed = {"n": 0}

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if last_committed_epoch(table_path, app_id) >= epoch_id:
            return  # replayed batch: already durable in the log
        stage_mapping, retired = _column_mapping(
            table_path, latest_version(table_path)
        )
        _check_retired(batch_df, table_path, stage_mapping, retired)
        phys_pb = _phys_specs(partition_by, stage_mapping) if partition_by else []
        added = _stage_data(
            _to_physical(batch_df, stage_mapping),
            table_path,
            latest_version(table_path) + 1,
            phys_pb,
        )
        file_rows, _ = _harvest_stats(
            batch_df.sparkSession, table_path, [f for f, _ in added], []
        )
        n_rows = sum(file_rows.values())
        import time

        while True:
            version = latest_version(table_path) + 1
            # validate INSIDE the retry loop, against the rebased latest
            # version: a constraint added by a concurrent add_constraint
            # must refuse this micro-batch too (round-7 ADVICE; mirrors
            # commit_snapshot's append-rebase path). The column mapping
            # re-derives here too — a rename/drop committed between
            # staging and this publish attempt must not be reverted by a
            # stale set_mapping (round-8 ADVICE); staged files are safe,
            # physical names are rename-stable
            mapping, retired = _column_mapping(table_path, version - 1)
            cur_df = _rebase_logical(batch_df, mapping, stage_mapping)
            _check_constraints(cur_df, table_path, version - 1)
            _check_retired(cur_df, table_path, mapping, retired)
            # phys_pb stays the STAGE-TIME translation: the hive layout
            # is already baked into the staged files, and physical names
            # are rename-stable, so it remains the correct recorded spec
            commit = {
                "version": version,
                "mode": "append",
                "ts_us": int(time.time() * 1_000_000),
                "app": app_id,
                "epoch": epoch_id,
                "n_rows": n_rows,
                "schema": cur_df.schema.json(),
                "actions": [
                    {
                        "add": f,
                        "n": file_rows.get(f, 0),
                        **({"pv": pv} if pv is not None else {}),
                    }
                    for f, pv in added
                ],
            }
            if app_meta:
                # rides every micro-batch commit (same contract as
                # commit_snapshot): stream-maintained state like the SQ
                # index's grid token stays discoverable at the log tip
                commit["app_meta"] = dict(app_meta)
            if phys_pb:
                commit["partition_by"] = phys_pb
            if mapping:
                commit["set_mapping"] = {
                    **mapping,
                    **{c: c for c in cur_df.columns if c not in mapping},
                }
                commit["retired_physical"] = retired
            try:
                _publish_commit(table_path, version, commit)
                committed["n"] += 1
                if (
                    auto_compact_every
                    and committed["n"] % auto_compact_every == 0
                ):
                    try:
                        compact_table(
                            batch_df.sparkSession,
                            table_path,
                            min_file_rows=auto_compact_min_rows,
                        )
                    except Exception:
                        import warnings

                        warnings.warn(
                            f"auto-compaction of {table_path!r} failed; the "
                            "data commit is durable, the next interval retries",
                            RuntimeWarning,
                            stacklevel=2,
                        )
                return
            except CommitConflict:
                continue  # another writer took the slot; rebase the append

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merge_stream(
    stream_df: DataFrame,
    table_path: str,
    keys: list[str],
    *,
    checkpoint: str,
    when_matched: str = "update",
    when_not_matched: str = "insert",
    rewrite: str = "auto",
    trigger_available_now: bool = True,
):
    """Stream UPSERTS into a versioned table: each micro-batch applies as
    one MERGE commit via ``foreachBatch`` — the canonical Delta
    foreachBatch-MERGE pattern for applying a CDC / dedup-keyed feed to
    a table (append-only ``commit_stream`` cannot express updates).
    Batches are deduped WITHIN the batch on ``keys`` (last-writer-wins
    by arrival is not definable on an unordered micro-batch, so
    duplicate keys in one batch are rejected by merge_into's contract —
    pre-aggregate upstream if the feed can repeat keys in one trigger)
    and ACROSS restarts by the commit log's (app, epoch) idempotence: a
    replayed micro-batch whose MERGE already committed is skipped, so
    the table never double-applies an upsert. ``rewrite`` follows
    :func:`merge_into` ('auto' → merge-on-read deletion vectors: a
    1000-key upsert into a 100 TB table writes ~1000 rows). Returns the
    started StreamingQuery."""
    app_id = os.path.abspath(checkpoint)

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if last_committed_epoch(table_path, app_id) >= epoch_id:
            return  # replayed batch: the MERGE is already durable
        merge_into(
            batch_df.sparkSession,
            table_path,
            batch_df,
            keys,
            when_matched=when_matched,
            when_not_matched=when_not_matched,
            rewrite=rewrite,
            txn=(app_id, int(epoch_id)),
        )

    writer = stream_df.writeStream.foreachBatch(_apply).option(
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
    prune: tuple[str, object, object] | None = None,
    **kwargs,
) -> DataFrame:
    """Keyed diff between two VERSIONS of one table — the reference's
    two-file diff (src/index.js keyed diff surface) lifted onto the
    commit log: added/removed/changed/unchanged classification of
    version ``v_new`` (default latest) against ``v_old``. ``prune=``
    applies the same log-level partition/stats skip to BOTH sides —
    diffing one partition of a 100 TB table opens only that partition's
    files on each side."""
    from avro_diff_spark.operators.key_diff import key_diff

    old = read_version(spark, table_path, v_old, prune=prune)
    new = read_version(spark, table_path, v_new, prune=prune)
    return key_diff(old, new, keys, **kwargs)


def _merge_frames(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    cols: list[str],
    when_matched: str,
    when_not_matched: str,
    when_not_matched_by_source: str,
) -> DataFrame:
    """The MERGE row logic: one full-outer equi-join on the keys (the
    same single-shuffle FOJ the keyed diff runs), clause flags as pure
    Column predicates."""
    t = target.select(*[F.col(c).alias(f"__t_{c}") for c in cols])
    s = source.select(*[F.col(c).alias(f"__s_{c}") for c in cols])
    cond = [t[f"__t_{k}"] == s[f"__s_{k}"] for k in keys]
    j = t.join(s, cond, "full_outer")
    # merge keys are non-null by contract (as in every MERGE implementation)
    t_present = j[f"__t_{keys[0]}"].isNotNull()
    s_present = j[f"__s_{keys[0]}"].isNotNull()
    take_source = (
        (t_present & s_present & F.lit(when_matched == "update"))
        | (~t_present & s_present & F.lit(when_not_matched == "insert"))
    )
    keep_row = (
        (t_present & s_present)
        | (~t_present & s_present & F.lit(when_not_matched == "insert"))
        | (t_present & ~s_present & F.lit(when_not_matched_by_source == "keep"))
    )
    return j.filter(keep_row).select(
        *[
            F.when(take_source, j[f"__s_{c}"]).otherwise(j[f"__t_{c}"]).alias(c)
            for c in cols
        ]
    )


def _ser_cut(v):
    import datetime
    import decimal

    if isinstance(v, datetime.datetime):
        return ["datetime", v.isoformat()]
    if isinstance(v, datetime.date):
        return ["date", v.isoformat()]
    if isinstance(v, decimal.Decimal):
        return ["decimal", str(v)]
    return ["raw", v]


def _deser_cut(t):
    import datetime
    import decimal

    tag, v = t
    if tag == "datetime":
        return datetime.datetime.fromisoformat(v)
    if tag == "date":
        return datetime.date.fromisoformat(v)
    if tag == "decimal":
        return decimal.Decimal(v)
    return v


def _table_clustering_raw(table_path: str, version: int) -> dict | None:
    """The JSON-form clustering record in force at ``version`` (cols are
    PHYSICAL names; cuts are tagged-serialized), or None when the table
    was never clustered or an unclustered overwrite replaced the layout
    since."""
    ck = _usable_checkpoint(table_path, version)
    ck_v = ck[0] if ck is not None else -1
    for v, path in reversed(_commit_files(table_path)):
        if v > version:
            continue
        if v <= ck_v:
            break
        c = _read_commit(path)
        if "cluster" in c:
            return dict(c["cluster"])
        if c["mode"] == "overwrite":
            return None  # layout replaced by an unclustered rewrite
    if ck is not None and ck[1].get("cluster"):
        return dict(ck[1]["cluster"])
    return None


def _table_clustering(table_path: str, version: int) -> dict | None:
    raw = _table_clustering_raw(table_path, version)
    if raw is None:
        return None
    return {
        "cols": list(raw["cols"]),
        "curve": raw["curve"],
        "bits": int(raw["bits"]),
        "cuts": {c: [_deser_cut(t) for t in ts] for c, ts in raw["cuts"].items()},
    }


def _commit_replace_files(
    df: DataFrame,
    table_path: str,
    remove: list[str],
    *,
    partition_by: list[str] | None,
    stats_cols: list[str] | None,
    extra: dict | None = None,
    txn: tuple[str, int] | None = None,
) -> int:
    """Publish a REPLACE commit: remove exactly ``remove`` and add the
    staged files of ``df`` — the targeted-rewrite commit MERGE uses.
    Conflicts like an overwrite (its remove-set was computed against
    the pre-commit snapshot): a lost race raises CommitConflict."""
    import time

    version = latest_version(table_path) + 1
    _check_constraints(df, table_path, version - 1)
    mapping, _ = _column_mapping(table_path, version - 1)
    added = _stage_data(_to_physical(df, mapping), table_path, version, partition_by)
    file_rows, file_stats = _harvest_stats(
        df.sparkSession, table_path, [f for f, _ in added], _phys_cols(stats_cols, mapping)
    )
    actions: list[dict] = [{"remove": f} for f in remove]
    for f, pv in added:
        a: dict = {"add": f, "n": file_rows.get(f, 0)}
        if pv is not None:
            a["pv"] = pv
        st = file_stats.get(f)
        if st:
            a["stats"] = st
        actions.append(a)
    commit = {
        "version": version,
        "mode": "replace",
        "ts_us": int(time.time() * 1_000_000),
        "n_rows": sum(file_rows.values()),
        "schema": df.schema.json(),
        "actions": actions,
    }
    if partition_by:
        commit["partition_by"] = list(partition_by)
    if extra:
        commit.update(extra)
    if txn is not None:
        commit["app"], commit["epoch"] = str(txn[0]), int(txn[1])
    _publish_commit(table_path, version, commit)
    return version


def merge_into(
    spark: SparkSession,
    table_path: str,
    source: DataFrame,
    keys: list[str],
    *,
    when_matched: str = "update",
    when_not_matched: str = "insert",
    when_not_matched_by_source: str = "keep",
    partition_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
    rewrite: str = "auto",
    txn: tuple[str, int] | None = None,
) -> int:
    """``MERGE INTO`` — the lakehouse upsert (Delta/Iceberg MERGE reduced
    to its whole-row clauses): join ``source`` to the table's latest
    version on ``keys`` and commit the merged state.
    ``when_matched``: 'update' (take the source row) or 'keep';
    ``when_not_matched``: 'insert' or 'ignore' (source-only rows);
    ``when_not_matched_by_source``: 'keep' or 'delete' (target-only
    rows). Returns the new version. Source keys must be unique
    (duplicate source keys make MERGE ambiguous — Delta raises too).
    A partitioned table re-commits partitioned unless overridden.

    ``rewrite`` picks the commit shape — the 100 TB lever:

    - 'touched' (Delta's optimized merge): find the target FILES that
      contain a source key (scan-time file provenance + one key
      semi-join — the same inner-join file-finding pass Delta runs),
      merge ONLY those files' rows with the source, and publish a
      REPLACE commit (remove touched, add rewritten+inserts). A merge
      touching 1% of files rewrites 1% of the table instead of all of
      it. With a delete clause (``when_not_matched_by_source='delete'``)
      untouched files hold NO source keys, so every one of their rows
      is not-matched-by-source: they are dropped wholesale as
      metadata-only removes while still only REWRITING the touched
      subset (round 8 — the restriction is lifted). The file list is
      driver-side — bounded by file count, the same state every
      lakehouse driver holds.
    - 'dv' (merge-on-read, round 8): write ONLY the changed rows —
      updated/deleted target rows are masked by a deletion vector at
      their old positions, updated+inserted source rows land as new
      (partitioned) files, one atomic commit. Cost ∝ changed rows; a
      1000-key upsert into a 100 TB table writes 1000 rows, zero
      existing data files removed or rewritten. Read amplification is
      the one DV anti-join; compaction materializes it away. Conflicts
      like an overwrite (positions computed against this snapshot).
    - 'all': single FOJ + full overwrite commit.
    - 'auto' (default): 'touched'.
    """
    if when_matched not in ("update", "keep"):
        raise ValueError(f"when_matched={when_matched!r} (update|keep)")
    if when_not_matched not in ("insert", "ignore"):
        raise ValueError(f"when_not_matched={when_not_matched!r} (insert|ignore)")
    if when_not_matched_by_source not in ("keep", "delete"):
        raise ValueError(
            f"when_not_matched_by_source={when_not_matched_by_source!r} (keep|delete)"
        )
    if rewrite not in ("auto", "touched", "all", "dv"):
        raise ValueError(f"rewrite={rewrite!r} (auto|touched|all|dv)")
    if rewrite == "auto":
        rewrite = "touched"
    # a DML rewrite preserves the table's partitioning unless overridden
    partition_by = (
        partition_by or _table_partitioning(table_path, latest_version(table_path)) or None
    )
    target = read_version(spark, table_path)
    cols = target.columns
    if set(source.columns) != set(cols):
        raise ValueError(
            f"source columns {sorted(source.columns)} != table columns "
            f"{sorted(cols)} — project the source to the table schema first"
        )
    if rewrite == "all":
        merged = _merge_frames(
            target, source, keys, cols,
            when_matched, when_not_matched, when_not_matched_by_source,
        )
        return commit_snapshot(
            merged,
            table_path,
            mode="overwrite",
            partition_by=partition_by,
            stats_cols=stats_cols,
            txn=txn,
        )
    if rewrite == "dv":
        return _merge_dv(
            spark, table_path, source, keys, cols,
            when_matched, when_not_matched, when_not_matched_by_source,
            partition_by, stats_cols, txn,
        )
    # targeted rewrite: scan-time file provenance -> touched-file set
    # (read_version attaches it at the scan, so it stays correct through
    # the deletion-vector anti-join; input_file_name would not)
    tgt = read_version(spark, table_path, _provenance="file")
    touched_abs = sorted(
        r["__file"]
        for r in tgt.join(source.select(*keys).distinct(), keys, "left_semi")
        .select("__file")
        .distinct()
        .collect()
    )

    # map scanned absolute paths back to the log's add keys (relative for
    # ordinary commits, absolute for shallow-clone references)
    by_abs = {
        (k if os.path.isabs(k) else os.path.join(os.path.abspath(table_path), k)): k
        for k in _live_adds(table_path, latest_version(table_path))[0]
    }

    def add_key(p: str) -> str:
        from urllib.parse import unquote, urlparse

        local = unquote(urlparse(p).path)
        return by_abs[local]

    touched_rel = sorted(add_key(p) for p in touched_abs)
    if when_not_matched_by_source == "delete":
        # untouched files contain zero source keys -> every row in them
        # is not-matched-by-source -> deleted wholesale: remove them as
        # pure metadata; only the touched subset is rewritten
        remove = sorted(by_abs.values())
    else:
        remove = touched_rel
    sub = (
        tgt.filter(F.col("__file").isin(list(touched_abs))).drop("__file")
        if touched_abs
        else target.filter(F.lit(False))
    )
    merged = _merge_frames(
        sub, source, keys, cols,
        when_matched, when_not_matched, when_not_matched_by_source,
    )
    return _commit_replace_files(
        merged,
        table_path,
        remove,
        partition_by=partition_by,
        stats_cols=stats_cols,
        txn=txn,
    )


def _stage_dv(
    spark: SparkSession,
    table_path: str,
    version: int,
    matched: DataFrame,
    adds: dict[str, dict],
) -> tuple[list[str], dict[str, int]]:
    """Write the deletion-vector sidecar for ``matched`` provenance rows
    (``__file`` URI + ``__row_idx``): one distributed parquet write of
    ``(f = DV key, idx)`` rows under a ``dvNNNNNN-…`` staging directory,
    plus one bounded groupBy for the per-file counts. Returns (relative
    sidecar paths, {dv_key: deleted rows}). Never collects row data —
    only the ≤-live-files mapping and counts touch the driver."""
    keys = sorted(adds)
    n_seg = _suffix_segments(adds, keys)
    mapping = [(_disk_suffix(k, n_seg), _dv_key(k, adds[k])) for k in keys]
    map_df = spark.createDataFrame(mapping, "__sfx string, f string")
    out_cols = ["f", F.col("__row_idx").alias("idx")]
    if "__ct" in matched.columns:
        # per-row change-type tag (merge commits mix update_preimage and
        # delete in one vector) — extra sidecar column, same single write;
        # _apply_dvs reads (f, idx) and ignores it, the CDF readers use it
        out_cols.append(F.col("__ct").alias("ct"))
    rows = (
        matched.withColumnRenamed("__file", "__fp")
        .withColumn("__sfx", _spark_suffix(n_seg))
        .join(F.broadcast(map_df), "__sfx")
        .select(*out_cols)
    )
    stage = os.path.join(table_path, f"dv{version:06d}-{uuid.uuid4().hex[:8]}")
    rows.write.parquet(stage)
    base = os.path.basename(stage)
    rels = sorted(
        os.path.join(base, fn)
        for fn in os.listdir(stage)
        if fn.endswith(".parquet")
    )
    counts = {
        r["f"]: r["n"]
        for r in spark.read.parquet(stage)
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return rels, counts


def _dv_actions(
    adds: dict[str, dict], rels: list[str], counts: dict[str, int]
) -> list[dict]:
    for_of = {_dv_key(k, adds[k]): k for k in adds}
    return [
        {"dv": {"for": for_of[dk], "paths": rels, "n": int(n)}}
        for dk, n in sorted(counts.items())
    ]


def _merge_dv(
    spark: SparkSession,
    table_path: str,
    source: DataFrame,
    keys: list[str],
    cols: list[str],
    when_matched: str,
    when_not_matched: str,
    when_not_matched_by_source: str,
    partition_by: list | None,
    stats_cols: list[str] | None,
    txn: tuple[str, int] | None = None,
) -> int:
    """Merge-on-read MERGE: one commit of (DV over replaced/deleted
    positions) + (new files holding updated+inserted source rows).
    Whole-row clause semantics are identical to the FOJ path — pinned
    row-for-row against rewrite='all' across all clause combinations."""
    import time

    version = latest_version(table_path) + 1
    adds, _ = _live_adds(table_path, version - 1)
    tgt = read_version(spark, table_path, version - 1, _provenance="pos")
    src_keys = source.select(*keys).distinct()
    masked = []
    if when_matched == "update":
        masked.append(
            tgt.join(src_keys, keys, "left_semi")
            .select("__file", "__row_idx")
            .withColumn("__ct", F.lit("update_preimage"))
        )
    if when_not_matched_by_source == "delete":
        masked.append(
            tgt.join(src_keys, keys, "left_anti")
            .select("__file", "__row_idx")
            .withColumn("__ct", F.lit("delete"))
        )
    tgt_keys = tgt.select(*keys).distinct()
    # staged per clause so each add action carries its change type —
    # disjoint row sets, so the extra write job moves no additional data
    fresh: list[tuple[str, DataFrame]] = []
    if when_matched == "update":
        fresh.append(
            ("update_postimage", source.join(tgt_keys, keys, "left_semi").select(*cols))
        )
    if when_not_matched == "insert":
        fresh.append(
            ("insert", source.join(tgt_keys, keys, "left_anti").select(*cols))
        )
    actions: list[dict] = []
    n_new = 0
    n_masked = 0
    if masked:
        dv_rows = masked[0]
        for m in masked[1:]:
            dv_rows = dv_rows.unionByName(m)
        rels, counts = _stage_dv(spark, table_path, version, dv_rows, adds)
        actions += _dv_actions(adds, rels, counts)
        n_masked = sum(counts.values())
    new_rows = None
    mapping, _ = _column_mapping(table_path, version - 1)
    partition_by = _phys_specs(partition_by, mapping) or None
    for ct, fdf in fresh:
        _check_constraints(fdf, table_path, version - 1)
        added = _stage_data(_to_physical(fdf, mapping), table_path, version, partition_by)
        file_rows, file_stats = _harvest_stats(
            spark, table_path, [f for f, _ in added], _phys_cols(stats_cols, mapping)
        )
        n_new += sum(file_rows.values())
        for f, pv in added:
            a: dict = {"add": f, "n": file_rows.get(f, 0), "ct": ct}
            if pv is not None:
                a["pv"] = pv
            st = file_stats.get(f)
            if st:
                a["stats"] = st
            actions.append(a)
        new_rows = fdf
    if n_masked == 0 and n_new == 0:
        return version - 1  # no clause produced work — the table is unchanged
    commit = {
        "version": version,
        "mode": "merge",
        "ts_us": int(time.time() * 1_000_000),
        "n_rows": n_new,
        "actions": actions,
    }
    if txn is not None:
        commit["app"], commit["epoch"] = str(txn[0]), int(txn[1])
    if fresh:
        commit["schema"] = new_rows.schema.json()
    if partition_by:
        commit["partition_by"] = list(partition_by)
    _publish_commit(table_path, version, commit)
    return version


def delete_where(
    spark: SparkSession,
    table_path: str,
    condition=None,
    *,
    rewrite: str = "auto",
    app_meta: dict | None = None,
    keys: DataFrame | None = None,
    on: list[str] | None = None,
    txn: tuple[str, int] | None = None,
) -> int:
    """``DELETE FROM table WHERE condition``. ``condition`` is a Column
    or SQL string. Returns the new version (the current version when a
    merge-on-read delete matches nothing — no empty commits, and the
    ``app_meta`` is NOT written in that case). ``app_meta`` rides the
    delete commit atomically (the text index uses this to decrement its
    collection stats in the same commit that drops the postings).

    Alternatively pass ``keys`` + ``on`` (mutually exclusive with
    ``condition``): rows matching the key set are identified by a
    BROADCAST SEMI-JOIN instead of a predicate — the distributed shape
    for a delete set that lives in a DataFrame (a dedup survivor list),
    never collected to the driver.

    ``txn=(app_id, epoch)`` records the Delta txnAppId/txnVersion pair
    on the commit (both rewrites) so multi-commit maintenance flows can
    epoch-guard their delete step (``last_committed_epoch``) exactly
    like appends — the text index's delete path uses this.

    ``rewrite`` picks the commit shape — the 100 TB lever:

    - 'dv' (merge-on-read, the Delta/Iceberg deletion-vector path):
      identify the matching rows by scan-time ``(file, row_index)``
      provenance, write them as a parquet DV sidecar, and publish a
      metadata commit attaching the vectors to their files — a
      point-delete in a 1 GB file writes a few KB instead of rewriting
      1 GB. :func:`read_version` masks the rows with one anti-join;
      :func:`compact_table` / any overwrite materializes them away.
      Conflicts like an overwrite (row positions were computed against
      this snapshot): a lost race raises :class:`CommitConflict`.
    - 'cow' (copy-on-write): rewrite the live set without the matching
      rows as one overwrite commit — the pre-round-8 behavior.
    - 'auto' (default): 'dv'.

    Time travel keeps the pre-delete versions readable until vacuum in
    both modes."""
    if (condition is None) == (keys is None):
        raise ValueError("pass exactly one of condition or keys")
    if keys is not None and not on:
        raise ValueError("keys requires on=[join cols]")
    cond = F.expr(condition) if isinstance(condition, str) else condition

    def _matching(df: DataFrame) -> DataFrame:
        if cond is not None:
            return df.filter(cond)
        return df.join(F.broadcast(keys.select(*on).distinct()), on, "semi")

    if rewrite not in ("auto", "cow", "dv"):
        raise ValueError(f"rewrite={rewrite!r} (auto|cow|dv)")
    if rewrite == "cow":
        pb = _table_partitioning(table_path, latest_version(table_path)) or None
        full = read_version(spark, table_path)
        kept = (
            full.filter(~cond)
            if cond is not None
            else full.join(F.broadcast(keys.select(*on).distinct()), on, "anti")
        )
        return commit_snapshot(
            kept,
            table_path,
            mode="overwrite",
            partition_by=pb,
            app_meta=app_meta,
            txn=txn,
        )
    import time

    version = latest_version(table_path) + 1
    if version <= 0:
        raise ValueError(f"no table at {table_path!r}")
    adds, _ = _live_adds(table_path, version - 1)
    matched = _matching(
        read_version(spark, table_path, version - 1, _provenance="pos")
    ).select("__file", "__row_idx")
    rels, counts = _stage_dv(spark, table_path, version, matched, adds)
    if not counts:
        return version - 1  # nothing matched — the table is unchanged
    commit = {
        "version": version,
        "mode": "delete",
        "ts_us": int(time.time() * 1_000_000),
        "n_rows": int(sum(counts.values())),
        "actions": _dv_actions(adds, rels, counts),
    }
    if app_meta:
        commit["app_meta"] = dict(app_meta)
    if txn is not None:
        commit["app"], commit["epoch"] = str(txn[0]), int(txn[1])
    _publish_commit(table_path, version, commit)
    return version


def update_where(
    spark: SparkSession,
    table_path: str,
    condition,
    assignments: dict,
    *,
    rewrite: str = "auto",
) -> int:
    """``UPDATE table SET col = expr WHERE condition``. ``assignments``
    maps column name → Column/SQL expression. Returns the new version
    (current version when a merge-on-read update matches nothing).

    ``rewrite``: 'dv' (merge-on-read — write ONLY the updated rows as
    new files and mask their old positions with a deletion vector, one
    atomic commit; an update touching 0.1% of rows writes 0.1% of the
    data), 'cow' (full overwrite rewrite — pre-round-8 behavior), or
    'auto' (default: 'dv'). The DV commit conflicts like an overwrite."""
    cond = F.expr(condition) if isinstance(condition, str) else condition
    if rewrite not in ("auto", "cow", "dv"):
        raise ValueError(f"rewrite={rewrite!r} (auto|cow|dv)")
    pb = _table_partitioning(table_path, latest_version(table_path)) or None
    if rewrite == "cow":
        df = read_version(spark, table_path)
        for c, e in assignments.items():
            if c not in df.columns:
                raise ValueError(f"unknown column {c!r}")
            expr = F.expr(e) if isinstance(e, str) else e
            df = df.withColumn(c, F.when(cond, expr).otherwise(F.col(c)))
        return commit_snapshot(df, table_path, mode="overwrite", partition_by=pb)
    import time

    version = latest_version(table_path) + 1
    if version <= 0:
        raise ValueError(f"no table at {table_path!r}")
    adds, _ = _live_adds(table_path, version - 1)
    snap = read_version(spark, table_path, version - 1, _provenance="pos")
    for c in assignments:
        if c not in snap.drop("__file", "__row_idx").columns:
            raise ValueError(f"unknown column {c!r}")
    matched = snap.filter(cond)
    rels, counts = _stage_dv(
        spark, table_path, version, matched.select("__file", "__row_idx"), adds
    )
    if not counts:
        return version - 1  # nothing matched — the table is unchanged
    new_rows = matched.drop("__file", "__row_idx")
    for c, e in assignments.items():
        expr = F.expr(e) if isinstance(e, str) else e
        new_rows = new_rows.withColumn(c, expr)
    _check_constraints(new_rows, table_path, version - 1)
    mapping, _ = _column_mapping(table_path, version - 1)
    pb = _phys_specs(pb, mapping) or None
    added = _stage_data(_to_physical(new_rows, mapping), table_path, version, pb)
    file_rows, _ = _harvest_stats(
        spark, table_path, [f for f, _ in added], []
    )
    actions = _dv_actions(adds, rels, counts)
    for f, pv in added:
        a: dict = {"add": f, "n": file_rows.get(f, 0)}
        if pv is not None:
            a["pv"] = pv
        actions.append(a)
    commit = {
        "version": version,
        "mode": "update",
        "ts_us": int(time.time() * 1_000_000),
        "n_rows": int(sum(file_rows.values())),
        "schema": new_rows.schema.json(),
        "actions": actions,
    }
    if pb:
        commit["partition_by"] = list(pb)
    _publish_commit(table_path, version, commit)
    return version


def read_changes(
    spark: SparkSession,
    table_path: str,
    keys: list[str],
    *,
    v_from: int | None = None,
    v_to: int | None = None,
    ts_from=None,
    ts_to=None,
) -> DataFrame:
    """Change data feed between versions — the Delta CDF / ``table_changes``
    surface, derived from the log + keyed diff instead of stored change
    files: one row per changed data row per commit in ``(v_from, v_to]``,
    tagged ``_change_type`` ∈ {insert, delete, update_preimage,
    update_postimage} and ``_commit_version``. An update yields BOTH its
    pre- and post-image (the Delta CDF convention downstream merges
    rely on).

    Scale shape: ONE keyed diff per commit step — the engine's
    single-shuffle FOJ classification — with the pre/post fan-out done
    by a single array-explode over the classified frame (NOT four
    filtered re-executions of the join); steps are independent scans
    unioned (Spark runs them as one job). Per-commit derivation reads
    two adjacent snapshots; a stored-CDF variant would trade write
    amplification for cheaper reads, the same trade Delta exposes.

    ``ts_from``/``ts_to`` (datetime or epoch micros) resolve through
    :func:`version_as_of` — each names the SNAPSHOT the table was at
    that time, so the feed is "changes committed after ts_from's
    snapshot, up to and including ts_to's". Mutually exclusive with
    the corresponding version bound."""
    if ts_from is not None:
        if v_from is not None:
            raise ValueError("pass v_from= or ts_from=, not both")
        v_from = version_as_of(table_path, ts_from)
    if ts_to is not None:
        if v_to is not None:
            raise ValueError("pass v_to= or ts_to=, not both")
        v_to = version_as_of(table_path, ts_to)
    if v_from is None:
        raise ValueError("pass v_from= or ts_from=")
    if v_to is None:
        v_to = latest_version(table_path)
    if v_to <= v_from:
        raise ValueError(f"need v_to > v_from (got {v_from} -> {v_to})")
    from avro_diff_spark.operators.key_diff import key_diff

    # a feed range spanning a rename_column must union COMPATIBLE steps:
    # each step's frame carries the logical names in force at its own
    # version, so pre-rename steps are projected to v_to's names through
    # the stable physical names (round-8 ADVICE — unionByName would
    # otherwise emit both old- and new-name columns, each null on the
    # other side). Caller ``keys`` are v_to's logical names.
    mapping_to, _ = _column_mapping(table_path, v_to)
    inv_to = {p: l for l, p in mapping_to.items()}

    def step(v: int) -> DataFrame:
        mapping_v, _ = _column_mapping(table_path, v)
        inv_v = {p: l for l, p in mapping_v.items()}
        # v_to logical -> physical -> the logical name in force at v
        # (with no mapping at v, logical IS physical)
        keys_v = [
            inv_v.get(mapping_to.get(k, k), mapping_to.get(k, k)) for k in keys
        ]
        d = key_diff(
            read_version(spark, table_path, v - 1),
            read_version(spark, table_path, v),
            keys_v,
        )
        to_name = {
            c: inv_to.get(mapping_v.get(c, c), c)
            for c in d.schema["new"].dataType.names
        }

        def tagged(ct: str, payload: str):
            return F.struct(
                F.lit(ct).alias("_ct"), F.col(payload).alias("_row")
            )

        kind = F.col("diff_kind")
        changes = (
            F.when(kind == "added", F.array(tagged("insert", "new")))
            .when(kind == "removed", F.array(tagged("delete", "old")))
            .when(
                kind == "changed",
                F.array(
                    tagged("update_preimage", "old"),
                    tagged("update_postimage", "new"),
                ),
            )
        )  # unchanged -> NULL array, dropped by the plain explode
        return d.select(F.explode(changes).alias("_e")).select(
            *[
                F.col("_e._row").getField(c).alias(n)
                for c, n in to_name.items()
            ],
            F.col("_e._ct").alias("_change_type"),
            F.lit(v).alias("_commit_version"),
        )

    steps = []
    by_version = dict(_commit_files(table_path))
    for v in range(v_from + 1, v_to + 1):
        # metadata commits (constraints, rename/drop column) change no
        # rows — and a rename step would otherwise diff two snapshots
        # with different column names
        if v in by_version and _read_commit(by_version[v]).get("mode") == "meta":
            continue
        steps.append(step(v))
    if not steps:  # only metadata commits in range — an empty feed
        return (
            read_version(spark, table_path, v_to)
            .filter(F.lit(False))
            .withColumn("_change_type", F.lit(None).cast("string"))
            .withColumn("_commit_version", F.lit(None).cast("long"))
        )
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s, allowMissingColumns=True)
    return out


def agg_delta(
    spark: SparkSession,
    table_path: str,
    keys: list[str],
    group_cols: list[str],
    *,
    v_from: int,
    v_to: int | None = None,
    sum_cols: list[str] | None = None,
) -> DataFrame:
    """Incremental aggregate maintenance from the change feed — the
    reason change feeds exist: the per-group delta of row count (and of
    each ``sum_cols`` sum) between two versions, computed from the CDF
    rows of :func:`read_changes` instead of rescanning either snapshot.
    Inserts and update post-images count +1, deletes and update
    pre-images count −1, so a downstream materialized aggregate updates
    as ``state(v_from) + delta == state(v_to)`` (pytest-pinned) at a
    cost proportional to WHAT CHANGED, not table size — at 100 TB the
    difference between touching a day's changes and rescanning the lake.
    Count/sum only: algebraic aggregates decompose over signed changes;
    min/max do not (a deleted extremum needs a rescan of its group).

    Groups whose rows changed but whose aggregates net to zero (e.g. an
    update that left the grouped/summed columns untouched) still emit a
    zero-delta row — apply-side merges treat them as no-ops."""
    ch = read_changes(spark, table_path, keys, v_from=v_from, v_to=v_to)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    aggs = [F.sum(sign).cast("long").alias("n_rows_delta")]
    for c in sum_cols or []:
        aggs.append(F.sum(sign * F.col(c)).alias(f"{c}_delta"))
    return ch.groupBy(*group_cols).agg(*aggs)


def commit_app_meta(table_path: str, version: int | None = None) -> dict:
    """The ``app_meta`` dict recorded by the commit at ``version``
    (default latest) — application-level transaction metadata, e.g. the
    applied source version of a materialized aggregate. Empty when the
    commit carries none."""
    if version is None:
        version = latest_version(table_path)
    for v, path in _commit_files(table_path):
        if v == version:
            return _read_commit(path).get("app_meta", {})
    return {}


def latest_app_meta(table_path: str, key: str, version: int | None = None) -> dict:
    """The newest commit's ``app_meta`` containing ``key`` at or below
    ``version`` (default latest) — the walk-PAST-meta-less-commits
    lookup every app_meta-carried state needs (collection stats, source
    tracking: a compaction/metadata commit carries none and must not
    amnesia the state; see the round-9/11 fixes).

    O(tail): walks only the commits ABOVE the newest usable checkpoint,
    then answers from the checkpoint's per-key ``app_meta_latest`` map
    (folded forward checkpoint-to-checkpoint by :func:`checkpoint_log`).
    Old-format checkpoints without the map fall back to the full walk —
    correctness never depends on the map being present. Returns ``{}``
    when no commit at or below ``version`` carries the key."""
    if version is None:
        version = latest_version(table_path)
    if version < 0:
        return {}
    ck = _usable_checkpoint(table_path, version)
    floor = ck[0] if ck is not None and "app_meta_latest" in ck[1] else -1
    for v, path in sorted(_commit_files(table_path), reverse=True):
        if v > version:
            continue
        if v <= floor:
            break
        meta = _read_commit(path).get("app_meta")
        if meta and key in meta:
            return dict(meta)
    if floor >= 0:
        hit = ck[1]["app_meta_latest"].get(key)
        if hit:
            return dict(hit["meta"])
    return {}


def refresh_agg_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    keys: list[str],
    group_cols: list[str],
    *,
    sum_cols: list[str] | None = None,
    to_version: int | None = None,
) -> int | None:
    """Incrementally maintained materialized aggregate — the
    materialized-view / DLT pattern built on the engine's own log. The
    destination table holds one row per group (``group_cols``,
    ``n_rows``, and a ``<c>_sum`` per ``sum_cols``); each refresh reads
    the APPLIED source version from the destination's last commit
    metadata, computes :func:`agg_delta` over only the unapplied
    commits, merges it into the previous state with a full-outer
    equi-join on the group key (one shuffle sized by groups ∪ changed
    groups), and commits the new state recording the new source
    version. An up-to-date destination is a NO-OP (None — no commit, no
    Spark job beyond the driver-side log read), and because the applied
    version rides the same atomic commit as the data, a crashed refresh
    is invisible and a replayed one idempotent — the exactly-once
    pattern :func:`commit_stream` uses for streaming appends.

    Refresh cost is proportional to WHAT CHANGED in the source (the CDF
    derivation) plus the group-cardinality rewrite; pytest pins
    ``refresh == full recompute`` across MERGE/DELETE/UPDATE histories.
    Count/sum only, as :func:`agg_delta` documents. ``to_version`` caps
    the refresh at a past source version (catch-up replays and tests).
    Returns the new destination version, or None when already current."""
    src_latest = latest_version(src_path) if to_version is None else to_version
    if src_latest < 0:
        raise ValueError(f"no table at {src_path!r}")
    sum_cols = list(sum_cols or [])

    def full_agg(version: int) -> DataFrame:
        aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
        aggs += [F.sum(c).alias(f"{c}_sum") for c in sum_cols]
        return read_version(spark, src_path, version).groupBy(*group_cols).agg(*aggs)

    meta = {"src_table": os.path.abspath(src_path), "src_version": src_latest}
    if latest_version(dst_path) < 0:
        return commit_snapshot(full_agg(src_latest), dst_path, app_meta=meta)
    # walk past meta-less commits (compaction on the DESTINATION must not
    # amnesia the applied version — the _src_tracking_meta class of bug)
    applied = latest_app_meta(dst_path, "src_version").get("src_version")
    if applied is None:
        raise ValueError(
            f"{dst_path!r} was not created by refresh_agg_table (no applied "
            "source version in its commit metadata)"
        )
    if applied >= src_latest:
        return None  # already current
    delta = agg_delta(
        spark,
        src_path,
        keys,
        group_cols,
        v_from=applied,
        v_to=src_latest,
        sum_cols=sum_cols,
    )
    merged = _merge_agg_delta(spark, dst_path, delta, group_cols, sum_cols)
    return commit_snapshot(merged, dst_path, app_meta=meta)


def _merge_agg_delta(
    spark: SparkSession,
    dst_path: str,
    delta: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Fold a per-group delta frame (``n_rows_delta`` + ``<c>_delta``)
    into the destination's previous state: one full-outer equi-join on
    the group key, groups whose count reaches zero drop out. Shared by
    the batch refresh and the streaming maintainer."""
    prev = read_version(spark, dst_path)
    z = F.lit(0)
    merged = prev.join(delta, group_cols, "full_outer").select(
        *group_cols,
        (F.coalesce(F.col("n_rows"), z) + F.coalesce(F.col("n_rows_delta"), z))
        .cast("long")
        .alias("n_rows"),
        *[
            (
                F.coalesce(F.col(f"{c}_sum"), z)
                + F.coalesce(F.col(f"{c}_delta"), z)
            ).alias(f"{c}_sum")
            for c in sum_cols
        ],
    )
    return merged.filter(F.col("n_rows") > 0)


def commit_txn_marker(
    table_path: str, *, app_meta: dict | None = None, txn: tuple[str, int] | None = None
) -> int:
    """Publish a METADATA-ONLY commit carrying ``app_meta`` and/or a
    ``txn`` stamp — no data actions, no schema change. Delta has the
    same shape (a commit whose only action is ``txn``): idempotent
    multi-commit maintenance flows use it to record "sources applied
    through version X" bookkeeping ATOMICALLY AFTER their data commits,
    so a crash mid-flow leaves the old bookkeeping in place and the
    replay is a pure no-op re-apply (:func:`refresh_join_table`).

    mode='meta' so every existing reader already handles it: the schema
    walk passes through (no ``schema`` key), table streams and the CDF
    derivation skip it, log replay sees an empty action list."""
    if app_meta is None and txn is None:
        raise ValueError("a txn marker needs app_meta and/or txn")
    import time

    for _ in range(5):
        version = latest_version(table_path) + 1
        if version == 0:
            raise ValueError(f"no table at {table_path!r}")
        commit: dict = {
            "version": version,
            "mode": "meta",
            "ts_us": int(time.time() * 1_000_000),
            "n_rows": 0,
            "actions": [],
        }
        if app_meta:
            commit["app_meta"] = dict(app_meta)
        if txn is not None:
            commit["app"], commit["epoch"] = str(txn[0]), int(txn[1])
        try:
            _publish_commit(table_path, version, commit)
            return version
        except CommitConflict:
            continue
    raise CommitConflict(f"txn marker on {table_path!r} lost the publish race")


def refresh_join_table(
    spark: SparkSession,
    fact_path: str,
    dim_path: str,
    dst_path: str,
    fact_keys: list[str],
    fk: str,
    pk: str,
    *,
    to_fact_version: int | None = None,
    to_dim_version: int | None = None,
    rewrite: str = "auto",
) -> int | None:
    """Incrementally maintained materialized JOIN view — the second half
    of the materialized-view story (:func:`refresh_agg_table` covers
    aggregates). The destination holds ``fact ⋈ dim`` (inner equi-join
    ``fk = pk``, dim's ``pk`` column dropped), keyed by the fact table's
    unique ``fact_keys``; ``pk`` must be unique in the dim (the usual
    N:1 fact→dimension shape — a duplicate pk would make the view key
    non-unique and MERGE ambiguous).

    Each refresh applies ONLY the unapplied change feeds of BOTH
    sources (the classic delta rule ΔV = ΔF⋈D' ∪ (F'⋉Δpk)⋈D',
    operationally: re-derive the view rows of the AFFECTED fact keys
    against the new snapshots, delete the affected keys that no longer
    join). Work is ∝ changed fact rows + fact rows referencing changed
    dim keys — never a re-join of the full tables:

    * affected keys from the fact CDF + ONE semi-join of the fact
      against the changed dim pks (broadcast when small, AQE otherwise;
      bloom/stats file pruning applies — at 100 TB this is the "which
      orders reference the 1 000 customers that changed today" probe);
    * recompute = (fact ⋉ affected) ⋈ dim — delta-sized;
    * upsert via :func:`merge_into` (``rewrite='dv'`` writes only the
      changed rows; 'touched' rewrites only the files holding them),
      then :func:`delete_where` on the affected keys whose join row
      vanished (fact delete or dangling fk after a dim delete);
    * bookkeeping ("applied fact/dim versions") rides a final
      :func:`commit_txn_marker` — written LAST, so a crash anywhere in
      the flow leaves the old versions recorded and the replay is a
      pure idempotent re-apply (same upserts, empty delete).

    A refresh with both sources already applied is a no-op (None).
    A source commit that changed no rows leaves nothing to record (no
    empty commits) — the next refresh re-derives that empty delta;
    correct, and pathological only for change-free commits.

    Pinned by pytest: refresh == full recompute across fact-only,
    dim-only, dim-delete, and mixed histories.
    """
    fv2 = latest_version(fact_path) if to_fact_version is None else to_fact_version
    dv2 = latest_version(dim_path) if to_dim_version is None else to_dim_version
    if fv2 < 0 or dv2 < 0:
        raise ValueError("both sources must be versioned tables")

    meta = {
        "fact_table": os.path.abspath(fact_path),
        "fact_version": fv2,
        "dim_table": os.path.abspath(dim_path),
        "dim_version": dv2,
    }
    fact = read_version(spark, fact_path, fv2)
    dim = read_version(spark, dim_path, dv2)
    overlap = (set(fact.columns) & set(dim.columns)) - ({pk} if pk == fk else set())
    if overlap:
        raise ValueError(f"fact/dim column collision: {sorted(overlap)}")
    view_cols = fact.columns + [c for c in dim.columns if c != pk]

    def joined(f: DataFrame) -> DataFrame:
        d = dim.withColumnRenamed(pk, fk) if pk != fk else dim
        return f.join(d, [fk], "inner").select(*view_cols)

    if latest_version(dst_path) < 0:
        return commit_snapshot(joined(fact), dst_path, app_meta=meta)

    applied = latest_app_meta(dst_path, "fact_version")
    fva, dva = applied.get("fact_version"), applied.get("dim_version")
    if fva is None or dva is None:
        raise ValueError(
            f"{dst_path!r} was not created by refresh_join_table (no applied "
            "source versions in its commit metadata)"
        )
    at, dt = applied.get("fact_table"), applied.get("dim_table")
    if at not in (None, meta["fact_table"]) or dt not in (None, meta["dim_table"]):
        # same identity guard the streaming twin applies: interpreting
        # another table pair's applied versions as this pair's would
        # derive an arbitrary (wrong) delta range and corrupt the view
        raise ValueError(
            f"{dst_path!r} tracks ({at!r}, {dt!r}), not "
            f"({meta['fact_table']!r}, {meta['dim_table']!r})"
        )
    if fva >= fv2 and dva >= dv2:
        return None  # already current

    changed_sets = []
    if fv2 > fva:
        changed_sets.append(
            read_changes(spark, fact_path, fact_keys, v_from=fva, v_to=fv2)
            .select(*fact_keys)
            .distinct()
        )
    if dv2 > dva:
        changed_pks = (
            read_changes(spark, dim_path, [pk], v_from=dva, v_to=dv2)
            .select(F.col(pk).alias(fk))
            .distinct()
        )
        changed_sets.append(
            fact.join(changed_pks, [fk], "left_semi").select(*fact_keys)
        )
    aff = changed_sets[0]
    for s in changed_sets[1:]:
        aff = aff.unionByName(s)
    aff = aff.distinct()

    recomputed = joined(fact.join(aff, fact_keys, "left_semi"))
    merge_into(spark, dst_path, recomputed, fact_keys, rewrite=rewrite)
    stale = aff.join(recomputed.select(*fact_keys), fact_keys, "left_anti")
    delete_where(spark, dst_path, keys=stale, on=fact_keys)
    return commit_txn_marker(dst_path, app_meta=meta)
