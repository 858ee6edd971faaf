"""CLI entry points mirroring the reference binaries.

Reference: ``key_diff <oldFile> <newFile> <key>`` (bin/key_diff.js:7-13) and
``venn_diff <oldFile> <newFile>`` (bin/venn_diff.js:7-13); comma-separated
key list (bin/key_diff.js:10); keep/ignore/schema config via the CONFIG
singleton (src/config.js) — here explicit flags instead.

Divergences (deliberate, documented):
- venn stat labels are printed CORRECTLY; the reference swaps the added/
  removed counts in its printer (src/index.js:60-61).
- inputs may be avro OR parquet, files or directories/globs.
- results can be written to a parquet sink (--output) instead of stdout —
  the 100 TB path; stdout printing collects only --limit rows.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import DataFrame, functions as F


def _read(spark, path: str, fmt: str, keep, ignore, avro_schema=None):
    from avro_diff_spark.sources.avro import read_avro, read_parquet

    if fmt == "avro" or (fmt == "auto" and path.endswith(".avro")):
        return read_avro(
            spark, path, keep_fields=keep, ignore_fields=ignore, avro_schema=avro_schema
        )
    return read_parquet(spark, path, keep_fields=keep, ignore_fields=ignore)


def _emit(
    df: DataFrame, output: str | None, limit: int, order_by=None, fmt: str = "parquet"
) -> None:
    # Ordered output only at the PRINT boundary (reference prints in
    # lexCompare key order with null keys last, src/index.js:288-307);
    # the sink path stays sort-free — a global sort of a 100 TB diff
    # result for no consumer is wasted work.
    if output:
        if fmt == "avro":
            # the full "Avro in, Avro out" story: distributed per-partition
            # OCF encode via the pure-Python codec (sources/avro.write_avro);
            # complex sink columns (structs/arrays) map to Avro records
            from avro_diff_spark.sources.avro import write_avro

            write_avro(df, output, codec="deflate")
        else:
            df.write.mode("overwrite").parquet(output)
        print(f"wrote {output}")
    else:
        if order_by:
            df = df.orderBy(*order_by)
        df.show(limit, truncate=False)


def _common(p: argparse.ArgumentParser) -> None:
    p.add_argument("old_file")
    p.add_argument("new_file")
    p.add_argument("--format", choices=["auto", "avro", "parquet"], default="auto")
    p.add_argument("--keep-fields", default=None, help="comma-separated keep projection")
    p.add_argument("--ignore-fields", default=None, help="comma-separated ignore projection")
    p.add_argument(
        "--avro-schema",
        default=None,
        metavar="FILE",
        help="reader-schema override: path to an Avro schema JSON file "
        "(the reference's CONFIG.schema, src/config.js:2)",
    )
    p.add_argument("--output", default=None, help="sink output path (default: print)")
    p.add_argument(
        "--output-format",
        choices=["parquet", "avro"],
        default="parquet",
        help="sink format for --output: parquet (default) or Avro OCF "
        "via the distributed pure-Python encoder",
    )
    p.add_argument("--limit", type=int, default=50, help="rows to print without --output")
    p.add_argument("--master", default=None, help="spark master (default local[*])")


def _session(args):
    from avro_diff_spark.session import get_spark

    return get_spark("avro_diff_spark-cli", master=args.master)


def _split(s: str | None):
    return s.split(",") if s else None


def _schema_arg(args):
    if not getattr(args, "avro_schema", None):
        return None
    with open(args.avro_schema) as f:
        return f.read()


def key_diff_main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="key_diff", description="Keyed diff of two Avro/parquet datasets."
    )
    _common(p)
    p.add_argument("key", help="comma-separated composite key fields")
    p.add_argument("--detail", action="store_true", help="emit per-field changed values")
    args = p.parse_args(argv)

    from avro_diff_spark.operators.key_diff import key_diff, key_diff_detail

    spark = _session(args)
    schema = _schema_arg(args)
    old = _read(spark, args.old_file, args.format, _split(args.keep_fields), _split(args.ignore_fields), schema)
    new = _read(spark, args.new_file, args.format, _split(args.keep_fields), _split(args.ignore_fields), schema)
    key = args.key.split(",")
    fn = key_diff_detail if args.detail else key_diff
    d = fn(old, new, key)

    if not args.detail:
        from pyspark.sql import functions as F

        stats = {r["diff_kind"]: r["n"] for r in d.groupBy("diff_kind").agg(F.count(F.lit(1)).alias("n")).collect()}
        for kind in ("added", "removed", "changed", "unchanged"):
            print(f"# of {kind} rows: {stats.get(kind, 0)}")
    from pyspark.sql import functions as F

    # lexCompare parity: composite key fields ascending, nulls last (the
    # coerced keys are non-null by construction, but keep the rule explicit)
    order = [F.col(k).asc_nulls_last() for k in key]
    if args.detail:
        order.append(F.col("field").asc())
    _emit(d, args.output, args.limit, order_by=order, fmt=args.output_format)
    return 0


def venn_diff_main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="venn_diff", description="Multiset venn diff of two Avro/parquet datasets."
    )
    _common(p)
    args = p.parse_args(argv)

    from avro_diff_spark.operators.venn_diff import venn_summary

    spark = _session(args)
    schema = _schema_arg(args)
    old = _read(spark, args.old_file, args.format, _split(args.keep_fields), _split(args.ignore_fields), schema)
    new = _read(spark, args.new_file, args.format, _split(args.keep_fields), _split(args.ignore_fields), schema)
    s = venn_summary(old, new).cache()

    from pyspark.sql import functions as F

    stats = {
        r["venn_kind"]: r["n"]
        for r in s.groupBy("venn_kind").agg(F.sum("n_occurrences").alias("n")).collect()
    }
    # correct labels (the reference's printer swaps these two, src/index.js:60-61)
    print(f"# of removed rows: {stats.get('removed', 0)}")
    print(f"# of added rows: {stats.get('added', 0)}")
    print(f"# of intersection rows: {stats.get('intersection', 0)}")
    _emit(
        s,
        args.output,
        args.limit,
        order_by=[F.col("venn_kind").asc(), F.col("row_json").asc()],
        fmt=args.output_format,
    )
    return 0


def dedup_main(argv: list[str] | None = None) -> int:
    """Corpus dedup over one Avro/parquet dataset — the pipeline tier's
    dedup family behind the same CLI conventions as the diff binaries
    (beyond-reference surface; the reference has no single-dataset ops)."""
    p = argparse.ArgumentParser(
        prog="dedup", description="Deduplicate one Avro/parquet document dataset."
    )
    p.add_argument("input")
    p.add_argument("--format", choices=["auto", "avro", "parquet"], default="auto")
    p.add_argument(
        "--method",
        choices=["exact", "minhash", "simhash", "phash", "audiohash"],
        default="exact",
        help="exact/minhash/simhash dedup text; phash (image dHash) and "
        "audiohash (energy-envelope) dedup binary media payloads "
        "perceptually (round 15)",
    )
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument(
        "--payload-col", default="payload",
        help="binary media column for phash/audiohash",
    )
    p.add_argument("--threshold", type=float, default=0.8, help="minhash Jaccard threshold")
    p.add_argument(
        "--max-hamming", type=int, default=3,
        help="simhash/phash/audiohash Hamming radius",
    )
    p.add_argument(
        "--emit",
        choices=["survivors", "pairs", "clusters"],
        default="survivors",
        help="survivors = one doc per duplicate group (near-dup methods "
        "close pairs transitively first); pairs = the raw near-dup pairs; "
        "clusters = (doc_id, cluster_id) assignment",
    )
    p.add_argument("--output", default=None, help="sink output path (default: print)")
    p.add_argument(
        "--output-format", choices=["parquet", "avro"], default="parquet"
    )
    p.add_argument("--limit", type=int, default=50)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from avro_diff_spark.operators import dedup as DD

    spark = _session(args)
    docs = _read(spark, args.input, args.format, None, None)
    n_docs = docs.count()

    if args.method == "exact":
        from avro_diff_spark.functions.text import fingerprint_md5

        # (doc_id, cluster_id) directly from the fingerprint groupBy —
        # min id per fingerprint is the survivor, same rule as exact_dedup
        fp = docs.select(
            F.col(args.id_col).alias("doc_id"),
            fingerprint_md5(F.col(args.text_col)).alias("fingerprint"),
        )
        mins = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("cluster_id"))
        assign = fp.join(mins, "fingerprint").select("doc_id", "cluster_id")
        pairs = None
    else:
        if args.method == "minhash":
            pairs = DD.minhash_near_dups(
                docs, args.text_col, args.id_col, threshold=args.threshold
            )
        elif args.method == "simhash":
            pairs = DD.simhash_near_dups(
                docs, args.text_col, args.id_col, max_hamming=args.max_hamming
            )
        elif args.method == "phash":
            pairs = DD.phash_near_dups(
                docs, args.payload_col, args.id_col,
                max_hamming=args.max_hamming,
            )
        else:  # audiohash
            pairs = DD.audio_near_dups(
                docs, args.payload_col, args.id_col,
                max_hamming=args.max_hamming,
            )
        assign = DD.near_dup_clusters(pairs)
        # singletons (no near-dup) keep their own id as cluster
        ids = docs.select(F.col(args.id_col).alias("doc_id"))
        assign = (
            ids.join(assign, "doc_id", "left")
            .select("doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"))
        )

    if args.emit == "pairs":
        if pairs is None:
            print("exact method emits no pairs; use --emit clusters/survivors", file=sys.stderr)
            return 2
        out, order = pairs, [F.col("doc_a").asc(), F.col("doc_b").asc()]
    elif args.emit == "clusters":
        out, order = assign, [F.col("doc_id").asc()]
    else:
        survivors = assign.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
        out = docs.join(
            survivors.withColumnRenamed("doc_id", args.id_col), args.id_col
        )
        order = [F.col(args.id_col).asc()]

    n_groups = assign.select("cluster_id").distinct().count() if args.emit != "pairs" else None
    print(f"# of input rows: {n_docs}")
    if n_groups is not None:
        print(f"# of distinct groups: {n_groups}")
        print(f"# of duplicate rows dropped by survivors: {n_docs - n_groups}")
    _emit(out, args.output, args.limit, order_by=order, fmt=args.output_format)
    return 0


def table_main(argv: list[str] | None = None) -> int:
    """Versioned-table operations (sources/versioned.py) behind the same
    CLI conventions as the diff binaries: ``history`` prints the commit
    log, ``diff`` runs the keyed diff between two versions (the
    reference's two-file diff lifted onto time travel), ``compact`` and
    ``vacuum`` run the maintenance half, ``constraints`` /
    ``constraint-add`` / ``constraint-drop`` manage CHECK constraints,
    and ``clone`` makes a zero-copy shallow clone (beyond-reference
    surface)."""
    p = argparse.ArgumentParser(
        prog="table", description="Versioned-table history / diff / maintenance."
    )
    p.add_argument(
        "op",
        choices=[
            "history",
            "diff",
            "compact",
            "vacuum",
            "constraints",
            "constraint-add",
            "constraint-drop",
            "clone",
            "delete",
            "checkpoint",
            "restore",
            "rename-column",
            "drop-column",
            "detail",
            "compute-stats",
            "files",
            "count",
            "refresh-join",
        ],
    )
    p.add_argument("--fact", default=None, help="fact table path (refresh-join)")
    p.add_argument("--dim", default=None, help="dim table path (refresh-join)")
    p.add_argument("--fk", default=None, help="fact foreign-key column (refresh-join)")
    p.add_argument("--pk", default=None, help="dim primary-key column (refresh-join)")
    p.add_argument("--stats-cols", default=None, help="comma-separated columns (compute-stats)")
    p.add_argument("--bloom-cols", default=None, help="comma-separated bloom columns (compute-stats)")
    p.add_argument("--ndv-cols", default=None, help="comma-separated NDV columns (compute-stats)")
    p.add_argument("--column", default=None, help="column name (rename/drop-column)")
    p.add_argument("--to", default=None, help="new column name (rename-column)")
    p.add_argument("table_path")
    p.add_argument("--name", default=None, help="constraint name")
    p.add_argument("--expr", default=None, help="constraint SQL expression")
    p.add_argument("--where", default=None, help="delete predicate (SQL)")
    p.add_argument(
        "--rewrite",
        choices=["auto", "cow", "dv"],
        default="auto",
        help="delete commit shape: deletion vectors (dv, default) or copy-on-write",
    )
    p.add_argument("--dest", default=None, help="clone destination path")
    p.add_argument("--version", type=int, default=None, help="clone source version")
    p.add_argument("--key", default=None, help="comma-separated key fields (diff)")
    p.add_argument("--v-old", type=int, default=None, help="old version (diff; default latest-1)")
    p.add_argument("--v-new", type=int, default=None, help="new version (diff; default latest)")
    p.add_argument("--target-files", type=int, default=8, help="compact target file count")
    p.add_argument(
        "--min-file-rows",
        type=int,
        default=None,
        help="incremental compaction: pack only files below this row count",
    )
    p.add_argument(
        "--cluster-by",
        default=None,
        help="comma-separated columns to cluster the compaction on (OPTIMIZE ... ZORDER BY)",
    )
    p.add_argument("--curve", choices=["zorder", "hilbert"], default="zorder")
    p.add_argument("--keep-versions", type=int, default=1, help="vacuum retention")
    p.add_argument(
        "--older-than",
        default=None,
        help="vacuum time retention: ISO timestamp; versions readable then are kept",
    )
    p.add_argument(
        "--dry-run", action="store_true", help="vacuum: list files without deleting"
    )
    p.add_argument("--output", default=None, help="sink output path (default: print)")
    p.add_argument(
        "--output-format", choices=["parquet", "avro"], default="parquet"
    )
    p.add_argument("--limit", type=int, default=50, help="rows to print without --output")
    p.add_argument("--master", default=None, help="spark master (default local[*])")
    args = p.parse_args(argv)

    from avro_diff_spark.sources import versioned as V

    if args.op == "files":
        # the manifest inspection surface: one line per live file, from
        # the log alone (zero file opens)
        from avro_diff_spark.session import get_spark

        spark = get_spark("table-files", master=args.master or "local[*]")
        rows = V.table_files(spark, args.table_path, args.version).collect()
        for r in rows:
            dv = f", dvs={r.n_dvs}(-{r.dv_deleted_rows} rows)" if r.n_dvs else ""
            pv = f", pv={dict(r.partition_values)}" if r.partition_values else ""
            print(f"{r.file}: {r.n_rows} rows{pv}{dv}")
        print(f"{len(rows)} live files")
        return 0
    if args.op == "refresh-join":
        if not (args.fact and args.dim and args.key and args.fk and args.pk):
            print(
                "refresh-join requires --fact --dim --key --fk --pk",
                file=sys.stderr,
            )
            return 2
        from avro_diff_spark.session import get_spark

        spark = get_spark("table-refresh-join", master=args.master or "local[*]")
        v = V.refresh_join_table(
            spark,
            args.fact,
            args.dim,
            args.table_path,
            args.key.split(","),
            args.fk,
            args.pk,
        )
        if v is None:
            print("already current (no unapplied source changes)")
        else:
            print(f"refreshed {args.table_path} to version {v}")
        return 0
    if args.op == "count":
        n = V.table_count(args.table_path, args.version)
        if n is None:
            print("unknown (some live files predate per-add row counts)")
            return 1
        print(n)
        return 0
    if args.op == "history":
        for h in V.table_history(args.table_path):
            print(
                f"v{h['version']}: {h['mode']}, {h['n_rows']} rows, "
                f"+{h['n_added']}/-{h['n_removed']} files"
            )
        return 0
    if args.op == "vacuum":
        deleted = V.vacuum(
            args.table_path,
            keep_versions=args.keep_versions,
            older_than=(
                __import__("datetime").datetime.fromisoformat(args.older_than)
                if args.older_than
                else None
            ),
            dry_run=args.dry_run
        )
        verb = "would delete" if args.dry_run else "deleted"
        print(f"# of data files {verb}: {len(deleted)}")
        return 0
    if args.op == "detail":
        import json as _json

        print(_json.dumps(V.table_detail(args.table_path, args.version), indent=2))
        return 0
    if args.op == "checkpoint":
        path = V.checkpoint_log(args.table_path)
        print(f"checkpointed {args.table_path} at version "
              f"{V.latest_version(args.table_path)} -> {path}")
        return 0
    if args.op == "restore":
        if args.version is None:
            print("restore requires --version", file=sys.stderr)
            return 2
        v = V.restore_table(args.table_path, args.version)
        print(f"restored {args.table_path} to version {args.version} as version {v}")
        return 0
    if args.op == "rename-column":
        if not args.column or not args.to:
            print("rename-column requires --column and --to", file=sys.stderr)
            return 2
        v = V.rename_column(args.table_path, args.column, args.to)
        print(f"renamed {args.column} -> {args.to} as version {v}")
        return 0
    if args.op == "drop-column":
        if not args.column:
            print("drop-column requires --column", file=sys.stderr)
            return 2
        v = V.drop_column(args.table_path, args.column)
        print(f"dropped {args.column} as version {v}")
        return 0
    if args.op == "constraints":
        for n, e in sorted(V.table_constraints(args.table_path).items()):
            print(f"{n}: CHECK ({e})")
        return 0
    if args.op == "constraint-drop":
        if not args.name:
            print("constraint-drop requires --name", file=sys.stderr)
            return 2
        v = V.drop_constraint(args.table_path, args.name)
        print(f"dropped {args.name} as version {v}")
        return 0
    if args.op == "clone":
        if not args.dest:
            print("clone requires --dest", file=sys.stderr)
            return 2
        V.clone_table(args.table_path, args.dest, version=args.version)
        print(f"cloned {args.table_path} -> {args.dest} (shallow, version 0)")
        return 0

    spark = _session(args)
    if args.op == "compute-stats":
        if not args.stats_cols and not args.ndv_cols:
            print("compute-stats requires --stats-cols or --ndv-cols", file=sys.stderr)
            return 2
        v = V.compute_stats(
            spark,
            args.table_path,
            args.stats_cols.split(",") if args.stats_cols else [],
            bloom_cols=args.bloom_cols.split(",") if args.bloom_cols else None,
            ndv_cols=args.ndv_cols.split(",") if args.ndv_cols else None,
        )
        print(
            f"stats backfilled as version {v}" if v is not None else "already complete"
        )
        return 0
    if args.op == "delete":
        if not args.where:
            print("delete requires --where", file=sys.stderr)
            return 2
        before = V.latest_version(args.table_path)
        v = V.delete_where(spark, args.table_path, args.where, rewrite=args.rewrite)
        if v == before:
            print("delete matched nothing (no commit)")
        else:
            print(f"deleted rows matching ({args.where}) as version {v}")
        return 0
    if args.op == "constraint-add":
        if not args.name or not args.expr:
            print("constraint-add requires --name and --expr", file=sys.stderr)
            return 2
        v = V.add_constraint(spark, args.table_path, args.name, args.expr)
        print(f"added {args.name} as version {v}")
        return 0
    if args.op == "compact":
        v = V.compact_table(
            spark,
            args.table_path,
            target_files=args.target_files,
            cluster_by=args.cluster_by.split(",") if args.cluster_by else None,
            curve=args.curve,
            min_file_rows=args.min_file_rows,
        )
        print(f"compacted as version {v}")
        return 0

    if not args.key:
        print("diff requires --key", file=sys.stderr)
        return 2
    key = args.key.split(",")
    last = V.latest_version(args.table_path)
    v_new = args.v_new if args.v_new is not None else last
    v_old = args.v_old if args.v_old is not None else max(v_new - 1, 0)
    d = V.key_diff_versions(spark, args.table_path, key, v_old=v_old, v_new=v_new)

    from pyspark.sql import functions as F

    stats = {
        r["diff_kind"]: r["n"]
        for r in d.groupBy("diff_kind").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(f"diff v{v_old} -> v{v_new}")
    for kind in ("added", "removed", "changed", "unchanged"):
        print(f"# of {kind} rows: {stats.get(kind, 0)}")
    order = [F.col(k).asc_nulls_last() for k in key]
    _emit(d, args.output, args.limit, order_by=order, fmt=args.output_format)
    return 0


def dq_main(argv: list[str] | None = None) -> int:
    """Data-quality expectation report over one Avro/parquet dataset
    (operators/quality.expectation_report behind the CLI conventions of
    the other binaries; beyond-reference surface). Exit code 1 when any
    rule records violations — the CI-gate shape."""
    p = argparse.ArgumentParser(
        prog="dq", description="Run data-quality expectations over a dataset."
    )
    p.add_argument("input")
    p.add_argument("--format", choices=["auto", "avro", "parquet"], default="auto")
    p.add_argument(
        "--not-null", default=None, help="comma-separated columns that must be non-null"
    )
    p.add_argument(
        "--unique", default=None, help="comma-separated key columns that must be unique"
    )
    p.add_argument(
        "--violation",
        action="append",
        default=[],
        metavar="NAME:SQL",
        help="named rule: SQL predicate TRUE for rows VIOLATING it "
        "(repeatable), e.g. price_pos:'price <= 0'",
    )
    p.add_argument(
        "--fk",
        action="append",
        default=[],
        metavar="COL:REF_PATH:REF_COL",
        help="referential rule: COL values must exist in REF_COL of the "
        "dataset at REF_PATH (repeatable)",
    )
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from avro_diff_spark.operators.quality import expectation_report

    spark = _session(args)
    df = _read(spark, args.input, args.format, None, None)
    violations = {}
    for c in _split(args.not_null) or []:
        violations[f"not_null_{c}"] = F.col(c).isNull()
    for spec in args.violation:
        name, _, sql = spec.partition(":")
        if not sql:
            print(f"bad --violation {spec!r} (want NAME:SQL)", file=sys.stderr)
            return 2
        violations[name] = F.expr(sql)
    unique = (
        {"unique_" + args.unique.replace(",", "_"): _split(args.unique)}
        if args.unique
        else None
    )
    fk = {}
    for spec in args.fk:
        # URI-scheme-tolerant: COL is everything before the FIRST colon,
        # REF_COL everything after the LAST (s3://... paths keep theirs)
        col, _, rest = spec.partition(":")
        ref_path, _, ref_col = rest.rpartition(":")
        if not col or not ref_path or not ref_col:
            print(f"bad --fk {spec!r} (want COL:REF_PATH:REF_COL)", file=sys.stderr)
            return 2
        fk[f"fk_{col}"] = (_read(spark, ref_path, args.format, None, None), col, ref_col)
    if not violations and not unique and not fk:
        print("no rules given", file=sys.stderr)
        return 2
    rows = expectation_report(
        df, violations=violations or None, unique=unique, fk=fk or None
    ).collect()
    bad = 0
    for r in rows:
        mark = "FAIL" if r["violations"] else "ok"
        print(f"{mark:4} {r['rule']}: {r['violations']} violations / {r['n_checked']} rows")
        bad += r["violations"]
    return 1 if bad else 0


def digest_main(argv: list[str] | None = None) -> int:
    """Merkle digest comparison of two datasets (operators/digest.py):
    report mismatched buckets, optionally run the keyed diff pruned to
    them. The re-diff shape: at 100 TB the digest pass is two scans +
    two <= num_buckets-row shuffles, and --diff pays the full-outer join
    only over the changed slice. Exit 0 when the digests match."""
    p = argparse.ArgumentParser(
        prog="digest", description="Bucket-digest comparison of two datasets."
    )
    _common(p)
    p.add_argument("key", help="comma-separated composite key fields")
    p.add_argument("--buckets", type=int, default=1024, help="digest buckets")
    p.add_argument(
        "--diff",
        action="store_true",
        help="also run the keyed diff restricted to mismatched buckets",
    )
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from avro_diff_spark.operators import digest as dig

    spark = _session(args)
    schema = _schema_arg(args)
    old = _read(spark, args.old_file, args.format, _split(args.keep_fields), _split(args.ignore_fields), schema)
    new = _read(spark, args.new_file, args.format, _split(args.keep_fields), _split(args.ignore_fields), schema)
    key = args.key.split(",")
    # collect the (<= num_buckets-row) mismatch report ONCE; the pruned
    # diff below reuses the bucket ids instead of re-running the digest
    # scans — at the 100 TB re-diff scale the digest pass IS the cost
    changed = dig.digest_diff(old, new, key, num_buckets=args.buckets).collect()
    n_old = sum(r["old_rows"] for r in changed)
    n_new = sum(r["new_rows"] for r in changed)
    print(
        f"# of mismatched buckets: {len(changed)} / {args.buckets} "
        f"(old rows in them: {n_old}, new rows: {n_new})"
    )
    if args.diff and changed:
        d = dig.key_diff_pruned(
            old,
            new,
            key,
            num_buckets=args.buckets,
            changed_buckets=[r["bucket"] for r in changed],
        ).where(F.col("diff_kind") != "unchanged")
        counts = {
            r["diff_kind"]: r["cnt"]
            for r in d.groupBy("diff_kind").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        for kind in ("added", "removed", "changed"):
            print(f"# of {kind} rows: {counts.get(kind, 0)}")
        order = [F.col(k).asc_nulls_last() for k in key]
        _emit(d, args.output, args.limit, order_by=order, fmt=args.output_format)
    return 1 if changed else 0


def drift_main(argv: list[str] | None = None) -> int:
    """Two-sample distribution drift between two datasets over one column
    (functions/drift.py TVD): numeric with --cuts, categorical without.
    Exit 1 when tvd_x1e6 exceeds --threshold (default: any drift)."""
    p = argparse.ArgumentParser(
        prog="drift", description="Total-variation drift between two datasets."
    )
    _common(p)
    p.add_argument("column")
    p.add_argument(
        "--cuts",
        default=None,
        help="comma-separated ascending numeric cut points (omit for a "
        "categorical column: buckets are the observed values)",
    )
    p.add_argument(
        "--threshold",
        type=int,
        default=0,
        help="exit 1 when tvd_x1e6 > this (0 = flag any drift)",
    )
    p.add_argument(
        "--stat",
        choices=("tvd", "ks"),
        default="tvd",
        help="tvd (default; --cuts for numeric, omit for categorical) or "
        "ks (two-sample Kolmogorov-Smirnov over the full value resolution "
        "of a numeric column — no cuts)",
    )
    args = p.parse_args(argv)

    from avro_diff_spark.functions.drift import (
        ks_distance,
        tv_distance,
        tv_distance_categorical,
    )

    spark = _session(args)
    schema = _schema_arg(args)
    a = _read(spark, args.old_file, args.format, _split(args.keep_fields), _split(args.ignore_fields), schema)
    b = _read(spark, args.new_file, args.format, _split(args.keep_fields), _split(args.ignore_fields), schema)
    if args.stat == "ks":
        if args.cuts:
            p.error("--stat ks reads the full value resolution; drop --cuts")
        r = ks_distance(a, b, args.column).collect()[0]
        print(
            f"n_old: {r['n_a']}  n_new: {r['n_b']}  points: {r['n_points']}  "
            f"ks_x1e6: {r['ks_x1e6']}"
        )
        return 1 if r["ks_x1e6"] > args.threshold else 0
    if args.cuts:
        cuts = tuple(float(c) for c in args.cuts.split(","))
        out = tv_distance(a, b, args.column, cuts)
    else:
        out = tv_distance_categorical(a, b, args.column)
    r = out.collect()[0]
    print(
        f"n_old: {r['n_a']}  n_new: {r['n_b']}  buckets: {r['n_buckets']}  "
        f"tvd_x1e6: {r['tvd_x1e6']}"
    )
    return 1 if r["tvd_x1e6"] > args.threshold else 0


def extract_main(argv: list[str] | None = None) -> int:
    """WARC -> documents: scan .warc/.warc.gz files (sources/warc.py),
    parse HTTP responses, extract boilerplate-free text
    (functions/html.py), and write a documents parquet — the ingestion
    front door of the pipeline."""
    p = argparse.ArgumentParser(
        prog="extract",
        description="Extract clean text documents from WARC web archives.",
    )
    p.add_argument("warc_path", help="file / directory / glob of .warc(.gz)")
    p.add_argument("out_parquet", help="destination parquet path")
    p.add_argument("--min-chars", type=int, default=80)
    p.add_argument(
        "--keep-empty",
        action="store_true",
        help="keep documents whose extraction produced no good blocks",
    )
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from avro_diff_spark.functions.html import extract_text_df
    from avro_diff_spark.session import get_spark
    from avro_diff_spark.sources.warc import read_warc

    spark = get_spark("extract")
    recs = read_warc(spark, args.warc_path).where(
        (F.col("warc_type") == "response") & F.col("body_text").isNotNull()
    )
    docs = extract_text_df(
        recs,
        "body_text",
        keep=("warc_file", "record_id", "target_uri", "http_status"),
        min_chars=args.min_chars,
    )
    if not args.keep_empty:
        docs = docs.where(F.col("n_good_blocks") > 0)
    docs.write.mode("overwrite").parquet(args.out_parquet)
    n = spark.read.parquet(args.out_parquet).count()
    print(f"documents: {n}  ->  {args.out_parquet}")
    return 0


def search_main(argv: list[str] | None = None) -> int:
    """Sparse retrieval over a documents parquet via the persisted BM25
    index (operators/text_index.py): build, incremental append/delete,
    and top-k queries — the round-12 index CRUD surface."""
    p = argparse.ArgumentParser(
        prog="search", description="BM25 index lifecycle + top-k queries."
    )
    sub = p.add_subparsers(dest="action", required=True)
    b = sub.add_parser("build", help="index a documents parquet from scratch")
    b.add_argument("docs_parquet")
    b.add_argument("index_dir")
    b.add_argument("--text-col", default="text")
    b.add_argument("--id-col", default="doc_id")
    a = sub.add_parser("append", help="index an increment (work ∝ increment)")
    a.add_argument("docs_parquet")
    a.add_argument("index_dir")
    a.add_argument("--text-col", default="text")
    a.add_argument("--id-col", default="doc_id")
    d = sub.add_parser("delete", help="remove documents by id (DV commit)")
    d.add_argument("index_dir")
    d.add_argument("ids", nargs="+", type=int)
    q = sub.add_parser("query", help="BM25 top-k for one query string")
    q.add_argument("index_dir")
    q.add_argument("text")
    q.add_argument("--k", type=int, default=10)
    args = p.parse_args(argv)

    from avro_diff_spark.operators import text_index as TI
    from avro_diff_spark.session import get_spark

    spark = get_spark("search")
    if args.action == "build":
        v = TI.build_text_index(
            spark, spark.read.parquet(args.docs_parquet), args.index_dir,
            text_col=args.text_col, id_col=args.id_col,
        )
        print(f"built {args.index_dir} at postings v{v}")
    elif args.action == "append":
        v = TI.append_to_text_index(
            spark, spark.read.parquet(args.docs_parquet), args.index_dir,
            text_col=args.text_col, id_col=args.id_col,
        )
        print(f"appended -> postings v{v}")
    elif args.action == "delete":
        v = TI.delete_from_text_index(spark, args.index_dir, args.ids)
        print(f"deleted {len(args.ids)} ids -> postings v{v}")
    else:
        rows = TI.query_text_index(
            spark, args.index_dir, [(0, args.text)], k=args.k
        ).collect()
        for r in sorted(rows, key=lambda r: r.rank):
            print(f"{r.rank:3d}  doc {r.doc_id}  score {r.score_x1e6}")
    return 0


def frontier_main(argv: list[str] | None = None) -> int:
    """One crawl-frontier wave (operators/frontier.py): pages parquet
    (url, html) + per-host robots parquet (host, robots)
    [+ sitemaps (xml)] [+ visited (url)] -> allowed deduped next-wave
    parquet with per-channel discovery counts."""
    p = argparse.ArgumentParser(
        prog="frontier", description="Expand the crawl frontier one wave."
    )
    p.add_argument("pages_parquet")
    p.add_argument("robots_parquet")
    p.add_argument("out_parquet")
    p.add_argument("--agent", required=True, help="product token (RFC 9309)")
    p.add_argument("--sitemaps", help="parquet of sitemap XML payloads (xml col)")
    p.add_argument("--visited", help="parquet of already-crawled URLs")
    p.add_argument(
        "--schedule-per-host",
        type=int,
        metavar="N",
        help="also politeness-schedule the wave: at most N URLs per host "
        "per fetch round (fetch_schedule, round 14 — adds host + wave "
        "columns, most-referenced first)",
    )
    args = p.parse_args(argv)

    from avro_diff_spark.operators.frontier import expand_frontier, fetch_schedule
    from avro_diff_spark.session import get_spark

    spark = get_spark("frontier")
    wave = expand_frontier(
        spark.read.parquet(args.pages_parquet),
        spark.read.parquet(args.robots_parquet),
        agent=args.agent,
        sitemaps=spark.read.parquet(args.sitemaps) if args.sitemaps else None,
        visited=spark.read.parquet(args.visited) if args.visited else None,
    )
    if args.schedule_per_host:
        wave = fetch_schedule(
            wave.localCheckpoint(),
            per_host=args.schedule_per_host,
            priority_col="n_refs",
        )
    wave.write.mode("overwrite").parquet(args.out_parquet)
    n = spark.read.parquet(args.out_parquet).count()
    print(f"frontier: {n} URLs  ->  {args.out_parquet}")
    return 0


def card_main(argv: list[str] | None = None) -> int:
    """Dataset card / card diff (round 14): one-table corpus summary of
    a documents parquet (doc_id, text, lang, source, n_chars), or —
    with --diff — the key_diff of two corpus generations' cards (the
    release report of what a cleaning step did)."""
    p = argparse.ArgumentParser(
        prog="card", description="Emit a dataset card, or diff two corpora's cards."
    )
    p.add_argument("docs_parquet")
    p.add_argument("out_parquet")
    p.add_argument(
        "--diff", metavar="NEW_PARQUET",
        help="second corpus: emit the per-metric card diff old -> new",
    )
    args = p.parse_args(argv)

    from avro_diff_spark.pipelines import _card_df
    from avro_diff_spark.session import get_spark

    spark = get_spark("card")
    old = _card_df(spark.read.parquet(args.docs_parquet))
    if args.diff:
        from avro_diff_spark.operators.key_diff import key_diff

        new = _card_df(spark.read.parquet(args.diff))
        out = key_diff(old, new, ["metric"], compare_cols=["value"]).select(
            "metric",
            "diff_kind",
            F.col("old.value").alias("old_value"),
            F.col("new.value").alias("new_value"),
        )
    else:
        out = old
    out.write.mode("overwrite").parquet(args.out_parquet)
    for r in sorted(
        spark.read.parquet(args.out_parquet).collect(), key=lambda r: r.metric
    ):
        if args.diff:
            print(f"{r.metric}: {r.old_value} -> {r.new_value} ({r.diff_kind})")
        else:
            print(f"{r.metric}: {r.value}")
    return 0


def lineage_main(argv: list[str] | None = None) -> int:
    """Print a recorded pipeline's lineage report (operators/lineage.py):
    per-stage counts, drops, and exact-integer retention ppm."""
    p = argparse.ArgumentParser(
        prog="lineage", description="Report a versioned lineage table."
    )
    p.add_argument("lineage_table")
    p.add_argument("--run-id", type=int)
    args = p.parse_args(argv)

    from avro_diff_spark.operators.lineage import lineage_report
    from avro_diff_spark.session import get_spark

    spark = get_spark("lineage")
    rows = lineage_report(
        spark, args.lineage_table, run_id=args.run_id
    ).collect()
    for r in sorted(rows, key=lambda r: (r.run_id, r.stage_idx)):
        print(
            f"run {r.run_id}  {r.stage_idx}:{r.stage:<20s} rows {r.n_rows:>10d}"
            f"  dropped {r.n_dropped:>10d}  retained {r.retained_ppm/10000:7.2f}%"
            f"  overall {r.overall_ppm/10000:7.2f}%"
        )
    return 0


def profile_main(argv: list[str]) -> int:
    """``profile`` — per-column stats, skew, and histograms for a parquet
    table: the onboarding pass (operators/profile.py, operators/skew.py)."""
    import argparse

    p = argparse.ArgumentParser(
        prog="profile", description="Profile a parquet table's columns."
    )
    p.add_argument("path")
    p.add_argument("--columns", help="comma-separated subset (default: all scalar)")
    p.add_argument("--skew-keys", help="comma-separated key columns for a skew report")
    p.add_argument("--top", type=int, default=10, help="hot keys to show (skew)")
    p.add_argument(
        "--hist",
        help="numeric column for an equi-width histogram: col:lo:hi:buckets",
    )
    args = p.parse_args(argv)

    from avro_diff_spark.operators.profile import column_histogram, profile_table
    from avro_diff_spark.session import get_spark

    spark = get_spark("profile")
    df = spark.read.parquet(args.path)
    cols = args.columns.split(",") if args.columns else None
    for r in sorted(profile_table(df, cols).collect(), key=lambda r: r.col_name):
        print(
            f"{r.col_name:<24s} rows {r.n_rows:>10d}  nulls {r.n_nulls:>8d}"
            f"  distinct {r.n_distinct:>8d}  min {r.min_repr!r}  max {r.max_repr!r}"
        )
    if args.skew_keys:
        from avro_diff_spark.operators.skew import skew_report

        keys = args.skew_keys.split(",")
        print(f"\nskew report on ({', '.join(keys)}):")
        for r in sorted(
            skew_report(df, keys, top=args.top).collect(), key=lambda r: r.rank
        ):
            key_repr = ", ".join(str(r[k]) for k in keys)
            print(
                f"  #{r.rank:<3d} ({key_repr})  rows {r.n_rows:>8d}"
                f"  share {r.share_x1e6/10000:6.2f}%  skew {r.skew_x1e6/1e6:8.1f}x"
            )
    if args.hist:
        try:
            col, lo_s, hi_s, nb_s = args.hist.split(":")
            lo, hi, nb = float(lo_s), float(hi_s), int(nb_s)
        except ValueError:
            p.error(f"--hist expects col:lo:hi:buckets, got {args.hist!r}")
        print(f"\nhistogram of {col} over [{lo_s}, {hi_s}) x{nb_s}:")
        rows = column_histogram(df, col, lo, hi, nb).collect()
        peak = max(r.n_rows for r in rows) if rows else 1
        for r in sorted(rows, key=lambda r: r.bucket):
            bar = "#" * max(1, round(40 * r.n_rows / peak))
            print(f"  [{r.bucket:>3d}] {r.n_rows:>10d} {bar}")
    return 0


_COMMANDS = {
    "key_diff": key_diff_main,
    "venn_diff": venn_diff_main,
    "dedup": dedup_main,
    "digest": digest_main,
    "drift": drift_main,
    "dq": dq_main,
    "table": table_main,
    "extract": extract_main,
    "search": search_main,
    "frontier": frontier_main,
    "card": card_main,
    "lineage": lineage_main,
    "profile": profile_main,
}


def main() -> int:
    """Dispatcher: python -m avro_diff_spark.cli {key_diff|venn_diff|dedup|digest|drift|dq|table|extract|search|frontier|card|lineage|profile} ..."""
    if len(sys.argv) < 2 or sys.argv[1] not in _COMMANDS:
        print(
            "usage: python -m avro_diff_spark.cli {key_diff|venn_diff|dedup|digest|drift|dq|table|extract|search|frontier|card|lineage|profile} ...",
            file=sys.stderr,
        )
        return 2
    return _COMMANDS[sys.argv[1]](sys.argv[2:])


if __name__ == "__main__":
    raise SystemExit(main())
