"""Command-line entrypoint — the operational surface a reference user
drives through job scripts / the orchestrator
(/root/reference/dags/music_streaming_pipeline.py:670-679 submits three
Glue jobs; here each is a subcommand on one local SparkSession):

    python -m music_streaming_etl_glue_spark kpis  --sf-dir D --out DIR
    python -m music_streaming_etl_glue_spark llm   --sf-dir D --out DIR
    python -m music_streaming_etl_glue_spark query --sf-dir D NAME [NAME…]
    python -m music_streaming_etl_glue_spark refresh --old P --new P --out DIR
    python -m music_streaming_etl_glue_spark lake  --table DIR history|compact|vacuum|rollback|delete|delete-mor|delete-mor-where|scrub […]
    python -m music_streaming_etl_glue_spark ann   --registry DIR --layouts-root DIR bootstrap|retrain|current|vacuum-layouts […]
    python -m music_streaming_etl_glue_spark list

`kpis` runs the full batch pipeline (validate → enrich → 5 KPI tables →
serving layout + QA + engine fingerprint); `llm` runs the training-data
preparation flow (scrub → normalize → dedup ladder → decontaminate →
split → chunk → pack); `query` materializes any catalog query and prints
a sample + row count; `lake` runs the snapshot-table maintenance verbs
(commit log, compaction, vacuum, rollback, keyed delete, change-feed
scrub) against a lakehouse dir; `list` prints the catalog; `ann` drives the lake-backed IVF-PQ serving
registry end to end — bootstrap (train + commit the first pointer),
retrain (drift-gated, recall-audited candidate with a 1-row-commit
cutover), current (resolve / pin the serving layout), vacuum-layouts
(reference-counted sweep of unreferenced layout dirs).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="music_streaming_etl_glue_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("kpis", "llm"):
        s = sub.add_parser(name)
        s.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        s.add_argument("--out", required=True)
    r = sub.add_parser("refresh")
    r.add_argument("--old", required=True, help="current corpus parquet")
    r.add_argument("--new", required=True, help="incoming snapshot parquet")
    r.add_argument("--out", required=True)
    q = sub.add_parser("query")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=10)
    q.add_argument("names", nargs="+")
    lk = sub.add_parser("lake")
    lk.add_argument("--table", required=True, help="lakehouse table dir")
    lk.add_argument(
        "verb",
        choices=(
            "history", "compact", "vacuum", "rollback", "delete", "scrub",
            "rewrite-manifests", "delete-mor", "delete-mor-where",
            "changes",
        ),
    )
    lk.add_argument("--target-files", type=int, default=8)
    lk.add_argument("--zorder-by", nargs="*", default=None)
    lk.add_argument("--keep-versions", type=int, default=2)
    lk.add_argument("--min-age-s", type=float, default=3600.0)
    lk.add_argument("--to-version", type=int, default=None)
    lk.add_argument("--key-col", default=None)
    # keys arrive as strings and are coerced against the TABLE schema at
    # delete time — string-keyed tables (user ids, doc ids) are the
    # common right-to-be-forgotten case, so type=int here would be wrong
    lk.add_argument("--keys", nargs="*", default=None)
    lk.add_argument(
        "--where", default=None,
        help="delete-mor-where: SQL predicate selecting the doomed "
        "rows; their keys are committed as a merge-on-read delete "
        "RELATION executor-side (commit_delete_mor_df) — never "
        "collected to the driver",
    )
    lk.add_argument(
        "--cursor", default=None,
        help="scrub: cursor file tracking the last scrubbed version",
    )
    lk.add_argument(
        "--from-version", type=int, default=0,
        help="changes: exclusive lower version bound of the feed",
    )
    an = sub.add_parser("ann")
    an.add_argument(
        "verb",
        choices=("bootstrap", "retrain", "current", "vacuum-layouts"),
    )
    an.add_argument("--registry", required=True, help="registry table dir")
    an.add_argument(
        "--layouts-root", default=None,
        help="dir holding immutable layout dirs (bootstrap/retrain/"
        "vacuum-layouts)",
    )
    an.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    an.add_argument(
        "--max-mean-sq-err", type=float, default=0.0,
        help="retrain: reconstruction-error drift gate (0 forces retrain)",
    )
    an.add_argument(
        "--min-recall", type=float, default=0.0,
        help="retrain: candidate cutover needs >= this audited recall@k",
    )
    an.add_argument("--keep-versions", type=int, default=2)
    an.add_argument("--min-age-s", type=float, default=3600.0)
    an.add_argument(
        "--version", type=int, default=None,
        help="current: pin a registry version instead of the newest",
    )
    sub.add_parser("list")
    args = p.parse_args(argv)

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod

    if args.cmd == "list":
        for name in entry_mod.queries():
            print(name)
        return 0

    if args.cmd == "ann":
        from music_streaming_etl_glue_spark.operators import similarity as S
        from music_streaming_etl_glue_spark.session import get_spark as _gs
        from music_streaming_etl_glue_spark.sources.catalog import load_table

        sp = _gs("cli-ann")
        if args.verb == "current":
            path = S.current_ivfpq_layout(sp, args.registry, args.version)
            print(json.dumps({"layout_path": path}))
            return 0
        if args.verb == "vacuum-layouts":
            if not args.layouts_root:
                print("vacuum-layouts needs --layouts-root", file=sys.stderr)
                return 2
            deleted = S.vacuum_ivfpq_layouts(
                sp, args.registry, args.layouts_root,
                args.keep_versions, args.min_age_s,
            )
            print(json.dumps({"deleted": deleted}))
            return 0
        if not args.layouts_root:
            print(f"{args.verb} needs --layouts-root", file=sys.stderr)
            return 2
        embs = load_table(sp, args.sf_dir, "embeddings")
        if args.verb == "bootstrap":
            version, path = S.commit_ivfpq_layout(
                sp, embs, args.registry, args.layouts_root
            )
            print(
                json.dumps(
                    {"registry_version": version, "layout_path": path}
                )
            )
            return 0
        audit = S.retrain_ivfpq_lake(
            sp, embs, args.registry, args.layouts_root,
            args.max_mean_sq_err, args.min_recall,
        )
        print(json.dumps(audit))
        return 0

    if args.cmd == "lake":
        from music_streaming_etl_glue_spark.plans import lakehouse

        if args.verb == "history":
            print(json.dumps(lakehouse.history(args.table)))
            return 0
        if args.verb == "rewrite-manifests":
            v = lakehouse.rewrite_manifests(args.table)
            print(json.dumps({"committed_version": v, "noop": v is None}))
            return 0
        if args.verb == "vacuum":
            deleted = lakehouse.vacuum(
                args.table, args.keep_versions, args.min_age_s
            )
            print(json.dumps({"deleted": deleted}))
            return 0
        if args.verb == "rollback":
            if args.to_version is None:
                print("rollback needs --to-version", file=sys.stderr)
                return 2
            v = lakehouse.rollback(args.table, args.to_version)
            print(json.dumps({"committed_version": v}))
            return 0
        # compact / delete need a session
        from music_streaming_etl_glue_spark.session import get_spark as _gs

        sp = _gs("cli-lake")
        if args.verb == "changes":
            from pyspark.sql import functions as F

            from music_streaming_etl_glue_spark.plans import lake_cdf

            feed = lake_cdf.snapshot_changes(
                sp, args.table, args.from_version, args.to_version
            )
            counts = {
                r["_change_type"]: r["n"]
                for r in feed.groupBy("_change_type")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            print(
                json.dumps(
                    {
                        "from_version": args.from_version,
                        "to_version": (
                            args.to_version
                            if args.to_version is not None
                            else lakehouse.current_version(args.table)
                        ),
                        "inserts": counts.get("insert", 0),
                        "deletes": counts.get("delete", 0),
                    }
                )
            )
            return 0
        if args.verb == "scrub":
            if not args.cursor:
                print("scrub needs --cursor", file=sys.stderr)
                return 2
            from music_streaming_etl_glue_spark.plans.lake_scrub import (
                scrub_lake_changes,
            )

            res = scrub_lake_changes(sp, args.table, args.cursor)
            print(
                json.dumps(
                    {
                        "from_version": res.from_version,
                        "to_version": res.to_version,
                        "mode": res.mode,
                        "changed_docs": res.changed_docs,
                        "flagged_dups": (
                            res.flags.filter("NOT keep").count()
                            if res.flags is not None
                            else 0
                        ),
                    }
                )
            )
            return 0
        if args.verb == "delete-mor-where":
            if not args.key_col or not args.where:
                print(
                    "delete-mor-where needs --key-col and --where",
                    file=sys.stderr,
                )
                return 2
            keys_df = (
                lakehouse.read_snapshot(sp, args.table)
                .filter(args.where)
                .select(args.key_col)
            )
            v = lakehouse.commit_delete_mor_df(
                sp, args.table, args.key_col, keys_df
            )
            print(json.dumps({"committed_version": v}))
            return 0
        if args.verb in ("delete", "delete-mor"):
            if not args.key_col or not args.keys:
                print(
                    f"{args.verb} needs --key-col and --keys",
                    file=sys.stderr,
                )
                return 2
            keys = lakehouse.coerce_keys(
                args.table, args.key_col, args.keys
            )
            fn = (
                lakehouse.commit_delete
                if args.verb == "delete"
                else lakehouse.commit_delete_mor
            )
            v = fn(sp, args.table, args.key_col, keys)
            print(json.dumps({"committed_version": v}))
            return 0
        if args.zorder_by:
            v = lakehouse.compact_zordered(
                sp, args.table, args.zorder_by, args.target_files
            )
        else:
            v = lakehouse.compact(sp, args.table, args.target_files)
        print(json.dumps({"committed_version": v}))
        return 0

    from music_streaming_etl_glue_spark.session import get_spark

    spark = get_spark(f"cli-{args.cmd}")
    if args.cmd == "kpis":
        from music_streaming_etl_glue_spark.plans.pipeline import (
            run_batch_pipeline,
        )

        res = run_batch_pipeline(spark, args.sf_dir, args.out)
        print(
            json.dumps(
                {
                    "kpi_rows": res.kpi_rows,
                    "serving_rows": res.serving_rows,
                    "serving_qa": res.serving_qa,
                    "output_dir": res.output_dir,
                }
            )
        )
        return 0
    if args.cmd == "llm":
        from music_streaming_etl_glue_spark.plans.llm_pipeline import (
            run_llm_data_pipeline,
        )

        res = run_llm_data_pipeline(spark, args.sf_dir, args.out)
        print(
            json.dumps(
                {
                    "stage_counts": res.stage_counts,
                    "chunk_counts_by_split": res.chunk_counts_by_split,
                    "packed_examples_by_split": res.packed_examples_by_split,
                    "pii_redactions": res.pii_redactions,
                    "output_dir": res.output_dir,
                }
            )
        )
        return 0
    if args.cmd == "refresh":
        from music_streaming_etl_glue_spark.plans.snapshot_diff import (
            incremental_corpus_update,
        )

        old_df = spark.read.parquet(args.old)
        new_df = spark.read.parquet(args.new)
        corpus, audit = incremental_corpus_update(old_df, new_df)
        corpus.write.mode("overwrite").parquet(args.out)
        audit["corpus_rows"] = spark.read.parquet(args.out).count()
        print(json.dumps(audit))
        return 0
    # query
    catalog = entry_mod.queries()
    unknown = [n for n in args.names if n not in catalog]
    if unknown:
        print(f"unknown queries: {unknown} (see `list`)", file=sys.stderr)
        return 2
    for name in args.names:
        df = catalog[name](spark, args.sf_dir)
        n = df.count()
        print(f"== {name} ({n} rows)")
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # `| head` closing stdout is not an error
        raise SystemExit(0)
