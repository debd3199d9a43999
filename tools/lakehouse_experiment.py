"""Measure the lakehouse data-skipping payoff: the same narrow-range
filter+aggregate over (a) the full snapshot file list vs (b) the
manifest-stats-pruned list, before and after a Z-ordered compaction.

The write pattern models an appended fact table: each append's key range
interleaves with every other, so pre-clustering no file is skippable;
after `compact_zordered` the per-file ranges are tight and the manifest
prune drops most of the file list before Spark plans the scan.

Usage: python tools/lakehouse_experiment.py [n_rows] [n_appends]
Prints one JSON line; numbers are quoted in SCALE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from music_streaming_etl_glue_spark.plans import lakehouse as L  # noqa: E402
from music_streaming_etl_glue_spark.session import get_spark  # noqa: E402


def _timed(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_appends = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("lakehouse_experiment")
    root = tempfile.mkdtemp(prefix="lake_exp_")
    tbl = f"{root}/tbl"
    per = n_rows // n_appends
    for a in range(n_appends):
        # every append spans the FULL key domain (interleaved ingest)
        df = (
            spark.range(per)
            .selectExpr(
                f"id * {n_appends} + {a} AS id",
                f"CAST((id * {n_appends} + {a}) % 100000 AS DOUBLE) AS x",
                "CAST(id AS STRING) AS payload",
            )
            .coalesce(4)
        )
        L.commit_append(df, tbl)
    lo, hi = 1000.0, 1999.0  # a 1% x-range slice

    def agg(prune):
        df = L.read_snapshot(spark, tbl, prune=prune)
        return (
            df.filter(f"x >= {lo} AND x <= {hi}")
            .agg({"x": "sum", "id": "count"})
            .collect()[0]
        )

    man1 = L._load_manifest(tbl, L.current_version(tbl))
    pre_files = len(man1["files"])
    pre_pruned = len(L.prune_files(man1, {"x": (lo, hi)}))
    t_pre_full = _timed(lambda: agg(None))
    t_pre_pruned = _timed(lambda: agg({"x": (lo, hi)}))

    v = L.compact_zordered(spark, tbl, cols=["x"], target_files=pre_files)
    man2 = L._load_manifest(tbl, v)
    post_files = len(man2["files"])
    post_pruned = len(L.prune_files(man2, {"x": (lo, hi)}))
    t_post_full = _timed(lambda: agg(None))
    t_post_pruned = _timed(lambda: agg({"x": (lo, hi)}))

    # correctness: all four reads agree
    r = [agg(None), agg({"x": (lo, hi)})]
    assert r[0] == r[1], (r[0], r[1])

    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "pre": {
                    "files": pre_files,
                    "pruned_to": pre_pruned,
                    "full_s": t_pre_full,
                    "pruned_s": t_pre_pruned,
                },
                "post_zorder": {
                    "files": post_files,
                    "pruned_to": post_pruned,
                    "full_s": t_post_full,
                    "pruned_s": t_post_pruned,
                },
            }
        )
    )
    shutil.rmtree(root)


if __name__ == "__main__":
    main()
