"""Measure the key-range-pruned MERGE payoff on a format-2 table
(VERDICT r12 what's-missing #4: the pruning landed in r12 without a
number): build an N-file table with disjoint per-file key ranges, then
time a 10-key ``commit_upsert`` twice — pruned (the shipped path) and
with pruning disabled (every file conservatively "hit", the pre-r12
whole-snapshot rewrite) — and report files rewritten / files total and
wall seconds for each.

Usage: python tools/upsert_prune_experiment.py [n_files]
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


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rows_per_file = 200_000
    files_per_commit = 8
    spark = get_spark("upsert_prune_experiment")
    work = tempfile.mkdtemp(prefix="upx_")
    out: dict = {"n_files": n_files, "rows_per_file": rows_per_file}
    try:
        saved = L.MANIFEST_INLINE_LIMIT
        L.MANIFEST_INLINE_LIMIT = 4  # force format 2 at any size
        try:
            t = f"{work}/tbl"
            for c in range(n_files // files_per_commit):
                lo = c * files_per_commit * rows_per_file
                n = files_per_commit * rows_per_file
                L.commit_append(
                    spark.range(lo, lo + n)
                    .selectExpr("id", "repeat(CAST(id AS STRING), 8) AS s")
                    .repartitionByRange(files_per_commit, "id"),
                    t,
                )
            man = L._load_manifest(t, L.current_version(t), resolve=False)
            out["files_total"] = L.manifest_n_files(man)

            def updates():
                return spark.createDataFrame(
                    [(7, "updated")], "id long, s string"
                )

            # warm the JVM/reader paths so neither timed run pays
            # first-use costs the other doesn't
            L.commit_upsert(updates(), t, keys=["id"])

            before = set(L._load_manifest(t, L.current_version(t))["files"])
            t0 = time.monotonic()
            v = L.commit_upsert(updates(), t, keys=["id"])
            out["pruned_merge_s"] = round(time.monotonic() - t0, 3)
            after = set(L._load_manifest(t, v)["files"])
            out["files_rewritten_pruned"] = len(before - after)

            # disable pruning: every stats map "may hit" — the
            # pre-key-range behavior (whole-snapshot rewrite)
            real = L._ranges_may_match
            L._ranges_may_match = lambda fstats, preds: True
            try:
                before = set(L._load_manifest(t, v)["files"])
                t0 = time.monotonic()
                v2 = L.commit_upsert(updates(), t, keys=["id"])
                out["unpruned_merge_s"] = round(time.monotonic() - t0, 3)
                after = set(L._load_manifest(t, v2)["files"])
                out["files_rewritten_unpruned"] = len(before - after)
            finally:
                L._ranges_may_match = real
            out["merge_speedup"] = round(
                out["unpruned_merge_s"] / out["pruned_merge_s"], 1
            )
        finally:
            L.MANIFEST_INLINE_LIMIT = saved
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
