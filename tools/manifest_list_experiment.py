"""Measure the format-2 manifest-list planning payoff: metadata-only
(no Spark, no data files) commits of N fake files with disjoint key
ranges, then time (a) full snapshot resolution (what format 1 pays on
EVERY plan), (b) a group-pruned point-range plan, and (c) one append's
metadata cost — inline rewrite vs group extension.

Usage: python tools/manifest_list_experiment.py [n_files]
Prints one JSON line; numbers are quoted in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from music_streaming_etl_glue_spark.plans import lakehouse as L  # noqa: E402

SCHEMA_JSON = (
    '{"type":"struct","fields":['
    '{"name":"id","type":"long","nullable":true,"metadata":{}}]}'
)


def _commit_fake(table: str, n: int, start: int = 0) -> int:
    files = [f"data/f/{start + i:09d}.parquet" for i in range(n)]
    stats = {
        f: {"id": [(start + i) * 100, (start + i) * 100 + 99]}
        for i, f in enumerate(files)
    }
    return L._commit(
        table, "append", files, SCHEMA_JSON, n, True, stats=stats
    )


def _timed(fn, reps: int = 5) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 4)


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    work = tempfile.mkdtemp(prefix="mlx_")
    out: dict = {"n_files": n_files}
    try:
        # format 2 (the default past the inline limit)
        t2 = f"{work}/grouped"
        _commit_fake(t2, n_files)
        raw2 = L._load_manifest(t2, 1, resolve=False)
        out["format"] = raw2.get("format", 1)
        out["n_groups"] = len(raw2.get("groups", []))
        out["resolve_all_s"] = _timed(lambda: L._load_manifest(t2, 1))
        out["load_list_only_s"] = _timed(
            lambda: L._load_manifest(t2, 1, resolve=False)
        )
        target = (n_files // 2) * 100 + 5
        out["point_plan_s"] = _timed(
            lambda: L.plan_snapshot_files(
                t2,
                L._load_manifest(t2, 1, resolve=False),
                {"id": (target, target)},
            )
        )
        plan = L.plan_snapshot_files(
            t2, raw2, {"id": (target, target)}
        )
        out["point_plan_files"] = len(plan)
        # append metadata cost: extend-by-reference vs what an inline
        # rewrite would pay (force format 1 by lifting the limit)
        t0 = time.monotonic()
        _commit_fake(t2, 64, start=n_files)
        out["append64_grouped_s"] = round(time.monotonic() - t0, 4)
        t1dir = f"{work}/inline"
        saved = L.MANIFEST_INLINE_LIMIT
        L.MANIFEST_INLINE_LIMIT = 10**9
        try:
            _commit_fake(t1dir, n_files)
            t0 = time.monotonic()
            _commit_fake(t1dir, 64, start=n_files)
            out["append64_inline_s"] = round(time.monotonic() - t0, 4)
            out["inline_point_plan_s"] = _timed(
                lambda: L.plan_snapshot_files(
                    t1dir,
                    L._load_manifest(t1dir, 1, resolve=False),
                    {"id": (target, target)},
                )
            )
        finally:
            L.MANIFEST_INLINE_LIMIT = saved
        out["append_speedup"] = round(
            out["append64_inline_s"] / out["append64_grouped_s"], 1
        )
        out["plan_speedup"] = round(
            out["inline_point_plan_s"] / out["point_plan_s"], 1
        )
        # fragmentation: a long-running stream committing tiny epochs
        # grows ONE group entry per epoch, so the version manifest —
        # which EVERY plan must load and range-scan — degenerates to
        # O(epochs). Build the 20k-epoch end state directly (20k 2-file
        # groups via a pre-packed commit — the per-commit path is the
        # same _pack_groups), measure a planner's true cost (manifest
        # load + entry scan + group open), then the metadata-only
        # rewrite_manifests merge, then the same plan on the merged
        # layout.
        tf = f"{work}/fragmented"
        n_epochs = 20_000
        saved_target = L.MANIFEST_GROUP_TARGET
        L.MANIFEST_GROUP_TARGET = 2
        try:
            files = [f"data/f/{i:09d}.parquet" for i in range(n_epochs * 2)]
            stats = {
                f: {"id": [i * 100, i * 100 + 99]}
                for i, f in enumerate(files)
            }
            packed = L._pack_groups(tf, files, stats)
        finally:
            L.MANIFEST_GROUP_TARGET = saved_target
        L._commit(
            tf, "append", [], SCHEMA_JSON, n_epochs * 2, False,
            new_groups=packed,
        )
        out["frag_epochs"] = n_epochs
        out["frag_groups_before"] = len(packed)
        out["frag_manifest_bytes"] = os.path.getsize(
            L._manifest_path(tf, 1)
        )
        ptarget = n_epochs * 100 + 5  # mid-table point lookup

        def plan(version):
            return L.plan_snapshot_files(
                tf,
                L._load_manifest(tf, version, resolve=False),
                {"id": (ptarget, ptarget)},
            )

        out["frag_point_plan_s"] = _timed(lambda: plan(1))
        t0 = time.monotonic()
        v_rw = L.rewrite_manifests(tf)
        out["rewrite_manifests_s"] = round(time.monotonic() - t0, 4)
        comp_raw = L._load_manifest(tf, v_rw, resolve=False)
        out["frag_groups_after"] = len(comp_raw["groups"])
        out["compacted_manifest_bytes"] = os.path.getsize(
            L._manifest_path(tf, v_rw)
        )
        out["compacted_point_plan_s"] = _timed(lambda: plan(v_rw))
        assert plan(1) == plan(v_rw)  # same files either way
        out["frag_plan_speedup"] = round(
            out["frag_point_plan_s"] / out["compacted_point_plan_s"], 1
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
