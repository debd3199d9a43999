"""Measure the per-file key-bloom payoff on a keyed delete over a
HASH-DISTRIBUTED key — the case min/max range pruning cannot touch
(every file's [min, max] spans the whole key domain, so a
right-to-be-forgotten delete of k keys degenerates to a full table
rewrite). Builds the same table twice (with and without
``bloom_cols``), deletes 5 keys, and reports files rewritten / files
total and wall seconds for each.

Usage: python tools/bloom_delete_experiment.py [n_files]
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
    rows_per_file = 100_000
    spark = get_spark("bloom_delete_experiment")
    work = tempfile.mkdtemp(prefix="blx_")
    out: dict = {"n_files": n_files, "rows_per_file": rows_per_file}
    try:
        def build(table: str, bloom: bool) -> None:
            # hash-scatter ids so EVERY file spans ~the whole key domain
            df = spark.range(0, n_files * rows_per_file).selectExpr(
                "CAST(hash(id) AS LONG) * 1000000 + id AS id",
                "repeat(CAST(id AS STRING), 4) AS s",
            ).repartition(n_files)
            L.commit_append(
                df, table, bloom_cols=["id"] if bloom else None
            )

        def run_delete(table: str) -> tuple[float, int]:
            doomed = [
                r["id"]
                for r in L.read_snapshot(spark, table).limit(5).collect()
            ]
            before = set(L._load_manifest(table, 1)["files"])
            t0 = time.monotonic()
            v = L.commit_delete(spark, table, "id", doomed)
            dt = round(time.monotonic() - t0, 3)
            after = set(L._load_manifest(table, v)["files"])
            return dt, len(before - after)

        t_plain = f"{work}/plain"
        build(t_plain, bloom=False)
        run_delete(t_plain)  # warm the JVM paths once
        # rebuild for a like-for-like single-delete measurement
        shutil.rmtree(t_plain)
        build(t_plain, bloom=False)
        out["plain_delete_s"], out["files_rewritten_plain"] = run_delete(
            t_plain
        )

        t_bloom = f"{work}/bloomed"
        t0 = time.monotonic()
        build(t_bloom, bloom=True)
        out["bloomed_commit_s"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        build(f"{work}/plain2", bloom=False)
        out["plain_commit_s"] = round(time.monotonic() - t0, 3)
        out["bloomed_delete_s"], out["files_rewritten_bloomed"] = run_delete(
            t_bloom
        )
        out["delete_speedup"] = round(
            out["plain_delete_s"] / out["bloomed_delete_s"], 1
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
