"""r15 optimization profiler: isolate the expensive queries per guide §1.

For each named query (args, default: the slowest ~30 from the last bench):
  * time the count() action (bench methodology) AND a noop-sink write
    (guide §1.4 — computes every column, no count-pruning),
  * pull per-job/stage metrics from the live UI REST API (executor run
    time, shuffle read/write bytes, task counts) so stage-level
    attribution is empirical, not guessed,
  * dump .explain("formatted") to plans/r15/<query>_before.txt (or
    _after.txt with --after).

Usage: python tools/profile_r15.py [--after] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

DEFAULT_QUERIES = [
    "text_semantic_pairs",
    "semantic_dedup_clusters",
    "audio_dedup_clusters",
    "jaccard_pairs_prefix_zipf",
    "image_near_dedup_apply",
    "nb_source_classifier",
    "containment_pairs_prefix",
    "audio_near_dedup_apply",
    "jaccard_pairs_prefix",
    "image_dedup_clusters",
    "containment_pairs_prefix_zipf",
    "winnow_near_dups",
    "cosine_pairs_lsh",
    "zipf_documents",
    "track_communities",
    "ann_topk_video",
    "knn_recall_audit_video",
    "dedup_clusters_twophase",
    "near_dedup_apply",
    "video_near_dedup_apply",
    "bpe_merges",
    "track_pagerank",
    "ann_topk_image",
    "track_ppr",
    "video_dedup_clusters",
    "knn_recall_audit_image",
    "simhash_near_dups",
    "dedup_clusters",
    "track_reach",
    "dsir_sample",
]

UI_PORT = 4049


def _rest(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    suffix = "_after" if "--after" in sys.argv else "_before"
    names = args or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from music_streaming_etl_glue_spark.session import get_spark

    spark = get_spark(
        "profile_r15",
        extra_conf={
            "spark.driver.memory": "28g",
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
        },
    )
    queries = entry_mod.queries()
    app_id = spark.sparkContext.applicationId

    # warmup exactly like bench.py
    next(iter(queries.values()))(spark, sf_dir).count()
    n_workers = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(0, n_workers * 8, 1, n_workers).mapInPandas(
        lambda it: it, "id long"
    ).count()
    for indexed in (
        "ann_topk_ivf", "ann_topk_ivf_centroid", "ann_topk_pq",
        "ann_topk_ivfpq", "knn_join_ivfpq_after_delete", "ann_topk_image",
        "ann_topk_audio", "ann_topk_video", "lake_cdf_stream_fold",
    ):
        if indexed in queries and indexed in names:
            queries[indexed](spark, sf_dir).count()
    if hasattr(entry_mod, "_zipf_docs_cached"):
        entry_mod._zipf_docs_cached(spark, sf_dir).count()

    os.makedirs("/root/repo/plans/r15", exist_ok=True)
    results = {}
    for name in names:
        if name not in queries:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        jobs_before = {j["jobId"] for j in _rest(f"applications/{app_id}/jobs")}

        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        t_count = time.perf_counter() - t0

        # formatted plan (the build above already ran any side effects)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"/root/repo/plans/r15/{name}{suffix}.txt", "w") as fh:
            fh.write(plan)

        # warm re-run through the noop sink (all columns, no count pruning)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t_noop = time.perf_counter() - t0
        # warm count re-run (bench's warm number)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        t_count_warm = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)

        jobs = [
            j for j in _rest(f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stage_rows = []
        for j in jobs:
            for sid in j.get("stageIds", []):
                try:
                    st_list = _rest(f"applications/{app_id}/stages/{sid}")
                except Exception:
                    continue
                for st in st_list:
                    if st.get("status") == "SKIPPED":
                        continue
                    stage_rows.append({
                        "stage": sid,
                        "name": st.get("name", "")[:90],
                        "tasks": st.get("numCompleteTasks"),
                        "runTimeMs": st.get("executorRunTime"),
                        "cpuTimeMs": (st.get("executorCpuTime") or 0) // 1_000_000,
                        "shufReadMB": round((st.get("shuffleReadBytes") or 0) / 1e6, 2),
                        "shufWriteMB": round((st.get("shuffleWriteBytes") or 0) / 1e6, 2),
                        "inputMB": round((st.get("inputBytes") or 0) / 1e6, 2),
                    })
        stage_rows.sort(key=lambda r: -(r["runTimeMs"] or 0))
        results[name] = {
            "rows": n,
            "count_s": round(t_count, 3),
            "count_warm_s": round(t_count_warm, 3),
            "noop_s": round(t_noop, 3),
            "n_jobs": len(jobs),
            "n_stages": len(stage_rows),
            "top_stages": stage_rows[:8],
        }
        print(
            f"{name}: cold {t_count:.2f}s warm {t_count_warm:.2f}s "
            f"noop {t_noop:.2f}s jobs={len(jobs)} stages={len(stage_rows)} "
            f"rows={n}",
            file=sys.stderr,
        )

    out = f"/root/repo/plans/r15/profile{suffix}.json"
    mode = {}
    if os.path.exists(out):
        with open(out) as fh:
            mode = json.load(fh)
    mode.update(results)
    with open(out, "w") as fh:
        json.dump(mode, fh, indent=1)
    print(json.dumps({k: {kk: v[kk] for kk in ("count_s", "count_warm_s", "noop_s", "n_jobs")} for k, v in results.items()}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
