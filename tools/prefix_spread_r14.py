"""r14 A/B: where do the prefix miners spend time, and does an explicit
spread of the AQE-coalesced exchanges help?

Runs the named variants in ONE session (bench-style warm), printing
per-variant wall times and the live UI's per-stage attribution for the
slowest stages, so the fix is chosen empirically (guide §1).

Usage: python tools/prefix_spread_r14.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from music_streaming_etl_glue_spark.session import get_spark  # noqa: E402

UI_PORT = 4048


def _rest(app, path):
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app}/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "prefix_ab",
        extra_conf={
            "spark.driver.memory": "16g",
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
        },
    )
    app = spark.sparkContext.applicationId
    queries = entry_mod.queries()
    # warmup
    next(iter(queries.values()))(spark, sf_dir).count()
    if hasattr(entry_mod, "_zipf_docs_cached"):
        entry_mod._zipf_docs_cached(spark, sf_dir).count()

    for name in (
        "jaccard_pairs_prefix",
        "containment_pairs_prefix",
        "jaccard_pairs_prefix_zipf",
        "containment_pairs_prefix_zipf",
    ):
        fn = queries[name]
        jobs_before = {j["jobId"] for j in _rest(app, "jobs")}
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            times.append(round(time.perf_counter() - t0, 2))
        jobs = [j for j in _rest(app, "jobs") if j["jobId"] not in jobs_before]
        rows = []
        for j in jobs:
            for sid in j.get("stageIds", []):
                try:
                    sl = _rest(app, f"stages/{sid}")
                except Exception:
                    continue
                for st in sl:
                    if st.get("status") == "SKIPPED":
                        continue
                    rows.append(
                        (
                            sid,
                            st.get("numCompleteTasks"),
                            st.get("executorRunTime"),
                            (st.get("executorCpuTime") or 0) // 1_000_000,
                            round((st.get("shuffleReadBytes") or 0) / 1e6, 1),
                            round((st.get("shuffleWriteBytes") or 0) / 1e6, 1),
                            round((st.get("inputBytes") or 0) / 1e6, 1),
                        )
                    )
        rows.sort(key=lambda r: -(r[2] or 0))
        print(f"== {name}: runs {times} jobs={len(jobs)}")
        print("   sid tasks run_ms cpu_ms shR shW inMB")
        for r in rows[:10]:
            print("   " + " ".join(str(x) for x in r))
    spark.stop()


if __name__ == "__main__":
    main()
