"""Dump PRE-checkpoint plans for kernels whose entry plans truncate at a
LogicalRDD scan (VERDICT r14 item #7: the zipf/LSH claims could not be
reproduced from `plans/r14/` because the dumps showed only the
post-checkpoint `Scan ExistingRDD`). Builds each kernel's relation
directly — before any localCheckpoint — and explains it to
plans/r15/<name>_kernel.txt.

Usage: python tools/dump_kernel_plans_r15.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/plans/r15"


def main() -> None:
    from music_streaming_etl_glue_spark.operators import dedup as dd
    from music_streaming_etl_glue_spark.operators import similarity as sim
    from music_streaming_etl_glue_spark.session import get_spark
    from music_streaming_etl_glue_spark.sources.catalog import load_table

    spark = get_spark("kernel-plans-r15")
    docs = load_table(spark, SF_DIR, "documents")
    embs = load_table(spark, SF_DIR, "embeddings")

    kernels = {
        # the zipf corpus synthesis — the r14 claim was "2 Exchange -> 0
        # in the synthesis subtree"; this is the subtree, pre-checkpoint
        "zipf_documents": dd.zipf_documents(docs),
        # the LSH bucket lane (signature GEMM + band fan-out), pre any
        # caller-side checkpoint
        "lsh_band_buckets": sim.lsh_band_buckets(embs),
        # winnowing fingerprints — r15 swapped the JVM window minima for
        # one MapInPandas; the claim is visible only pre-checkpoint
        "winnowing_fingerprints": dd.winnowing_fingerprints(docs),
    }
    os.makedirs(OUT, exist_ok=True)
    for name, df in kernels.items():
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"{OUT}/{name}_kernel.txt"
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(
            f"{name}: {path} (Exchange x{n_ex}, "
            f"MapInPandas={'MapInPandas' in plan}, "
            f"BatchEvalPython={'BatchEvalPython' in plan})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
