"""End-to-end LLM training-data pipeline: stage audit trail, monotone
filtering, dedup invariants, split partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.plans.llm_pipeline import (
    run_llm_data_pipeline,
)
from tests.conftest import SF_SMOKE


def test_llm_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "training_data")
    res = run_llm_data_pipeline(spark, SF_SMOKE, out)

    # audit trail: every stage present, counts monotonically non-increasing
    stages = ["input", "quality_lang", "hard_rules", "exact_dedup",
              "boilerplate", "exact_substring", "near_dedup",
              "decontaminated",
              "ngram_decontaminated", "temperature_mix"]
    assert list(res.stage_counts) == stages
    seq = [res.stage_counts[s] for s in stages]
    assert all(a >= b for a, b in zip(seq, seq[1:]))
    assert seq[-1] > 0

    chunks = spark.read.parquet(out)
    # provenance survives; one doc never lands in two splits
    assert {"doc_id", "chunk_id", "chunk_text", "chunk_tokens", "split"} <= set(
        chunks.columns
    )
    two_splits = (
        chunks.groupBy("doc_id")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert two_splits == 0
    # surviving docs all produced chunks
    assert chunks.select("doc_id").distinct().count() == seq[-1]
    # split-partitioned layout on disk
    parts = {p.name for p in (tmp_path / "training_data").glob("split=*")}
    assert "split=train" in parts
    assert sum(res.chunk_counts_by_split.values()) == chunks.count()
    # per-doc chunk ids are contiguous 0..n-1 and unique (pack-stage
    # provenance contract)
    per_doc = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        F.countDistinct("chunk_id").alias("nd"),
        F.min("chunk_id").alias("lo"),
        F.max("chunk_id").alias("hi"),
    )
    broken = per_doc.filter(
        (F.col("n") != F.col("nd"))
        | (F.col("lo") != 0)
        | (F.col("hi") != F.col("n") - 1)
    )
    assert broken.count() == 0
    # split-hygiene audit reported: exact leaks are impossible (dedup
    # ran before the split), so the count is shingle-level and bounded
    # by the eval-split size
    assert res.leaky_eval_docs is not None
    n_eval = sum(
        v for k, v in res.chunk_counts_by_split.items() if k != "train"
    )
    assert 0 <= res.leaky_eval_docs
    eval_docs = (
        spark.read.parquet(res.output_dir)
        .filter(F.col("split") != "train")
        .select("doc_id")
        .distinct()
        .count()
    )
    assert res.leaky_eval_docs <= eval_docs


def test_llm_pipeline_packs_within_splits(spark, tmp_path):
    """The packed-example output never mixes splits inside one example
    (train/test leakage by construction) and covers every surviving
    document's chunks."""
    out = str(tmp_path / "td")
    res = run_llm_data_pipeline(spark, SF_SMOKE, out)
    packed = spark.read.parquet(out + "_packed")
    assert {"doc_id", "chunk_id", "chunk_tokens", "example_id", "split"} <= set(
        packed.columns
    )
    # example_id is per-split (packing runs within each split), so the
    # (split, example_id) pair is the example key
    by_pair = packed.select("split", "example_id").distinct().count()
    assert res.packed_examples_by_split is not None
    assert sum(res.packed_examples_by_split.values()) == by_pair
    # packed chunks = the non-overlapping chunking of surviving docs
    assert packed.select("doc_id").distinct().count() == res.stage_counts[
        "temperature_mix"
    ]


def test_llm_pipeline_fully_filtered_corpus(spark, tmp_path):
    """A quality gate nothing survives must yield empty outputs, not an
    AttributeError at the packing write (packed is None when there are
    no splits to pack)."""
    out = str(tmp_path / "empty_run")
    res = run_llm_data_pipeline(spark, SF_SMOKE, out, quality_min=1e9)
    assert res.stage_counts["quality_lang"] == 0
    assert res.chunk_counts_by_split == {}
    assert res.packed_examples_by_split == {}


def test_llm_pipeline_reports_pii_audit(spark, tmp_path):
    res = run_llm_data_pipeline(spark, SF_SMOKE, str(tmp_path / "o"))
    # synthetic corpus carries no PII: audit present, all-zero, and the
    # scrub provably didn't drop rows (input count unchanged upstream)
    assert set(res.pii_redactions) == {"email", "ipv4", "ssn", "phone"}
    assert all(v == 0 for v in res.pii_redactions.values())


def test_pipeline_schedule_covers_train_split(spark, tmp_path):
    """Step 9: every surviving train doc appears exactly once in the
    written (shard, pos) schedule, and positions are dense per shard."""
    from music_streaming_etl_glue_spark.plans.llm_pipeline import (
        run_llm_data_pipeline,
    )
    out = str(tmp_path / "chunks")
    res = run_llm_data_pipeline(spark, SF_SMOKE, out)
    assert res.scheduled_train_docs and res.scheduled_train_docs > 0
    sched = spark.read.parquet(out + "_schedule")
    assert sched.count() == res.scheduled_train_docs
    assert sched.select("doc_id").distinct().count() == res.scheduled_train_docs
    for shard_rows in (
        sched.groupBy("shard").agg(F.collect_list("pos").alias("ps")).collect()
    ):
        ps = sorted(shard_rows.ps)
        assert ps == list(range(1, len(ps) + 1))


def test_pipeline_publishes_corpus_as_lake_snapshot(spark, tmp_path):
    from music_streaming_etl_glue_spark.plans import lakehouse as L

    out = str(tmp_path / "chunks")
    tbl = str(tmp_path / "corpus_lake")
    res = run_llm_data_pipeline(spark, SF_SMOKE, out, publish_table=tbl)
    assert res.published_version == 1
    snap = L.read_snapshot(spark, tbl)
    # the published snapshot IS the chunk output (same rowset)
    assert snap.count() == sum(res.chunk_counts_by_split.values())
    assert "split" in snap.columns and "chunk_id" in snap.columns
    # a re-release lands as version 2; the pinned v1 read is unchanged
    res2 = run_llm_data_pipeline(spark, SF_SMOKE, out, publish_table=tbl)
    assert res2.published_version == 2
    assert L.read_snapshot(spark, tbl, 1).count() == snap.count()


def test_llm_pipeline_dsir_and_curriculum_path(spark, tmp_path):
    """The curated-tier composition (VERDICT r11 item #5): DSIR
    resampling between the quality gates and the dedup ladder, and a
    quality-phased curriculum schedule instead of the flat shuffle —
    with counts reconciling against the standalone operators."""
    from music_streaming_etl_glue_spark.operators import text as T

    out = str(tmp_path / "curated")
    keep = 0.5
    res = run_llm_data_pipeline(
        spark, SF_SMOKE, out, dsir_keep_frac=keep, curriculum=True
    )
    assert res.schedule_kind == "curriculum"
    # the DSIR stage sits between hard_rules and exact_dedup and the
    # monotone audit still holds across it
    stages = list(res.stage_counts)
    assert stages.index("dsir_resample") == stages.index("hard_rules") + 1
    seq = [res.stage_counts[s] for s in stages]
    assert all(a >= b for a, b in zip(seq, seq[1:]))
    # reconciliation with the standalone operator semantics:
    # survivors = all target-source docs + floor(keep * pool)
    flat = run_llm_data_pipeline(spark, SF_SMOKE, str(tmp_path / "flat"))
    n_gates = res.stage_counts["hard_rules"]
    assert flat.stage_counts["hard_rules"] == n_gates
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n_targets_total = docs.filter(
        F.col("source").isin(*T.DSIR_TARGET_SOURCES)
    ).count()
    n_targets = res.stage_counts["dsir_resample"] - int(
        keep * (n_gates - n_targets_total)
    )
    assert 0 < n_targets <= n_targets_total
    assert res.stage_counts["dsir_resample"] < n_gates
    # curriculum schedule: (phase, shard, pos) partitioned by phase,
    # contiguous pos within each (phase, shard), phases cover the train
    # docs exactly once
    sched = spark.read.parquet(out + "_schedule")
    assert {"doc_id", "phase", "shard", "pos"} <= set(sched.columns)
    assert sched.count() == res.scheduled_train_docs
    assert sched.select("doc_id").distinct().count() == sched.count()
    bad_pos = (
        sched.groupBy("phase", "shard")
        .agg(F.count("*").alias("n"), F.max("pos").alias("mx"))
        .filter(F.col("n") != F.col("mx"))
        .count()
    )
    assert bad_pos == 0
    assert set(
        r["phase"] for r in sched.select("phase").distinct().collect()
    ) <= {1, 2, 3}
