"""End-to-end LLM training-data pipeline: the composite that chains the
extension operators into the actual 100 TB preparation flow —

    normalize → quality/language filter → hard rule gates (Gopher-style)
    → exact dedup → boilerplate-span removal → ExactSubstr
    long-span scrub → near-dedup
    (MinHash-LSH → connected components) → decontamination (fingerprint
    + n-gram partial overlap) → temperature source mixing →
    deterministic split → chunk → provenance-preserving write →
    per-split sequence packing

Every stage is one of the individually-oracled operators; this module
only COMPOSES them, so the pipeline's correctness story is the sum of
its parts' oracle rows. What the composition adds:

* **Single lineage**: each stage consumes the previous stage's frame —
  Catalyst pipelines the narrow stages (normalize, score, filter) into
  one pass over the corpus; only dedup/clustering shuffle.
* **Monotone filtering**: stages only drop rows, so counts are
  monotonically non-increasing — the invariant the stage-count audit
  asserts (a stage that *adds* rows is a bug in a dedup pipeline).
* **Provenance**: chunks carry (doc_id, chunk_id, split); the output is
  partitioned by split so train/val/test reads prune.

At 100 TB this shape holds: narrow stages are scan-speed, the near-dedup
is the LSH-banded path (never all-pairs), and the write is
partition-pruned.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.operators import text as T
from music_streaming_etl_glue_spark.operators.clusters import dedup_clusters
from music_streaming_etl_glue_spark.operators.dedup import (
    dataset_split,
    dedup_apply,
    temperature_mix,
)
from music_streaming_etl_glue_spark.sources.catalog import load_table

QUALITY_MIN_SCORE = 0.5


@dataclass
class LlmPipelineResult:
    stage_counts: dict[str, int]
    chunk_counts_by_split: dict[str, int]
    output_dir: str
    #: distinct packed training examples per split (written beside the
    #: chunk output under ``<output_dir>_packed``)
    packed_examples_by_split: dict[str, int] | None = None
    #: train docs in the deterministic epoch schedule (step 9)
    scheduled_train_docs: int | None = None
    #: spans redacted per PII category (privacy-scrub audit; redaction
    #: rewrites text, never drops rows, so stage_counts stays monotone)
    pii_redactions: dict[str, int] | None = None
    #: lakehouse snapshot version the chunk output was published at
    #: (None unless ``publish_table`` was passed)
    published_version: int | None = None
    #: which training-order schedule step 9 emitted: "shuffle"
    #: (flat corpus_shuffle) or "curriculum" (quality-phased)
    schedule_kind: str = "shuffle"
    #: eval-split docs whose content leaks from the train split
    #: (shingle-level — exact dups are gone by the time the split runs);
    #: the number a release gate compares against its leakage budget
    leaky_eval_docs: int | None = None


def run_llm_data_pipeline(
    spark: SparkSession,
    sf_dir: str,
    output_dir: str,
    quality_min: float = QUALITY_MIN_SCORE,
    publish_table: str | None = None,
    dsir_keep_frac: float | None = None,
    curriculum: bool = False,
) -> LlmPipelineResult:
    """Run the full preparation flow over the ``documents`` table and
    write chunked, split-partitioned training data under ``output_dir``.
    Returns per-stage surviving-document counts (the audit trail a data
    pipeline must emit).

    ``publish_table`` additionally publishes the final chunk set as ONE
    atomic ``plans.lakehouse`` snapshot commit: consumers pinned on the
    previous corpus version keep reading it mid-publish, the new version
    appears all-or-nothing, and a bad release is a ``rollback`` away —
    the publication discipline a shared training corpus needs that a
    bare ``overwrite`` parquet write cannot give.

    ``dsir_keep_frac`` switches on the DSIR target-distribution stage
    (Xie et al. 2023; ``operators.text.dsir_sample``) between the
    quality gates and the dedup ladder: documents from the target
    sources all survive (they define the distribution being steered
    toward), and the remaining pool is Gumbel-top-k resampled
    ∝ exp(log-likelihood ratio) down to ``keep_frac`` of the pool —
    only drops rows, so the monotone stage-count audit holds.

    ``curriculum=True`` swaps step 9's flat ``corpus_shuffle`` schedule
    for the quality-phased ``curriculum_order`` (train on the cleanest
    tercile first, anneal onto the tail): the written schedule is
    partitioned by (phase, shard) so the trainer streams phase 1's
    shards before touching phase 2."""
    docs = load_table(spark, sf_dir, "documents")
    counts: dict[str, int] = {"input": docs.count()}

    # 0. privacy scrub — BEFORE normalization (normalize lowercases and
    # strips the @/punctuation the PII patterns anchor on). Rewrites
    # text in place; the per-category totals are the audit record.
    scrubbed = T.redact_pii(docs)
    pii_row = scrubbed.agg(
        *[
            F.sum(f"n_{tag.lower()}").alias(tag.lower())
            for tag, _ in T.PII_PATTERNS
        ]
    ).first()
    pii_redactions = {k: int(v or 0) for k, v in pii_row.asDict().items()}
    docs = docs.drop("text").join(
        scrubbed.select("doc_id", F.col("redacted_text").alias("text")),
        "doc_id",
    )

    # 1. normalize (narrow) — canonical text becomes the working text
    normed = T.normalize_text(docs).select(
        "doc_id", F.col("norm_text").alias("text")
    )
    joined = docs.drop("text").join(normed, "doc_id")

    # 2. quality + language gates (narrow, pipelined into one pass)
    quality = T.text_quality(joined).select("doc_id", "quality_score")
    lang = T.lang_id(joined).select("doc_id", "lang_pred")
    filtered = (
        joined.join(quality, "doc_id")
        .join(lang, "doc_id")
        .filter(
            (F.col("quality_score") >= quality_min)
            & (F.col("lang_pred") == "en")
        )
        .drop("quality_score", "lang_pred")
    )
    counts["quality_lang"] = filtered.count()

    # 2b. hard rule gates (Gopher-style): the per-rule boolean filter —
    # unlike the soft score above, each kill is attributable to a rule
    rules = T.quality_filter_rules(filtered).select("doc_id", "keep")
    filtered = filtered.join(rules, "doc_id").filter(F.col("keep")).drop(
        "keep"
    )
    counts["hard_rules"] = filtered.count()

    # 2c. optional DSIR importance resampling (between the quality
    # gates and the dedup ladder): steer the surviving pool toward the
    # target sources' n-gram distribution. Target-source docs all pass;
    # pool docs are Gumbel-top-k selected ∝ their likelihood ratio.
    if dsir_keep_frac is not None:
        selected = T.dsir_sample(
            filtered, keep_frac=dsir_keep_frac
        ).select("doc_id")
        targets = filtered.filter(
            F.col("source").isin(*T.DSIR_TARGET_SOURCES)
        ).select("doc_id")
        filtered = filtered.join(
            selected.unionByName(targets), "doc_id", "left_semi"
        ).localCheckpoint()  # the ratio model need not rebuild per audit
        counts["dsir_resample"] = filtered.count()

    # 3. exact dedup (normalized text already collapses case/punct dups)
    exact = dedup_apply(filtered)
    counts["exact_dedup"] = exact.count()

    # 3b. boilerplate-span removal: corpus-frequent n-grams are cut out
    # of every document BEFORE near-dedup (shared boilerplate inflates
    # Jaccard between unrelated pages); docs reduced to nothing drop
    bp = T.remove_boilerplate(exact).select("doc_id", "clean_text")
    exact = (
        exact.drop("text")
        .join(
            bp.filter(F.length("clean_text") > 0).withColumnRenamed(
                "clean_text", "text"
            ),
            "doc_id",
        )
        # every downstream stage (LSH clustering, decontamination, split,
        # chunk, pack) re-executes its lineage on each count() audit —
        # truncate here so the shingle-agg rebuild runs once, not 10×
        .localCheckpoint()
    )
    counts["boilerplate"] = exact.count()

    # 3c. ExactSubstr long-span scrub (Lee et al. 2022, r11): any
    # >= K-token span occurring more than once corpus-wide keeps its
    # first occurrence and loses the rest — catches the long quoted
    # passages / templated bodies the short-frequent-gram boilerplate
    # pass (df >= 5) leaves behind; docs reduced to nothing drop
    from music_streaming_etl_glue_spark.operators.dedup import (
        exact_substring_dedup,
    )

    es = exact_substring_dedup(exact).select("doc_id", "clean_text")
    exact = (
        exact.drop("text")
        .join(
            es.filter(F.length("clean_text") > 0).withColumnRenamed(
                "clean_text", "text"
            ),
            "doc_id",
        )
        .localCheckpoint()  # same rebuild-once economics as 3b
    )
    counts["exact_substring"] = exact.count()

    # 4. near-dedup: LSH pairs → components → keep cluster canonicals
    clusters = dedup_clusters(exact)
    near = exact.join(
        clusters.filter(F.col("doc_id") == F.col("cluster_id")).select(
            "doc_id"
        ),
        "doc_id",
        "left_semi",
    )
    counts["near_dedup"] = near.count()

    # 5. decontamination — whole-document fingerprint matches first…
    flags = T.contamination_flags(near).select("doc_id", "contaminated")
    clean = (
        near.join(flags, "doc_id")
        .filter(~F.col("contaminated"))
        .drop("contaminated")
    )
    counts["decontaminated"] = clean.count()

    # 5b. …then partial-overlap screening: drop docs sharing any word
    # n-gram with the benchmark slice (catches quoted fragments the
    # whole-document fingerprint misses)
    ngram = T.ngram_decontamination(clean).select("doc_id", "contaminated")
    clean = (
        clean.join(ngram, "doc_id", "left")
        .filter(~F.coalesce(F.col("contaminated"), F.lit(False)))
        .drop("contaminated")
    )
    counts["ngram_decontaminated"] = clean.count()

    # 5c. temperature source mixing: the final training mix samples each
    # source ∝ count^alpha (upweights small sources; without
    # replacement, so it only drops rows — monotonicity holds)
    mix = temperature_mix(clean).select("doc_id")
    clean = clean.join(mix, "doc_id", "left_semi").localCheckpoint()
    counts["temperature_mix"] = clean.count()

    # 6. deterministic split + 7. chunk (provenance: doc_id, chunk_id)
    split = dataset_split(clean).select("doc_id", "split")
    chunks = T.chunk_documents(clean).join(split, "doc_id")

    chunks.write.mode("overwrite").partitionBy("split").parquet(output_dir)
    if counts["temperature_mix"] == 0:
        # an empty partitioned write leaves no schema-bearing files, so
        # the read-back audit below cannot infer a schema — short-circuit
        by_split: dict[str, int] = {}
    else:
        by_split = {
            r["split"]: r["n"]
            for r in spark.read.parquet(output_dir)
            .groupBy("split")
            .agg(F.count("*").alias("n"))
            .collect()
        }

    # 8. sequence packing: non-overlapping chunks concat-stream-packed
    # into fixed-token-budget examples — PER SPLIT, never across (an
    # example mixing train and test chunks is leakage by construction)
    split_docs = clean.join(split, "doc_id")
    packed: DataFrame | None = None
    for s in [r["split"] for r in split.select("split").distinct().collect()]:
        sub = split_docs.filter(F.col("split") == s).drop("split")
        p = T.pack_chunks(sub).withColumn("split", F.lit(s))
        packed = p if packed is None else packed.unionByName(p)
    packed_dir = output_dir.rstrip("/") + "_packed"
    if packed is None:
        # fully-filtered corpus: no splits, nothing to pack — still
        # produce an (empty) result instead of crashing on packed.write
        examples_by_split: dict[str, int] = {}
    else:
        packed.write.mode("overwrite").partitionBy("split").parquet(
            packed_dir
        )
        examples_by_split = {
            r["split"]: r["n"]
            for r in spark.read.parquet(packed_dir)
            .groupBy("split")
            .agg(F.count_distinct("example_id").alias("n"))
            .collect()
        }
    # 9. training-order schedule: written beside the chunk output so the
    # trainer streams shards directly. Default = corpus_shuffle's stable
    # pseudorandom (shard, pos) epoch order (append-stable: resuming or
    # extending the corpus never reorders what an interrupted epoch
    # already consumed). curriculum=True = quality-phased
    # curriculum_order (phase, shard, pos): cleanest tercile first.
    from music_streaming_etl_glue_spark.operators.dedup import (
        corpus_shuffle,
    )

    train_docs = clean.join(
        split.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    schedule_dir = output_dir.rstrip("/") + "_schedule"
    if curriculum:
        schedule = T.curriculum_order(train_docs)
        scheduled = schedule.count()
        if scheduled:
            schedule.write.mode("overwrite").partitionBy(
                "phase", "shard"
            ).parquet(schedule_dir)
    else:
        schedule = corpus_shuffle(train_docs)
        scheduled = schedule.count()
        if scheduled:
            schedule.write.mode("overwrite").partitionBy("shard").parquet(
                schedule_dir
            )

    # 10. split-hygiene audit: eval docs whose content leaks from the
    # train split (exact hits are already gone — dedup ran upstream —
    # so what remains is shingle-level overlap). A REPORT, not a drop:
    # the number a release gate compares against its leakage budget
    # before publishing the eval set.
    from music_streaming_etl_glue_spark.operators.dedup import (
        split_leakage_audit,
    )

    leaky_eval_docs = (
        split_leakage_audit(clean).filter(F.col("leaky")).count()
    )

    published_version: int | None = None
    if publish_table is not None:
        from music_streaming_etl_glue_spark.plans import lakehouse

        published_version = lakehouse.commit_overwrite(chunks, publish_table)

    return LlmPipelineResult(
        stage_counts=counts,
        chunk_counts_by_split=by_split,
        output_dir=output_dir,
        packed_examples_by_split=examples_by_split,
        pii_redactions=pii_redactions,
        scheduled_train_docs=scheduled,
        leaky_eval_docs=leaky_eval_docs,
        published_version=published_version,
        schedule_kind="curriculum" if curriculum else "shuffle",
    )
