"""Change-data-driven corpus scrubbing: ride the lakehouse commit log
into the incremental dedup / ExactSubstr kernels, so an upstream MERGE
or copy-on-write delete re-scrubs EXACTLY the changed documents — never
the corpus (VERDICT r11 item #6: r11 built both halves, the change feed
and the incremental scrub rungs; this composes them).

Change identification is two-tier, cheapest first:

1. **Append-only cursor range** → ``lakehouse.snapshot_delta``: the
   changed docs are precisely the appended files' rows, resolved as a
   manifest file-set (format 2: group-reference) difference. Zero reads
   of the base.
2. **Rewrite in range** (MERGE / CoW delete / compact / overwrite) →
   the keyed ``plans.snapshot_diff.dataset_diff`` between the cursor
   snapshot and the head: one (key, md5(text)) projection per side and
   a full-outer hash join — ``added``/``changed`` keys re-scrub,
   ``removed`` keys need nothing, ``unchanged`` (the overwhelming
   majority) drop out immediately. At 100 TB both sides prune to
   (key, hash) at the scan.

The scrub itself runs the batch×corpus kernels — never corpus×corpus:
``dedup_against_corpus`` (md5 exact + banded-MinHash near flags) and
``exact_substring_against_corpus`` (>=K-token span removal vs the
corpus gram relation). The cursor advances only after both results
materialize, mirroring ``incremental.maintain_kpis_from_lake``'s
crash-replay contract (a crash re-scrubs one delta; scrubbing is
idempotent, so replays are harmless).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.plans import lakehouse
from music_streaming_etl_glue_spark.plans.incremental import _atomic_write
from music_streaming_etl_glue_spark.plans.snapshot_diff import dataset_diff


@dataclass
class LakeScrubResult:
    from_version: int
    to_version: int
    #: "append_delta" (file-set diff), "keyed_diff" (rewrite in range),
    #: or "noop" (cursor already at head / nothing changed)
    mode: str
    changed_docs: int
    #: (doc_id, exact_dup, near_dup, keep) per changed doc — or None
    #: when nothing changed
    flags: DataFrame | None
    #: (doc_id, n_tokens, n_removed, clean_text) per changed doc
    scrubbed: DataFrame | None


def changed_docs_since(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    key_col: str = "doc_id",
    compare_cols: tuple[str, ...] = ("text",),
) -> tuple[DataFrame, str]:
    """The rows of the CURRENT snapshot whose key is new or whose
    compared content changed since ``from_version``, plus which tier
    identified them ("append_delta" or "keyed_diff")."""
    to_v = lakehouse.current_version(table_dir)
    try:
        delta = lakehouse.snapshot_delta(
            spark, table_dir, from_version, to_v
        )
        return delta, "append_delta"
    except ValueError:
        pass  # rewrite in range: fall through to the keyed diff
    old = (
        lakehouse.read_snapshot(spark, table_dir, from_version)
        if from_version
        else None
    )
    new = lakehouse.read_snapshot(spark, table_dir, to_v)
    if old is None:
        return new, "keyed_diff"
    diff = dataset_diff(old, new, key_col, list(compare_cols))
    touched = diff.filter(
        F.col("status").isin("added", "changed")
    ).select(key_col)
    return new.join(touched, key_col, "left_semi"), "keyed_diff"


def scrub_lake_changes(
    spark: SparkSession,
    table_dir: str,
    cursor_path: str,
    key_col: str = "doc_id",
    compare_cols: tuple[str, ...] = ("text",),
) -> LakeScrubResult:
    """Scrub the documents changed since the cursor against the REST of
    the current snapshot, then advance the cursor. See module docstring
    for the two change-identification tiers and the replay contract."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        dedup_against_corpus,
        exact_substring_against_corpus,
    )

    os.makedirs(os.path.dirname(cursor_path) or ".", exist_ok=True)
    from_v = 0
    if os.path.exists(cursor_path):
        with open(cursor_path) as fh:
            from_v = json.load(fh)["version"]
    to_v = lakehouse.current_version(table_dir)
    if to_v == from_v:
        return LakeScrubResult(from_v, to_v, "noop", 0, None, None)
    batch, mode = changed_docs_since(
        spark, table_dir, from_v, key_col, compare_cols
    )
    batch = batch.localCheckpoint()  # changed-slice-sized; pin it so the
    # dedup + substring kernels and the count share one materialization
    n = batch.count()
    if n == 0:
        _atomic_write(cursor_path, {"version": to_v})
        return LakeScrubResult(from_v, to_v, mode, 0, None, None)
    current = lakehouse.read_snapshot(spark, table_dir, to_v)
    corpus = current.join(
        batch.select(key_col), key_col, "left_anti"
    )
    flags = dedup_against_corpus(batch, corpus).localCheckpoint()
    scrubbed = exact_substring_against_corpus(
        batch, corpus
    ).localCheckpoint()
    _atomic_write(cursor_path, {"version": to_v})
    return LakeScrubResult(from_v, to_v, mode, n, flags, scrubbed)
