"""Incremental-processing state: file ledger + content-hash change
detection (reference orchestration layer,
``/root/reference/dags/music_streaming_pipeline.py:302-389, 433-482``).

The reference keeps two JSON ledgers in S3: ``processed_streams.json``
(fact files already ingested) and ``reference_data_state.json`` (MD5 of
each dimension file). This module is the engine-native equivalent for
batch-increment runs; the Structured Streaming twin
(``streaming/file_pipeline.py``) gets the same exactly-once file tracking
from its checkpoint instead.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass


def _atomic_write(path: str, payload: dict) -> None:
    tmp = f"{path}.tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(payload, fh, indent=2, sort_keys=True)
    os.replace(tmp, path)


@dataclass
class FileLedger:
    """Tracks which input files a pipeline already processed."""

    path: str

    def processed(self) -> set[str]:
        if not os.path.exists(self.path):
            return set()
        with open(self.path, encoding="utf-8") as fh:
            return set(json.load(fh).get("processed", []))

    def new_files(self, discovered: list[str]) -> list[str]:
        """Ledger diff: discovered minus processed, stable order."""
        done = self.processed()
        return [f for f in discovered if f not in done]

    def mark_processed(self, files: list[str]) -> None:
        merged = sorted(self.processed() | set(files))
        _atomic_write(self.path, {"processed": merged})


def content_hash(path: str, chunk: int = 1 << 20) -> str:
    """Streaming MD5 of a local file (dimension change detection)."""
    h = hashlib.md5()
    with open(path, "rb") as fh:
        while True:
            b = fh.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


@dataclass
class DimensionState:
    """Re-process a dimension only when its content hash changed
    (reference ``reference_data_state.json``)."""

    path: str

    def _load(self) -> dict[str, str]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path, encoding="utf-8") as fh:
            return json.load(fh)

    def changed(self, name: str, file_path: str) -> bool:
        return self._load().get(name) != content_hash(file_path)

    def update(self, name: str, file_path: str) -> None:
        state = self._load()
        state[name] = content_hash(file_path)
        _atomic_write(self.path, state)


# ---------------------------------------------------------------------------
# incremental KPI maintenance: additive merge with mergeable sketches
# ---------------------------------------------------------------------------

def genre_daily_partials(enriched) -> "DataFrame":  # noqa: F821
    """Mergeable per-(date, genre) KPI partials for ONE batch of events:
    listen_count (additive), total listening time as exact DECIMAL
    (additive), and the distinct-listener HLL sketch (register-max
    mergeable). This is the stored representation that makes the daily
    KPI table maintainable by MERGE instead of recompute — COUNT
    DISTINCT is the one non-additive metric in the reference's KPI set,
    and the sketch is what makes it mergeable."""
    from pyspark.sql import functions as F

    return (
        enriched.withColumn("date", F.col("timestamp").cast("date"))
        .groupBy("date", "track_genre")
        .agg(
            F.count("track_id").alias("listen_count"),
            F.hll_sketch_agg("user_id").alias("listeners_sketch"),
            F.sum(
                F.col("listening_time").cast("decimal(18,2)")
            ).alias("listening_time_dec"),
        )
    )


def merge_genre_daily(spark, partials, state_path: str) -> "DataFrame":  # noqa: F821
    """MERGE one batch's partials into the persisted KPI partial table
    (additive counters summed, sketches unioned). The state is
    partitioned by ``date`` and the merge runs with DYNAMIC partition
    overwrite: only the dates present in the batch are read back
    (partition-pruned scan of the state) and only those date partitions
    are rewritten — cost per batch is O(batch + touched dates' keys),
    untouched history is never read OR rewritten, and the accumulated
    fact table is never rescanned (the recompute path in
    ``plans.pipeline._run_incremental`` re-reads the whole fact dir
    every run). A failed write leaves untouched partitions intact;
    replay safety is the caller's epoch ledger
    (``streaming.file_pipeline.stream_kpi_maintenance``). Returns the
    merged readable view for the touched dates plus the rest of the
    state (date, track_genre, listen_count, unique_listeners_est,
    total_listening_time_minutes)."""
    import os

    from pyspark.sql import functions as F

    partials = partials.localCheckpoint()  # batch partials: touched-keys-sized
    # the dynamic-partition committer writes NO root _SUCCESS marker —
    # state existence = any date= partition directory present
    has_state = os.path.isdir(state_path) and any(
        e.startswith("date=") for e in os.listdir(state_path)
    )
    if has_state:
        touched = [r["date"] for r in partials.select("date").distinct().collect()]
        existing = spark.read.parquet(state_path).filter(
            F.col("date").isin(touched)
        )
        merged = (
            existing.unionByName(partials)
            .groupBy("date", "track_genre")
            .agg(
                F.sum("listen_count").alias("listen_count"),
                F.hll_union_agg("listeners_sketch").alias("listeners_sketch"),
                F.sum("listening_time_dec").alias("listening_time_dec"),
            )
            # materialize before the write: the merged slice READS the
            # same path the dynamic overwrite rewrites (self-overwrite);
            # it is touched-keys-sized, so pinning it is O(touched)
            .localCheckpoint()
        )
    else:
        merged = partials
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("date")
        .parquet(state_path)
    )
    out = spark.read.parquet(state_path)
    return out.select(
        "date",
        "track_genre",
        "listen_count",
        F.hll_sketch_estimate("listeners_sketch").alias(
            "unique_listeners_est"
        ),
        F.col("listening_time_dec")
        .cast("double")
        .alias("total_listening_time_minutes"),
    )


def maintain_kpis_from_lake(
    spark,
    table_dir: str,
    customer,
    nation,
    state_path: str,
    cursor_path: str,
) -> dict:
    """Incremental KPI maintenance driven by the lake's commit log: read
    the events APPENDED since the last processed snapshot version
    (``lakehouse.snapshot_delta`` — a file-set difference, never a
    history rescan), enrich, reduce to (date, genre) partials, MERGE
    into the persisted rollup, then advance the version cursor. The
    batch/stream/lake triad all run the SAME partial/merge code
    (``genre_daily_partials`` / ``merge_genre_daily``), so they cannot
    disagree.

    Replay safety mirrors ``stream_kpi_maintenance``'s epoch ledger: the
    cursor is advanced atomically AFTER the merge (os.replace), so a
    crash between the two re-merges one delta — the same narrow
    documented window. A NON-APPEND commit in the cursor range (an
    overwrite / compact / delete / MERGE — e.g. a table with
    auto-compaction enabled) cannot be expressed as a file-set delta;
    rather than wedge permanently (the failure mode: snapshot_delta
    raises on every run and the cursor never advances), the maintainer
    RECOVERS with a full recompute — rebuild the rollup state from the
    CURRENT snapshot (static overwrite, so stale dates from retracted
    rows disappear too) and re-seed the cursor to that version; the
    result reports {"recomputed": True}. Correctness holds because the
    recompute is derived from the snapshot alone, not from the broken
    incremental state.
    OVERLAPPING runs are excluded with an flock on the cursor's lock
    file (held for the whole merge; a crashed holder releases it with
    its fd) — without it two concurrent runs would merge the same delta
    twice into the additive state. A run that finds the lock held
    returns {"skipped": True} instead of blocking.

    Returns {"from_version", "to_version", "delta_rows"} (the row count
    comes from the manifests' n_rows delta — no extra scan).
    """
    import fcntl
    import json
    import os

    from music_streaming_etl_glue_spark.operators.enrich import enrich_events
    from music_streaming_etl_glue_spark.plans import lakehouse

    os.makedirs(os.path.dirname(cursor_path) or ".", exist_ok=True)
    lock_fd = os.open(cursor_path + ".lock", os.O_CREAT | os.O_RDWR)
    try:
        try:
            fcntl.flock(lock_fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except BlockingIOError:
            return {"skipped": True}
        from_v = 0
        if os.path.exists(cursor_path):
            with open(cursor_path) as fh:
                from_v = json.load(fh)["version"]
        to_v = lakehouse.current_version(table_dir)
        if to_v == from_v:
            return {
                "from_version": from_v, "to_version": to_v, "delta_rows": 0
            }
        try:
            delta = lakehouse.snapshot_delta(spark, table_dir, from_v, to_v)
        except (ValueError, FileNotFoundError):
            # non-append commit in the range, OR a manifest in the range
            # was vacuumed (cursor fell below retention — snapshot_delta
            # raises FileNotFoundError for that case): full recompute
            # from the current snapshot, then re-seed the cursor (see
            # docstring). Catching only ValueError left the vacuumed-
            # cursor case wedged permanently (ADVICE r12).
            full = lakehouse.read_snapshot(spark, table_dir, to_v)
            partials = genre_daily_partials(
                enrich_events(full, customer, nation)
            ).localCheckpoint()
            # STATIC overwrite (no dynamic partition mode): dates that
            # vanished from the table must vanish from the state too
            partials.write.mode("overwrite").partitionBy("date").parquet(
                state_path
            )
            _atomic_write(cursor_path, {"version": to_v})
            return {
                "from_version": from_v,
                "to_version": to_v,
                "delta_rows": lakehouse._load_manifest(
                    table_dir, to_v, resolve=False
                )["n_rows"],
                "recomputed": True,
            }
        # append-only range (snapshot_delta enforced it), so the delta
        # row count is a manifest subtraction, not a Spark scan
        n = lakehouse._load_manifest(table_dir, to_v, resolve=False)["n_rows"] - (
            lakehouse._load_manifest(
                table_dir, from_v, resolve=False
            )["n_rows"]
            if from_v
            else 0
        )
        if n:
            enriched = enrich_events(delta, customer, nation)
            merge_genre_daily(
                spark, genre_daily_partials(enriched), state_path
            )
        _atomic_write(cursor_path, {"version": to_v})
        return {"from_version": from_v, "to_version": to_v, "delta_rows": n}
    finally:
        os.close(lock_fd)
