"""Spark 4 Python DataSource over the lakehouse commit log: batch reads
of any snapshot, and a STREAMING reader whose offsets are manifest
versions — "stream from a table", the Delta/Iceberg change-feed shape.

Why the commit log is a perfect streaming source: versions are dense
integers, a version's append delta is a pure file-set difference
(``plans.lakehouse.snapshot_delta`` semantics), and both are re-derivable
from the manifests alone — so a restarted query replays byte-identical
micro-batches from its checkpointed (start, end] version range, which is
the exactly-once contract the engine's file-source pipelines already
test. Non-append commits (overwrite / compact / delete / rollback)
rewrite history a file-delta cannot represent: the reader RAISES by
default (restart from a fresh checkpoint against the new snapshot), or
skips them under ``skip_rewrites=true`` — matching the
ignoreChanges/ignoreDeletes contract of the public table formats.

Rows are decoded executor-side with pyarrow (footer+pages of ONLY the
delta files); the driver touches manifests, never data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SOURCE_NAME = "lake"


class _FilePartition(InputPartition):
    def __init__(self, path: str, deletes: list | None = None):
        self.path = path
        #: [(key_col, abs_delete_parquet_path), …] merge-on-read
        #: equality deletes applying to THIS file (prefix already
        #: resolved driver-side); rows matching any set are dropped
        self.deletes = deletes or []


def _manifest(table_dir: str, version: int, resolve: bool = True) -> dict:
    # delegate to the format's own reader — the commit-log layout has
    # exactly one definition (plans.lakehouse), never a copy here;
    # resolve=False for action/metadata probes (no group-file reads)
    from music_streaming_etl_glue_spark.plans import lakehouse

    return lakehouse._load_manifest(table_dir, version, resolve=resolve)


def _current_version(table_dir: str) -> int:
    from music_streaming_etl_glue_spark.plans import lakehouse

    return lakehouse.current_version(table_dir)


#: file-set-preserving actions: metadata-only commits (group-manifest
#: compaction) that rewrite the manifest LIST but not a byte of data —
#: a change feed passes through them emitting zero rows, no
#: skip_rewrites opt-in needed (there is nothing to skip)
_METADATA_ONLY_ACTIONS = frozenset({"rewrite_manifests"})


def _delta_files(
    table_dir: str, from_v: int, to_v: int, skip_rewrites: bool
) -> list[str]:
    """Absolute paths of the files appended in (from_v, to_v]; raises on
    a non-append commit in the range unless ``skip_rewrites``
    (metadata-only commits never raise — the file set is unchanged).

    Format-2 fast path: an append packs its new files into FRESH group
    manifests and carries the base's groups by reference, so each
    append's delta is exactly its NEW group entries — the walk resolves
    O(delta groups) group files per micro-batch, never the base
    (``plans.lakehouse.snapshot_delta`` has the same fast path; ADVICE
    r12 flagged that this stream reader resolved both endpoints fully,
    paying O(total groups) per micro-batch)."""
    manifests: dict[int, dict] = {}
    for v in range(from_v + 1, to_v + 1):
        try:
            manifests[v] = _manifest(table_dir, v, resolve=False)
        except FileNotFoundError:
            raise ValueError(
                f"lake stream range starts below the table's retention "
                f"(version {v}'s manifest was vacuumed); start a fresh "
                "stream with start_from=latest, or restart from a fresh "
                "checkpoint"
            ) from None
        action = manifests[v]["action"]
        if (
            action != "append"
            and action not in _METADATA_ONLY_ACTIONS
            and not skip_rewrites
        ):
            raise ValueError(
                f"lake stream hit a {action!r} commit at version {v}; "
                "restart from a fresh checkpoint against the new snapshot "
                "or set skip_rewrites=true (appends-only change feed)"
            )
    try:
        base_raw = (
            _manifest(table_dir, from_v, resolve=False) if from_v else None
        )
    except FileNotFoundError:
        raise ValueError(
            f"lake stream checkpoint (version {from_v}) is below the "
            "table's retention; start a fresh stream with "
            "start_from=latest"
        ) from None
    all_fmt2 = (base_raw is None or "groups" in base_raw) and all(
        "groups" in m for m in manifests.values()
    )
    if all_fmt2:
        from music_streaming_etl_glue_spark.plans import lakehouse

        prev_groups = (
            {g["path"] for g in base_raw["groups"]} if base_raw else set()
        )
        out: list[str] = []
        for v in range(from_v + 1, to_v + 1):
            man = manifests[v]
            if man["action"] == "append":
                for g in man["groups"]:
                    if g["path"] not in prev_groups:
                        out.extend(
                            lakehouse._load_group(table_dir, g["path"])[
                                "files"
                            ]
                        )
            prev_groups = {g["path"] for g in man["groups"]}
        return [os.path.join(table_dir, f) for f in out]
    # format-1 (or mixed-format) fallback: full file-set resolution
    base = set(_manifest(table_dir, from_v)["files"]) if from_v else set()
    to_files = _manifest(table_dir, to_v)["files"]
    if skip_rewrites or any(
        m["action"] in _METADATA_ONLY_ACTIONS for m in manifests.values()
    ):
        # appended-by-an-append-commit files only: union of per-append
        # deltas, so rewritten (compacted/overwritten) files never
        # re-emit (and metadata-only commits contribute nothing)
        out = []
        prev = base
        for v in range(from_v + 1, to_v + 1):
            man = _manifest(table_dir, v)
            cur = set(man["files"])
            if man["action"] == "append":
                out.extend(sorted(cur - prev))
            prev = cur
        return [os.path.join(table_dir, f) for f in out]
    return [
        os.path.join(table_dir, f) for f in to_files if f not in base
    ]


def _rows(path: str, field_names: list[str]):
    """Stream one data file as rows, one Arrow record batch at a time —
    never the whole file as Python lists (a 1 GB file must not need
    1 GB+ of executor heap before the first row yields). Columns absent
    from an old file (schema evolution) are filled with None."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    present = [n for n in field_names if n in pf.schema_arrow.names]
    for batch in pf.iter_batches(columns=present or None):
        n = batch.num_rows
        cols = [
            batch.column(batch.schema.get_field_index(name)).to_pylist()
            if name in batch.schema.names
            else [None] * n
            for name in field_names
        ]
        yield from zip(*cols) if cols else iter(())


def _resolve_version(options, table: str) -> int:
    """Batch-read version resolution: explicit ``version`` wins, else
    ``as_of_ns`` (timestamp time travel via the manifests' commit
    clock), else the current snapshot."""
    v = options.get("version")
    if v is not None:
        return int(v)
    ts = options.get("as_of_ns")
    if ts is not None:
        from music_streaming_etl_glue_spark.plans import lakehouse

        return lakehouse.version_at_timestamp(table, int(ts))
    return _current_version(table)


class LakeReader(DataSourceReader):
    def __init__(self, options, schema):
        self.table = options["table"]
        self.version = _resolve_version(options, self.table)
        self.fields = [f.name for f in schema.fields]

    def partitions(self):
        man = _manifest(self.table, self.version)
        deletes = man.get("deletes") or []
        parts = []
        for idx, f in enumerate(man["files"]):
            applicable = [
                (d["key_col"], os.path.join(self.table, d["path"]))
                for d in deletes
                if d["prefix"] > idx
            ]
            parts.append(
                _FilePartition(os.path.join(self.table, f), applicable)
            )
        return parts or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return iter(())
        rows = _rows(partition.path, self.fields)
        if not partition.deletes:
            return rows
        import pyarrow.parquet as pq

        doomed: list[tuple[int, set]] = []
        for key_col, dpath in partition.deletes:
            if key_col not in self.fields:
                continue
            keys = set(
                pq.read_table(dpath).column(key_col).to_pylist()
            )
            doomed.append((self.fields.index(key_col), keys))
        return (
            row
            for row in rows
            if not any(row[i] in keys for i, keys in doomed)
        )


class _ChangePartition(InputPartition):
    """One file of one commit in emit_changes mode. ``change_type`` is
    'insert' (an appended file — emit its rows) or 'delete' (a MoR
    delete's candidate file — emit the pre-delete VISIBLE rows whose
    key the doomed relation holds, i.e. file rows minus prior delete
    sets, intersect doomed)."""

    def __init__(
        self,
        path: str,
        change_type: str,
        version: int,
        key_col: str | None = None,
        doomed_path: str | None = None,
        prior_deletes: list | None = None,
    ):
        self.path = path
        self.change_type = change_type
        self.version = version
        self.key_col = key_col
        self.doomed_path = doomed_path
        self.prior_deletes = prior_deletes or []


def _change_partitions(
    table_dir: str, from_v: int, to_v: int
) -> list[_ChangePartition]:
    """Driver-side plan of the change feed for (from_v, to_v] — the
    streaming twin of ``plans.lake_cdf.snapshot_changes``: appends
    plan their NEW files as insert partitions (format-2 group diff),
    MoR deletes plan their bloom/range-pruned candidate prefix as
    delete partitions, metadata-only commits plan nothing, anything
    else raises (restart against a fresh checkpoint after a rewrite).
    Deterministic from the manifests alone, so a restarted query
    replays byte-identical micro-batches."""
    from music_streaming_etl_glue_spark.plans import lakehouse

    parts: list[_ChangePartition] = []
    prev_man = (
        _manifest(table_dir, from_v, resolve=False) if from_v else None
    )
    for v in range(from_v + 1, to_v + 1):
        try:
            man = _manifest(table_dir, v, resolve=False)
        except FileNotFoundError:
            raise ValueError(
                f"lake change stream range starts below retention "
                f"(version {v} vacuumed); restart with start_from=latest"
            ) from None
        action = man["action"]
        if action == "append":
            if "groups" in man and (
                prev_man is None or "groups" in prev_man
            ):
                prev_groups = (
                    {g["path"] for g in prev_man["groups"]}
                    if prev_man
                    else set()
                )
                new_files = [
                    f
                    for g in man["groups"]
                    if g["path"] not in prev_groups
                    for f in lakehouse._load_group(table_dir, g["path"])[
                        "files"
                    ]
                ]
            else:
                prev_files = (
                    set(_manifest(table_dir, v - 1)["files"])
                    if prev_man is not None
                    else set()
                )
                new_files = [
                    f
                    for f in _manifest(table_dir, v)["files"]
                    if f not in prev_files
                ]
            parts.extend(
                _ChangePartition(
                    os.path.join(table_dir, f), "insert", v
                )
                for f in new_files
            )
        elif action == "delete_mor":
            entry = man["deletes"][-1]
            key_col, prefix = entry["key_col"], entry["prefix"]
            doomed_abs = os.path.join(table_dir, entry["path"])
            # hull/probe pruning shared with plans.lake_cdf (one
            # helper, so batch feed and stream plan the SAME candidate
            # set): the key relation visits the DRIVER only for legacy
            # hull-less entries or the bloom probe on small key sets;
            # tasks read the relation themselves via doomed_path
            plan = lakehouse._delete_mor_probe_plan(table_dir, entry)
            if plan is not None and prev_man is not None:
                hull, probe_keys = plan
                prior = prev_man.get("deletes") or []
                for f, i in lakehouse._plan_files_with_idx(
                    table_dir, prev_man, {key_col: hull}
                ):
                    if i >= prefix:
                        continue
                    if probe_keys is not None and (
                        not lakehouse._bloom_may_contain_any(
                            table_dir, f, key_col, probe_keys
                        )
                    ):
                        continue
                    applicable = [
                        (
                            d["key_col"],
                            os.path.join(table_dir, d["path"]),
                        )
                        for d in prior
                        if d["prefix"] > i
                    ]
                    parts.append(
                        _ChangePartition(
                            os.path.join(table_dir, f),
                            "delete",
                            v,
                            key_col=key_col,
                            doomed_path=doomed_abs,
                            prior_deletes=applicable,
                        )
                    )
        elif action in _METADATA_ONLY_ACTIONS:
            pass
        else:
            raise ValueError(
                f"lake change stream hit a {action!r} commit at version "
                f"{v}; a rewrite is not representable as row changes — "
                "restart from a fresh checkpoint against the new snapshot"
            )
        prev_man = man
    return parts


class LakeStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema):
        self.table = options["table"]
        self.skip_rewrites = (
            str(options.get("skip_rewrites", "false")).lower() == "true"
        )
        #: emit_changes=true streams the CHANGE FEED: appends as
        #: _change_type='insert' rows, MoR deletes as 'delete'
        #: retraction rows (the row as it was), with _commit_version —
        #: the streaming twin of plans.lake_cdf.snapshot_changes
        self.emit_changes = (
            str(options.get("emit_changes", "false")).lower() == "true"
        )
        #: "beginning" replays the whole surviving history; "latest"
        #: starts at the current snapshot version (new commits only) —
        #: required on tables whose early manifests were vacuumed
        self.start_from = str(options.get("start_from", "beginning")).lower()
        self.fields = [
            f.name
            for f in schema.fields
            if f.name not in ("_change_type", "_commit_version")
        ]

    def initialOffset(self):
        if self.start_from == "latest":
            return {"version": _current_version(self.table)}
        return {"version": 0}

    def latestOffset(self):
        return {"version": _current_version(self.table)}

    def partitions(self, start, end):
        if self.emit_changes:
            parts = _change_partitions(
                self.table, start["version"], end["version"]
            )
            return parts or [_FilePartition("")]
        files = _delta_files(
            self.table, start["version"], end["version"], self.skip_rewrites
        )
        return [_FilePartition(p) for p in files] or [_FilePartition("")]

    def read(self, partition):
        if not partition.path:
            return iter(())
        rows = _rows(partition.path, self.fields)
        if not isinstance(partition, _ChangePartition):
            return rows
        import pyarrow.parquet as pq

        v = partition.version
        if partition.change_type == "insert":
            return (row + ("insert", v) for row in rows)
        doomed = set(
            pq.read_table(partition.doomed_path)
            .column(partition.key_col)
            .to_pylist()
        )
        prior: list[tuple[int, set]] = []
        for key_col, dpath in partition.prior_deletes:
            if key_col in self.fields:
                prior.append(
                    (
                        self.fields.index(key_col),
                        set(pq.read_table(dpath).column(key_col).to_pylist()),
                    )
                )
        ki = self.fields.index(partition.key_col)
        return (
            row + ("delete", v)
            for row in rows
            if row[ki] in doomed
            and not any(row[i] in keys for i, keys in prior)
        )

    def commit(self, end):
        pass


class LakeDataSource(DataSource):
    """``spark.read.format("lake").option("table", DIR)`` /
    ``spark.readStream.format("lake")...`` — snapshot + change-feed reads
    of a ``plans.lakehouse`` table through the standard source API."""

    @classmethod
    def name(cls):
        return SOURCE_NAME

    def schema(self):
        table = self.options["table"]
        ver = _resolve_version(self.options, table)
        if ver == 0:
            raise FileNotFoundError(
                f"no committed snapshot under {table}: the lake source "
                "needs at least one commit to resolve a schema (commit "
                "first, or pass an explicit schema-bearing version)"
            )
        base = T.StructType.fromJson(
            json.loads(_manifest(table, ver)["schema"])
        )
        if str(self.options.get("emit_changes", "false")).lower() == "true":
            return T.StructType(
                list(base.fields)
                + [
                    T.StructField("_change_type", T.StringType(), False),
                    T.StructField("_commit_version", T.LongType(), False),
                ]
            )
        return base

    def reader(self, schema):
        if str(self.options.get("emit_changes", "false")).lower() == "true":
            # a batch read has no offset range to diff, so "the change
            # feed" is undefined — refusing beats returning a snapshot
            # whose advertised _change_type/_commit_version columns
            # would backfill as all-NULL in non-nullable fields
            raise ValueError(
                "emit_changes=true is a streaming option: a batch read "
                "returns a snapshot, not a change feed — use "
                "spark.readStream.format('lake') or "
                "plans.lake_cdf.snapshot_changes for a bounded range"
            )
        return LakeReader(self.options, schema)

    def streamReader(self, schema):
        return LakeStreamReader(self.options, schema)


def register(spark) -> None:
    """Idempotent registration of the ``lake`` format."""
    spark.dataSource.register(LakeDataSource)
