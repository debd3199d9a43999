"""Change data feed over the lakehouse commit log — the Delta-CDF /
Iceberg-changelog shape: one relation of (row, _change_type,
_commit_version) describing exactly what changed between two snapshot
versions, including RETRACTIONS from merge-on-read deletes.

``plans.lakehouse.snapshot_delta`` answers "what rows were appended"
and raises on anything else; this module answers the richer question a
downstream incremental consumer needs once MoR deletes are in play:

- ``append``            → the appended files' rows as ``insert``
- ``delete_mor``        → the rows the delete made invisible, AS THEY
                          WERE, emitted as ``delete`` (read from the
                          pre-delete candidate files — range+bloom
                          pruned, prior deletes applied, so a stacked
                          delete never re-retracts an already-hidden
                          row)
- ``rewrite_manifests`` → nothing (metadata-only, file set preserved)
- anything else (overwrite / compact / CoW delete / upsert / rollback)
  raises — those rewrite history in ways a row-level feed cannot
  represent without file diffing the whole snapshot; fall back to
  ``plans.snapshot_diff`` (keyed) or a full recompute.

The feed is deterministic and replayable from the manifests alone, so
a consumer checkpointing its last version can re-derive byte-identical
batches — the same exactly-once contract the streaming lake source
gives for appends-only ranges.

Scale: per version the work is O(delta) — an append resolves only its
new group manifests; a MoR delete scans only its bloom/range-pruned
candidate prefix. The base snapshot is never rescanned.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from music_streaming_etl_glue_spark.plans import lakehouse as L

#: metadata column names (Delta CDF's _change_type vocabulary subset)
CHANGE_TYPE = "_change_type"
COMMIT_VERSION = "_commit_version"


def _empty(spark: SparkSession, schema: T.StructType) -> DataFrame:
    out_schema = T.StructType(
        list(schema.fields)
        + [
            T.StructField(CHANGE_TYPE, T.StringType(), False),
            T.StructField(COMMIT_VERSION, T.LongType(), False),
        ]
    )
    return spark.createDataFrame([], out_schema)


def _append_inserts(
    spark: SparkSession,
    table_dir: str,
    schema: T.StructType,
    prev_man: dict | None,
    man: dict,
    v: int,
) -> DataFrame | None:
    """The rows an append commit added: its NEW group entries (format
    2 — bases ride by reference) or the file-list suffix (format 1)."""
    if "groups" in man and (prev_man is None or "groups" in prev_man):
        prev_groups = (
            {g["path"] for g in prev_man["groups"]} if prev_man else set()
        )
        new_files = [
            f
            for g in man["groups"]
            if g["path"] not in prev_groups
            for f in L._load_group(table_dir, g["path"])["files"]
        ]
    else:
        prev_files = (
            set(L._load_manifest(table_dir, v - 1)["files"])
            if prev_man is not None
            else set()
        )
        new_files = [
            f
            for f in L._load_manifest(table_dir, v)["files"]
            if f not in prev_files
        ]
    if not new_files:
        return None
    return (
        spark.read.schema(schema)
        .parquet(*[os.path.join(table_dir, f) for f in new_files])
        .withColumn(CHANGE_TYPE, F.lit("insert"))
        .withColumn(COMMIT_VERSION, F.lit(v).cast("long"))
    )


def _mor_delete_retractions(
    spark: SparkSession,
    table_dir: str,
    schema: T.StructType,
    prev_man: dict,
    man: dict,
    v: int,
) -> DataFrame | None:
    """The rows version ``v``'s MoR delete made invisible, as they
    were: the pre-delete VISIBLE rows (prior deletes applied) within
    the entry's prefix whose key is in the doomed relation.

    Scale discipline (r14): the candidate plan prunes on the HULL the
    commit recorded in the entry ([lo, hi]) — the key relation is read
    back to the driver only when the entry predates hulls, or for the
    bloom side-file probe when it is small enough
    (``_BLOOM_PROBE_KEY_CAP``, the same bound the commit paths use);
    the retraction filter itself is a semi-join against the on-disk
    relation, never an ``isin`` literal list — so a delete whose key
    set is proportional to the data feeds the change stream without
    driver materialization."""
    entry = man["deletes"][-1]
    key_col, prefix = entry["key_col"], entry["prefix"]
    doomed_abs = os.path.join(table_dir, entry["path"])
    plan = L._delete_mor_probe_plan(table_dir, entry)
    if plan is None:
        return None
    hull, probe_keys = plan
    candidates = [
        (f, i)
        for f, i in L._plan_files_with_idx(
            table_dir, prev_man, {key_col: hull}
        )
        if i < prefix
        and (
            probe_keys is None
            or L._bloom_may_contain_any(table_dir, f, key_col, probe_keys)
        )
    ]
    if not candidates:
        return None
    visible = (
        L._read_with_mor_deletes(
            spark, table_dir, schema, candidates, prev_man["deletes"]
        )
        if prev_man.get("deletes")
        else spark.read.schema(schema).parquet(
            *[os.path.join(table_dir, f) for f, _ in candidates]
        )
    )
    doomed_rel = spark.read.parquet(doomed_abs).select(key_col)
    return (
        visible.join(doomed_rel, on=key_col, how="left_semi")
        .withColumn(CHANGE_TYPE, F.lit("delete"))
        .withColumn(COMMIT_VERSION, F.lit(v).cast("long"))
    )


def snapshot_changes(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """The row-level change feed for (``from_version``, ``to_version``]:
    every column of the table plus ``_change_type``
    ('insert' | 'delete') and ``_commit_version``. See the module
    docstring for which actions are representable; a non-representable
    commit in the range raises ValueError (fall back to
    ``plans.snapshot_diff`` or a recompute — the honest contract)."""
    to_v = (
        to_version
        if to_version is not None
        else L.current_version(table_dir)
    )
    if to_v < from_version:
        raise ValueError(
            f"to_version {to_v} < from_version {from_version}"
        )
    if to_v == 0:
        head = L.current_version(table_dir)
        if head == 0:
            # a never-committed table has no manifest to take a schema
            # from; same failure shape as read_snapshot, not a raw
            # manifest-miss
            raise FileNotFoundError(
                f"no committed snapshot under {table_dir}"
            )
        # explicit to_version=0 on a COMMITTED table is the empty range
        # (0, 0] — an empty feed (newest schema: v1 may be vacuumed),
        # not an error; a cursoring consumer's first no-op poll lands
        # here
        return _empty(
            spark,
            T.StructType.fromJson(
                json.loads(
                    L._load_manifest(table_dir, head, resolve=False)[
                        "schema"
                    ]
                )
            ),
        )
    schema = T.StructType.fromJson(
        json.loads(
            L._load_manifest(table_dir, to_v, resolve=False)["schema"]
        )
    )
    parts: list[DataFrame] = []
    prev_man = (
        L._load_manifest(table_dir, from_version, resolve=False)
        if from_version
        else None
    )
    for v in range(from_version + 1, to_v + 1):
        man = L._load_manifest(table_dir, v, resolve=False)
        action = man["action"]
        if action == "append":
            df = _append_inserts(
                spark, table_dir, schema, prev_man, man, v
            )
            if df is not None:
                parts.append(df)
        elif action == "delete_mor":
            if prev_man is None:
                raise ValueError(
                    "delete_mor at version 1 has no base to retract from"
                )
            df = _mor_delete_retractions(
                spark, table_dir, schema, prev_man, man, v
            )
            if df is not None:
                parts.append(df)
        elif action == "rewrite_manifests":
            pass  # metadata-only: file set (and visibility) unchanged
        else:
            raise ValueError(
                f"snapshot_changes cannot represent a {action!r} commit "
                f"(version {v}) as row-level changes; use "
                "plans.snapshot_diff (keyed) or recompute"
            )
        prev_man = man
    if not parts:
        return _empty(spark, schema)
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out


def fold_changes(changes: DataFrame, keys: list[str]) -> DataFrame:
    """Collapse a change feed to the NET state it implies: per key, the
    newest change wins (``_commit_version`` descending), and keys whose
    newest change is a delete drop out.
    ``fold_changes(snapshot_changes(0, v), keys)`` equals
    ``read_snapshot(v)`` row-for-row on any representable history whose
    VISIBLE rows are key-unique (the MERGE/CDC invariant); a table
    deliberately holding duplicate keys folds to one row per key, which
    is what a keyed consumer materializes anyway."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(
        F.col(COMMIT_VERSION).desc(),
        # within one version only one action exists today; order
        # 'insert' ahead of 'delete' anyway ('i' > 'd' descending) —
        # a delete retracts OLDER versions only, so a same-version
        # insert must win if the vocabulary ever grows one
        F.col(CHANGE_TYPE).desc(),
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(CHANGE_TYPE) == "insert"))
        .drop("_rn", CHANGE_TYPE, COMMIT_VERSION)
    )
