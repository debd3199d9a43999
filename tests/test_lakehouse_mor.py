"""Merge-on-read equality deletes (commit_delete_mor): the
write-optimized twin of the CoW delete — no data rewrite at commit,
readers apply the delete-key relations as broadcast anti-joins, with
Iceberg-v2 sequence semantics (a delete applies only to files that
existed before it, expressed as a file-count prefix over the
append-ordered file list)."""

from __future__ import annotations

import os

import pytest

from music_streaming_etl_glue_spark.plans import lakehouse as L


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, s string").coalesce(1)


def _rowset(df):
    return sorted((r["id"], r["s"]) for r in df.collect())


def test_mor_delete_rewrites_nothing_and_hides_rows(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    files_before = set(L._load_manifest(t, 1)["files"])
    v = L.commit_delete_mor(spark, t, "id", [2])
    assert v == 2
    man = L._load_manifest(t, 2, resolve=False)
    # SAME data files, one outstanding delete entry, exact n_rows
    assert set(L._load_manifest(t, 2)["files"]) == files_before
    assert man["action"] == "delete_mor" and man["n_rows"] == 2
    (entry,) = man["deletes"]
    assert entry["key_col"] == "id" and entry["n_keys"] == 1
    assert entry["prefix"] == len(files_before)
    assert os.path.exists(os.path.join(t, entry["path"]))
    assert _rowset(L.read_snapshot(spark, t)) == [(1, "a"), (3, "c")]
    # time travel below the delete still sees the row
    assert _rowset(L.read_snapshot(spark, t, 1)) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]


def test_mor_sequence_rule_reappended_key_stays_visible(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "old"), (2, "b")]), t)
    L.commit_delete_mor(spark, t, "id", [1])
    # re-append the deleted key AFTER the delete: the new row is past
    # the delete's prefix and must be visible
    L.commit_append(_df(spark, [(1, "new")]), t)
    assert _rowset(L.read_snapshot(spark, t)) == [(1, "new"), (2, "b")]
    assert L._load_manifest(
        t, L.current_version(t), resolve=False
    )["n_rows"] == 2
    # a second MoR delete of the same key kills the NEW row too
    v = L.commit_delete_mor(spark, t, "id", [1])
    assert _rowset(L.read_snapshot(spark, t, v)) == [(2, "b")]
    assert L._load_manifest(t, v, resolve=False)["n_rows"] == 1


def test_mor_stacked_deletes_never_double_subtract(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(i, f"r{i}") for i in range(10)]), t)
    L.commit_delete_mor(spark, t, "id", [3, 4])
    v = L.commit_delete_mor(spark, t, "id", [4, 5])  # 4 already hidden
    assert L._load_manifest(t, v, resolve=False)["n_rows"] == 7
    assert sorted(
        r["id"] for r in L.read_snapshot(spark, t, v).collect()
    ) == [0, 1, 2, 6, 7, 8, 9]


def test_mor_compact_materializes_and_clears(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    L.commit_delete_mor(spark, t, "id", [2])
    v = L.compact(spark, t, target_files=1)
    man = L._load_manifest(t, v, resolve=False)
    assert "deletes" not in man and man["n_rows"] == 2
    assert _rowset(L.read_snapshot(spark, t, v)) == [(1, "a"), (3, "c")]
    # cleared: rewriting commits are allowed again
    L.commit_delete(spark, t, "id", [3])
    assert _rowset(L.read_snapshot(spark, t)) == [(1, "a")]


def test_mor_guards_block_raw_rewrites(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a"), (2, "b")]), t)
    L.commit_delete_mor(spark, t, "id", [1])
    with pytest.raises(ValueError, match="merge-on-read"):
        L.commit_delete(spark, t, "id", [2])
    with pytest.raises(ValueError, match="merge-on-read"):
        L.commit_upsert(_df(spark, [(2, "u")]), t, keys=["id"])
    # appends carry the outstanding entry transparently
    v = L.commit_append(_df(spark, [(9, "z")]), t)
    assert len(L._load_manifest(t, v, resolve=False)["deletes"]) == 1


def test_mor_rollback_restores_deletes_and_vacuum_keeps_them(
    spark, tmp_path
):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a"), (2, "b")]), t)
    v_del = L.commit_delete_mor(spark, t, "id", [1])
    L.compact(spark, t, target_files=1)  # v3 clears
    v_rb = L.rollback(t, v_del)  # restore the deleted-state view
    assert _rowset(L.read_snapshot(spark, t, v_rb)) == [(2, "b")]
    man = L._load_manifest(t, v_rb, resolve=False)
    (entry,) = man["deletes"]
    # vacuum keeps the delete relation while a surviving version
    # references it
    L.vacuum(t, keep_versions=2, min_age_s=0.0)
    assert os.path.exists(os.path.join(t, entry["path"]))
    assert _rowset(L.read_snapshot(spark, t)) == [(2, "b")]


def test_mor_pruned_read_still_applies_deletes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for lo in (0, 100, 200):
        L.commit_append(
            _df(spark, [(lo + i, f"r{lo + i}") for i in range(10)]), t
        )
    L.commit_delete_mor(spark, t, "id", [105, 205])
    got = L.read_snapshot(spark, t, prune={"id": (100, 110)})
    ids = sorted(r["id"] for r in got.collect())
    assert 105 not in ids and set(ids) >= {100, 104, 106, 109}


def test_mor_on_format2_table_with_group_pruned_count(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setattr(L, "MANIFEST_INLINE_LIMIT", 2)
    monkeypatch.setattr(L, "MANIFEST_GROUP_TARGET", 2)
    t = str(tmp_path / "tbl")
    for lo in (0, 10, 20):
        L.commit_append(_df(spark, [(lo, f"r{lo}"), (lo + 1, f"r{lo+1}")]), t)
    assert L._load_manifest(t, 3, resolve=False).get("format") == 2
    v = L.commit_delete_mor(spark, t, "id", [10])
    man = L._load_manifest(t, v, resolve=False)
    assert man["n_rows"] == 5 and "groups" in man
    assert sorted(
        r["id"] for r in L.read_snapshot(spark, t, v).collect()
    ) == [0, 1, 11, 20, 21]
    # metadata-only group rewrite carries the delete entry
    v_rw = L.rewrite_manifests(t)
    if v_rw is not None:
        man_rw = L._load_manifest(t, v_rw, resolve=False)
        assert len(man_rw["deletes"]) == 1
        assert sorted(
            r["id"] for r in L.read_snapshot(spark, t, v_rw).collect()
        ) == [0, 1, 11, 20, 21]


def test_mor_python_datasource_batch_read_applies_deletes(
    spark, tmp_path
):
    from music_streaming_etl_glue_spark.sources import lake_source

    lake_source.register(spark)
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    L.commit_delete_mor(spark, t, "id", [2])
    got = (
        spark.read.format("lake").option("table", t).load()
    )
    assert sorted(r["id"] for r in got.collect()) == [1, 3]


def test_mor_delete_of_absent_or_null_keys(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a")]), t)
    # absent key: entry still lands (cheap), n_rows unchanged
    v = L.commit_delete_mor(spark, t, "id", [999])
    assert L._load_manifest(t, v, resolve=False)["n_rows"] == 1
    assert _rowset(L.read_snapshot(spark, t)) == [(1, "a")]
    # all-null key list: no commit at all
    assert L.commit_delete_mor(spark, t, "id", [None]) == v


def test_version_at_timestamp_time_travel(spark, tmp_path):
    import pytest as _pytest

    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a")]), t)
    ts1 = L._load_manifest(t, 1, resolve=False)["committed_ns"]
    L.commit_append(_df(spark, [(2, "b")]), t)
    ts2 = L._load_manifest(t, 2, resolve=False)["committed_ns"]
    assert L.version_at_timestamp(t, ts1) == 1
    assert L.version_at_timestamp(t, (ts1 + ts2) // 2) == 1
    assert L.version_at_timestamp(t, ts2) == 2
    assert L.version_at_timestamp(t, ts2 + 10**12) == 2
    with _pytest.raises(FileNotFoundError, match="predates"):
        L.version_at_timestamp(t, ts1 - 1)
    # through the DataSource option
    from music_streaming_etl_glue_spark.sources import lake_source

    lake_source.register(spark)
    got = (
        spark.read.format("lake")
        .option("table", t)
        .option("as_of_ns", str(ts1))
        .load()
    )
    assert _rowset(got) == [(1, "a")]


def test_mor_delete_rejects_unknown_key_column(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a")]), t)
    with pytest.raises(ValueError, match="not in table schema"):
        L.commit_delete_mor(spark, t, "nope", [1])
    # nothing landed: reads unaffected
    assert _rowset(L.read_snapshot(spark, t)) == [(1, "a")]


# ---- DataFrame-sided MoR deletes (commit_delete_mor_df, r14) ----


def _keys_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def test_mor_df_delete_writes_relation_executor_side(spark, tmp_path):
    """The doomed-key relation is written BY SPARK into the txn dir (a
    parquet directory with part files), never materialized on the
    driver — the VERDICT r13 scale fix."""
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    v = L.commit_delete_mor_df(spark, t, "id", _keys_df(spark, [2]))
    assert v == 2
    man = L._load_manifest(t, v, resolve=False)
    (entry,) = man["deletes"]
    assert entry["key_col"] == "id" and entry["n_keys"] == 1
    rel_abs = os.path.join(t, entry["path"])
    # executor-side write: the relation is a parquet DIRECTORY whose
    # part files Spark's writer named — not a driver-side pyarrow file
    assert os.path.isdir(rel_abs)
    assert any(
        n.startswith("part-") and n.endswith(".parquet")
        for n in os.listdir(rel_abs)
    )
    assert man["n_rows"] == 2
    assert _rowset(L.read_snapshot(spark, t)) == [(1, "a"), (3, "c")]


def test_mor_df_delete_matches_list_form_semantics(spark, tmp_path):
    """Same history driven through the list form and the DataFrame form
    lands identical visible state, n_rows, and sequence-rule behavior."""
    ta, tb = str(tmp_path / "a"), str(tmp_path / "b")
    rows = [(i, f"r{i}") for i in range(10)]
    for t in (ta, tb):
        L.commit_append(_df(spark, rows), t)
    L.commit_delete_mor(spark, ta, "id", [3, 4])
    L.commit_delete_mor_df(spark, tb, "id", _keys_df(spark, [3, 4]))
    # stacked delete overlapping an already-hidden key
    L.commit_delete_mor(spark, ta, "id", [4, 5])
    L.commit_delete_mor_df(spark, tb, "id", _keys_df(spark, [4, 5]))
    # sequence rule: re-append a deleted key, must be visible in both
    L.commit_append(_df(spark, [(3, "back")]), ta)
    L.commit_append(_df(spark, [(3, "back")]), tb)
    assert _rowset(L.read_snapshot(spark, ta)) == _rowset(
        L.read_snapshot(spark, tb)
    )
    assert (
        L._load_manifest(ta, L.current_version(ta), resolve=False)["n_rows"]
        == L._load_manifest(tb, L.current_version(tb), resolve=False)[
            "n_rows"
        ]
        == 8
    )


def test_mor_df_delete_null_dup_and_empty_keys(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a"), (2, "b")]), t)
    # nulls dropped, duplicates collapsed
    keys = spark.createDataFrame(
        [(2,), (2,), (None,)], "id long"
    )
    v = L.commit_delete_mor_df(spark, t, "id", keys)
    (entry,) = L._load_manifest(t, v, resolve=False)["deletes"]
    assert entry["n_keys"] == 1
    assert _rowset(L.read_snapshot(spark, t)) == [(1, "a")]
    # all-null / empty relation: NO commit, and the staged relation is
    # cleaned up (nothing for vacuum to chase)
    v2 = L.commit_delete_mor_df(
        spark, t, "id", spark.createDataFrame([(None,)], "id long")
    )
    assert v2 == v
    # exactly the append's txn dir + the real delete's relation dir —
    # the no-op attempt cleaned its staged (empty) relation up
    data_root = os.path.join(t, "data")
    assert len(os.listdir(data_root)) == 2


def test_mor_df_delete_large_keyset_skips_bloom_not_correctness(
    spark, tmp_path, monkeypatch
):
    """Key sets above _BLOOM_PROBE_KEY_CAP keep range-only pruning (the
    keys stay off the driver) — results identical either way."""
    monkeypatch.setattr(L, "_BLOOM_PROBE_KEY_CAP", 2)
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(i, f"r{i}") for i in range(20)]), t)
    v = L.commit_delete_mor_df(
        spark, t, "id", _keys_df(spark, [1, 5, 9, 13])
    )
    man = L._load_manifest(t, v, resolve=False)
    assert man["n_rows"] == 16
    assert sorted(
        r["id"] for r in L.read_snapshot(spark, t, v).collect()
    ) == [i for i in range(20) if i not in (1, 5, 9, 13)]


def test_mor_df_delete_feeds_cdf_and_vacuum(spark, tmp_path):
    """The directory-shaped delete relation flows through every reader
    of entry['path']: the row-level change feed retracts from it, the
    Python DataSource batch read anti-joins it, and vacuum keeps the
    txn dir while a surviving manifest references it."""
    from music_streaming_etl_glue_spark.plans import lake_cdf as C
    from music_streaming_etl_glue_spark.sources import lake_source

    lake_source.register(spark)
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    v = L.commit_delete_mor_df(spark, t, "id", _keys_df(spark, [2]))
    changes = sorted(
        (r["_commit_version"], r["_change_type"], r["id"])
        for r in C.snapshot_changes(spark, t, 0).collect()
    )
    assert (v, "delete", 2) in changes
    got = spark.read.format("lake").option("table", t).load()
    assert sorted(r["id"] for r in got.collect()) == [1, 3]
    (entry,) = L._load_manifest(t, v, resolve=False)["deletes"]
    L.vacuum(t, keep_versions=2, min_age_s=0.0)
    assert os.path.exists(os.path.join(t, entry["path"]))
    assert _rowset(L.read_snapshot(spark, t)) == [(1, "a"), (3, "c")]


def test_mor_df_delete_on_format2_table(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(L, "MANIFEST_INLINE_LIMIT", 2)
    monkeypatch.setattr(L, "MANIFEST_GROUP_TARGET", 2)
    t = str(tmp_path / "tbl")
    for lo in (0, 10, 20):
        L.commit_append(
            _df(spark, [(lo, f"r{lo}"), (lo + 1, f"r{lo+1}")]), t
        )
    assert L._load_manifest(t, 3, resolve=False).get("format") == 2
    v = L.commit_delete_mor_df(spark, t, "id", _keys_df(spark, [10, 21]))
    man = L._load_manifest(t, v, resolve=False)
    assert man["n_rows"] == 4 and "groups" in man
    assert sorted(
        r["id"] for r in L.read_snapshot(spark, t, v).collect()
    ) == [0, 1, 11, 20]


def test_mor_df_delete_with_bloom_side_files(spark, tmp_path):
    """DF-form delete on a bloom-indexed table: the capped probe path
    engages (small key set read back from the written relation) and the
    exact matched count still lands in n_rows."""
    t = str(tmp_path / "tbl")
    L.commit_append(
        _df(spark, [(i, f"r{i}") for i in range(20)]),
        t,
        bloom_cols=["id"],
    )
    v = L.commit_delete_mor_df(spark, t, "id", _keys_df(spark, [3, 17]))
    assert L._load_manifest(t, v, resolve=False)["n_rows"] == 18
    assert sorted(
        r["id"] for r in L.read_snapshot(spark, t, v).collect()
    ) == [i for i in range(20) if i not in (3, 17)]


def test_mor_delete_entries_record_key_hull(spark, tmp_path):
    """Both commit forms record the doomed-key hull in the manifest
    entry (r14), so the change-feed planners range-prune from metadata
    alone instead of reading the relation back to the driver."""
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(i, f"r{i}") for i in range(10)]), t)
    L.commit_delete_mor(spark, t, "id", [7, 3])
    (e1,) = L._load_manifest(t, 2, resolve=False)["deletes"]
    assert (e1["lo"], e1["hi"]) == (3, 7)
    L.commit_delete_mor_df(spark, t, "id", _keys_df(spark, [8, 1]))
    e2 = L._load_manifest(t, 3, resolve=False)["deletes"][-1]
    assert (e2["lo"], e2["hi"]) == (1, 8)


def test_mor_cdf_handles_legacy_hull_less_entries(spark, tmp_path):
    """Delete entries written before r14 carry no lo/hi: the change
    feed must fall back to reading the relation for the hull and still
    retract correctly."""
    import json as _json

    from music_streaming_etl_glue_spark.plans import lake_cdf as C

    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    L.commit_delete_mor(spark, t, "id", [2])
    # strip the hull in place, simulating a pre-r14 manifest
    mpath = L._manifest_path(t, 2)
    man = _json.load(open(mpath))
    for e in man["deletes"]:
        e.pop("lo"), e.pop("hi")
    with open(mpath, "w") as fh:
        _json.dump(man, fh)
    changes = sorted(
        (r["_commit_version"], r["_change_type"], r["id"])
        for r in C.snapshot_changes(spark, t, 0).collect()
    )
    assert (2, "delete", 2) in changes


def test_cli_delete_mor_where_predicate(spark, tmp_path, capsys):
    import json as _json

    from music_streaming_etl_glue_spark.__main__ import main

    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(i, f"r{i}") for i in range(10)]), t)
    rc = main([
        "lake", "--table", t, "delete-mor-where",
        "--key-col", "id", "--where", "id % 3 = 0",
    ])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    v = out["committed_version"]
    assert sorted(
        r["id"] for r in L.read_snapshot(spark, t, v).collect()
    ) == [1, 2, 4, 5, 7, 8]
    man = L._load_manifest(t, v, resolve=False)
    (entry,) = man["deletes"]
    assert entry["n_keys"] == 4 and man["n_rows"] == 6
    # missing args is a usage error, not a traceback
    assert main(["lake", "--table", t, "delete-mor-where"]) == 2


def test_mor_df_delete_rejects_unknown_key_column_before_writing(
    spark, tmp_path
):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [(1, "a")]), t)
    with pytest.raises(ValueError, match="not in table schema"):
        L.commit_delete_mor_df(
            spark, t, "nope",
            spark.createDataFrame([(1,)], "nope long"),
        )
    # validation fires before the relation write: no stray txn dirs
    # beyond the append's own
    data_root = os.path.join(t, "data")
    assert len(os.listdir(data_root)) == 1
