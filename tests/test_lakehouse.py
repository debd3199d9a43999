"""Snapshot-committed table format (plans.lakehouse): atomic commits,
snapshot isolation, time travel, rollback, compaction, vacuum."""

from __future__ import annotations

import json
import os

import pytest

from music_streaming_etl_glue_spark.plans import lakehouse as L


def _df(spark, ids):
    return spark.createDataFrame([(i, f"r{i}") for i in ids], "id long, s string")


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_append_overwrite_time_travel_and_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = L.commit_append(_df(spark, [1, 2]), t)
    v2 = L.commit_append(_df(spark, [3]), t)
    v3 = L.commit_overwrite(_df(spark, [9]), t)
    assert (v1, v2, v3) == (1, 2, 3)
    assert _ids(L.read_snapshot(spark, t)) == [9]
    assert _ids(L.read_snapshot(spark, t, 2)) == [1, 2, 3]
    assert _ids(L.read_snapshot(spark, t, 1)) == [1, 2]
    hist = L.history(t)
    assert [h["action"] for h in hist] == ["append", "append", "overwrite"]
    assert [h["n_rows"] for h in hist] == [2, 3, 1]


def test_rollback_is_a_forward_commit(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [1, 2]), t)
    L.commit_overwrite(_df(spark, [9]), t)
    v = L.rollback(t, 1)
    assert v == 3
    assert _ids(L.read_snapshot(spark, t)) == [1, 2]
    # the rolled-back version itself stays inspectable
    assert _ids(L.read_snapshot(spark, t, 2)) == [9]


def test_reader_never_sees_uncommitted_data(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [1]), t)
    # simulate a writer that crashed between its data write and its
    # manifest link: data files exist, no manifest references them
    L._write_data_files(_df(spark, [777]), t)
    assert _ids(L.read_snapshot(spark, t)) == [1]
    assert L.current_version(t) == 1


def test_commit_retries_on_lost_slot_race(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [1]), t)
    # another writer claims version 2 between our base read and our link:
    # plant a foreign manifest in the v2 slot
    files, schema_json, _stats, _n = L._write_data_files(
        _df(spark, [50]), t
    )
    body = {
        "version": 2,
        "parent": 1,
        "action": "append",
        "files": L._load_manifest(t, 1)["files"] + files,
        "n_rows": 2,
        "schema": schema_json,
        "committed_ns": 0,
    }
    with open(L._manifest_path(t, 2), "w") as fh:
        json.dump(body, fh)
    # our append must land at v3 ON TOP of the winner's snapshot
    v = L.commit_append(_df(spark, [7]), t)
    assert v == 3
    assert _ids(L.read_snapshot(spark, t)) == [1, 7, 50]


def test_compaction_preserves_rows_and_old_snapshots(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(4):
        L.commit_append(_df(spark, [i]), t)
    before = L.current_version(t)
    n_files_before = L.history(t)[-1]["n_files"]
    v = L.compact(spark, t, target_files=1)
    assert v == before + 1
    assert _ids(L.read_snapshot(spark, t)) == [0, 1, 2, 3]
    assert L.history(t)[-1]["n_files"] < n_files_before
    # pre-compaction snapshot still readable
    assert _ids(L.read_snapshot(spark, t, before)) == [0, 1, 2, 3]


def test_vacuum_reference_counting_and_inflight_guard(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [1]), t)
    L.commit_append(_df(spark, [2]), t)
    L.commit_overwrite(_df(spark, [9]), t)  # v3 references only its own txn
    # orphan from a crashed writer, too young to sweep under the guard
    L._write_data_files(_df(spark, [777]), t)
    deleted_guarded = L.vacuum(t, keep_versions=1, min_age_s=3600)
    # manifests v1/v2 dropped, but NO data deleted (v1/v2 files are old
    # enough but… v1 txn and v2 txn are also younger than 3600s)
    assert all(p.endswith(".json") for p in deleted_guarded)
    deleted = L.vacuum(t, keep_versions=1, min_age_s=0.0)
    # now the unreferenced txn dirs (v1's, v2's, the orphan) are gone
    assert sum(1 for p in deleted if not p.endswith(".json")) == 3
    assert _ids(L.read_snapshot(spark, t)) == [9]
    with pytest.raises(FileNotFoundError):
        L._load_manifest(t, 1)
    # every file the surviving snapshot references still exists
    for f in L._load_manifest(t, 3)["files"]:
        assert os.path.exists(os.path.join(t, f))


def test_vacuum_sweeps_crashed_tmp_manifests(spark, tmp_path):
    """A crash between a '.tmp-*' manifest write and its rename leaves
    junk in _manifests/ that nothing references; vacuum must sweep it
    behind the same min_age_s guard as data (ADVICE r12)."""
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [1]), t)
    mdir = L._manifest_dir(t)
    crashed = os.path.join(mdir, ".tmp-g-deadbeef-000000.json")
    with open(crashed, "w") as fh:
        fh.write("{}")
    # too young: the in-flight-writer guard keeps it
    L.vacuum(t, keep_versions=1, min_age_s=3600)
    assert os.path.exists(crashed)
    deleted = L.vacuum(t, keep_versions=1, min_age_s=0.0)
    assert crashed in deleted and not os.path.exists(crashed)
    # the table is untouched
    assert _ids(L.read_snapshot(spark, t)) == [1]


def test_empty_snapshot_stays_readable(spark, tmp_path):
    t = str(tmp_path / "tbl")
    empty = _df(spark, []).limit(0)
    L.commit_overwrite(empty, t)
    out = L.read_snapshot(spark, t)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id", "s"]


def test_txn_key_makes_append_idempotent(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = L.commit_append(_df(spark, [1]), t, txn_key="epoch-0")
    v_replay = L.commit_append(_df(spark, [1]), t, txn_key="epoch-0")
    assert v_replay == v1
    assert L.current_version(t) == 1
    assert _ids(L.read_snapshot(spark, t)) == [1]
    v2 = L.commit_append(_df(spark, [2]), t, txn_key="epoch-1")
    assert v2 == 2
    assert _ids(L.read_snapshot(spark, t)) == [1, 2]


def test_streaming_epochs_land_as_snapshots_exactly_once(spark, tmp_path):
    import datetime

    from music_streaming_etl_glue_spark.streaming.file_pipeline import (
        _lake_epoch_committer,
        ingest_lake_committed,
    )

    src = tmp_path / "in"
    src.mkdir()
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    def write_events(name, ids):
        rows = [
            (i, datetime.datetime(2024, 1, 1, 0, 0, i), 1, "play", 1.0, "{}")
            for i in ids
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))
        # the file stream reads loose files: lift the part file up
        part = next((src / name).glob("part-*.parquet"))
        part.rename(src / f"{name}.parquet")
        import shutil

        shutil.rmtree(src / name)

    def eids(df):
        return sorted(r["event_id"] for r in df.collect())

    write_events("a", [1, 2])
    assert ingest_lake_committed(spark, str(src), tbl, ckpt) == 1
    assert eids(L.read_snapshot(spark, tbl)) == [1, 2]

    # replay the landed epoch by hand (a foreachBatch retry): no-op
    replay = L.read_snapshot(spark, tbl, 1)
    _lake_epoch_committer(tbl)(replay, 0)
    assert L.current_version(tbl) == 1

    # a second increment lands as its own snapshot
    write_events("b", [3])
    assert ingest_lake_committed(spark, str(src), tbl, ckpt) == 1
    assert eids(L.read_snapshot(spark, tbl)) == [1, 2, 3]
    assert eids(L.read_snapshot(spark, tbl, 1)) == [1, 2]


def test_commit_upsert_is_transactional_last_write_wins(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(
        spark.createDataFrame(
            [(1, "old"), (2, "keep")], "id long, s string"
        ),
        t,
    )
    v = L.commit_upsert(
        spark.createDataFrame(
            [(1, "new"), (3, "ins")], "id long, s string"
        ),
        t,
        keys=["id"],
    )
    assert v == 2
    got = {r["id"]: r["s"] for r in L.read_snapshot(spark, t).collect()}
    assert got == {1: "new", 2: "keep", 3: "ins"}
    # pre-merge snapshot still resolvable
    pre = {r["id"]: r["s"] for r in L.read_snapshot(spark, t, 1).collect()}
    assert pre == {1: "old", 2: "keep"}


def test_compact_zordered_preserves_rows_and_tightens_ranges(spark, tmp_path):
    from music_streaming_etl_glue_spark.plans.layout import row_group_stats

    t = str(tmp_path / "tbl")
    # appends interleave x ranges across files
    rows = [(i, float(i % 16), float((i * 7) % 16)) for i in range(256)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    L.commit_append(df.repartition(4), t)
    v = L.compact_zordered(spark, t, cols=["x", "y"], target_files=4)
    snap = L.read_snapshot(spark, t, v)
    assert snap.count() == 256
    assert sorted(r["id"] for r in snap.collect()) == list(range(256))
    # each z-ordered file covers a narrower x span than the full domain
    txn_dir = os.path.dirname(
        os.path.join(t, L._load_manifest(t, v)["files"][0])
    )
    by_file: dict[str, list] = {}
    for s in row_group_stats(txn_dir, "x"):
        if s["min"] is not None:  # 0-row range partitions carry no stats
            by_file.setdefault(s["file"], []).append(s)
    widths = [
        max(s["max"] for s in stats) - min(s["min"] for s in stats)
        for stats in by_file.values()
    ]
    assert widths and min(widths) < 15.0  # full domain is [0, 15]


def test_append_evolves_schema_with_new_nullable_column(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [1, 2]), t)
    wide = spark.createDataFrame(
        [(3, "r3", 0.5)], "id long, s string, score double"
    )
    L.commit_append(wide, t)
    snap = L.read_snapshot(spark, t)
    assert [f.name for f in snap.schema.fields] == ["id", "s", "score"]
    got = {r["id"]: r["score"] for r in snap.collect()}
    assert got == {1: None, 2: None, 3: 0.5}
    # the pre-evolution snapshot keeps its narrow schema
    assert [f.name for f in L.read_snapshot(spark, t, 1).schema.fields] == [
        "id",
        "s",
    ]


def test_append_rejects_type_change(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [1]), t)
    retyped = spark.createDataFrame([(2, 9)], "id long, s long")
    with pytest.raises(ValueError, match="schema evolution rejected"):
        L.commit_append(retyped, t)
    # nothing committed; the orphan data files are vacuum fodder
    assert L.current_version(t) == 1


def test_pruned_read_skips_files_by_manifest_stats(spark, tmp_path):
    t = str(tmp_path / "tbl")
    # two appends with disjoint id ranges -> disjoint per-file stats
    L.commit_append(
        spark.createDataFrame(
            [(i, f"r{i}") for i in range(100)], "id long, s string"
        ).coalesce(1),
        t,
    )
    L.commit_append(
        spark.createDataFrame(
            [(i, f"r{i}") for i in range(1000, 1100)], "id long, s string"
        ).coalesce(1),
        t,
    )
    man = L._load_manifest(t, 2)
    assert len(man["files"]) == 2 and len(man["stats"]) == 2
    pruned = L.prune_files(man, {"id": (1000, None)})
    assert len(pruned) == 1  # the low-range file is provably irrelevant
    out = L.read_snapshot(spark, t, prune={"id": (1000, None)})
    assert sorted(r["id"] for r in out.collect()) == list(range(1000, 1100))
    # open-ended low bound keeps both; unknown column keeps both
    assert len(L.prune_files(man, {"id": (None, None)})) == 2
    assert len(L.prune_files(man, {"nope": (0, 1)})) == 2


def test_zorder_compaction_improves_file_pruning(spark, tmp_path):
    t = str(tmp_path / "tbl")
    # interleaved x across 4 files: every file spans the whole domain
    rows = [(i, float(i % 64)) for i in range(512)]
    L.commit_append(
        spark.createDataFrame(rows, "id long, x double").repartition(4), t
    )
    before = L.prune_files(
        L._load_manifest(t, 1), {"x": (0.0, 7.9)}
    )
    assert len(before) == 4  # no skipping possible pre-clustering
    v = L.compact_zordered(spark, t, cols=["x"], target_files=4)
    man = L._load_manifest(t, v)
    after = L.prune_files(man, {"x": (0.0, 7.9)})
    assert 0 < len(after) < len(man["files"])  # clustering unlocked skipping
    got = L.read_snapshot(spark, t, prune={"x": (0.0, 7.9)}).filter(
        "x <= 7.9"
    )
    assert got.count() == 512 // 64 * 8


def test_commit_delete_rewrites_only_files_that_can_hold_the_keys(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for lo in (0, 1000, 2000):  # three disjoint-range files
        L.commit_append(
            spark.createDataFrame(
                [(i, f"r{i}") for i in range(lo, lo + 100)],
                "id long, s string",
            ).coalesce(1),
            t,
        )
    before = L._load_manifest(t, 3)
    v = L.commit_delete(spark, t, "id", [1005, 1042])
    assert v == 4
    after = L._load_manifest(t, 4)
    # the two low/high-range files survive by path; only the middle one
    # was rewritten
    survivors = set(before["files"]) & set(after["files"])
    assert len(survivors) == 2
    assert after["n_rows"] == 298
    got = _ids(L.read_snapshot(spark, t))
    assert 1005 not in got and 1042 not in got and len(got) == 298
    # prior snapshot still holds the rows until vacuum makes it physical
    assert 1005 in _ids(L.read_snapshot(spark, t, 3))
    # a miss (no file can hold the key) is a no-op, not a new version
    assert L.commit_delete(spark, t, "id", [999999]) == 4


def test_snapshot_delta_reads_only_the_appended_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [1, 2]), t)
    L.commit_append(_df(spark, [3, 4]), t)
    L.commit_append(_df(spark, [5]), t)
    assert _ids(L.snapshot_delta(spark, t, 1)) == [3, 4, 5]
    assert _ids(L.snapshot_delta(spark, t, 1, 2)) == [3, 4]
    assert _ids(L.snapshot_delta(spark, t, 0, 1)) == [1, 2]
    assert L.snapshot_delta(spark, t, 3).count() == 0  # nothing new
    # incremental maintenance invariant: base-agg + delta-agg == full-agg
    base = L.read_snapshot(spark, t, 1).count()
    delta = L.snapshot_delta(spark, t, 1).count()
    assert base + delta == L.read_snapshot(spark, t, 3).count()


def test_snapshot_delta_refuses_non_append_ranges(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [1]), t)
    L.commit_overwrite(_df(spark, [9]), t)
    L.commit_append(_df(spark, [10]), t)
    with pytest.raises(ValueError, match="append-only"):
        L.snapshot_delta(spark, t, 1)
    # a range that starts after the rewrite is fine
    assert _ids(L.snapshot_delta(spark, t, 2)) == [10]


def test_lake_driven_kpi_maintenance_matches_one_shot(spark, tmp_path):
    from music_streaming_etl_glue_spark.plans.incremental import (
        maintain_kpis_from_lake,
    )
    from music_streaming_etl_glue_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    tbl = str(tmp_path / "events_lake")
    state_inc = str(tmp_path / "state_inc")
    state_one = str(tmp_path / "state_one")
    cursor = str(tmp_path / "cursor.json")

    halves = [
        events.filter("event_id % 2 = 0"),
        events.filter("event_id % 2 = 1"),
    ]
    # incremental: maintain after each landed append
    for h in halves:
        L.commit_append(h, tbl)
        res = maintain_kpis_from_lake(
            spark, tbl, customer, nation, state_inc, cursor
        )
        assert res["delta_rows"] == h.count()
    # idempotent when nothing new landed
    res = maintain_kpis_from_lake(
        spark, tbl, customer, nation, state_inc, cursor
    )
    assert res["delta_rows"] == 0

    # one-shot: a single maintenance pass over the SAME snapshot
    maintain_kpis_from_lake(
        spark, tbl, customer, nation, state_one, str(tmp_path / "c2.json")
    )

    from pyspark.sql import functions as F

    def view(path):
        return sorted(
            (
                r["date"],
                r["track_genre"],
                r["listen_count"],
                r["est"],
                r["listening_time_dec"],
            )
            for r in spark.read.parquet(path)
            .select(
                "date",
                "track_genre",
                "listen_count",
                F.hll_sketch_estimate("listeners_sketch").alias("est"),
                "listening_time_dec",
            )
            .collect()
        )

    assert view(state_inc) == view(state_one)


def _race_worker(args):
    # module-level for pickling; pure-manifest commits, no Spark needed
    table_dir, wid, n = args
    import sys

    sys.path.insert(0, "/root/repo")
    from music_streaming_etl_glue_spark.plans import lakehouse as LK

    versions = []
    for i in range(n):
        versions.append(
            LK._commit(
                table_dir,
                "append",
                [f"data/w{wid}/f{i}.parquet"],
                '{"type":"struct","fields":[]}',
                1,
                True,
            )
        )
    return versions


def test_concurrent_writers_linearize_through_the_slot_claim(tmp_path):
    from multiprocessing import Pool

    t = str(tmp_path / "tbl")
    n_workers, per = 4, 15
    with Pool(n_workers) as pool:
        results = pool.map(
            _race_worker, [(t, w, per) for w in range(n_workers)]
        )
    total = n_workers * per
    assert L.current_version(t) == total  # every commit won SOME slot
    claimed = sorted(v for vs in results for v in vs)
    assert claimed == list(range(1, total + 1))  # no slot double-claimed
    man = L._load_manifest(t, total)
    assert man["n_rows"] == total
    assert len(man["files"]) == total
    assert len(set(man["files"])) == total  # no append lost in a retry


def test_read_modify_write_commits_refuse_to_drop_a_racing_append(
    spark, tmp_path
):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [1, 2, 3, 4]), t)
    base = L.current_version(t)
    # a concurrent append lands AFTER the rewrite was computed
    L.commit_append(_df(spark, [99]), t)
    files, schema_json, stats, _n = L._write_data_files(
        _df(spark, [1, 2]), t
    )
    with pytest.raises(L.ConcurrentCommitError, match="advanced"):
        L._commit(
            t, "compact", files, schema_json, 2, False,
            stats=stats, require_base=base,
        )
    # nothing committed over the racer; its row is intact
    assert 99 in _ids(L.read_snapshot(spark, t))


def test_vacuum_never_deletes_manifests_above_its_sampled_window(
    spark, tmp_path, monkeypatch
):
    t = str(tmp_path / "tbl")
    for i in range(4):
        L.commit_append(_df(spark, [i]), t)
    # vacuum sampled newest=3 (stale) while v4 has already committed
    real = L.current_version

    def stale(table_dir):
        return 3 if table_dir == t else real(table_dir)

    monkeypatch.setattr(L, "current_version", stale)
    L.vacuum(t, keep_versions=1, min_age_s=0.0)
    monkeypatch.setattr(L, "current_version", real)
    # the concurrently-landed v4 manifest survived; v1-2 are gone
    assert L.current_version(t) == 4
    assert _ids(L.read_snapshot(spark, t, 4)) == [0, 1, 2, 3]
    with pytest.raises(FileNotFoundError):
        L._load_manifest(t, 2)


def test_txn_key_survives_many_subsequent_commits(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = L.commit_append(_df(spark, [1]), t, txn_key="e0")
    for i in range(2, 6):
        L.commit_append(_df(spark, [i]), t, txn_key=f"e{i}")
    assert L.commit_append(_df(spark, [1]), t, txn_key="e0") == v1
    assert L.current_version(t) == 5  # replay committed nothing


def test_schema_evolution_forces_new_fields_nullable(spark, tmp_path):
    from pyspark.sql import types as T

    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [1]), t)
    wide_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("s", T.StringType(), True),
            T.StructField("score", T.DoubleType(), False),  # non-nullable
        ]
    )
    L.commit_append(
        spark.createDataFrame([(2, "r2", 0.5)], wide_schema), t
    )
    snap = L.read_snapshot(spark, t)
    assert snap.schema["score"].nullable is True
    got = {r["id"]: r["score"] for r in snap.collect()}
    assert got == {1: None, 2: 0.5}


def test_kpi_maintenance_lock_excludes_overlapping_runs(spark, tmp_path):
    import fcntl
    import os

    from music_streaming_etl_glue_spark.plans.incremental import (
        maintain_kpis_from_lake,
    )
    from music_streaming_etl_glue_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    tbl = str(tmp_path / "lake")
    cursor = str(tmp_path / "cursor.json")
    L.commit_append(load_table(spark, sf, "events"), tbl)
    # another run holds the lock: this run must skip, not double-merge
    fd = os.open(cursor + ".lock", os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX)
    try:
        res = maintain_kpis_from_lake(
            spark, tbl,
            load_table(spark, sf, "customer"),
            load_table(spark, sf, "nation"),
            str(tmp_path / "state"), cursor,
        )
        assert res == {"skipped": True}
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)
    res = maintain_kpis_from_lake(
        spark, tbl,
        load_table(spark, sf, "customer"),
        load_table(spark, sf, "nation"),
        str(tmp_path / "state"), cursor,
    )
    assert res["delta_rows"] > 0  # lock released: the merge proceeds


def test_commit_delete_keeps_null_key_rows(spark, tmp_path):
    # `key IN (doomed)` is NULL for a NULL key — SQL DELETE keeps those
    # rows, so commit_delete must too (a bare ~isin filter drops them)
    t = str(tmp_path / "tbl")
    rows = [(1, "a"), (2, "b"), (None, "null-1"), (3, "c"), (None, "null-2")]
    L.commit_append(
        spark.createDataFrame(rows, "id long, s string").coalesce(1), t
    )
    v = L.commit_delete(spark, t, "id", [2])
    assert v == 2
    got = L.read_snapshot(spark, t).collect()
    assert sorted(r["s"] for r in got) == ["a", "c", "null-1", "null-2"]
    assert L._load_manifest(t, 2)["n_rows"] == 4


def test_coerce_keys_uses_table_schema(spark, tmp_path):
    t_int = str(tmp_path / "t_int")
    t_str = str(tmp_path / "t_str")
    L.commit_append(_df(spark, [1, 2]), t_int)
    L.commit_append(
        spark.createDataFrame([("u1", 1), ("u2", 2)], "uid string, v long"),
        t_str,
    )
    assert L.coerce_keys(t_int, "id", ["1", "7"]) == [1, 7]
    assert L.coerce_keys(t_str, "uid", ["u1"]) == ["u1"]
    with pytest.raises(ValueError, match="not in table schema"):
        L.coerce_keys(t_int, "nope", ["1"])
    # end-to-end: string-keyed delete through the coerced path
    v = L.commit_delete(
        spark, t_str, "uid", L.coerce_keys(t_str, "uid", ["u1"])
    )
    assert sorted(
        r["uid"] for r in L.read_snapshot(spark, t_str, v).collect()
    ) == ["u2"]


def test_kpi_maintenance_recovers_from_non_append_commit(spark, tmp_path):
    """A compaction (non-append) inside the cursor range must trigger a
    full recompute + cursor re-seed, not a permanent wedge."""
    from music_streaming_etl_glue_spark.plans.incremental import (
        maintain_kpis_from_lake,
    )
    from music_streaming_etl_glue_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    tbl = str(tmp_path / "events_lake")
    state = str(tmp_path / "state")
    cursor = str(tmp_path / "cursor.json")

    L.commit_append(events.filter("event_id % 2 = 0"), tbl)
    maintain_kpis_from_lake(spark, tbl, customer, nation, state, cursor)
    # a compaction lands in the next cursor range alongside a new append
    L.compact(spark, tbl, target_files=2)
    L.commit_append(events.filter("event_id % 2 = 1"), tbl)
    res = maintain_kpis_from_lake(
        spark, tbl, customer, nation, state, cursor
    )
    assert res.get("recomputed") is True
    assert res["to_version"] == L.current_version(tbl)
    # cursor re-seeded: the next run is a clean incremental no-op
    res2 = maintain_kpis_from_lake(
        spark, tbl, customer, nation, state, cursor
    )
    assert res2 == {
        "from_version": res["to_version"],
        "to_version": res["to_version"],
        "delta_rows": 0,
    }
    # recomputed state equals a one-shot maintenance from scratch
    state_one = str(tmp_path / "state_one")
    maintain_kpis_from_lake(
        spark, tbl, customer, nation, state_one, str(tmp_path / "c2.json")
    )
    from pyspark.sql import functions as F

    def view(path):
        return sorted(
            (
                r["date"], r["track_genre"], r["listen_count"],
                r["est"], r["listening_time_dec"],
            )
            for r in spark.read.parquet(path)
            .select(
                "date", "track_genre", "listen_count",
                F.hll_sketch_estimate("listeners_sketch").alias("est"),
                "listening_time_dec",
            )
            .collect()
        )

    assert view(state) == view(state_one)


def test_kpi_maintenance_recovers_from_vacuumed_cursor_range(
    spark, tmp_path
):
    """A cursor that fell below vacuum retention (its range's manifests
    deleted) must trigger the same full-recompute recovery as a
    non-append commit — snapshot_delta raises FileNotFoundError there,
    not ValueError, and catching only the latter wedged the maintainer
    permanently (ADVICE r12)."""
    from music_streaming_etl_glue_spark.plans.incremental import (
        maintain_kpis_from_lake,
    )
    from music_streaming_etl_glue_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    tbl = str(tmp_path / "events_lake")
    state = str(tmp_path / "state")
    cursor = str(tmp_path / "cursor.json")

    L.commit_append(events.filter("event_id % 4 = 0"), tbl)
    maintain_kpis_from_lake(spark, tbl, customer, nation, state, cursor)
    for m in (1, 2, 3):
        L.commit_append(events.filter(f"event_id % 4 = {m}"), tbl)
    # retention drops the cursor version's manifest (keep newest 2 of 4)
    L.vacuum(tbl, keep_versions=2, min_age_s=0.0)
    res = maintain_kpis_from_lake(
        spark, tbl, customer, nation, state, cursor
    )
    assert res.get("recomputed") is True
    assert res["to_version"] == L.current_version(tbl)
    # cursor re-seeded: the next run is a clean incremental no-op
    res2 = maintain_kpis_from_lake(
        spark, tbl, customer, nation, state, cursor
    )
    assert res2["delta_rows"] == 0 and "recomputed" not in res2


def test_commit_upsert_rewrites_only_files_in_the_update_key_range(
    spark, tmp_path
):
    t = str(tmp_path / "tbl")
    for lo in (0, 1000, 2000):  # three disjoint-range files
        L.commit_append(
            spark.createDataFrame(
                [(i, f"r{i}") for i in range(lo, lo + 100)],
                "id long, s string",
            ).coalesce(1),
            t,
        )
    before = L._load_manifest(t, 3)
    v = L.commit_upsert(
        spark.createDataFrame(
            [(1005, "updated"), (3005, "inserted")], "id long, s string"
        ),
        t,
        keys=["id"],
    )
    after = L._load_manifest(t, v)
    # only the middle file (holding 1005) was rewritten; the update
    # range [1005, 3005] cannot intersect [0,99] but the conservative
    # range check keeps [2000,2099]? no: 1005..3005 overlaps 2000-2099,
    # so that file rewrites too — the low file survives by path
    survivors = set(before["files"]) & set(after["files"])
    assert any("data/" in f for f in survivors)
    low_file = [
        f for f in before["files"]
        if before["stats"][f]["id"][0] == 0
    ]
    assert set(low_file) <= survivors
    assert after["n_rows"] == 301
    rows = {r["id"]: r["s"] for r in L.read_snapshot(spark, t).collect()}
    assert rows[1005] == "updated" and rows[3005] == "inserted"
    assert rows[5] == "r5" and len(rows) == 301


def test_commit_upsert_pure_insert_rewrites_nothing(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [1, 2, 3]), t)
    before = L._load_manifest(t, 1)
    v = L.commit_upsert(
        spark.createDataFrame([(900, "new")], "id long, s string"),
        t,
        keys=["id"],
    )
    after = L._load_manifest(t, v)
    # every file with recorded key stats survives by path (zero
    # rewrites); stat-less files — empty part files here — are
    # conservatively rewritten, which is the contract, not a bug
    stat_files = {
        f for f in before["files"] if "id" in before["stats"].get(f, {})
    }
    assert stat_files <= set(after["files"])
    assert after["n_rows"] == 4
    # all-NULL update keys are inserts too (NULL matches nothing)
    v2 = L.commit_upsert(
        spark.createDataFrame([(None, "null-key")], "id long, s string"),
        t,
        keys=["id"],
    )
    got = L.read_snapshot(spark, t, v2).collect()
    assert sorted(r["s"] for r in got) == ["new", "null-key", "r1", "r2", "r3"]


def _race_worker_grouped(args):
    # as _race_worker, but with the inline limit forced to 2 so every
    # commit lands in the manifest-list format — the slot-claim retry
    # must re-merge GROUP LISTS by reference without losing an append
    table_dir, wid, n = args
    import sys

    sys.path.insert(0, "/root/repo")
    from music_streaming_etl_glue_spark.plans import lakehouse as LK

    LK.MANIFEST_INLINE_LIMIT = 2
    LK.MANIFEST_GROUP_TARGET = 3
    versions = []
    for i in range(n):
        versions.append(
            LK._commit(
                table_dir,
                "append",
                [f"data/w{wid}/f{i}.parquet"],
                '{"type":"struct","fields":[]}',
                1,
                True,
            )
        )
    return versions


def test_concurrent_grouped_writers_linearize_without_losing_groups(
    tmp_path, monkeypatch
):
    from multiprocessing import Pool

    monkeypatch.setattr(L, "MANIFEST_INLINE_LIMIT", 2)
    monkeypatch.setattr(L, "MANIFEST_GROUP_TARGET", 3)
    t = str(tmp_path / "tbl")
    n_workers, per = 4, 12
    with Pool(n_workers) as pool:
        results = pool.map(
            _race_worker_grouped, [(t, w, per) for w in range(n_workers)]
        )
    total = n_workers * per
    assert L.current_version(t) == total
    claimed = sorted(v for vs in results for v in vs)
    assert claimed == list(range(1, total + 1))
    raw = L._load_manifest(t, total, resolve=False)
    assert raw.get("format") == 2
    resolved = L._load_manifest(t, total)
    assert raw["n_rows"] == total
    assert len(resolved["files"]) == total
    assert len(set(resolved["files"])) == total  # no append lost/duped


def test_bloom_sidefiles_prune_hash_distributed_deletes(spark, tmp_path):
    """min/max ranges prune NOTHING on a hash-distributed key (every
    file spans the domain); per-file bloom side files must cut the
    delete's rewrite set to ~the files actually holding the keys."""
    t = str(tmp_path / "tbl")
    # 8 files, ids hash-scattered so each file's [min, max] spans ~all
    df = spark.range(0, 4000).selectExpr(
        "CAST(hash(id) AS LONG) * 100000 + id AS id",
        "CAST(id AS STRING) AS s",
    ).repartition(8)
    L.commit_append(df, t, bloom_cols=["id"])
    man = L._load_manifest(t, 1)
    all_files = man["files"]
    assert len(all_files) == 8
    # side file exists for every data file
    for f in all_files:
        assert os.path.exists(os.path.join(t, f) + ".bloom")
    # range pruning alone would rewrite everything: every file's range
    # intersects any in-domain key
    doomed = [r["id"] for r in L.read_snapshot(spark, t).limit(2).collect()]
    v = L.commit_delete(spark, t, "id", doomed)
    after = set(L._load_manifest(t, v)["files"])
    rewritten = set(all_files) - after
    # the 2 doomed keys live in at most 2 files (+ rare 1% fp)
    assert 1 <= len(rewritten) <= 3
    got = L.read_snapshot(spark, t, v)
    assert got.count() == 4000 - 2
    assert got.filter(got.id.isin(doomed)).count() == 0


def test_bloom_absent_or_unreadable_is_conservative(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.range(0, 400).selectExpr(
        "CAST(hash(id) AS LONG) * 100000 + id AS id",
        "CAST(id AS STRING) AS s",
    ).repartition(4)
    L.commit_append(df, t)  # NO bloom_cols
    all_files = L._load_manifest(t, 1)["files"]
    doomed = [r["id"] for r in L.read_snapshot(spark, t).limit(1).collect()]
    v = L.commit_delete(spark, t, "id", doomed)
    after = set(L._load_manifest(t, v)["files"])
    # no blooms -> every range-surviving file conservatively rewritten
    assert set(all_files) - after == set(all_files)
    assert L.read_snapshot(spark, t, v).count() == 399
    # corrupt side file on a fresh table: must also fall back
    t2 = str(tmp_path / "tbl2")
    L.commit_append(df, t2, bloom_cols=["id"])
    files2 = L._load_manifest(t2, 1)["files"]
    with open(os.path.join(t2, files2[0]) + ".bloom", "w") as fh:
        fh.write("{not json")
    doomed2 = [
        r["id"] for r in L.read_snapshot(spark, t2).limit(1).collect()
    ]
    v2 = L.commit_delete(spark, t2, "id", doomed2)
    assert L.read_snapshot(spark, t2, v2).count() == 399


def test_bloom_null_and_string_keys(spark, tmp_path):
    t = str(tmp_path / "tbl")
    rows = [("u1", 1), ("u2", 2), (None, 3), ("u4", 4)]
    L.commit_append(
        spark.createDataFrame(rows, "uid string, v long").coalesce(1),
        t,
        bloom_cols=["uid"],
    )
    v = L.commit_delete(spark, t, "uid", ["u2"])
    got = sorted(
        (r["uid"] or "", r["v"])
        for r in L.read_snapshot(spark, t, v).collect()
    )
    assert got == [("", 3), ("u1", 1), ("u4", 4)]  # NULL key survives
    # a key containing a None probes conservatively (no crash, rewrite)
    v2 = L.commit_delete(spark, t, "uid", [None, "u1"])
    assert sorted(
        r["v"] for r in L.read_snapshot(spark, t, v2).collect()
    ) == [3, 4]


def test_bloom_sidefiles_swept_with_txn_dir_by_vacuum(spark, tmp_path):
    t = str(tmp_path / "tbl")
    L.commit_append(_df(spark, [1, 2]).coalesce(1), t, bloom_cols=["id"])
    f0 = L._load_manifest(t, 1)["files"][0]
    side = os.path.join(t, f0) + ".bloom"
    assert os.path.exists(side)
    L.commit_overwrite(_df(spark, [9]), t)
    L.vacuum(t, keep_versions=1, min_age_s=0.0)
    assert not os.path.exists(side)  # rode out with its txn dir


def test_bloom_vector_scalar_hash_parity(spark, tmp_path):
    """The numpy splitmix64 build lane and the scalar probe MUST be
    bit-identical — a silent divergence would make every bloom probe
    miss and every delete conservatively rewrite (correct but the
    whole feature silently off), or worse, falsely clear a file."""
    import random

    import numpy as np

    rng = random.Random(13)
    vals = (
        [0, 1, -1, 2**62, -(2**62), 2**63 - 1, -(2**63)]
        + [rng.randint(-(2**63), 2**63 - 1) for _ in range(500)]
    )
    u = np.array(vals, dtype=np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        z = u + np.uint64(L._SM_C1)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(L._SM_C2)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(L._SM_C3)
        h1_vec = z ^ (z >> np.uint64(31))
    for v, h1v in zip(vals, h1_vec.tolist()):
        h1s, _h2s = L._bloom_hash_pair(v)
        assert h1s == h1v, f"scalar/vector divergence at {v}"
    # end-to-end: every key written to a file must probe as present
    t = str(tmp_path / "tbl")
    some = rng.sample(vals, 20)
    L.commit_append(
        spark.createDataFrame(
            [(v, "x") for v in vals], "id long, s string"
        ).coalesce(1),
        t,
        bloom_cols=["id"],
    )
    f = L._load_manifest(t, 1)["files"][0]
    for v in vals:
        assert L._bloom_may_contain_any(t, f, "id", [v])
    # and absent keys mostly probe False (deterministic: fixed data +
    # fixed hash; the ~1% fp envelope leaves wide margin under 10%)
    present = set(vals)
    absent = [v + 1 for v in some if v + 1 not in present][:20]
    fp = sum(
        1 for v in absent if L._bloom_may_contain_any(t, f, "id", [v])
    )
    assert fp <= 2


def test_upsert_bloom_probe_on_hash_distributed_keys(spark, tmp_path):
    """A small MERGE whose keys are hash-distributed must cut its
    rewrite set via the bloom side files, like commit_delete — and the
    result must equal the unpruned merge semantics exactly."""
    t = str(tmp_path / "tbl")
    df = spark.range(0, 4000).selectExpr(
        "CAST(hash(id) AS LONG) * 100000 + id AS id",
        "CAST(id AS STRING) AS s",
    ).repartition(8)
    L.commit_append(df, t, bloom_cols=["id"])
    all_files = L._load_manifest(t, 1)["files"]
    two = [r["id"] for r in L.read_snapshot(spark, t).limit(2).collect()]
    ups = spark.createDataFrame(
        [(two[0], "updated"), (two[1], "updated"), (10**17, "inserted")],
        "id long, s string",
    )
    v = L.commit_upsert(ups, t, keys=["id"])
    after = set(L._load_manifest(t, v)["files"])
    rewritten = set(all_files) - after
    assert 1 <= len(rewritten) <= 3  # not all 8
    got = L.read_snapshot(spark, t, v)
    assert got.count() == 4001
    assert got.filter(got.s == "updated").count() == 2
    assert got.filter(got.id == 10**17).count() == 1
    # keys still unique (no duplicate rows from a wrongly-cleared file)
    assert got.select("id").distinct().count() == 4001


def test_blooms_survive_compaction_and_cow_rewrites(spark, tmp_path):
    """Rewriting commits rebuild bloom side files for their output
    whenever the predecessor files carried them — the delete-pruning
    feature must survive maintenance, not silently degrade."""
    t = str(tmp_path / "tbl")
    df = spark.range(0, 2000).selectExpr(
        "CAST(hash(id) AS LONG) * 100000 + id AS id",
        "CAST(id AS STRING) AS s",
    ).repartition(4)
    L.commit_append(df, t, bloom_cols=["id"])
    v = L.compact(spark, t, target_files=2)
    for f in L._load_manifest(t, v)["files"]:
        assert os.path.exists(os.path.join(t, f) + ".bloom")
    # a keyed delete on the compacted table still prunes via blooms
    doomed = [r["id"] for r in L.read_snapshot(spark, t).limit(1).collect()]
    v2 = L.commit_delete(spark, t, "id", doomed)
    # ... and the delete's own rewritten output re-carries the bloom
    new_files = set(L._load_manifest(t, v2)["files"]) - set(
        L._load_manifest(t, v)["files"]
    )
    for f in new_files:
        assert os.path.exists(os.path.join(t, f) + ".bloom")
    assert L.read_snapshot(spark, t).count() == 1999


def test_epoch_committer_lands_blooms_per_epoch(spark, tmp_path):
    from music_streaming_etl_glue_spark.streaming.file_pipeline import (
        _lake_epoch_committer,
    )

    tbl = str(tmp_path / "tbl")
    write = _lake_epoch_committer(tbl, bloom_cols=["id"])
    write(_df(spark, [1, 2]).coalesce(1), 0)
    write(_df(spark, [3]).coalesce(1), 1)
    files = L._load_manifest(t := tbl, L.current_version(t))["files"]
    assert len(files) == 2
    for f in files:
        assert os.path.exists(os.path.join(tbl, f) + ".bloom")
