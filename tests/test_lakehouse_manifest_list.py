"""Two-level manifest-list format (format 2, VERDICT r11 item #4):
snapshots past MANIFEST_INLINE_LIMIT files carry a manifest LIST of
immutable group files with group-level stats. These tests pin the scale
properties the inline format cannot have: planning a pruned read of a
>10^4-file snapshot opens only the version file + the pruned groups,
appends extend the list by reference (no group rewrites), deletes pass
untouched groups through unopened, and vacuum reference-counts group
files like data."""

from __future__ import annotations

import json
import os

import pytest

from music_streaming_etl_glue_spark.plans import lakehouse as L

SCHEMA_JSON = (
    '{"type":"struct","fields":['
    '{"name":"id","type":"long","nullable":true,"metadata":{}}]}'
)


def _fake_commit(table_dir: str, n_files: int, start: int = 0) -> int:
    """Pure-manifest append of fake file paths with disjoint per-file id
    ranges — planning never opens data files, so none need to exist."""
    files = [f"data/fake/{start + i:08d}.parquet" for i in range(n_files)]
    stats = {
        f: {"id": [(start + i) * 10, (start + i) * 10 + 9]}
        for i, f in enumerate(files)
    }
    return L._commit(
        table_dir, "append", files, SCHEMA_JSON, n_files, True, stats=stats
    )


def test_10k_file_snapshot_plans_via_pruned_groups(tmp_path, monkeypatch):
    t = str(tmp_path / "big")
    v = _fake_commit(t, 12_000)
    assert v == 1
    raw = L._load_manifest(t, 1, resolve=False)
    # the version file is a manifest LIST, not an inline file list
    assert raw.get("format") == 2 and "files" not in raw
    n_groups = len(raw["groups"])
    assert n_groups == -(-12_000 // L.MANIFEST_GROUP_TARGET)
    assert L.manifest_n_files(raw) == 12_000
    # group-level stats cover the id ranges
    g0 = raw["groups"][0]
    assert g0["stats"]["id"][0] == 0

    opened = []
    real = L._load_group

    def counting(table_dir, rel):
        opened.append(rel)
        return real(table_dir, rel)

    monkeypatch.setattr(L, "_load_group", counting)
    # a point-range plan must open exactly ONE group file
    files = L.plan_snapshot_files(t, raw, {"id": (55_555, 55_555)})
    assert files == ["data/fake/00005555.parquet"]
    assert len(opened) == 1
    # an unpruned plan resolves every group (still only group files,
    # never a per-file listing)
    opened.clear()
    all_files = L.plan_snapshot_files(t, raw)
    assert len(all_files) == 12_000 and len(opened) == n_groups


def test_append_extends_manifest_list_by_reference(tmp_path):
    t = str(tmp_path / "big")
    _fake_commit(t, 5_000)
    g1 = [g["path"] for g in L._load_manifest(t, 1, resolve=False)["groups"]]
    _fake_commit(t, 1_000, start=5_000)
    raw2 = L._load_manifest(t, 2, resolve=False)
    g2 = [g["path"] for g in raw2["groups"]]
    # v1's groups appear in v2 UNCHANGED and in order; only new groups
    # were written — the O(new files) append metadata property
    assert g2[: len(g1)] == g1
    assert raw2["n_rows"] == 6_000 and L.manifest_n_files(raw2) == 6_000
    # the group files themselves were not rewritten (same inode content)
    for rel in g1:
        assert os.path.exists(os.path.join(t, rel))


def test_grouped_end_to_end_with_real_data(spark, tmp_path, monkeypatch):
    """Force tiny limits so real Spark data lands in format 2, then
    drive reads, time travel, pruning, NULL-safe delete, rollback,
    snapshot_delta, and vacuum through it."""
    monkeypatch.setattr(L, "MANIFEST_INLINE_LIMIT", 4)
    monkeypatch.setattr(L, "MANIFEST_GROUP_TARGET", 3)
    t = str(tmp_path / "tbl")

    def df(ids):
        return spark.createDataFrame(
            [(i, f"r{i}") for i in ids], "id long, s string"
        ).repartition(3)

    L.commit_append(df(range(0, 30)), t)
    L.commit_append(df(range(30, 60)), t)
    raw = L._load_manifest(t, 2, resolve=False)
    assert raw.get("format") == 2
    got = sorted(r["id"] for r in L.read_snapshot(spark, t).collect())
    assert got == list(range(60))
    # pruned read still returns every matching row
    pruned = L.read_snapshot(spark, t, prune={"id": (10, 12)})
    ids = sorted(r["id"] for r in pruned.collect())
    assert set(ids) >= {10, 11, 12}
    # snapshot_delta group fast path
    delta = sorted(r["id"] for r in L.snapshot_delta(spark, t, 1).collect())
    assert delta == list(range(30, 60))
    # NULL-keyed delete on a grouped table
    L.commit_append(
        spark.createDataFrame(
            [(None, "keepme")], "id long, s string"
        ).coalesce(1),
        t,
    )
    v = L.commit_delete(spark, t, "id", [5, 45])
    rows = L.read_snapshot(spark, t, v).collect()
    ids = sorted(r["id"] for r in rows if r["id"] is not None)
    assert 5 not in ids and 45 not in ids and len(ids) == 58
    assert any(r["s"] == "keepme" for r in rows)
    assert L._load_manifest(t, v, resolve=False)["n_rows"] == 59
    # rollback re-references the old snapshot's groups
    rb = L.rollback(t, 2)
    assert sorted(
        r["id"] for r in L.read_snapshot(spark, t, rb).collect()
    ) == list(range(60))
    raw_rb = L._load_manifest(t, rb, resolve=False)
    assert raw_rb.get("format") == 2
    # history never resolves groups
    hist = L.history(t)
    assert [h["version"] for h in hist] == [1, 2, 3, 4, 5]
    # vacuum: group files referenced by surviving versions stay; ones
    # referenced only by dropped versions go
    before_groups = {
        n for n in os.listdir(os.path.join(t, "_manifests"))
        if n.startswith("g-")
    }
    deleted = L.vacuum(t, keep_versions=2, min_age_s=0.0)
    after_groups = {
        n for n in os.listdir(os.path.join(t, "_manifests"))
        if n.startswith("g-")
    }
    assert after_groups < before_groups  # some groups swept
    # surviving versions still read correctly after the sweep
    assert sorted(
        r["id"] for r in L.read_snapshot(spark, t).collect()
    ) == list(range(60))
    assert any(p.endswith(".json") for p in deleted)


def test_grouped_delete_leaves_untouched_groups_unopened(
    tmp_path, monkeypatch
):
    t = str(tmp_path / "big")
    _fake_commit(t, 9_000)
    raw = L._load_manifest(t, 1, resolve=False)
    n_groups = len(raw["groups"])
    opened = []
    real = L._load_group

    def counting(table_dir, rel):
        opened.append(rel)
        return real(table_dir, rel)

    monkeypatch.setattr(L, "_load_group", counting)
    # a delete whose keys are out of every group's range is a no-op that
    # opens NOTHING (group stats prove absence)
    v = L.commit_delete(None, t, "id", [10**9])
    assert v == 1 and opened == []
    # sanity: the planning side sees all groups
    assert len(L.plan_snapshot_files(t, raw)) == 9_000
    assert len(set(opened)) == n_groups


def test_inline_tables_stay_format_1(tmp_path):
    t = str(tmp_path / "small")
    _fake_commit(t, 10)
    raw = L._load_manifest(t, 1, resolve=False)
    assert "groups" not in raw and len(raw["files"]) == 10


def test_crossover_inline_to_grouped_preserves_history(
    tmp_path, monkeypatch
):
    monkeypatch.setattr(L, "MANIFEST_INLINE_LIMIT", 8)
    monkeypatch.setattr(L, "MANIFEST_GROUP_TARGET", 4)
    t = str(tmp_path / "cross")
    _fake_commit(t, 6)           # inline
    _fake_commit(t, 6, start=6)  # crosses the limit -> format 2
    raw1 = L._load_manifest(t, 1, resolve=False)
    raw2 = L._load_manifest(t, 2, resolve=False)
    assert "groups" not in raw1 and raw2.get("format") == 2
    # resolution equivalence across the crossover
    assert sorted(L._load_manifest(t, 2)["files"]) == sorted(
        f"data/fake/{i:08d}.parquet" for i in range(12)
    )
    # version files stay small: the v2 body holds group refs, not 12
    # file paths
    body = json.load(open(L._manifest_path(t, 2)))
    assert "files" not in body


def test_rewrite_manifests_bounds_group_count_over_500_epochs(tmp_path):
    """500 small appends onto a format-2 table, with the epoch
    committer's trigger policy applied between commits: the group-entry
    count must stay BOUNDED (not ∝ epochs), the resolved file set and
    order must be byte-identical, and the rewrite must be metadata-only
    (no data paths touched — there are no data files to touch)."""
    from music_streaming_etl_glue_spark.streaming.file_pipeline import (
        _GROUP_REWRITE_TRIGGER,
    )

    t = str(tmp_path / "frag")
    _fake_commit(t, 3_000)  # format-2 base (> MANIFEST_INLINE_LIMIT)
    max_groups = 0
    for epoch in range(500):
        _fake_commit(t, 2, start=3_000 + epoch * 2)
        v = L.current_version(t)
        raw = L._load_manifest(t, v, resolve=False)
        if len(raw["groups"]) > _GROUP_REWRITE_TRIGGER:
            assert L.rewrite_manifests(t) == v + 1
        raw = L._load_manifest(t, L.current_version(t), resolve=False)
        max_groups = max(max_groups, len(raw["groups"]))
    # bounded: never past trigger + 1 (one fresh group lands between
    # rewrites), nowhere near the ~503 an unmanaged table accumulates
    assert max_groups <= _GROUP_REWRITE_TRIGGER + 1
    final = L._load_manifest(t, L.current_version(t), resolve=False)
    assert final["action"] in ("append", "rewrite_manifests")
    # the resolved file set survives every merge, in append order
    resolved = L._load_manifest(t, L.current_version(t))["files"]
    assert resolved == [
        f"data/fake/{i:08d}.parquet" for i in range(4_000)
    ]
    assert final["n_rows"] == 4_000
    # per-file stats survive the merge: a point plan opens few groups
    files = L.plan_snapshot_files(t, final, {"id": (35_555, 35_555)})
    assert files == ["data/fake/00003555.parquet"]


def test_rewrite_manifests_is_noop_on_format1_and_already_packed(
    tmp_path,
):
    t1 = str(tmp_path / "small")
    _fake_commit(t1, 10)  # inline format 1
    assert L.rewrite_manifests(t1) is None
    assert L.current_version(t1) == 1  # no commit spam
    t2 = str(tmp_path / "packed")
    _fake_commit(t2, 3_000)  # 2 full + 1 partial group: no 2-run to merge
    v1 = L.current_version(t2)
    again = L.rewrite_manifests(t2)
    raw = L._load_manifest(t2, v1, resolve=False)
    n_under = sum(
        1 for g in raw["groups"] if g["n_files"] < L.MANIFEST_GROUP_TARGET
    )
    if n_under < 2:
        assert again is None and L.current_version(t2) == v1


def test_cli_lake_rewrite_manifests_verb(tmp_path, capsys):
    import json as _json

    from music_streaming_etl_glue_spark.__main__ import main

    t = str(tmp_path / "frag")
    _fake_commit(t, 3_000)
    for epoch in range(4):
        _fake_commit(t, 2, start=3_000 + epoch * 2)
    assert main(["lake", "--table", t, "rewrite-manifests"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["noop"] is False and out["committed_version"] == 6
    # idempotent: nothing left to merge
    assert main(["lake", "--table", t, "rewrite-manifests"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["noop"] is True


def test_rewrite_manifests_preserves_snapshot_delta_and_change_feed(
    spark, tmp_path, monkeypatch
):
    """snapshot_delta tolerates the metadata-only commit in an append
    range (falling back to the file-set diff), and the lake change feed
    passes through it emitting ZERO rows without skip_rewrites."""
    monkeypatch.setattr(L, "MANIFEST_INLINE_LIMIT", 2)
    monkeypatch.setattr(L, "MANIFEST_GROUP_TARGET", 4)
    t = str(tmp_path / "tbl")

    def df(ids):
        return spark.createDataFrame(
            [(i, f"r{i}") for i in ids], "id long, s string"
        ).coalesce(1)

    L.commit_append(df(range(0, 3)), t)    # v1
    L.commit_append(df(range(3, 6)), t)    # v2
    L.commit_append(df(range(6, 9)), t)    # v3 — three 1-file groups
    v_rw = L.rewrite_manifests(t)          # v4: metadata-only merge
    assert v_rw == 4
    raw = L._load_manifest(t, 4, resolve=False)
    assert raw["action"] == "rewrite_manifests"
    assert len(raw["groups"]) < 3
    # byte-identical snapshot across the rewrite
    assert sorted(
        r["id"] for r in L.read_snapshot(spark, t, 4).collect()
    ) == list(range(9))
    L.commit_append(df(range(9, 12)), t)   # v5: append over merged layout
    # delta across the rewrite boundary: appended rows only, rewrite
    # contributes nothing
    delta = sorted(r["id"] for r in L.snapshot_delta(spark, t, 2).collect())
    assert delta == list(range(6, 12))
    # change feed: the same range through the streaming source's
    # file-delta walk — the rewrite version yields zero files
    from music_streaming_etl_glue_spark.sources import lake_source as LS

    files_v4 = LS._delta_files(t, 3, 4, skip_rewrites=False)
    assert files_v4 == []
    files_range = LS._delta_files(t, 2, 5, skip_rewrites=False)
    got = sorted(
        r["id"]
        for p in files_range
        for r in spark.read.parquet(p).collect()
    )
    assert got == list(range(6, 12))
