"""Model-based randomized check of the snapshot table format: a plain
Python dict-of-versions model executes the same operation sequence as the
real lakehouse, and every step asserts read_snapshot == model — across
appends, overwrites, upserts, deletes, compactions, rollbacks, and
vacuums. Seeds are fixed, so failures replay deterministically."""

from __future__ import annotations

import random

import pytest

from music_streaming_etl_glue_spark.plans import lakehouse as L


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, s string")


def _rowset(df):
    return sorted((r["id"], r["s"]) for r in df.collect())


def _run_sequence(spark, tmp_path, seed, n_ops=14):
    rng = random.Random(seed)
    t = str(tmp_path / f"tbl_{seed}")
    model: dict[int, list[tuple[int, str]]] = {}  # version -> rowset
    next_id = 0

    def fresh_rows(n):
        nonlocal next_id
        rows = [(next_id + i, f"s{seed}_{next_id + i}") for i in range(n)]
        next_id += n
        return rows

    L.commit_append(_df(spark, fresh_rows(3)), t)
    model[1] = sorted(
        (i, f"s{seed}_{i}") for i in range(next_id - 3, next_id)
    )
    ops = ["append", "overwrite", "upsert", "delete", "compact", "rollback",
           "vacuum", "rewrite_manifests", "delete_mor"]
    for _ in range(n_ops):
        op = rng.choice(ops)
        cur_v = L.current_version(t)
        cur = list(model[cur_v])
        has_mor = bool(
            L._load_manifest(t, cur_v, resolve=False).get("deletes")
        )
        if op == "append":
            rows = fresh_rows(rng.randint(1, 3))
            v = L.commit_append(_df(spark, rows), t)
            model[v] = sorted(cur + rows)
        elif op == "overwrite":
            rows = fresh_rows(rng.randint(1, 3))
            v = L.commit_overwrite(_df(spark, rows), t)
            model[v] = sorted(rows)
        elif op == "upsert":
            updates = [
                (i, f"u{seed}_{i}")
                for i, _ in rng.sample(cur, min(len(cur), 2))
            ] + fresh_rows(1)
            if has_mor:
                # rewriting commits must REFUSE over outstanding MoR
                # deletes (they read files raw and would resurrect)
                with pytest.raises(ValueError, match="merge-on-read"):
                    L.commit_upsert(_df(spark, updates), t, keys=["id"])
                continue
            v = L.commit_upsert(_df(spark, updates), t, keys=["id"])
            upd = {i: s for i, s in updates}
            model[v] = sorted(
                [(i, upd.get(i, s)) for i, s in cur if i not in upd]
                + list(upd.items())
            )
        elif op == "delete":
            if not cur:
                continue
            doomed = [i for i, _ in rng.sample(cur, min(len(cur), 2))]
            if has_mor:
                with pytest.raises(ValueError, match="merge-on-read"):
                    L.commit_delete(spark, t, "id", doomed)
                continue
            v = L.commit_delete(spark, t, "id", doomed)
            model[v] = sorted(
                (i, s) for i, s in cur if i not in doomed
            )
        elif op == "delete_mor":
            if not cur:
                continue
            doomed = [i for i, _ in rng.sample(cur, min(len(cur), 2))]
            v = L.commit_delete_mor(spark, t, "id", doomed)
            model[v] = sorted(
                (i, s) for i, s in cur if i not in doomed
            )
        elif op == "compact":
            v = L.compact(spark, t, target_files=2)
            model[v] = cur
        elif op == "rewrite_manifests":
            # metadata-only: merges under-filled manifest groups by
            # reference; the rowset is identical, and a no-op (format-1
            # table / nothing to merge) must not commit at all
            v = L.rewrite_manifests(t)
            if v is None:
                continue
            model[v] = cur
        elif op == "rollback":
            target = rng.choice(sorted(model))
            v = L.rollback(t, target)
            model[v] = list(model[target])
        elif op == "vacuum":
            L.vacuum(t, keep_versions=2, min_age_s=0.0)
            floor = max(1, L.current_version(t) - 1)
            model = {v: r for v, r in model.items() if v >= floor}
            continue
        # the live snapshot must match the model at every step
        assert _rowset(L.read_snapshot(spark, t)) == model[v], (
            f"seed={seed} op={op} v={v}"
        )
    # every surviving version still time-travels correctly
    for v, rows in model.items():
        assert _rowset(L.read_snapshot(spark, t, v)) == rows, (
            f"seed={seed} final check v={v}"
        )
    return t


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_lakehouse_matches_reference_model_under_random_ops(
    spark, tmp_path, seed
):
    _run_sequence(spark, tmp_path, seed)


@pytest.mark.parametrize("seed", [31, 59])
def test_model_holds_in_manifest_list_format(
    spark, tmp_path, seed, monkeypatch
):
    """The SAME randomized op sequences with the inline limit forced to
    2 files and 3-file groups — every commit past the first lands in the
    two-level manifest-list format, so the full op mix (append /
    overwrite / upsert / delete / compact / rollback / vacuum) exercises
    format 2 end to end against the reference model."""
    monkeypatch.setattr(L, "MANIFEST_INLINE_LIMIT", 2)
    monkeypatch.setattr(L, "MANIFEST_GROUP_TARGET", 3)
    t = _run_sequence(spark, tmp_path, seed)
    cur = L.current_version(t)
    raw = L._load_manifest(t, cur, resolve=False)
    assert "groups" in raw or L.manifest_n_files(raw) <= 2, (
        "expected the surviving head snapshot to be format 2"
    )
