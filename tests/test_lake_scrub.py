"""Lake change feed -> incremental scrubbers (plans.lake_scrub): a MERGE
or CoW delete upstream re-scrubs exactly the changed docs, appends ride
the cheap file-set delta, and the cursor advances atomically."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.plans import lakehouse as L
from music_streaming_etl_glue_spark.plans.lake_scrub import (
    scrub_lake_changes,
)
from tests.conftest import SF_SMOKE


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "source", "text")
        .filter("doc_id < 400")
    )


def test_merge_rescrubs_exactly_the_changed_docs(spark, tmp_path):
    t = str(tmp_path / "docs_lake")
    cursor = str(tmp_path / "cursor.json")
    docs = _docs(spark)
    L.commit_append(docs, t)
    # baseline pass consumes the initial append
    res0 = scrub_lake_changes(spark, t, cursor)
    assert res0.mode == "append_delta"
    assert res0.changed_docs == docs.count()

    # a MERGE: 3 docs edited (one into an exact copy of another corpus
    # doc), 2 added (one a near-copy)
    some = [r["doc_id"] for r in docs.orderBy("doc_id").limit(4).collect()]
    donor = docs.filter(F.col("doc_id") == some[3]).collect()[0]["text"]
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    updates = spark.createDataFrame(
        [
            (some[0], "src", donor),              # exact dup of donor
            (some[1], "src", donor + " trailing extra tokens here"),
            (some[2], "src", "totally fresh content nothing shared"),
            (mx + 1, "src", "brand new unique document body"),
            (mx + 2, "src", donor),               # added exact dup
        ],
        "doc_id long, source string, text string",
    )
    L.commit_upsert(updates, t, keys=["doc_id"])

    res = scrub_lake_changes(spark, t, cursor)
    assert res.mode == "keyed_diff"  # MERGE is a rewrite, not an append
    got_ids = sorted(r["doc_id"] for r in res.flags.collect())
    assert got_ids == sorted([some[0], some[1], some[2], mx + 1, mx + 2])
    assert res.changed_docs == 5
    flags = {r["doc_id"]: r for r in res.flags.collect()}
    assert flags[some[0]]["exact_dup"]       # copied donor text
    assert flags[mx + 2]["exact_dup"]
    assert not flags[some[2]]["exact_dup"]
    assert flags[some[2]]["keep"]
    # the ExactSubstr scrub also ran on exactly the changed docs
    sids = sorted(r["doc_id"] for r in res.scrubbed.collect())
    assert sids == got_ids
    # cursor advanced: an immediate re-run is a no-op
    res2 = scrub_lake_changes(spark, t, cursor)
    assert res2.mode == "noop" and res2.changed_docs == 0
    assert json.load(open(cursor))["version"] == L.current_version(t)


def test_append_path_uses_file_set_delta(spark, tmp_path):
    t = str(tmp_path / "docs_lake")
    cursor = str(tmp_path / "cursor.json")
    docs = _docs(spark)
    L.commit_append(docs.filter("doc_id % 2 = 0"), t)
    scrub_lake_changes(spark, t, cursor)
    L.commit_append(docs.filter("doc_id % 2 = 1"), t)
    res = scrub_lake_changes(spark, t, cursor)
    assert res.mode == "append_delta"
    assert res.changed_docs == docs.filter("doc_id % 2 = 1").count()
    # appended docs were scrubbed against the v1 corpus
    assert res.flags.count() == res.changed_docs


def test_cow_delete_triggers_keyed_diff_with_no_rescrub_targets(
    spark, tmp_path
):
    t = str(tmp_path / "docs_lake")
    cursor = str(tmp_path / "cursor.json")
    docs = _docs(spark)
    L.commit_append(docs, t)
    scrub_lake_changes(spark, t, cursor)
    doomed = [r["doc_id"] for r in docs.orderBy("doc_id").limit(2).collect()]
    L.commit_delete(spark, t, "doc_id", doomed)
    res = scrub_lake_changes(spark, t, cursor)
    # a pure delete changes no surviving content: nothing re-scrubs,
    # but the cursor still advances past the rewrite
    assert res.mode == "keyed_diff" and res.changed_docs == 0
    assert json.load(open(cursor))["version"] == L.current_version(t)


def test_substring_scrub_removes_merged_in_long_spans(spark, tmp_path):
    t = str(tmp_path / "docs_lake")
    cursor = str(tmp_path / "cursor.json")
    docs = _docs(spark)
    L.commit_append(docs, t)
    scrub_lake_changes(spark, t, cursor)
    donor = docs.orderBy("doc_id").limit(1).collect()[0]["text"]
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    # a new doc quoting a long corpus passage verbatim
    quoted = "my own words then " + donor + " and my own tail"
    L.commit_upsert(
        spark.createDataFrame(
            [(mx + 1, "src", quoted)], "doc_id long, source string, text string"
        ),
        t,
        keys=["doc_id"],
    )
    res = scrub_lake_changes(spark, t, cursor)
    row = res.scrubbed.filter(F.col("doc_id") == mx + 1).collect()[0]
    assert row["n_removed"] > 0
    assert donor not in row["clean_text"]


def test_streaming_scrub_rides_the_lake_changefeed(spark, tmp_path):
    """The streaming ExactSubstr rung consuming lake commits instead of
    the file landing zone: docs land scrubbed against everything
    committed before them, exactly once across restarts."""
    from music_streaming_etl_glue_spark.streaming.file_pipeline import (
        scrub_lake_changefeed,
    )

    t = str(tmp_path / "docs_lake")
    out = str(tmp_path / "scrubbed")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    base = "alpha beta gamma delta " * 8  # 32 tokens, > K=20
    L.commit_append(
        spark.createDataFrame(
            [(1, base.strip()), (2, "totally unrelated words only")],
            "doc_id long, text string",
        ),
        t,
    )
    scrub_lake_changefeed(spark, t, out, ckpt, state)
    first = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert first[2]["n_removed"] == 0

    # a second COMMIT quotes the first commit's passage verbatim
    L.commit_append(
        spark.createDataFrame(
            [(3, "prefix words then " + base.strip() + " suffix words")],
            "doc_id long, text string",
        ),
        t,
    )
    scrub_lake_changefeed(spark, t, out, ckpt, state)
    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[3]["n_removed"] > 0
    assert "alpha beta gamma delta alpha" not in rows[3]["clean_text"]
    # exactly-once: a restart with nothing new re-lands nothing
    n_before = spark.read.parquet(out).count()
    scrub_lake_changefeed(spark, t, out, ckpt, state)
    assert spark.read.parquet(out).count() == n_before


def test_cli_lake_scrub_verb(spark, tmp_path, capsys):
    from music_streaming_etl_glue_spark.__main__ import main

    t = str(tmp_path / "docs_lake")
    cursor = str(tmp_path / "cursor.json")
    L.commit_append(_docs(spark).limit(50), t)
    assert main(["lake", "--table", t, "scrub", "--cursor", cursor]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "append_delta" and out["changed_docs"] == 50
    assert main(["lake", "--table", t, "scrub"]) == 2  # cursor required
