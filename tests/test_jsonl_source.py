"""JSONL corpus ingestion: declared-schema PERMISSIVE read, corrupt-line
quarantine, provenance column, and the parquet-conversion composite."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.sources.jsonl import (
    jsonl_to_documents_table,
    read_jsonl_documents,
)


def _write_jsonl(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_jsonl_clean_and_quarantine_split(spark, tmp_path):
    good = [
        json.dumps({"doc_id": i, "text": f"doc {i}", "lang": "en",
                    "source": "web", "n_chars": 6})
        for i in range(3)
    ]
    bad = ['{"doc_id": 99, "text": "unterminated', "not json at all"]
    path = _write_jsonl(tmp_path, "part0.jsonl", good + bad)
    res = read_jsonl_documents(spark, [path])
    assert res.clean.count() == 3
    assert res.corrupt.count() == 2
    # declared schema types survive; provenance points at the file
    row = res.clean.orderBy("doc_id").head()
    assert row["doc_id"] == 0 and row["n_chars"] == 6
    assert row["source_file"].endswith("part0.jsonl")
    # corrupt lines are preserved verbatim for offline inspection
    corrupt = {r[0] for r in res.corrupt.collect()}
    assert any("unterminated" in c for c in corrupt)


def test_jsonl_conversion_composite(spark, tmp_path):
    lines = [
        json.dumps({"doc_id": i, "text": "x", "lang": "en",
                    "source": f"s{i % 2}", "n_chars": 1})
        for i in range(4)
    ] + ["broken {"]
    path = _write_jsonl(tmp_path, "in.jsonl", lines)
    out = str(tmp_path / "docs_parquet")
    quar = str(tmp_path / "quarantine")
    counts = jsonl_to_documents_table(spark, [path], out, quar)
    assert counts == {"clean": 4, "corrupt": 1}
    back = spark.read.parquet(out)
    assert back.count() == 4
    # source-partitioned layout: per-domain reads prune
    assert back.filter(F.col("source") == "s0").count() == 2
    assert spark.read.json(quar).count() == 1


def test_jsonl_empty_input(spark, tmp_path):
    path = _write_jsonl(tmp_path, "empty.jsonl", [""])
    res = read_jsonl_documents(spark, [path])
    assert res.clean.count() == 0


def test_jsonl_streaming_ingestion(spark, tmp_path):
    """AvailableNow drain of a JSONL landing zone: clean rows land in
    parquet, corrupt lines in the quarantine, and a checkpointed re-run
    ingests nothing twice."""
    from music_streaming_etl_glue_spark.sources.jsonl import (
        ingest_jsonl_stream,
    )

    land = tmp_path / "landing"
    land.mkdir()
    good = [
        json.dumps({"doc_id": i, "text": "t", "lang": "en",
                    "source": "web", "n_chars": 1})
        for i in range(3)
    ]
    (land / "a.jsonl").write_text("\n".join(good[:2]) + "\nbroken {\n")
    (land / "b.jsonl").write_text(good[2] + "\n")
    out = str(tmp_path / "out")
    quar = str(tmp_path / "quar")
    ckpt = str(tmp_path / "ckpt")
    ingest_jsonl_stream(spark, str(land), out, quar, ckpt)
    assert spark.read.parquet(out).count() == 3
    assert spark.read.json(quar).count() == 1
    # idempotent restart: nothing new, nothing re-ingested
    ingest_jsonl_stream(spark, str(land), out, quar, ckpt)
    assert spark.read.parquet(out).count() == 3
