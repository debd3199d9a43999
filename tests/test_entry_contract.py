"""Driver-contract guards that run in seconds: the full DuckDB parity
gate (tools/oracle_check.py) executes everything; this file catches the
cheap breakages — a query key without its oracle wired, or oracle SQL
that no longer parses — without starting a single Spark job."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from music_streaming_etl_glue_spark.sources.catalog import TABLES
from tests.conftest import SF_SMOKE

#: r12 retired this set: every former member (the HLL/KLL/top-k
#: sketches, PCA, banded DTW, the BPE trainer) was upgraded to a
#: BOUNDED driver check — the entry emits exact aggregates/anchors the
#: DuckDB oracle reproduces plus within-envelope/invariant flags it
#: asserts TRUE, so the driver hash compare now covers the FULL
#: catalog. Raw sketch/spectrum/sequence outputs remain the operator
#: functions; pytest still pins those exactly (see
#: tests/test_bounded_audits.py for the flip-the-flag teeth tests).
ROWS_ONLY: set[str] = set()


def test_every_query_has_an_oracle_or_is_declared_rows_only():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(o) <= set(q)
    assert set(q) - set(o) == ROWS_ONLY


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    return con


def test_every_oracle_sql_parses_and_plans(duck):
    """EXPLAIN (bind + plan, no execution) every oracle against the real
    table schemas — catches column typos, dialect slips, and schema
    drift in ~seconds."""
    bad = {}
    for name, sql in entry.oracle_sql().items():
        try:
            duck.sql(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001 — collect all, report once
            bad[name] = str(exc).splitlines()[0][:120]
    assert not bad, bad


def test_cli_list_and_query(spark, capsys):
    """python -m music_streaming_etl_glue_spark: `list` prints the
    catalog; `query` materializes one and reports rows."""
    from music_streaming_etl_glue_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "enriched" in out and "ann_topk_ivfpq" in out
    assert main(["query", "--sf-dir", SF_SMOKE, "--limit", "2", "user_kpis"]) == 0
    out = capsys.readouterr().out
    assert "user_kpis (" in out
    assert main(["query", "--sf-dir", SF_SMOKE, "nope"]) == 2


def test_cli_refresh_roundtrip(spark, tmp_path, capsys):
    """`refresh --old --new --out` writes the next corpus and prints a
    JSON audit with consistent arithmetic."""
    import json

    from music_streaming_etl_glue_spark.__main__ import main

    old_p, new_p, out_p = (
        str(tmp_path / "old"), str(tmp_path / "new"), str(tmp_path / "next")
    )
    spark.createDataFrame(
        [(i, f"doc {i} alpha beta gamma") for i in range(8)],
        "doc_id long, text string",
    ).write.parquet(old_p)
    spark.createDataFrame(
        [(i, f"doc {i} alpha beta gamma") for i in range(8)]
        + [(50, "a brand new never seen document body")],
        "doc_id long, text string",
    ).write.parquet(new_p)

    assert main(["refresh", "--old", old_p, "--new", new_p, "--out", out_p]) == 0
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["unchanged"] == 8 and audit["added"] == 1
    assert audit["corpus_rows"] == audit["unchanged"] + audit["admitted"]
    assert spark.read.parquet(out_p).count() == audit["corpus_rows"]


def test_oracled_queries_emit_scalar_columns_only(spark, catalog_dfs):
    """Catalog rule (the pq_codes lesson, rounds 4-5): every queries()
    entry with an oracle_sql twin is hash-compared by the driver, whose
    pandas canonicalizer sorts every column — list/struct/map cells are
    unhashable there and turn a correct query into a red ERR row. Guard
    at schema level (analysis only, no jobs — the session-scoped
    catalog_dfs fixture shares one construction pass with the plan
    sweep) so a future entry can't reintroduce the failure mode."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    import __spark_entry__ as m

    offenders = {}
    oracled = set(m.oracle_sql())
    for name, df in catalog_dfs.items():
        if name not in oracled:
            continue  # rows-only entries may keep arrays (never hashed)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[name] = bad
    assert offenders == {}
