"""Shared DuckDB-oracle comparison (mirrors the driver's compare: row count,
column names sorted, order-insensitive value hash with doubles rounded)."""

from __future__ import annotations

import math

import duckdb


def duckdb_con(sf_dir: str):
    from music_streaming_etl_glue_spark.sources.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        r = round(v, 9)
        # the driver's hash distinguishes -0.0 from 0.0 (Python == does
        # not) — fold the zero's sign into the token so the local compare
        # is driver-faithful (the r10 audio_embeddings divergence class)
        if r == 0.0 and math.copysign(1.0, r) < 0:
            return "-0.0"
        return r
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        [tuple(_norm(r[i]) for i in idx) for r in rows],
        key=lambda t: tuple(str(x) for x in t),
    )


def assert_matches_oracle(sdf, con, sql: str):
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o = con.execute(sql)
    o_cols = [d[0] for d in o.description]
    o_rows = o.fetchall()
    assert sorted(s_cols) == sorted(o_cols), f"columns {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"rowcount {len(s_rows)} vs {len(o_rows)}"
    a, b = rowset(s_cols, s_rows), rowset(o_cols, o_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"value mismatch, first diffs: {diffs}")
