"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet (default sf0.01), then compares row count,
column names, and order-insensitive values (doubles rounded to 9 places).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from music_streaming_etl_glue_spark.session import get_spark  # noqa: E402
from music_streaming_etl_glue_spark.sources.catalog import TABLES  # noqa: E402


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        r = round(v, 9)
        # the driver hashes value REPRs, under which -0.0 != 0.0; Python
        # == treats them equal, so fold the zero's sign into the token
        # (the r10 audio_embeddings divergence class)
        if r == 0.0 and math.copysign(1.0, r) < 0:
            return "-0.0"
        return r
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        [tuple(_norm(r[i]) for i in idx) for r in rows],
        key=lambda t: tuple(str(x) for x in t),
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # one JVM hosts driver + executors for all ~190 queries and lazy
    # localCheckpoint blocks accumulate; at sf0.1 the 1 GiB default heap
    # evicts them mid-gate ("Block rdd_N does not exist") — same sizing
    # as bench.py / tests/conftest.py
    spark = get_spark(
        "oracle_check", extra_conf={"spark.driver.memory": "16g"}
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:42s} rows-only: {len(s_rows)} rows")
            continue
        o = con.execute(oracles[name])
        o_cols = [d[0] for d in o.description]
        o_rows = o.fetchall()
        status = []
        if len(s_rows) != len(o_rows):
            status.append(f"ROWCOUNT spark={len(s_rows)} oracle={len(o_rows)}")
        if sorted(s_cols) != sorted(o_cols):
            status.append(f"COLUMNS spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        if not status:
            a, b = _rowset(s_cols, s_rows), _rowset(o_cols, o_rows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                status.append(f"VALUES mismatch, first diffs: {diff}")
        if status:
            failures.append(name)
            print(f"{name:42s} FAIL  {'; '.join(status)}")
        else:
            print(f"{name:42s} OK    {len(s_rows)} rows")
    spark.stop()
    if failures:
        print(f"\nFAILED: {failures}")
        return 1
    print("\nall queries match the DuckDB oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
