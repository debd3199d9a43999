"""Catalog-wide float-canonicalization sweep over the DuckDB twins.

Runs every ``oracle_sql()`` twin on DuckDB (no Spark needed) and scans
every cell — recursing into list cells — for the float values whose
repr the driver's hash distinguishes but a ``round()`` + ``==`` compare
can miss: ``-0.0`` (the r10 ``audio_embeddings`` divergence class),
``NaN``, and ``±Infinity``. ANSI guards should make Inf/NaN impossible
(division by zero is CASE-guarded in every twin) and the ``+ 0.0``
round guard kills signed zeros, but the driver's hash is the judge —
this sweep is the cheap proof.

Usage: python tools/float_canon_sweep.py [sf_dir]
Exit 0 when the catalog is clean; prints one line per offending query
with the offending class counts otherwise.
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from music_streaming_etl_glue_spark.sources.catalog import TABLES  # noqa: E402


def _scan(v, hits: dict[str, int]) -> None:
    if isinstance(v, float):
        if math.isnan(v):
            hits["nan"] += 1
        elif math.isinf(v):
            hits["inf"] += 1
        elif v == 0.0 and math.copysign(1.0, v) < 0:
            hits["neg_zero"] += 1
    elif isinstance(v, (list, tuple)):
        for x in v:
            _scan(x, hits)
    elif isinstance(v, dict):
        for x in v.values():
            _scan(x, hits)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    dirty = []
    oracles = entry_mod.oracle_sql()
    for name, sql in sorted(oracles.items()):
        hits = {"nan": 0, "inf": 0, "neg_zero": 0}
        for row in con.execute(sql).fetchall():
            for v in row:
                _scan(v, hits)
        if any(hits.values()):
            dirty.append(name)
            print(f"{name:42s} DIRTY {hits}")
    print(f"swept {len(oracles)} twins at {sf_dir}: {len(dirty)} dirty")
    if dirty:
        print(f"DIRTY: {dirty}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
