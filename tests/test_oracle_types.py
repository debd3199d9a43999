"""Static type audit of every DuckDB oracle: no result column may be
HUGEINT (int128). DuckDB types integer SUM() as HUGEINT, which the
driver's hash check distinguishes from the BIGINT Spark emits even when
every value is equal — this cost profile_events its round-3 stamp. Any
uncast integer aggregate added to an oracle fails here first, without a
Spark session."""

from __future__ import annotations

import duckdb

from tests.conftest import SF_SMOKE


def test_no_hugeint_oracle_columns():
    import __spark_entry__ as entry_mod
    from music_streaming_etl_glue_spark.sources.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    offenders = {}
    for name, sql in entry_mod.oracle_sql().items():
        rel = con.sql(sql)
        bad = [
            (c, str(ty))
            for c, ty in zip(rel.columns, rel.types)
            if "HUGEINT" in str(ty).upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "uncast integer aggregates (HUGEINT) in oracle SQL — add ::BIGINT: "
        f"{offenders}"
    )
