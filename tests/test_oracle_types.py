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


def test_no_decimal_or_float_oracle_columns():
    """SCALE.md audit-anchor rule (r13): the driver hashes value REPRs,
    and DECIMAL/FLOAT32 reprs diverge between clients even when values
    are equal (the r12 pca_explained_variance red: Spark
    Decimal('499...') vs a client's int 499... — == passes, the hash
    fails). Anchors must be BIGINT or canonical digit strings; reals
    must be 9dp-rounded DOUBLEs. Checked statically on the DuckDB side
    (the Spark side is pinned by the same rule applied to the operator
    schemas — a full sf0.001 sweep of all 277 entries found zero)."""
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
            if str(ty).upper().startswith("DECIMAL")
            or str(ty).upper() == "FLOAT"
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "repr-divergence-prone oracle column types (DECIMAL/FLOAT32) — "
        f"emit BIGINT, VARCHAR digits, or DOUBLE instead: {offenders}"
    )
