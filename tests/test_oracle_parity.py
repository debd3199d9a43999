"""Every queries() entry with an oracle must hash-match DuckDB at sf0.001.

This is the same gate the driver runs at sf0.01 (CORRECTNESS_r{N}.json);
running it at the smoke scale keeps the suite fast.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE
from tests.oracle_util import assert_matches_oracle, duckdb_con

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def oracle():
    con = duckdb_con(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, oracle, name):
    sdf = QUERIES[name](spark, SF_SMOKE)
    if name not in ORACLES:
        # rows-only check for non-SQL-expressible ops
        assert sdf.count() >= 0
        return
    assert_matches_oracle(sdf, oracle, ORACLES[name])


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
