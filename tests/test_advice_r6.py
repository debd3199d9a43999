"""Regression tests for the five round-6 ADVICE.md items: coalesce(1)
serializing the parallel phase of skyline_parts / error_bursts, the PSI
DuckDB twin diverging from Spark on a constant baseline, _corpus_uid
caching a stale path-only signature for unstat-able inputs (and the memo
growing unbounded), and split_leakage_audit force-broadcasting the
eval-side shingle relation."""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.oracle_util import assert_matches_oracle


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_skyline_global_merge_keeps_phase1_parallel(spark):
    """repartition(1) must insert an explicit SinglePartition exchange
    between the local and global skyline passes; coalesce(1) inserted no
    exchange, pushing the 1-partition constraint upstream and running the
    'fully parallel' local pass as ONE task."""
    from music_streaming_etl_glue_spark.operators.analytics import (
        skyline_parts,
    )

    part = spark.createDataFrame(
        [(i, i % 7, float(100 - i)) for i in range(50)],
        "p_partkey long, p_size int, p_retailprice double",
    ).repartition(4)
    plan = _plan(skyline_parts(part))
    assert "SinglePartition" in plan, plan
    assert "Coalesce" not in plan, plan


def test_error_bursts_single_partition_exchange(spark):
    """Same fix in error_bursts: the islands window runs after an explicit
    SinglePartition exchange, so the bucket-agg reduce stage above it
    stays parallel instead of collapsing to one task."""
    from music_streaming_etl_glue_spark.operators.asof import error_bursts

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, "error", base + datetime.timedelta(seconds=30 * i))
        for i in range(200)
    ]
    events = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    ).repartition(4)
    df = error_bursts(events, bucket_s=900, min_errors=3)
    plan = _plan(df)
    assert "SinglePartition" in plan, plan
    assert "Coalesce" not in plan, plan
    assert df.count() > 0


def test_psi_constant_baseline_twin_parity(spark, tmp_path):
    """The Spark side's degenerate-bin fix (hi == lo → side-binning) must
    be mirrored in EVENTS_VALUE_DRIFT_SQL: on a constant OLD-half value
    column the two engines previously diverged (DuckDB computed
    FLOOR((v-lo)/0) → inf/NaN bins)."""
    from music_streaming_etl_glue_spark.plans.quality import (
        EVENTS_VALUE_DRIFT_SQL,
        events_value_drift,
    )

    base = datetime.datetime(2024, 1, 1)
    old = [
        (i, base + datetime.timedelta(seconds=i), 5.0) for i in range(100)
    ]
    new = [
        (100 + i, base + datetime.timedelta(seconds=10_000 + i), v)
        for i, v in enumerate([9.0] * 60 + [1.0] * 20 + [5.0] * 20)
    ]
    events = spark.createDataFrame(
        old + new, "event_id long, ts timestamp, value double"
    )
    path = str(tmp_path / "events.parquet")
    events.coalesce(1).write.parquet(path)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    sdf = events_value_drift(spark.read.parquet(path))
    rows = sdf.collect()
    # the drift must be DETECTED (every new-side value moved off the
    # constant), not silently zeroed by NULL bins
    assert all(r.psi_term is not None for r in rows)
    assert sum(r.psi_term for r in rows) > 0.25
    assert_matches_oracle(sdf, con, EVENTS_VALUE_DRIFT_SQL)


def test_corpus_uid_none_on_unstatable_input(spark, tmp_path, monkeypatch):
    """For input files os.stat can't reach (s3://, hdfs://) the signature
    must be None (forcing a real count), NOT a cached path-only tuple a
    same-path rewrite would stale-hit."""
    import os

    from music_streaming_etl_glue_spark.operators import similarity as sim

    path = str(tmp_path / "t.parquet")
    spark.range(10).write.parquet(path)
    df = spark.read.parquet(path)
    assert sim._corpus_uid(df) is not None  # local files stat fine

    real_stat = os.stat

    def failing_stat(p, *a, **kw):
        if str(p).startswith(str(tmp_path)):
            raise OSError("unreachable URI")
        return real_stat(p, *a, **kw)

    monkeypatch.setattr(os, "stat", failing_stat)
    assert sim._corpus_uid(df) is None


def test_corpus_count_cache_bounded(spark, tmp_path):
    """The corpus-count memo is a bounded LRU: stuffing it past the cap
    evicts oldest entries instead of growing without limit, and the live
    key survives the eviction pass."""
    from music_streaming_etl_glue_spark.operators import similarity as sim

    path = str(tmp_path / "t.parquet")
    spark.range(25).write.parquet(path)
    df = spark.read.parquet(path)

    sim._corpus_count_cache.clear()
    for i in range(sim._CORPUS_COUNT_CACHE_MAX + 20):
        sim._corpus_count_cache[("dummy", i)] = i
    assert sim._corpus_count(df) == 25
    assert len(sim._corpus_count_cache) <= sim._CORPUS_COUNT_CACHE_MAX
    key = sim._corpus_uid(df)
    assert key in sim._corpus_count_cache
    # warm hit: no recount, key refreshed to MRU
    assert sim._corpus_count(df) == 25
    assert next(reversed(sim._corpus_count_cache)) == key


def test_split_leakage_audit_unhinted_joins(spark):
    """The eval-side shingle relation is many times the text size at
    corpus scale — the audit must NOT carry a hard broadcast hint
    (which bypasses autoBroadcastJoinThreshold); AQE picks the strategy."""
    from music_streaming_etl_glue_spark.operators.dedup import (
        split_leakage_audit,
    )

    docs = spark.createDataFrame(
        [(i, f"word{i} alpha beta gamma delta epsilon zeta") for i in range(40)],
        "doc_id long, text string",
    )
    analyzed = (
        split_leakage_audit(docs)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "ResolvedHint" not in analyzed, analyzed
