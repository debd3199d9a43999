"""KV serving sink: distributed batch write, dedupe, retry/backoff."""

from __future__ import annotations

from music_streaming_etl_glue_spark.operators.enrich import enrich_events
from music_streaming_etl_glue_spark.operators.serving import serving_items
from music_streaming_etl_glue_spark.sources.catalog import load_table
from music_streaming_etl_glue_spark.sources.kv_sink import (
    RetryableWriteError,
    _dedupe,
    _write_with_retry,
    local_dir_backend,
    read_kv_dir,
    write_kv,
)
from tests.conftest import SF_SMOKE


def test_write_kv_roundtrip(spark, tmp_path):
    enriched = enrich_events(
        load_table(spark, SF_SMOKE, "events"),
        load_table(spark, SF_SMOKE, "customer"),
        load_table(spark, SF_SMOKE, "nation"),
    )
    items = serving_items(enriched)
    expected = items.count()
    out = str(tmp_path / "kv")
    write_kv(items, local_dir_backend(out), batch_size=25)
    got = list(read_kv_dir(out))
    assert len(got) == expected
    ids = {g["id"] for g in got}
    assert any(i.startswith("USER_") for i in ids)
    assert any(i.startswith("TRENDING_") for i in ids)
    assert any(i.startswith("GENRE_DAILY_") for i in ids)


def test_serving_key_helpers(spark):
    from decimal import Decimal

    from music_streaming_etl_glue_spark.functions.serving_keys import (
        composite_key,
        default_zero,
        iso_date,
        to_sink_decimal,
    )

    df = spark.createDataFrame(
        [(7, None, "2024-06-25 13:45:00", 1.5), (8, 3, "2024-01-02 00:00:00", None)],
        "id long, maybe int, ts string, amount double",
    )
    from pyspark.sql import functions as F

    out = df.select(
        composite_key("USER", "id").alias("k"),
        default_zero("maybe").alias("m"),
        iso_date(F.col("ts").cast("timestamp")).alias("d"),
        to_sink_decimal("amount", 10, 2).alias("a"),
    ).collect()
    assert out[0].k == "USER_7" and out[0].m == 0 and out[0].d == "2024-06-25"
    assert out[0].a == Decimal("1.50")
    assert out[1].m == 3 and out[1].a is None


def test_dedupe_last_wins():
    batch = [
        {"id": "A", "timestamp": "t", "v": 1},
        {"id": "A", "timestamp": "t", "v": 2},
        {"id": "B", "timestamp": "t", "v": 3},
    ]
    out = {(d["id"], d["v"]) for d in _dedupe(batch)}
    assert out == {("A", 2), ("B", 3)}


def test_retry_backoff_then_success():
    calls = []

    def flaky(batch):
        calls.append(len(batch))
        if len(calls) < 3:
            raise RetryableWriteError("throttled")

    _write_with_retry(flaky, [{"id": 1, "timestamp": "t"}], backoff_base_s=0.001)
    assert len(calls) == 3


def test_retry_exhaustion_raises():
    def always_throttled(batch):
        raise RetryableWriteError("throttled")

    import pytest

    with pytest.raises(RetryableWriteError):
        _write_with_retry(
            always_throttled,
            [{"id": 1, "timestamp": "t"}],
            max_retries=2,
            backoff_base_s=0.001,
        )


def test_write_kv_without_key_columns_writes_every_row(spark, tmp_path):
    # No id/timestamp columns → the (id, timestamp) batch dedupe must NOT
    # collapse each 25-row batch to a single (None, None) key.
    df = spark.createDataFrame(
        [(i, "v") for i in range(100)], "k long, payload string"
    ).coalesce(1)
    out = str(tmp_path / "kv_nokey")
    write_kv(df, local_dir_backend(out), batch_size=25)
    got = list(read_kv_dir(out))
    assert len(got) == 100
    assert {g["k"] for g in got} == set(range(100))


def test_local_dir_backend_idempotent_under_retry(tmp_path):
    # A failed first attempt (no finalize) leaves only a tmp file; the
    # retried attempt truncates it and commits atomically — no double rows.
    out = str(tmp_path / "kv_retry")
    factory = local_dir_backend(out)
    first = factory()  # attempt 1: writes but dies before finalize
    first(
        [{"id": "A", "timestamp": "t", "v": 1}, {"id": "B", "timestamp": "t", "v": 2}]
    )
    assert list(read_kv_dir(out)) == []  # uncommitted attempt is invisible
    second = factory()  # attempt 2 (same partition id): full rewrite
    second([{"id": "A", "timestamp": "t", "v": 1}])
    second([{"id": "B", "timestamp": "t", "v": 2}])
    second.finalize()
    got = list(read_kv_dir(out))
    assert len(got) == 2
    assert {g["id"] for g in got} == {"A", "B"}
