"""Spark 4 Python DataSource connector: partition planning, retry
determinism, and exactly-once streaming offsets."""

from __future__ import annotations

import time

from music_streaming_etl_glue_spark.sources import pydatasource as pds


def test_batch_reader_partitions_and_rows(spark):
    df = pds.synthetic_events(spark, rows=1_000, partitions=8)
    # each InputPartition becomes one Spark task
    assert df.rdd.getNumPartitions() == 8
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == sorted(pds.synth_row(i) for i in range(1_000))


def test_batch_reader_is_retry_deterministic(spark):
    # two independent reads (fresh plans, fresh task sets) must agree
    # row-for-row — the idempotence a re-executed task relies on
    a = sorted(map(tuple, pds.synthetic_events(spark, rows=257, partitions=5).collect()))
    b = sorted(map(tuple, pds.synthetic_events(spark, rows=257, partitions=3).collect()))
    assert a == b


def test_partition_split_covers_range_without_overlap():
    parts = pds._split(0, 1_000, 8)
    spans = sorted((p.start, p.end) for p in parts)
    assert spans[0][0] == 0 and spans[-1][1] == 1_000
    for (_, e1), (s2, _) in zip(spans, spans[1:]):
        assert e1 == s2
    # degenerate cases: more parts than rows, and empty range
    assert sum(p.end - p.start for p in pds._split(0, 3, 8)) == 3
    assert [(p.start, p.end) for p in pds._split(0, 0, 4)] == [(0, 0)]


def test_stream_reader_emits_exact_prefix(spark):
    pds.register(spark)
    s = (
        spark.readStream.format(pds.SOURCE_NAME)
        .option("batch_rows", "60")
        .option("max_rows", "200")
        .option("partitions", "3")
        .load()
    )
    q = (
        s.writeStream.format("memory")
        .queryName("synth_stream")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM synth_stream").first().c >= 200:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM synth_stream").collect()
    )
    # offsets advance in disjoint (start, end] steps, so the union of all
    # micro-batches is the exact 200-row prefix — no gaps, no duplicates
    assert got == sorted(pds.synth_row(i) for i in range(200))


def test_stream_reader_composes_with_stateful_aggregation(spark):
    """The connector's micro-batches drive a standard stateful streaming
    aggregation; the converged state equals the batch aggregate of the
    same prefix — connector and engine operators compose."""
    import time

    from pyspark.sql import functions as F

    pds.register(spark)
    s = (
        spark.readStream.format(pds.SOURCE_NAME)
        .option("batch_rows", "100")
        .option("max_rows", "400")
        .load()
    )
    q = (
        s.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
        .writeStream.format("memory")
        .queryName("synth_agg")
        .outputMode("complete")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            total = (
                spark.sql("SELECT coalesce(sum(n), 0) t FROM synth_agg")
                .first()
                .t
            )
            if total >= 400:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = {
        r.event_type: (r.n, r.sv)
        for r in spark.sql("SELECT * FROM synth_agg").collect()
    }
    expect: dict = {}
    for i in range(400):
        _, _, et, v, _ = pds.synth_row(i)
        n, sv = expect.get(et, (0, 0.0))
        expect[et] = (n + 1, sv + v)
    expect = {k: (n, round(sv, 2)) for k, (n, sv) in expect.items()}
    assert got == expect
