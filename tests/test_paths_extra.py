"""Regression tests for review findings: file:/// authority preservation,
salted-agg determinism under recomputation-style reordering."""

from __future__ import annotations

from music_streaming_etl_glue_spark.plans.layout import salted_agg
from music_streaming_etl_glue_spark.sources.paths import normalize_path


def test_file_uri_keeps_empty_authority():
    assert normalize_path("file:///tmp/data") == "file:///tmp/data"
    assert normalize_path("file://///tmp//data") == "file:///tmp/data"
    # authority-bearing schemes still collapse to scheme://
    assert normalize_path("s3:///bucket/a") == "s3://bucket/a"
    assert normalize_path("hdfs://nn:8020//a//b") == "hdfs://nn:8020/a/b"


def test_salted_agg_salt_is_row_deterministic(spark):
    """The salt must depend only on row content — identical results no
    matter how the input is ordered/partitioned (the recomputation case)."""
    rows = [("k", float(i % 7)) for i in range(1000)]
    df1 = spark.createDataFrame(rows, "k string, v double")
    df2 = spark.createDataFrame(list(reversed(rows)), "k string, v double").repartition(7)
    a = salted_agg(df1, ["k"], {"v": "sum"}).collect()[0]["sum_v"]
    b = salted_agg(df2, ["k"], {"v": "sum"}).collect()[0]["sum_v"]
    assert a == b
