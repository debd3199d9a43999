"""Property-based tests for the engine's determinism contracts:
partition-count invariance of the decimal-accumulator sums and
shuffle-invariance of ranked results."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.functions.numeric import exact_sum

two_dp_doubles = st.lists(
    st.integers(min_value=-10_000_00, max_value=10_000_00).map(lambda c: c / 100.0),
    min_size=1,
    max_size=200,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=two_dp_doubles, parts=st.integers(min_value=1, max_value=9))
def test_exact_sum_partition_invariant(spark, values, parts):
    """exact_sum must be bit-identical regardless of partitioning — the
    property raw double sums do NOT have."""
    df = spark.createDataFrame([(v,) for v in values], "v double")
    a = df.coalesce(1).agg(exact_sum("v").alias("s")).head()["s"]
    b = df.repartition(parts).agg(exact_sum("v").alias("s")).head()["s"]
    assert a == b
    # and it equals the exact decimal sum computed in Python
    from decimal import Decimal

    expect = float(sum(Decimal(f"{v:.2f}") for v in values))
    assert a == expect


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(parts=st.integers(min_value=1, max_value=16))
def test_dense_rank_partition_invariant(spark, parts):
    rows = [(g, i % 5) for g in ("a", "b") for i in range(20)]
    df = spark.createDataFrame(rows, "g string, v int").repartition(parts)
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy(F.col("v").desc())
    out = sorted(
        map(tuple, df.withColumn("r", F.dense_rank().over(w)).collect())
    )
    base = sorted(
        map(
            tuple,
            spark.createDataFrame(rows, "g string, v int")
            .withColumn("r", F.dense_rank().over(w))
            .collect(),
        )
    )
    assert out == base
