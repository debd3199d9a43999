from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from music_streaming_etl_glue_spark.session import get_spark

    # One JVM hosts driver + executors for the WHOLE suite, and eager
    # localCheckpoint blocks accumulate until their RDDs are GC'd — the
    # 1 GiB default heap OOMs once the suite grows past ~200 tests.
    spark = get_spark(
        "tests",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield spark
    spark.stop()
