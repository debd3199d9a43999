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
    #
    # r15 gate budget: the suite runs on KB-scale fixtures, where task
    # launch + scheduler overhead dominates wall time — measured on the
    # heaviest streaming file: 196 s at local[32], 155 s at local[8],
    # 147 s at local[4]. local[6] + 4 shuffle partitions keeps genuine
    # parallelism for the decode/stream tests while dropping the fixed
    # cost that pushed the ~71-minute r14 suite past the driver's pytest
    # budget (VERIFY_r14 tests_ok: false — truncated mid-run with zero
    # failures). This is TEST-session sizing only; the engine itself
    # still derives widths from the session it is given.
    spark = get_spark(
        "tests",
        master="local[6]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def catalog_dfs(spark):
    """Every queries() entry constructed ONCE at SF_SMOKE, shared by the
    catalog-wide sweeps (plan invariants, schema contract): construction
    is the expensive part — eager index builds, CC fixpoints and query
    collects run inside it — and r14's two sweeps paid it twice
    (125 s + 121 s of the gate budget)."""
    import __spark_entry__ as m

    return {name: fn(spark, SF_SMOKE) for name, fn in m.queries().items()}
