"""Validation layer: CSV contracts, corrupt-record quarantine, dispatch,
path utils, incremental ledger/state."""

from __future__ import annotations

import datetime as dt

import pytest

from music_streaming_etl_glue_spark.plans.contracts import (
    STREAM_SCHEMA,
    ContractError,
    dispatch_by_columns,
    read_csv_inferred,
    read_csv_validated,
    validate_columns,
)
from music_streaming_etl_glue_spark.plans.incremental import (
    DimensionState,
    FileLedger,
)
from music_streaming_etl_glue_spark.sources.paths import normalize_path, split_path_list


@pytest.fixture()
def stream_csv(tmp_path):
    p = tmp_path / "streams1.csv"
    p.write_text(
        "user_id,track_id,listen_time\n"
        "u1,t1,2024-06-25 08:00:00\n"
        "u2,t2,2024-06-25 09:30:00\n"
        "u3,,2024-06-25 10:00:00\n"  # null track_id → dropped by na.drop
        "u4,t4,not-a-timestamp\n"  # malformed → quarantine
        "u5,t5,2024-06-25 11:00:00\n"
    )
    return str(p)


def test_validated_read_cleans_and_quarantines(spark, stream_csv):
    res = read_csv_validated(
        spark, [stream_csv], STREAM_SCHEMA, required=["user_id", "track_id"]
    )
    clean = res.clean.collect()
    assert {r.user_id for r in clean} == {"u1", "u2", "u5"}
    assert all(isinstance(r.listen_time, dt.datetime) for r in clean)
    corrupt = res.corrupt.collect()
    assert len(corrupt) == 1
    assert "not-a-timestamp" in corrupt[0][0]


def test_validated_read_contract_failure(spark, stream_csv):
    with pytest.raises(ContractError, match="missing required columns"):
        read_csv_validated(
            spark, [stream_csv], STREAM_SCHEMA, required=["user_id", "genre"]
        )


def test_inferred_read_and_dispatch(spark, tmp_path):
    p = tmp_path / "users.csv"
    p.write_text("user_id,user_name,user_age\nu1,Alice,30\nu2,Bob,44\n")
    df = read_csv_inferred(spark, [str(p)], required=["user_id", "user_name"])
    assert dict(df.dtypes)["user_age"] == "int"
    route = dispatch_by_columns(
        df, {"songs": ["track_id"], "users": ["user_id", "user_name"]}
    )
    assert route == "users"
    with pytest.raises(ContractError, match="no route matches"):
        dispatch_by_columns(df, {"songs": ["track_id"]})


def test_validate_columns_reports_all_missing(spark):
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ContractError, match=r"\['b', 'c'\]"):
        validate_columns(df, ["a", "b", "c"])


def test_normalize_path():
    assert normalize_path("s3://bucket//a///b") == "s3://bucket/a/b"
    assert normalize_path("s3:/bucket/a") == "s3://bucket/a"
    assert normalize_path("s3:///bucket/a") == "s3://bucket/a"
    assert normalize_path("/local//path/") == "/local/path/"
    assert split_path_list("a//b, s3://x//y ,") == ["a/b", "s3://x/y"]


def test_file_ledger(tmp_path):
    ledger = FileLedger(str(tmp_path / "processed.json"))
    assert ledger.new_files(["f1", "f2"]) == ["f1", "f2"]
    ledger.mark_processed(["f1"])
    assert ledger.new_files(["f1", "f2", "f3"]) == ["f2", "f3"]
    ledger.mark_processed(["f2", "f3"])
    assert ledger.new_files(["f1", "f2", "f3"]) == []


def test_dimension_state(tmp_path):
    dim = tmp_path / "users.csv"
    dim.write_text("v1")
    state = DimensionState(str(tmp_path / "state.json"))
    assert state.changed("users", str(dim))
    state.update("users", str(dim))
    assert not state.changed("users", str(dim))
    dim.write_text("v2")
    assert state.changed("users", str(dim))
