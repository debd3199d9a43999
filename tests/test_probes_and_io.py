"""Existence probes, archival, multi-path parquet reads, quarantine sink."""

from __future__ import annotations

from music_streaming_etl_glue_spark.plans.contracts import (
    STREAM_SCHEMA,
    quarantine_corrupt,
    read_csv_validated,
)
from music_streaming_etl_glue_spark.sources.catalog import read_parquet_multi
from music_streaming_etl_glue_spark.sources.probes import (
    archive_files,
    list_files,
    path_exists,
    readable_parquet,
)
from tests.conftest import SF_SMOKE


def test_path_exists_and_listing(spark, tmp_path):
    assert path_exists(spark, f"{SF_SMOKE}/events.parquet")
    assert not path_exists(spark, f"{SF_SMOKE}/nope.parquet")
    assert list_files(spark, str(tmp_path)) == []
    (tmp_path / "a.csv").write_text("x")
    (tmp_path / "_SUCCESS").write_text("")
    files = list_files(spark, str(tmp_path))
    assert len(files) == 1 and files[0].endswith("a.csv")


def test_readable_parquet(spark, tmp_path):
    assert readable_parquet(spark, f"{SF_SMOKE}/nation.parquet")
    bad = tmp_path / "bad.parquet"
    bad.write_text("not parquet")
    assert not readable_parquet(spark, str(bad))


def test_read_parquet_multi(spark):
    df = read_parquet_multi(
        spark, [f"{SF_SMOKE}/nation.parquet", f"{SF_SMOKE}/nation.parquet"]
    )
    assert df.count() == 50  # both paths scanned


def test_archive_files(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    for i in range(3):
        (src / f"f{i}.csv").write_text("data")
    files = list_files(spark, str(src))
    archived = archive_files(spark, files, str(tmp_path / "arch"), "2026-01-01")
    assert len(archived) == 3
    assert list_files(spark, str(src)) == []
    assert len(list_files(spark, str(tmp_path / "arch" / "2026-01-01"))) == 3


def test_quarantine_corrupt_sink(spark, tmp_path):
    csv = tmp_path / "s.csv"
    csv.write_text(
        "user_id,track_id,listen_time\nu1,t1,2024-06-25 08:00:00\nu2,t2,BAD\n"
    )
    res = read_csv_validated(spark, [str(csv)], STREAM_SCHEMA)
    qdir = str(tmp_path / "quarantine")
    quarantine_corrupt(res.corrupt, qdir)
    back = spark.read.json(qdir)
    assert back.count() == 1
    # empty corrupt frame → no-op (no empty dirs written)
    quarantine_corrupt(res.corrupt.limit(0), str(tmp_path / "q2"))
    assert not (tmp_path / "q2").exists()


def test_read_parquet_validated_reports_all_bad_paths(spark, tmp_path):
    import pytest

    from music_streaming_etl_glue_spark.sources.catalog import (
        load_table,
        read_parquet_validated,
    )
    from tests.conftest import SF_SMOKE

    good = str(tmp_path / "good.parquet")
    load_table(spark, SF_SMOKE, "region").write.parquet(good)
    empty = str(tmp_path / "empty.parquet")
    load_table(spark, SF_SMOKE, "region").limit(0).write.parquet(empty)
    missing = str(tmp_path / "nope.parquet")

    # every failing path named in one error, not just the first
    with pytest.raises(ValueError) as exc:
        read_parquet_validated(spark, [good, empty, missing])
    assert "empty.parquet" in str(exc.value) and "nope.parquet" in str(exc.value)

    # all-good passes and returns the combined scan
    df = read_parquet_validated(spark, [good])
    assert df.count() > 0
    # empty allowed when the rows gate is off
    assert read_parquet_validated(spark, [good, empty], require_rows=False).count() > 0


def test_orc_and_json_roundtrip(spark, tmp_path):
    """Format coverage beyond parquet/CSV: ORC and JSON-lines sinks and
    scans round-trip the dimension table exactly (schema fidelity on the
    declared read; JSON read uses the written schema rather than
    inference, the production-safe path)."""
    from music_streaming_etl_glue_spark.sources.catalog import load_table
    from tests.conftest import SF_SMOKE

    dim = load_table(spark, SF_SMOKE, "nation")
    n = dim.count()

    orc_path = str(tmp_path / "nation_orc")
    dim.write.mode("overwrite").orc(orc_path)
    back_orc = spark.read.orc(orc_path)
    assert back_orc.count() == n
    assert back_orc.schema == dim.schema
    assert back_orc.exceptAll(dim).count() == 0

    json_path = str(tmp_path / "nation_json")
    dim.write.mode("overwrite").json(json_path)
    back_json = spark.read.schema(dim.schema).json(json_path)
    assert back_json.count() == n
    assert back_json.exceptAll(dim).count() == 0
