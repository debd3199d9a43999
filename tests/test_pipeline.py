"""End-to-end batch pipeline: validate → enrich → KPIs → serving outputs."""

from __future__ import annotations

from music_streaming_etl_glue_spark.plans.pipeline import (
    run_batch_pipeline,
    run_incremental_pipeline,
)
from music_streaming_etl_glue_spark.sources.kv_sink import (
    local_dir_backend,
    read_kv_dir,
)
from tests.conftest import SF_SMOKE


def test_batch_pipeline_end_to_end(spark, tmp_path):
    kv_dir = str(tmp_path / "kv")
    res = run_batch_pipeline(
        spark,
        SF_SMOKE,
        str(tmp_path / "out"),
        kv_writer_factory=local_dir_backend(kv_dir),
    )
    assert set(res.kpi_rows) == {
        "user_kpis",
        "genre_daily_metrics",
        "genre_top_songs",
        "genre_top_genres",
        "trending_tracks",
    }
    assert all(n > 0 for n in res.kpi_rows.values())
    assert res.serving_rows == sum(
        (
            res.kpi_rows["user_kpis"],
            res.kpi_rows["genre_daily_metrics"],
            res.kpi_rows["genre_top_songs"],
            res.kpi_rows["genre_top_genres"],
            res.kpi_rows["trending_tracks"],
        )
    )
    # KV backend saw every serving item exactly once
    assert len(list(read_kv_dir(kv_dir))) == res.serving_rows
    # QA counters were observed during the serving write (no extra scan)
    assert res.serving_qa is not None
    assert res.serving_qa["n_items"] == res.serving_rows
    assert res.serving_qa["negative_metrics"] == 0
    assert res.serving_qa["malformed_timestamps"] == 0
    assert res.serving_qa["malformed_ids"] == 0
    # date-partitioned layout on disk for partition pruning
    parts = list((tmp_path / "out" / "genre_daily_metrics").glob("date=*"))
    assert len(parts) > 1

    # point lookup against the serving table (partition-pruned + pushed)
    from music_streaming_etl_glue_spark.sources.kv_sink import serving_lookup

    serving_path = str(tmp_path / "out" / "serving_items")
    any_user = spark.read.parquet(serving_path).filter("kpi_type = 'user'").head()
    hit = serving_lookup(spark, serving_path, any_user["id"], kpi_type="user")
    assert hit.count() == 1
    plan = hit._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), EqualTo(id," in plan


def test_incremental_pipeline_lifecycle(spark, tmp_path):
    import shutil

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    work = str(tmp_path / "work")

    # batch 1 lands
    shutil.copy(f"{SF_SMOKE}/events.parquet", incoming / "b1.parquet")
    r1 = run_incremental_pipeline(spark, str(incoming), SF_SMOKE, work)
    assert len(r1.new_files) == 1
    n1 = r1.fact_rows
    assert n1 > 0 and r1.kpi is not None
    # consumed input was archived out of incoming
    assert not (incoming / "b1.parquet").exists()
    assert len(r1.archived) == 1

    # no new files → nothing ingested, KPIs still rebuilt from history
    r2 = run_incremental_pipeline(spark, str(incoming), SF_SMOKE, work)
    assert r2.new_files == [] and r2.fact_rows == n1

    # batch 2 lands → facts accumulate (append), KPIs reflect the union
    shutil.copy(f"{SF_SMOKE}/events.parquet", incoming / "b2.parquet")
    r3 = run_incremental_pipeline(spark, str(incoming), SF_SMOKE, work)
    assert r3.fact_rows == 2 * n1
    assert (
        r3.kpi.kpi_rows["user_kpis"] == r1.kpi.kpi_rows["user_kpis"]
    )  # same users, doubled plays


def test_stage_retry_recovers_from_transient_failure():
    from music_streaming_etl_glue_spark.plans.pipeline import run_stage_with_retry

    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 2:
            raise RuntimeError("transient")
        return "ok"

    assert run_stage_with_retry(flaky, retries=2, backoff_s=0.001) == "ok"
    assert len(calls) == 2  # failed once, succeeded on the retry


def test_stage_retry_exhaustion_reraises():
    import pytest

    from music_streaming_etl_glue_spark.plans.pipeline import run_stage_with_retry

    def always_fails():
        raise RuntimeError("permanent")

    with pytest.raises(RuntimeError, match="permanent"):
        run_stage_with_retry(always_fails, retries=2, backoff_s=0.001)


def test_concurrency_guard_caps_active_runs(tmp_path):
    import pytest

    from music_streaming_etl_glue_spark.plans.pipeline import run_concurrency_guard

    wd = str(tmp_path)
    with run_concurrency_guard(wd, max_active=2):
        with run_concurrency_guard(wd, max_active=2):
            with pytest.raises(RuntimeError, match="concurrency cap"):
                with run_concurrency_guard(wd, max_active=2):
                    pass
    # slots released on exit → a new run acquires freely
    with run_concurrency_guard(wd, max_active=2):
        pass


def test_engine_fingerprint_roundtrip(tmp_path):
    """The pipeline's provenance stamp verifies clean and detects drift
    — the engine-side analog of the reference DAG's deployed-script
    equality check (dags/music_streaming_pipeline.py:220-299)."""
    import json

    import pytest

    from music_streaming_etl_glue_spark.plans.pipeline import (
        FINGERPRINT_FILE,
        record_engine_fingerprint,
        verify_engine_fingerprint,
    )

    out = str(tmp_path / "out")
    path = record_engine_fingerprint(out)
    assert path.endswith(FINGERPRINT_FILE)
    verify_engine_fingerprint(out)  # same code -> clean

    stamped = json.load(open(path))
    assert any(m.endswith("operators/kpis.py") for m in stamped)
    victim = next(iter(sorted(stamped)))
    stamped[victim] = "0" * 32
    json.dump(stamped, open(path, "w"))
    with pytest.raises(RuntimeError, match=victim):
        verify_engine_fingerprint(out)
