"""End-to-end batch pipeline: validate → enrich → KPIs → serving outputs."""

from __future__ import annotations

from music_streaming_etl_glue_spark.plans.pipeline import run_batch_pipeline
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
