"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (genre daily metrics over the
enriched star join) at sf0.001. ``queries()`` maps every implemented
operator from SURVEY.md §2 to a (spark, sf_dir) -> DataFrame callable;
``oracle_sql()`` provides the DuckDB twin for each.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from music_streaming_etl_glue_spark.operators import enrich as _enrich
from music_streaming_etl_glue_spark.operators import kpis as _kpis
from music_streaming_etl_glue_spark.operators import serving as _serving
from music_streaming_etl_glue_spark.sources.catalog import load_table

SF0001 = "/root/testdata/sf0.001"


def _enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _enrich.enrich_events(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: star-join enrichment + daily genre KPIs at sf0.001."""
    return _kpis.genre_daily_metrics(_enriched(spark, SF0001))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "enriched": _enriched,
        "user_kpis": lambda spark, sf: _kpis.user_kpis(_enriched(spark, sf)),
        "genre_daily_metrics": lambda spark, sf: _kpis.genre_daily_metrics(
            _enriched(spark, sf)
        ),
        "genre_top_songs": lambda spark, sf: _kpis.genre_top_songs(
            _enriched(spark, sf)
        ),
        "genre_top_genres": lambda spark, sf: _kpis.genre_top_genres(
            _enriched(spark, sf)
        ),
        "trending_tracks": lambda spark, sf: _kpis.trending_tracks(
            _enriched(spark, sf)
        ),
        "trending_tracks_reference_exact": lambda spark, sf: (
            _kpis.trending_tracks_reference_exact(_enriched(spark, sf))
        ),
        "serving_items": lambda spark, sf: _serving.serving_items(
            _enriched(spark, sf)
        ),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "enriched": _enrich.ENRICH_SQL,
        "user_kpis": _kpis.USER_KPIS_SQL,
        "genre_daily_metrics": _kpis.GENRE_DAILY_SQL,
        "genre_top_songs": _kpis.GENRE_TOP_SONGS_SQL,
        "genre_top_genres": _kpis.GENRE_TOP_GENRES_SQL,
        "trending_tracks": _kpis.TRENDING_SQL,
        "trending_tracks_reference_exact": _kpis.TRENDING_REFERENCE_EXACT_SQL,
        "serving_items": _serving.SERVING_ITEMS_SQL,
    }
