"""Sources & sinks: scans (CSV/Parquet/JSON), path utilities, table catalog,
and the key-value serving sink."""

from music_streaming_etl_glue_spark.sources.catalog import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
