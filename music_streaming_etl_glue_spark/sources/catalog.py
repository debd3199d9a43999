"""Table catalog over the parquet testdata layout.

Mirrors the reference's multi-path parquet reads
(``/root/reference/scripts/compute_kpis.py:109-154``) without the manual
directory-vs-part-file resolution: ``spark.read.parquet(*paths)`` already
handles directories, files, and globs, and Catalyst gets column pruning +
predicate pushdown on the scan for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver-generated star schema (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns stored as parquet TIMESTAMP(NANOS), which Spark cannot scan
# natively. With spark.sql.legacy.parquet.nanosAsLong=true (set in
# session.py) they surface as long nanoseconds; we convert to a
# microsecond TimestampType here — truncation identical to how DuckDB
# reads the same file, so oracle comparisons line up exactly.
NANOS_TIMESTAMP_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def _ensure_session_confs(spark: SparkSession) -> None:
    """Make an externally-built session safe for the testdata + oracle.

    Both confs are runtime-settable. Without ``nanosAsLong`` Spark refuses
    the TIMESTAMP(NANOS) parquet column outright; without a UTC session
    timezone, date bucketing / unix_timestamp drift from the (UTC-naive)
    DuckDB oracle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def convert_nanos_ts(df: DataFrame, col: str) -> DataFrame:
    """Convert a long-nanoseconds column (how nanosAsLong surfaces parquet
    TIMESTAMP(NANOS)) to a microsecond TimestampType — truncation identical
    to DuckDB's read of the same file. No-op if the column is already a
    timestamp. The single definition shared by every raw-scan path."""
    if col in df.columns and dict(df.dtypes)[col] == "bigint":
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Plain parquet scan — pruning/pushdown stay enabled."""
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in NANOS_TIMESTAMP_COLS.get(name, ()):
        df = convert_nanos_ts(df, c)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Scan several tables into a dict keyed by table name."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def read_parquet_multi(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Multi-path parquet scan (reference S3 operator,
    ``compute_kpis.py:109-154``): accepts a list of files/dirs/globs."""
    if not paths:
        raise ValueError("read_parquet_multi: empty path list")
    return spark.read.parquet(*paths)
