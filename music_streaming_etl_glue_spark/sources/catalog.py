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


def read_parquet_validated(
    spark: SparkSession, paths: list[str], require_rows: bool = True
) -> DataFrame:
    """Multi-path scan with the reference's per-path validation read
    (``compute_kpis.py:109-154``: each input is opened and counted before
    compute). Every path must exist and parse as parquet; with
    ``require_rows`` each must hold at least one row. All failing paths are
    reported together up front — instead of one opaque executor error
    minutes into the job. The probe is ``limit(1).count()`` per path (one
    row group), not a full count."""
    if not paths:
        raise ValueError("read_parquet_validated: empty path list")
    bad: list[tuple[str, str]] = []
    for p in paths:
        try:
            n = spark.read.parquet(p).limit(1).count()
        except Exception as exc:  # noqa: BLE001 — collect, report together
            msg = (str(exc).splitlines() or ["<no message>"])[0][:160]
            bad.append((p, msg))
            continue
        if require_rows and n == 0:
            bad.append((p, "no rows"))
    if bad:
        detail = "; ".join(f"{p}: {why}" for p, why in bad)
        raise ValueError(f"read_parquet_validated: invalid inputs: {detail}")
    return spark.read.parquet(*paths)
