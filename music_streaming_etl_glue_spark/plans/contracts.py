"""Schema contracts and validation (reference ``validate_data.py``).

Capabilities re-expressed:
* required-column contracts (P8, ``validate_data.py:58-70``)
* schema-based dispatch (P9, ``:219-250``)
* declared-schema fact validation: cast, null-drop, corrupt-record
  quarantine (``:86-158``)

Bug fixed relative to the reference (SURVEY §1.3): it requests PERMISSIVE
mode with ``columnNameOfCorruptRecord`` but its declared schema *lacks*
that column, so the quarantine branch (``:121-129``) is dead code. Here the
corrupt-record column is appended to the read schema, so malformed rows
genuinely land in quarantine instead of becoming silent nulls dropped by
``na.drop``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

#: Fact-table schema of the reference (``validate_data.py:49-55``) mapped
#: onto the engine's canonical stream shape.
STREAM_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), True),
        T.StructField("track_id", T.StringType(), True),
        T.StructField("listen_time", T.TimestampType(), True),
    ]
)


class ContractError(ValueError):
    """Raised when a frame is missing required columns."""


def validate_columns(df: DataFrame, required: list[str], name: str = "input") -> None:
    """P8: raise with the full missing set (not just the first)."""
    missing = sorted(set(required) - set(df.columns))
    if missing:
        raise ContractError(f"{name}: missing required columns {missing}")


def dispatch_by_columns(df: DataFrame, routes: dict[str, list[str]]) -> str:
    """P9: route a frame by column presence; first fully-matching route
    wins (insertion order)."""
    for route, cols in routes.items():
        if not set(cols) - set(df.columns):
            return route
    raise ContractError(
        f"no route matches columns {sorted(df.columns)}; "
        f"routes: { {k: v for k, v in routes.items()} }"
    )


@dataclass
class ValidationResult:
    clean: DataFrame
    corrupt: DataFrame
    source_paths: list[str] = field(default_factory=list)


def read_csv_validated(
    spark: SparkSession,
    paths: list[str],
    schema: T.StructType,
    required: list[str] | None = None,
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss",
    drop_null_rows: bool = True,
) -> ValidationResult:
    """S1 + P4/P5/P6 + quarantine, per the reference's validation job but
    with a working corrupt-record channel.

    Returns the cleaned frame (declared schema, nulls dropped) and the
    quarantine frame (raw corrupt lines). One pass, no driver loops —
    scales with input size.
    """
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    raw = (
        spark.read.schema(read_schema)
        .options(
            header="true",
            mode="PERMISSIVE",
            columnNameOfCorruptRecord=CORRUPT_COL,
            timestampFormat=timestamp_format,
            quote='"',
            escape='"',
        )
        .csv(paths)
        # PERMISSIVE + corrupt column requires the parsed columns to be
        # referenced together with the corrupt column via a cache/select.
        .cache()
    )
    if required:
        validate_columns(raw, required, name=",".join(paths))
    corrupt = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    clean = raw.filter(F.col(CORRUPT_COL).isNull()).select(
        *[F.col(f.name).cast(f.dataType) for f in schema.fields]
    )
    if drop_null_rows:
        clean = clean.na.drop()
    return ValidationResult(clean=clean, corrupt=corrupt, source_paths=list(paths))


def read_csv_inferred(
    spark: SparkSession, paths: list[str], required: list[str] | None = None
) -> DataFrame:
    """S2: dimension-style inferred-schema CSV read + contract check."""
    df = spark.read.options(
        header="true", inferSchema="true", mode="PERMISSIVE", multiLine="true"
    ).csv(paths)
    if required:
        validate_columns(df, required, name=",".join(paths))
    return df


def quarantine_corrupt(corrupt: DataFrame, path: str) -> None:
    """S7: append corrupt raw records as JSON for offline inspection."""
    if corrupt.isEmpty():
        return
    corrupt.write.mode("append").json(path)
