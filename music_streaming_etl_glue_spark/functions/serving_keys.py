"""Serving-layer key/attribute synthesis as Spark column expressions.

The reference builds these strings row-by-row in driver Python after a
``collect()`` (``/root/reference/scripts/load_dynamodb.py:229-343``):
f-string composite ids (F7), ``isoformat()`` dates (F8), ``x or 0``
defaults (F9), float→Decimal coercion (F10). Lifting them into column
expressions keeps the whole shaping distributed and codegen'd — the
collect loop is the reference's scalability cliff.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def composite_key(prefix: str, *parts: Column | str) -> Column:
    """``PREFIX_part1_part2...`` (reference f-strings, load_dynamodb.py:239
    etc.). concat_ws skips nulls — same as DuckDB's concat_ws."""
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    return F.concat_ws("_", F.lit(prefix), *cols)


def iso_date(col: Column | str) -> Column:
    """ISO yyyy-MM-dd string (reference ``row['date'].isoformat()``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


def default_zero(col: Column | str) -> Column:
    """``coalesce(col, 0)`` — reference ``int(x or 0)`` driver idiom."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(0))


def to_sink_decimal(col: Column | str, precision: int = 38, scale: int = 9) -> Column:
    """Numeric-sink boundary cast (DynamoDB requires Decimal;
    reference load_dynamodb.py:113-115)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")
