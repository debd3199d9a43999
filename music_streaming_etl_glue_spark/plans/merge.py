"""MERGE / upsert / SCD2 emulation on plain parquet.

No Delta/Iceberg jars ship in this environment, so the engine provides
the classic emulations (anti-join + union; window-closed version rows).
Swap for `MERGE INTO` when a table format is on the classpath — the
call signatures are format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Last-write-wins upsert: rows of ``target`` whose key is absent from
    ``updates``, plus all of ``updates`` (anti-join + union).

    ``updates`` is appended as-is: if it carries the same key twice, both
    rows land in the result — dedupe updates upstream (there is no
    ordering column here to arbitrate which write is "last")."""
    survivors = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return survivors.unionByName(updates)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    effective_ts: str,
    end_col: str = "valid_to",
    start_col: str = "valid_from",
    open_marker: str = "9999-12-31 00:00:00",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the currently-open version
    of each changed key (its ``valid_to`` becomes the change's
    ``valid_from``) and append the new open version.

    ``dim`` columns: business columns + ``valid_from``/``valid_to``
    timestamps; open rows marked by ``valid_to == open_marker``.
    ``changes`` columns: business columns + ``effective_ts``.
    """
    open_rows = dim.filter(F.col(end_col) == open_marker)
    closed_rows = dim.filter(F.col(end_col) != open_marker)

    change_keys = changes.select(
        F.col(key), F.col(effective_ts).alias("__new_from")
    )
    # close open versions of changed keys at the change timestamp
    newly_closed = (
        open_rows.join(change_keys, key)
        .withColumn(end_col, F.col("__new_from"))
        .drop("__new_from")
    )
    untouched_open = open_rows.join(change_keys.select(key), key, "left_anti")

    new_versions = (
        changes.withColumn(start_col, F.col(effective_ts))
        .withColumn(end_col, F.lit(open_marker).cast("string"))
        .drop(effective_ts)
    )
    return (
        closed_rows.unionByName(newly_closed)
        .unionByName(untouched_open)
        .unionByName(new_versions)
    )
