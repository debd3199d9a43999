"""Rank decoration for tiny post-limit relations.

Several operators end with ``orderBy(...).limit(k)`` (which compiles to
TakeOrderedAndProject — per-partition partial top-k, no global sort) and
then decorate the ≤k survivors with a 1-based rank column. A bare
``Window.orderBy(...)`` does that correctly but logs
``WindowExec: No Partition Defined`` — harmless at k rows, yet 27 such
lines per gate run are exactly the noise that can hide a REAL
unpartitioned window over a big relation (how the round-3
user_value_quartiles bug was found). This helper makes the single
partition explicit instead: ``coalesce(1)`` (≤k rows — free) and a
window partitioned on ``spark_partition_id()``, which is constant 0
after the coalesce, so the rank is the same global rank and WindowExec
sees a declared partition spec.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank_post_limit(
    df: DataFrame, name: str, *order: Column
) -> DataFrame:
    """Add 1-based ``row_number() OVER (ORDER BY *order)`` as ``name``
    (long) to a relation already reduced to driver-scale rows (post
    ``limit(k)`` / post tiny-agg). NOT for big relations — the explicit
    single partition is the point here, not a scale path."""
    w = Window.partitionBy(F.spark_partition_id()).orderBy(*order)
    return df.coalesce(1).withColumn(
        name, F.row_number().over(w).cast("long")
    )
