"""MERGE / upsert / SCD2 emulation on plain parquet.

No Delta/Iceberg jars ship in this environment, so the engine provides
the classic emulations (anti-join + union; window-closed version rows).
Swap for `MERGE INTO` when a table format is on the classpath — the
call signatures are format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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

    Multiple changes for one key in a single batch are sequenced by
    ``effective_ts``: each intermediate change's version is closed at the
    next change's timestamp, only the latest stays open, and the
    previously-open dim row is closed at the EARLIEST change — so validity
    intervals never overlap. Ties on ``effective_ts`` within a key are not
    ordered deterministically; give changes distinct timestamps.
    """
    open_rows = dim.filter(F.col(end_col) == open_marker)
    closed_rows = dim.filter(F.col(end_col) != open_marker)

    # close the currently-open version at the key's EARLIEST change
    first_change = changes.groupBy(key).agg(
        F.min(effective_ts).alias("__new_from")
    )
    newly_closed = (
        open_rows.join(first_change, key)
        .withColumn(end_col, F.col("__new_from"))
        .drop("__new_from")
    )
    untouched_open = open_rows.join(
        changes.select(key).distinct(), key, "left_anti"
    )

    # sequence the batch per key: each change is closed by the next one;
    # only the last change per key remains open
    w = Window.partitionBy(key).orderBy(effective_ts)
    new_versions = (
        changes.withColumn("__next_from", F.lead(effective_ts).over(w))
        .withColumn(start_col, F.col(effective_ts))
        .withColumn(
            end_col,
            F.coalesce(
                F.col("__next_from").cast("string"), F.lit(open_marker)
            ),
        )
        .drop(effective_ts, "__next_from")
    )
    return (
        closed_rows.unionByName(newly_closed)
        .unionByName(untouched_open)
        .unionByName(new_versions)
    )


def apply_changelog(
    base: DataFrame,
    changelog: DataFrame,
    keys: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """CDC apply: fold a Debezium-shaped changelog (``op`` ∈ I/U/D with a
    monotone ``seq`` per key) into ``base`` — the full-fidelity upgrade
    of :func:`upsert` (which cannot delete and cannot arbitrate
    same-batch writes).

    Per key, only the HIGHEST-``seq`` change decides: I/U → that row's
    payload replaces (or inserts) the key; D → the key disappears, even
    if it was inserted earlier in the same batch. Rows of ``base``
    untouched by the changelog carry over. One window over the changelog
    (keyed, so no global sort) + one anti-join + one union — the same
    shuffle shape as plain upsert, at any table size. Ties on ``seq``
    break by preferring the delete (the conservative read of a torn
    sequence), then arbitrarily — give changes distinct sequence numbers.
    """
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(),
        # tie: delete wins (op 'd' sorts before 'i'/'u' ascending)
        F.when(F.lower(F.col(op_col)) == "d", 0).otherwise(1).asc(),
    )
    last = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    survivors = base.join(last.select(*keys).distinct(), keys, "left_anti")
    upserts = (
        last.filter(F.lower(F.col(op_col)) != "d")
        .drop(op_col, seq_col)
    )
    return survivors.unionByName(upserts)


# ---------------------------------------------------------------------------
# catalog wiring: CDC apply over a deterministic synthetic changelog
# ---------------------------------------------------------------------------

def orders_changelog_applied(orders: DataFrame) -> DataFrame:
    """:func:`apply_changelog` exercised end-to-end from one table: base
    = orders with key % 3 != 0; the changelog inserts the % 3 == 0 keys
    (seq 1), uprices the % 7 == 0 keys (seq 2), and deletes the % 5 == 0
    keys (seq 3) — so keys hit by several ops resolve by highest seq
    (e.g. % 15 == 0 keys end deleted even when freshly inserted). Output
    is the folded (o_orderkey, o_orderstatus, o_totalprice) relation,
    hash-checked against a window-SQL twin."""
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    base = orders.filter(F.col("o_orderkey") % 3 != 0).select(*cols)
    inserts = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit("i").alias("op"),
        F.lit(1).alias("seq"),
    )
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        F.round(F.col("o_totalprice") * 2, 2).alias("o_totalprice"),
        F.lit("u").alias("op"),
        F.lit(2).alias("seq"),
    )
    deletes = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit("d").alias("op"),
        F.lit(3).alias("seq"),
    )
    log = inserts.unionByName(updates).unionByName(deletes)
    return apply_changelog(base, log, ["o_orderkey"])


ORDERS_CHANGELOG_SQL = """
WITH base AS (
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 3 != 0
),
log AS (
    SELECT o_orderkey, o_orderstatus, o_totalprice, 'i' AS op, 1 AS seq
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT o_orderkey, 'U', round(o_totalprice * 2, 2), 'u', 2
    FROM orders WHERE o_orderkey % 7 = 0
    UNION ALL
    SELECT o_orderkey, NULL, NULL, 'd', 3
    FROM orders WHERE o_orderkey % 5 = 0
),
last AS (
    SELECT o_orderkey, o_orderstatus, o_totalprice, op
    FROM (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                     ORDER BY seq DESC) AS rn
        FROM log
    ) WHERE rn = 1
)
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM log)
UNION ALL
SELECT o_orderkey, o_orderstatus, o_totalprice FROM last WHERE op != 'd'
"""
