"""Post-load data-quality checks on the serving table.

The reference documents these as *manual* DynamoDB scan/query checks
(``/root/reference/docs/dynamodb-queries.md:103-185``): items with missing
attributes, out-of-range metric values, malformed timestamps. Here they are
one declarative pass over the serving frame — a single aggregate, so the
QA cost is a scan even at serving-table scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Required attributes per item family (reference item shapes,
#: ``load_dynamodb.py:229-343``). Deliberately EXCLUDES dimension-sourced
#: attributes (user_name, user_country): the enrichment uses LEFT joins,
#: so a fact row with no dimension match legitimately carries nulls there
#: (reference semantics, SURVEY §2.3) — that is data lineage, not a
#: serving-layer defect, and must not trip the pipeline gate.
REQUIRED_ATTRS = {
    "user": ("total_songs_played", "total_listening_time_minutes"),
    "genre_daily": ("date", "track_genre", "listen_count", "unique_listeners"),
    "genre_top_songs": ("date", "track_genre", "track_id", "play_count", "rank"),
    "genre_top_genres": ("date", "track_genre", "listen_count", "rank"),
    "trending": ("track_id", "plays_last_24h", "unique_listeners"),
}

_TS_RE = r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}$"


def qa_serving_items(items: DataFrame) -> DataFrame:
    """One row per kpi_type with violation counts: missing required
    attributes, negative metrics, malformed item ids / timestamps."""
    missing_attr = _missing_attr_expr()

    negative_metric = F.lit(False)
    for m in (
        "total_songs_played",
        "total_listening_time_minutes",
        "listen_count",
        "unique_listeners",
        "play_count",
        "plays_last_24h",
        "rank",
    ):
        negative_metric = negative_metric | (F.col(m) < 0)

    # rlike(NULL) is NULL and sum() skips NULLs — coalesce to True so a
    # NULL timestamp/id counts as malformed instead of failing open
    bad_ts = F.coalesce(~F.col("timestamp").rlike(_TS_RE), F.lit(True))
    bad_id = F.coalesce(~F.col("id").rlike(r"^[A-Z_]+_"), F.lit(True))

    return (
        items.withColumn("v_missing", missing_attr.cast("int"))
        .withColumn("v_negative", F.coalesce(negative_metric, F.lit(False)).cast("int"))
        .withColumn("v_bad_ts", bad_ts.cast("int"))
        .withColumn("v_bad_id", bad_id.cast("int"))
        .groupBy("kpi_type")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("v_missing").alias("missing_attrs"),
            F.sum("v_negative").alias("negative_metrics"),
            F.sum("v_bad_ts").alias("malformed_timestamps"),
            F.sum("v_bad_id").alias("malformed_ids"),
        )
    )


def assert_serving_quality(items: DataFrame) -> None:
    """Raise if any violation count is non-zero (pipeline gate)."""
    bad = (
        qa_serving_items(items)
        .filter(
            (F.col("missing_attrs") > 0)
            | (F.col("negative_metrics") > 0)
            | (F.col("malformed_timestamps") > 0)
            | (F.col("malformed_ids") > 0)
        )
        .collect()
    )
    if bad:
        raise ValueError(f"serving quality violations: {[r.asDict() for r in bad]}")


def _missing_attr_expr():
    """Per-family missing-required-attribute predicate (shared by the
    standalone auditor and the observe()-based write-time metrics)."""
    missing_attr = F.lit(False)
    for family, attrs in REQUIRED_ATTRS.items():
        fam_missing = F.lit(False)
        for a in attrs:
            fam_missing = fam_missing | F.col(a).isNull()
        missing_attr = F.when(
            F.col("kpi_type") == family, fam_missing
        ).otherwise(missing_attr)
    return missing_attr


def observed_write_metrics(items: DataFrame) -> tuple[DataFrame, "Observation"]:
    """Attach free-riding QA metrics to the serving frame via
    ``DataFrame.observe``: the counters are collected DURING whatever
    action consumes the returned frame (the serving write), so the
    quality gate costs ZERO extra passes — unlike :func:`qa_serving_items`,
    which is its own scan. Use this form inside the batch pipeline; keep
    the standalone auditor for ad-hoc checks of already-written tables.

    Same counter semantics as the auditor: NULL timestamps/ids count as
    malformed (rlike(NULL) fails open without the coalesce), and the
    missing-required-attribute check is included.

    Returns (frame_to_write, observation); read ``observation.get`` after
    the action completes.
    """
    from pyspark.sql import Observation

    negative_metric = F.lit(False)
    for m in (
        "total_songs_played",
        "total_listening_time_minutes",
        "listen_count",
        "unique_listeners",
        "play_count",
        "plays_last_24h",
        "rank",
    ):
        negative_metric = negative_metric | (F.col(m) < 0)

    obs = Observation("serving_qa")
    observed = items.observe(
        obs,
        F.count(F.lit(1)).alias("n_items"),
        F.sum(_missing_attr_expr().cast("long")).alias("missing_attrs"),
        F.sum(
            F.coalesce(negative_metric, F.lit(False)).cast("long")
        ).alias("negative_metrics"),
        F.sum(
            F.coalesce(~F.col("timestamp").rlike(_TS_RE), F.lit(True))
            .cast("long")
        ).alias("malformed_timestamps"),
        F.sum(
            F.coalesce(~F.col("id").rlike(r"^[A-Z_]+_"), F.lit(True))
            .cast("long")
        ).alias("malformed_ids"),
    )
    return observed, obs
