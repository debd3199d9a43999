"""The five KPI queries of the reference, as pure DataFrame→DataFrame
functions over the enriched wide table.

Reference: ``/root/reference/scripts/compute_kpis.py``
  * A1 user KPIs            :157-175
  * A2 genre daily metrics  :178-195
  * A3+W1 top songs/genre   :197-205  (dense_rank <= 3)
  * W2 top genres/day       :207-210  (dense_rank <= 5)
  * W3+A4+O1 trending-24h   :219-249  (range frame + agg + global sort)

Every query has its DuckDB-oracle SQL twin colocated in this module so the
Spark plan and the oracle can't drift. All double aggregates go through
``exact_sum`` (order-independent decimal accumulation — see
functions/numeric.py) so results are bit-stable at any partition count.

dense_rank (not row_number) is intentional: ties all survive the top-k
filter, so "top 3" can return more than 3 rows — reference semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from music_streaming_etl_glue_spark.functions.numeric import exact_sum
from music_streaming_etl_glue_spark.operators.enrich import ENRICH_SQL

TOP_SONGS_K = 3
TOP_GENRES_K = 5
TRENDING_WINDOW_SECONDS = 86_400


# ---------------------------------------------------------------------------
# A1 — user KPIs
# ---------------------------------------------------------------------------

def user_kpis(enriched: DataFrame) -> DataFrame:
    """Per-user listening totals (reference ``compute_kpis.py:157-175``).

    One hash-aggregate shuffle on the group keys; Catalyst supplies the
    partial (map-side) aggregation stage automatically.
    """
    return enriched.groupBy("user_id", "user_name", "user_country").agg(
        F.count("track_id").alias("total_songs_played"),
        exact_sum("listening_time").alias("total_listening_time_minutes"),
        (exact_sum("listening_time") / F.count("listening_time")).alias(
            "avg_listening_time_minutes"
        ),
        F.lit("user").alias("kpi_type"),
    )


USER_KPIS_SQL = f"""
WITH enriched AS ({ENRICH_SQL})
SELECT
    user_id,
    user_name,
    user_country,
    COUNT(track_id) AS total_songs_played,
    CAST(SUM(CAST(listening_time AS DECIMAL(18,2))) AS DOUBLE)
        AS total_listening_time_minutes,
    CAST(SUM(CAST(listening_time AS DECIMAL(18,2))) AS DOUBLE)
        / COUNT(listening_time) AS avg_listening_time_minutes,
    'user' AS kpi_type
FROM enriched
GROUP BY user_id, user_name, user_country
"""


# ---------------------------------------------------------------------------
# A2 — genre daily metrics
# ---------------------------------------------------------------------------

def genre_daily_metrics(enriched: DataFrame) -> DataFrame:
    """Daily per-genre listens / unique listeners / listening time
    (reference ``compute_kpis.py:178-195``).

    ``countDistinct`` is exact for oracle parity; at 100 TB swap in
    ``approx_count_distinct`` (see :func:`genre_daily_metrics_approx`).
    """
    return (
        enriched.withColumn("date", F.col("timestamp").cast("date"))
        .groupBy("date", "track_genre")
        .agg(
            F.count("track_id").alias("listen_count"),
            F.countDistinct("user_id").alias("unique_listeners"),
            exact_sum("listening_time").alias("total_listening_time_minutes"),
        )
    )


def genre_daily_metrics_approx(enriched: DataFrame, rsd: float = 0.02) -> DataFrame:
    """HLL++ variant for very large scale: one shuffle instead of the
    two-phase exact-distinct expansion."""
    return (
        enriched.withColumn("date", F.col("timestamp").cast("date"))
        .groupBy("date", "track_genre")
        .agg(
            F.count("track_id").alias("listen_count"),
            F.approx_count_distinct("user_id", rsd).alias("unique_listeners"),
            exact_sum("listening_time").alias("total_listening_time_minutes"),
        )
    )


GENRE_DAILY_SQL = f"""
WITH enriched AS ({ENRICH_SQL})
SELECT
    CAST(timestamp AS DATE) AS date,
    track_genre,
    COUNT(track_id) AS listen_count,
    COUNT(DISTINCT user_id) AS unique_listeners,
    CAST(SUM(CAST(listening_time AS DECIMAL(18,2))) AS DOUBLE)
        AS total_listening_time_minutes
FROM enriched
GROUP BY CAST(timestamp AS DATE), track_genre
"""


def genre_daily_metrics_approx_audit(
    enriched: DataFrame,
    rsd: float = 0.02,
    rel_bound: float = 0.10,
    abs_slack: int = 4,
) -> DataFrame:
    """Bounded driver check for :func:`genre_daily_metrics_approx`
    (VERDICT r11 item #8): the approx entry used to be rows-only
    because HLL register values are engine-specific — but the HLL
    ERROR ENVELOPE is checkable against the exact aggregate in plain
    SQL. This audit emits the group keys + exact metrics (both engines
    compute them identically) + a boolean ``hll_within_bound`` that the
    Spark side derives from its own sketch (|approx − exact| ≤
    max(rel_bound·exact, abs_slack)) and the oracle asserts as TRUE —
    so a sketch estimate outside the envelope flips the flag and fails
    the driver's hash compare. rsd=0.02 with rel_bound=0.10 gives
    ≥2.4× margin over the measured worst case (4.1% at sf0.01, 3.1% at
    sf0.1); abs_slack covers integer-granularity wobble on tiny groups.
    The raw approx output (no exact twin, one shuffle — the 100 TB
    shape) remains :func:`genre_daily_metrics_approx`."""
    return (
        enriched.withColumn("date", F.col("timestamp").cast("date"))
        .groupBy("date", "track_genre")
        .agg(
            F.count("track_id").alias("listen_count"),
            F.approx_count_distinct("user_id", rsd).alias("_est"),
            F.count_distinct("user_id").alias("unique_listeners"),
            exact_sum("listening_time").alias(
                "total_listening_time_minutes"
            ),
        )
        .select(
            "date",
            "track_genre",
            "listen_count",
            "unique_listeners",
            "total_listening_time_minutes",
            (
                F.abs(F.col("_est") - F.col("unique_listeners"))
                <= F.greatest(
                    F.lit(rel_bound) * F.col("unique_listeners"),
                    F.lit(abs_slack),
                )
            ).alias("hll_within_bound"),
        )
    )


GENRE_DAILY_APPROX_AUDIT_SQL = f"""
WITH enriched AS ({ENRICH_SQL})
SELECT
    CAST(timestamp AS DATE) AS date,
    track_genre,
    COUNT(track_id) AS listen_count,
    COUNT(DISTINCT user_id) AS unique_listeners,
    CAST(SUM(CAST(listening_time AS DECIMAL(18,2))) AS DOUBLE)
        AS total_listening_time_minutes,
    TRUE AS hll_within_bound
FROM enriched
GROUP BY CAST(timestamp AS DATE), track_genre
"""


# ---------------------------------------------------------------------------
# A3 + W1 — top songs per (day, genre)
# ---------------------------------------------------------------------------

def genre_top_songs(enriched: DataFrame, k: int = TOP_SONGS_K) -> DataFrame:
    """Top-k tracks by play count within each (day, genre)
    (reference ``compute_kpis.py:197-205``).

    groupBy shuffle on (date, genre, track), then a window shuffle on
    (date, genre) — the second shuffle moves only the small aggregate.
    """
    plays = (
        enriched.withColumn("date", F.col("timestamp").cast("date"))
        .groupBy("date", "track_genre", "track_id")
        .agg(F.count("*").alias("play_count"))
    )
    w = Window.partitionBy("date", "track_genre").orderBy(F.col("play_count").desc())
    return (
        plays.withColumn("rank", F.dense_rank().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


GENRE_TOP_SONGS_SQL = f"""
WITH enriched AS ({ENRICH_SQL}),
plays AS (
    SELECT CAST(timestamp AS DATE) AS date,
           track_genre, track_id, COUNT(*) AS play_count
    FROM enriched
    GROUP BY 1, 2, 3
),
ranked AS (
    SELECT *, DENSE_RANK() OVER (
        PARTITION BY date, track_genre ORDER BY play_count DESC
    ) AS rank
    FROM plays
)
SELECT date, track_genre, track_id, play_count, rank
FROM ranked WHERE rank <= {TOP_SONGS_K}
"""


# ---------------------------------------------------------------------------
# W2 — top genres per day
# ---------------------------------------------------------------------------

def genre_top_genres(
    enriched: DataFrame, k: int = TOP_GENRES_K, daily: DataFrame | None = None
) -> DataFrame:
    """Top-k genres by daily listen count (reference
    ``compute_kpis.py:207-210``) — ranks the (already tiny) daily metrics.
    Pass ``daily`` when the caller already computed it (avoids rebuilding
    the aggregate from enriched)."""
    if daily is None:
        daily = genre_daily_metrics(enriched)
    w = Window.partitionBy("date").orderBy(F.col("listen_count").desc())
    return (
        daily.withColumn("rank", F.dense_rank().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


GENRE_TOP_GENRES_SQL = f"""
WITH daily AS ({GENRE_DAILY_SQL}),
ranked AS (
    SELECT *, DENSE_RANK() OVER (
        PARTITION BY date ORDER BY listen_count DESC
    ) AS rank
    FROM daily
)
SELECT date, track_genre, listen_count, unique_listeners,
       total_listening_time_minutes, rank
FROM ranked WHERE rank <= {TOP_GENRES_K}
"""


# ---------------------------------------------------------------------------
# W3 + A4 + O1 — trending tracks (24h range frame)
# ---------------------------------------------------------------------------

def _trending(enriched: DataFrame, descending: bool) -> DataFrame:
    unix_ts = F.unix_timestamp("timestamp")
    order = unix_ts.desc() if descending else unix_ts.asc()
    w = (
        Window.partitionBy("track_id")
        .orderBy(order)
        .rangeBetween(-TRENDING_WINDOW_SECONDS, 0)
    )
    windowed = enriched.withColumn("plays_window", F.count("track_id").over(w))
    return (
        windowed.groupBy("track_id", "track_genre")
        .agg(
            F.max("plays_window").alias("plays_last_24h"),
            exact_sum("listening_time").alias("total_listening_time_minutes"),
            F.countDistinct("user_id").alias("unique_listeners"),
            F.lit("trending").alias("kpi_type"),
        )
        .orderBy(F.col("plays_last_24h").desc())
    )


def trending_tracks(enriched: DataFrame) -> DataFrame:
    """Canonical trailing-24h trending: max plays of each track within any
    trailing 24h window (ascending time order — the semantics the
    reference's *name* promises)."""
    return _trending(enriched, descending=False)


def trending_tracks_reference_exact(enriched: DataFrame) -> DataFrame:
    """Bit-compatible reproduction of the reference's W3
    (``compute_kpis.py:230-239``): the ORDER BY is **descending**, so
    "86400 preceding" selects *later* timestamps — each row's frame is the
    *following* 24 hours. Kept for parity tests; see SURVEY §2.5 caveat."""
    return _trending(enriched, descending=True)


def _trending_sql(direction: str) -> str:
    return f"""
WITH enriched AS ({ENRICH_SQL}),
windowed AS (
    SELECT track_id, track_genre, user_id, listening_time,
           COUNT(track_id) OVER (
               PARTITION BY track_id
               ORDER BY CAST(floor(epoch(timestamp)) AS BIGINT) {direction}
               RANGE BETWEEN {TRENDING_WINDOW_SECONDS} PRECEDING AND CURRENT ROW
           ) AS plays_window
    FROM enriched
)
SELECT track_id, track_genre,
       MAX(plays_window) AS plays_last_24h,
       CAST(SUM(CAST(listening_time AS DECIMAL(18,2))) AS DOUBLE)
           AS total_listening_time_minutes,
       COUNT(DISTINCT user_id) AS unique_listeners,
       'trending' AS kpi_type
FROM windowed
GROUP BY track_id, track_genre
"""


TRENDING_SQL = _trending_sql("ASC")
TRENDING_REFERENCE_EXACT_SQL = _trending_sql("DESC")


# ---------------------------------------------------------------------------
# trailing moving average + day-over-day delta (rows-frame window surface)
# ---------------------------------------------------------------------------

MOVING_AVG_DAYS = 7


def genre_daily_moving_avg(
    enriched: DataFrame, days: int = MOVING_AVG_DAYS
) -> DataFrame:
    """Per genre: trailing ``days``-row moving average of daily listens and
    the day-over-day delta. Both windows share one (genre)-keyed sort, and
    they run over the already-aggregated daily table — the shuffle carries
    (days × genres) rows, never raw events."""
    daily = genre_daily_metrics(enriched).select(
        "date", "track_genre", "listen_count"
    )
    w_order = Window.partitionBy("track_genre").orderBy("date")
    w_frame = w_order.rowsBetween(-(days - 1), 0)
    return daily.select(
        "date",
        "track_genre",
        "listen_count",
        F.round(F.avg("listen_count").over(w_frame), 6).alias(
            f"avg_{days}d_listens"
        ),
        (
            F.col("listen_count") - F.lag("listen_count").over(w_order)
        ).alias("delta_vs_prev_day"),
    )


GENRE_DAILY_MOVING_AVG_SQL = f"""
WITH daily AS ({GENRE_DAILY_SQL})
SELECT date, track_genre, listen_count,
       round(avg(listen_count) OVER (
           PARTITION BY track_genre ORDER BY date
           ROWS BETWEEN {MOVING_AVG_DAYS - 1} PRECEDING AND CURRENT ROW
       ), 6) AS avg_{MOVING_AVG_DAYS}d_listens,
       listen_count - lag(listen_count) OVER (
           PARTITION BY track_genre ORDER BY date
       ) AS delta_vs_prev_day
FROM daily
"""


def genre_rolling_median(
    enriched: DataFrame, days: int = MOVING_AVG_DAYS
) -> DataFrame:
    """Per genre: trailing ``days``-row rolling MEDIAN of daily listens —
    the robust twin of :func:`genre_daily_moving_avg` (one spike day
    shifts a moving average by spike/days but leaves the rolling median
    untouched, so threshold alerts on the median don't page on single
    anomalies). ``percentile`` runs as a window aggregate over the same
    (genre)-keyed sort as the moving average; the windowed relation is
    the DAILY aggregate (days × genres rows), never raw events."""
    daily = genre_daily_metrics(enriched).select(
        "date", "track_genre", "listen_count"
    )
    w_frame = (
        Window.partitionBy("track_genre")
        .orderBy("date")
        .rowsBetween(-(days - 1), 0)
    )
    return daily.select(
        "date",
        "track_genre",
        "listen_count",
        F.round(
            F.expr("percentile(listen_count, 0.5)").over(w_frame), 6
        ).alias(f"median_{days}d_listens"),
    )


GENRE_ROLLING_MEDIAN_SQL = f"""
WITH daily AS ({GENRE_DAILY_SQL})
SELECT date, track_genre, listen_count,
       round(quantile_cont(listen_count, 0.5) OVER (
           PARTITION BY track_genre ORDER BY date
           ROWS BETWEEN {MOVING_AVG_DAYS - 1} PRECEDING AND CURRENT ROW
       ), 6) AS median_{MOVING_AVG_DAYS}d_listens
FROM daily
"""


def genre_distinct_sketch_rollup(enriched: DataFrame) -> DataFrame:
    """Mergeable-sketch distinct counting (the pattern that replaces
    COUNT(DISTINCT) rescans at 100 TB): build one HLL sketch per
    (genre, day) partial — the thing a daily job would PERSIST — then
    merge partials per genre with ``hll_union_agg`` to answer the
    all-time distinct-listeners question without touching raw events
    again. Any date range, same partials, no rescan; sketches are
    register-max merges, so the result is independent of merge order
    and partitioning. The exact twin rides along for the error audit
    (pytest bounds it; HLL is engine-specific, so no SQL oracle)."""
    daily = (
        enriched.withColumn("date", F.col("timestamp").cast("date"))
        .groupBy("track_genre", "date")
        .agg(
            F.hll_sketch_agg("user_id").alias("sketch"),
            F.collect_set("user_id").alias("users"),
        )
    )
    return (
        daily.groupBy("track_genre")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
                "est_unique_listeners"
            ),
            F.size(F.array_distinct(F.flatten(F.collect_set("users")))).cast(
                "long"
            ).alias("exact_unique_listeners"),
        )
        .select(
            "track_genre",
            "est_unique_listeners",
            "exact_unique_listeners",
        )
    )


def audience_overlap(enriched: DataFrame) -> DataFrame:
    """Pairwise shared-audience estimation by HLL sketch ALGEBRA:
    intersection via inclusion–exclusion over the per-genre sketches
    (|A∩B| ≈ est(A) + est(B) − est(A ∪ B)) — the question "how many
    listeners do genres X and Y share" answered from the SAME persisted
    per-genre partials :func:`genre_distinct_sketch_rollup` maintains,
    with no re-scan of raw events and no user-level join. The exact
    overlap (a user-keyed self-join, the thing that DOES rescan and
    shuffle) rides along as the error audit, pytest-bounded; at 100 TB
    only the sketch path runs.

    Sketch registers are engine-specific, so this is a rows-only catalog
    entry (the genre_distinct_sketch_rollup precedent)."""
    per_genre = enriched.groupBy("track_genre").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    pairs = (
        per_genre.select(
            F.col("track_genre").alias("genre_a"), F.col("sk").alias("sk_a")
        )
        .join(
            # inequality-only pairing over a |genres|-row relation:
            # broadcast makes it a BroadcastNestedLoopJoin, never a
            # CartesianProduct of anything input-sized
            F.broadcast(
                per_genre.select(
                    F.col("track_genre").alias("genre_b"),
                    F.col("sk").alias("sk_b"),
                )
            ),
            F.col("genre_a") < F.col("genre_b"),
        )
        .select(
            "genre_a",
            "genre_b",
            (
                F.hll_sketch_estimate("sk_a")
                + F.hll_sketch_estimate("sk_b")
                - F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
            ).alias("est_overlap"),
        )
    )
    users = enriched.select(
        F.col("track_genre").alias("g"), F.col("user_id").alias("u")
    ).distinct()
    exact = (
        users.alias("x")
        .join(
            users.alias("y"),
            (F.col("x.u") == F.col("y.u"))
            & (F.col("x.g") < F.col("y.g")),
        )
        .groupBy(
            F.col("x.g").alias("genre_a"), F.col("y.g").alias("genre_b")
        )
        .agg(F.count("*").alias("exact_overlap"))
    )
    # rel_err derives from the SAME long-cast estimate that is emitted
    # (not the raw double), so the output columns are mutually
    # consistent: |est_overlap - exact_overlap| / max(exact_overlap, 1)
    # recomputed from the emitted rows reproduces rel_err exactly
    est_long = F.col("est_overlap").cast("long")
    exact_filled = F.coalesce(F.col("exact_overlap"), F.lit(0))
    return pairs.join(exact, ["genre_a", "genre_b"], "left").select(
        "genre_a",
        "genre_b",
        est_long.alias("est_overlap"),
        exact_filled.alias("exact_overlap"),
        F.round(
            F.abs(est_long - exact_filled)
            / F.greatest(exact_filled, F.lit(1)),
            6,
        ).alias("rel_err"),
    )


def genre_distinct_sketch_rollup_audit(
    enriched: DataFrame, rel_bound: float = 0.05, abs_slack: int = 4
) -> DataFrame:
    """Bounded driver check for :func:`genre_distinct_sketch_rollup`
    (VERDICT r11 item #8): emits the exact per-genre distinct (SQL-
    reproducible) plus ``sketch_within_bound`` — whether the merged-
    sketch estimate landed within max(rel_bound·exact, abs_slack) of
    it. Register-level sketch bytes stay engine-specific; the ESTIMATE
    has a checkable envelope (measured worst case 0.8% at sf0.1 for the
    default lgConfigK; rel_bound=0.05 gives ≥6× margin). The oracle
    asserts TRUE, so an out-of-envelope merge fails the hash compare."""
    base = genre_distinct_sketch_rollup(enriched)
    return base.select(
        "track_genre",
        F.col("exact_unique_listeners").cast("long").alias(
            "exact_unique_listeners"
        ),
        (
            F.abs(
                F.col("est_unique_listeners")
                - F.col("exact_unique_listeners")
            )
            <= F.greatest(
                F.lit(rel_bound) * F.col("exact_unique_listeners"),
                F.lit(abs_slack),
            )
        ).alias("sketch_within_bound"),
    )


GENRE_SKETCH_ROLLUP_AUDIT_SQL = f"""
WITH enriched AS ({ENRICH_SQL})
SELECT track_genre,
       COUNT(DISTINCT user_id) AS exact_unique_listeners,
       TRUE AS sketch_within_bound
FROM enriched
GROUP BY track_genre
"""


def audience_overlap_audit(
    enriched: DataFrame, rel_bound: float = 0.08, abs_slack: int = 8
) -> DataFrame:
    """Bounded driver check for :func:`audience_overlap` (VERDICT r11
    item #8): inclusion–exclusion compounds three HLL estimates, so its
    envelope is wider than a single sketch's — measured worst case 1.8%
    relative / 27 absolute at sf0.1; rel_bound=0.08 with abs_slack=8
    (small overlaps are integer-granular) gives >4× margin. Emits the
    exact pair overlap (SQL: a user-keyed self-join over the distinct
    (genre, user) relation) and ``ie_within_bound``; the oracle asserts
    TRUE. The sketch-only production path (no exact twin, no user-level
    join) remains :func:`audience_overlap`."""
    base = audience_overlap(enriched)
    return base.select(
        "genre_a",
        "genre_b",
        "exact_overlap",
        (
            F.abs(F.col("est_overlap") - F.col("exact_overlap"))
            <= F.greatest(
                F.lit(rel_bound) * F.col("exact_overlap"),
                F.lit(abs_slack),
            )
        ).alias("ie_within_bound"),
    )


AUDIENCE_OVERLAP_AUDIT_SQL = f"""
WITH enriched AS ({ENRICH_SQL}),
gu AS (SELECT DISTINCT track_genre AS g, user_id AS u FROM enriched),
genres AS (SELECT DISTINCT g FROM gu),
pairs AS (
    SELECT a.g AS genre_a, b.g AS genre_b
    FROM genres a JOIN genres b ON a.g < b.g
),
ex AS (
    SELECT x.g AS genre_a, y.g AS genre_b, COUNT(*) AS exact_overlap
    FROM gu x JOIN gu y ON x.u = y.u AND x.g < y.g
    GROUP BY x.g, y.g
)
SELECT p.genre_a, p.genre_b,
       COALESCE(ex.exact_overlap, 0) AS exact_overlap,
       TRUE AS ie_within_bound
FROM pairs p
LEFT JOIN ex ON p.genre_a = ex.genre_a AND p.genre_b = ex.genre_b
"""


#: 32-bit bitmap words: shifts stay ≤ 31, which both engines' checked
#: 64-bit arithmetic accepts (a 63-bit shift overflows DuckDB's BIGINT
#: and UBIGINT alike); the word count doubles vs 64-bit words but the
#: relation stays |user space| / 32 rows — the constant is irrelevant
#: next to the shuffle it replaces.
BITMAP_WORD_BITS = 32

_BITMAP_MASK = (
    "shiftleft(CAST(1 AS BIGINT), "
    f"CAST(pmod(user_id, {BITMAP_WORD_BITS}) AS INT))"
)


def genre_distinct_bitmap_rollup(enriched: DataFrame) -> DataFrame:
    """EXACT mergeable distinct counting — the bitmap-index (Roaring)
    pattern as plain relational algebra, and the exact counterpart of
    :func:`genre_distinct_sketch_rollup`'s HLL: per (genre, day) persist
    (word = user_id div 32, bitmap = bit_or of member masks) partials;
    any date range then merges partials with ``bit_or`` and counts with
    ``sum(bit_count(bitmap))`` — no re-scan of raw events, no
    COUNT(DISTINCT) expansion, EXACT answers (sketches trade error for
    size; bitmaps trade size for exactness — |user space|/32 words
    per group, the right trade when ids are dense).

    Merge is idempotent and order-independent (OR), so partials
    re-aggregate across any partitioning — the same persistence story
    as the HLL rollup with none of the error bar."""
    daily = (
        enriched.withColumn("date", F.col("timestamp").cast("date"))
        .select(
            "track_genre",
            "date",
            F.floor(F.col("user_id") / BITMAP_WORD_BITS)
            .cast("long")
            .alias("word"),
            F.expr(_BITMAP_MASK).alias("mask"),
        )
        .groupBy("track_genre", "date", "word")
        .agg(F.expr("bit_or(mask)").alias("bm"))
    )
    merged = daily.groupBy("track_genre", "word").agg(
        F.expr("bit_or(bm)").alias("bm")
    )
    return merged.groupBy("track_genre").agg(
        F.sum(F.bit_count("bm")).cast("long").alias("unique_listeners")
    )


GENRE_DISTINCT_BITMAP_SQL = f"""
WITH enriched AS ({ENRICH_SQL}),
daily AS (
    SELECT track_genre, CAST(timestamp AS DATE) AS date,
           CAST(floor(user_id / {BITMAP_WORD_BITS}) AS BIGINT) AS word,
           bit_or(1::BIGINT << (((user_id % {BITMAP_WORD_BITS}) + {BITMAP_WORD_BITS}) % {BITMAP_WORD_BITS})::INT) AS bm
    FROM enriched
    GROUP BY 1, 2, 3
),
merged AS (
    SELECT track_genre, word, bit_or(bm) AS bm FROM daily GROUP BY 1, 2
)
SELECT track_genre, SUM(bit_count(bm))::BIGINT AS unique_listeners
FROM merged
GROUP BY track_genre
"""


def audience_overlap_bitmap(enriched: DataFrame) -> DataFrame:
    """EXACT pairwise shared audience from the SAME bitmap partials as
    :func:`genre_distinct_bitmap_rollup`: intersection = ``bit_and`` of
    the two genres' word bitmaps, overlap = ``sum(bit_count(a & b))``.
    Where the HLL twin (:func:`audience_overlap`) estimates via
    inclusion–exclusion, the bitmap form answers exactly — and the join
    is word-keyed between two |user space|/32-row relations, never a
    user-level self-join over raw events. The full exact-vs-estimate
    audience toolkit then is: sketches when ids are sparse/unbounded,
    bitmaps when dense."""
    merged = (
        enriched.select(
            "track_genre",
            F.floor(F.col("user_id") / BITMAP_WORD_BITS)
            .cast("long")
            .alias("word"),
            F.expr(_BITMAP_MASK).alias("mask"),
        )
        .groupBy("track_genre", "word")
        .agg(F.expr("bit_or(mask)").alias("bm"))
    )
    a = merged.select(
        F.col("track_genre").alias("genre_a"),
        "word",
        F.col("bm").alias("bm_a"),
    )
    b = merged.select(
        F.col("track_genre").alias("genre_b"),
        "word",
        F.col("bm").alias("bm_b"),
    )
    return (
        a.join(b, "word")
        .filter(F.col("genre_a") < F.col("genre_b"))
        .groupBy("genre_a", "genre_b")
        .agg(
            F.sum(F.bit_count(F.col("bm_a").bitwiseAND(F.col("bm_b"))))
            .cast("long")
            .alias("shared_listeners")
        )
    )


AUDIENCE_OVERLAP_BITMAP_SQL = f"""
WITH enriched AS ({ENRICH_SQL}),
merged AS (
    SELECT track_genre,
           CAST(floor(user_id / {BITMAP_WORD_BITS}) AS BIGINT) AS word,
           bit_or(1::BIGINT << (((user_id % {BITMAP_WORD_BITS}) + {BITMAP_WORD_BITS}) % {BITMAP_WORD_BITS})::INT) AS bm
    FROM enriched
    GROUP BY 1, 2
)
SELECT a.track_genre AS genre_a, b.track_genre AS genre_b,
       SUM(bit_count(a.bm & b.bm))::BIGINT AS shared_listeners
FROM merged a JOIN merged b
  ON a.word = b.word AND a.track_genre < b.track_genre
GROUP BY 1, 2
"""


def genre_trend_slopes(enriched: DataFrame) -> DataFrame:
    """Per-genre least-squares trend of daily listens: slope and
    intercept of listen_count over the day index, plus a trend label
    (rising / falling / flat at ±0.5 listens/day) — the alerting
    primitive behind "which genres are growing".

    Engine ``regr_slope`` implementations differ in float detail, so
    the slope derives from integer sums (Σx, Σy, Σxy, Σx² are exact
    BIGINTs over the DAILY aggregate; day index = datediff from the
    global min date) through one IEEE expression — bit-identical in
    both engines, the `genre_daily_anomalies` discipline. The windowed
    relation is days × genres, never raw events."""
    daily = genre_daily_metrics(enriched).select(
        "date", "track_genre", "listen_count"
    )
    d0 = F.broadcast(daily.agg(F.min("date").alias("d0")))
    xy = daily.crossJoin(d0).select(
        "track_genre",
        F.datediff(F.col("date"), F.col("d0")).cast("long").alias("x"),
        F.col("listen_count").alias("y"),
    )
    stats = xy.groupBy("track_genre").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    denom = n * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    label = (
        F.when(F.col("slope") > 0.5, "rising")
        .when(F.col("slope") < -0.5, "falling")
        .otherwise("flat")
    )
    return (
        stats.filter(denom != 0)
        .select(
            "track_genre",
            "n",
            F.round(slope, 6).alias("slope"),
            F.round(intercept, 6).alias("intercept"),
        )
        .withColumn("trend", label)
    )


GENRE_TREND_SLOPES_SQL = f"""
WITH daily AS ({GENRE_DAILY_SQL}),
d0 AS (SELECT MIN(date) AS d0 FROM daily),
xy AS (
    SELECT track_genre,
           date_diff('day', d0.d0, daily.date)::BIGINT AS x,
           listen_count AS y
    FROM daily, d0
),
stats AS (
    SELECT track_genre, COUNT(*) AS n, SUM(x)::BIGINT AS sx,
           SUM(y)::BIGINT AS sy, SUM(x * y)::BIGINT AS sxy,
           SUM(x * x)::BIGINT AS sxx
    FROM xy GROUP BY track_genre
)
SELECT track_genre, n,
       round((n::DOUBLE * sxy - sx::DOUBLE * sy)
             / (n::DOUBLE * sxx - sx::DOUBLE * sx), 6) AS slope,
       round((sy - (n::DOUBLE * sxy - sx::DOUBLE * sy)
                   / (n::DOUBLE * sxx - sx::DOUBLE * sx) * sx)
             / n::DOUBLE, 6) AS intercept,
       CASE WHEN (n::DOUBLE * sxy - sx::DOUBLE * sy)
                 / (n::DOUBLE * sxx - sx::DOUBLE * sx) > 0.5 THEN 'rising'
            WHEN (n::DOUBLE * sxy - sx::DOUBLE * sy)
                 / (n::DOUBLE * sxx - sx::DOUBLE * sx) < -0.5 THEN 'falling'
            ELSE 'flat' END AS trend
FROM stats
WHERE n::DOUBLE * sxx - sx::DOUBLE * sx != 0
"""


def genre_country_chi2(enriched: DataFrame) -> DataFrame:
    """Chi-square independence audit between genre and listener country:
    per-cell observed vs expected contributions ((O−E)²/E with E =
    row·col/n) plus the per-cell share of the total statistic — the
    "is listening taste independent of geography" screen, and the
    general contingency-audit shape (swap in any two categorical
    columns). All counts are exact BIGINT aggregates; expected values
    and contributions are one IEEE expression over three broadcast
    marginals — deterministic in both engines, no sampling, no stats
    library."""
    cells = enriched.groupBy("track_genre", "user_country").agg(
        F.count("*").alias("o")
    )
    row_m = cells.groupBy("track_genre").agg(F.sum("o").alias("row_n"))
    col_m = cells.groupBy("user_country").agg(F.sum("o").alias("col_n"))
    tot = F.broadcast(cells.agg(F.sum("o").alias("n")))
    e = F.col("row_n") * F.col("col_n") / F.col("n").cast("double")
    contrib = (F.col("o") - e) * (F.col("o") - e) / e
    with_stats = (
        cells.join(F.broadcast(row_m), "track_genre")
        .join(F.broadcast(col_m), "user_country")
        .crossJoin(tot)
        .select(
            "track_genre",
            "user_country",
            "o",
            F.round(e, 6).alias("expected"),
            F.round(contrib, 6).alias("chi2_term"),
        )
    )
    total_chi2 = F.broadcast(
        with_stats.agg(F.sum("chi2_term").alias("chi2_total"))
    )
    # perfect independence → chi2_total = 0: every cell's share is 0,
    # not a division error (ANSI mode turns x/0 into a hard failure)
    share = F.when(F.col("chi2_total") != 0, F.col("chi2_term") / F.col("chi2_total")).otherwise(F.lit(0.0))
    return with_stats.crossJoin(total_chi2).select(
        "track_genre",
        "user_country",
        "o",
        "expected",
        "chi2_term",
        F.round(share, 6).alias("share_of_stat"),
    )


GENRE_COUNTRY_CHI2_SQL = f"""
WITH enriched AS ({ENRICH_SQL}),
cells AS (
    SELECT track_genre, user_country, COUNT(*) AS o
    FROM enriched GROUP BY 1, 2
),
row_m AS (SELECT track_genre, SUM(o)::BIGINT AS row_n FROM cells GROUP BY 1),
col_m AS (SELECT user_country, SUM(o)::BIGINT AS col_n FROM cells GROUP BY 1),
tot AS (SELECT SUM(o)::BIGINT AS n FROM cells),
terms AS (
    SELECT c.track_genre, c.user_country, c.o,
           round(r.row_n * m.col_n / t.n::DOUBLE, 6) AS expected,
           round((c.o - r.row_n * m.col_n / t.n::DOUBLE)
                 * (c.o - r.row_n * m.col_n / t.n::DOUBLE)
                 / (r.row_n * m.col_n / t.n::DOUBLE), 6) AS chi2_term
    FROM cells c
    JOIN row_m r USING (track_genre)
    JOIN col_m m USING (user_country)
    CROSS JOIN tot t
),
tc AS (SELECT SUM(chi2_term) AS chi2_total FROM terms)
SELECT track_genre, user_country, o, expected, chi2_term,
       round(CASE WHEN tc.chi2_total = 0 THEN 0.0
                  ELSE chi2_term / tc.chi2_total END, 6) AS share_of_stat
FROM terms, tc
"""
