"""Behavioral / time-series analytics over the event stream: retention
cohorts, conversion funnels, anomaly scoring, hierarchical time-bucket
rollups, co-occurrence mining, and exact per-group sampling. These are
the product-analytics shapes a streaming-events warehouse serves daily;
none exist in the reference (its KPI surface stops at five fixed
aggregates) — they generalize SURVEY §2.3's aggregation family.

Scale design (100 TB):
* Retention/funnel shuffle ONLY on ``user_id`` (Spark reuses one
  exchange for consecutive same-key windows/aggregations).
* The rollup is a hierarchical cascade — daily re-aggregates HOURLY
  output, weekly re-aggregates DAILY — so the raw scan is paid once and
  each coarser resolution reads the (tiny) finer aggregate, the
  continuous-aggregate pattern of timeseries stores. Sums stay in
  decimal until the final projection so cascading never re-rounds.
* Anomaly z-scores derive mean/variance from integer window sums
  (count/sum/sum-of-squares are exact BIGINTs; the double math is the
  same IEEE expression on both engines), not from engine-specific
  ``stddev`` implementations whose last-ulp behavior differs.
* Co-occurrence bounds its per-group quadratic with a deterministic
  per-(user, day) track cap BEFORE the self-join — the cap, not the
  join, is what survives a 100× fan-in of hot users.
* Exact per-group top-N sampling uses a rank window partitioned by the
  group key: right when groups are few-and-hot (5 event types); for
  many-group fractional sampling use the shuffle-free hash-threshold
  filter in ``dedup.stratified_sample`` instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FUNNEL_STAGES = ("view", "click", "purchase")
ANOMALY_BASELINE_DAYS = 6  # trailing days feeding the baseline stats
ANOMALY_MIN_BASELINE = 3
ANOMALY_Z_THRESHOLD = 2.0
COOCCUR_MAX_TRACKS_PER_GROUP = 50
COOCCUR_TOP_K = 100
SAMPLE_PER_GROUP_N = 20


# ---------------------------------------------------------------------------
# retention cohorts
# ---------------------------------------------------------------------------

def user_retention_cohorts(events: DataFrame) -> DataFrame:
    """Classic retention triangle: users bucketed by first-activity day
    (cohort), counted on each later activity day as a day offset.

    Distinct (user, day) activity first collapses the event fan-in, the
    per-user cohort min is a second agg on the SAME user_id key (no new
    shuffle), and only the final (cohort, offset) count moves data again.
    """
    activity = events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


USER_RETENTION_COHORTS_SQL = """
WITH activity AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
cohort AS (
    SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
)
SELECT c.cohort_day,
       (a.day - c.cohort_day)::BIGINT AS day_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM activity a JOIN cohort c ON a.user_id = c.user_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# conversion funnel
# ---------------------------------------------------------------------------

def conversion_funnel(events: DataFrame) -> DataFrame:
    """Strictly-ordered view → click → purchase funnel: a user converts a
    stage only at-or-after converting the previous one. Three conditional
    min-windows over ONE user_id partitioning (one exchange, one sort),
    then a global single-row rollup."""
    w = Window.partitionBy("user_id")
    first_view = F.min(
        F.when(F.col("event_type") == FUNNEL_STAGES[0], F.col("ts"))
    ).over(w)
    df = events.withColumn("first_view", first_view)
    df = df.withColumn(
        "first_click",
        F.min(
            F.when(
                (F.col("event_type") == FUNNEL_STAGES[1])
                & (F.col("ts") >= F.col("first_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    df = df.withColumn(
        "first_purchase",
        F.min(
            F.when(
                (F.col("event_type") == FUNNEL_STAGES[2])
                & (F.col("ts") >= F.col("first_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = df.groupBy("user_id").agg(
        F.first("first_view").alias("first_view"),
        F.first("first_click").alias("first_click"),
        F.first("first_purchase").alias("first_purchase"),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("first_view").alias("n_viewed"),
        F.count("first_click").alias("n_clicked"),
        F.count("first_purchase").alias("n_purchased"),
        # try_divide: null (not an ANSI error) when nobody viewed — the
        # empty-batch shape an incremental run produces
        F.try_divide(
            F.count("first_purchase").cast("double"),
            F.count("first_view").cast("double"),
        ).alias("view_to_purchase_rate"),
    )


CONVERSION_FUNNEL_SQL = f"""
WITH v AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = '{FUNNEL_STAGES[0]}' THEN ts END)
               AS first_view
    FROM events GROUP BY user_id
),
c AS (
    SELECT e.user_id, MIN(e.ts) AS first_click
    FROM events e JOIN v ON v.user_id = e.user_id
    WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts >= v.first_view
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(e.ts) AS first_purchase
    FROM events e JOIN c ON c.user_id = e.user_id
    WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts >= c.first_click
    GROUP BY e.user_id
),
users AS (SELECT DISTINCT user_id FROM events)
SELECT COUNT(*) AS n_users,
       COUNT(v.first_view) AS n_viewed,
       COUNT(c.first_click) AS n_clicked,
       COUNT(p.first_purchase) AS n_purchased,
       COUNT(p.first_purchase)::DOUBLE / COUNT(v.first_view)::DOUBLE
           AS view_to_purchase_rate
FROM users u
LEFT JOIN v ON v.user_id = u.user_id
LEFT JOIN c ON c.user_id = u.user_id
LEFT JOIN p ON p.user_id = u.user_id
"""


# ---------------------------------------------------------------------------
# anomaly z-scores over daily genre plays
# ---------------------------------------------------------------------------

def genre_daily_anomalies(
    enriched: DataFrame,
    baseline_days: int = ANOMALY_BASELINE_DAYS,
    min_baseline: int = ANOMALY_MIN_BASELINE,
    z_threshold: float = ANOMALY_Z_THRESHOLD,
) -> DataFrame:
    """Per (genre, day): z-score of the play count against the trailing
    ``baseline_days`` OBSERVED days for that genre (current day EXCLUDED
    from its own baseline). The frame is ROWS-based over the genre's
    per-day series, so calendar gaps don't shrink the sample — a genre
    with sparse activity is scored against its last N active days, which
    may span more than N calendar days. For a strict-calendar baseline
    feed this from ``genre_daily_gapfilled`` (dense day spine) instead.

    The baseline mean/variance are rebuilt from exact integer window sums
    (n, Σx, Σx²) so both engines run the identical IEEE double expression
    — no dependence on a particular ``stddev`` implementation. z is
    rounded to 6 decimals BEFORE thresholding (the tie discipline every
    similarity operator here uses)."""
    daily = enriched.groupBy(
        "track_genre", F.col("timestamp").cast("date").alias("day")
    ).agg(F.count("*").alias("plays"))
    w = (
        Window.partitionBy("track_genre")
        .orderBy("day")
        .rowsBetween(-baseline_days, -1)
    )
    n = F.count("plays").over(w)
    s = F.sum("plays").over(w)
    ss = F.sum(F.col("plays") * F.col("plays")).over(w)
    mean = s.cast("double") / n
    var = (ss.cast("double") - n * mean * mean) / (n - 1)
    z_raw = (F.col("plays") - mean) / F.sqrt(var)
    scored = daily.select(
        "track_genre",
        "day",
        "plays",
        n.cast("long").alias("baseline_n"),
        F.when(
            (n >= min_baseline) & (var > 0), F.round(z_raw, 6)
        ).alias("z"),
    )
    return scored.withColumn(
        "is_anomaly",
        F.coalesce(F.abs(F.col("z")) > z_threshold, F.lit(False)),
    )


GENRE_DAILY_ANOMALIES_SQL = f"""
WITH enriched AS (
    SELECT event_type AS track_genre, CAST(ts AS DATE) AS day
    FROM events
),
daily AS (
    SELECT track_genre, day, COUNT(*) AS plays
    FROM enriched GROUP BY track_genre, day
),
stats AS (
    SELECT track_genre, day, plays,
           COUNT(plays) OVER w AS n,
           SUM(plays) OVER w AS s,
           SUM(plays * plays) OVER w AS ss
    FROM daily
    WINDOW w AS (PARTITION BY track_genre ORDER BY day
                 ROWS BETWEEN {ANOMALY_BASELINE_DAYS} PRECEDING
                          AND 1 PRECEDING)
),
scored AS (
    SELECT track_genre, day, plays,
           n::BIGINT AS baseline_n,
           CASE WHEN n >= {ANOMALY_MIN_BASELINE}
                     AND (ss::DOUBLE - n * (s::DOUBLE / n) * (s::DOUBLE / n))
                         / (n - 1) > 0
                THEN round(
                    (plays - s::DOUBLE / n)
                    / sqrt((ss::DOUBLE - n * (s::DOUBLE / n) * (s::DOUBLE / n))
                           / (n - 1)),
                    6)
           END AS z
    FROM stats
)
SELECT track_genre, day, plays, baseline_n, z,
       COALESCE(abs(z) > {ANOMALY_Z_THRESHOLD}, FALSE) AS is_anomaly
FROM scored
"""


# ---------------------------------------------------------------------------
# hierarchical multi-resolution rollup (continuous-aggregate cascade)
# ---------------------------------------------------------------------------

def events_rollup(events: DataFrame) -> DataFrame:
    """Hour/day/week event rollups as a cascade: hourly aggregates the raw
    scan ONCE; daily re-aggregates hourly; weekly re-aggregates daily.
    Each coarser resolution reads rows ≈ buckets of the finer one, so at
    100 TB the raw-data pass is paid exactly once. Value sums stay in
    DECIMAL through the cascade (re-aggregation is exact; one cast to
    double at the end)."""
    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("value_dec"),
    )
    # Materialize the hourly aggregate once: the three union branches are
    # separate plan trees, and Spark's exchange reuse does not fire across
    # them — without this the raw scan (the only big input) runs 3×.
    # Real continuous-aggregate stores persist this level anyway.
    hourly = hourly.localCheckpoint(eager=False)
    daily = hourly.groupBy(
        F.date_trunc("day", F.col("bucket_ts")).alias("bucket_ts")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("value_dec").alias("value_dec"),
    )
    weekly = daily.groupBy(
        F.date_trunc("week", F.col("bucket_ts")).alias("bucket_ts")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("value_dec").alias("value_dec"),
    )

    def out(df: DataFrame, resolution: str) -> DataFrame:
        return df.select(
            F.lit(resolution).alias("resolution"),
            "bucket_ts",
            "n_events",
            F.col("value_dec").cast("double").alias("value_sum"),
        )

    return (
        out(hourly, "hour")
        .unionByName(out(daily, "day"))
        .unionByName(out(weekly, "week"))
    )


EVENTS_ROLLUP_SQL = """
WITH hourly AS (
    SELECT date_trunc('hour', ts) AS bucket_ts,
           COUNT(*) AS n_events,
           SUM(CAST(value AS DECIMAL(28,6))) AS value_dec
    FROM events GROUP BY 1
),
daily AS (
    SELECT date_trunc('day', bucket_ts) AS bucket_ts,
           SUM(n_events) AS n_events, SUM(value_dec) AS value_dec
    FROM hourly GROUP BY 1
),
weekly AS (
    SELECT date_trunc('week', bucket_ts) AS bucket_ts,
           SUM(n_events) AS n_events, SUM(value_dec) AS value_dec
    FROM daily GROUP BY 1
)
SELECT 'hour' AS resolution, bucket_ts, n_events::BIGINT AS n_events,
       value_dec::DOUBLE AS value_sum FROM hourly
UNION ALL
SELECT 'day', bucket_ts, n_events::BIGINT, value_dec::DOUBLE FROM daily
UNION ALL
SELECT 'week', bucket_ts, n_events::BIGINT, value_dec::DOUBLE FROM weekly
"""


# ---------------------------------------------------------------------------
# track co-occurrence
# ---------------------------------------------------------------------------

def _coocc_width(enriched: DataFrame) -> int:
    """Size-adaptive width for the co-play self-join's keyed exchange
    (see the inline note at the repartition): derived from the enriched
    play stream's plan estimate, full parallelism when unknown."""
    from music_streaming_etl_glue_spark.operators.width import spread_width

    return spread_width(
        enriched.select("user_id", "timestamp", "track_id"),
        rows_per_task=2048,
    )


def cooccurrence_pairs(
    enriched: DataFrame,
    max_tracks_per_group: int = COOCCUR_MAX_TRACKS_PER_GROUP,
) -> DataFrame:
    """(track_a < track_b) pair INSTANCES, one per (user, day) co-play —
    the shared candidate generator for co-occurrence counting and the
    track graph. The per-(user, day) quadratic is bounded FIRST: each
    group keeps at most ``max_tracks_per_group`` distinct tracks
    (deterministically, the lowest track ids) before the pair self-join —
    a hot user contributes O(cap²) pairs, never O(plays²)."""
    plays = (
        enriched.filter(F.col("track_id").isNotNull())
        .select("user_id", F.col("timestamp").cast("date").alias("day"), "track_id")
        .distinct()
    )
    w = Window.partitionBy("user_id", "day").orderBy("track_id")
    capped = (
        plays.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_tracks_per_group)
        .drop("rn")
        # pin the self-join's exchange at cluster parallelism (guide
        # §2.5): the capped relation is BYTE-small, so AQE coalesces its
        # shuffle to one partition — but the O(cap²) pair fan-out happens
        # AFTER the shuffle read, and byte-based coalescing can't see it;
        # one task then expands every (user, day) group serially
        # (measured 25 s of single-core CPU at sf0.1). An explicit keyed
        # repartition is exempt from AQE coalescing and both join sides
        # reuse the one exchange.
        # (no checkpoint here: a LogicalRDD would report
        # UnknownPartitioning and the join would re-shuffle — and
        # re-coalesce — both sides; the bare repartition satisfies the
        # join's distribution and ReuseExchange dedups the two aliases)
        # r15: width size-adaptive from the play-event estimate (the
        # O(cap²) fan-out is per (user, day) group, so ~2k play rows per
        # task bound the expansion a task owns); unknown stats → full
        # parallelism, the r14 behavior
        .repartition(
            _coocc_width(enriched),
            "user_id",
            "day",
        )
    )
    a, b = capped.alias("a"), capped.alias("b")
    return a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.day") == F.col("b.day"))
        & (F.col("a.track_id") < F.col("b.track_id")),
    ).select(
        F.col("a.track_id").alias("track_a"),
        F.col("b.track_id").alias("track_b"),
    )


def track_cooccurrence(
    enriched: DataFrame,
    max_tracks_per_group: int = COOCCUR_MAX_TRACKS_PER_GROUP,
    top_k: int = COOCCUR_TOP_K,
) -> DataFrame:
    """Top-k track pairs co-played by the same user on the same day
    (see :func:`cooccurrence_pairs` for the bounded candidate step). The
    final top-k is an ``orderBy().limit()`` partial top-k."""
    pairs = cooccurrence_pairs(enriched, max_tracks_per_group)
    return (
        pairs.groupBy("track_a", "track_b")
        .agg(F.count("*").alias("n_cooccur"))
        .orderBy(
            F.col("n_cooccur").desc(),
            F.col("track_a").asc(),
            F.col("track_b").asc(),
        )
        .limit(top_k)
    )


#: Shared CTE chain ending in `pairs(track_a, track_b)` pair instances —
#: the SQL twin of :func:`cooccurrence_pairs`.
COOCCUR_PAIRS_CTES = f"""plays AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS track_id
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
),
capped AS (
    SELECT user_id, day, track_id
    FROM (
        SELECT user_id, day, track_id,
               row_number() OVER (PARTITION BY user_id, day
                                  ORDER BY track_id) AS rn
        FROM plays
    )
    WHERE rn <= {COOCCUR_MAX_TRACKS_PER_GROUP}
),
pairs AS (
    SELECT a.track_id AS track_a, b.track_id AS track_b
    FROM capped a
    JOIN capped b ON a.user_id = b.user_id AND a.day = b.day
                AND a.track_id < b.track_id
)"""

TRACK_COOCCURRENCE_SQL = f"""
WITH {COOCCUR_PAIRS_CTES}
SELECT track_a, track_b, COUNT(*) AS n_cooccur
FROM pairs
GROUP BY 1, 2
ORDER BY n_cooccur DESC, track_a ASC, track_b ASC
LIMIT {COOCCUR_TOP_K}
"""


# ---------------------------------------------------------------------------
# exact deterministic per-group sample
# ---------------------------------------------------------------------------

def sample_per_group(
    events: DataFrame, n_per_group: int = SAMPLE_PER_GROUP_N
) -> DataFrame:
    """Exactly-N-per-event-type sample, stable across reruns and
    repartitioning: rank by md5(event_id) (a uniform deterministic
    shuffle of each group) and keep the first N. Complements
    ``dedup.stratified_sample`` (shuffle-free FRACTIONAL sampling): use
    this when the contract is an exact count per group and groups are
    few; the rank window concentrates each group on one task, so it is
    NOT the tool for millions of groups of millions of rows."""
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        events.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= n_per_group)
        .select("event_id", "user_id", "event_type", "sample_rank")
    )


SAMPLE_PER_GROUP_SQL = f"""
SELECT event_id, user_id, event_type, sample_rank
FROM (
    SELECT event_id, user_id, event_type,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY md5(event_id::VARCHAR), event_id)
               AS sample_rank
    FROM events
)
WHERE sample_rank <= {SAMPLE_PER_GROUP_N}
"""


# ---------------------------------------------------------------------------
# set difference / window-rank coverage
# ---------------------------------------------------------------------------

def view_days_without_purchase(events: DataFrame) -> DataFrame:
    """(user, day) pairs with a view but no purchase — EXCEPT (set
    difference), planned by Catalyst as a left-anti hash aggregate join:
    two type-pruned scans, one shuffle each on the composite key."""
    def days(event_type: str) -> DataFrame:
        return events.filter(F.col("event_type") == event_type).select(
            "user_id", F.col("ts").cast("date").alias("day")
        )

    return days("view").distinct().subtract(days("purchase"))


VIEW_DAYS_WITHOUT_PURCHASE_SQL = """
SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
FROM events WHERE event_type = 'view'
EXCEPT
SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
FROM events WHERE event_type = 'purchase'
"""


def user_value_quartiles(
    events: DataFrame, buckets: int = 32
) -> DataFrame:
    """Users ranked into spend quartiles by exact total value — NTILE(4)
    semantics with a deterministic (total DESC, user_id) tiebreak, but
    WITHOUT the unpartitioned NTILE window (which funnels every user row
    through one task — a driver-scale bottleneck at 10^8 users).

    Two-level exact rank (same trick as
    :func:`~..dedup.rebalance_sources`): approx-percentile cutoffs split
    the value range into ``buckets`` monotone ranges (cutoffs stay in
    the plan via a broadcast crossJoin — no driver collect; ties share a
    bucket because bucketing compares values only), each bucket sorts
    its own slice in parallel, and the global rank is the broadcast
    cumulative bucket offset plus the local row_number. NTILE(4) is then
    pure arithmetic on (rank, n): the first n%4 quartiles take
    ceil(n/4) rows, the rest floor(n/4) — bit-identical to the window
    function, so the oracle keeps its ntile() form. Cutoff accuracy
    only affects bucket BALANCE, never the result. Scale knob: buckets
    ≈ total rows / target partition rows."""
    totals = events.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(28,6)"))
        .cast("double")
        .alias("total_value")
    )
    cuts = totals.agg(
        F.percentile_approx(
            "total_value",
            [i / buckets for i in range(1, buckets)],
            10_000,
        ).alias("__cuts")
    )
    bucketed = (
        totals.crossJoin(F.broadcast(cuts))
        .withColumn(
            "__b",
            F.size(
                F.filter("__cuts", lambda c: c > F.col("total_value"))
            ),
        )
        .drop("__cuts")
    )
    # metadata aggregate: ≤ `buckets` rows → cumulative offsets + total,
    # broadcast back. The prefix sum is a triangular self-join (≤
    # buckets² metadata rows), not an unpartitioned window — nothing
    # here ever funnels data rows through one task.
    bcounts = bucketed.groupBy("__b").agg(F.count("*").alias("bc"))
    total = F.broadcast(bcounts.agg(F.sum("bc").alias("n")))
    a, b = bcounts.alias("a"), bcounts.alias("b")
    offsets = (
        a.join(b, F.col("b.__b") < F.col("a.__b"), "left")
        .groupBy(F.col("a.__b").alias("__b"))
        .agg(F.coalesce(F.sum("b.bc"), F.lit(0)).alias("off"))
        .crossJoin(total)
    )
    w_local = Window.partitionBy("__b").orderBy(
        F.col("total_value").desc(), F.col("user_id").asc()
    )
    r = F.col("off") + F.row_number().over(w_local)
    base = F.floor(F.col("n") / 4).cast("long")
    rem = (F.col("n") % 4).cast("long")
    head = rem * (base + 1)  # rows covered by the ceil-sized quartiles
    quartile = F.when(
        r <= head, F.floor((r + base) / (base + 1))
    ).otherwise(rem + F.floor((r - head + base - 1) / base))
    return (
        bucketed.join(F.broadcast(offsets), "__b")
        .withColumn("quartile", quartile.cast("long"))
        .select("user_id", "total_value", "quartile")
    )


USER_VALUE_QUARTILES_SQL = """
WITH totals AS (
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
)
SELECT user_id, total_value,
       ntile(4) OVER (ORDER BY total_value DESC, user_id ASC)::BIGINT
           AS quartile
FROM totals
"""


def genre_daily_change(enriched: DataFrame) -> DataFrame:
    """Day-over-day play change per genre (LAG over the per-genre daily
    series — the window runs on aggregated rows, one small partition per
    genre). pct_change rounded to 6dp before comparison-stable output."""
    daily = enriched.groupBy(
        "track_genre", F.col("timestamp").cast("date").alias("day")
    ).agg(F.count("*").alias("plays"))
    w = Window.partitionBy("track_genre").orderBy("day")
    prev = F.lag("plays").over(w)
    return daily.select(
        "track_genre",
        "day",
        "plays",
        prev.alias("prev_plays"),
        F.round(
            (F.col("plays") - prev).cast("double") / prev, 6
        ).alias("pct_change"),
    )


GENRE_DAILY_CHANGE_SQL = """
WITH daily AS (
    SELECT event_type AS track_genre, CAST(ts AS DATE) AS day,
           COUNT(*) AS plays
    FROM events GROUP BY 1, 2
)
SELECT track_genre, day, plays,
       lag(plays) OVER w AS prev_plays,
       round((plays - lag(plays) OVER w)::DOUBLE / lag(plays) OVER w, 6)
           AS pct_change
FROM daily
WINDOW w AS (PARTITION BY track_genre ORDER BY day)
"""


def daily_activity_full(events: DataFrame, orders: DataFrame) -> DataFrame:
    """FULL OUTER join of the two daily activity series (event stream vs
    order book) — the reconciliation shape: days present in either side
    survive, the other side's measures null. Both inputs are aggregated
    to day grain BEFORE the join, so the full-outer shuffle carries one
    row per day per side."""
    e = events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n_events")
    )
    o = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count("*").alias("n_orders")
    )
    return (
        e.join(o, "day", "full_outer")
        .select("day", "n_events", "n_orders")
    )


DAILY_ACTIVITY_FULL_SQL = """
WITH e AS (
    SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
    FROM events GROUP BY 1
),
o AS (
    SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders
    FROM orders GROUP BY 1
)
SELECT COALESCE(e.day, o.day) AS day, e.n_events, o.n_orders
FROM e FULL OUTER JOIN o ON e.day = o.day
"""


def view_purchase_days(events: DataFrame) -> DataFrame:
    """(user, day) pairs with BOTH a view and a purchase — INTERSECT
    (the EXCEPT query's complement), a left-semi hash join over two
    type-pruned distinct scans."""
    def days(event_type: str) -> DataFrame:
        return events.filter(F.col("event_type") == event_type).select(
            "user_id", F.col("ts").cast("date").alias("day")
        )

    return days("view").intersect(days("purchase"))


VIEW_PURCHASE_DAYS_SQL = """
SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
FROM events WHERE event_type = 'view'
INTERSECT
SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
FROM events WHERE event_type = 'purchase'
"""


def user_first_last_event(events: DataFrame) -> DataFrame:
    """Each user's first and last event (type + value) by (ts, event_id)
    order — first_value/last_value over one user partitioning with an
    unbounded frame; both edges come from the SAME sort, one shuffle."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        events.select(
            "user_id",
            F.first_value("event_type").over(w).alias("first_type"),
            F.first_value("value").over(w).alias("first_value"),
            F.last_value("event_type").over(w).alias("last_type"),
            F.last_value("value").over(w).alias("last_value"),
        )
        .distinct()
    )


USER_FIRST_LAST_EVENT_SQL = """
SELECT DISTINCT user_id,
       first_value(event_type) OVER w AS first_type,
       first_value(value) OVER w AS first_value,
       last_value(event_type) OVER w AS last_type,
       last_value(value) OVER w AS last_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def genre_daily_gapfilled(enriched: DataFrame) -> DataFrame:
    """Dense per-genre daily play series: days with no plays appear with
    plays = 0 (the gap-filling every moving-average/anomaly consumer
    needs before trusting a window frame).

    The fact plan is scanned ONCE: bounds and the genre set both derive
    from the aggregated ``daily`` frame (re-deriving them from
    ``enriched`` would re-run the star join per branch). Rows with a
    NULL genre or NULL timestamp are excluded up front — a NULL spine
    key would never join back to its own counts (non-null-safe equality
    on both engines), silently reporting 0 for days that had plays."""
    daily = (
        enriched.filter(
            F.col("track_genre").isNotNull()
            & F.col("timestamp").isNotNull()
        )
        .groupBy(
            "track_genre", F.col("timestamp").cast("date").alias("day")
        )
        .agg(F.count("*").alias("plays"))
        .localCheckpoint(eager=False)  # feeds spine, genres, AND the join
    )
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    calendar = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    genres = daily.select("track_genre").distinct()
    grid = genres.crossJoin(F.broadcast(calendar))
    return (
        grid.join(daily, ["track_genre", "day"], "left")
        .select(
            "track_genre",
            "day",
            F.coalesce("plays", F.lit(0)).alias("plays"),
        )
    )


GENRE_DAILY_GAPFILLED_SQL = """
WITH daily AS (
    SELECT event_type AS track_genre, CAST(ts AS DATE) AS day,
           COUNT(*) AS plays
    FROM events
    WHERE event_type IS NOT NULL AND ts IS NOT NULL
    GROUP BY 1, 2
),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
calendar AS (
    SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
        AS day
    FROM bounds
),
genres AS (SELECT DISTINCT track_genre FROM daily)
SELECT g.track_genre, c.day, COALESCE(d.plays, 0) AS plays
FROM genres g
CROSS JOIN calendar c
LEFT JOIN daily d ON d.track_genre = g.track_genre AND d.day = c.day
"""


# ---------------------------------------------------------------------------
# per-group mode (deterministic tiebreak)
# ---------------------------------------------------------------------------

def favorite_track_per_user(enriched: DataFrame) -> DataFrame:
    """Per-user modal track (most-played; ties broken by smaller
    track_id) with its play count — the grouped MODE shape. Built-in
    ``mode()`` is tie-nondeterministic in both engines, so the portable
    form is count + one rank window sharing the count shuffle's
    partitioning; the window partition is one user's distinct tracks,
    never raw plays."""
    counts = (
        enriched.filter(F.col("track_id").isNotNull())
        .groupBy("user_id", "track_id")
        .agg(F.count("*").alias("n_plays"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n_plays").desc(), F.col("track_id").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "track_id", "n_plays")
    )


FAVORITE_TRACK_SQL = """
WITH plays AS (
    SELECT user_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS track_id
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
),
counts AS (
    SELECT user_id, track_id, COUNT(*) AS n_plays
    FROM plays GROUP BY user_id, track_id
)
SELECT user_id, track_id, n_plays
FROM (
    SELECT user_id, track_id, n_plays,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY n_plays DESC, track_id ASC) AS rn
    FROM counts
)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# exponential time-decay popularity
# ---------------------------------------------------------------------------

DECAY_HALF_LIFE_H = 24.0
DECAY_TOP_K = 50


def track_decay_scores(
    enriched: DataFrame,
    half_life_h: float = DECAY_HALF_LIFE_H,
    top_k: int = DECAY_TOP_K,
) -> DataFrame:
    """Top-k tracks by exponentially time-decayed play score: each play
    contributes 2^(−age_hours/half_life), aged against the corpus'
    latest event (a deterministic "now", so the query replays
    identically). One aggregate — decayed sums are algebraic, so the
    map-side combine does most of the work and the shuffle carries one
    partial per (track, partition); the decay kernel beats sliding
    windows at 100 TB because NO per-play state or window frame exists.
    Scores round to 6dp (summation order) before ranking."""
    latest = F.broadcast(enriched.agg(F.max("timestamp").alias("__latest")))
    plays = (
        enriched.filter(F.col("track_id").isNotNull())
        .crossJoin(latest)
        .withColumn(
            "age_h",
            (
                F.unix_timestamp("__latest") - F.unix_timestamp("timestamp")
            ).cast("double")
            / 3600.0,
        )
    )
    # per-play contributions snapped to 12dp and summed as exact decimal
    # (the pagerank discipline): partition-count-independent AND
    # bit-identical to the oracle's sequential sum
    contrib = F.round(
        F.pow(F.lit(2.0), -F.col("age_h") / half_life_h), 12
    ).cast("decimal(38,12)")
    return (
        plays.groupBy("track_id")
        .agg(
            F.round(F.sum(contrib).cast("double"), 6).alias("decay_score"),
            F.count("*").alias("n_plays"),
        )
        .orderBy(F.col("decay_score").desc(), F.col("track_id").asc())
        .limit(top_k)
    )


TRACK_DECAY_SCORES_SQL = f"""
WITH latest AS (
    SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS latest_s FROM events
),
plays AS (
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS track_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
),
scored AS (
    SELECT track_id,
           round(CAST(SUM(CAST(round(
               pow(2.0, -(((latest_s - ts_s)::DOUBLE) / 3600.0)
                            / {DECAY_HALF_LIFE_H}),
               12) AS DECIMAL(38,12))) AS DOUBLE), 6) AS decay_score,
           COUNT(*) AS n_plays
    FROM plays, latest
    GROUP BY track_id
)
SELECT track_id, decay_score, n_plays
FROM scored
ORDER BY decay_score DESC, track_id ASC
LIMIT {DECAY_TOP_K}
"""


# ---------------------------------------------------------------------------
# item-item similarity (cosine-normalized co-occurrence)
# ---------------------------------------------------------------------------

def track_similarity(
    enriched: DataFrame,
    max_tracks_per_group: int = COOCCUR_MAX_TRACKS_PER_GROUP,
    top_k: int = COOCCUR_TOP_K,
) -> DataFrame:
    """Top-k "users who played X also played Y" pairs, cosine-normalized:
    sim(a,b) = cooccur(a,b) / √(n_a·n_b) over (user, day) play groups —
    raw co-occurrence counts rank hub tracks first; the normalization is
    what makes the score a similarity. Same bounded pair generator as
    :func:`track_cooccurrence` (the cap, not the join, bounds hot
    groups); per-track group counts are one extra slim aggregate joined
    into the pair counts (no broadcast hint — the item catalog scales,
    AQE picks the strategy). Rounded to 6dp before ranking."""
    plays = (
        enriched.filter(F.col("track_id").isNotNull())
        .select(
            "user_id", F.col("timestamp").cast("date").alias("day"), "track_id"
        )
        .distinct()
    )
    w = Window.partitionBy("user_id", "day").orderBy("track_id")
    capped = (
        plays.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_tracks_per_group)
        .drop("rn")
        .localCheckpoint(eager=False)
    )
    a, b = capped.alias("a"), capped.alias("b")
    pair_counts = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.track_id") < F.col("b.track_id")),
        )
        .groupBy(
            F.col("a.track_id").alias("track_a"),
            F.col("b.track_id").alias("track_b"),
        )
        .agg(F.count("*").alias("n_cooccur"))
    )
    # per-item group counts: scales with the ITEM CATALOG, not a bounded
    # dimension — no broadcast hint; AQE broadcasts while it fits and
    # falls back to a keyed shuffle join when the catalog outgrows it
    deg = capped.groupBy("track_id").agg(F.count("*").alias("n_groups"))
    sim = F.round(
        F.col("n_cooccur")
        / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")),
        6,
    )
    return (
        pair_counts.join(
            deg.select(
                F.col("track_id").alias("track_a"),
                F.col("n_groups").alias("na"),
            ),
            "track_a",
        )
        .join(
            deg.select(
                F.col("track_id").alias("track_b"),
                F.col("n_groups").alias("nb"),
            ),
            "track_b",
        )
        .select("track_a", "track_b", sim.alias("similarity"), "n_cooccur")
        .orderBy(
            F.col("similarity").desc(),
            F.col("track_a").asc(),
            F.col("track_b").asc(),
        )
        .limit(top_k)
    )


TRACK_SIMILARITY_SQL = f"""
WITH {COOCCUR_PAIRS_CTES},
pair_counts AS (
    SELECT track_a, track_b, COUNT(*) AS n_cooccur
    FROM pairs GROUP BY 1, 2
),
deg AS (SELECT track_id, COUNT(*) AS n_groups FROM capped GROUP BY track_id)
SELECT p.track_a, p.track_b,
       round(p.n_cooccur / sqrt(da.n_groups::DOUBLE * db.n_groups::DOUBLE), 6)
           AS similarity,
       p.n_cooccur
FROM pair_counts p
JOIN deg da ON da.track_id = p.track_a
JOIN deg db ON db.track_id = p.track_b
ORDER BY similarity DESC, p.track_a ASC, p.track_b ASC
LIMIT {COOCCUR_TOP_K}
"""


# ---------------------------------------------------------------------------
# time-series similarity (z-normalized correlation between daily series)
# ---------------------------------------------------------------------------

def _genre_daily_series(events: DataFrame) -> DataFrame:
    """(genre, xs): each genre's daily play counts as an ordered double
    array over the dense shared calendar (gap days 0) — one row per KEY,
    array length bounded by the calendar span. Shared by the correlation
    and DTW series operators."""
    daily = (
        events.filter(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
        .groupBy(
            F.col("event_type").alias("genre"),
            F.col("ts").cast("date").alias("day"),
        )
        .agg(F.count("*").alias("plays"))
    )
    bounds = F.broadcast(
        daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    )
    calendar = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    genres = daily.select("genre").distinct()
    dense = (
        genres.crossJoin(calendar)
        .join(daily, ["genre", "day"], "left")
        .select("genre", "day", F.coalesce("plays", F.lit(0)).alias("plays"))
    )
    return dense.groupBy("genre").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "plays"))),
            lambda t: t["plays"].cast("double"),
        ).alias("xs")
    )


def genre_series_similarity(events: DataFrame) -> DataFrame:
    """Pearson correlation between genres' daily play-count series over
    the dense shared calendar (gap days count 0) — the time-series
    similarity-search primitive ("which genres trend together"),
    pairwise over the genre dimension. Series are built as ordered
    arrays per genre (one row per KEY, length = #days — bounded by the
    calendar, not the data volume), so the pairwise join is dimension ×
    dimension, never event-scale; the z-normalization and dot are array
    folds. Correlations round to 6dp.

    At 100 TB the daily pre-aggregate is the only event-scale pass; for
    a HIGH-cardinality key (tracks, not genres) the quadratic pair join
    needs the same LSH-style screening as the embedding operators —
    which is exactly what treating each series array as an embedding
    row in ``cosine_pairs_lsh`` gives."""
    series = _genre_daily_series(events)
    a, b = series.alias("a"), series.alias("b")
    paired = a.join(b, F.col("a.genre") < F.col("b.genre")).select(
        F.col("a.genre").alias("genre_a"),
        F.col("b.genre").alias("genre_b"),
        F.col("a.xs").alias("xs"),
        F.col("b.xs").alias("ys"),
    )
    nn = F.size("xs").cast("double")
    mx = F.aggregate("xs", F.lit(0.0), lambda acc, x: acc + x) / nn
    my = F.aggregate("ys", F.lit(0.0), lambda acc, x: acc + x) / nn
    # the means land as bound columns before the deviation lambdas:
    # referencing the O(T) mean fold from inside transform/zip_with
    # re-evaluates it per element — O(T²) per pair (the winnowing lesson)
    pre = paired.select(
        "genre_a", "genre_b", "xs", "ys",
        mx.alias("__mx"), my.alias("__my"),
    )
    mxc, myc = F.col("__mx"), F.col("__my")
    sxx = F.aggregate(
        F.transform("xs", lambda x: (x - mxc) * (x - mxc)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    syy = F.aggregate(
        F.transform("ys", lambda y: (y - myc) * (y - myc)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sxy = F.aggregate(
        F.zip_with("xs", "ys", lambda x, y: (x - mxc) * (y - myc)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    corr = F.when(
        (sxx > 0) & (syy > 0), F.round(sxy / F.sqrt(sxx * syy), 6)
    ).otherwise(F.lit(None).cast("double"))
    return pre.select(
        "genre_a", "genre_b", corr.alias("correlation")
    ).orderBy("genre_a", "genre_b")


GENRE_SERIES_SIMILARITY_SQL = """
WITH daily AS (
    SELECT event_type AS genre, CAST(ts AS DATE) AS day, COUNT(*) AS plays
    FROM events
    WHERE event_type IS NOT NULL AND ts IS NOT NULL
    GROUP BY 1, 2
),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
calendar AS (
    SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
        AS day
    FROM bounds
),
genres AS (SELECT DISTINCT genre FROM daily),
dense AS (
    SELECT g.genre, c.day, COALESCE(d.plays, 0)::DOUBLE AS plays
    FROM genres g
    CROSS JOIN calendar c
    LEFT JOIN daily d ON d.genre = g.genre AND d.day = c.day
),
series AS (
    SELECT genre, list(plays ORDER BY day) AS xs FROM dense GROUP BY genre
),
paired AS (
    SELECT a.genre AS genre_a, b.genre AS genre_b, a.xs AS xs, b.xs AS ys
    FROM series a JOIN series b ON a.genre < b.genre
),
stats AS (
    SELECT genre_a, genre_b, xs, ys,
           len(xs)::DOUBLE AS n,
           list_sum(xs) / len(xs)::DOUBLE AS mx,
           list_sum(ys) / len(ys)::DOUBLE AS my
    FROM paired
),
moments AS (
    SELECT genre_a, genre_b,
           list_sum(list_transform(xs, x -> (x - mx) * (x - mx))) AS sxx,
           list_sum(list_transform(ys, y -> (y - my) * (y - my))) AS syy,
           list_sum(list_transform(list_zip(xs, ys),
                                   p -> (p[1] - mx) * (p[2] - my)))
               AS sxy
    FROM stats
)
SELECT genre_a, genre_b,
       CASE WHEN sxx > 0 AND syy > 0
            THEN round(sxy / sqrt(sxx * syy), 6) END AS correlation
FROM moments
ORDER BY genre_a, genre_b
"""


# ---------------------------------------------------------------------------
# dynamic time warping (elastic series distance — Python DP territory)
# ---------------------------------------------------------------------------

DTW_BAND = 7  # Sakoe-Chiba band half-width (days)


def genre_series_dtw(events: DataFrame, band: int = DTW_BAND) -> DataFrame:
    """DTW distance between genres' z-normalized daily play series — the
    elastic-alignment complement of :func:`genre_series_similarity`
    (correlation is rigid in time; DTW matches shifted/warped shapes).
    The quadratic DP with a Sakoe-Chiba band is genuinely inexpressible
    as SQL/DataFrame expressions, so this is the one place in the
    time-series family that drops to Python — Arrow-batched
    ``mapInPandas`` over the (dimension × dimension) pair relation, one
    O(n·band) DP per pair, never per event. No SQL oracle (recursive
    DP); the pytest pins it to a pure-Python reference implementation
    exactly."""
    import math

    import pandas as pd

    series = _genre_daily_series(events)
    a, b = series.alias("a"), series.alias("b")
    paired = a.join(b, F.col("a.genre") < F.col("b.genre")).select(
        F.col("a.genre").alias("genre_a"),
        F.col("b.genre").alias("genre_b"),
        F.col("a.xs").alias("xs"),
        F.col("b.xs").alias("ys"),
    )

    def znorm(v):
        n = len(v)
        m = sum(v) / n
        var = sum((x - m) ** 2 for x in v) / n
        s = math.sqrt(var)
        return [(x - m) / s for x in v] if s > 0 else [0.0] * n

    def dtw(x, y, w):
        n = len(x)
        inf = float("inf")
        prev = [inf] * (n + 1)
        prev[0] = 0.0
        for i in range(1, n + 1):
            cur = [inf] * (n + 1)
            lo, hi = max(1, i - w), min(n, i + w)
            for j in range(lo, hi + 1):
                c = (x[i - 1] - y[j - 1]) ** 2
                cur[j] = c + min(prev[j], cur[j - 1], prev[j - 1])
            prev = cur
        return math.sqrt(prev[n])

    def compute(batches):
        for pdf in batches:
            out = pdf[["genre_a", "genre_b"]].copy()
            out["dtw_distance"] = [
                round(dtw(znorm(list(x)), znorm(list(y)), band), 6)
                for x, y in zip(pdf["xs"], pdf["ys"])
            ]
            yield out

    return paired.mapInPandas(
        compute, "genre_a string, genre_b string, dtw_distance double"
    ).orderBy("genre_a", "genre_b")


def genre_series_dtw_audit(
    events: DataFrame, band: int = DTW_BAND, tol: float = 1e-6
) -> DataFrame:
    """Bounded driver check for :func:`genre_series_dtw` (r12 audit-form
    discipline): the banded DP itself has no SQL twin, but its
    STRUCTURE does — per genre pair the audit emits the exact series
    length (the dense shared calendar span, SQL-reproducible) plus two
    flags the oracle asserts TRUE: ``dtw_nonneg`` (costs are squares)
    and ``dtw_le_diagonal`` — DTW minimizes over warping paths that
    include the identity alignment, so the distance can never exceed
    the plain Euclidean distance of the z-normalized series. A DP that
    under-fills, over-counts, or mis-bands breaks one of the two."""
    import math

    import pandas as pd

    series = _genre_daily_series(events)
    a, b = series.alias("a"), series.alias("b")
    paired = a.join(b, F.col("a.genre") < F.col("b.genre")).select(
        F.col("a.genre").alias("genre_a"),
        F.col("b.genre").alias("genre_b"),
        F.col("a.xs").alias("xs"),
        F.col("b.xs").alias("ys"),
    )
    base = genre_series_dtw(events, band).withColumnRenamed(
        "dtw_distance", "d"
    )

    def audit(batches):
        def znorm(v):
            n = len(v)
            m = sum(v) / n
            var = sum((x - m) ** 2 for x in v) / n
            s = math.sqrt(var)
            return [(x - m) / s for x in v] if s > 0 else [0.0] * n

        for pdf in batches:
            out = pdf[["genre_a", "genre_b"]].copy()
            diag, n_days = [], []
            for x, y in zip(pdf["xs"], pdf["ys"]):
                zx, zy = znorm(list(x)), znorm(list(y))
                diag.append(
                    math.sqrt(sum((p - q) ** 2 for p, q in zip(zx, zy)))
                )
                n_days.append(len(x))
            out["diagonal_cost"] = diag
            out["n_days"] = n_days
            yield out

    diag = paired.mapInPandas(
        audit,
        "genre_a string, genre_b string, diagonal_cost double,"
        " n_days long",
    )
    return (
        base.join(diag, ["genre_a", "genre_b"])
        .select(
            "genre_a",
            "genre_b",
            "n_days",
            (F.col("d") >= -tol).alias("dtw_nonneg"),
            (F.col("d") <= F.col("diagonal_cost") + tol).alias(
                "dtw_le_diagonal"
            ),
        )
        .orderBy("genre_a", "genre_b")
    )


GENRE_SERIES_DTW_AUDIT_SQL = """
WITH d AS (
    SELECT event_type AS genre, CAST(ts AS DATE) AS day
    FROM events
    WHERE event_type IS NOT NULL AND ts IS NOT NULL
),
span AS (
    SELECT (date_diff('day', MIN(day), MAX(day)) + 1)::BIGINT AS n FROM d
),
g AS (SELECT DISTINCT genre FROM d)
SELECT a.genre AS genre_a, b.genre AS genre_b,
       (SELECT n FROM span) AS n_days,
       TRUE AS dtw_nonneg,
       TRUE AS dtw_le_diagonal
FROM g a JOIN g b ON a.genre < b.genre
"""


# ---------------------------------------------------------------------------
# rolling active users (DAU / trailing-window WAU)
# ---------------------------------------------------------------------------

WAU_WINDOW_DAYS = 7


def rolling_active_users(
    events: DataFrame, window_days: int = WAU_WINDOW_DAYS
) -> DataFrame:
    """Per calendar day: distinct active users that day (DAU) and over
    the trailing ``window_days`` (WAU) — the engagement staple. Exact
    form: the slim distinct (user, day) activity relation fans out to
    the ≤``window_days`` later spine days it contributes to (a
    generate+join, ×7 on a 2-column relation), then one distinct-count
    per day. Day gaps inside the observed range still get a row (the
    spine is the dense calendar); trailing windows at the range start
    simply cover fewer days.

    At 100 TB the exact fan-out is still fine (it scales with DISTINCT
    (user, day), not events) — but the mergeable path is better: keep
    one HLL sketch per day (genre_distinct_sketch_rollup pattern) and
    union any trailing window without touching activity again."""
    activity = (
        events.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    bounds = F.broadcast(
        activity.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    )
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    dau = activity.groupBy("day").agg(
        F.countDistinct("user_id").alias("dau")
    )
    contrib = activity.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"), F.date_add(F.col("day"), window_days - 1)
            )
        ).alias("day"),
    )
    wau = (
        contrib.groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        spine.join(dau, "day", "left")
        .join(wau, "day", "left")
        .select(
            "day",
            F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
            F.coalesce("wau", F.lit(0)).cast("long").alias("wau"),
        )
        .orderBy("day")
    )


ROLLING_ACTIVE_USERS_SQL = f"""
WITH activity AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM activity),
spine AS (
    SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
        AS day
    FROM bounds
),
dau AS (
    SELECT day, COUNT(DISTINCT user_id) AS dau FROM activity GROUP BY day
),
contrib AS (
    SELECT a.user_id,
           CAST(unnest(generate_series(
               a.day, a.day + INTERVAL {WAU_WINDOW_DAYS - 1} DAY,
               INTERVAL 1 DAY)) AS DATE) AS day
    FROM activity a
),
wau AS (
    SELECT day, COUNT(DISTINCT user_id) AS wau FROM contrib GROUP BY day
)
SELECT s.day,
       COALESCE(d.dau, 0)::BIGINT AS dau,
       COALESCE(w.wau, 0)::BIGINT AS wau
FROM spine s
LEFT JOIN dau d ON d.day = s.day
LEFT JOIN wau w ON w.day = s.day
ORDER BY s.day
"""


def power_user_curve(events: DataFrame) -> DataFrame:
    """Engagement distribution ("L30 curve"): for n = 1..max, how many
    users were active exactly n distinct days in the observed range. Two
    chained aggregates on slim keys — (user, day) distinct, per-user day
    count, then the count-of-counts — classic retention health check
    read together with :func:`rolling_active_users`."""
    activity = (
        events.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    per_user = activity.groupBy("user_id").agg(
        F.count("*").alias("days_active")
    )
    return (
        per_user.groupBy("days_active")
        .agg(F.count("*").alias("n_users"))
        .orderBy("days_active")
    )


POWER_USER_CURVE_SQL = """
WITH activity AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
per_user AS (
    SELECT user_id, COUNT(*) AS days_active FROM activity GROUP BY user_id
)
SELECT days_active, COUNT(*) AS n_users
FROM per_user
GROUP BY days_active
ORDER BY days_active
"""


# ---------------------------------------------------------------------------
# association rules (support / confidence / lift over co-play baskets)
# ---------------------------------------------------------------------------

RULES_MIN_COOCCUR = 3
RULES_TOP_K = 100


def track_association_rules(
    enriched: DataFrame,
    max_tracks_per_group: int = COOCCUR_MAX_TRACKS_PER_GROUP,
    min_cooccur: int = RULES_MIN_COOCCUR,
    top_k: int = RULES_TOP_K,
) -> DataFrame:
    """Directed association rules a→b over (user, day) co-play baskets:
    support = P(a,b), confidence = P(b|a), lift = P(a,b)/(P(a)·P(b)) —
    the market-basket classic, on the same bounded pair generator as
    :func:`track_cooccurrence` (both rule directions come from one
    canonical a<b pair count — no second join). Baskets are (user, day)
    groups; item frequencies are one slim aggregate broadcast into the
    pair counts. Ratios round to 6dp; min-support pruning keeps the
    rule set honest (singleton pairs produce lift noise)."""
    plays = (
        enriched.filter(F.col("track_id").isNotNull())
        .select(
            "user_id", F.col("timestamp").cast("date").alias("day"), "track_id"
        )
        .distinct()
    )
    w = Window.partitionBy("user_id", "day").orderBy("track_id")
    capped = (
        plays.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_tracks_per_group)
        .drop("rn")
        .localCheckpoint(eager=False)
    )
    n_baskets = F.broadcast(
        capped.select("user_id", "day").distinct().agg(
            F.count("*").alias("n_baskets")
        )
    )
    a, b = capped.alias("a"), capped.alias("b")
    pair_counts = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.track_id") < F.col("b.track_id")),
        )
        .groupBy(
            F.col("a.track_id").alias("track_a"),
            F.col("b.track_id").alias("track_b"),
        )
        .agg(F.count("*").alias("n_cooccur"))
        .filter(F.col("n_cooccur") >= min_cooccur)
    )
    # item frequencies scale with the catalog — no broadcast hint (AQE
    # decides); see track_similarity's deg join for the same reasoning
    freq = capped.groupBy("track_id").agg(F.count("*").alias("n_item"))
    fa = freq.select(
        F.col("track_id").alias("track_a"), F.col("n_item").alias("na")
    )
    fb = freq.select(
        F.col("track_id").alias("track_b"), F.col("n_item").alias("nb")
    )
    joined = pair_counts.join(fa, "track_a").join(fb, "track_b").crossJoin(
        n_baskets
    )
    # both rule directions from the single canonical pair relation
    ab = joined.select(
        F.col("track_a").alias("antecedent"),
        F.col("track_b").alias("consequent"),
        "n_cooccur",
        F.col("na").alias("n_ante"),
        F.col("nb").alias("n_cons"),
        "n_baskets",
    )
    ba = joined.select(
        F.col("track_b").alias("antecedent"),
        F.col("track_a").alias("consequent"),
        "n_cooccur",
        F.col("nb").alias("n_ante"),
        F.col("na").alias("n_cons"),
        "n_baskets",
    )
    rules = ab.unionByName(ba).select(
        "antecedent",
        "consequent",
        "n_cooccur",
        F.round(F.col("n_cooccur") / F.col("n_baskets"), 6).alias("support"),
        F.round(F.col("n_cooccur") / F.col("n_ante"), 6).alias("confidence"),
        F.round(
            F.col("n_cooccur").cast("double")
            * F.col("n_baskets")
            / (F.col("n_ante").cast("double") * F.col("n_cons")),
            6,
        ).alias("lift"),
    )
    return rules.orderBy(
        F.col("lift").desc(),
        F.col("antecedent").asc(),
        F.col("consequent").asc(),
    ).limit(top_k)


TRACK_ASSOCIATION_RULES_SQL = f"""
WITH {COOCCUR_PAIRS_CTES},
n_baskets AS (
    SELECT COUNT(*) AS n_baskets
    FROM (SELECT DISTINCT user_id, day FROM capped)
),
pair_counts AS (
    SELECT track_a, track_b, COUNT(*) AS n_cooccur
    FROM pairs GROUP BY 1, 2
    HAVING COUNT(*) >= {RULES_MIN_COOCCUR}
),
freq AS (SELECT track_id, COUNT(*) AS n_item FROM capped GROUP BY track_id),
joined AS (
    SELECT p.track_a, p.track_b, p.n_cooccur,
           fa.n_item AS na, fb.n_item AS nb, n.n_baskets
    FROM pair_counts p
    JOIN freq fa ON fa.track_id = p.track_a
    JOIN freq fb ON fb.track_id = p.track_b
    CROSS JOIN n_baskets n
),
rules AS (
    SELECT track_a AS antecedent, track_b AS consequent, n_cooccur,
           na AS n_ante, nb AS n_cons, n_baskets FROM joined
    UNION ALL
    SELECT track_b, track_a, n_cooccur, nb, na, n_baskets FROM joined
)
SELECT antecedent, consequent, n_cooccur,
       round(n_cooccur / n_baskets, 6) AS support,
       round(n_cooccur / n_ante, 6) AS confidence,
       round(n_cooccur::DOUBLE * n_baskets / (n_ante::DOUBLE * n_cons), 6)
           AS lift
FROM rules
ORDER BY lift DESC, antecedent ASC, consequent ASC
LIMIT {RULES_TOP_K}
"""


# ---------------------------------------------------------------------------
# session transition matrix (first-order Markov chain over event types)
# ---------------------------------------------------------------------------

TRANSITION_GAP_SECONDS = 1800


def session_transition_matrix(
    events: DataFrame, gap_s: int = TRANSITION_GAP_SECONDS
) -> DataFrame:
    """First-order Markov transition matrix over event types within user
    sessions (30-min idle gap): for every (from_type, to_type) pair of
    CONSECUTIVE events in the same session, the transition count and the
    row-normalized probability. The product-analytics 'what do users do
    next' primitive, and the input to Markov attribution / next-action
    models.

    One shuffle total: ``lead`` over the (user_id)-partitioned window
    yields the next event AND its gap, and a transition is kept only
    when that gap stays inside the session cutoff — sessionization never
    materializes a session id, so no second exchange on (user, session).
    The transition aggregate's key space is |event types|² (~25 rows);
    its normalizing row totals ride a window over that tiny aggregate.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")
    pairs = (
        events.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
            gap.alias("gap"),
        )
        .filter(F.col("to_type").isNotNull() & (F.col("gap") <= gap_s))
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    row_total = F.sum("n_transitions").over(
        Window.partitionBy("from_type")
    )
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(F.col("n_transitions") / row_total, 6).alias("p"),
    )


SESSION_TRANSITION_MATRIX_SQL = f"""
WITH pairs AS (
    SELECT event_type AS from_type,
           lead(event_type) OVER w AS to_type,
           CAST(floor(epoch(lead(ts) OVER w)) AS BIGINT)
               - CAST(floor(epoch(ts)) AS BIGINT) AS gap
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
counts AS (
    SELECT from_type, to_type, COUNT(*) AS n_transitions
    FROM pairs
    WHERE to_type IS NOT NULL AND gap <= {TRANSITION_GAP_SECONDS}
    GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions,
       round(n_transitions / SUM(n_transitions) OVER (PARTITION BY from_type),
             6) AS p
FROM counts
"""


# ---------------------------------------------------------------------------
# gap-fill with linear interpolation (timeseries resample: locf + interp)
# ---------------------------------------------------------------------------


def events_hourly_interpolated(events: DataFrame) -> DataFrame:
    """Per-event-type hourly resample of ``value`` with LINEAR
    INTERPOLATION between surrounding observations (plus locf/backfill
    at the edges) — the timeseries-store gap-fill that
    ``genre_daily_gapfilled``'s zero-fill is not: a sensor that reports
    9.8 at 10:59 and 10.2 at 12:01 reads ~10 at 11:00 and 12:00, not 0.

    Shape: the hourly spine (calendar-bounded) unions with the per-
    (type, µs) observation aggregate; ONE (type)-keyed window pass
    derives both neighbors with IGNORE NULLS ``last``/``first`` — no
    as-of join, no per-grid-point probe. ``basis`` says how each cell
    was produced (exact / interp / locf / backfill), so downstream
    consumers can weight filled cells differently. At 100 TB the sort
    is per type over (observations + grid); if one type outgrows its
    sort, range-bucket by day and stitch bucket boundaries with one
    metadata pass (the `rebalance_sources` two-level discipline).

    Determinism: simultaneous observations pre-aggregate to their
    decimal-exact mean before the window, so neighbor values never
    depend on row order; interpolation arithmetic runs on BIGINT
    microseconds through one IEEE expression in both engines."""
    ts = F.col("ts").cast("timestamp")
    us = F.unix_micros(ts)
    obs = (
        events.filter(F.col("value").isNotNull())
        .groupBy("event_type", us.alias("us"))
        .agg(
            (
                F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
                / F.count("*")
            ).alias("v")
        )
        .select(
            "event_type",
            "us",
            "v",
            F.lit(0).alias("is_grid"),
        )
    )
    bounds = F.broadcast(
        events.filter(F.col("value").isNotNull()).agg(
            F.date_trunc("hour", F.min(ts)).alias("hmin"),
            F.date_trunc("hour", F.max(ts)).alias("hmax"),
        )
    )
    types = events.select("event_type").distinct()
    grid = (
        types.crossJoin(bounds)
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.col("hmin"), F.col("hmax"), F.expr("interval 1 hour")
                )
            ).alias("hour"),
        )
        .select(
            "event_type",
            F.unix_micros(F.col("hour")).alias("us"),
            F.lit(None).cast("double").alias("v"),
            F.lit(1).alias("is_grid"),
        )
    )
    u = obs.unionByName(grid)
    w = Window.partitionBy("event_type").orderBy("us", "is_grid")
    w_prev = w.rowsBetween(Window.unboundedPreceding, 0)
    w_next = w.rowsBetween(0, Window.unboundedFollowing)
    prev_v = F.last("v", ignorenulls=True).over(w_prev)
    prev_t = F.last(
        F.when(F.col("v").isNotNull(), F.col("us")), ignorenulls=True
    ).over(w_prev)
    next_v = F.first("v", ignorenulls=True).over(w_next)
    next_t = F.first(
        F.when(F.col("v").isNotNull(), F.col("us")), ignorenulls=True
    ).over(w_next)
    both = prev_v.isNotNull() & next_v.isNotNull() & (next_t > prev_t)
    interp = prev_v + (next_v - prev_v) * (
        (F.col("us") - prev_t).cast("double")
        / (next_t - prev_t).cast("double")
    )
    value = (
        F.when(prev_t == F.col("us"), prev_v)
        .when(both, interp)
        .when(prev_v.isNotNull(), prev_v)
        .otherwise(next_v)
    )
    basis = (
        F.when(prev_t == F.col("us"), F.lit("exact"))
        .when(both, F.lit("interp"))
        .when(prev_v.isNotNull(), F.lit("locf"))
        .otherwise(F.lit("backfill"))
    )
    return (
        u.select(
            "event_type",
            "us",
            "is_grid",
            F.round(value, 6).alias("value"),
            basis.alias("basis"),
        )
        .filter(F.col("is_grid") == 1)
        .select(
            "event_type",
            F.timestamp_micros(F.col("us")).alias("hour"),
            "value",
            "basis",
        )
    )


EVENTS_HOURLY_INTERPOLATED_SQL = """
WITH obs AS (
    SELECT event_type, epoch_us(ts) AS us,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS v,
           0 AS is_grid
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type, epoch_us(ts)
),
bounds AS (
    SELECT date_trunc('hour', MIN(ts)) AS hmin,
           date_trunc('hour', MAX(ts)) AS hmax
    FROM events WHERE value IS NOT NULL
),
grid AS (
    SELECT t.event_type,
           epoch_us(unnest(generate_series(b.hmin, b.hmax,
                                           INTERVAL 1 HOUR))) AS us,
           NULL::DOUBLE AS v,
           1 AS is_grid
    FROM (SELECT DISTINCT event_type FROM events) t, bounds b
),
u AS (SELECT * FROM obs UNION ALL SELECT * FROM grid),
derived AS (
    SELECT event_type, us, is_grid,
           last_value(v IGNORE NULLS) OVER w_prev AS prev_v,
           last_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS)
               OVER w_prev AS prev_t,
           first_value(v IGNORE NULLS) OVER w_next AS next_v,
           first_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS)
               OVER w_next AS next_t
    FROM u
    WINDOW
      w_prev AS (PARTITION BY event_type ORDER BY us, is_grid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_next AS (PARTITION BY event_type ORDER BY us, is_grid
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type,
       make_timestamp(us) AS hour,
       round(CASE
           WHEN prev_t = us THEN prev_v
           WHEN prev_v IS NOT NULL AND next_v IS NOT NULL AND next_t > prev_t
               THEN prev_v + (next_v - prev_v)
                    * ((us - prev_t)::DOUBLE / (next_t - prev_t)::DOUBLE)
           WHEN prev_v IS NOT NULL THEN prev_v
           ELSE next_v END, 6) AS value,
       CASE
           WHEN prev_t = us THEN 'exact'
           WHEN prev_v IS NOT NULL AND next_v IS NOT NULL AND next_t > prev_t
               THEN 'interp'
           WHEN prev_v IS NOT NULL THEN 'locf'
           ELSE 'backfill' END AS basis
FROM derived
WHERE is_grid = 1
"""


# ---------------------------------------------------------------------------
# session path mining (top-k event-type trigrams)
# ---------------------------------------------------------------------------

PATH_TOP_K = 20


def session_path_topk(
    events: DataFrame,
    gap_s: int = TRANSITION_GAP_SECONDS,
    k: int = PATH_TOP_K,
) -> DataFrame:
    """Most common 3-step behavioural paths: (a → b → c) trigrams of
    consecutive event types within a session, ranked by count — the
    path-mining step behind funnel DISCOVERY (conversion_funnel checks a
    hypothesized path; this surfaces the paths worth hypothesizing).

    Same single user_id shuffle as the transition matrix: two ``lead``s
    carry the next two events and their gaps, a trigram survives only if
    BOTH hops stay inside the session cutoff, and the count aggregate's
    key space is |event types|³. Top-k is TakeOrderedAndProject with a
    lexicographic tiebreak."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g1 = F.unix_timestamp(F.lead("ts", 1).over(w)) - F.unix_timestamp("ts")
    g2 = F.unix_timestamp(F.lead("ts", 2).over(w)) - F.unix_timestamp(
        F.lead("ts", 1).over(w)
    )
    tri = (
        events.select(
            F.col("event_type").alias("step1"),
            F.lead("event_type", 1).over(w).alias("step2"),
            F.lead("event_type", 2).over(w).alias("step3"),
            g1.alias("g1"),
            g2.alias("g2"),
        )
        .filter(
            F.col("step3").isNotNull()
            & (F.col("g1") <= gap_s)
            & (F.col("g2") <= gap_s)
        )
        .groupBy("step1", "step2", "step3")
        .agg(F.count("*").alias("n_paths"))
    )
    return tri.orderBy(
        F.col("n_paths").desc(),
        F.col("step1").asc(),
        F.col("step2").asc(),
        F.col("step3").asc(),
    ).limit(k)


SESSION_PATH_TOPK_SQL = f"""
WITH tri AS (
    SELECT event_type AS step1,
           lead(event_type, 1) OVER w AS step2,
           lead(event_type, 2) OVER w AS step3,
           CAST(floor(epoch(lead(ts, 1) OVER w)) AS BIGINT)
               - CAST(floor(epoch(ts)) AS BIGINT) AS g1,
           CAST(floor(epoch(lead(ts, 2) OVER w)) AS BIGINT)
               - CAST(floor(epoch(lead(ts, 1) OVER w)) AS BIGINT) AS g2
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT step1, step2, step3, COUNT(*) AS n_paths
FROM tri
WHERE step3 IS NOT NULL AND g1 <= {TRANSITION_GAP_SECONDS}
  AND g2 <= {TRANSITION_GAP_SECONDS}
GROUP BY step1, step2, step3
ORDER BY n_paths DESC, step1 ASC, step2 ASC, step3 ASC
LIMIT {PATH_TOP_K}
"""


# ---------------------------------------------------------------------------
# Markov next-event predictor, evaluated on a held-out time split
# ---------------------------------------------------------------------------


def markov_next_event_accuracy(
    events: DataFrame, gap_s: int = TRANSITION_GAP_SECONDS
) -> DataFrame:
    """The transition matrix AS A PREDICTOR, honestly evaluated: train
    first-order transitions on the FIRST half of the timeline (median-ts
    split), predict each from-type's most likely next event (argmax row,
    ties to the lexicographically smaller type), and score accuracy on
    the second half's transitions — the train/serve separation
    discipline of ``nb_holdout_accuracy`` applied to the sequence model.

    Two passes over the same lead-derived transition relation (one per
    side of the split, sharing the user_id window shuffle) + an
    |event types|-row broadcast of the argmax predictions."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1e6)
    mid = events.agg(
        F.expr(
            "percentile(unix_micros(CAST(ts AS TIMESTAMP)) / 1e6, 0.5)"
        ).alias("mid")
    )
    gap = F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")
    pairs = (
        events.crossJoin(F.broadcast(mid))
        .select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
            gap.alias("gap"),
            secs.alias("s"),
            F.col("mid"),
        )
        .filter(F.col("to_type").isNotNull() & (F.col("gap") <= gap_s))
    )
    train = pairs.filter(F.col("s") <= F.col("mid"))
    test = pairs.filter(F.col("s") > F.col("mid"))
    counts = train.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n")
    )
    w_pred = Window.partitionBy("from_type").orderBy(
        F.col("n").desc(), F.col("to_type").asc()
    )
    pred = F.broadcast(
        counts.withColumn("__r", F.row_number().over(w_pred))
        .filter(F.col("__r") == 1)
        .select("from_type", F.col("to_type").alias("predicted"))
    )
    return (
        test.join(pred, "from_type")
        .groupBy("from_type")
        .agg(
            F.first("predicted").alias("predicted"),
            F.count("*").alias("n_test"),
            F.sum(
                (F.col("to_type") == F.col("predicted")).cast("long")
            ).alias("n_correct"),
            F.round(
                F.avg(
                    (F.col("to_type") == F.col("predicted")).cast("double")
                ),
                6,
            ).alias("accuracy"),
        )
    )


MARKOV_NEXT_EVENT_ACCURACY_SQL = f"""
WITH mid AS (
    SELECT quantile_cont(epoch(ts), 0.5) AS mid FROM events
),
pairs AS (
    SELECT event_type AS from_type,
           lead(event_type) OVER w AS to_type,
           CAST(floor(epoch(lead(ts) OVER w)) AS BIGINT)
               - CAST(floor(epoch(ts)) AS BIGINT) AS gap,
           epoch(ts) AS s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
train AS (
    SELECT from_type, to_type FROM pairs, mid
    WHERE to_type IS NOT NULL AND gap <= {TRANSITION_GAP_SECONDS}
      AND s <= mid
),
test AS (
    SELECT from_type, to_type FROM pairs, mid
    WHERE to_type IS NOT NULL AND gap <= {TRANSITION_GAP_SECONDS}
      AND s > mid
),
counts AS (
    SELECT from_type, to_type, COUNT(*) AS n FROM train GROUP BY 1, 2
),
pred AS (
    SELECT from_type, to_type AS predicted,
           row_number() OVER (PARTITION BY from_type
                              ORDER BY n DESC, to_type ASC) AS r
    FROM counts QUALIFY r = 1
)
SELECT t.from_type, ANY_VALUE(p.predicted) AS predicted,
       COUNT(*) AS n_test,
       SUM((t.to_type = p.predicted)::BIGINT)::BIGINT AS n_correct,
       round(AVG((t.to_type = p.predicted)::INT), 6) AS accuracy
FROM test t JOIN pred p USING (from_type)
GROUP BY t.from_type
"""


# ---------------------------------------------------------------------------
# conversion latency (view -> purchase time within session)
# ---------------------------------------------------------------------------


def view_to_purchase_latency(
    events: DataFrame, gap_s: int = TRANSITION_GAP_SECONDS
) -> DataFrame:
    """Time-to-convert distribution: for every purchase, the seconds
    since the SAME user's most recent view, counted only when the pair
    sits inside one session (gap cutoff) — summarized as per-day
    conversion count and exact p50/p90 latency. The funnel tells you IF
    users convert; this tells you HOW LONG conversion takes, the metric
    checkout changes move first.

    No as-of join: the preceding view rides the same user-ordered
    window as every other sessionization op via IGNORE NULLS ``last``,
    so the whole operator is one user_id shuffle + a days-sized
    percentile aggregate."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_view = F.last(
        F.when(F.col("event_type") == "view", F.unix_timestamp("ts")),
        ignorenulls=True,
    ).over(w)
    lat = (
        events.withColumn("prev_view_s", prev_view)
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("prev_view_s").isNotNull()
        )
        .withColumn(
            "latency_s",
            F.unix_timestamp("ts") - F.col("prev_view_s"),
        )
        .filter(F.col("latency_s") <= gap_s)
    )
    return (
        lat.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count("*").alias("n_conversions"),
            F.round(F.expr("percentile(latency_s, 0.5)"), 6).alias(
                "p50_latency_s"
            ),
            F.round(F.expr("percentile(latency_s, 0.9)"), 6).alias(
                "p90_latency_s"
            ),
        )
    )


VIEW_TO_PURCHASE_LATENCY_SQL = f"""
WITH flagged AS (
    SELECT user_id, event_type, ts,
           last_value(CASE WHEN event_type = 'view'
                           THEN CAST(floor(epoch(ts)) AS BIGINT) END
                      IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS prev_view_s
    FROM events
),
lat AS (
    SELECT CAST(ts AS DATE) AS day,
           CAST(floor(epoch(ts)) AS BIGINT) - prev_view_s AS latency_s
    FROM flagged
    WHERE event_type = 'purchase' AND prev_view_s IS NOT NULL
      AND CAST(floor(epoch(ts)) AS BIGINT) - prev_view_s
          <= {TRANSITION_GAP_SECONDS}
)
SELECT day, COUNT(*) AS n_conversions,
       round(quantile_cont(latency_s, 0.5), 6) AS p50_latency_s,
       round(quantile_cont(latency_s, 0.9), 6) AS p90_latency_s
FROM lat
GROUP BY day
"""


# ---------------------------------------------------------------------------
# hour-of-week seasonality profile
# ---------------------------------------------------------------------------


def hour_of_week_profile(events: DataFrame) -> DataFrame:
    """Seasonality heatmap: event count and share per (day-of-week,
    hour-of-day) cell, with the per-dow peak hour flagged — the load
    profile capacity planning and anomaly BASELINES are built from
    (compare a day's traffic to its cell, not to a global mean).

    One hash aggregate over a 168-cell key space; the share and peak
    decorations run over that aggregate. dayofweek is 1=Sunday in both
    Spark and DuckDB (DuckDB's dayofweek is 0=Sunday — the twin uses
    dayofweek(ts) + 1 to match)."""
    cells = events.groupBy(
        F.dayofweek(F.col("ts").cast("timestamp")).cast("int").alias("dow"),
        F.hour(F.col("ts").cast("timestamp")).cast("int").alias("hod"),
    ).agg(F.count("*").alias("n"))
    tot = F.broadcast(cells.agg(F.sum("n").alias("total")))
    w_dow = Window.partitionBy("dow")
    return cells.crossJoin(tot).select(
        "dow",
        "hod",
        "n",
        F.round(F.col("n") / F.col("total"), 6).alias("share"),
        (F.col("n") == F.max("n").over(w_dow)).alias("is_dow_peak"),
    )


HOUR_OF_WEEK_PROFILE_SQL = """
WITH cells AS (
    SELECT (dayofweek(ts) + 1)::INT AS dow, hour(ts)::INT AS hod,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
),
tot AS (SELECT SUM(n)::DOUBLE AS total FROM cells)
SELECT dow, hod, n,
       round(n / tot.total, 6) AS share,
       n = MAX(n) OVER (PARTITION BY dow) AS is_dow_peak
FROM cells, tot
"""


# ---------------------------------------------------------------------------
# catalog concentration (Gini coefficient of play counts)
# ---------------------------------------------------------------------------


def track_play_gini(events: DataFrame) -> DataFrame:
    """Gini coefficient of play-count concentration across tracks
    (0 = every track equally played, → 1 = one track takes all plays),
    plus the head share (top-1% tracks' share of plays) — the catalog-
    inequality audit behind licensing and recommendation-diversity
    dashboards.

    Closed form from the rank sum: G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n
    over ascending-sorted per-track totals. The rank runs over the
    per-track AGGREGATE (|tracks| rows, not plays) with a (count,
    track) tiebreak for engine-identical ranking; sums are exact
    BIGINTs, the final expression one IEEE formula. At 10⁸+ tracks the
    single-partition rank is the bottleneck —
    :func:`track_play_gini_closed_form` computes the identical value
    with the ordered stage reduced to |distinct counts| rows."""
    key = F.get_json_object("props", "$.k").alias("key")
    per_track = (
        events.select(key)
        .filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.count("*").alias("x"))
    )
    # repartition(1) + spark_partition_id (constant 0 after it) instead
    # of partitionBy(lit(0)): the optimizer folds a literal partition
    # key away and WindowExec then logs "No Partition Defined" — same
    # single-partition exchange, declared instead of warned about
    spid = F.spark_partition_id()
    w = Window.partitionBy(spid).orderBy(
        F.col("x").asc(), F.col("key").asc()
    )
    ranked = (
        per_track.repartition(1)
        .withColumn("i", F.row_number().over(w))
        .withColumn("n_all", F.count("*").over(Window.partitionBy(spid)))
    )
    stats = ranked.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i").cast("decimal(28,0)") * F.col("x")).alias("six"),
        F.sum(
            F.when(F.col("i") > F.col("n_all") * 0.99, F.col("x")).otherwise(
                F.lit(0)
            )
        ).alias("head_x"),
    )
    n = F.col("n").cast("double")
    gini = (
        F.lit(2.0) * F.col("six").cast("double") / (n * F.col("sx"))
        - (n + 1.0) / n
    )
    return stats.select(
        "n",
        F.col("sx").cast("long").alias("total_plays"),
        F.round(gini, 6).alias("gini"),
        F.round(
            F.col("head_x").cast("double") / F.col("sx"), 6
        ).alias("top1pct_share"),
    )


TRACK_PLAY_GINI_SQL = """
WITH per_track AS (
    SELECT json_extract_string(props, '$.k') AS key, COUNT(*) AS x
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1
),
ranked AS (
    SELECT x, row_number() OVER (ORDER BY x ASC, key ASC) AS i,
           COUNT(*) OVER () AS n_all
    FROM per_track
),
stats AS (
    SELECT COUNT(*) AS n, SUM(x)::BIGINT AS sx,
           SUM(CAST(i AS DECIMAL(28,0)) * x) AS six,
           SUM(CASE WHEN i > n_all * 0.99 THEN x ELSE 0 END)::BIGINT
               AS head_x
    FROM ranked
)
SELECT n, sx AS total_plays,
       round(2.0 * six::DOUBLE / (n::DOUBLE * sx) - (n + 1.0) / n, 6)
           AS gini,
       round(head_x::DOUBLE / sx, 6) AS top1pct_share
FROM stats
"""


def _gini_tie_groups(events: DataFrame) -> DataFrame:
    """(x, cnt, below) per DISTINCT play count: cnt tracks share count
    x; ``below`` tracks have a smaller one. The running sum is the only
    ordered stage of the closed-form Gini, and it runs over this
    distinct-count relation — ``repartition(1)`` declares the single
    partition explicitly AFTER the parallel aggregates (the structural
    invariant tests/test_approx_variants_r8.py pins on this plan)."""
    key = F.get_json_object("props", "$.k").alias("key")
    per_track = (
        events.select(key)
        .filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.count("*").alias("x"))
    )
    by_x = per_track.groupBy("x").agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy(F.spark_partition_id())  # constant 0 after
        .orderBy("x")                               # the repartition(1)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return by_x.repartition(1).withColumn(
        "below", F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long")
    )


def track_play_gini_closed_form(events: DataFrame) -> DataFrame:
    """:func:`track_play_gini` without the |tracks|-sized single-
    partition rank window (VERDICT r7 item #4) — the SAME value via a
    two-level closed-form rank sum, the ``corpus_shuffle`` discipline:

    Group tracks by play count x. Within a group of ``cnt`` ties the
    ascending (x, key) ranks are exactly ``below+1 .. below+cnt`` where
    ``below`` = # tracks with smaller x, so the rank sum needs no
    per-track rank at all::

        Σ i·xᵢ  =  Σ_x  x · (cnt·below + cnt·(cnt+1)/2)

    and the top-1% head mass is the count of ranks above ``n·0.99``
    clipped to each group. The only ordered stage left runs over the
    DISTINCT play-count values (|distinct x| rows — thousands at any
    corpus size, vs 10⁸ tracks), declared single-partition via
    ``repartition(1)`` AFTER the parallel aggregates. Output is
    bit-identical to the exact operator, so it shares its DuckDB
    oracle."""
    # one events scan + one per-track shuffle feed both consumers below
    with_below = _gini_tie_groups(events).localCheckpoint(eager=False)
    six_term = F.col("x").cast("decimal(28,0)") * (
        F.col("cnt") * F.col("below")
        + F.expr("cnt * (cnt + 1) DIV 2")
    )
    tot = with_below.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("x") * F.col("cnt")).cast("long").alias("sx"),
        F.sum(six_term).alias("six"),
    )
    # ranks i in (n·0.99, below+cnt]: cnt − #{i ≤ n·0.99}, clipped to
    # the group — floor() is exact for integer i vs double threshold
    head_in_group = F.col("cnt") - F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.col("cnt").cast("long"),
            F.floor(F.col("n") * 0.99) - F.col("below"),
        ),
    )
    head = (
        with_below.crossJoin(F.broadcast(tot.select("n")))
        .agg(F.sum(F.col("x") * head_in_group).cast("long").alias("head_x"))
    )
    stats = tot.crossJoin(head)
    n = F.col("n").cast("double")
    gini = (
        F.lit(2.0) * F.col("six").cast("double") / (n * F.col("sx"))
        - (n + 1.0) / n
    )
    return stats.select(
        "n",
        F.col("sx").alias("total_plays"),
        F.round(gini, 6).alias("gini"),
        F.round(
            F.col("head_x").cast("double") / F.col("sx"), 6
        ).alias("top1pct_share"),
    )


# ---------------------------------------------------------------------------
# daily new vs returning users
# ---------------------------------------------------------------------------


def daily_new_vs_returning(events: DataFrame) -> DataFrame:
    """Per day: active users split into NEW (first-ever activity that
    day) and RETURNING — the growth-accounting decomposition every
    DAU chart needs before it means anything.

    First-seen day per user is one hash aggregate; actives per day are
    a (day, user) distinct; the split is a broadcast-joined comparison
    — no window over raw events, keys are user-bounded."""
    day = F.col("ts").cast("timestamp").cast("date")
    actives = events.select(
        day.alias("day"), "user_id"
    ).distinct()
    first_seen = actives.groupBy("user_id").agg(
        F.min("day").alias("first_day")
    )
    return (
        actives.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.count("*").alias("active_users"),
            F.sum(
                (F.col("day") == F.col("first_day")).cast("long")
            ).alias("new_users"),
            F.sum(
                (F.col("day") != F.col("first_day")).cast("long")
            ).alias("returning_users"),
            F.round(
                F.avg((F.col("day") != F.col("first_day")).cast("double")),
                6,
            ).alias("returning_share"),
        )
    )


DAILY_NEW_VS_RETURNING_SQL = """
WITH actives AS (
    SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
first_seen AS (
    SELECT user_id, MIN(day) AS first_day FROM actives GROUP BY user_id
)
SELECT a.day,
       COUNT(*) AS active_users,
       SUM((a.day = f.first_day)::BIGINT)::BIGINT AS new_users,
       SUM((a.day != f.first_day)::BIGINT)::BIGINT AS returning_users,
       round(AVG((a.day != f.first_day)::INT), 6) AS returning_share
FROM actives a JOIN first_seen f USING (user_id)
GROUP BY a.day
"""


# ---------------------------------------------------------------------------
# session training pairs (behavioral logs -> next-event supervised examples)
# ---------------------------------------------------------------------------

#: Context width (events) for next-event training examples.
SESSION_CONTEXT_K = 3


def _sessionized(events: DataFrame, gap_s: int) -> DataFrame:
    """(user_id, ts, event_id, event_type, sess): the lag/flag
    sessionizer (30-min idle gap) shared by
    :func:`session_training_pairs` and :func:`purchase_attribution` —
    ONE definition of what "session" means, one user_id shuffle."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = events.select(
        "user_id", "ts", "event_id", "event_type"
    ).withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_s), F.lit(1)).otherwise(F.lit(0)),
    )
    return flagged.withColumn(
        "sess",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )


#: SQL twin of :func:`_sessionized` — the flagged/sessed CTE prefix both
#: oracle strings embed.
_SESSIONED_CTE = f"""flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR CAST(floor(epoch(ts)) AS BIGINT)
                        - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT)
                        > {TRANSITION_GAP_SECONDS}
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessed AS (
    SELECT user_id, ts, event_id, event_type,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )::BIGINT AS sess
    FROM flagged
)"""


def session_training_pairs(
    events: DataFrame,
    gap_s: int = TRANSITION_GAP_SECONDS,
    k: int = SESSION_CONTEXT_K,
) -> DataFrame:
    """Behavioral logs → supervised next-event examples: for every event
    with at least one predecessor in the same session (30-min idle gap),
    emit (context = up to ``k`` preceding event types, label = this
    event's type). The sequence-model training-set builder over
    clickstream data — the generalization of
    :func:`session_transition_matrix` (k=1 counts) to the examples a
    next-action model actually consumes; contexts never cross a session
    boundary by construction.

    Shape: ONE shuffle on ``user_id`` shared by all three windows — the
    lag/flag sessionizer, the cumulative session counter, and the
    context collector (the (user, sess) window's clustering is satisfied
    by the user_id exchange, so Spark inserts only a sort). The context
    frame is ROWS-bounded (k preceding), so state per row is O(k)
    regardless of session length — no whole-session buffering at 100 TB.
    """
    sessed = _sessionized(events, gap_s)
    wctx = (
        Window.partitionBy("user_id", "sess")
        .orderBy("ts", "event_id")
        .rowsBetween(-k, -1)
    )
    context = F.concat_ws(" ", F.collect_list("event_type").over(wctx))
    return (
        sessed.select(
            "user_id",
            F.col("sess").alias("session_seq"),
            F.col("event_id").alias("example_id"),
            context.alias("context"),
            F.col("event_type").alias("label"),
        )
        .filter(F.col("context") != "")
    )


SESSION_TRAINING_PAIRS_SQL = f"""
WITH {_SESSIONED_CTE},
ctx AS (
    SELECT user_id, sess, event_id, event_type,
           coalesce(array_to_string(list(event_type) OVER (
               PARTITION BY user_id, sess ORDER BY ts, event_id
               ROWS BETWEEN {SESSION_CONTEXT_K} PRECEDING AND 1 PRECEDING
           ), ' '), '') AS context
    FROM sessed
)
SELECT user_id, sess AS session_seq, event_id AS example_id,
       context, event_type AS label
FROM ctx
WHERE context <> ''
"""


# ---------------------------------------------------------------------------
# purchase attribution (first-touch / last-touch within the session)
# ---------------------------------------------------------------------------

def purchase_attribution(
    events: DataFrame,
    gap_s: int = TRANSITION_GAP_SECONDS,
    target: str = "purchase",
) -> DataFrame:
    """Per-conversion attribution: for every ``target`` event with at
    least one predecessor in its session (30-min idle gap), the FIRST
    event type of that session (first-touch credit), the immediately
    preceding event type (last-touch credit), and how many steps in the
    conversion took — the two classic credit models every growth
    dashboard reconciles, emitted at conversion grain so any blended
    model (linear, time-decay) is one aggregate away.

    Shape: identical to :func:`session_training_pairs` — ONE user_id
    shuffle feeds the sessionizer and both attribution windows (the
    (user, sess) windows re-sort inside the same exchange); first-touch
    is an unbounded-preceding ``first`` (running state O(1) per row),
    last-touch a ``lag`` — no whole-session buffering at any scale.
    """
    sessed = _sessionized(events, gap_s)
    ws = Window.partitionBy("user_id", "sess").orderBy("ts", "event_id")
    attributed = sessed.select(
        "user_id",
        F.col("sess").alias("session_seq"),
        F.col("event_id").alias("purchase_event_id"),
        "event_type",
        F.first("event_type")
        .over(ws.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("first_touch"),
        F.lag("event_type").over(ws).alias("last_touch"),
        (F.row_number().over(ws) - 1).cast("long").alias("steps_to_purchase"),
    )
    return (
        attributed.filter(
            (F.col("event_type") == target) & F.col("last_touch").isNotNull()
        )
        .drop("event_type")
    )


PURCHASE_ATTRIBUTION_SQL = f"""
WITH {_SESSIONED_CTE},
attributed AS (
    SELECT user_id, sess AS session_seq, event_id AS purchase_event_id,
           event_type,
           first_value(event_type) OVER ws AS first_touch,
           lag(event_type) OVER ws AS last_touch,
           (row_number() OVER ws - 1)::BIGINT AS steps_to_purchase
    FROM sessed
    WINDOW ws AS (PARTITION BY user_id, sess ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, session_seq, purchase_event_id,
       first_touch, last_touch, steps_to_purchase
FROM attributed
WHERE event_type = 'purchase' AND last_touch IS NOT NULL
"""
