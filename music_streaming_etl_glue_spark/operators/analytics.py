"""General analytics operators beyond the reference's two-left-join
surface: filtered multi-agg scans, inner/semi/anti joins, pivot, rollup,
top-k per group with deterministic tiebreaks, and gap-based
sessionization. These are the generalizations SURVEY §2.3/§7 calls for so
a reference user has the full relational toolkit, each with a DuckDB
oracle twin.

All on the TPC-H-ish tables (lineitem/orders/customer/nation) and the
events stream table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PRICING_CUTOFF = "1998-09-02"
SESSION_GAP_SECONDS = 1800
TOP_CUSTOMERS_K = 3


# ---------------------------------------------------------------------------
# filtered scan + 8 aggregates (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """Filter pushed to the parquet scan; one hash-agg shuffle; every
    double sum through an exact decimal accumulator (deterministic under
    any partitioning)."""
    def dsum(col, scale=4):
        return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")

    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(PRICING_CUTOFF))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            # disc_price is exact at 4 decimals (2dp × 2dp); charge needs 6
            # (2dp × 2dp × 2dp) — rounding a 6dp-exact value to scale 4 hits
            # .00005 ties where engines' rounding modes disagree.
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            (dsum(F.col("l_quantity"), 2) / F.count("l_quantity")).alias("avg_qty"),
            (dsum(F.col("l_extendedprice"), 2) / F.count("l_extendedprice")).alias(
                "avg_price"
            ),
            (dsum(F.col("l_discount"), 2) / F.count("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
    CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE)
        AS sum_disc_price,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
        AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
    CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)
        / COUNT(l_quantity) AS avg_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)
        / COUNT(l_extendedprice) AS avg_price,
    CAST(SUM(CAST(l_discount AS DECIMAL(28,2))) AS DOUBLE)
        / COUNT(l_discount) AS avg_disc,
    COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# inner-join chain + agg
# ---------------------------------------------------------------------------

def revenue_by_nation(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Fact→orders shuffle join (both large: co-partitioned on the key by
    Catalyst), then broadcast dims."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(revenue.cast("decimal(28,4)")).cast("double").alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


REVENUE_BY_NATION_SQL = """
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4)))
            AS DOUBLE) AS revenue,
       COUNT(DISTINCT o.o_orderkey) AS n_orders
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


# ---------------------------------------------------------------------------
# top-k per group (deterministic row_number tiebreak)
# ---------------------------------------------------------------------------

def top_customers_per_nation(
    orders: DataFrame, customer: DataFrame, nation: DataFrame, k: int = TOP_CUSTOMERS_K
) -> DataFrame:
    spend = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(28,2)")).cast("double").alias("spend"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("spend").desc(), F.col("o_custkey").asc()
    )
    return (
        spend.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("n_name").alias("nation"),
            F.col("o_custkey").alias("custkey"),
            F.col("c_name").alias("customer_name"),
            "spend",
            "rank",
        )
    )


TOP_CUSTOMERS_SQL = f"""
WITH spend AS (
    SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
           AS spend
    FROM orders GROUP BY o_custkey
),
ranked AS (
    SELECT n.n_name AS nation, s.o_custkey AS custkey, c.c_name AS customer_name,
           s.spend,
           row_number() OVER (PARTITION BY n.n_name
                              ORDER BY s.spend DESC, s.o_custkey ASC) AS rank
    FROM spend s
    JOIN customer c ON s.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT nation, custkey, customer_name, spend, rank
FROM ranked WHERE rank <= {TOP_CUSTOMERS_K}
"""


# ---------------------------------------------------------------------------
# semi / anti joins
# ---------------------------------------------------------------------------

def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT ANTI (NOT EXISTS) — shuffle-free when the keys side broadcasts."""
    return customer.join(
        orders.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("customer_name"))


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey AS custkey, c_name AS customer_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def customers_with_big_orders(
    customer: DataFrame, orders: DataFrame, min_total: float = 400_000.0
) -> DataFrame:
    """LEFT SEMI (EXISTS) with the predicate pushed below the join."""
    big = orders.filter(F.col("o_totalprice") >= min_total).select("o_custkey")
    return customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("customer_name"))


CUSTOMERS_WITH_BIG_ORDERS_SQL = """
SELECT c_custkey AS custkey, c_name AS customer_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice >= 400000.0)
"""


# ---------------------------------------------------------------------------
# pivot / rollup
# ---------------------------------------------------------------------------

ORDER_STATUSES = ("O", "F", "P")


def order_priority_pivot(orders: DataFrame) -> DataFrame:
    """Pivot order counts: one row per priority, one column per status.
    Status values pinned so the output schema is static."""
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(ORDER_STATUSES))
        .count()
        .na.fill(0, list(ORDER_STATUSES))
    )


ORDER_PRIORITY_PIVOT_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (o_orderstatus = 'O') AS "O",
       COUNT(*) FILTER (o_orderstatus = 'F') AS "F",
       COUNT(*) FILTER (o_orderstatus = 'P') AS "P"
FROM orders
GROUP BY o_orderpriority
"""


def sales_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP (year → priority → grand total); NULL group keys mark the
    subtotal levels, same convention as ANSI SQL."""
    return (
        orders.withColumn("order_year", F.year("o_orderdate").cast("long"))
        .rollup("order_year", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
            .cast("double")
            .alias("total_sales"),
        )
    )


def sales_cube(orders: DataFrame) -> DataFrame:
    """CUBE (all grouping-set combinations of year × priority) — the
    companion to :func:`sales_rollup` completing the grouping-sets
    surface."""
    return (
        orders.withColumn("order_year", F.year("o_orderdate").cast("long"))
        .cube("order_year", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
            .cast("double")
            .alias("total_sales"),
        )
    )


SALES_CUBE_SQL = """
SELECT year(o_orderdate)::BIGINT AS order_year, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_sales
FROM orders
GROUP BY CUBE (year(o_orderdate)::BIGINT, o_orderpriority)
"""


SALES_ROLLUP_SQL = """
SELECT year(o_orderdate)::BIGINT AS order_year, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_sales
FROM orders
GROUP BY ROLLUP (year(o_orderdate)::BIGINT, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# exact percentiles
# ---------------------------------------------------------------------------

PERCENTILES = (0.5, 0.95, 0.99)


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact linear-interpolated percentiles of the event measure per
    type. Exact (sort-based) for oracle parity; at 100 TB swap in
    ``percentile_approx`` (KLL-sketch, single pass, mergeable)."""
    aggs = [
        F.round(F.percentile("value", F.lit(p)), 6).alias(f"p{int(p * 100)}")
        for p in PERCENTILES
    ]
    return events.groupBy("event_type").agg(*aggs)


VALUE_PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# skyline (Pareto-optimal set)
# ---------------------------------------------------------------------------

def _skyline_pass(df: DataFrame, part_cols: list[str]) -> DataFrame:
    """One sort-based 2-D skyline pass (minimize p_size, p_retailprice).

    Ordered by p_size, a row is dominated iff some row at size <= its own
    has a strictly lower price (m1, frame includes equal sizes), or some
    row at a strictly smaller size has price <= its own (m2, frame ends at
    size-1). Two running-min range windows — O(n log n) per partition, no
    pairwise join. Duplicates of the same point survive (no strict edge),
    matching the NOT-EXISTS oracle.
    """
    w_le = (
        Window.partitionBy(*part_cols)
        .orderBy("p_size")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    w_lt = (
        Window.partitionBy(*part_cols)
        .orderBy("p_size")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    m1 = F.min("p_retailprice").over(w_le)
    m2 = F.min("p_retailprice").over(w_lt)
    dominated = (m1 < F.col("p_retailprice")) | (
        m2.isNotNull() & (m2 <= F.col("p_retailprice"))
    )
    return (
        df.withColumn("__dominated", dominated)
        .filter(~F.col("__dominated"))
        .drop("__dominated")
    )


def skyline_parts(part: DataFrame) -> DataFrame:
    """Skyline of parts minimizing (p_size, p_retailprice): rows no other
    row dominates (<= on both dims, < on at least one).

    Two-phase divide-and-conquer, no pairwise join anywhere:

    1. **Local skylines, fully parallel** — each input partition computes
       its own skyline with the sort-based window pass (partitioned by
       ``spark_partition_id``, so every core works independently). A
       globally non-dominated row is non-dominated in its partition, so
       the union of local skylines contains the global skyline; dominance
       is transitive, so anything a *discarded* row dominated is also
       dominated by a surviving row.
    2. **Global merge** — the same pass over the survivors (for random
       data the local skylines are ~log-sized, so this input is tiny).

    At 100× the data this stays one scan + one small-window stage; the old
    NOT-EXISTS form compiled to an O(n²) BroadcastNestedLoopJoin.
    """
    p = part.select("p_partkey", "p_size", "p_retailprice")
    local = _skyline_pass(
        p.withColumn("__pid", F.spark_partition_id()), ["__pid"]
    ).drop("__pid")
    # global merge input is the tiny union of local skylines: repartition(1)
    # inserts an explicit SinglePartition exchange, so phase 1 above stays
    # fully parallel (coalesce(1) would push the 1-partition constraint
    # upstream and serialize the local pass) while WindowExec still sees a
    # partition spec — keeps the gate log free of no-partition warnings
    merged = local.repartition(1).withColumn("__pid", F.spark_partition_id())
    return _skyline_pass(merged, ["__pid"]).drop("__pid")


SKYLINE_PARTS_SQL = """
SELECT p_partkey, p_size, p_retailprice
FROM part p
WHERE NOT EXISTS (
    SELECT 1 FROM part q
    WHERE q.p_size <= p.p_size AND q.p_retailprice <= p.p_retailprice
      AND (q.p_size < p.p_size OR q.p_retailprice < p.p_retailprice)
)
"""


# ---------------------------------------------------------------------------
# histogram / binning
# ---------------------------------------------------------------------------

HISTOGRAM_BIN_WIDTH = 10.0


def value_histogram(
    events: DataFrame, bin_width: float = HISTOGRAM_BIN_WIDTH
) -> DataFrame:
    """Fixed-width histogram of the event measure per event type — the
    binning reduces before the shuffle, so cardinality is bins, not rows."""
    bucket = F.floor(F.col("value") / bin_width).cast("long")
    return (
        events.groupBy("event_type", bucket.alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


VALUE_HISTOGRAM_SQL = f"""
SELECT event_type,
       CAST(floor(value / {HISTOGRAM_BIN_WIDTH}) AS BIGINT) AS bin,
       count(*) AS n,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# gap-based sessionization (lag window + cumulative flag sum)
# ---------------------------------------------------------------------------

def user_sessions(events: DataFrame, gap_s: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Per user: session count and events/session with a 30-min idle gap.
    Single shuffle on user_id shared by the window and the aggregate."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_s), F.lit(1)).otherwise(F.lit(0)),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count("*").alias("n_events"),
        (F.count("*").cast("double") / F.sum("new_session")).alias(
            "events_per_session"
        ),
    )


USER_SESSIONS_SQL = f"""
WITH flagged AS (
    SELECT user_id,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR CAST(floor(epoch(ts)) AS BIGINT)
                        - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT)
                        > {SESSION_GAP_SECONDS}
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       SUM(new_session)::BIGINT AS n_sessions,
       COUNT(*) AS n_events,
       COUNT(*)::DOUBLE / SUM(new_session) AS events_per_session
FROM flagged
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# native session windows (F.session_window — the streaming-compatible twin
# of the manual lag/flag sessionization in user_sessions)
# ---------------------------------------------------------------------------

def user_session_windows(
    events: DataFrame, gap_s: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """Session intervals per user via Spark's native ``session_window``
    operator: one shuffle on user_id, merge-on-overlap state machine in
    the aggregate — the exact code path Structured Streaming uses, so the
    batch and streaming sessionizations cannot diverge.

    Native semantics (mirrored in the oracle): an event merges into the
    open session while ``ts <= previous end`` — a gap of exactly ``gap_s``
    still merges; only ``> gap_s`` splits — and ``session_end`` is the
    last event + gap. Unlike the manual ``user_sessions`` (which compares
    second-truncated ``unix_timestamp`` values), the comparison is at full
    microsecond precision, so events 1800.000001 s apart are two sessions
    here and one session there."""
    sw = F.session_window("ts", f"{gap_s} seconds")
    return (
        events.groupBy("user_id", sw)
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


USER_SESSION_WINDOWS_SQL = f"""
WITH gaps AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        > {SESSION_GAP_SECONDS} * 1000000
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
flagged AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS session_id
    FROM gaps
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL {SESSION_GAP_SECONDS} SECOND AS session_end,
       count(*) AS n_events
FROM flagged
GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# unpivot / melt (inverse of the pivot — completes the reshape surface)
# ---------------------------------------------------------------------------

def order_priority_unpivot(orders: DataFrame) -> DataFrame:
    """Wide→long melt of the pivoted status counts via native
    ``DataFrame.unpivot`` (one projection per value column, no shuffle
    beyond the pivot's own aggregate). Zero-filled combinations survive
    the round trip, so pivot→unpivot loses nothing."""
    wide = order_priority_pivot(orders)
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=list(ORDER_STATUSES),
        variableColumnName="o_orderstatus",
        valueColumnName="n_orders",
    )


ORDER_PRIORITY_UNPIVOT_SQL = """
WITH combos AS (
    SELECT p.o_orderpriority, s.o_orderstatus
    FROM (SELECT DISTINCT o_orderpriority FROM orders) p
    CROSS JOIN (VALUES ('O'), ('F'), ('P')) s(o_orderstatus)
),
counts AS (
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
    FROM orders
    WHERE o_orderstatus IN ('O', 'F', 'P')
    GROUP BY 1, 2
)
SELECT c.o_orderpriority, c.o_orderstatus,
       COALESCE(n, 0)::BIGINT AS n_orders
FROM combos c
LEFT JOIN counts USING (o_orderpriority, o_orderstatus)
"""


def value_percentiles_approx(
    events: DataFrame, accuracy: int = 1000
) -> DataFrame:
    """Sketch twin of :func:`value_percentiles`: ``percentile_approx``
    (KLL-style quantile sketch — single pass, mergeable across partitions
    and epochs, bounded rank error ≤ 1/accuracy). The 100 TB path;
    approximate, so verified by a pytest rank-error bound against the
    exact query rather than a SQL oracle."""
    aggs = [
        F.round(
            F.percentile_approx("value", F.lit(p), F.lit(accuracy)), 6
        ).alias(f"p{int(p * 100)}")
        for p in PERCENTILES
    ]
    return events.groupBy("event_type").agg(*aggs)


def value_percentiles_approx_audit(
    events: DataFrame, accuracy: int = 1000, eps_mult: float = 2.0
) -> DataFrame:
    """Bounded driver check for :func:`value_percentiles_approx`
    (VERDICT r11 item #8): Greenwald–Khanna guarantees the returned
    element's exact RANK is within n/accuracy of the target rank — a
    property checkable in plain counting SQL even though the sketch
    itself is engine-specific. Per (event_type, percentile) this emits
    the non-null count and ``within_rank_bound``: with t the approx
    threshold, ``count(v < t) ≤ q·n + ε·n + 1`` and
    ``count(v ≤ t) ≥ q·n − ε·n − 1`` for ε = eps_mult/accuracy
    (measured: the le-side error touches exactly 1/accuracy at sf0.1,
    so eps_mult=2 is the 2× margin). The oracle asserts TRUE for the
    full (event_type × percentile) grid. One broadcast of the tiny
    threshold relation + one counting pass — no sort anywhere."""
    vp = value_percentiles_approx(events, accuracy)
    stack_args = ", ".join(
        f"'{p}', p{int(p * 100)}" for p in PERCENTILES
    )
    th = vp.selectExpr(
        "event_type",
        f"stack({len(PERCENTILES)}, {stack_args}) AS (pct, t)",
    )
    eps = eps_mult / accuracy
    q = F.col("pct").cast("double")
    n = F.col("n_events").cast("double")
    return (
        events.select("event_type", "value")
        .join(F.broadcast(th), "event_type")
        .groupBy("event_type", "pct")
        .agg(
            F.sum((F.col("value") < F.col("t")).cast("long")).alias("lt"),
            F.sum((F.col("value") <= F.col("t")).cast("long")).alias("le"),
            F.count("value").alias("n_events"),
        )
        .select(
            "event_type",
            "pct",
            "n_events",
            (
                (F.col("lt") <= q * n + F.lit(eps) * n + 1)
                & (F.col("le") >= q * n - F.lit(eps) * n - 1)
            ).alias("within_rank_bound"),
        )
    )


VALUE_PERCENTILES_APPROX_AUDIT_SQL = f"""
SELECT event_type, pct,
       COUNT(value) AS n_events,
       TRUE AS within_rank_bound
FROM events
CROSS JOIN (VALUES {", ".join(f"('{p}')" for p in PERCENTILES)}) p(pct)
GROUP BY event_type, pct
"""


def genre_totals_salted(events: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Per-event-type totals via SALTED two-phase aggregation
    (``plans/layout.salted_agg``): with only a handful of hot group keys,
    a direct groupBy funnels every row of a key through one reducer —
    salting spreads each key over ``salt_buckets`` partial groups first.
    Exact by construction (count/sum split losslessly; the value sum is a
    decimal accumulator), so it shares plain-GROUP-BY oracle semantics."""
    from music_streaming_etl_glue_spark.plans.layout import salted_agg

    prepared = events.select(
        "event_type", F.col("value").cast("decimal(28,6)").alias("value_dec")
    )
    out = salted_agg(
        prepared,
        keys=["event_type"],
        aggs={"value_dec": "sum", "event_type": "count"},
        salt_buckets=salt_buckets,
    )
    return out.select(
        "event_type",
        F.col("count_event_type").alias("n_events"),
        F.col("sum_value_dec").cast("double").alias("value_sum"),
    )


GENRE_TOTALS_SALTED_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum
FROM events
GROUP BY event_type
"""


def sales_grouping_sets(orders: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS — the mixed-set form rollup/cube can't
    express: per-year totals, per-priority totals, and the grand total,
    but NOT the (year, priority) cross. One pass; Catalyst expands the
    sets into a single Expand + hash aggregate."""
    return (
        orders.withColumn("order_year", F.year("o_orderdate").cast("long"))
        .groupingSets(
            [[F.col("order_year")], [F.col("o_orderpriority")], []],
            F.col("order_year"),
            F.col("o_orderpriority"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
            .cast("double")
            .alias("total_sales"),
        )
    )


SALES_GROUPING_SETS_SQL = """
SELECT year(o_orderdate)::BIGINT AS order_year, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
           AS total_sales
FROM orders
GROUP BY GROUPING SETS ((year(o_orderdate)::BIGINT), (o_orderpriority), ())
"""


# ---------------------------------------------------------------------------
# single-pass table profiling (the data-quality staple before any pipeline)
# ---------------------------------------------------------------------------

PROFILE_COLUMNS = ("event_id", "user_id", "event_type", "value")


def profile_events(events: DataFrame) -> DataFrame:
    """Column profile of the events table in ONE scan: per column the
    row count, null count, exact distinct count, and min/max rendered as
    strings (one schema for every column type). All counts ride a single
    wide aggregate — count_distinct columns expand into one multi-count
    hash aggregate, not one job per column — then unpivot to the
    long (column, metric...) presentation shape driver-side-free.

    At 100 TB swap the exact distincts for approx_count_distinct; exact
    is kept here because the oracle checks exact values."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in PROFILE_COLUMNS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = events.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in PROFILE_COLUMNS
        ]
    )
    return (
        wide.select(F.explode(structs).alias("p"))
        .select("p.*")
        .orderBy("column")
    )


_PROFILE_BRANCHES = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", COUNT(*) AS n_rows,
       SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       MIN({c})::VARCHAR AS min_value, MAX({c})::VARCHAR AS max_value
FROM events"""
    for c in PROFILE_COLUMNS
)

PROFILE_EVENTS_SQL = f"""
SELECT * FROM (
{_PROFILE_BRANCHES}
) ORDER BY "column"
"""


# ---------------------------------------------------------------------------
# count-min sketch expressed relationally (deterministic md5 hash rows)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_TOP_K = 20


def cms_track_estimates(
    events: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    top_k: int = CMS_TOP_K,
) -> DataFrame:
    """Top-k tracks by count-min-sketch play-count estimate, with the
    exact count and the sketch's overestimate alongside (the CMS
    guarantee: ``est >= exact``, excess < εN w.h.p.) — the audit query
    for the sketch path.

    The sketch is the relational form of CMS: ``depth`` hash rows ×
    ``width`` buckets, bucket = md5(row ‖ key) mod width (the engine's
    one portable hash — bit-identical in DuckDB), counts grouped per
    (row, bucket). An estimate is the MIN over rows of the key's bucket
    counts. At 100 TB the d×w sketch table is ~2k rows REGARDLESS of key
    cardinality — it pre-aggregates map-side, broadcasts anywhere, and
    merges across days/partitions by adding cell-wise, which is why a
    sketch beats exact counting when keys number in the billions; the
    exact twin here exists to measure the error, not to scale."""
    plays = events.select(
        F.get_json_object("props", "$.k").alias("key")
    ).filter(F.col("key").isNotNull())
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row")
    hashed = plays.select("key", rows).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("row").cast("string"), F.lit(":"), "key")),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % width,
    )
    sketch = hashed.groupBy("row", "bucket").agg(F.count("*").alias("cnt"))
    exact = plays.groupBy("key").agg(F.count("*").alias("exact_plays"))
    probes = exact.select("key", rows).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("row").cast("string"), F.lit(":"), "key")),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % width,
    )
    est = (
        probes.join(sketch, ["row", "bucket"])
        .groupBy("key")
        .agg(F.min("cnt").alias("est_plays"))
    )
    return (
        est.join(exact, "key")
        .select(
            F.col("key").alias("track_key"),
            "est_plays",
            "exact_plays",
            (F.col("est_plays") - F.col("exact_plays")).alias("overestimate"),
        )
        .orderBy(F.col("est_plays").desc(), F.col("track_key").asc())
        .limit(top_k)
    )


CMS_TRACK_ESTIMATES_SQL = f"""
WITH plays AS (
    SELECT json_extract_string(props, '$.k') AS key
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
),
hashed AS (
    SELECT key, t.r AS row,
           ('0x' || substr(md5(t.r::VARCHAR || ':' || key), 1, 15))::BIGINT
               % {CMS_WIDTH} AS bucket
    FROM plays, range(0, {CMS_DEPTH}) t(r)
),
sketch AS (
    SELECT row, bucket, COUNT(*) AS cnt FROM hashed GROUP BY row, bucket
),
exact AS (SELECT key, COUNT(*) AS exact_plays FROM plays GROUP BY key),
probes AS (
    SELECT key, t.r AS row,
           ('0x' || substr(md5(t.r::VARCHAR || ':' || key), 1, 15))::BIGINT
               % {CMS_WIDTH} AS bucket
    FROM exact, range(0, {CMS_DEPTH}) t(r)
),
est AS (
    SELECT p.key, MIN(s.cnt) AS est_plays
    FROM probes p JOIN sketch s ON s.row = p.row AND s.bucket = p.bucket
    GROUP BY p.key
)
SELECT e.key AS track_key, e.est_plays, x.exact_plays,
       e.est_plays - x.exact_plays AS overestimate
FROM est e JOIN exact x ON e.key = x.key
ORDER BY e.est_plays DESC, track_key ASC
LIMIT {CMS_TOP_K}
"""


# ---------------------------------------------------------------------------
# grouped-aggregate pandas UDF (Arrow UDAF escape hatch)
# ---------------------------------------------------------------------------

def geomean_value_by_type(events: DataFrame) -> DataFrame:
    """Per-event-type geometric mean of positive event values via a
    GROUPED_AGG pandas UDF — the Arrow-batched custom-aggregator escape
    hatch, completing the UDF surface next to the scalar pandas UDF
    (ann_topk_pandas), grouped-map (cosine_pairs_blocked), mapInPandas
    (multimodal_features), and UDTF (chunk_documents_udtf) twins.

    Geometric mean is chosen BECAUSE it has an exact expression twin
    (exp(avg(ln x))) the oracle runs — the UDAF's correctness is
    hash-checked, not trusted. Each group's values arrive as one pandas
    Series per partition-group; partial aggregation does NOT apply to
    grouped-agg UDFs (the group's rows all shuffle to one task), which
    is the documented trade vs built-in algebraic aggregates — use this
    path only for aggregations Spark cannot express. Rounded to 6dp (log
    summation order differs between numpy pairwise and the oracle's
    sequential sum at ~1e-16)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        import numpy as np

        pos = v[v > 0]
        if pos.empty:
            return None
        return float(np.exp(np.log(pos.to_numpy(dtype="float64")).mean()))

    return (
        events.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.round(geomean("value"), 6).alias("geomean_value"))
    )


GEOMEAN_VALUE_SQL = """
SELECT event_type,
       round(exp(avg(CASE WHEN value > 0 THEN ln(value) END)), 6)
           AS geomean_value
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# time-series downsampling: OHLC bars (the resample/candlestick operator)
# ---------------------------------------------------------------------------


def events_minute_ohlc(events: DataFrame) -> DataFrame:
    """Per-minute OHLC bars over ``events.value`` — the classic
    time-series downsampling operator (resample → first/max/min/last).

    One hash aggregate keyed by the truncated minute: ``min_by``/``max_by``
    over a ``struct(ts, event_id)`` ordering pick open/close without any
    window sort, so the whole bar computes map-side-partial + one shuffle
    on the minute key. event_id breaks same-timestamp ties, making the
    bars deterministic under any partitioning. No float arithmetic at
    all (open/high/low/close are picked values, not sums), so the bars
    are bit-identical across engines by construction.

    At 100 TB the minute key is time-ordered and dense — the aggregate
    output is bounded by the time span (~0.5M rows/year), never by the
    input size; partition pruning on a date-partitioned layout feeds it
    incrementally.
    """
    ts = F.col("ts").cast("timestamp")
    return (
        events.filter(F.col("value").isNotNull())
        .groupBy(F.date_trunc("minute", ts).alias("minute"))
        .agg(
            F.expr(
                "min_by(value, struct(CAST(ts AS TIMESTAMP), event_id))"
            ).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.expr(
                "max_by(value, struct(CAST(ts AS TIMESTAMP), event_id))"
            ).alias("close"),
            F.count("*").alias("n_events"),
        )
    )


EVENTS_MINUTE_OHLC_SQL = """
SELECT date_trunc('minute', ts) AS minute,
       first(value ORDER BY ts, event_id)::DOUBLE AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       last(value ORDER BY ts, event_id)::DOUBLE AS close,
       COUNT(*) AS n_events
FROM events
WHERE value IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# robust outlier audit: median absolute deviation (MAD) per group
# ---------------------------------------------------------------------------

#: 1.4826 ≈ 1/Φ⁻¹(3/4) scales MAD to the stddev of a normal, so the
#: 3·σ̂ convention carries over unchanged to the robust estimator
MAD_SIGMA_SCALE = 1.4826
MAD_OUTLIER_K = 3.0


def mad_outlier_audit(events: DataFrame) -> DataFrame:
    """Per-event-type robust outlier audit: median + MAD (median absolute
    deviation) and the count/rate of values beyond median ±
    3·1.4826·MAD. Mean/stddev outlier gates are self-masking (one huge
    value inflates the stddev that is supposed to catch it); the MAD
    gate is what a data-quality pipeline actually ships.

    Two exact-percentile aggregates keyed by event_type (first the
    median, then the MAD over |v − median|) plus a final counting pass —
    three column-pruned scans, each one shuffle on a ~|event types|
    cardinality key, with the tiny per-type stats broadcast back. At
    100 TB swap ``percentile`` for ``percentile_approx`` (the documented
    trade — same plan shape, bounded-memory sketch); the exact form here
    is what the DuckDB oracle can replay bit-for-bit.
    """
    v = F.col("value")
    meds = events.filter(v.isNotNull()).groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = (
        events.filter(v.isNotNull())
        .join(F.broadcast(meds), "event_type")
        .withColumn("adev", F.abs(v - F.col("med")))
    )
    mads = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    cut = F.lit(MAD_OUTLIER_K * MAD_SIGMA_SCALE) * F.col("mad")
    return (
        dev.join(F.broadcast(mads), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.first("med"), 6).alias("median"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum((F.col("adev") > cut).cast("long")).alias("n_outliers"),
            F.round(
                F.avg((F.col("adev") > cut).cast("double")), 6
            ).alias("outlier_rate"),
        )
    )


MAD_OUTLIER_AUDIT_SQL = f"""
WITH meds AS (
    SELECT event_type, quantile_cont(value, 0.5) AS med
    FROM events WHERE value IS NOT NULL GROUP BY event_type
),
dev AS (
    SELECT e.event_type, ABS(e.value - m.med) AS adev, m.med
    FROM events e JOIN meds m USING (event_type)
    WHERE e.value IS NOT NULL
),
mads AS (
    SELECT event_type, quantile_cont(adev, 0.5) AS mad
    FROM dev GROUP BY event_type
)
SELECT d.event_type,
       COUNT(*) AS n,
       round(ANY_VALUE(d.med), 6) AS median,
       round(ANY_VALUE(m.mad), 6) AS mad,
       SUM((d.adev > {MAD_OUTLIER_K * MAD_SIGMA_SCALE!r} * m.mad)::BIGINT)
           ::BIGINT AS n_outliers,
       round(AVG((d.adev > {MAD_OUTLIER_K * MAD_SIGMA_SCALE!r} * m.mad)::INT),
             6) AS outlier_rate
FROM dev d JOIN mads m USING (event_type)
GROUP BY d.event_type
"""


# ---------------------------------------------------------------------------
# equi-height histogram (quantile-cut binning — no global sort)
# ---------------------------------------------------------------------------

EQUIHEIGHT_BUCKETS = 10


def value_equiheight_histogram(
    events: DataFrame, buckets: int = EQUIHEIGHT_BUCKETS
) -> DataFrame:
    """Equi-height (quantile-cut) histogram of ``events.value`` — the
    optimizer-statistics twin of the equi-width ``value_histogram``:
    bucket boundaries are the exact ``buckets``-quantiles, each row bins
    by counting how many boundaries it exceeds, and the output carries
    per-bucket count/share/min/max. Equi-height is what selectivity
    estimation wants (equal mass per bucket resolves skewed tails that
    equi-width smears into one bin).

    Shape: one exact-percentile aggregate produces the (buckets−1)-entry
    boundary array, broadcast to a fold-based bin expression — NO global
    sort and no ntile at any scale (an ntile would total-order the full
    relation); the counting pass is one hash aggregate on the bucket id.
    At 100 TB swap ``percentile`` for ``percentile_approx`` for the
    boundary pass — same plan shape.
    """
    qs = [i / buckets for i in range(1, buckets)]
    cuts = F.broadcast(
        events.filter(F.col("value").isNotNull()).agg(
            F.expr(
                f"percentile(value, array({', '.join(map(str, qs))}))"
            ).alias("bnds")
        )
    )
    bucket = F.aggregate(
        F.col("bnds"),
        F.lit(0),
        lambda acc, b: acc + (F.col("value") > b).cast("int"),
    ).cast("long")
    binned = (
        events.filter(F.col("value").isNotNull())
        .crossJoin(cuts)
        .select(bucket.alias("bucket"), "value")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )
    tot = F.broadcast(binned.agg(F.sum("n").alias("total")))
    return binned.crossJoin(tot).select(
        "bucket",
        "n",
        F.round(F.col("n") / F.col("total"), 6).alias("share"),
        "lo",
        "hi",
    )


VALUE_EQUIHEIGHT_HISTOGRAM_SQL = f"""
WITH cuts AS (
    SELECT quantile_cont(value,
        [{', '.join(str(i / EQUIHEIGHT_BUCKETS) for i in range(1, EQUIHEIGHT_BUCKETS))}]
    ) AS bnds
    FROM events WHERE value IS NOT NULL
),
binned AS (
    SELECT list_sum(list_transform(c.bnds, b -> (e.value > b)::INT))::BIGINT
               AS bucket,
           e.value
    FROM events e, cuts c WHERE e.value IS NOT NULL
),
agg AS (
    SELECT bucket, COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi
    FROM binned GROUP BY bucket
),
tot AS (SELECT SUM(n)::DOUBLE AS total FROM agg)
SELECT bucket, n, round(n / total, 6) AS share, lo, hi
FROM agg, tot
"""
