"""Window-function queries (SURVEY.md §2.B "Window functions").

Reference motivation: "current record" selection for MRG/A40 merges
(latest message per patient), successive-update deltas (A31), cumulative
ingest volume.

Scale notes: every window here partitions by a key (user/customer) —
no global unpartitioned window over big data except q_sort_multi's
explicitly-global listing rank.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hcls_data_lake_spark.queries.common import t
from hcls_data_lake_spark.registry import register


@register(
    "q_win_rank",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER w AS BIGINT) AS rn,
             CAST(rank() OVER w AS BIGINT) AS rnk,
             CAST(dense_rank() OVER w AS BIGINT) AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey ASC)
    ) WHERE rn <= 3
    """,
)
def q_win_rank(spark, sf_dir):
    """row_number/rank/dense_rank — latest-N messages per entity (the
    MRG/A40 "current record" pattern)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_win_lag",
    """
    SELECT event_id, user_id, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           ROUND(value - COALESCE(lag(value) OVER w, value), 2) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_lag(spark, sf_dir):
    """lag/lead — successive-update delta (A31 updates)."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return e.select(
        "event_id",
        "user_id",
        "value",
        prev.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(F.col("value") - F.coalesce(prev, F.col("value")), 2).alias("delta"),
    )


@register(
    "q_win_running",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW), 2)
               AS running_value,
           CAST(count(*) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS BIGINT)
               AS running_n
    FROM events
    """,
)
def q_win_running(spark, sf_dir):
    """Running aggregate with an explicit ROWS frame (cumulative ingest
    volume per source)."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("running_n"),
    )


@register(
    "q_win_range_frame",
    """
    SELECT event_id, user_id, ts_sec,
           CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts_sec
                               RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_last_10min,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts_sec
                                  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW),
                 2) AS sum_last_10min
    FROM (SELECT event_id, user_id, value,
                 CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
          FROM events)
    """,
)
def q_win_range_frame(spark, sf_dir):
    """RANGE frame over event-time seconds — sliding per-entity rate
    (10-minute trailing window)."""
    e = t(spark, sf_dir, "events").withColumn(
        "ts_sec", F.floor(F.col("ts_ns") / F.lit(1_000_000_000)).cast("bigint")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts_sec",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_last_10min"),
        F.round(F.sum("value").over(w), 2).alias("sum_last_10min"),
    )


@register(
    "q_win_ntile_firstlast",
    """
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey) AS BIGINT)
               AS quartile,
           first_value(c_custkey) OVER (PARTITION BY c_mktsegment
                                        ORDER BY c_acctbal DESC, c_custkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND UNBOUNDED FOLLOWING)
               AS richest,
           last_value(c_custkey) OVER (PARTITION BY c_mktsegment
                                       ORDER BY c_acctbal DESC, c_custkey
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND UNBOUNDED FOLLOWING)
               AS poorest
    FROM customer
    """,
)
def q_win_ntile_firstlast(spark, sf_dir):
    """ntile / first / last over a full-partition frame (cohort
    bucketing)."""
    c = t(spark, sf_dir, "customer")
    order = [F.col("c_acctbal").desc(), F.col("c_custkey")]
    w = Window.partitionBy("c_mktsegment").orderBy(*order)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.first("c_custkey").over(wf).alias("richest"),
        F.last("c_custkey").over(wf).alias("poorest"),
    )


@register(
    "q_topk_per_group",
    """
    SELECT * FROM (
      SELECT n_name AS nation_name, s_suppkey, s_acctbal,
             CAST(row_number() OVER (PARTITION BY n_name
                                     ORDER BY s_acctbal DESC, s_suppkey)
                  AS BIGINT) AS rn
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    ) WHERE rn <= 2
    """,
)
def q_topk_per_group(spark, sf_dir):
    """Top-k per group (top senders per zone): broadcast dim join then
    rank-filter; only k rows per group survive the window."""
    s = t(spark, sf_dir, "supplier")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    w = Window.partitionBy("n_name").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation_name"),
            "s_suppkey",
            "s_acctbal",
            F.row_number().over(Window.partitionBy("n_name").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 2)
    )


@register(
    "q_win_percent",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(percent_rank() OVER w, 6) AS pr,
           ROUND(cume_dist() OVER w, 6) AS cd
    FROM lineitem
    WHERE l_orderkey < 400
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey,
                 l_linenumber)
    """,
)
def q_win_percent(spark, sf_dir):
    """Relative-rank window functions (percent_rank / cume_dist) —
    distribution position of each observation within its cohort."""
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 400)
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "q_win_ratio",
    """
    WITH c AS (
      SELECT o_custkey, o_orderkey,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey < 5000
    )
    SELECT o_custkey, o_orderkey,
           (cents * 1000000) // SUM(cents) OVER (PARTITION BY o_custkey)
               / 1000000.0 AS share_of_customer,
           CAST(SUM(cents) OVER (PARTITION BY o_custkey) AS BIGINT)
               AS cust_total_cents
    FROM c
    """,
)
def q_win_ratio(spark, sf_dir):
    """Ratio-to-report: each order's share of its customer's total — an
    UNORDERED partition aggregate window (no frame, no sort within the
    partition), the cheapest window class: one hash shuffle on the key,
    full-partition aggregate joined back to its rows by the window
    operator. Shares are integer parts-per-million
    (`cents*1e6 div total`), never round(x/y) — the quotient lands on
    half-way boundaries where engine rounding diverges."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    c = o.select("o_custkey", "o_orderkey", cents.alias("cents"))
    total = "sum(cents) over (partition by o_custkey)"
    return c.select(
        "o_custkey",
        "o_orderkey",
        (F.expr(f"(cents * 1000000) div ({total})") / 1000000.0).alias(
            "share_of_customer"
        ),
        F.expr(total).cast("bigint").alias("cust_total_cents"),
    )


@register(
    "q_win_distinct",
    """
    SELECT event_id, user_id,
           CAST(count(DISTINCT event_type)
                OVER (PARTITION BY user_id) AS INTEGER) AS n_types
    FROM events
    WHERE event_id < 3000
    """,
)
def q_win_distinct(spark, sf_dir):
    """Distinct-count window: how many distinct event types each user
    has, attached to every event row (the per-entity diversity signal
    behind engagement scoring). Spark has no DISTINCT window aggregate;
    the idiomatic form is size(collect_set() OVER (PARTITION BY ...)) —
    set semantics give exact distinct counts and the unordered window
    needs one hash shuffle, no sort. Set size is bounded by the
    attribute's cardinality (5 event types), so state per partition
    never grows with row count."""
    e = t(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    w = Window.partitionBy("user_id")
    return e.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_types"),
    )


@register(
    "q_win_median",
    """
    SELECT event_id,
           event_type,
           ROUND(quantile_cont(value, 0.5)
                 OVER (PARTITION BY event_type), 4) AS median_value,
           ROUND(value - quantile_cont(value, 0.5)
                 OVER (PARTITION BY event_type), 4) AS deviation
    FROM events
    """,
)
def q_win_median(spark, sf_dir):
    """Exact median annotation: every event is annotated with its
    type's median and its deviation from it — the robust-center analog
    of the z-score, feeding outlier review queues. Spark `percentile`
    and DuckDB `quantile_cont` share linear interpolation, so
    annotations are engine-identical.

    Scale shape (r13): the oracle's unordered window PARTITION BY
    event_type would funnel the whole fact through ≤5 reducers, each
    buffering its partition's values (the r12 close-out's
    low-cardinality-window hazard). The engine computes the SAME
    median as a `percentile` AGGREGATE — bit-identical by
    construction: window and aggregate evaluate the same Percentile
    expression over the same per-group value multiset (one counts-map
    buffer either way), but the aggregate gets map-side partial
    aggregation (per-task buffers bounded by the group's distinct
    VALUES, not its rows) — and attaches it back with a broadcast
    join, so the fact is never shuffled at all."""
    e = t(spark, sf_dir, "events")
    med = (
        e.groupBy(F.col("event_type").alias("_mgrp"))
        .agg(F.expr("percentile(value, 0.5)").alias("_med"))
    )
    return (
        e.join(
            F.broadcast(med), F.col("event_type").eqNullSafe(F.col("_mgrp"))
        )
        .select(
            "event_id",
            "event_type",
            F.round(F.col("_med"), 4).alias("median_value"),
            F.round(F.col("value") - F.col("_med"), 4).alias("deviation"),
        )
    )


@register(
    "q_win_streak_islands",
    """
    WITH seq AS (
      SELECT o_custkey, o_orderdate, o_orderkey,
             CASE WHEN o_totalprice > lag(o_totalprice) OVER w
                  THEN 0 ELSE 1 END AS brk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey)
    ), isl AS (
      SELECT o_custkey,
             SUM(brk) OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey
                            ROWS UNBOUNDED PRECEDING) AS streak_id
      FROM seq
    ), lens AS (
      SELECT o_custkey, streak_id, CAST(count(*) AS BIGINT) AS len
      FROM isl GROUP BY o_custkey, streak_id
    ), best AS (
      SELECT o_custkey, MAX(len) AS max_streak FROM lens
      GROUP BY o_custkey
    )
    SELECT CAST(max_streak AS BIGINT) AS max_streak,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM best GROUP BY max_streak
    """,
)
def q_win_streak_islands(spark, sf_dir):
    """Gaps-and-islands streak detection: per customer, the longest
    run of consecutive orders (by order date, ties by key) with
    strictly increasing totals; output is the distribution of that
    max-streak length across customers. The islands come from the
    standard two-window trick — a LAG comparison marks each
    non-increase as a break, and a running SUM of breaks numbers the
    islands — so the whole query is two window passes and two
    aggregations over ONE partitioning (o_custkey): a single shuffle
    at any scale, with per-customer sort cost and no self-join. The
    break flag and island id are integers and the comparison is on
    the stored doubles both engines read identically, so the
    distribution hash-checks cross-engine."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = t(spark, sf_dir, "orders")
    seq = o.withColumn(
        "brk",
        F.when(
            F.col("o_totalprice") > F.lag("o_totalprice").over(w), F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn(
        "streak_id",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    lens = seq.groupBy("o_custkey", "streak_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    best = lens.groupBy("o_custkey").agg(F.max("len").alias("max_streak"))
    return best.groupBy(F.col("max_streak").cast("bigint")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )


@register(
    "q_win_pattern_seq",
    """
    WITH seq AS (
      SELECT user_id,
             event_type AS a,
             lead(event_type, 1) OVER w AS b,
             lead(event_type, 2) OVER w AS c
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
    ), per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN a = 'view' AND b = 'click'
                           AND c = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_matches
      FROM seq GROUP BY user_id
    )
    SELECT n_matches, CAST(count(*) AS BIGINT) AS n_users
    FROM per_user GROUP BY n_matches
    """,
)
def q_win_pattern_seq(spark, sf_dir):
    """Row-pattern recognition (the MATCH_RECOGNIZE `PATTERN (A B C)`
    of Trino/Flink, expressed as window composition): per user, count
    STRICTLY CONSECUTIVE view→click→purchase runs in the event
    sequence, reported as the match-count distribution across users.
    Two LEADs over one (user, time, event_id)-ordered window turn each
    row into its own 3-row pattern window, so matching is a pure
    projection — no self-join, no per-row regex state machine — and
    the whole query (window + both aggregations) rides the single
    user_id shuffle. The ordering is total (event_id tie-break), so
    both engines see identical sequences; all time math is raw integer
    nanoseconds. Longer patterns are more LEADs; gapped patterns
    compose this with the sessionize islands (q_ts_sessionize) —
    window-library row-pattern matching, linear cost at any scale."""
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts_ns"
    )
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("a"),
        F.lead("event_type", 1).over(w).alias("b"),
        F.lead("event_type", 2).over(w).alias("c"),
    )
    per_user = seq.groupBy("user_id").agg(
        F.sum(
            F.when(
                (F.col("a") == "view")
                & (F.col("b") == "click")
                & (F.col("c") == "purchase"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_matches")
    )
    return per_user.groupBy("n_matches").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
