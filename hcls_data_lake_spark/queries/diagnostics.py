"""Operational diagnostics a 100 TB lake runs BEFORE queries: key-skew
census (pick salting / AQE-skew-join candidates from data, not from a
failed job), a single-pass column-profile report (null/distinct
census — the data-quality gate the reference's registry table implies
for every ingested batch), a referential-integrity orphan audit, and
a partition-completeness census. (Declarative per-column constraint
rules live in q_analytics_expectations — the one-scan conditional-sum
audit in queries/analytics.py; these diagnostics cover what that
single-table shape cannot: cross-table integrity and freshness.)

These are first-class queries, not dev scripts: at scale a skewed join
key is discovered by exactly this census (cheap: one partial-agg
shuffle over keyed counts), and a profile report is the canonical
pre-flight for schema drift. All are pure relational plans with exact
integer ratios (``x * 10000 div n`` basis points), so they oracle-hash
across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hcls_data_lake_spark.queries.common import t
from hcls_data_lake_spark.registry import register


@register(
    "q_diag_key_skew",
    """
    WITH counts AS (
      SELECT l_suppkey AS suppkey, CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT suppkey, n,
           CAST(n * 10000 // SUM(n) OVER () AS BIGINT) AS share_bps
    FROM counts
    ORDER BY n DESC, suppkey
    LIMIT 10
    """,
)
def q_diag_key_skew(spark, sf_dir):
    """Join/shuffle-key skew census: per-key row counts on the
    candidate shuffle key, top-10 heavy hitters with an EXACT integer
    share in basis points. This is the operator that decides whether a
    join gets salted (q_join_salted_skew) or left to AQE's skew-join
    split — measured from data, before the big job runs.

    Cost shape at 100 TB: one map-side partial count + one shuffle of
    (key, count) pairs — never the payload; the global total is a
    window over the already-keyed counts (|keys| rows, not |rows|).
    Top-10 selection is deterministic: count desc, key asc tie-break.
    """
    counts = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # global total as a broadcast 1-row join, NOT an empty-partition
    # window: the window form funnels every keyed count through a
    # single partition — harmless at |keys| rows, but the broadcast
    # scalar keeps the plan shape clean at any key cardinality
    total = counts.agg(F.sum("n").alias("total_n"))
    return (
        counts.join(F.broadcast(total))
        .select(
            "suppkey", "n", F.expr("n * 10000 div total_n").alias("share_bps")
        )
        .orderBy(F.col("n").desc(), "suppkey")
        .limit(10)
    )


_PROFILE_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey", "o_orderdate")


@register(
    "q_diag_profile",
    "\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS col_name,
           CAST(count(*) - count({c}) AS BIGINT) AS n_null,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM orders
    """
        for c in _PROFILE_COLS
    ),
)
def q_diag_profile(spark, sf_dir):
    """Single-pass column-profile census over orders: per column the
    null count and EXACT distinct count, emitted long-form
    (col_name, n_null, n_distinct) — the data-quality pre-flight the
    reference's per-batch registry gate generalizes to.

    All four columns profile in ONE aggregation job: Spark plans the
    multi-distinct agg with an Expand (one replicated stream per
    distinct column) — 4x the scan rows through a partial agg, but a
    single pass over storage, which at 100 TB is the term that
    matters. The 1-row wide result is then stacked to long form with
    zero extra jobs. For wider profiles (100s of columns) the same
    shape swaps exact distinct for approx_count_distinct to drop the
    Expand; here the oracle needs exactness and 4 columns is cheap.
    """
    o = t(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"cnt_{c}"))
        aggs.append(F.countDistinct(c).alias(f"dst_{c}"))
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n_rows - cnt_{c}, dst_{c}" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args})"
        " AS (col_name, n_null, n_distinct)"
    ).select(
        "col_name",
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )


# FK relationships audited: (label, child, child_key, parent, parent_key,
# broadcast_parent). lineitem->orders is big-big (shuffle anti join);
# the dimension parents broadcast.
_FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey", False),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey", True),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey", True),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey", True),
)


@register(
    "q_diag_referential",
    "\nUNION ALL\n".join(
        f"""
    SELECT '{label}' AS fk_edge,
           CAST((SELECT count(*) FROM {child} c
                 WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                                   WHERE p.{pkey} = c.{ckey})) AS BIGINT)
             AS n_orphans,
           CAST((SELECT count(*) FROM {child}) AS BIGINT) AS n_child_rows
    """
        for label, child, ckey, parent, pkey, _ in _FK_EDGES
    ),
)
def q_diag_referential(spark, sf_dir):
    """Referential-integrity audit: for each declared FK edge, the count
    of child rows whose key has no matching parent (orphans) next to
    the child's total row count — long-form (fk_edge, n_orphans,
    n_child_rows). The pre-flight that catches a partial parent load or
    a botched CDC apply BEFORE a silent inner join drops the rows.

    Scale shape: each edge is ONE left join on the key (parent keys
    are primary keys, so the join never duplicates child rows) feeding
    ONE aggregate that counts rows and unmatched rows together — the
    child is scanned once per edge and only (key) columns move.
    Dimension parents (supplier/customer/nation) broadcast so three of
    the four edges are map-side; lineitem->orders is a genuine big-big
    shuffle join on the natural key, which AQE sizes. On healthy TPC-H
    data every n_orphans is 0; the value of the operator is that the
    zero is PROVEN per edge, per batch."""
    from functools import reduce

    from pyspark.sql import DataFrame

    parts: list[DataFrame] = []
    for label, child, ckey, parent, pkey, bcast in _FK_EDGES:
        c = t(spark, sf_dir, child).select(F.col(ckey).alias("k"))
        p = (
            t(spark, sf_dir, parent)
            .select(F.col(pkey).alias("k"))
            .withColumn("_hit", F.lit(1))
        )
        if bcast:
            p = F.broadcast(p)
        parts.append(
            c.join(p, "k", "left")
            .agg(
                # count-of-when, not sum-of-when: SUM over an EMPTY
                # child (a failed load — exactly what this audit
                # exists to catch) is NULL, while the oracle's count
                # is 0; COUNT is 0 on empty in both engines
                F.count(F.when(F.col("_hit").isNull(), True))
                .cast("long")
                .alias("n_orphans"),
                F.count(F.lit(1)).cast("long").alias("n_child_rows"),
            )
            .select(
                F.lit(label).alias("fk_edge"), "n_orphans", "n_child_rows"
            )
        )
    return reduce(DataFrame.unionByName, parts)


@register(
    "q_diag_completeness",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(count(DISTINCT o_orderdate) AS BIGINT) AS n_days_present,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_diag_completeness(spark, sf_dir):
    """Partition-completeness census: per calendar month of the orders
    ingest-date column, the number of DISTINCT days that actually have
    data plus the row count — the freshness/completeness pre-flight
    that catches a missing daily partition (n_days_present below the
    month's day count) before a downstream backfill reads a hole.

    Scale shape: one partial-agg shuffle keyed on ~84 months; the
    distinct-day count nests inside the same aggregate (days<=31 per
    month, so the partial distinct set stays tiny). On a date-
    partitioned lake the scan prunes to the audited range for free."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("month")
        )
        .agg(
            F.countDistinct("o_orderdate").alias("n_days_present"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "month",
            F.col("n_days_present").cast("long").alias("n_days_present"),
            F.col("n_rows").cast("long").alias("n_rows"),
        )
        .orderBy("month")
    )


# Benford first-digit expectation, parts-per-million. round(log10(1 +
# 1/d) * 1e6) — PRECOMPUTED as integer literals so both engines share
# the exact table instead of each computing its own float log10 (the
# one place a ULP could diverge cross-engine).
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


@register(
    "q_diag_benford",
    f"""
    WITH exp_t(digit, exp_ppm) AS (VALUES
      {", ".join(f"({d}, {p})" for d, p in sorted(_BENFORD_PPM.items()))}
    ), digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                    AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0
    ), counted AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(count(*)) OVER () AS BIGINT) AS total
      FROM digits GROUP BY digit
    )
    SELECT c.digit, c.n,
           CAST(c.n * 1000000 // c.total AS BIGINT) AS ppm,
           CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
           CAST(abs(c.n * 1000000 // c.total - e.exp_ppm) AS BIGINT)
             AS dev_ppm
    FROM counted c JOIN exp_t e USING (digit)
    """,
)
def q_diag_benford(spark, sf_dir):
    """Benford's-law first-digit audit over order totals: observed
    first-digit frequency (ppm, exact integer division) against the
    Benford expectation, with the absolute deviation per digit — the
    classic fraud / synthetic-data screen (fabricated amounts flunk
    the logarithmic digit curve). The expectation table ships as
    integer ppm LITERALS shared verbatim with the oracle, so no
    cross-engine float log10 enters the hash. One aggregation over the
    fact table (9-row output), one broadcast of the 1-row total —
    at 100 TB this is a single partial-agg shuffle, the cheapest audit
    in the diagnostics pack."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = o.select(
        F.substring(
            F.expr("cast(cast(floor(o_totalprice) as bigint) as string)"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    counted = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # The grand total comes from a global window over the 9-row digit
    # aggregate — NOT a second aggregation branch, which would scan the
    # fact table twice (no cross-branch subplan sharing in Spark). The
    # "global window" scale smell doesn't apply: its input is ≤ 9 rows
    # whatever the fact volume.
    from pyspark.sql.window import Window

    exp_df = spark.createDataFrame(
        sorted(_BENFORD_PPM.items()), "digit int, exp_ppm bigint"
    )
    return (
        counted.withColumn(
            "total", F.sum("n").over(Window.partitionBy()).cast("bigint")
        )
        .withColumn(
            "ppm", F.expr("cast(n * 1000000 div total as bigint)")
        )
        .join(F.broadcast(exp_df), "digit")
        .select(
            "digit",
            "n",
            "ppm",
            "exp_ppm",
            F.expr("cast(abs(ppm - exp_ppm) as bigint)").alias("dev_ppm"),
        )
    )


@register(
    "q_diag_sequence_gaps",
    """
    WITH k AS (
      SELECT DISTINCT o_orderkey AS id FROM orders
      WHERE o_orderstatus = 'F'
    ), marked AS (
      SELECT id,
             CASE WHEN id - lag(id) OVER (ORDER BY id) > 1
                  THEN 1 ELSE 0 END AS brk
      FROM k
    ), isl AS (
      SELECT id, SUM(brk) OVER (ORDER BY id
                                ROWS UNBOUNDED PRECEDING) AS run_id
      FROM marked
    ), runs AS (
      SELECT run_id, MIN(id) AS run_start, MAX(id) AS run_end
      FROM isl GROUP BY run_id
    )
    SELECT * FROM (
      SELECT CAST(run_end + 1 AS BIGINT) AS gap_start,
             CAST(lead(run_start) OVER (ORDER BY run_start) - 1 AS BIGINT)
               AS gap_end,
             CAST(lead(run_start) OVER (ORDER BY run_start) - run_end - 1
                  AS BIGINT) AS n_missing
      FROM runs)
    WHERE gap_end IS NOT NULL
    ORDER BY n_missing DESC, gap_start
    LIMIT 20
    """,
)
def q_diag_sequence_gaps(spark, sf_dir):
    """Missing-id detection: the top-20 largest gap RANGES in the
    completed-order key sequence (start, end, count of absent keys) —
    the data-loss audit every ingest pipeline with monotonically
    assigned ids runs ("keys 14–17 never arrived"), reported as
    ranges because at 100 TB the missing-key LIST can be larger than
    the table. The audited sequence is the keys that reached status
    'F' (the fixture assigns ids densely, so the filtered subset is
    what a partially-landed zone looks like — exactly the audit's
    production shape: which admitted ids are missing) — no
    generate_series materialization of the full key domain (the naive
    anti-join against a generated sequence scans the domain, not the
    data). Scale shape (r7): a gap is exactly a CONSECUTIVE pair of
    present keys with difference > 1, so instead of the single-
    reducer lag/running-sum island walk, the distinct keys get a
    range-partitioned global rank (``with_global_order``,
    operators/ordered.py) and each key equi-joins its successor on
    rank+1 — a hash join on the dense rank key, never one partition
    holding the key universe. The oracle keeps the textbook
    gaps-and-islands spelling (same gap set by construction); top-20
    selection is a deterministic (n_missing DESC, gap_start)
    TakeOrdered."""
    from hcls_data_lake_spark.operators.ordered import with_global_order

    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("id"))
        .distinct()
    )
    ranked = with_global_order(o, [F.col("id")], rank_col="rk")
    nxt = ranked.select(
        F.col("id").alias("next_id"), (F.col("rk") - 1).alias("rk")
    )
    return (
        ranked.join(nxt, "rk")
        .filter(F.col("next_id") - F.col("id") > 1)
        .select(
            (F.col("id") + 1).cast("bigint").alias("gap_start"),
            (F.col("next_id") - 1).cast("bigint").alias("gap_end"),
            (F.col("next_id") - F.col("id") - 1)
            .cast("bigint")
            .alias("n_missing"),
        )
        .orderBy(F.col("n_missing").desc(), "gap_start")
        .limit(20)
    )


# Fixed half-split instant for the drift audit (mid-January of the
# fixture's event window), shared verbatim with the oracle.
_DRIFT_SPLIT_NS = 1_705_363_200_000_000_000  # 2024-01-16T00:00:00Z


@register(
    "q_diag_distribution_drift",
    f"""
    WITH b AS (
      SELECT event_type AS grp,
             CASE WHEN epoch_ns(ts) < {_DRIFT_SPLIT_NS}
                  THEN 'h1' ELSE 'h2' END AS half,
             CAST(round(value * 100) AS BIGINT) // 5000 AS bucket
      FROM events
    ), cells AS (
      SELECT grp, bucket,
             CAST(SUM(CASE WHEN half = 'h1' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN half = 'h2' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n2
      FROM b GROUP BY grp, bucket
    ), tots AS (
      SELECT grp, CAST(SUM(n1) AS BIGINT) AS t1,
             CAST(SUM(n2) AS BIGINT) AS t2
      FROM cells GROUP BY grp
    )
    SELECT c.grp, t.t1, t.t2,
           CAST(SUM(abs(CAST(c.n1 AS HUGEINT) * t.t2
                        - CAST(c.n2 AS HUGEINT) * t.t1)) * 1000000
                // (2 * CAST(t.t1 AS HUGEINT) * t.t2) AS BIGINT)
             AS tv_ppm
    FROM cells c JOIN tots t USING (grp)
    GROUP BY c.grp, t.t1, t.t2
    """,
)
def q_diag_distribution_drift(spark, sf_dir):
    """Distribution-drift audit: per event type, the total-variation
    distance between the value distribution of the window's first and
    second half, in exact ppm — the drift screen an ML feature
    pipeline runs before retraining (PSI is the industry habit, but
    its ln() makes it float and engine-dependent; TV distance
    ½Σ|p−q| carries the same signal and evaluates as ONE
    cross-multiplied integer expression, Σ|n1·T2 − n2·T1|·10⁶ div
    (2·T1·T2), exact at any scale under the HHI DECIMAL/HUGEINT
    promotion discipline). Values bucket into fixed 50-unit cells;
    both halves aggregate in a single conditional pass (no second
    fact scan), and the per-group reduce runs over the
    dimension-sized cell relation. tv_ppm = 0 means identical
    histograms; 10⁶ means disjoint support."""
    e = t(spark, sf_dir, "events")
    b = e.select(
        F.col("event_type").alias("grp"),
        F.when(F.col("ts_ns") < _DRIFT_SPLIT_NS, "h1")
        .otherwise("h2")
        .alias("half"),
        F.expr("cast(round(value * 100) as bigint) div 5000").alias(
            "bucket"
        ),
    )
    cells = b.groupBy("grp", "bucket").agg(
        F.sum(F.when(F.col("half") == "h1", 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("half") == "h2", 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )
    tots = cells.groupBy("grp").agg(
        F.sum("n1").cast("bigint").alias("t1"),
        F.sum("n2").cast("bigint").alias("t2"),
    )
    return (
        cells.join(F.broadcast(tots), "grp")
        .groupBy("grp", "t1", "t2")
        .agg(
            F.expr(
                "cast(sum(abs(cast(n1 as decimal(38,0)) * t2"
                " - cast(n2 as decimal(38,0)) * t1)) * 1000000"
                " div (2 * cast(t1 as decimal(38,0)) * t2) as bigint)"
            ).alias("tv_ppm")
        )
    )


@register(
    "q_diag_volume_anomaly",
    """
    WITH daily AS (
      SELECT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ), trailed AS (
      SELECT d, n,
             SUM(n) OVER (ORDER BY d
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trail7,
             row_number() OVER (ORDER BY d) AS rn
      FROM daily
    )
    SELECT CAST(d AS BIGINT) AS d_day, n,
           CAST(trail7 AS BIGINT) AS trail7_n,
           CAST(n * 7 * 10000 // trail7 AS BIGINT) AS vol_bp,
           CAST(CASE WHEN n * 7 * 100 < 70 * trail7 THEN 1
                     WHEN n * 7 * 100 > 130 * trail7 THEN 2
                     ELSE 0 END AS INT) AS anomaly
    FROM trailed WHERE rn >= 8
    """,
)
def q_diag_volume_anomaly(spark, sf_dir):
    """Ingest-volume anomaly monitor — the data-ops alarm that catches
    a silently broken feed (upstream outage, duplicate replay) before
    it poisons downstream training data: each day's row count is
    compared to its trailing-7-day window (STRICTLY prior days, so
    today's anomaly can't dilute its own baseline), entirely in
    integers — vol_bp = n·7·10⁴ div trail7 is today's volume in basis
    points of the trailing mean, and the ±30% alarm band is the
    cross-multiplied comparison n·7·100 <?> {70,130}·trail7, no
    division at all (anomaly: 1 = volume drop, 2 = volume spike).
    The first 7 days are excluded (rn >= 8), not emitted with a
    partial baseline — a monitor that alarms on its own warm-up is
    noise. Plan: one fact shuffle to the calendar-bounded daily
    relation, one window frame over it; at 100 TB the daily relation
    is still just days — the monitor's cost is one partial-agg scan
    of the day's partition, the shape a per-partition ingest audit
    needs."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr("cast(ts_ns div 86400000000000 as bigint)").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w7 = Window.orderBy("d").rowsBetween(-7, -1)
    wo = Window.orderBy("d")
    trailed = daily.select(
        "d",
        "n",
        F.sum("n").over(w7).alias("trail7"),
        F.row_number().over(wo).alias("rn"),
    )
    return trailed.filter(F.col("rn") >= 8).select(
        F.col("d").cast("bigint").alias("d_day"),
        "n",
        F.col("trail7").cast("bigint").alias("trail7_n"),
        F.expr("cast(n * 7 * 10000 div trail7 as bigint)").alias("vol_bp"),
        F.expr(
            "cast(case when n * 7 * 100 < 70 * trail7 then 1"
            " when n * 7 * 100 > 130 * trail7 then 2"
            " else 0 end as int)"
        ).alias("anomaly"),
    )


@register(
    "q_diag_key_uniqueness",
    """
    WITH li AS (
      SELECT l_orderkey, l_linenumber FROM lineitem
    )
    SELECT 'lineitem(l_orderkey,l_linenumber)' AS candidate_key,
           CAST((SELECT count(*) FROM li) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_distinct_keys,
           CAST(count(*) FILTER (WHERE cnt > 1) AS BIGINT)
             AS n_violating_keys,
           CAST(max(cnt) AS BIGINT) AS max_multiplicity
    FROM (SELECT l_orderkey, l_linenumber, count(*) AS cnt
          FROM li GROUP BY 1, 2)
    UNION ALL
    SELECT 'orders(o_orderkey)',
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE cnt > 1) AS BIGINT),
           CAST(max(cnt) AS BIGINT)
    FROM (SELECT o_orderkey, count(*) AS cnt
          FROM orders GROUP BY 1)
    UNION ALL
    SELECT 'customer(c_custkey)',
           CAST((SELECT count(*) FROM customer) AS BIGINT),
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE cnt > 1) AS BIGINT),
           CAST(max(cnt) AS BIGINT)
    FROM (SELECT c_custkey, count(*) AS cnt
          FROM customer GROUP BY 1)
    """,
)
def q_diag_key_uniqueness(spark, sf_dir):
    """PRIMARY-KEY UNIQUENESS CENSUS — the audit every warehouse
    should run before any query PARTITIONS BY a "unique" key: for
    each candidate key, total rows vs distinct keys, how many keys
    violate, and the worst multiplicity. Spark enforces no
    constraints, so a duplicated key is silent until a window
    partitioned on it merges two entities' rows — exactly how this
    fixture's non-unique lineitem (l_orderkey, l_linenumber) turned
    a largest-remainder tie nondeterministic in
    q_join_interval_allocate (found by a 1-cent cross-engine flip;
    this census would have flagged it up front: the key violates at
    every SF). orders and customer keys verify clean, so the report
    carries both a red row and green rows.

    100 TB: one groupBy per candidate key shuffling KEY COLUMNS
    only (no payload), each collapsing map-side to per-key counts;
    the census is four scalars per key. This is the cheap pre-flight
    that decides whether downstream windows may trust the key."""
    def census(df, cols, label):
        per_key = df.groupBy(*cols).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        return per_key.agg(
            F.lit(label).alias("candidate_key"),
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_keys"),
            F.expr(
                "cast(count(case when cnt > 1 then 1 end) as bigint)"
            ).alias("n_violating_keys"),
            F.max("cnt").cast("bigint").alias("max_multiplicity"),
        )

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey")
    c = t(spark, sf_dir, "customer").select("c_custkey")
    return (
        census(li, ["l_orderkey", "l_linenumber"],
               "lineitem(l_orderkey,l_linenumber)")
        .unionByName(census(o, ["o_orderkey"], "orders(o_orderkey)"))
        .unionByName(
            census(c, ["c_custkey"], "customer(c_custkey)")
        )
    )
