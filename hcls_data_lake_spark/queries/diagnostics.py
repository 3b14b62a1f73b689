"""Operational diagnostics a 100 TB lake runs BEFORE queries: key-skew
census (pick salting / AQE-skew-join candidates from data, not from a
failed job) and a single-pass column-profile report (null/distinct
census — the data-quality gate the reference's registry table implies
for every ingested batch).

These are first-class queries, not dev scripts: at scale a skewed join
key is discovered by exactly this census (cheap: one partial-agg
shuffle over keyed counts), and a profile report is the canonical
pre-flight for schema drift. Both are pure relational plans with exact
integer ratios (``x * 10000 div n`` basis points), so they oracle-hash
across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

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
