"""Subquery surface: scalar, correlated, IN, NOT EXISTS.

The reference exposes its lake to Athena/analysts (README blog framing;
retrieval surface SURVEY.md §3.3), where subqueries are table stakes.
Catalyst decorrelates every subquery into a join before physical
planning, so the idiomatic DataFrame expression IS the decorrelated
form: scalar subquery -> aggregate + broadcast cross-join, IN ->
left-semi, NOT EXISTS -> left-anti, correlated aggregate -> groupBy +
equi-join. The oracles keep the literal subquery syntax so parity
proves the decorrelation is semantics-preserving.

Float discipline (see q_agg_global history): thresholds derived from
SUM/AVG are compared in integer cents — `price*100` rounded per row is
exact in both engines, integer sums are order-independent, and
`cents * n > sum_cents` avoids every float-division boundary.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hcls_data_lake_spark.queries.common import t
from hcls_data_lake_spark.registry import register


@register(
    "q_subquery_scalar",
    """
    WITH c AS (
      SELECT p_brand,
             CAST(round(p_retailprice * 100, 0) AS BIGINT) AS cents
      FROM part
    )
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n_above
    FROM c
    WHERE cents * (SELECT count(*) FROM c)
          > (SELECT CAST(SUM(cents) AS BIGINT) FROM c)
    GROUP BY p_brand
    """,
)
def q_subquery_scalar(spark, sf_dir):
    """Uncorrelated scalar subquery: parts priced above the global mean
    price, counted per brand. DataFrame form: the one-row aggregate is
    broadcast cross-joined against the scan — one pass over `part`,
    no driver round-trip, and the comparison `cents * n > sum_cents`
    stays in exact integer arithmetic (a float mean would make
    boundary rows engine-dependent)."""
    p = t(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100, 0).cast("long")
    c = p.select("p_brand", cents.alias("cents"))
    stats = c.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("cents").alias("_sum_cents"),
    )
    return (
        c.join(F.broadcast(stats))
        .filter(F.col("cents") * F.col("_n") > F.col("_sum_cents"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


@register(
    "q_subquery_correlated",
    """
    SELECT CAST(CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                     AS BIGINT) // 7 AS BIGINT) / 100.0 AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_small
    FROM lineitem l1
    WHERE l_quantity * 5
          * (SELECT count(*) FROM lineitem l2
             WHERE l2.l_partkey = l1.l_partkey)
          < (SELECT CAST(SUM(l_quantity) AS BIGINT) FROM lineitem l3
             WHERE l3.l_partkey = l1.l_partkey)
    """,
)
def q_subquery_correlated(spark, sf_dir):
    """Correlated scalar subqueries (TPC-H Q17 shape): revenue from
    lineitems whose quantity is below 20% of their part's mean
    quantity. DataFrame form computes the per-part aggregate once
    (groupBy partkey) and equi-joins it back — the decorrelation
    Catalyst would do, written directly, so the fact table is scanned
    twice and shuffled once on the join key; AQE broadcasts the
    per-part aggregate when it is small. `qty * 5 * n < sum_qty` is the
    exact-integer form of `qty < 0.2 * avg(qty)` (quantities are
    whole-valued doubles), and the final division is integer
    `div 7` so the output never rounds across a float boundary."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("_cents"),
    )
    per_part = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("l_quantity").cast("long").alias("_sum_qty"),
    )
    small = li.join(per_part, "l_partkey").filter(
        F.col("l_quantity") * 5 * F.col("_n") < F.col("_sum_qty")
    )
    return small.agg(
        (F.expr("sum(_cents) div 7") / 100.0).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small"),
    )


@register(
    "q_subquery_in",
    """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust
    FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_name >= 'M')
    GROUP BY c_mktsegment
    """,
)
def q_subquery_in(spark, sf_dir):
    """IN-subquery against a filtered dimension: customers in
    lexically-late nations, counted per market segment. DataFrame form
    is a broadcast left-semi join — the 25-row dimension never forces
    a shuffle of the customer table, and the aggregation's partial
    combine runs map-side after the semi filter."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") >= "M")
    return (
        c.join(
            F.broadcast(n),
            c.c_nationkey == n.n_nationkey,
            "left_semi",
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


@register(
    "q_subquery_not_exists",
    """
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey
        AND l.l_quantity >= 48 AND l.l_discount > 0.09
        AND l.l_returnflag = 'R'
    )
    """,
)
def q_subquery_not_exists(spark, sf_dir):
    """Correlated NOT EXISTS: suppliers with no returned high-quantity
    deep-discount lineitem. DataFrame form is a left-anti join with the
    correlation predicates pushed into the probe-side scan (visible as
    PushedFilters), so the anti-join hashes only the tiny qualifying
    subset — at 100 TB the pushed conjunction is what keeps the build
    side broadcastable."""
    s = t(spark, sf_dir, "supplier")
    bad = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 48)
        & (F.col("l_discount") > 0.09)
        & (F.col("l_returnflag") == "R")
    )
    return s.join(
        bad, s.s_suppkey == bad.l_suppkey, "left_anti"
    ).select("s_suppkey", "s_name")
