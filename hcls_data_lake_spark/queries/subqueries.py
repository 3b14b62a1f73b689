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


@register(
    "q_subquery_waiting_supplier",
    """
    WITH ol AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM ol l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM ol l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM ol l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q_subquery_waiting_supplier(spark, sf_dir):
    """TPC-H-Q21-shape 'sole late supplier' report, adapted to this
    schema (no l_commitdate — 'late' is shipdate > orderdate + 90d).
    The literal form is two correlated EXISTS self-joins over
    lineitem; re-shuffling the fact twice more is exactly what a
    100 TB plan can't afford. The Spark-first decorrelation folds BOTH
    quantifiers into ONE per-order aggregate: EXISTS(other supplier) ⇔
    countDistinct(supplier) > 1, and NOT EXISTS(other late supplier)
    ⇔ countDistinct(supplier WHERE late) = 1 given this row is late —
    so the sole late supplier and its late-lineitem count fall out of
    the same hash aggregate. One fact shuffle (on l_orderkey) total;
    supplier joins onto the order-sized aggregate via broadcast.
    Top-20 is TakeOrderedAndProject."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = t(spark, sf_dir, "lineitem")
    ol = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
        ).alias("late"),
    )
    per_order = ol.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
        F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_supp"),
        F.sum(F.col("late").cast("long")).alias("n_late_items"),
    )
    sole = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    )
    s = t(spark, sf_dir, "supplier")
    return (
        sole.groupBy("late_supp")
        .agg(F.sum("n_late_items").alias("numwait"))
        .join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "q_subquery_idle_customers",
    """
    WITH c AS (
      SELECT c_custkey, c_nationkey,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
      FROM customer
    ), pos AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS sum_cents
      FROM c WHERE cents > 0
    )
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM c
    WHERE cents * (SELECT n FROM pos) > (SELECT sum_cents FROM pos)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def q_subquery_idle_customers(spark, sf_dir):
    """TPC-H-Q22-shape 'global sales opportunity': customers with an
    above-average positive balance and no RECENT orders (none since
    2000-06-01), grouped by nation.
    Two subquery forms in one plan: an uncorrelated scalar aggregate
    (average positive balance — broadcast as a one-row cross join,
    compared in exact integer cents via cents*n > sum) and a
    correlated NOT EXISTS (left-anti against orders on the customer
    key, date predicate pushed into the probe-side scan). The
    anti-join probes only (o_custkey, o_orderdate) columns;
    at scale both sides hash-partition on custkey once — no
    per-customer re-execution."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
    )
    pos = c.filter(F.col("cents") > 0).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("cents").alias("_sum_cents"),
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.expr("TIMESTAMP '2000-06-01 00:00:00'"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(pos))
        .filter(F.col("cents") * F.col("_n") > F.col("_sum_cents"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum("cents").alias("sum_cents"),
        )
    )


@register(
    "q_subquery_having",
    """
    WITH pr AS (
      SELECT l_partkey,
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                           AS BIGINT)) AS BIGINT) AS part_cents
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, part_cents
    FROM pr
    WHERE part_cents * 10000 > (SELECT CAST(SUM(part_cents) AS BIGINT)
                                FROM pr) * 7
    ORDER BY part_cents DESC, l_partkey
    LIMIT 50
    """,
)
def q_subquery_having(spark, sf_dir):
    """TPC-H-Q11-shape 'important stock': parts whose revenue exceeds
    7 basis points of GLOBAL revenue — a HAVING clause compared
    against a scalar subquery over the same aggregate. Spark-first
    form reuses ONE per-part aggregate for both sides: the global sum
    re-aggregates the (small) per-part result, then broadcasts back as
    a one-row cross join — the fact table is scanned and shuffled
    exactly once. Threshold arithmetic is integer all the way
    (cents * 10000 vs total * bp) so the HAVING boundary is
    engine-exact. Top-50 is TakeOrderedAndProject."""
    li = t(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    pr = li.groupBy("l_partkey").agg(F.sum(cents).alias("part_cents"))
    total = pr.agg(F.sum("part_cents").alias("_total"))
    return (
        pr.join(F.broadcast(total))
        .filter(F.col("part_cents") * 10000 > F.col("_total") * 7)
        .select("l_partkey", "part_cents")
        .orderBy(F.desc("part_cents"), "l_partkey")
        .limit(50)
    )
