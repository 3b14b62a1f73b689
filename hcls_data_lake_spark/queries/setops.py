"""Set operations (SURVEY.md §2.B).

Reference motivation: merging zones (union), registry ∩ catalog
membership (intersect), ingested-but-not-staged error detection (except;
A15 parse-failure routing).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hcls_data_lake_spark.queries.common import t
from hcls_data_lake_spark.registry import register


@register(
    "q_set_union",
    """
    SELECT entity_id, entity_name, kind FROM (
        SELECT c_custkey AS entity_id, c_name AS entity_name,
               'customer' AS kind
        FROM customer
        UNION ALL
        SELECT s_suppkey AS entity_id, s_name AS entity_name,
               'supplier' AS kind
        FROM supplier
    )
    """,
)
def q_set_union(spark, sf_dir):
    """UNION ALL by name (merging zones / multi-source lakes)."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("kind"),
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s)


@register(
    "q_set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_set_intersect(spark, sf_dir):
    """INTERSECT (hashes present in both registry and catalog, A5)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q_set_except",
    """
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
    """,
)
def q_set_except(spark, sf_dir):
    """EXCEPT (ingested-but-not-staged detection, A15)."""
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    # subtract == EXCEPT DISTINCT (exceptAll would keep multiplicities)
    return o.subtract(c)


@register(
    "q_set_intersect_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_set_intersect_all(spark, sf_dir):
    """INTERSECT ALL — bag semantics: a nation appearing m times among
    customers and n times among suppliers survives min(m, n) times.
    Physically a counted hash join on the value (Catalyst rewrites to a
    count-compare aggregate), not a distinct pass — the multiplicity is
    the point for duplicate-frequency reconciliation between zones."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersectAll(s)


@register(
    "q_set_except_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_set_except_all(spark, sf_dir):
    """EXCEPT ALL — bag difference: each supplier occurrence cancels one
    customer occurrence, leaving max(m - n, 0) copies. The counted form
    of ingested-but-not-staged detection when the SAME content can
    legitimately appear k times and each staging consumes one."""
    c = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.exceptAll(s)
