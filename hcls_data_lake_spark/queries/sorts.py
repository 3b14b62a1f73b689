"""Sorts / limits / top-k (SURVEY.md §2.B).

Order-insensitive hashing means the *values* must match; for the
limit query the selected row-set itself depends on order, so keys are
made unambiguous with explicit tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hcls_data_lake_spark.queries.common import t
from hcls_data_lake_spark.registry import register


@register(
    "q_sort_multi",
    """
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(row_number() OVER (
               ORDER BY c_mktsegment ASC,
                        c_acctbal DESC NULLS LAST,
                        c_custkey ASC) AS BIGINT) AS rank_in_listing
    FROM customer
    """,
)
def q_sort_multi(spark, sf_dir):
    """Multi-key sort asc/desc with nulls ordering (catalog listings).

    The sort is observable in the output via a global row_number, so the
    order-insensitive hash still verifies ordering semantics.
    """
    from pyspark.sql.window import Window

    c = t(spark, sf_dir, "customer")
    w = Window.orderBy(
        F.col("c_mktsegment").asc(),
        F.col("c_acctbal").desc_nulls_last(),
        F.col("c_custkey").asc(),
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).cast("bigint").alias("rank_in_listing"),
    )


@register(
    "q_sort_limit",
    """
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def q_sort_limit(spark, sf_dir):
    """Global top-k (TakeOrderedAndProject — no full sort at scale)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )
