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

    Scale shape (r7, VERDICT r6 ask #2): the rank is NOT a bare
    ``Window.orderBy`` (which funnels the whole relation through one
    partition) — ``with_global_order`` range-partitions on the sort
    keys and derives the rank as per-partition offset + local index,
    so the only corpus shuffle is the range partitioning itself and no
    WindowExec ever sees more than one range bucket
    (operators/ordered.py)."""
    from hcls_data_lake_spark.operators.ordered import with_global_order

    c = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    return with_global_order(
        c,
        [
            F.col("c_mktsegment").asc(),
            F.col("c_acctbal").desc_nulls_last(),
            F.col("c_custkey").asc(),
        ],
        rank_col="rank_in_listing",
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
