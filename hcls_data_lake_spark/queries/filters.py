"""Projection / filter / predicate queries (SURVEY.md §2.B).

Reference motivation: SNS attribute FilterPolicy (staging_stack.yml:102-104),
the authz gate (front_door_lambda.py:20), zone routing CASE
(core_stack.yml:141-143), key-prefix routing (hcdl_stack.txt:265-283).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hcls_data_lake_spark.queries.common import t
from hcls_data_lake_spark.registry import register


@register(
    "q_filter_eq",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def q_filter_eq(spark, sf_dir):
    """Equality predicate (SNS FilterPolicy: protocol = 'hl7v2')."""
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "event_type", "value")
    )


@register(
    "q_filter_conj",
    """
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE (o_orderstatus = 'O' AND o_totalprice > 100000.0)
       OR (o_orderpriority IN ('1-URGENT', '2-HIGH') AND NOT o_orderstatus = 'F')
    """,
)
def q_filter_conj(spark, sf_dir):
    """AND/OR/NOT/IN boolean combinations (envelope routing A7/A8)."""
    o = t(spark, sf_dir, "orders")
    cond = ((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000.0)) | (
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & ~(F.col("o_orderstatus") == "F")
    )
    return o.filter(cond).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )


@register(
    "q_filter_null",
    """
    SELECT c_custkey,
           c_name,
           COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0)
               AS acctbal_or_zero,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END IS NULL
               AS was_negative
    FROM customer
    WHERE c_name IS NOT NULL
    """,
)
def q_filter_null(spark, sf_dir):
    """NULL semantics: isNull/isNotNull/coalesce (authz gate A3 —
    reject rows whose claim column is null, front_door_lambda.py:20)."""
    c = t(spark, sf_dir, "customer")
    nulled = F.when(F.col("c_acctbal") < 0, F.lit(None).cast("double")).otherwise(
        F.col("c_acctbal")
    )
    return c.filter(F.col("c_name").isNotNull()).select(
        "c_custkey",
        "c_name",
        F.coalesce(nulled, F.lit(0.0)).alias("acctbal_or_zero"),
        nulled.isNull().alias("was_negative"),
    )


@register(
    "q_filter_range_str",
    """
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority >= '2-HIGH' AND o_orderpriority < '4-NOT SPECIFIED'
    """,
)
def q_filter_range_str(spark, sf_dir):
    """String range predicates (StringGreaterThan / StringLessThan in the
    old reference's protocol CHOICE, hcdl_stack.txt:271-277)."""
    o = t(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderpriority") >= "2-HIGH")
        & (F.col("o_orderpriority") < "4-NOT SPECIFIED")
    ).select("o_orderkey", "o_orderpriority")


@register(
    "q_filter_like",
    """
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE 'PROMO%'
       OR p_name LIKE '%green%'
    """,
)
def q_filter_like(spark, sf_dir):
    """Prefix / LIKE routing (key-prefix CHOICE A17)."""
    p = t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").startswith("PROMO") | F.col("p_name").like("%green%")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "q_project_rename",
    """
    SELECT e.event_id AS message_id,
           e.event_type AS event,
           'hl7v2' AS protocol,
           CONCAT('src_', CAST(e.user_id AS VARCHAR)) AS source,
           e.value * 2.0 AS doubled_value
    FROM events e
    """,
)
def q_project_rename(spark, sf_dir):
    """select / alias / withColumn / drop (envelope attach A6:
    every message gains 4 attribute columns, front_door_lambda.py:34-55)."""
    e = t(spark, sf_dir, "events")
    return (
        e.withColumn("protocol", F.lit("hl7v2"))
        .withColumn("source", F.concat(F.lit("src_"), F.col("user_id").cast("string")))
        .withColumn("doubled_value", F.col("value") * 2.0)
        .select(
            F.col("event_id").alias("message_id"),
            F.col("event_type").alias("event"),
            "protocol",
            "source",
            "doubled_value",
        )
    )


@register(
    "q_project_case",
    """
    SELECT event_id,
           CASE WHEN event_type = 'error' THEN 'error'
                WHEN event_type IN ('signup', 'click', 'view', 'purchase')
                     THEN 'staging'
                ELSE 'ingestion' END AS zone,
           CASE WHEN value >= 100 THEN 'high'
                WHEN value >= 10 THEN 'mid'
                ELSE 'low' END AS value_band
    FROM events
    """,
)
def q_project_case(spark, sf_dir):
    """CASE WHEN chains (zone router A8: event->zone mapping
    core_stack.yml:141-143)."""
    e = t(spark, sf_dir, "events")
    zone = (
        F.when(F.col("event_type") == "error", "error")
        .when(F.col("event_type").isin("signup", "click", "view", "purchase"), "staging")
        .otherwise("ingestion")
    )
    band = (
        F.when(F.col("value") >= 100, "high")
        .when(F.col("value") >= 10, "mid")
        .otherwise("low")
    )
    return e.select("event_id", zone.alias("zone"), band.alias("value_band"))
