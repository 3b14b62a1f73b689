"""Staging chain (A12-A16): prepare → parse → route by outcome.

The reference's trigger-Lambda + Express Step Function
(trigger_lambda.py, staging_stack.yml:189-219) collapses to a plain
DataFrame transform chain: the Step Function's JSONPath IR *is* the
DataFrame (SURVEY.md §3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hcls_data_lake_spark.hl7.er7 import (
    normalize_er7,
    parse_er7_strict_udf,
    parse_er7_udf,
)
from hcls_data_lake_spark.pipeline.ingest import subscription_filter


def prepare(df: DataFrame, msg_col: str = "msg") -> DataFrame:
    """A13: segment-delimiter repair (prepare_er7_lambda.py:9-13)."""
    return df.withColumn("er7", normalize_er7(F.col(msg_col)))


def parse(df: DataFrame, strict: bool = False) -> DataFrame:
    """A14: ER7→JSON parse via the Arrow-batched UDF; None = failure.

    ``strict=True`` additionally fails messages whose segments are
    unknown to the vendored grammar (the reference's hl7apy version
    check, parse_er7_lambda.py:35-38) — structurally valid but unknown
    messages then dead-letter via route()'s null branch, not just
    junk."""
    udf = parse_er7_strict_udf if strict else parse_er7_udf
    return df.withColumn("parsed", udf(F.col("er7")))


def route(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """A15: split by parse outcome — SUCCEEDED → staged/json, FAILED →
    error/txt with the original input (trigger_lambda.py:27-36).

    Payload hygiene: the staged leg carries the parsed document ONCE
    (as ``msg``) — keeping ``parsed`` and ``er7`` beside it would
    persist ~3 copies of every message through the zone write. The
    error leg keeps ``er7`` (the normalized original IS the
    dead-letter payload) and drops the always-null ``parsed``.

    Both legs derive lazily from the same parse chain: a consumer that
    actions BOTH legs should pin the parsed parent first (as
    jobs._route_batch does) or the Python parse runs once per leg."""
    staged = (
        df.filter(F.col("parsed").isNotNull())
        .withColumn("event", F.lit("staged"))
        .withColumn("format", F.lit("json"))
        .withColumn("msg", F.col("parsed"))
        .drop("parsed", "er7")
    )
    errored = (
        df.filter(F.col("parsed").isNull())
        .withColumn("event", F.lit("error"))
        .withColumn("format", F.lit("txt"))
        .drop("parsed")
    )
    return staged, errored


def stage_er7(df: DataFrame, strict: bool = False) -> tuple[DataFrame, DataFrame]:
    """A16: the full sequential composition — filter (A7) → prepare
    (A13) → parse (A14) → route (A15) — as one transform chain that
    whole-stage codegen fuses up to the Python parse boundary."""
    return route(
        parse(prepare(subscription_filter(df, "hl7v2", "er7")), strict=strict)
    )
