"""Shared helpers for the query inventory."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hcls_data_lake_spark.tables import load_table

# Scratch dir for queries that need to demonstrate a write+read
# round-trip (partitioned sinks, text/json sources). Kept outside the
# repo; contents are overwritten idempotently per run.
SCRATCH = os.environ.get("HCLS_SCRATCH_DIR", "/tmp/hcls_lake_scratch")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a fixture table."""
    if name == "events":
        return events(spark, sf_dir)
    return load_table(spark, sf_dir, name)


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load `events` with `ts` as timestamp_ntz at microsecond precision.

    The fixture parquet stores TIMESTAMP(NANOS) which Spark's vectorized
    reader rejects; we read it as raw long nanos
    (spark.sql.legacy.parquet.nanosAsLong) and rebuild a timestamp_ntz
    with exact integer microsecond arithmetic (timestampadd), which is
    bit-identical to DuckDB's nanos->micros truncation and independent
    of the session time zone.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = load_table(spark, sf_dir, "events")
    return df.withColumn("ts_ns", F.col("ts")).withColumn(
        "ts",
        F.expr(
            "timestampadd(MICROSECOND, ts div 1000,"
            " cast('1970-01-01 00:00:00' as timestamp_ntz))"
        ),
    )


def r2(c: Column) -> Column:
    """Round a double aggregate to 2 decimals (oracle parity discipline)."""
    return F.round(c, 2)


def scratch_dir(*parts: str) -> str:
    return os.path.join(SCRATCH, *parts)


def scratch_for(sf_dir: str, name: str) -> str:
    """Stable per-(sf_dir, purpose) scratch path — hashlib, not hash(),
    so paths are identical across processes (PYTHONHASHSEED-proof)."""
    import hashlib

    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(SCRATCH, f"{name}_{digest}")
