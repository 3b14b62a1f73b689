"""Lake lifecycle jobs: zone promotion in batch and streaming.

SURVEY.md §1.2: zone promotion (ingestion→staging) is a job, not an
object copy. Batch form reads the ingestion zone and writes
staged/error zones; streaming form watches the ingestion zone as a file
source (A18) and routes every micro-batch through the same transform
(one code path for both — the §1.5 batch/stream duality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hcls_data_lake_spark.pipeline.staging import stage_er7
from hcls_data_lake_spark.pipeline.zones import write_zone
from hcls_data_lake_spark.streaming.runner import run_foreach_batch


def _route_batch(batch_df: DataFrame, lake_root: str) -> None:
    staged, errored = stage_er7(batch_df)
    write_zone(staged, lake_root, "staging")
    write_zone(errored, lake_root, "error")


def promote_ingestion_batch(spark: SparkSession, lake_root: str) -> None:
    """One-shot promotion of the whole ingestion zone."""
    ingested = spark.read.parquet(f"{lake_root}/ingestion")
    _route_batch(ingested, lake_root)


def promote_ingestion_stream(
    spark: SparkSession, lake_root: str, schema: str
) -> None:
    """Streaming promotion: new ingestion-zone files are discovered by
    the file source and routed to staging/error zones per micro-batch
    (the SNS→trigger→StepFunction path of SURVEY §3.2 as one query)."""
    sdf = spark.readStream.schema(schema).parquet(f"{lake_root}/ingestion")
    run_foreach_batch(sdf, lambda df, _id: _route_batch(df, lake_root))
