"""Fixture-table loaders.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``{sf_dir}/``. Reading through ``spark.read.parquet`` keeps predicate
pushdown / column pruning / partition pruning available to Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table: {name}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so users can query
    the lake with plain ``spark.sql`` text — the analytics surface the
    reference's staged zone exists to serve (SURVEY §0: the staged data
    IS a Spark SQL external table). Views are lazy: no data is read
    until a query runs, and Catalyst sees straight through them to the
    parquet scans (pushdown/pruning unaffected).
    """
    from hcls_data_lake_spark.queries.common import events

    for name in TABLES:
        if name == "events":
            # nanos-timestamp repair (the raw read rejects
            # TIMESTAMP(NANOS)); same path as queries/common.events
            df = events(spark, sf_dir)
        else:
            df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
