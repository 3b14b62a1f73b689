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


def widen_scan(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Heal scan-parallelism starvation before CPU-heavy map work.

    The fixture corpora are single-row-group parquet files, which Spark
    cannot subdivide: file splits only take effect at row-group
    granularity, so ``spark.sql.files.maxPartitionBytes`` /
    ``minPartitionNum`` cannot raise the scan's task count above 1, and
    a CPU-heavy map pipeline downstream (16-permutation md5 minhash,
    shingle explodes, brute-force dot-product folds, media codecs) runs
    serially while every other core idles. This is the "one huge
    unsplittable file" case of the skew playbook, whose fix is a
    repartition immediately after the read — round-robin, so it stays
    deterministic under task retries (sortBeforeRepartition is on by
    default) and introduces no skew.

    Scale-adaptive, not a local[32] constant: the target is the
    session's defaultParallelism (or an explicit ``parts``), and the
    repartition is SKIPPED whenever the scan already yields at least
    that many partitions — on a real lake the input arrives in
    thousands of splits and this is a no-op, so the extra exchange
    only exists where the alternative is idle cores. Call it on the
    narrow projection that feeds the expensive map (project before the
    exchange), never on a wide row.
    """
    spark = df.sparkSession
    target = parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


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
