"""Deterministic sampling / dataset-split queries (training-data ops).

A 100 TB training pipeline needs *content-stable* sampling: the same
row must land in the same split on every run, on any cluster, at any
partitioning — so splits are keyed on a cryptographic hash of a stable
id, never on RNG or row position. This generalizes the reference's
content-hash discipline (SHA-256 dedup key, front_door_lambda.py:26)
from dedup to split assignment.

Scale shape: both ops are pure map-side expressions plus (for the
stratified variant) one window shuffle on the stratum key — no RNG
state, no sort of the full corpus, reproducible under AQE re-planning.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hcls_data_lake_spark.queries.common import t
from hcls_data_lake_spark.registry import register

# md5-bucket boundaries: first 2 hex chars = 256 buckets; 'cc' = 204
# (≈80%), 'e6' = 230 (≈90%). Hex-string comparison is identical in
# Spark and DuckDB (both emit lowercase hex), so the split is
# engine-independent and oracle-checkable.
_SPLIT_SQL = """
    SELECT doc_id,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                     THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                     THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
"""


@register("q_sample_hash_split", _SPLIT_SQL)
def q_sample_hash_split(spark, sf_dir):
    """Deterministic train/valid/test split by md5(doc_id) bucket
    (~80/10/10). Content-stable: no RNG, no row-position dependence —
    the property a training pipeline needs so resharding or incremental
    ingest never moves a document across splits (no eval leakage)."""
    d = t(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < "cc", "train")
        .when(bucket < "e6", "valid")
        .otherwise("test")
        .alias("split"),
    )


_STRAT_SQL = """
    SELECT doc_id, lang, rn FROM (
      SELECT doc_id, lang,
             CAST(row_number() OVER (
                 PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
      FROM documents
    ) WHERE rn <= 40
"""


@register("q_sample_stratified", _STRAT_SQL)
def q_sample_stratified(spark, sf_dir):
    """Stratified deterministic sample: up to 40 docs per language,
    chosen by md5(doc_id) rank within the stratum — a reproducible
    per-group quota sample (one window shuffle on the stratum key;
    per-partition top-k at scale, never a global sort)."""
    d = t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    w = Window.partitionBy("lang").orderBy(h, F.col("doc_id"))
    return (
        d.select("doc_id", "lang", F.row_number().over(w).cast("bigint").alias("rn"))
        .filter(F.col("rn") <= 40)
    )
