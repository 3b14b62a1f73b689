"""MERGE-style upsert for plain-parquet tables.

The reference's catalog is a DynamoDB put-item per message — last write
wins on `message_id` (core_stack.yml:164-172). Without a transactional
table format, MERGE is expressed relationally: new rows override
existing rows on the key; everything else is carried over. One
full-outer-shaped anti-join + union, single shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert(existing: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Last-write-wins merge of `updates` into `existing` on `key`.

    Equivalent to ``MERGE ... WHEN MATCHED THEN UPDATE WHEN NOT MATCHED
    THEN INSERT``. Columns must match by name."""
    kept = existing.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates)


def upsert_latest(df: DataFrame, key: str, version_col: str) -> DataFrame:
    """Collapse an append-only log to current-state: keep the highest
    version per key (the zone bucket is append-only/versioned,
    core_stack.yml:27-28; 'current record' = max version). Deterministic
    tie-break on the version column only — callers needing total
    determinism should pass a unique version."""
    w = Window.partitionBy(key).orderBy(F.col(version_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
