"""Continuous aggregates: time-bucket rollup maintenance + hybrid read.

The hypertable/continuous-aggregate pattern (TimescaleDB's continuous
aggregates, Druid rollup segments): keep a materialized table of
per-bucket aggregate STATE for closed time buckets, answer queries by
merging that state with a raw scan of the open tail, and maintain the
state incrementally — each new batch only touches the buckets it
lands in, never the full history.

Why this matters at 100 TB: an event lake grows forever, but queries
aggregate over it daily. Recomputing a GROUP BY over years of history
per query is O(history); the rollup makes the steady-state cost
O(new data + touched buckets). Correctness requirement: every stored
aggregate must be a MERGEABLE partial state — count/sum/min/max merge
by themselves, avg is carried as (sum, count) and finalized only at
read time. A stored avg-of-avgs would be wrong the moment two batches
hit one bucket.

Reference motivation: the lake's zone tables are append-only streams
of messages (core_stack.yml:151, SURVEY.md §1.2); per-source/zone/day
counts are the catalog analytics the reference does one DynamoDB row
at a time (core_stack.yml:164-172).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# mergeable partial-state columns kept per (bucket, key)
_STATE = ["n_rows", "n_vals", "sum_value", "min_value", "max_value"]


def rollup_state(
    df: DataFrame,
    bucket_col: str,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Aggregate a batch into per-(bucket, keys) mergeable state."""
    return df.groupBy(bucket_col, *key_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        # avg needs the NON-NULL count: sum skips nulls, so dividing
        # by the row count would drag the average down whenever the
        # value column has nulls (SQL AVG ignores them)
        F.count(value_col).alias("n_vals"),
        F.sum(value_col).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def merge_rollup(existing: DataFrame, batch_state: DataFrame) -> DataFrame:
    """Merge new batch state into existing rollup state (same schema).

    Pure state⊕state merge — associative and commutative, so
    maintenance order never matters and re-delivered batches are the
    caller's only dedup concern (pair with exact dedup upstream).
    """
    group_cols = [c for c in existing.columns if c not in _STATE]
    return (
        existing.unionByName(batch_state)
        .groupBy(*group_cols)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_vals").alias("n_vals"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def finalize_rollup(state: DataFrame) -> DataFrame:
    """Finalize stored state into user-facing aggregates (avg emerges
    from sum/count here, never stored)."""
    return state.select(
        *[c for c in state.columns if c not in _STATE],
        F.col("n_rows"),
        F.col("n_vals"),
        F.col("sum_value"),
        F.col("min_value"),
        F.col("max_value"),
        # sum/NON-NULL count = SQL AVG semantics; an all-null bucket
        # finalizes to NULL, never a divide-by-zero
        F.when(
            F.col("n_vals") > 0, F.col("sum_value") / F.col("n_vals")
        ).alias("avg_value"),
    )


def hybrid_read(
    rollup: DataFrame,
    raw_tail: DataFrame,
    bucket_col: str,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Serve the full time range: materialized state for closed buckets
    ∪ freshly aggregated open tail, merged then finalized. The raw side
    only scans the tail (partition-pruned in a date-partitioned lake);
    history never rescans."""
    tail_state = rollup_state(raw_tail, bucket_col, key_cols, value_col)
    return finalize_rollup(merge_rollup(rollup, tail_state))
