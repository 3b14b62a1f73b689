"""Time-series regularization: gap-fill a sparse event stream onto a
dense per-entity time grid and forward-fill the last observation.

The hypertable `time_bucket_gapfill` + `locf` pattern (TimescaleDB)
expressed as stock DataFrame ops: bucket the raw stream, derive each
entity's [first, last] bucket span, `sequence()`+`explode` the dense
grid, left-join the observed buckets back in, and carry the last
non-null observation forward with `last(ignorenulls=True)` over a
per-entity running frame.

Why this matters at 100 TB: ML feature pipelines and monitoring
rollups need *regular* series (one row per entity per bucket) from
*irregular* event streams. Every step here is entity-parallel — the
grid explode is map-side after one small per-entity bounds aggregate,
the join and the fill window both hash-partition on the entity key,
so the whole transform is a single shuffle family with no global
ordering and no driver-side loop. Grid density is bounded per entity
(span/step rows), so output size is predictable from the bounds
aggregate before the explode runs.

Reference motivation: per-source ingest-rate monitoring over the
lake's append-only message stream (SURVEY.md §2.B q_win_range_frame
motivation, "sliding per-entity rate"); the catalog records arrival
events one row at a time (core_stack.yml:164-172) and the analytics
question is "rate per source per hour, including silent hours".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gap_fill_locf(
    df: DataFrame,
    entity_col: str,
    bucket_col: str,
    value_cols: list[str],
    step: Column,
    assume_aligned: bool = False,
) -> DataFrame:
    """Densify `df` (one row per (entity, bucket), buckets possibly
    sparse) onto every `step`-spaced bucket between each entity's first
    and last observed bucket, forward-filling each value column as
    `<col>_ff` (last observation carried forward). Observed columns
    stay null on gap rows so callers can distinguish fill from fact.

    By default the grid is the step-spaced sequence UNIONED with the
    observed buckets: an observation whose bucket is not aligned to
    ``min + k*step`` (already-bucketed upstream data with a different
    step, say) lands on its own grid row instead of being silently
    dropped by the grid join — gap-fill must never LOSE facts. That
    safety costs a dedup shuffle over the DENSIFIED grid (much larger
    than the input). When the caller produced the buckets itself with
    the same step (``date_trunc`` at the step granularity, an integer
    ``div``-bucketing…), every observed bucket is on the lattice by
    construction — pass ``assume_aligned=True`` to skip the union and
    its grid-sized dedup entirely (the dominant cost at bench scale).
    """
    bounds = df.groupBy(entity_col).agg(
        F.min(bucket_col).alias("_b0"), F.max(bucket_col).alias("_b1")
    )
    grid = bounds.select(
        entity_col,
        F.explode(F.sequence("_b0", "_b1", step)).alias(bucket_col),
    )
    if not assume_aligned:
        grid = grid.unionByName(
            df.select(entity_col, bucket_col)
        ).distinct()
    joined = grid.join(df, [entity_col, bucket_col], "left")
    w = (
        Window.partitionBy(entity_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ff = [
        F.last(c, ignorenulls=True).over(w).alias(f"{c}_ff") for c in value_cols
    ]
    return joined.select(entity_col, bucket_col, *value_cols, *ff)
