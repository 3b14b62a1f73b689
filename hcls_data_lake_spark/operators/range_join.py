"""Bin-based range join — the big×big interval-join scale path.

A pure range predicate (``point BETWEEN lo AND hi`` with no equi key)
gives Catalyst nothing to hash on, so Spark executes it as a
broadcast-nested-loop join: O(|L|·|R|) comparisons and a full
broadcast of one side — fine for a tiny banding relation
(q_join_theta), fatal for big×big at 100 TB.

The standard fix (DuckDB's IEJoin and Databricks' range-join hint are
engine-side versions of the same idea) re-expresses the range as an
equi key: quantize time into fixed-width bins, explode each interval
into every bin it covers, join point-bins to interval-bins with a
plain hash join, then apply the exact range predicate as a residual
filter. Cost becomes O(|L| + |R|·avg_bins + matches): linear scans,
one shuffle on the bin key, no broadcast, no nested loop. Bin width
tunes duplication against selectivity — ideal is ~the median interval
width, so intervals explode into O(1) bins and each bin pairs only
nearby rows.

Reference motivation: event-in-window attribution over the lake
(SURVEY.md §2.B q_join_range_interval) when BOTH sides are fact-sized
— e.g. every click within any promo window, promo table too large to
broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bin_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` to ``intervals`` on
    ``lo_col <= point_col <= hi_col`` via bin quantization.

    All three columns must be integral epoch values in the same unit
    (seconds/micros — caller's choice; ``bin_width`` is in that unit).
    Returns the joined DataFrame with all columns from both inputs.
    Closed interval on both ends, matching SQL BETWEEN.

    The interval side explodes to ``(hi-lo)/bin_width + 1`` rows each —
    pick ``bin_width`` near the typical interval width so that factor
    stays O(1). The join itself is a hash equi-join on the bin id; the
    exact BETWEEN runs as a residual filter, so correctness never
    depends on the binning.
    """
    if how != "inner":
        raise ValueError("bin_range_join supports inner joins only")
    # integer `div` (trunc): exact at any epoch magnitude, and any
    # monotonic bin mapping shared by both sides is correct —
    # point ∈ [lo, hi] ⟹ bin(point) ∈ [bin(lo), bin(hi)]
    p = points.withColumn("_bin", F.expr(f"{point_col} div {bin_width}"))
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"{lo_col} div {bin_width}"),
                F.expr(f"{hi_col} div {bin_width}"),
            )
        ),
    )
    residual: Column = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) <= F.col(hi_col)
    )
    return p.join(i, "_bin").filter(residual).drop("_bin")
