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


def _check_bin_width(bin_width: int) -> None:
    """Reject non-positive widths: with ANSI off, `x div 0` is NULL, so
    every bin would be NULL and the join would silently return an empty
    (or all-unmatched) result instead of erroring."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")


def _explode_bins(df: DataFrame, lo: str, hi: str, bin_width: int) -> DataFrame:
    """One row per bin the [lo, hi] interval covers (shared by both
    join shapes so the bin mapping can never diverge between them)."""
    return df.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"{lo} div {bin_width}"),
                F.expr(f"{hi} div {bin_width}"),
            )
        ),
    )


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
    _check_bin_width(bin_width)
    # integer `div` (trunc): exact at any epoch magnitude, and any
    # monotonic bin mapping shared by both sides is correct —
    # point ∈ [lo, hi] ⟹ bin(point) ∈ [bin(lo), bin(hi)]
    p = points.withColumn("_bin", F.expr(f"{point_col} div {bin_width}"))
    i = _explode_bins(intervals, lo_col, hi_col, bin_width)
    residual: Column = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) <= F.col(hi_col)
    )
    return p.join(i, "_bin").filter(residual).drop("_bin")


def bin_interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_lo: str,
    a_hi: str,
    b_lo: str,
    b_hi: str,
    bin_width: int,
) -> DataFrame:
    """Interval×interval overlap join (``a_lo <= b_hi AND b_lo <= a_hi``)
    for two BIG sides with no equi key — the shape a naive plan executes
    as a broadcast-nested-loop cross product.

    Both sides explode into their covered bins and hash-join on the bin
    id; the exact overlap predicate runs as a residual. A pair that
    overlaps across several bins would match once per shared bin, so the
    match is anchored to ONE canonical bin — the bin where the overlap
    STARTS (``greatest(a_lo, b_lo) div bin_width``) — which removes
    duplicates with plain filter logic instead of a distinct shuffle
    over the full match set. Columns must be integral epoch values in
    one shared unit; bin_width near the typical interval width keeps the
    explode factor O(1).
    """
    _check_bin_width(bin_width)
    ea = _explode_bins(a, a_lo, a_hi, bin_width)
    eb = _explode_bins(b, b_lo, b_hi, bin_width)
    overlap: Column = (F.col(a_lo) <= F.col(b_hi)) & (F.col(b_lo) <= F.col(a_hi))
    canonical: Column = (
        F.expr(f"greatest({a_lo}, {b_lo}) div {bin_width}") == F.col("_bin")
    )
    return ea.join(eb, "_bin").filter(overlap & canonical).drop("_bin")
