"""Exact-integer order-statistic operators (Gini, CUSUM changepoint).

Both are built on the same discipline as the sketch family: quantize to
integers up front, keep every intermediate exact (BIGINT, or
DECIMAL(38,0) where a product can pass 2^63 — the same silent promotion
DuckDB does with HUGEINT), and take ONE floor division at the very end,
so any engine implementing the recurrence produces byte-identical
results regardless of partitioning or summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gini_e6(
    df: DataFrame, group_col: str, cents_col: str, id_col: str
) -> DataFrame:
    """Per-group exact Gini concentration index in parts-per-million:
    the sorted-rank identity G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) with
    xᵢ integer cents and rank i a total order by (x, id). Returns
    ``(group_col, n, gini_e6)``.

    One window shuffle on the group key (the per-group sort IS the
    algorithm) + a partial-aggregated groupBy on the same key — sorted
    data never moves twice. The numerator × 10⁶ exceeds BIGINT at
    moderate sizes, so the final expression runs in DECIMAL(38,0) with
    Spark's exact integral `div`; only the result is cast back.

    Non-negative inputs assumed (Gini is defined for non-negative
    quantities); for an all-zero group the index is NULL (0/0)."""
    w = Window.partitionBy(group_col).orderBy(cents_col, id_col)
    ranked = df.withColumn("_i", F.row_number().over(w).cast("bigint"))
    return ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(
            f"cast((2 * cast(sum(_i * {cents_col}) as decimal(38,0))"
            f" - (count(1) + 1) * cast(sum({cents_col}) as decimal(38,0)))"
            " * 1000000"
            f" div (count(1) * cast(sum({cents_col}) as decimal(38,0)))"
            " as bigint)"
        ).alias("gini_e6"),
    )


def cusum_changepoint(
    daily: DataFrame,
    group_col: str = "grp",
    time_col: str = "d",
    value_col: str = "x",
) -> DataFrame:
    """Single-changepoint CUSUM estimator per group over a regular
    series ``(group, time, value)``: the usual S_k = Σ_{j≤k}(x_j − μ)
    with μ = N/T, multiplied through by T so S'_k = Σ(x_j·T − N) is
    exact BIGINT; the changepoint is the time with max |S'_k|, ties
    broken to the EARLIEST time. Returns ``(group_col, time_col,
    cusum_scaled)`` — one row per group.

    The input is expected to be the (tiny, calendar-bounded) rollup,
    already materialized if it derives from a fact table (Spark shares
    no subplans across the totals and cusum branches)."""
    tot = daily.groupBy(group_col).agg(
        F.sum(value_col).cast("bigint").alias("_n_total"),
        F.count(F.lit(1)).cast("bigint").alias("_n_days"),
    )
    w_cum = Window.partitionBy(group_col).orderBy(time_col)
    cusum = daily.join(F.broadcast(tot), group_col).withColumn(
        "cusum_scaled",
        F.sum(F.col(value_col) * F.col("_n_days") - F.col("_n_total"))
        .over(w_cum)
        .cast("bigint"),
    )
    w_rank = Window.partitionBy(group_col).orderBy(
        F.abs(F.col("cusum_scaled")).desc(), F.col(time_col).asc()
    )
    return (
        cusum.withColumn("_rk", F.row_number().over(w_rank))
        .filter(F.col("_rk") == 1)
        .select(group_col, time_col, "cusum_scaled")
    )
