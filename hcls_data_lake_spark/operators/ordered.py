"""Scale-safe global ordered windows (total rank / global cumsum).

A bare ``Window.orderBy(...)`` with no ``partitionBy`` forces Spark to
move EVERY row into one partition (``Exchange SinglePartition`` under
the WindowExec) — fine on a calendar-bounded relation, fatal on a
corpus at 100 TB. This module is the two-pass distributed alternative
(TeraSort's shape, VERDICT r6 ask #2):

1. ``repartitionByRange`` on the sort keys — the corpus' ONE shuffle;
   every partition holds a contiguous key range, so partition order ×
   within-partition order IS the total order.
2. ``sortWithinPartitions`` + ``monotonically_increasing_id()`` — the
   id packs ``(partition_id << 33) | local_row_index``, so the global
   rank's within-partition component is a pure map-side expression:
   no WindowExec, no second shuffle for ranking.
3. Per-partition counts/sums aggregate to a relation bounded by the
   PARTITION COUNT (cluster config, not data size); an exclusive
   prefix over those ≤n rows yields each partition's starting offset.
4. The offsets broadcast-join back on partition id; global rank =
   offset + local index + 1, global cumsum = offset + within-partition
   running sum (the one remaining WindowExec is partitioned by the
   range-bucket id, so its partitions are exactly the range partitions
   — bounded and balanced, never a single reducer).

The relation is pinned with one lazy ``localCheckpoint`` so the
offsets aggregate and the final projection read the same materialized
rows. The pin is LOAD-BEARING, not belt-and-braces: without it the
two branches each recompute the range exchange and can draw DIFFERENT
partition boundaries (measured: a rank checksum diverged), which
silently mis-ranks rows near boundary keys. Lazy (not eager) because
both consumers sit in one final plan — the first action materializes
the checkpoint in-flight, saving the separate eager job (~0.03 s/call
at fixture scale). The materialization itself is the same cost any
distributed sort already pays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# monotonically_increasing_id packs the partition id in the upper bits:
# id = (partition_id << 33) | row_index_within_partition.
_MID_SHIFT = 33
_MID_MASK = (1 << _MID_SHIFT) - 1


def with_global_order(
    df: DataFrame,
    order: list[Column],
    *,
    rank_col: str | None = None,
    cumsums: dict[str, Column] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a global 1-based rank and/or inclusive cumulative sums
    taken over the TOTAL order defined by ``order`` (which must be a
    total order — add a unique tie-break key), without ever collapsing
    the relation to one partition.

    ``order``: sort expressions (e.g. ``F.col("x").desc_nulls_last()``)
    used for BOTH the range partitioning and the within-partition sort.
    ``cumsums``: ``{out_col: value_expr}`` inclusive prefix sums.
    Helper columns are dropped; input columns pass through unchanged.
    """
    cumsums = cumsums or {}
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32") or 32
    )
    ranged = (
        df.repartitionByRange(n, *order)
        .sortWithinPartitions(*order)
        .withColumn("_gmid", F.monotonically_increasing_id())
        .withColumn(
            "_gpid", F.shiftrightunsigned(F.col("_gmid"), _MID_SHIFT)
        )
        .localCheckpoint(eager=False)
    )

    aggs = [F.count(F.lit(1)).alias("_gcnt")]
    aggs += [F.sum(v).alias(f"_gsum_{c}") for c, v in cumsums.items()]
    per = ranged.groupBy("_gpid").agg(*aggs)
    # Exclusive prefix over the per-partition totals: ≤ num_partitions
    # rows — bounded by cluster config, the one place a global ordered
    # window is always safe.
    wo = (
        Window.orderBy("_gpid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = per.select(
        "_gpid",
        F.coalesce(F.sum("_gcnt").over(wo), F.lit(0)).alias("_goff_cnt"),
        *[
            F.coalesce(F.sum(f"_gsum_{c}").over(wo), F.lit(0)).alias(
                f"_goff_{c}"
            )
            for c in cumsums
        ],
    )

    out = ranged.join(F.broadcast(offs), "_gpid")
    if rank_col is not None:
        out = out.withColumn(
            rank_col,
            (
                F.col("_goff_cnt")
                + F.col("_gmid").bitwiseAND(F.lit(_MID_MASK))
                + F.lit(1)
            ).cast("bigint"),
        )
    if cumsums:
        # Within-partition running sum: partitions here are the range
        # buckets (balanced, ~|rows|/n each), ordered by the packed id
        # which already encodes the sort.
        wl = (
            Window.partitionBy("_gpid")
            .orderBy("_gmid")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c, v in cumsums.items():
            out = out.withColumn(c, F.col(f"_goff_{c}") + F.sum(v).over(wl))
    drop = ["_gmid", "_gpid", "_goff_cnt"] + [f"_goff_{c}" for c in cumsums]
    return out.drop(*drop)
