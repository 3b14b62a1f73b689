"""Write-time layout clustering: Z-order (Morton curve) for
multi-dimensional data skipping.

Parquet prunes row groups by min/max stats. Sorting the write by ONE
column gives perfect pruning on it and none on any other — each file
spans the full domain of every unsorted column. Interleaving the bits
of several columns' ranks (a space-filling curve) bounds EVERY
clustered column's per-file range, so predicates on any subset of the
clustered columns skip most files (the Delta/Iceberg `ZORDER BY` /
`sort_order` strategy, built from stock expressions).

Cost model at 100 TB: computing the key is one map-side pass (min/max
agg + pure expressions); the clustered write is one range shuffle —
paid once at write/compaction time, amortized over every subsequent
scan. The curve quality only affects pruning efficiency, never
results: a query on a z-ordered copy equals the same query on the raw
table (oracle-checked by q_layout_zorder).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rank(col: str, lo: Column, hi: Column, bits: int) -> Column:
    """Min-max scale a numeric column to an integer rank in
    [0, 2**bits). width_bucket is 1-based and total (nulls → bucket
    NULL → rank 0 via coalesce; constant columns → single bucket)."""
    n = 2**bits
    return F.coalesce(
        F.width_bucket(F.col(col).cast("double"), lo, hi + F.lit(1e-9), F.lit(n))
        - F.lit(1),
        F.lit(0),
    ).cast("long")


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, str]:
    """Attach a Morton z-order key column ``_zkey`` interleaving the
    bit-ranks of ``cols`` (2 or 3 columns; 16 bits each fits a long).

    Returns (df_with_key, key_col_name). Ranks come from a min-max
    scale (one tiny agg job); rank interleaving is a pure codegen
    expression — no UDF, no shuffle until the clustered write itself.
    """
    if not 2 <= len(cols) <= 3:
        raise ValueError("zorder_key clusters 2 or 3 columns")
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit in a signed long")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_hi_{c}") for c in cols],
    ).first()
    ranks = [
        _rank(c, F.lit(stats[f"_lo_{c}"]), F.lit(stats[f"_hi_{c}"]), bits)
        for c in cols
    ]
    k = len(cols)
    terms = [
        F.shiftleft(F.shiftright(r, i).bitwiseAND(F.lit(1)), i * k + j)
        for j, r in enumerate(ranks)
        for i in range(bits)
    ]
    zkey = reduce(lambda a, b: a.bitwiseOR(b), terms)
    return df.withColumn("_zkey", zkey), "_zkey"


def cluster_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet z-order-clustered on ``cols``:
    range-partition by the z-key (contiguous curve segments per file)
    and sort within partitions so row-group stats are tight."""
    keyed, k = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, F.col(k))
        .sortWithinPartitions(k)
        .drop(k)
        .write.mode("overwrite")
        .parquet(path)
    )
