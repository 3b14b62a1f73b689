"""Frequency sketches: Misra-Gries heavy-hitter candidates + exact verify.

The φ-heavy-hitter question ("which tokens exceed φ of the corpus?") is
the frequency face of the reference's registry lookups — at 100 TB you
cannot GROUP BY the full token universe (the key space is corpus-sized)
just to keep the handful of rows above threshold. The classic two-pass
shape used here:

1. **Candidate pass** — each partition runs a Misra-Gries summary with
   capacity ``ceil(1/φ)`` in a bounded dict (mapInPandas over Arrow
   batches; memory is O(1/φ) per partition regardless of partition
   size). The MG guarantee localizes: if ``freq(x) > φ·n`` globally,
   then ``freq_p(x) > φ·n_p`` in at least one partition p (otherwise
   summing the per-partition bounds contradicts the global count), and
   every partition-level φ-frequent item survives that partition's MG
   summary. So the union of per-partition candidates is a superset of
   the true heavy hitters — typically a few·(1/φ) keys total.
2. **Verify pass** — exact counts for candidate keys only: the fact
   table is semi-joined (broadcast — the candidate set is tiny by
   construction) and grouped. False candidates fall out; the final
   result is EXACT, which is what lets a SQL oracle check it.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_candidates(capacity: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_p = 0
        for pdf in batches:
            n_p += len(pdf)
            # WEIGHTED Misra-Gries over the batch's value_counts: an
            # insert/increment adds the batch count w; the decrement
            # step subtracts the largest amount that still zeroes at
            # least one counter (min of the overflow set). Preserves
            # the n/(capacity+1) undercount bound, and the Python loop
            # runs per DISTINCT value per batch, not per row — orders
            # of magnitude fewer iterations on the skewed data this
            # operator targets.
            for v, w in pdf["item"].value_counts(dropna=True).items():
                w = int(w)
                if v in counters:
                    counters[v] += w
                elif len(counters) < capacity:
                    counters[v] = w
                else:
                    d = min(w, min(counters.values()))
                    dead = []
                    for key in counters:
                        counters[key] -= d
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
                    if w > d:
                        counters[v] = w - d
        # candidate rows + one partition-tally row (item NULL), so the
        # global total rides the same scan instead of a second pass
        yield pd.DataFrame(
            {
                "item": list(counters.keys()) + [None],
                "n_p": [None] * len(counters) + [n_p],
            }
        )

    return gen


def heavy_hitters(items: DataFrame, col: str, phi: float) -> DataFrame:
    """Exact φ-heavy hitters of ``items[col]`` via MG candidates +
    verify. Returns ``(item, n)`` for every value with
    ``count > phi * total`` — identical to the unbounded GROUP BY +
    HAVING, but the only wide operation runs over candidate keys.

    Values are compared as strings (the token/key use case). NULL
    values are excluded from both the tallies and the total (the
    equivalence is GROUP BY + HAVING over the NON-NULL values — NULL
    doubles as the partition-tally sentinel, and the semi-join could
    never match it anyway). One scan produces both the per-partition
    candidates and the partition tallies (total rides the candidate
    pass); the verify pass is the second and last scan.
    """
    if not 0 < phi < 1:
        # phi=0 divides by zero sizing the summary; phi<0 would accept
        # every candidate — both are caller bugs, not thresholds
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    capacity = max(1, math.ceil(1.0 / phi))
    src = items.select(F.col(col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    summary = src.mapInPandas(
        _mg_candidates(capacity), "item string, n_p long"
    ).localCheckpoint(eager=True)
    total = summary.agg(F.sum("n_p")).collect()[0][0] or 0
    cands = (
        summary.filter(F.col("item").isNotNull())
        .select(F.col("item").alias("__hh_item"))
        .distinct()
    )
    return (
        src.join(
            F.broadcast(cands), src["item"] == cands["__hh_item"], "left_semi"
        )
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > phi * total)
    )


_HEX = "0123456789abcdef"


def md5_bucket_sql(h_sql: str, n_nibbles: int) -> str:
    """SQL-string expression mapping an md5-hex column to a bucket in
    ``[0, 16**n_nibbles)`` from its first ``n_nibbles`` hex digits.
    Pure string arithmetic so an independent SQL engine computes the
    identical bucket (DuckDB: same formula with strpos); Spark-side it
    stays inside whole-stage codegen. Shared by every md5-family
    sketch (count-min 2 nibbles, Bloom 3) so a bucket-formula fix can
    never drift between them."""
    terms = [
        f"(instr('{_HEX}', substr({h_sql}, {i + 1}, 1)) - 1)"
        f" * {16 ** (n_nibbles - 1 - i)}"
        for i in range(n_nibbles)
    ]
    return "(" + " + ".join(terms) + ")"


def _cms_bucket_sql(row_sql: str, item_sql: str) -> str:
    """Count-min bucket in [0, 256): the first two hex nibbles of
    ``md5(row ':' item)`` — see :func:`md5_bucket_sql`."""
    h = (
        f"md5(cast(concat(cast({row_sql} as string), ':', {item_sql})"
        " as binary))"
    )
    return md5_bucket_sql(h, 2)


def countmin_cells(items: DataFrame, col: str, depth: int = 4) -> DataFrame:
    """Count-min sketch cell table ``(r, bucket, cnt)`` — depth rows ×
    256 buckets — over ``items[col]`` (NULLs excluded, values compared
    as strings, matching :func:`heavy_hitters`).

    The stream is exploded ×depth map-side, but the hash aggregate has
    ≤ depth·256 keys, so partial (map-side) aggregation collapses each
    partition to at most the sketch size before the shuffle: the
    shuffle volume is O(cells · partitions), independent of stream
    length — the whole point of a sketch at 100 TB. Bucket choice is
    the engine-neutral md5-nibble formula (:func:`_cms_bucket_sql`), so
    the finished sketch is byte-identical across engines."""
    src = items.select(F.col(col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    return (
        src.select(
            "item",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
        )
        .withColumn("r", F.col("r").cast("int"))
        .withColumn("bucket", F.expr(_cms_bucket_sql("r", "item")))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def countmin_estimate(
    cells: DataFrame, queries: DataFrame, col: str, depth: int | None = None
) -> DataFrame:
    """Point-frequency estimates ``(item, est)`` for each query item:
    est = min over the sketch's depth rows of the hit cell's count —
    the classic count-min upper bound (est ≥ true count always; the
    pytest pins the invariant). The cell table is tiny (≤ depth·256
    rows) and is BROADCAST to the probe side, so estimating any number
    of query items is a map-side join + a groupBy on the query set —
    nothing stream-sized moves.

    ``depth`` defaults to the depth the cells were BUILT with (derived
    from the cell table — one action on ≤1024 rows). When ``depth`` is
    passed explicitly the call is ACTION-FREE: instead of a validating
    count, the probe rows are semi-joined (broadcast, in-plan) to the
    row indices actually present in the sketch, so a caller who probes
    deeper than the sketch was built silently degrades to the built
    depth — every surviving row is a real CMS row, the min stays a
    valid one-sided upper bound — rather than flooring estimates at 0
    through the missing rows."""
    if depth is None:
        built_rows = cells.agg(F.max("r").alias("m")).first().m
        depth = (built_rows if built_rows is not None else 0) + 1
    probes = (
        queries.select(F.col(col).cast("string").alias("item"))
        .filter(F.col("item").isNotNull())
        .distinct()
        .select(
            "item",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
        )
        .withColumn("r", F.col("r").cast("int"))
        # lazy depth validation: keep only rows the sketch was built
        # with (≤ depth values — broadcast semi-join, no driver action)
        .join(F.broadcast(cells.select("r").distinct()), "r", "left_semi")
        .withColumn("bucket", F.expr(_cms_bucket_sql("r", "item")))
    )
    return (
        probes.join(F.broadcast(cells), ["r", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
