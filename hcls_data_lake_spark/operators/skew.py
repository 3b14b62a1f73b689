"""Skew mitigation: salted two-stage aggregation.

AQE's skew-join splitting (on by default, SCALE.md) heals skewed JOIN
partitions at runtime, but a skewed GROUP BY key still concentrates one
reducer: every row for the hot key lands on the same task. Salting
splits the hot key across ``n_salts`` sub-keys — stage 1 aggregates
(key, salt) partials in parallel, stage 2 merges the ≤ n_salts partial
rows per key. Both stages get map-side partial aggregation for free, so
the extra cost is one small shuffle of ``n_keys × n_salts`` rows.

The salt is derived with ``pmod(xxhash64(salt_source), n)`` — fully
deterministic (re-runs, AQE re-plans and speculative retries all agree),
unlike ``rand()``-based salting.

Generalizes the reference's per-source/zone counting (catalog rows
keyed by source, core_stack.yml:164-172; SURVEY.md §4 "salted
aggregations where skewed") — messages are heavily skewed toward a
few institutions/zones in any real deployment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# op -> (stage-1 partial fn, stage-2 merge fn)
_OPS = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str | None]],
    salt_source: str | Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output name -> (op, input col) with op in
    count/sum/min/max/avg (avg decomposes into sum+count and divides at
    merge). ``salt_source`` is any row-level column/expression to hash
    into the salt — use a high-cardinality id column.
    """
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    salt = F.pmod(F.xxhash64(salt_source), F.lit(n_salts)).alias("_salt")

    partials: list[Column] = []
    merges: list[Column] = []
    for out, (op, col) in aggs.items():
        if op == "avg":
            partials.append(F.sum(col).alias(f"_{out}_sum"))
            # NON-NULL count: sum skips nulls, so dividing by count(*)
            # would drag the average below SQL AVG on nullable columns
            partials.append(F.count(col).alias(f"_{out}_cnt"))
            merges.append(
                (F.sum(f"_{out}_sum") / F.sum(f"_{out}_cnt")).alias(out)
            )
        else:
            part_fn, merge_fn = _OPS[op]
            partials.append(part_fn(col).alias(f"_{out}"))
            merges.append(merge_fn(f"_{out}").alias(out))

    stage1 = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(*partials)
    return stage1.groupBy(*key_cols).agg(*merges)


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    on: list[str],
    salt_source: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the fact side, replicate the dim
    side ``n_salts``×, join on ``on + [salt]``.

    A hot join key sends every matching fact row to one reducer; AQE's
    skew splitting heals this for sort-merge joins at runtime, but
    salting is the explicit, plan-stable form — needed when AQE is off
    (streaming foreachBatch bodies), when a stage boundary materializes
    before AQE can re-plan, or when the dim is too big to broadcast but
    small enough that an ``n_salts``× replication is cheaper than a
    one-reducer straggler. Cost: dim shuffles n_salts× its size; the
    fact side shuffles once, spread evenly across (key, salt) buckets.

    ``salt_source`` must vary WITHIN a join key (a row id), never the
    join key itself — hashing the key alone would put the whole hot key
    in one salt bucket again. Deterministic (xxhash64, no rand()), so
    retries and speculative tasks agree. Supports inner/left joins;
    right/full would duplicate unmatched dim rows per salt.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins only")
    if n_salts < 1:
        # pmod(x, 0) is NULL with ANSI off: every fact row would
        # silently miss (inner) or null-pad (left) instead of erroring
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    f = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_source), F.lit(n_salts))
    )
    d = dims.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long")))
    )
    return f.join(d, on + ["_salt"], how).drop("_salt")
