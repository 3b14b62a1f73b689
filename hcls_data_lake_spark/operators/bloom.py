"""Bloom-filter semi-join reduction (runtime filter, made explicit).

The reference's dedup gate is a per-message registry lookup
(front_door_lambda.py:27-31 — DynamoDB get-item per hash). At lake
scale the equivalent "does this key exist on the other side?" question
is a semi join, and the scan-side cost of shuffling every fact row to
find out is the thing to kill: a Bloom filter built from the build side
and evaluated INSIDE the fact scan's filter drops most non-matching
rows before any exchange. Spark's AQE injects this automatically for
some shuffle joins (`spark.sql.optimizer.runtime.bloomFilter.enabled`);
this operator is the explicit, composable form — usable on any
DataFrame boundary, including ones AQE won't see through (checkpoints,
Python data sources, foreachBatch batches).

Sizing: ``m = -n*ln(p)/ln(2)^2`` bits, ``k = (m/n)*ln(2)`` probes — the
textbook optimum. The bitmap is collected to the driver as longs and
shipped as a literal array (same transport class as a broadcast hash
map, ~1.2 bytes/key at 1% fpp, so a 10M-key dimension is ~12 MB —
driver-fine; beyond that, prefer letting the join itself broadcast).

False positives are expected and harmless HERE because callers follow
the prefilter with the exact join (the bloom only thins the probe
side); never use `might_contain` alone where exactness matters.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_bloom(
    df: DataFrame, col: str, fpp: float = 0.01
) -> tuple[list[int], int, int]:
    """Build a Bloom filter over ``df[col]`` distributively.

    Bit positions are ``xxhash64(col, seed_i) mod m`` for k seeds; the
    bitmap is assembled map-side as 64-bit words via ``bit_or`` (one
    narrow aggregate — the only thing collected is the m/64-word
    bitmap, never the keys). Returns ``(words, m_bits, k)``.
    """
    n = max(1, df.select(col).distinct().count())
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    m += (-m) % 64  # whole words
    k = max(1, round(m / n * math.log(2)))
    seeds = F.array(*[F.lit(i) for i in range(k)])
    words = (
        df.select(
            F.explode(
                F.transform(
                    seeds,
                    lambda s: F.pmod(F.xxhash64(F.col(col), s), F.lit(m)),
                )
            ).alias("pos")
        )
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            # python-side shiftleft() only takes a literal shift; the SQL
            # function takes expressions — reach it via call_function
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    bitmap = [0] * (m // 64)
    for r in words:
        bitmap[r["word"]] = r["bits"]
    return bitmap, m, k


def might_contain(col: Column, bitmap: list[int], m: int, k: int) -> Column:
    """Membership-test expression against a driver-built bitmap.

    Pure JVM-side column arithmetic (xxhash64 + shifts against a
    literal array), so it runs inside whole-stage codegen in the scan
    stage — no UDF, no shuffle, evaluated before any exchange.
    """
    words = F.lit(bitmap)
    test = None
    for i in range(k):
        pos = F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m))
        word = F.element_at(words, (pos / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word, (pos % 64).cast("int")
        ).bitwiseAND(F.lit(1).cast("long"))
        cond = bit == 1
        test = cond if test is None else (test & cond)
    return test


def bloom_semi_join(
    probe: DataFrame, build: DataFrame, probe_col: str, build_col: str,
    fpp: float = 0.01,
) -> DataFrame:
    """Exact semi join with a Bloom prefilter on the probe side.

    The bloom thins ``probe`` scan-side (no shuffle, no exchange);
    the trailing exact ``left_semi`` join removes the bloom's false
    positives, so the result is exactly ``probe SEMI JOIN build``.
    """
    bitmap, m, k = build_bloom(build, build_col, fpp)
    thinned = probe.filter(might_contain(F.col(probe_col), bitmap, m, k))
    keys = build.select(F.col(build_col).alias("__bloom_key")).distinct()
    return thinned.join(
        F.broadcast(keys),
        thinned[probe_col] == keys["__bloom_key"],
        "left_semi",
    )
