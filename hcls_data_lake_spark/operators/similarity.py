"""Similarity search over embedding columns (``array<float>``).

North-star extension over the reference lake (BASELINE.json
`north_star`; SURVEY.md §2.B similarity rows).

Baseline: brute-force cosine top-k with JVM higher-order functions
(zip_with/aggregate — no Python in the hot path). Scale path:
random-hyperplane LSH bucketing so candidate sets shrink from |N| to a
bucket, at some recall cost. Planes are seeded-deterministic.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: str, b: str) -> Column:
    """JVM-side dot product of two array<double> columns."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
    )


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


def brute_force_topk(
    embeddings: DataFrame,
    k: int = 5,
    query_filter: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: Q queries × N candidates. The QUERY side is
    the broadcast side — candidates (the 100 TB table) stream in place
    and never move. The row_number filter is executed as a
    WindowGroupLimit: each partition keeps only its local top-k per
    query BEFORE the shuffle, so the exchange moves ≤ k·|Q| rows per
    partition, not |Q|·|N|. All dot products are codegen HOFs."""
    e = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    q = e.filter(query_filter) if query_filter is not None else e
    q = q.select(F.col("_id").alias("query_id"), F.col("_v").alias("qv"))
    c = e.select(F.col("_id").alias("neighbor_id"), F.col("_v").alias("cv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        F.broadcast(q).join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine("qv", "cv"))
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rn")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_bucket(vec_col: str, planes: list[list[float]]) -> Column:
    """Random-hyperplane bucket id: one sign bit per plane."""
    bits = []
    for i, plane in enumerate(planes):
        d = F.expr(
            f"aggregate(zip_with({vec_col}, "
            f"array({', '.join(repr(float(x)) + 'D' for x in plane)}),"
            " (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
        )
        bits.append(F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    query_filter: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest of n_centroids
    seeded random centroids (one broadcast pass — a stand-in for a
    trained k-means codebook, same partitioning shape), then search only
    the query's n_probe closest cells. At 100 TB the cell equi-join
    replaces the full cross product; recall is tuned via n_probe."""
    dim = len(embeddings.select(vec_col).first()[0])
    cents = _hyperplanes(dim, n_centroids, seed)  # seeded pseudo-centroids

    def cell_ranks(v: str) -> Column:
        """Array of centroid ids ordered by similarity to column v."""
        scored = [
            F.struct(
                F.expr(
                    f"aggregate(zip_with({v},"
                    f" array({', '.join(repr(float(x)) + 'D' for x in c)}),"
                    " (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
                ).alias("score"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(cents)
        ]
        return F.reverse(F.array_sort(F.array(*scored))).getField("cell")

    e = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    indexed = e.withColumn("cell", cell_ranks("_v").getItem(0))
    q = e.filter(query_filter) if query_filter is not None else e
    probes = q.select(
        F.col("_id").alias("query_id"),
        F.col("_v").alias("qv"),
        F.explode(F.slice(cell_ranks("_v"), 1, n_probe)).alias("cell"),
    )
    c = indexed.select(
        F.col("_id").alias("neighbor_id"), F.col("_v").alias("cv"), "cell"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        # broadcast the probe side (|Q|·n_probe rows) — the indexed
        # candidate table never shuffles; its cell column only gates
        # which broadcast rows match (same direction rule as
        # brute_force_topk)
        F.broadcast(probes).join(c, ["cell"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine("qv", "cv"))
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rn")
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    query_filter: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate NN: bucket vectors by hyperplane signs, search only
    within the query's bucket. At 100 TB the bucket join replaces the
    full cross product; recall is tuned via n_planes (fewer planes =
    bigger buckets = higher recall, more work)."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    e = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    ).withColumn("bucket", lsh_bucket("_v", planes))
    q = e.filter(query_filter) if query_filter is not None else e
    q = q.select(
        F.col("_id").alias("query_id"), F.col("_v").alias("qv"), "bucket"
    )
    c = e.select(
        F.col("_id").alias("neighbor_id"), F.col("_v").alias("cv"), "bucket"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        # broadcast the query side; candidates stay in place (the
        # bucket equi-key prunes the broadcast matches per row)
        F.broadcast(q).join(c, ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine("qv", "cv"))
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rn")
    )
