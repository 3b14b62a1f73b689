"""Similarity search over embedding columns (``array<float>``).

North-star extension over the reference lake (BASELINE.json
`north_star`; SURVEY.md §2.B similarity rows).

Baseline: brute-force cosine top-k with JVM higher-order functions
(zip_with/aggregate — no Python in the hot path). Scale paths:
random-hyperplane LSH bucketing (seeded-deterministic planes) and IVF
cell probing over a k-means codebook trained with distributed Lloyd
iterations (kmeans_codebook) — candidate sets shrink from |N| to the
probed cells, at a recall cost tuned by n_probe/n_planes.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hcls_data_lake_spark.tables import widen_scan


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
    e0 = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    # widen the CANDIDATE side only (tables.widen_scan): the |Q|·|N|
    # dot folds against the broadcast query block are pure map-side
    # CPU, and the unsplittable single-row-group fixture parquet would
    # otherwise run them all in ONE scan task (no-op on an
    # already-parallel lake scan). The tiny filtered query side stays
    # on the raw scan — widening it would charge the broadcast build
    # an extra exchange for a handful of rows.
    e = widen_scan(e0)
    q = e0.filter(query_filter) if query_filter is not None else e0
    # self-norms computed ONCE PER SIDE below the join (|Q| + |N|
    # folds), not once per pair (3·|Q|·|N| folds in the naive
    # cosine() form — benched 1.5× slower at sf0.1). Squared norms are
    # kept and combined as sqrt(_qq·_cc) per pair so the float result
    # is bitwise identical to cosine()'s dot/sqrt(dot·dot).
    q = q.select(
        F.col("_id").alias("query_id"), F.col("_v").alias("qv")
    ).withColumn("_qq", dot("qv", "qv"))
    c = e.select(
        F.col("_id").alias("neighbor_id"), F.col("_v").alias("cv")
    ).withColumn("_cc", dot("cv", "cv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        F.broadcast(q).join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos", dot("qv", "cv") / F.sqrt(F.col("_qq") * F.col("_cc"))
        )
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rn")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def _cell_scores(v: str, cents: list[list[float]]) -> Column:
    """Array of centroid ids ordered best-first for column ``v`` by
    squared-L2 distance. Score is ``2·v·c − ‖c‖²``: argmin‖v−c‖² ⇔
    argmax(2·v·c − ‖c‖²) since ‖v‖² is constant per row — one dot
    product per centroid, no row-norm needed.

    Emitted as ONE SQL string wrapped in a single ``F.expr``: the
    Column-API form of this tree costs ~5 Py4J round-trips per
    centroid (struct/lit/arith each cross the bridge), which at
    m_sub × k_codes codebook sizes dominated PQ search wall time —
    the same plan-BUILD pathology the typed HL7 projections hit
    (er7.py's SQL-string rationale). The per-centroid dot stays an
    aggregate(zip_with(...)) fold DELIBERATELY: unrolling it into
    dim-many element_at terms (tried; reverted) built 512-term
    expressions on the IVF path that fell out of whole-stage codegen
    and benched 2.8× SLOWER than the fold — the opposite trade from
    the m_sub-term ADC lookup sum (:func:`_pq_adc_dot`), where the
    unroll wins because the term count is tiny."""
    scored = []
    for i, c in enumerate(cents):
        arr = ", ".join(repr(float(x)) + "D" for x in c)
        norm_sq = repr(float(sum(x * x for x in c)))
        scored.append(
            "named_struct('score', "
            f"2.0D * aggregate(zip_with({v}, array({arr}),"
            " (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
            f" - {norm_sq}D, 'cell', {i})"
        )
    return F.expr(
        f"reverse(array_sort(array({', '.join(scored)}))).cell"
    )


def kmeans_codebook(
    embeddings: DataFrame,
    n_centroids: int = 8,
    vec_col: str = "embedding",
    iters: int = 4,
    seed: int = 42,
    sample_frac: float | None = None,
) -> list[list[float]]:
    """Train an IVF codebook with distributed Lloyd iterations.

    Assignment runs as JVM codegen expressions over the full (or
    sampled) table; the update step is posexplode → groupBy(cell, pos)
    → avg, so only the k×dim codebook ever reaches the driver — the
    right shape at 100 TB, where the codebook trains on a sample
    (``sample_frac``) and the full table is only touched once for final
    assignment in ivf_topk. Init is deterministic: the k vectors with
    the smallest seeded hash of their bytes (a data-dependent seeding,
    unlike random hyperplanes). Empty cells keep their previous
    centroid.
    """
    e = embeddings.select(F.col(vec_col).cast("array<double>").alias("_v"))
    if sample_frac is not None:
        e = e.sample(fraction=sample_frac, seed=seed)
    # the training set is read once per Lloyd iteration plus init —
    # pin it in memory so only iteration 1 pays the scan + cast
    e = e.persist()
    init = (
        e.withColumn("_h", F.md5(F.concat(F.lit(str(seed)), F.to_json(F.struct("_v")))))
        .orderBy("_h")
        .limit(n_centroids)
        .collect()
    )
    cents = [[float(x) for x in r._v] for r in init]
    for _ in range(iters):
        assigned = e.withColumn("cell", _cell_scores("_v", cents).getItem(0))
        stats = (
            assigned.select("cell", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new_cents = [list(c) for c in cents]
        by_cell: dict[int, dict[int, float]] = {}
        for r in stats:
            by_cell.setdefault(r.cell, {})[r.pos] = r.m
        for cell, dims in by_cell.items():
            new_cents[cell] = [dims[p] for p in range(len(dims))]
        cents = new_cents
    e.unpersist()
    return cents


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


# trained codebooks keyed by (table identity, training params): IVF is
# a build-once/probe-many index (FAISS-style) — retraining an identical
# deterministic codebook per query would charge every probe the full
# index-build cost. Table identity = the sorted source file list PLUS a
# fingerprint of the analyzed logical plan, so two differently-filtered
# or differently-projected DataFrames over the same files train
# separate codebooks (file list alone would silently share one).
# In-place rewrites that reuse the exact same file NAMES are still
# indistinguishable — parquet writers practically never do that (part
# files carry job UUIDs), and exact cosine re-ranking keeps results
# valid regardless; only recall/reproducibility would shift. Non-file
# sources (no inputFiles) skip the cache entirely. The cache is capped
# (FIFO eviction) and clearable via clear_codebook_cache().
_CODEBOOK_CACHE: dict[tuple, list[list[float]]] = {}
_CODEBOOK_CACHE_MAX = 32


def _table_fingerprint(df: DataFrame) -> tuple | None:
    """Cache identity for a DataFrame: (sorted source files, sha256 of
    the analyzed logical plan with expression ids normalized out).
    Catalyst assigns fresh expr ids (`col#123`) on every plan build, so
    two structurally-identical invocations would never share a raw plan
    string — strip the `#n` suffixes before hashing or the cache never
    hits. None = uncacheable (no file source)."""
    import hashlib
    import re

    try:
        files = tuple(sorted(df.inputFiles()))
    except Exception:
        return None
    if not files:
        return None
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
        plan = re.sub(r"#\d+", "#", plan)
    except Exception:
        plan = str(df.schema)
    return (files, hashlib.sha256(plan.encode()).hexdigest())


def clear_codebook_cache() -> None:
    """Drop every cached IVF codebook and materialized index (e.g.
    after a table rewrite that kept its file names, or to bound memory
    in a long-lived driver)."""
    _CODEBOOK_CACHE.clear()
    while _INDEX_CACHE:
        _, df = _INDEX_CACHE.popitem(last=False)
        try:
            df.unpersist()
        except Exception:
            pass  # owning session already stopped


# finished per-candidate index state (cells / PQ codes / reconstructed
# norms), localCheckpointed and keyed like the codebooks plus the owning
# SparkSession (checkpoint blocks live in that session's executors).
# This is FAISS's add()/search() split: encoding every candidate is
# INDEX BUILD and happens once per (table, params); a probe only reads
# the finished code table. Without it every search re-ran the
# k_codes-centroid argmin per candidate — at sf0.1 that encode pass was
# ~70% of PQ search wall time, and at 100 TB it would turn each query
# into a full re-index.
_INDEX_CACHE: OrderedDict[tuple, DataFrame] = OrderedDict()
_INDEX_CACHE_MAX = 16


def _cached_index(cache_key: tuple, spark, builder):
    """Get-or-build for materialized index DataFrames. ``cache_key[0]
    is None`` (no stable table identity) skips caching — same contract
    as :func:`_cached_codebook`.

    Entries are persisted (MEMORY_AND_DISK) rather than
    localCheckpointed so eviction can DETERMINISTICALLY free the
    executor blocks via unpersist — a checkpointed RDD's blocks only
    die when the driver GC happens to collect the reference, which at
    16 evictions × an encoded corpus each is an executor-storage leak.
    The session component of the key is the applicationId (unique per
    SparkContext), not id(session): id() addresses are reused by the
    allocator, and a recycled address plus an identical table
    fingerprint would hand out a DataFrame bound to a dead session."""
    ident = cache_key[0]
    app_id = spark.sparkContext.applicationId
    key = (app_id,) + cache_key if ident else None
    # Entries keyed by a different applicationId belong to a stopped
    # SparkContext: their persisted blocks are already gone, but the
    # driver-side DataFrame references linger, pin JVM objects, and
    # occupy live-session cache slots until FIFO happens to reach
    # them. Drop them eagerly (ADVICE r4) — nothing to unpersist, the
    # owning context is dead.
    for stale in [k for k in _INDEX_CACHE if k[0] != app_id]:
        del _INDEX_CACHE[stale]
    if key is not None and key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    built = builder()
    if key is None:
        return built
    built = built.persist()
    built.count()  # materialize now: probes must read, never rebuild
    while len(_INDEX_CACHE) >= _INDEX_CACHE_MAX:
        _, evicted = _INDEX_CACHE.popitem(last=False)
        try:
            evicted.unpersist()
        except Exception:
            pass  # owning session already stopped
    _INDEX_CACHE[key] = built
    return built


def _cached_codebook(cache_key: tuple, builder):
    """Shared get-or-train for every codebook family (IVF coarse, PQ
    subspace): one place owns the ident-guard, the FIFO eviction and
    the put — a missed site would silently retrain per probe, the
    exact cost the cache exists to avoid. ``cache_key[0] is None``
    (no file identity) skips caching entirely."""
    ident = cache_key[0]
    cached = _CODEBOOK_CACHE.get(cache_key) if ident else None
    if cached is not None:
        return cached
    built = builder()
    if ident:
        while len(_CODEBOOK_CACHE) >= _CODEBOOK_CACHE_MAX:
            _CODEBOOK_CACHE.pop(next(iter(_CODEBOOK_CACHE)))
        _CODEBOOK_CACHE[cache_key] = built
    return built


def ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    query_filter: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_iters: int = 4,
    sample_frac: float | None = None,
) -> DataFrame:
    """IVF ANN: train a k-means codebook (kmeans_codebook — Lloyd
    iterations, optionally on a sample_frac sample), assign every
    vector to its nearest centroid, then search only the query's
    n_probe closest cells. At 100 TB the cell equi-join replaces the
    full cross product; recall is tuned via n_probe and n_centroids.
    train_iters=0 falls back to seeded random pseudo-centroids (no
    training pass — the cheap-index variant). Training is deterministic
    (seeded init, fixed iteration count), so the codebook is cached per
    (table, params) — build once, probe many."""
    if train_iters > 0:
        ident = _table_fingerprint(embeddings)
        cents = _cached_codebook(
            (ident, n_centroids, vec_col, train_iters, seed, sample_frac),
            lambda: kmeans_codebook(
                embeddings, n_centroids, vec_col=vec_col, iters=train_iters,
                seed=seed, sample_frac=sample_frac,
            ),
        )
    else:
        ident = _table_fingerprint(embeddings)
        dim = len(embeddings.select(vec_col).first()[0])
        cents = _hyperplanes(dim, n_centroids, seed)

    e0 = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    # cell assignment is index BUILD (n_centroids dot products per
    # candidate) — materialize once per (table, params), probe many;
    # the stored self-norm joins the index so the per-pair cosine is a
    # single fold (see brute_force_topk's norm note). The build input
    # is widened (tables.widen_scan): n_centroids dot folds per
    # candidate are map-side CPU that the unsplittable fixture parquet
    # would otherwise run in ONE scan task; the tiny probe side stays
    # on the raw scan (brute_force_topk's side rule).
    indexed = _cached_index(
        (ident, "ivfcells", n_centroids, id_col, vec_col, train_iters, seed,
         sample_frac),
        embeddings.sparkSession,
        lambda: widen_scan(e0).withColumn(
            "cell", _cell_scores("_v", cents).getItem(0)
        ).withColumn("_cc", dot("_v", "_v")),
    )
    q = e0.filter(query_filter) if query_filter is not None else e0
    probes = q.select(
        F.col("_id").alias("query_id"),
        F.col("_v").alias("qv"),
        # explode_outer: _cell_scores is k dot products per row — the
        # inner-explode null-check Filter would evaluate it 2 extra
        # times; the slice is never empty so no null rows appear
        F.explode_outer(
            F.slice(_cell_scores("_v", cents), 1, n_probe)
        ).alias("cell"),
    ).filter(F.col("cell").isNotNull()).withColumn("_qq", dot("qv", "qv"))
    c = indexed.select(
        F.col("_id").alias("neighbor_id"), F.col("_v").alias("cv"), "cell",
        "_cc",
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
        .withColumn(
            "cos", dot("qv", "cv") / F.sqrt(F.col("_qq") * F.col("_cc"))
        )
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rn")
    )


def pca_components(
    embeddings: DataFrame,
    n_components: int = 8,
    vec_col: str = "embedding",
) -> tuple[list[float], list[list[float]], list[float]]:
    """Distributed PCA fit: returns ``(mean, components, variances)``
    with ``components`` as ``n_components`` rows of dim-length unit
    vectors (descending explained variance).

    The scale shape: each Arrow batch contributes ONE row holding its
    (dim x dim) Gram matrix, count, and column sum (mapInPandas +
    numpy per batch) — so only O(dim^2)-sized aggregates ever cross
    the wire or reach the driver, never vectors. The driver sums the
    per-batch Grams, forms the covariance, and eigendecomposes a
    dim x dim matrix (dim is small; the DATA is what's big — the same
    only-k*dim-reaches-the-driver rule as kmeans_codebook). Sign
    convention (largest-|entry| positive) makes components
    deterministic across runs and BLAS builds."""
    import pandas as pd

    def gram_batches(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["_v"].tolist(), dtype="float64")
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "g": [(X.T @ X).reshape(-1).tolist()],
                }
            )

    parts = embeddings.select(
        F.col(vec_col).cast("array<double>").alias("_v")
    ).mapInPandas(gram_batches, "n long, s array<double>, g array<double>")
    rows = parts.collect()  # one small row per Arrow batch
    if not rows:
        raise ValueError(
            "pca_components: no vectors to fit (empty embeddings input)"
        )
    n = sum(r.n for r in rows)
    s = np.sum([np.array(r.s) for r in rows], axis=0)
    dim = len(s)
    G = np.sum([np.array(r.g) for r in rows], axis=0).reshape(dim, dim)
    mean = s / n
    cov = G / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T.copy()
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    return (
        mean.tolist(),
        [c.tolist() for c in comps],
        [float(vals[o]) for o in order],
    )


def pca_project(
    embeddings: DataFrame,
    mean: list[float],
    components: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project vectors onto fitted components — pure JVM expressions
    (center once with zip_with, one aggregate dot product per
    component, literals spliced as a single SQL string so plan build
    is one round-trip). Output: (id, proj array<double>)."""
    mean_arr = ", ".join(repr(float(x)) + "D" for x in mean)
    dots = []
    for c in components:
        arr = ", ".join(repr(float(x)) + "D" for x in c)
        dots.append(
            f"aggregate(zip_with(_vc, array({arr}), (x, y) -> x * y),"
            " 0.0D, (acc, x) -> acc + x)"
        )
    return (
        embeddings.selectExpr(
            f"{id_col} as _id",
            f"zip_with(cast({vec_col} as array<double>), array({mean_arr}),"
            " (x, m) -> x - m) as _vc",
        )
        .selectExpr("_id", f"array({', '.join(dots)}) as proj")
        .select(F.col("_id").alias(id_col), "proj")
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    query_filter: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    probe_all: bool = False,
) -> DataFrame:
    """Approximate NN: bucket vectors by hyperplane signs, search only
    within the query's bucket. At 100 TB the bucket join replaces the
    full cross product; recall is tuned via n_planes (fewer planes =
    bigger buckets = higher recall, more work).

    probe_all=True probes EVERY one of the 2**n_planes buckets per
    query instead of only the query's own: each candidate sits in
    exactly one bucket, so the exhaustive probe set touches each
    candidate exactly once and the result must equal
    brute_force_topk bit-for-bit — the exact-regime pin that lets a
    plain SQL oracle verify the bucketing/join/rank machinery by
    value (recall < 1 comes only from probing FEWER buckets)."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    e0 = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    # widen the CANDIDATE side only (brute_force_topk's side rule):
    # the per-candidate bucket signs + self-norm folds are map-side
    # CPU the unsplittable fixture parquet would run in ONE scan task
    e = widen_scan(e0).withColumn("bucket", lsh_bucket("_v", planes))
    q0 = e0.withColumn("bucket", lsh_bucket("_v", planes))
    q = q0.filter(query_filter) if query_filter is not None else q0
    if probe_all:
        # exhaustive probe set: the query row fans out to all
        # 2**n_planes bucket ids (bounded — the SAME shape as
        # multi-probe with the probe list maxed out); its own bucket
        # column is irrelevant under exhaustion
        probe_set = F.array(
            *[F.lit(i).cast("long") for i in range(1 << n_planes)]
        )
        q = q.drop("bucket").withColumn("bucket", F.explode(probe_set))
    q = q.select(
        F.col("_id").alias("query_id"), F.col("_v").alias("qv"), "bucket"
    ).withColumn("_qq", dot("qv", "qv"))
    c = e.select(
        F.col("_id").alias("neighbor_id"), F.col("_v").alias("cv"), "bucket"
    ).withColumn("_cc", dot("cv", "cv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        # broadcast the query side; candidates stay in place (the
        # bucket equi-key prunes the broadcast matches per row);
        # self-norms per side, one fold per pair (brute_force_topk's
        # norm note)
        F.broadcast(q).join(c, ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos", dot("qv", "cv") / F.sqrt(F.col("_qq") * F.col("_cc"))
        )
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rn")
    )


# ------------------------------------------------------------ product
# quantization (Jégou, Douze & Schmid, "Product quantization for
# nearest neighbor search", TPAMI 2011 — the FAISS IndexPQ design).
# PQ is the CANDIDATE-COMPRESSION half of large-scale ANN: each vector
# is stored as m_sub small codes (one per contiguous subspace) instead
# of dim floats, and search scores queries against candidates via
# asymmetric distance computation (ADC) — the query keeps its full
# vector, the candidate is looked up in the per-subspace codebooks.
# Composes with IVF (cell pruning picks WHICH candidates to score; PQ
# shrinks WHAT each candidate costs to score/store).


def pq_codebooks(
    embeddings: DataFrame,
    m_sub: int = 4,
    k_codes: int = 16,
    vec_col: str = "embedding",
    iters: int = 4,
    seed: int = 42,
    sample_frac: float | None = None,
) -> list[list[list[float]]]:
    """Train per-subspace k-means codebooks: dim is split into m_sub
    contiguous blocks and each block gets its own kmeans_codebook run
    (distributed Lloyd — only k_codes x (dim/m_sub) floats reach the
    driver per subspace). Deterministic: seeded init per subspace.
    Requires dim % m_sub == 0."""
    dim = len(embeddings.select(vec_col).first()[0])
    if dim % m_sub != 0:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    w = dim // m_sub
    books = []
    for m in range(m_sub):
        sub = embeddings.select(
            F.expr(
                f"slice(cast({vec_col} as array<double>), {m * w + 1}, {w})"
            ).alias("_sv")
        )
        books.append(
            kmeans_codebook(
                sub, k_codes, vec_col="_sv", iters=iters, seed=seed + m,
                sample_frac=sample_frac,
            )
        )
    return books


def pq_encode_col(vec_col: str, books: list[list[list[float]]]) -> Column:
    """array<int> of per-subspace nearest-centroid codes — the m_sub
    integers that REPLACE the stored vector. Pure codegen (one
    _cell_scores argmin per subspace); computed in the scan stage."""
    w = len(books[0][0])
    return F.array(
        *[
            _cell_scores(f"slice({vec_col}, {m * w + 1}, {w})", cents).getItem(0)
            for m, cents in enumerate(books)
        ]
    )


def _pq_book_sql(cents: list[list[float]]) -> str:
    return "array(" + ", ".join(
        "array(" + ", ".join(repr(float(x)) + "D" for x in c) + ")" for c in cents
    ) + ")"


def _pq_adc_lut(qv: str, books: list[list[list[float]]]) -> Column:
    """Per-QUERY ADC lookup table: ``lut[m][j] = q_m · codebook_m[j]``
    (array<array<double>>, m_sub × k_codes). This is the half of ADC
    that makes PQ *fast*, not just small: the m_sub × k_codes subspace
    dot products are computed ONCE per query row (the tiny broadcast
    side), so scoring a candidate pair degenerates to m_sub array
    lookups + adds (see :func:`_pq_adc_dot`). Computing the subspace
    dots per PAIR instead would cost ~dim multiplications per pair —
    more work than the exact dot product PQ exists to avoid (that
    formulation benched 3.7x slower than brute force at sf0.1)."""
    w = len(books[0][0])
    return F.array(
        *[
            F.expr(
                f"transform({_pq_book_sql(cents)},"
                f" c -> aggregate(zip_with(slice({qv}, {m * w + 1}, {w}), c,"
                " (x, y) -> x * y), 0.0D, (acc, x) -> acc + x))"
            )
            for m, cents in enumerate(books)
        ]
    )


def _pq_adc_dot(lut: str, codes: str, m_sub: int) -> Column:
    """ADC approximate dot product from a precomputed per-query LUT:
    sum over subspaces of ``lut[m][code_m]``. The candidate's floats
    never appear — only its codes index into the query's table — and
    per-pair cost is m_sub lookups, independent of dim.

    Unrolled into m_sub plain element_at additions rather than an
    aggregate(zip_with(...)) fold: higher-order-function lambdas run
    INTERPRETED in Spark (outside whole-stage codegen), and this
    expression sits on the |Q|×N pair path — the fold form benched
    ~2× slower end-to-end at sf0.1. The unrolled form is pure codegen."""
    terms = [
        F.expr(
            f"element_at(element_at({lut}, {m + 1}),"
            f" element_at({codes}, {m + 1}) + 1)"
        )
        for m in range(m_sub)
    ]
    total = terms[0]
    for term in terms[1:]:
        total = total + term
    return total


def _pq_norm_sq(codes: str, books: list[list[list[float]]]) -> Column:
    """Squared L2 norm of the RECONSTRUCTED candidate — a literal
    lookup per subspace (norms precomputed at plan build)."""
    total = None
    for m, cents in enumerate(books):
        norms = ", ".join(
            repr(float(sum(x * x for x in c))) + "D" for c in cents
        )
        term = F.expr(f"element_at(array({norms}), {codes}[{m}] + 1)")
        total = term if total is None else total + term
    return total


def pq_adc_topk(
    embeddings: DataFrame,
    k: int = 5,
    m_sub: int = 4,
    k_codes: int = 16,
    query_filter: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_iters: int = 4,
    sample_frac: float | None = None,
    rerank: int = 0,
) -> DataFrame:
    """PQ-compressed ANN top-k via asymmetric distance computation:
    candidates are scored from their m_sub codes alone (approximate
    cosine = ADC dot / (|q| * |reconstructed candidate|)), so the
    candidate side of the join carries m_sub ints instead of dim
    floats — at 100 TB that is the difference between an index that
    fits in memory and one that doesn't (64 dims x 8B -> 4 codes:
    128x smaller). Queries keep full vectors (they are few). Same
    broadcast-queries / candidates-stay-put / WindowGroupLimit shape
    as brute_force_topk. Codebooks are cached per (table, params) like
    IVF — build once, probe many.

    ``rerank=R`` (R > k) adds the FAISS refine stage: ADC picks a
    shortlist of R candidates per query, then EXACT cosine re-ranks
    only those — full vectors are fetched for |Q|·R rows via a
    broadcast of the (tiny) shortlist against the table, never for
    the whole corpus. Quantization coarseness then costs recall only
    when a true neighbor falls outside the shortlist, not whenever
    two same-cell candidates tie — intra-cluster ranking comes from
    exact math. This is the standard deployment shape (ADC shortlist
    + refine); plain ADC (rerank=0) is the zero-extra-IO variant."""
    _check_rerank(rerank, k)
    ident = _table_fingerprint(embeddings)
    books = _cached_codebook(
        (ident, "pq", m_sub, k_codes, vec_col, train_iters, seed, sample_frac),
        lambda: pq_codebooks(
            embeddings, m_sub, k_codes, vec_col=vec_col, iters=train_iters,
            seed=seed, sample_frac=sample_frac,
        ),
    )

    e0 = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    # candidate side widened (brute_force_topk's side rule); the tiny
    # probe side stays on the raw scan
    e = widen_scan(e0)
    # per-candidate state computed BELOW the join: codes + reconstructed
    # norm, once per candidate — never per (query, candidate) pair —
    # and materialized once per (table, params): probes read the
    # finished code table (FAISS add()/search() split)
    cands = _cached_index(
        (ident, "pqcodes", m_sub, k_codes, id_col, vec_col, train_iters, seed,
         sample_frac),
        embeddings.sparkSession,
        lambda: e.select(
            F.col("_id").alias("neighbor_id"),
            pq_encode_col("_v", books).alias("cd"),
        ).withColumn("_cn2", _pq_norm_sq("cd", books)),
    )
    q = e0.filter(query_filter) if query_filter is not None else e0
    # per-query state on the broadcast side: the ADC LUT + norm, once
    # per query row
    q = q.select(
        F.col("_id").alias("query_id"),
        F.col("_v").alias("qv"),
        _pq_adc_lut("_v", books).alias("_lut"),
        F.sqrt(dot("_v", "_v")).alias("_qn"),
    )
    adc_cos = _pq_adc_dot("_lut", "cd", m_sub) / (F.col("_qn") * F.sqrt("_cn2"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    scored = (
        F.broadcast(q).join(cands, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", adc_cos)
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
    )
    return _finish_or_refine(scored, e, w, k, rerank)


def ivfpq_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    m_sub: int = 4,
    k_codes: int = 16,
    query_filter: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_iters: int = 4,
    sample_frac: float | None = None,
    rerank: int = 0,
) -> DataFrame:
    """IVF-PQ: the full FAISS IVFPQ composition — IVF cells decide
    WHICH candidates a query touches (n_probe of n_centroids cells,
    never the whole table), PQ codes decide WHAT each touched
    candidate costs (m_sub bytes scored by ADC, never dim floats),
    and the optional refine stage exact-ranks the shortlist only.
    At 100 TB both savings multiply: a query scans
    ~n_probe/n_centroids of the corpus at ~(m_sub codes)/(dim floats)
    of the bandwidth. Both codebooks come from the shared cached
    build-once trainers (kmeans_codebook / pq_codebooks)."""
    _check_rerank(rerank, k)
    ident = _table_fingerprint(embeddings)
    cents = _cached_codebook(
        (ident, n_centroids, vec_col, train_iters, seed, sample_frac),
        lambda: kmeans_codebook(
            embeddings, n_centroids, vec_col=vec_col, iters=train_iters,
            seed=seed, sample_frac=sample_frac,
        ),
    )
    books = _cached_codebook(
        (ident, "pq", m_sub, k_codes, vec_col, train_iters, seed, sample_frac),
        lambda: pq_codebooks(
            embeddings, m_sub, k_codes, vec_col=vec_col, iters=train_iters,
            seed=seed, sample_frac=sample_frac,
        ),
    )

    e0 = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    # candidate side widened (brute_force_topk's side rule); the tiny
    # probe side stays on the raw scan
    e = widen_scan(e0)
    # the stored index: cell + codes per candidate (id, 1 int, m ints —
    # the only per-candidate state the search ever reads before refine)
    # plus the reconstructed norm — computed once per candidate and
    # materialized once per (table, params) like the codebooks
    indexed = _cached_index(
        (ident, "ivfpqcodes", n_centroids, m_sub, k_codes, id_col, vec_col,
         train_iters, seed, sample_frac),
        embeddings.sparkSession,
        lambda: e.select(
            F.col("_id").alias("neighbor_id"),
            _cell_scores("_v", cents).getItem(0).alias("cell"),
            pq_encode_col("_v", books).alias("cd"),
        ).withColumn("_cn2", _pq_norm_sq("cd", books)),
    )
    q = e0.filter(query_filter) if query_filter is not None else e0
    probes = q.select(
        F.col("_id").alias("query_id"),
        F.col("_v").alias("qv"),
        _pq_adc_lut("_v", books).alias("_lut"),
        F.sqrt(dot("_v", "_v")).alias("_qn"),
        F.explode_outer(
            F.slice(_cell_scores("_v", cents), 1, n_probe)
        ).alias("cell"),
    ).filter(F.col("cell").isNotNull())
    adc_cos = _pq_adc_dot("_lut", "cd", m_sub) / (F.col("_qn") * F.sqrt("_cn2"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    scored = (
        F.broadcast(probes).join(indexed, ["cell"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", adc_cos)
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
    )
    return _finish_or_refine(scored, e, w, k, rerank)


def _check_rerank(rerank: int, k: int) -> None:
    """Reject rerank values in (0, k]: they read as 'refine my top-k'
    but `rerank > k` would silently skip the refine stage and return
    quantization-tie-broken ADC rankings — fail loudly instead."""
    if 0 < rerank <= k:
        raise ValueError(
            f"rerank={rerank} must be 0 (no refine) or > k={k} "
            "(the ADC shortlist the exact re-rank draws from)"
        )


def _finish_or_refine(scored, e, w, k: int, rerank: int):
    """Shared tail of the PQ searches: either truncate the ADC ranking
    at k, or exact-cosine re-rank the top-``rerank`` shortlist (full
    vectors fetched for shortlist rows ONLY, via a broadcast of the
    tiny shortlist against the table). One implementation so
    pq_adc_topk and ivfpq_topk can never diverge in tie-break,
    rounding, or shortlist semantics."""
    if rerank > k:
        short = scored.filter(F.col("rn") <= rerank).select(
            "query_id", "qv", "neighbor_id"
        )
        cv = e.select(F.col("_id").alias("neighbor_id"), F.col("_v").alias("cv"))
        return (
            F.broadcast(short).join(cv, "neighbor_id")
            .withColumn("cos", cosine("qv", "cv"))
            .withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= k)
            .select(
                "query_id", "neighbor_id",
                F.round("cos", 6).alias("cosine"), "rn",
            )
        )
    return scored.filter(F.col("rn") <= k).select(
        "query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rn"
    )
