"""Training-data curation extensions: benchmark decontamination,
repetition-based quality filtering, PII redaction.

These extend the §2.B LLM-pipeline set (dedup/similarity/text-analysis
in llm.py) with the remaining ops a 100 TB pretraining pipeline runs
before data ships: strip documents that leak evaluation benchmarks
(n-gram overlap decontamination), drop degenerate repetitive documents
(Gopher-style repetition signals), and scrub PII spans — the lake-scale
generalization of the reference's de-identification concern (PHI never
leaves the staging zone unredacted).

Ratio discipline: every fraction is computed as exact integer
`x * 10000 div n / 10000.0` instead of `round(x/n, 4)` — integer
division is engine-independent while float rounding at the 4th decimal
is not (see the q_agg_global half-way history).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hcls_data_lake_spark.operators.dedup import shingles_from_words
from hcls_data_lake_spark.queries.common import events, t
from hcls_data_lake_spark.registry import register


@register(
    "q_decontaminate",
    """
    WITH d AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT doc_id, source,
             CASE WHEN len(w) < 5 THEN []
                  ELSE list_distinct([array_to_string(w[i:i+4], ' ')
                                      for i in range(1, len(w) - 3)])
             END AS shingles
      FROM d
    ), bench AS (
      SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 97 = 0
    ), corpus AS (
      SELECT doc_id, source, shingles FROM sh WHERE doc_id % 97 <> 0
    ), cont AS (
      SELECT DISTINCT c.doc_id
      FROM (SELECT doc_id, unnest(shingles) AS s FROM corpus) c
      JOIN bench b ON c.s = b.s
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN cont.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST(SUM(CASE WHEN cont.doc_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept
    FROM corpus LEFT JOIN cont USING (doc_id)
    GROUP BY source
    """,
)
def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: drop training documents sharing any
    5-gram with a held-out benchmark set (here the deterministic
    doc_id % 97 slice stands in for the eval suite). Candidate test is
    a broadcast left-semi join of exploded corpus shingles against the
    DISTINCT benchmark shingle set — benchmarks are tiny relative to
    the corpus, so the corpus is scanned once and never shuffled; the
    distinct contaminated-id set then flags the corpus by one join on
    doc_id. At 100 TB the benchmark shingle set (~1e6-1e8 strings)
    still broadcasts after dictionary-encoding; if it ever outgrows
    that, the same plan degrades gracefully to a shuffle semi-join on
    the shingle."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("w")
    )
    sh = d.select("doc_id", "source", shingles_from_words("w", 5).alias("shingles"))
    bench_shingles = (
        sh.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    corpus = sh.filter(F.col("doc_id") % 97 != 0)
    contaminated = (
        corpus.select("doc_id", F.explode("shingles").alias("s"))
        .join(F.broadcast(bench_shingles), "s", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_cont", F.lit(1))
    )
    return (
        corpus.join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("_cont").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_contaminated"),
            F.sum(F.when(F.col("_cont").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
    )


@register(
    "q_text_repetition",
    """
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), base AS (
      SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
             CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct
      FROM d
    ), bg AS (
      SELECT doc_id,
             unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bigram
      FROM d WHERE len(w) >= 2
    ), cnt AS (
      SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
    ), top AS (
      SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_cnt,
             CAST(SUM(c) AS BIGINT) AS n_bigrams
      FROM cnt GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_words,
           COALESCE(t.top_bigram_cnt, 0) AS top_bigram_cnt,
           COALESCE(t.n_bigrams, 0) AS n_bigrams,
           CASE WHEN t.n_bigrams IS NULL THEN NULL
                ELSE (t.top_bigram_cnt * 10000 // t.n_bigrams) / 10000.0
           END AS top_bigram_frac,
           ((b.n_words - b.n_distinct) * 10000 // b.n_words) / 10000.0
               AS dup_word_frac,
           COALESCE(t.top_bigram_cnt * 5 >= t.n_bigrams, false) AS repetitive
    FROM base b LEFT JOIN top t USING (doc_id)
    """,
)
def q_text_repetition(spark, sf_dir):
    """Repetition-based quality signals (the Gopher-filter family): per
    document, the fraction of bigrams taken by the single most frequent
    bigram and the duplicate-word fraction; `repetitive` flags docs
    whose top bigram covers >= 20% of all bigrams. Bigram counting is
    explode -> two-level aggregate on (doc_id, bigram) — both
    aggregations combine map-side and shuffle only (doc, bigram)
    partial counts, never document text; word-level stats come straight
    off the scan with no shuffle at all and re-join on doc_id.
    Fractions use exact integer `* 10000 div n` (never round(x/n, 4),
    which half-way-rounds differently across engines)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    base = d.select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_words"),
        F.size(F.array_distinct("w")).cast("bigint").alias("n_distinct"),
    )
    bg = d.filter(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),"
                " (a, b) -> concat(a, ' ', b))"
            )
        ).alias("bigram"),
    )
    cnt = bg.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
    top = cnt.groupBy("doc_id").agg(
        F.max("c").alias("top_bigram_cnt"),
        F.sum("c").alias("n_bigrams"),
    )
    j = base.join(top, "doc_id", "left")
    return j.select(
        "doc_id",
        "n_words",
        F.coalesce("top_bigram_cnt", F.lit(0)).alias("top_bigram_cnt"),
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        (F.expr("top_bigram_cnt * 10000 div n_bigrams") / 10000.0).alias(
            "top_bigram_frac"
        ),
        (F.expr("(n_words - n_distinct) * 10000 div n_words") / 10000.0).alias(
            "dup_word_frac"
        ),
        F.coalesce(
            F.col("top_bigram_cnt") * 5 >= F.col("n_bigrams"), F.lit(False)
        ).alias("repetitive"),
    )


@register(
    "q_text_redact",
    """
    WITH pii AS (
      SELECT c_custkey,
             'contact ' || c_name || ' <user' || CAST(c_custkey AS VARCHAR)
               || '@example.com> or call 555-'
               || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS doc
      FROM customer
    )
    SELECT c_custkey,
           CAST(len(regexp_extract_all(doc,
                '[A-Za-z0-9]+@[A-Za-z0-9.]+')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(doc, '555-[0-9]{4}')) AS INTEGER)
               AS n_phones,
           regexp_replace(regexp_replace(doc,
                '[A-Za-z0-9]+@[A-Za-z0-9.]+', '[EMAIL]', 'g'),
                '555-[0-9]{4}', '[PHONE]', 'g') AS redacted
    FROM pii
    """,
)
def q_text_redact(spark, sf_dir):
    """PII redaction: regex-scrub email addresses and phone numbers,
    reporting match counts per document (the lake-scale form of the
    de-identification step PHI pipelines run before staging; PII spans
    are synthesized deterministically from customer keys since fixture
    text carries none). Pure JVM regexp_replace chain inside one
    codegen stage — no UDF, no shuffle; at 100 TB this runs at scan
    speed. DuckDB needs the 'g' flag to match Spark's replace-all
    default."""
    c = t(spark, sf_dir, "customer")
    doc = F.concat(
        F.lit("contact "),
        F.col("c_name"),
        F.lit(" <user"),
        F.col("c_custkey").cast("string"),
        F.lit("@example.com> or call 555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
    )
    email = r"[A-Za-z0-9]+@[A-Za-z0-9.]+"
    phone = r"555-[0-9]{4}"
    return c.select(
        "c_custkey",
        F.size(F.regexp_extract_all(doc, F.lit(email), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(doc, F.lit(phone), 0)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(doc, email, "[EMAIL]"), phone, "[PHONE]"
        ).alias("redacted"),
    )


@register(
    "q_privacy_k_anon",
    """
    WITH cells AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
             count(*) AS cell_size
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, c_mktsegment, bal_band,
           CAST(cell_size AS BIGINT) AS cell_size
    FROM cells WHERE cell_size < 5
    """,
)
def q_privacy_k_anon(spark, sf_dir):
    """k-anonymity risk report (k=5): group the release candidate by
    its quasi-identifier tuple (nation, segment, coarse balance band)
    and surface every equivalence class smaller than k — the rows a
    linkage attacker can re-identify, and the cells a de-identified
    HCLS release must suppress or generalize before publication. One
    partial-aggregated groupBy; the under-k filter rides the aggregate
    output, so the report costs one shuffle of cell counts at any
    scale. Banding is integer floor division — no float thresholds."""
    c = t(spark, sf_dir, "customer")
    cells = (
        c.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("cell_size"))
    )
    return cells.filter(F.col("cell_size") < 5)


@register(
    "q_privacy_l_diversity",
    """
    WITH cells AS (
      SELECT c_nationkey,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
             count(*) AS cell_size,
             count(DISTINCT c_mktsegment) AS n_sensitive
      FROM customer
      GROUP BY 1, 2
    )
    SELECT c_nationkey, bal_band,
           CAST(cell_size AS BIGINT) AS cell_size,
           CAST(n_sensitive AS BIGINT) AS n_sensitive
    FROM cells WHERE n_sensitive < 3
    """,
)
def q_privacy_l_diversity(spark, sf_dir):
    """l-diversity risk report (l=3), the complement of q_privacy_k_anon:
    a cell can be large enough to pass k-anonymity yet still leak if
    every member shares the same SENSITIVE value (homogeneity attack —
    knowing someone is in the cell reveals their diagnosis). Group by
    the quasi-identifier tuple (nation, balance band), count DISTINCT
    sensitive values (market segment standing in for a diagnosis code),
    and surface cells with fewer than l distinct values. Same cost
    shape as k-anon: one partial-aggregated groupBy; the distinct-count
    adds a per-cell dedup, still one shuffle of cell-level rows."""
    c = t(spark, sf_dir, "customer")
    cells = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    ).agg(
        F.count(F.lit(1)).alias("cell_size"),
        F.countDistinct("c_mktsegment").alias("n_sensitive"),
    )
    return cells.filter(F.col("n_sensitive") < 3)


@register(
    "q_privacy_t_closeness",
    """
    WITH bands AS (
      SELECT c_nationkey AS grp,
             CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS band
      FROM customer
    ), cells AS (
      SELECT grp, band, CAST(count(*) AS BIGINT) AS c_gk
      FROM bands GROUP BY 1, 2
    ), gb AS (
      SELECT band, CAST(count(*) AS BIGINT) AS c_k FROM bands GROUP BY 1
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_total,
             CAST(count(DISTINCT band) AS BIGINT) AS m
      FROM bands
    ), gsz AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n_g FROM bands GROUP BY 1
    ), grid AS (
      SELECT g.grp, gl.band, gl.c_k, COALESCE(c.c_gk, 0) AS c_gk
      FROM gsz g CROSS JOIN gb gl
      LEFT JOIN cells c ON c.grp = g.grp AND c.band = gl.band
    ), cum AS (
      SELECT grid.grp,
             SUM(grid.c_gk * t.n_total - grid.c_k * gsz.n_g)
               OVER (PARTITION BY grid.grp ORDER BY grid.band) AS d_k
      FROM grid
      JOIN gsz ON gsz.grp = grid.grp
      CROSS JOIN tot t
    )
    SELECT cum.grp AS c_nationkey, gsz.n_g AS n,
           CAST(SUM(ABS(d_k)) * 1000000
                // (gsz.n_g * t.n_total * (t.m - 1)) AS BIGINT) AS emd_e6
    FROM cum JOIN gsz ON gsz.grp = cum.grp CROSS JOIN tot t
    GROUP BY cum.grp, gsz.n_g, t.n_total, t.m
    """,
)
def q_privacy_t_closeness(spark, sf_dir):
    """t-closeness audit — the third rung of the k-anon / l-diversity
    ladder: a cell can be large (k) and varied (l) yet still leak if
    its SENSITIVE-value distribution diverges from the table's (skew
    attack: 'people in this cell mostly have high balances'). Per
    quasi-identifier group (nation), measure the ordered Earth Mover's
    Distance between the group's sensitive-band distribution and the
    global one. All-integer recurrence so both engines match
    byte-for-byte: with group counts c_gk, global counts c_k, sizes
    n_g / N, the usual EMD term (Σ_k |Σ_{j≤k}(c_gj/n_g − c_j/N)|)
    / (m−1) is multiplied through by n_g·N — D_k = Σ_{j≤k}(c_gj·N −
    c_k·n_g) is exact BIGINT, and emd_e6 = Σ|D_k|·10⁶ div
    (n_g·N·(m−1)) is one floor division at the end. Scale shape: two
    count aggregations (group×band cells + global bands), a dense
    groups×bands grid (bands are a BOUNDED vocabulary — the grid is
    tiny at any corpus size), one window cumsum per group. Nothing
    row-scale shuffles twice."""
    c = t(spark, sf_dir, "customer")
    bands = c.select(
        F.col("c_nationkey").alias("grp"),
        F.floor(F.col("c_acctbal") / 2000).cast("bigint").alias("band"),
    )
    # ONE base-table aggregation; the global distribution, group sizes
    # and totals all roll up from the tiny (group, band) cell relation
    # — four full scans of the release candidate would be the naive
    # shape, and at 100 TB the base scan is the whole cost. Spark does
    # not share common subplans across DataFrame branches, so the cell
    # relation (groups × bounded band vocabulary — always tiny) is
    # pinned with one localCheckpoint; every rollup reads the
    # materialized cells, never the base table.
    cells = (
        bands.groupBy("grp", "band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_gk"))
        .localCheckpoint(eager=True)
    )
    gband = cells.groupBy("band").agg(F.sum("c_gk").alias("c_k"))
    gsz = cells.groupBy("grp").agg(F.sum("c_gk").alias("n_g"))
    tot = gband.agg(
        F.sum("c_k").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    grid = (
        gsz.crossJoin(F.broadcast(gband))
        .join(cells, ["grp", "band"], "left")
        .withColumn("c_gk", F.coalesce("c_gk", F.lit(0).cast("bigint")))
        .crossJoin(F.broadcast(tot))
    )
    w = Window.partitionBy("grp").orderBy("band")
    cum = grid.withColumn(
        "d_k",
        F.sum(
            F.col("c_gk") * F.col("n_total") - F.col("c_k") * F.col("n_g")
        ).over(w),
    )
    return cum.groupBy("grp", "n_g", "n_total", "m").agg(
        F.expr(
            "cast(sum(abs(d_k)) * 1000000"
            " div (n_g * n_total * (m - 1)) as bigint)"
        ).alias("emd_e6")
    ).select(
        F.col("grp").alias("c_nationkey"), F.col("n_g").alias("n"), "emd_e6"
    )


@register(
    "q_privacy_date_shift",
    """
    WITH shifts AS (
      SELECT o_custkey,
             CAST(CONCAT('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 4))
                  AS BIGINT) % 729 - 364 AS shift_days
      FROM (SELECT DISTINCT o_custkey FROM orders)
    )
    SELECT o.o_orderkey, o.o_custkey,
           CAST(o.o_orderdate AS DATE) + CAST(s.shift_days AS INT) AS shifted_date,
           CAST(s.shift_days AS INT) AS shift_days
    FROM orders o JOIN shifts s ON o.o_custkey = s.o_custkey
    WHERE o.o_orderkey < 5000
    """,
)
def q_privacy_date_shift(spark, sf_dir):
    """Date-shift de-identification (HIPAA-style): every date for a
    patient moves by a PER-PATIENT constant offset in [-364, +364],
    so absolute dates are obscured while intra-patient intervals —
    the clinically meaningful signal — are preserved exactly. The
    offset is DERIVED (md5 of the patient key), not drawn: the same
    patient always shifts identically across tables, runs, and
    engines, with no key-escrow table to leak. Map-side expression on
    the fact side; the distinct-key shifts relation is
    patient-count-sized and AQE-broadcast when small."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    shifts = (
        o.select("o_custkey")
        .distinct()
        .withColumn(
            "shift_days",
            (
                F.conv(
                    F.substring(
                        F.md5(F.col("o_custkey").cast("string").cast("binary")),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 729
                - 364
            ).cast("int"),
        )
    )
    return o.join(shifts, "o_custkey").select(
        "o_orderkey",
        "o_custkey",
        F.date_add(F.col("o_orderdate"), F.col("shift_days")).alias(
            "shifted_date"
        ),
        "shift_days",
    )


@register(
    "q_privacy_pseudonymize",
    """
    WITH c AS (
      SELECT substr(md5('tenant-key-1:' || CAST(c_custkey AS VARCHAR)), 1, 16)
               AS pid,
             c_mktsegment
      FROM customer
    ), o AS (
      SELECT substr(md5('tenant-key-1:' || CAST(o_custkey AS VARCHAR)), 1, 16)
               AS pid,
             o_totalprice
      FROM orders
    )
    SELECT c.c_mktsegment AS segment,
           CAST(count(DISTINCT c.pid) AS BIGINT) AS n_patients,
           CAST(count(o.pid) AS BIGINT) AS n_orders,
           CAST(SUM(COALESCE(CAST(round(o.o_totalprice * 100, 0) AS BIGINT),
                             0)) AS BIGINT) / 100.0 AS total_spend
    FROM c LEFT JOIN o ON o.pid = c.pid
    GROUP BY c.c_mktsegment
    """,
)
def q_privacy_pseudonymize(spark, sf_dir):
    """Keyed pseudonymization (HIPAA-style re-identification-resistant
    tokens): every patient key is replaced by a 16-hex digest of
    tenant-key + id BEFORE any join leaves the trust boundary, and the
    analysis joins ON THE PSEUDONYM — proving referential integrity
    survives de-identification (the same patient tokenizes identically
    in every table, with no escrow mapping to leak; rotate the tenant
    key to unlink releases). The aggregate reproduces a per-segment
    utilization report entirely in pseudonym space, with the money
    sum in integer cents (the analytics-family discipline: per-row
    round(price*100) is the same IEEE op in both engines; the bigint
    sum is then order-independent under ANY partitioning). Map-side
    digest on both sides, one equi-join on the (uniformly distributed)
    token — skew-free by construction at any scale. Complements
    q_privacy_date_shift (same derived-not-drawn determinism, applied
    to identity instead of time)."""
    c = t(spark, sf_dir, "customer").select(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("tenant-key-1:"), F.col("c_custkey").cast("string")
                ).cast("binary")
            ),
            1,
            16,
        ).alias("pid"),
        "c_mktsegment",
    )
    o = t(spark, sf_dir, "orders").select(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("tenant-key-1:"), F.col("o_custkey").cast("string")
                ).cast("binary")
            ),
            1,
            16,
        ).alias("opid"),
        "o_totalprice",
    )
    return (
        c.join(o, c["pid"] == o["opid"], "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.countDistinct("pid").alias("n_patients"),
            F.count("opid").alias("n_orders"),
            (
                F.sum(
                    F.coalesce(
                        F.expr(
                            "cast(round(o_totalprice * 100, 0) as bigint)"
                        ),
                        F.lit(0).cast("bigint"),
                    )
                )
                / F.lit(100.0)
            ).alias("total_spend"),
        )
    )


@register(
    "q_privacy_anonymity_ladder",
    """
    WITH base AS (
      SELECT c.c_nationkey AS nat, c.c_mktsegment AS seg,
             CAST(year(o.o_orderdate) AS INT) AS yr,
             CAST(month(o.o_orderdate) AS INT) AS mo
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), cells AS (
      SELECT CASE WHEN GROUPING(mo) = 0 THEN 0
                  WHEN GROUPING(yr) = 0 THEN 1
                  ELSE 2 END AS gen_level,
             nat, seg, yr, mo, CAST(count(*) AS BIGINT) AS n
      FROM base
      GROUP BY GROUPING SETS ((nat, seg, yr, mo), (nat, seg, yr),
                              (nat, seg))
    )
    SELECT gen_level,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_under_k,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
             AS n_rows_at_risk
    FROM cells GROUP BY gen_level
    """,
)
def q_privacy_anonymity_ladder(spark, sf_dir):
    """Generalization ladder for k-anonymity (k=5): the same release
    audited at three quasi-identifier coarseness levels — (nation,
    segment, year, month) → drop month → drop year — reporting cell
    count, under-k cells, and rows at re-identification risk per
    level; the curve shows exactly how much generalization buys
    compliance (the Datafly/Incognito decision, measured not
    guessed). All three levels aggregate in ONE pass via GROUPING
    SETS (a single Expand feeding one partial-agg shuffle — never one
    job per level), with GROUPING() bits mapping each output row to
    its rung; under-k classification rides the dimension-sized cell
    relation. Calendar fields are NTZ year/month integers."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    base = o.join(
        F.broadcast(c), o["o_custkey"] == c["c_custkey"]
    ).select(
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.expr("cast(year(o_orderdate) as int)").alias("yr"),
        F.expr("cast(month(o_orderdate) as int)").alias("mo"),
    )
    # grouping() bits are only defined INSIDE the grouping-sets
    # aggregate, so the rung id is emitted as agg columns and mapped
    # afterwards
    cells = (
        base.groupingSets(
            [["nat", "seg", "yr", "mo"], ["nat", "seg", "yr"],
             ["nat", "seg"]],
            "nat", "seg", "yr", "mo",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.grouping("yr").alias("g_yr"),
            F.grouping("mo").alias("g_mo"),
        )
        .withColumn(
            "gen_level",
            F.when(F.col("g_mo") == 0, 0)
            .when(F.col("g_yr") == 0, 1)
            .otherwise(2),
        )
    )
    return cells.groupBy("gen_level").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(F.when(F.col("n") < 5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_under_k"),
        F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_at_risk"),
    )


@register(
    "q_privacy_dp_histogram",
    """
    WITH cells AS (
      SELECT event_type,
             CAST(epoch_ns(ts) // 604800000000000 AS BIGINT) AS wk,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), noised AS (
      SELECT event_type, wk, n,
             CAST(list_sum(
               [bit_count(strpos('0123456789abcdef',
                  substr(md5('dphist:v1:' || event_type || ':'
                             || CAST(wk AS VARCHAR)), i, 1)) - 1)
                for i in range(1, 17)]) AS BIGINT) - 32 AS noise
      FROM cells
    )
    SELECT event_type, CAST(wk AS BIGINT) AS wk,
           CAST(GREATEST(0, n + noise) AS BIGINT) AS noisy_n
    FROM noised
    """,
)
def q_privacy_dp_histogram(spark, sf_dir):
    """Differentially-private release of the event-type x epoch-week
    histogram via the BINOMIAL MECHANISM (Dwork et al., "Our Data,
    Ourselves", 2006): each cell's true count is perturbed by
    popcount(64 seeded bits) - 32 ~ Binomial(64, 1/2) - 32 (sigma = 4,
    zero-mean), then clamped at 0; only the noised counts leave the
    query — the true n never appears in the output, the release a
    training-data pipeline can publish per-source document tallies
    through. The noise bits are the first 16 nibbles of
    md5('dphist:v1:' || cell key) — the same engine-neutral md5-nibble
    family as operators/sketches (a keyed PRF in the seeded-noise
    deployment; rotate the version tag to redraw), so BOTH engines
    derive the identical perturbation and the release value-hashes
    cross-engine, which a true-random mechanism never could. Plan
    shape: one partial-agg shuffle to the bounded cell grid, then
    noise is a per-cell scalar expression — nothing row-sized moves.
    The popcount folds 16 bit_count(nibble) terms, all JVM codegen."""
    e = events(spark, sf_dir)
    cells = e.groupBy(
        "event_type",
        F.expr("cast(ts_ns div 604800000000000 as bigint)").alias("wk"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    h = (
        "md5(cast(concat('dphist:v1:', event_type, ':',"
        " cast(wk as string)) as binary))"
    )
    pop = (
        f"aggregate(transform(sequence(1, 16), i -> "
        f"bit_count(instr('0123456789abcdef', substr({h}, i, 1)) - 1)),"
        " 0, (a, x) -> a + x)"
    )
    return cells.select(
        "event_type",
        F.col("wk").cast("bigint").alias("wk"),
        F.expr(
            f"cast(greatest(0, n + (cast({pop} as bigint) - 32)) as bigint)"
        ).alias("noisy_n"),
    )


@register(
    "q_text_distinctive_terms",
    """
    WITH toks AS (
      SELECT lang = 'en' AS is_en,
             unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE lang IN ('en', 'de')
    ), counts AS (
      SELECT tok,
             CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT)
               AS a_n,
             CAST(SUM(CASE WHEN is_en THEN 0 ELSE 1 END) AS BIGINT)
               AS b_n
      FROM toks GROUP BY tok
    ), tot AS (
      SELECT SUM(a_n) AS a_tot, SUM(b_n) AS b_tot,
             CAST(count(*) AS BIGINT) AS v
      FROM counts
    )
    SELECT tok, a_n, b_n,
           CAST((a_n + 1) * (b_tot + v) * 1000000
                // ((b_n + 1) * (a_tot + v)) AS BIGINT) AS odds_ppm
    FROM counts, tot
    WHERE a_n + b_n >= 50
      AND ((a_n + 1) * (b_tot + v) * 100
             >= 110 * (b_n + 1) * (a_tot + v)
        OR (b_n + 1) * (a_tot + v) * 100
             >= 110 * (a_n + 1) * (b_tot + v))
    """,
)
def q_text_distinctive_terms(spark, sf_dir):
    """Corpus-comparison DISTINCTIVE TERMS ('fightin' words'
    Monroe-Colaresi-Quinn shape without the log): which vocabulary
    over-indexes in the en slice vs the de slice — the drift probe
    run between two data sources, two time snapshots, or a corpus
    and its benchmark before mixing them. The smoothed rate ratio
    (a_n+1)/(a_tot+V) vs (b_n+1)/(b_tot+V) (add-one Dirichlet, so
    unseen-in-one-side words stay finite) is evaluated ENTIRELY
    cross-multiplied — the emission band (±1.1x here, with a support
    floor of 50 — sized to this corpus's nearly-uniform synthetic
    vocabulary; real corpora run ±2-5x) and the reported
    odds_ppm are integer expressions, where the standard log-odds
    spelling would hang engine-dependent ln() ulps on every row
    (the q_diag_distribution_drift lesson, applied to vocabulary).
    Plan: one token explode + one (token) shuffle; the totals are a
    1-row aggregate of the token relation broadcast back (the tiny
    cross join is over a 1-row side). Complements q_text_tfidf
    (within-corpus salience) and q_text_keywords (per-doc): this
    one is BETWEEN-corpora."""
    d = t(spark, sf_dir, "documents").filter(
        F.col("lang").isin("en", "de")
    )
    toks = d.select(
        (F.col("lang") == "en").alias("is_en"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(
        F.sum(F.expr("case when is_en then 1 else 0 end"))
        .cast("bigint")
        .alias("a_n"),
        F.sum(F.expr("case when is_en then 0 else 1 end"))
        .cast("bigint")
        .alias("b_n"),
    )
    tot = counts.agg(
        F.sum("a_n").alias("a_tot"),
        F.sum("b_n").alias("b_tot"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    return (
        counts.join(F.broadcast(tot))
        .filter(
            F.expr(
                "a_n + b_n >= 50 and ((a_n + 1) * (b_tot + v) * 100"
                " >= 110 * (b_n + 1) * (a_tot + v)"
                " or (b_n + 1) * (a_tot + v) * 100"
                " >= 110 * (a_n + 1) * (b_tot + v))"
            )
        )
        .select(
            "tok",
            "a_n",
            "b_n",
            F.expr(
                "cast((a_n + 1) * (b_tot + v) * 1000000"
                " div ((b_n + 1) * (a_tot + v)) as bigint)"
            ).alias("odds_ppm"),
        )
    )


@register(
    "q_privacy_randomized_response",
    """
    WITH per_user AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' AND value > 200
                      THEN 1 ELSE 0 END) AS truth
      FROM events GROUP BY user_id
    ), reported AS (
      SELECT user_id,
             CASE WHEN (strpos('0123456789abcdef',
                          substr(md5('rr:v1:'
                                     || CAST(user_id AS VARCHAR)), 1, 1))
                        - 1) % 4 = 0
                  THEN 1 - truth ELSE truth END AS resp
      FROM per_user
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(SUM(resp) AS BIGINT) AS yes_reported,
           CAST(2 * SUM(resp) - (count(*) + 1) // 2 AS BIGINT)
             AS debiased_x1
    FROM reported
    """,
)
def q_privacy_randomized_response(spark, sf_dir):
    """LOCAL differential privacy via RANDOMIZED RESPONSE (Warner
    1965) — the per-record mechanism that complements
    q_privacy_dp_histogram's central noise: each user's sensitive
    bit (big-ticket purchaser) is FLIPPED with probability 1/4
    before it ever reaches aggregation, so no individual row in the
    reported relation is trustworthy while the population count
    debiases exactly: E[yes] = 3/4·t + 1/4·(n−t) ⇒ t̂ =
    2·yes − n/2, emitted as the integer debiased_x1 (×1, with n/2
    rounded up — pinned). The flip decision is the md5-nibble
    family keyed per user ('rr:v1:' tag — a keyed PRF in the seeded
    deployment, rotate to redraw), so BOTH engines derive identical
    flips and the hash check covers mechanism + debiasing, which
    true randomness never could. Plan: user-keyed partial agg, map-
    side flip arithmetic, 1-row reduce. The seeded determinism is
    the auditable-pipeline trade: ε comes from flip probability,
    reproducibility from the keyed seed."""
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.expr(
            "max(case when event_type = 'purchase' and value > 200"
            " then 1 else 0 end)"
        ).alias("truth")
    )
    flip = (
        "(instr('0123456789abcdef', substr(md5(cast(concat('rr:v1:',"
        " cast(user_id as string)) as binary)), 1, 1)) - 1) % 4 = 0"
    )
    reported = per_user.select(
        F.expr(
            f"case when {flip} then 1 - truth else truth end"
        ).alias("resp")
    )
    return reported.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("resp").cast("bigint").alias("yes_reported"),
        F.expr(
            "cast(2 * sum(resp) - (count(1) + 1) div 2 as bigint)"
        ).alias("debiased_x1"),
    )


@register(
    "q_text_outlier_docs",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ), corpus AS MATERIALIZED (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok
    ), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM corpus),
    per_doc AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS d
      FROM toks GROUP BY doc_id, tok
    ), doc_n AS (
      SELECT doc_id, CAST(SUM(d) AS BIGINT) AS n FROM per_doc
      GROUP BY doc_id
    ), in_doc AS (
      SELECT p.doc_id,
             CAST(SUM(abs(p.d * tot.t - c.c * dn.n)) AS BIGINT)
               AS present_term,
             CAST(SUM(c.c) AS BIGINT) AS doc_corpus_mass
      FROM per_doc p
      JOIN corpus c ON c.tok = p.tok
      JOIN doc_n dn ON dn.doc_id = p.doc_id, tot
      GROUP BY p.doc_id
    )
    SELECT i.doc_id,
           dn.n AS n_tokens,
           CAST(i.present_term
                + dn.n * (tot.t - i.doc_corpus_mass) AS BIGINT)
             AS tv_x2nt,
           CAST((i.present_term + dn.n * (tot.t - i.doc_corpus_mass))
                * 500000 // (dn.n * tot.t) AS BIGINT) AS tv_ppm
    FROM in_doc i JOIN doc_n dn ON dn.doc_id = i.doc_id, tot
    ORDER BY tv_ppm DESC, i.doc_id
    LIMIT 20
    """,
)
def q_text_outlier_docs(spark, sf_dir):
    """DISTRIBUTIONAL OUTLIER documents — the curation gate that
    catches docs whose unigram distribution diverges from the
    corpus (wrong language slipped the langid net, boilerplate,
    garbled decode): per-doc total-variation distance to the corpus
    distribution, EXACT — TV·2·n·T splits into the in-vocabulary
    term Σ|d·T − C·n| plus the mass of corpus vocabulary the doc
    never uses, n·(T − Σ_{t∈doc}C(t)), both pure BIGINT (the
    q_diag_distribution_drift move, taken from corpus-halves grain
    to PER-DOCUMENT scoring); tv_ppm = TV·10⁶ via one integer
    division. Top-20 by divergence, doc_id-pinned ties. Plan: one
    token explode feeding both the corpus aggregate (broadcast-
    sized vocabulary) and the (doc, tok) aggregate; the corpus
    relation joins back token-keyed; TakeOrdered top-20. At 100 TB
    the vocabulary relation is the only shared state — broadcast
    or bucket-joined, while docs stream."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    toks = toks.localCheckpoint()  # feeds corpus AND per-doc aggregates
    corpus = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = corpus.agg(F.sum("c").cast("bigint").alias("t"))
    per_doc = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    doc_n = per_doc.groupBy("doc_id").agg(
        F.sum("d").cast("bigint").alias("n")
    )
    in_doc = (
        per_doc.join(F.broadcast(corpus), "tok")
        .join(F.broadcast(doc_n), "doc_id")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr("abs(d * t - c * n)"))
            .cast("bigint")
            .alias("present_term"),
            F.sum("c").cast("bigint").alias("doc_corpus_mass"),
        )
    )
    scored = (
        in_doc.join(F.broadcast(doc_n), "doc_id")
        .join(F.broadcast(tot))
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            F.expr(
                "cast(present_term + n * (t - doc_corpus_mass) as bigint)"
            ).alias("tv_x2nt"),
            F.expr(
                "cast((present_term + n * (t - doc_corpus_mass))"
                " * 500000 div (n * t) as bigint)"
            ).alias("tv_ppm"),
        )
    )
    return scored.orderBy(F.col("tv_ppm").desc(), "doc_id").limit(20)


@register(
    "q_privacy_dp_mean",
    """
    WITH per_user AS (
      SELECT user_id,
             LEAST(CAST(20000 AS BIGINT),
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(round(value * 100) AS BIGINT)
                            ELSE 0 END) AS BIGINT)) AS spend_c
      FROM events GROUP BY user_id
    ), noise AS (
      SELECT
        CAST(list_sum(
          [bit_count(strpos('0123456789abcdef',
             substr(md5('dpmean:v1:sum'), i, 1)) - 1)
           for i in range(1, 17)]) AS BIGINT) - 32 AS sum_noise_units,
        CAST(list_sum(
          [bit_count(strpos('0123456789abcdef',
             substr(md5('dpmean:v1:count'), i, 1)) - 1)
           for i in range(1, 17)]) AS BIGINT) - 32 AS count_noise
    )
    SELECT
      CAST(SUM(spend_c) + n.sum_noise_units * 200 AS BIGINT)
        AS noisy_sum_c,
      CAST(count(*) + n.count_noise AS BIGINT) AS noisy_n,
      CAST((SUM(spend_c) + n.sum_noise_units * 200) * 100
           // GREATEST(count(*) + n.count_noise, 1) AS BIGINT)
        AS dp_mean_x100_c
    FROM per_user, noise n
    GROUP BY n.sum_noise_units, n.count_noise
    """,
)
def q_privacy_dp_mean(spark, sf_dir):
    """DP MEAN release with CONTRIBUTION CLAMPING — the third rung of
    the privacy-release family (histogram = central counts,
    randomized response = local bits, this = bounded NUMERIC
    aggregate): each user's spend is clamped to a 200-dollar cap
    FIRST (bounded sensitivity is what makes the noise scale
    meaningful — without the clamp one whale forces unbounded
    noise), then sum and count are perturbed independently by the
    seeded binomial mechanism (σ=4 units; sum noise scaled by 1% of
    the cap) and the released mean is their integer quotient.
    Everything after the clamp is the md5-nibble keyed-PRF family,
    so the release value-hashes cross-engine — mechanism, scaling,
    and quotient all verified, the property a true-random release
    can never give an auditor. Plan: one user-keyed partial agg
    (map-side clamp), a literal 1-row noise relation, 1-row
    output."""
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.expr(
            "least(cast(20000 as bigint),"
            " cast(sum(case when event_type = 'purchase'"
            " then cast(round(value * 100) as bigint)"
            " else 0 end) as bigint))"
        ).alias("spend_c")
    )

    def pop(tag):
        h = f"md5(cast('dpmean:v1:{tag}' as binary))"
        return (
            f"cast(aggregate(transform(sequence(1, 16), i ->"
            f" bit_count(instr('0123456789abcdef', substr({h}, i, 1))"
            f" - 1)), 0, (a, x) -> a + x) as bigint) - 32"
        )

    return per_user.agg(
        F.expr(
            f"cast(sum(spend_c) + ({pop('sum')}) * 200 as bigint)"
        ).alias("noisy_sum_c"),
        F.expr(f"cast(count(1) + ({pop('count')}) as bigint)").alias(
            "noisy_n"
        ),
        F.expr(
            f"cast((sum(spend_c) + ({pop('sum')}) * 200) * 100"
            f" div greatest(count(1) + ({pop('count')}), 1) as bigint)"
        ).alias("dp_mean_x100_c"),
    )


@register(
    "q_privacy_dp_topk",
    """
    WITH counts AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    ), noised AS (
      SELECT r.rel, c.event_type,
             c.n + (CAST(CONCAT('0x', substr(md5(
                 'dpmax:v1:' || c.event_type || ':'
                 || CAST(r.rel AS VARCHAR)), 1, 6)) AS BIGINT)
               % 1001) - 500 AS noisy
      FROM counts c,
           LATERAL (SELECT unnest(generate_series(0, 4)) AS rel) r
    )
    SELECT CAST(rel AS INT) AS rel, event_type AS winner,
           CAST(noisy AS BIGINT) AS noisy_score
    FROM (
      SELECT rel, event_type, noisy,
             row_number() OVER (PARTITION BY rel
               ORDER BY noisy DESC, event_type) AS rk
      FROM noised
    ) WHERE rk = 1
    """,
)
def q_privacy_dp_topk(spark, sf_dir):
    """REPORT-NOISY-MAX — the differentially-private SELECTION
    primitive (which category wins, not what its count is): each of
    5 independent releases perturbs every category's count with
    bounded integer noise and reports only the argmax (ties to the
    lexicographic category — the deterministic tie-break noisy-max
    needs to be auditable at all). Noise is md5-DERIVED uniform on
    [-500, 500] — a deterministic stand-in for the geometric
    mechanism so both engines draw identical noise; the SELECTION
    STRUCTURE (noise → argmax → release the winner only) is the
    engineered artifact, the distribution swap is a constant. The
    winner flips across releases only when counts are within noise
    range — close races leak less, exactly the DP selection
    intuition; the noisy_score column is what a real deployment
    would withhold, emitted here because the harness's job is to
    verify the mechanism.

    100 TB: the count aggregate is the only data-sized pass;
    noising and argmax run on the category-sized relation (5
    releases × |categories| rows). Completes the privacy ladder's
    selection rung alongside dp_histogram (counts), dp_mean
    (numeric), and randomized_response (local)."""
    counts = (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    noised = counts.select(
        "event_type",
        "n",
        F.explode(F.expr("sequence(0, 4)")).alias("rel"),
    ).withColumn(
        "noisy",
        F.col("n")
        + F.conv(
            F.substring(
                F.md5(
                    F.expr(
                        "cast(concat('dpmax:v1:', event_type, ':',"
                        " cast(rel as string)) as binary)"
                    )
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("bigint")
        % 1001
        - 500,
    )
    w = Window.partitionBy("rel").orderBy(
        F.col("noisy").desc(), "event_type"
    )
    return (
        noised.withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select(
            F.col("rel").cast("int").alias("rel"),
            F.col("event_type").alias("winner"),
            F.col("noisy").cast("bigint").alias("noisy_score"),
        )
    )


@register(
    "q_decontaminate_near",
    """
    WITH d AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ), sh AS MATERIALIZED (
      SELECT doc_id, source,
             CASE WHEN len(w) < 5 THEN []
                  ELSE list_distinct([array_to_string(w[i:i+4], ' ')
                                      for i in range(1, len(w) - 3)])
             END AS shingles
      FROM d
    ), sizes AS MATERIALIZED (
      SELECT doc_id, CAST(len(shingles) AS BIGINT) AS sz FROM sh
    ), bench AS (
      SELECT doc_id AS bid, unnest(shingles) AS s FROM sh
      WHERE doc_id % 97 = 0
    ), corp AS (
      SELECT doc_id AS cid, unnest(shingles) AS s FROM sh
      WHERE doc_id % 97 <> 0
    ), cand AS (
      SELECT cid, bid, CAST(count(*) AS BIGINT) AS inter
      FROM corp JOIN bench USING (s)
      GROUP BY cid, bid
    ), flagged AS (
      SELECT DISTINCT cand.cid
      FROM cand
      JOIN sizes cs ON cs.doc_id = cand.cid
      JOIN sizes bs ON bs.doc_id = cand.bid
      WHERE inter * 2 >= (cs.sz + bs.sz - inter)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN flagged.cid IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_near_contaminated,
           CAST(SUM(CASE WHEN flagged.cid IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept
    FROM sh LEFT JOIN flagged ON sh.doc_id = flagged.cid
    WHERE sh.doc_id % 97 <> 0
    GROUP BY source
    """,
)
def q_decontaminate_near(spark, sf_dir):
    """NEAR-duplicate benchmark decontamination — the paraphrase-robust
    complement of q_decontaminate's exact-overlap test: a training
    document is contaminated when its 5-gram shingle set has Jaccard
    >= 0.5 with ANY held-out benchmark document (doc_id % 97 slice),
    catching lightly-edited eval leaks a single-shared-5-gram test
    over-flags and an exact-match test misses. Candidate generation
    must be COMPLETE for the exact-threshold oracle (probabilistic
    LSH could miss a qualifying pair), so it is the bipartite
    inverted index: corpus shingles explode once and equi-join the
    BROADCAST benchmark shingle postings — J >= 0.5 implies a shared
    shingle, so no qualifying pair escapes; |intersection| is one
    count per (corpus, bench) pair, the union comes from precomputed
    set sizes, and the comparison is exact integer cross-multiply
    (inter*2 >= union). At 100 TB the corpus explodes exactly once
    and never self-joins; the benchmark side stays broadcast-sized;
    a boilerplate-shingle blow-up is bounded by the tiny bench side
    per shingle (and the cap_postings stop-list discipline applies
    if a bench suite ever ships boilerplate). Fixture note: the
    bounded 500-doc corpus yields 2 qualifying cross-split pairs at
    sf0.001/sf0.1 and 0 at sf0.01 — the census (per-source n_docs /
    flagged / kept) is verified either way."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("w")
    )
    sh = d.select(
        "doc_id",
        "source",
        shingles_from_words("w", 5).alias("shingles"),
    )
    sizes = sh.select(
        "doc_id", F.size("shingles").cast("bigint").alias("sz")
    )
    bench = (
        sh.filter(F.col("doc_id") % 97 == 0)
        .select(F.col("doc_id").alias("bid"), F.explode("shingles").alias("s"))
    )
    # corpus set size rides THROUGH the explode as one extra int column
    # computed inline — the corpus-sized sizes relation must never
    # broadcast or self-join (only the bench side is broadcast-small)
    corp = (
        sh.filter(F.col("doc_id") % 97 != 0)
        .select(
            F.col("doc_id").alias("cid"),
            F.size("shingles").cast("bigint").alias("c_sz"),
            F.explode("shingles").alias("s"),
        )
    )
    cand = (
        corp.join(F.broadcast(bench), "s")
        .groupBy("cid", "bid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("inter"),
            F.first("c_sz").alias("c_sz"),
        )
    )
    # bench set sizes: filter to the benchmark slice BEFORE broadcasting
    # — only bench ids can match the bid key, and broadcasting the
    # unfiltered corpus-sized sizes relation would grow with the corpus
    # (OOM at 100 TB), not with the bench suite
    bench_sizes = sizes.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bid"), F.col("sz").alias("b_sz")
    )
    flagged = (
        cand.join(F.broadcast(bench_sizes), "bid")
        .filter(
            F.col("inter") * 2 >= F.col("c_sz") + F.col("b_sz") - F.col("inter")
        )
        .select("cid")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        sh.filter(F.col("doc_id") % 97 != 0)
        .join(flagged, sh.doc_id == flagged.cid, "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_near_contaminated"),
            F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
    )
