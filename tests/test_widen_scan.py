"""Focused tests for tables.widen_scan (r12 optimization):
scan-parallelism healing must widen starved single-task scans to the
session's defaultParallelism, preserve the row multiset exactly, and
NO-OP (same DataFrame object, no exchange) whenever the input is
already at least that wide — the guard that keeps production lake
plans unchanged."""

from __future__ import annotations

from pyspark.sql import functions as F

from hcls_data_lake_spark.tables import load_table, widen_scan


def test_widen_scan_spreads_starved_scan(spark, sf_dir):
    src = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    assert src.rdd.getNumPartitions() == 1  # single-row-group fixture
    wide = widen_scan(src)
    assert (
        wide.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # round-robin repartition must preserve the row multiset exactly
    before = sorted(r.doc_id for r in src.select("doc_id").collect())
    after = sorted(r.doc_id for r in wide.select("doc_id").collect())
    assert before == after
    assert "Exchange RoundRobinPartitioning" in wide._jdf.queryExecution().executedPlan().toString()


def test_widen_scan_noop_when_already_parallel(spark, sf_dir):
    src = load_table(spark, sf_dir, "documents").select("doc_id")
    target = spark.sparkContext.defaultParallelism
    already = src.repartition(target)
    assert widen_scan(already) is already  # guard: no second exchange
    wider = src.repartition(target + 3)
    assert widen_scan(wider) is wider  # >= target also untouched


def test_widen_scan_explicit_parts(spark, sf_dir):
    src = load_table(spark, sf_dir, "documents").select("doc_id")
    assert widen_scan(src, parts=5).rdd.getNumPartitions() == 5
    # explicit parts below the current width is also a no-op
    five = src.repartition(5)
    assert widen_scan(five, parts=3) is five


def test_widen_scan_result_unchanged_through_heavy_map(spark, sf_dir):
    """The kept call sites put widen_scan under aggregation pipelines;
    aggregate results must not depend on the partitioning."""
    src = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def token_hist(df):
        return sorted(
            (r.w, r.n)
            for r in df.select(
                F.explode(F.split("text", " ")).alias("w")
            )
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    assert token_hist(widen_scan(src)) == token_hist(src)
