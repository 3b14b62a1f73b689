"""Corpus-scale dedup stress fixture (r9, VERDICT r8 ask #7).

The sf1 replica set (tools/bench_sf1.py) copies documents/embeddings
AS-IS (500 rows at every sf by fixture contract), so the r8 sf1 parity
proved the dedup family only at fixture corpus size. This builds the
complement: a dataset where the CORPUS is 10x — documents and
embeddings replicated 10 times with id offsets (replica*100_000_000)
and texts/vectors kept byte-identical, so every document gains 9 exact
cross-replica duplicates. That is the adversarial shape for the dedup
surface: posting lists and LSH buckets grow 10x in multiplicity,
connected components span replicas (cluster size >= 10), and the
decontamination bench slice changes membership per replica. Fact
tables are copied from sf0.1 unchanged (the dedup family never reads
them; they exist so the oracle harness can create all views).

    python tools/build_docs10.py [--dst=/tmp/hcls_docs10]

Then: python tests/run_parity.py q_dedup_pipeline_e2e \
        q_text_passage_dedup q_decontaminate_near q_dedup_semantic \
        --sf=/tmp/hcls_docs10
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPAN = 100_000_000
SRC = "/root/testdata/sf0.1"


def main() -> None:
    dst = "/tmp/hcls_docs10"
    for a in sys.argv[1:]:
        if a.startswith("--dst="):
            dst = a.split("=", 1)[1]
    os.makedirs(dst, exist_ok=True)
    from hcls_data_lake_spark.tables import TABLES

    for name in TABLES:
        if name in ("documents", "embeddings"):
            continue
        src_p = f"{SRC}/{name}.parquet"
        dst_p = f"{dst}/{name}.parquet"
        if not os.path.exists(dst_p):
            shutil.copy(src_p, dst_p)

    from hcls_data_lake_spark.session import get_spark
    from pyspark.sql import functions as F

    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    spark = get_spark("build-docs10")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = spark.range(0, 10).select(F.col("id").alias("_rep"))
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("_rep") * SPAN).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        .coalesce(4)
        .write.mode("overwrite")
        .parquet(f"{dst}/documents.parquet")
    )
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("_rep") * SPAN).alias("vec_id"),
            "embedding", "label",
        )
        .coalesce(4)
        .write.mode("overwrite")
        .parquet(f"{dst}/embeddings.parquet")
    )
    n_d = spark.read.parquet(f"{dst}/documents.parquet").count()
    n_e = spark.read.parquet(f"{dst}/embeddings.parquet").count()
    print(f"built {dst}: documents={n_d} embeddings={n_e}")
    spark.stop()


if __name__ == "__main__":
    main()
