"""sf1 scale spot-check (VERDICT r6 ask #9).

Builds a ~sf1 dataset as 10 disjoint KEY-OFFSET REPLICAS of the sf0.1
fixtures (each replica offsets every PK/FK by replica*1e8, so
referential integrity holds within a replica and the union is a valid
database at 10x the fact volume — lineitem 6M rows), then times the
14 headline queries at BOTH scales in one session (warmup +
min-over-3) and prints the growth table. documents/embeddings are
copied as-is: they are 500 rows at EVERY sf by fixture contract, so
corpus-bounded queries are expected flat. events is re-written as a
single parquet FILE (the streaming file source reads the literal
path).

    python tools/bench_sf1.py [--dst=/tmp/hcls_sf1] [--skip-build]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPAN = 100_000_000
OFFSETS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
}
COPY = ["region", "nation", "documents", "embeddings"]


def build(spark, src: str, dst: str) -> None:
    from pyspark.sql import functions as F

    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    for tbl in COPY:
        shutil.copy(f"{src}/{tbl}.parquet", f"{dst}/{tbl}.parquet")
    for tbl, keys in OFFSETS.items():
        df = spark.read.parquet(f"{src}/{tbl}.parquet")
        types = dict(df.dtypes)
        rep = spark.range(10).select(F.col("id").alias("_rep"))
        out = df.crossJoin(rep)
        for k in keys:
            out = out.withColumn(
                k, (F.col(k) + F.col("_rep") * SPAN).cast(types[k])
            )
        out.drop("_rep").coalesce(8).write.mode("overwrite").parquet(
            f"{dst}/{tbl}.parquet"
        )
    # streaming file source wants events.parquet to be a literal file
    df = spark.read.parquet(f"{dst}/events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(f"{dst}/_ev")
    shutil.rmtree(f"{dst}/events.parquet")
    shutil.move(
        glob.glob(f"{dst}/_ev/part-*.parquet")[0], f"{dst}/events.parquet"
    )
    shutil.rmtree(f"{dst}/_ev")


def main() -> None:
    dst = "/tmp/hcls_sf1"
    skip_build = "--skip-build" in sys.argv[1:]
    for a in sys.argv[1:]:
        if a.startswith("--dst="):
            dst = a.split("=", 1)[1]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    import bench

    from hcls_data_lake_spark import registry
    from hcls_data_lake_spark.session import get_spark

    spark = get_spark("hcls-bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    if not skip_build:
        build(spark, "/root/testdata/sf0.1", dst)
    qs = registry.queries()
    out: dict[str, dict[str, float]] = {}
    for sf, tag in (("/root/testdata/sf0.1", "sf0.1"), (dst, "sf1")):
        qs["q_scan_parquet"](spark, sf).collect()
        for n in bench.HEADLINE:
            qs[n](spark, sf).count()  # warmup
        res: dict[str, float] = {}
        for n in bench.HEADLINE:
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                qs[n](spark, sf).count()
                best = min(best, time.perf_counter() - t0)
            res[n] = round(best, 3)
        out[tag] = res
    for n in bench.HEADLINE:
        a, b = out["sf0.1"][n], out["sf1"][n]
        print(f"{n:28s} {a:7.3f}  {b:7.3f}  {b / a:5.2f}x")
    print(json.dumps({
        "sf0.1_total": round(sum(out["sf0.1"].values()), 2),
        "sf1_total": round(sum(out["sf1"].values()), 2),
        "per_query": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
