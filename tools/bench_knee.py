"""Broadcast->bucketed knee study (r11, VERDICT r10 ask #5).

The one unmeasured scale claim after sf1: WHERE does q_join_multiway's
growth exceed linear, and does the bucketed layout win there? This
tool builds an sf3 replica set (30 disjoint key-offset replicas of the
sf0.1 fixtures — the tools/bench_sf1.py pattern, facts ~18M lineitem
rows) and times q_join_multiway vs q_join_multiway_bucketed at sf0.1 /
sf1 / sf3 in ONE session (untimed warmup that also pays the one-time
bucket-layout write, then min-over-3), printing the growth table that
SCALE.md records.

    python tools/bench_knee.py [--skip-build]
"""

from __future__ import annotations

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
}
COPY = ["region", "nation"]
QUERIES = ["q_join_multiway", "q_join_multiway_bucketed"]


def build(spark, src: str, dst: str, n_replicas: int) -> None:
    from pyspark.sql import functions as F

    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    for tbl in COPY:
        shutil.copy(f"{src}/{tbl}.parquet", f"{dst}/{tbl}.parquet")
    for tbl, keys in OFFSETS.items():
        df = spark.read.parquet(f"{src}/{tbl}.parquet")
        types = dict(df.dtypes)
        rep = spark.range(n_replicas).select(F.col("id").alias("_rep"))
        out = df.crossJoin(rep)
        for k in keys:
            out = out.withColumn(
                k, (F.col(k) + F.col("_rep") * SPAN).cast(types[k])
            )
        out.drop("_rep").coalesce(16).write.mode("overwrite").parquet(
            f"{dst}/{tbl}.parquet"
        )


def main() -> None:
    skip_build = "--skip-build" in sys.argv
    from hcls_data_lake_spark.session import get_spark
    import __spark_entry__

    qs = __spark_entry__.queries()

    spark = get_spark("hcls-bench-knee")
    spark.sparkContext.setLogLevel("ERROR")

    scales = {"sf0.1": "/root/testdata/sf0.1"}
    for tag, dst, n in (("sf1", "/tmp/hcls_knee_sf1", 10),
                        ("sf3", "/tmp/hcls_knee_sf3", 30)):
        if not skip_build or not os.path.isdir(dst):
            print(f"building {tag} at {dst} ({n} replicas)...",
                  file=sys.stderr)
            build(spark, "/root/testdata/sf0.1", dst, n)
        scales[tag] = dst

    out: dict[str, dict[str, float]] = {}
    for tag, sf_dir in scales.items():
        out[tag] = {}
        for name in QUERIES:
            fn = qs[name]
            fn(spark, sf_dir).count()  # warmup; pays bucket layout once
            runs = []
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf_dir).count()
                runs.append(time.time() - t0)
            out[tag][name] = round(min(runs), 3)
            print(f"{tag} {name}: {out[tag][name]}s", file=sys.stderr)

    rows = []
    for name in QUERIES:
        base = out["sf0.1"][name]
        rows.append({
            "query": name,
            "sf0.1": base,
            "sf1": out["sf1"][name],
            "sf3": out["sf3"][name],
            "growth_10x": round(out["sf1"][name] / base, 2),
            "growth_30x": round(out["sf3"][name] / base, 2),
        })
    print(json.dumps({"metric": "knee_study", "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
