"""Targeted pristine re-measure: times NAMED bench entries with warmup
+ min-over-N reps in a fresh session and writes {name: sec} JSON.
Used for the two-round ambient-flag evidence policy (BASELINE.md
"r9 gate result"): a flagged entry gets a dedicated 12-15-rep pristine
session before its committed value is refreshed or the flag reverted.

    python tools/bench_targeted.py OUT.json REPS name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1]
    reps = int(sys.argv[2])
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    from hcls_data_lake_spark import registry
    from hcls_data_lake_spark.session import get_spark

    spark = get_spark("hcls-bench-targeted")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    qs["q_scan_parquet"](spark, sf_dir).collect()
    for name in names:  # warmup (2x: JIT + shuffle-file cache)
        qs[name](spark, sf_dir).count()
        qs[name](spark, sf_dir).count()
    out: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(max(1, reps)):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(f"{name} {best:.3f}", flush=True)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=0, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
