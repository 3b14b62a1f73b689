"""CLI: run oracle parity for all (or named) queries.

    python tests/run_parity.py [query ...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from hcls_data_lake_spark import registry
    from hcls_data_lake_spark.session import get_spark
    from tests.parity import compare

    spark = get_spark("parity")
    qs = registry.queries()
    oracles = registry.oracle_sql()
    names = args or sorted(qs)
    n_ok = n_fail = 0
    failures = []
    for name in names:
        t0 = time.time()
        try:
            ok, msg = compare(spark, sf_dir, name, qs[name], oracles.get(name))
        except Exception as ex:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {type(ex).__name__}: {str(ex)[:400]}"
        dt = time.time() - t0
        status = "OK  " if ok else "FAIL"
        print(f"{status} {name:32s} {dt:6.1f}s  {msg}", flush=True)
        if ok:
            n_ok += 1
        else:
            n_fail += 1
            failures.append(name)
    print(f"\n{n_ok} ok, {n_fail} failed" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
