"""Merge chunked bench partials (and optionally a prior ledger) into a
minima ledger JSON shaped like bench.py's output:

    python tools/merge_bench_ledger.py OUT.json PART.json [PART.json ...]

Each PART is either a flat {name: sec} dict (bench_ledger_chunk.py
output) or a full bench.py line (queries/extended_queries pulled out).
The OUT value for each query is the MIN across every occurrence — the
cross-run minima convention of BENCH_solo_r5.json. Headline names (the
14 in bench.HEADLINE) land in "queries", the rest in
"extended_queries"; "value" is the headline total.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flatten(doc: dict) -> dict[str, float]:
    if "queries" in doc or "extended_queries" in doc:
        out = dict(doc.get("queries", {}))
        out.update(doc.get("extended_queries", {}))
        return out
    return doc


def main() -> None:
    out_path = sys.argv[1]
    import bench

    best: dict[str, float] = {}
    for part in sys.argv[2:]:
        for name, sec in flatten(json.load(open(part))).items():
            if name not in best or sec < best[name]:
                best[name] = float(sec)
    headline = {n: best[n] for n in bench.HEADLINE if n in best}
    canary_names = set(getattr(bench, "CANARIES", []))
    # canaries keep their own key (r10, ADVICE: BASELINE.md documents
    # the "canaries" ledger format; folding them into extended_queries
    # made chunk-merged ledgers diverge from bench.py's own output and
    # broke the gate's canary diagnostic for one of the two formats)
    canaries = {n: best[n] for n in sorted(canary_names) if n in best}
    extended = {
        n: s
        for n, s in sorted(best.items())
        if n not in bench.HEADLINE and n not in canary_names
    }
    doc = {
        "metric": "headline_total_sec",
        "value": round(sum(headline.values()), 3),
        "unit": "sec",
        "queries": headline,
        "extended_queries": extended,
        "canaries": canaries,
        "reps": "min-over-chunked-solo-runs (3 reps each after warmup)",
        "sf": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "protocol": "tools/bench_ledger_chunk.py partials min-merged",
    }
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(
        f"{out_path}: {len(headline)} headline (total"
        f" {doc['value']}s) + {len(extended)} extended"
    )


if __name__ == "__main__":
    main()
