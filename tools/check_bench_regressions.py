"""Programmatic bench-regression gate.

Compares the current minima ledger (newest BENCH_solo_r*.json, or --bench=)
against the committed per-query reference table in BASELINE.md
("Committed extended-set reference") plus the committed headline
table, and fails loudly on any entry slower than --factor (default
1.3x) its committed reference. This institutionalizes the
"zero extended-set regressions >1.3x" claim instead of re-deriving it
ad hoc each round.

Usage: python tools/check_bench_regressions.py [--bench=PATH]
       [--factor=1.3]
"""

from __future__ import annotations

import json
import re
import sys


def committed_reference(baseline_md: str) -> dict[str, float]:
    """Parse the two-column committed reference table."""
    section = baseline_md.split("Committed extended-set reference")[1]
    ref: dict[str, float] = {}
    for row in re.finditer(
        r"\|\s*(q_[a-z0-9_]+)\s*\|\s*([0-9.]+)\s*", section
    ):
        ref.setdefault(row.group(1), float(row.group(2)))
    return ref


def main() -> int:
    import glob

    ledgers = sorted(glob.glob("BENCH_solo_r*.json"))
    bench_path = ledgers[-1] if ledgers else "BENCH_solo_r5.json"
    factor = 1.3
    for a in sys.argv[1:]:
        if a.startswith("--bench="):
            bench_path = a.split("=", 1)[1]
        if a.startswith("--factor="):
            factor = float(a.split("=", 1)[1])

    bench = json.load(open(bench_path))
    current = dict(bench.get("queries", {}))
    current.update(bench.get("extended_queries", {}))
    ref = committed_reference(open("BASELINE.md").read())

    regressions = []
    for name, committed in sorted(ref.items()):
        now = current.get(name)
        if now is None:
            print(f"MISSING  {name} (committed {committed}s, no current)")
            continue
        if now > factor * committed:
            regressions.append((name, now, committed))
    for name, now, committed in regressions:
        print(f"REGRESSED {name}: {now:.3f}s vs committed {committed}s"
              f" ({now / committed:.2f}x)")
    covered = sum(1 for n in ref if n in current)
    print(f"checked {covered}/{len(ref)} committed entries against"
          f" {bench_path}; {len(regressions)} regression(s) >"
          f" {factor}x")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
