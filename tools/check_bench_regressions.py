"""Programmatic bench-regression gate.

Compares the current minima ledger (newest BENCH_solo_r*.json, or --bench=)
against the committed per-query reference table in BASELINE.md
("Committed extended-set reference") plus the committed headline
table, and fails loudly on any entry slower than --factor (default
1.3x) its committed reference. This institutionalizes the
"zero extended-set regressions >1.3x" claim instead of re-deriving it
ad hoc each round.

LOAD CALIBRATION: the references were measured on an unloaded host;
a shared sandbox can run uniformly slower for hours, which would flag
EVERY entry at once and drown real regressions. A true regression is
a RELATIVE outlier, so the gate computes the median now/committed
ratio across all entries (the ambient-load estimate — a plan change
in one query cannot move the median of 200+) and flags entries slower
than factor x committed x max(1, median). Both the raw count and the
calibration are printed so nothing is hidden; --no-calibrate restores
the raw gate.

SCHEDULING-FLOOR MODEL (r7, VERDICT r6 ask #7): an entry's wall time
decomposes as session floor + plan work; for sub-0.4 s entries the
job-scheduling floor DOMINATES, and the floor shifts ADDITIVELY
between sessions (JIT state, GC, trace overhead) rather than scaling
with committed time — which is exactly why the two r6 flags
(0.32-0.34 s entries, code byte-identical) were false positives under
a purely multiplicative model. The gate therefore estimates the
session's floor shift as the median residual now - ambient*committed
over the small-entry population (clamped >= 0; a plan change in one
query cannot move a median of dozens) and allows
factor * committed * ambient + floor. The floor is printed with the
calibration; --no-calibrate zeroes both.

Usage: python tools/check_bench_regressions.py [--bench=PATH]
       [--factor=1.3] [--no-calibrate]
"""

from __future__ import annotations

import json
import re
import statistics
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


def committed_canaries(baseline_md: str) -> dict[str, float]:
    """Parse the committed canary minima out of BASELINE.md's
    "Ambient canaries" bullets (r10, ADVICE: the minima were
    previously hardcoded here AND stated in BASELINE.md — duplicated
    constants that would silently drift apart at the next
    re-baseline; BASELINE.md is the single source of truth)."""
    section = baseline_md.split("Ambient canaries")[1]
    return {
        m.group(1): float(m.group(2))
        for m in re.finditer(
            r"`(q_bench_canary_[a-z_]+)`(?:(?!Committed min).)*?"
            r"\*\*Committed min:?\s*([0-9.]+)\s*s",
            section,
            re.S,
        )
    }


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

    calibrate = "--no-calibrate" not in sys.argv[1:]

    bench = json.load(open(bench_path))
    current = dict(bench.get("queries", {}))
    current.update(bench.get("extended_queries", {}))
    # a ledger written directly by bench.py carries the canaries under
    # their own "canaries" key (BASELINE.md's documented format);
    # chunk-merged ledgers fold them into extended_queries — accept
    # both so the canary diagnostic below never silently vanishes
    current.update(bench.get("canaries", {}))
    baseline_md = open("BASELINE.md").read()
    ref = committed_reference(baseline_md)

    ratios = [
        current[n] / committed
        for n, committed in ref.items()
        if n in current and committed > 0
    ]
    ambient = max(1.0, statistics.median(ratios)) if ratios else 1.0
    if not calibrate:
        ambient = 1.0

    # additive scheduling-floor shift, estimated from the entries the
    # floor dominates (committed < 0.4 s)
    small_resid = [
        current[n] - ambient * c
        for n, c in ref.items()
        if n in current and 0 < c < 0.4
    ]
    floor = (
        max(0.0, statistics.median(small_resid))
        if calibrate and small_resid
        else 0.0
    )

    regressions, raw = [], 0
    for name, committed in sorted(ref.items()):
        now = current.get(name)
        if now is None:
            print(f"MISSING  {name} (committed {committed}s, no current)")
            continue
        if now > factor * committed:
            raw += 1
        if now > factor * committed * ambient + floor:
            regressions.append((name, now, committed))
    for name, now, committed in regressions:
        print(f"REGRESSED {name}: {now:.3f}s vs committed {committed}s"
              f" ({now / committed:.2f}x raw; allowed"
              f" {factor * committed * ambient + floor:.3f}s calibrated)")
    # Ambient canaries (r9, BASELINE.md "Ambient canaries"): when the
    # bench carries the constant-shape probes, print their ratio vs
    # the committed minima as DIRECT ambient evidence alongside the
    # inferred median — a disagreement between the two is itself a
    # diagnostic (canary calm + median high = broad plan regression;
    # canary high = host load).
    canary_bits = [
        f"{n.rsplit('_', 1)[-1]} {current[n] / c:.2f}x ({current[n]:.3f}s)"
        for n, c in sorted(committed_canaries(baseline_md).items())
        if n in current
    ]
    if canary_bits:
        print("canaries vs committed: " + ", ".join(canary_bits))
    covered = sum(1 for n in ref if n in current)
    print(f"checked {covered}/{len(ref)} committed entries against"
          f" {bench_path}; ambient-load median ratio {ambient:.2f};"
          f" scheduling-floor shift {floor:.3f}s;"
          f" {len(regressions)} regression(s) > {factor}x calibrated"
          f" ({raw} raw)")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
