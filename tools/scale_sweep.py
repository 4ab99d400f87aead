#!/usr/bin/env python3
"""Full-catalog scale-sweep analysis: compare two Bench JSON lines taken
at different corpus multiples (same box, serial runs) and pin a per-query
scale exponent.

Usage:
    python3 tools/scale_sweep.py <base.json> <big.json> <multiple>

exponent = log(t_big / t_base) / log(multiple) on raw wall seconds.
Raw-time exponents UNDER-state efficiency for sub-second queries (fixed
per-query session overhead ~0.15-0.3 s dominates both readings, pushing
the exponent toward 0) and are honest for the multi-second tail where
overhead is amortized — which is exactly the set worth auditing.

Output: a markdown table sorted by exponent descending, plus a flagged
section of queries with exponent > 1.15 (super-linear beyond noise).
"""
import json
import math
import sys


def main() -> None:
    base_path, big_path, mult = sys.argv[1], sys.argv[2], float(sys.argv[3])
    with open(base_path) as f:
        base = json.load(f)["queries"]
    with open(big_path) as f:
        big = json.load(f)["queries"]
    rows = []
    for q in sorted(base):
        if q not in big:
            continue
        t0, t1 = base[q], big[q]
        if t0 <= 0:
            continue
        exp = math.log(t1 / t0) / math.log(mult)
        rows.append((q, t0, t1, exp))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | t({base_path.split('/')[-1]}) s | t({mult:g}x) s | exponent |")
    print("|---|---|---|---|")
    for q, t0, t1, exp in rows:
        print(f"| {q} | {t0:.2f} | {t1:.2f} | {exp:+.2f} |")
    total0 = sum(base[q] for q, *_ in [(r[0],) for r in rows])
    total1 = sum(big[q] for q, *_ in [(r[0],) for r in rows])
    print(f"\ntotals: {total0:.1f}s -> {total1:.1f}s "
          f"(exponent {math.log(total1 / total0) / math.log(mult):+.2f})")
    flagged = [r for r in rows if r[3] > 1.15 and r[2] > 1.0]
    print(f"\nsuper-linear (exp > 1.15 and t_big > 1s): {len(flagged)}")
    for q, t0, t1, exp in flagged:
        print(f"  {q}: {t0:.2f}s -> {t1:.2f}s (exp {exp:+.2f})")


if __name__ == "__main__":
    main()
