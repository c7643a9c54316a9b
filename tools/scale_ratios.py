#!/usr/bin/env python3
"""Compare two Bench JSON artifacts (e.g. sf0.1 vs sf1) and print the
per-query scaling ratio table for DEVNOTES. Usage:

    python3 tools/scale_ratios.py /tmp/bench_sf01.json /tmp/bench_sf1.json [threshold]

Ratio = t(big) / t(small). With 10x the data on a fixed 32-thread local
machine, a perfectly scan-bound query shows ~10x; sub-linear is fixed
overhead amortizing; super-linear (> threshold, default 12) is flagged for
investigation (shuffle spill, quadratic pair growth, cache pressure).
"""
import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0
    qs = sorted(set(small["queries"]) & set(big["queries"]))
    rows = []
    for q in qs:
        a, b = small["queries"][q], big["queries"][q]
        if isinstance(a, str) or isinstance(b, str):
            rows.append((float("inf"), q, a, b))
        else:
            rows.append((b / a, q, a, b))
    rows.sort(reverse=True)
    flagged = 0
    print(f"{'query':26s} {'sf_small':>9s} {'sf_big':>9s} {'ratio':>7s}")
    for r, q, a, b in rows:
        mark = " <-- SUPERLINEAR" if r > threshold else ""
        if mark:
            flagged += 1
        fa = a if isinstance(a, str) else f"{a:.2f}"
        fb = b if isinstance(b, str) else f"{b:.2f}"
        print(f"{q:26s} {fa:>9s} {fb:>9s} {r:>7.1f}{mark}")
    print(f"\ntotal: {small['value']:.1f}s -> {big['value']:.1f}s "
          f"(ratio {big['value'] / small['value']:.1f}) | "
          f"flagged >{threshold}x: {flagged} | "
          f"contended: small={small.get('contended')} big={big.get('contended')}")


if __name__ == "__main__":
    main()
