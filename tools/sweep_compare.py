#!/usr/bin/env python3
"""Compare two QueryBench sweep JSON lines (e.g. 10x vs 100x).

Usage: sweep_compare.py <sweepA.log> <sweepB.log> [ratio_threshold]

Reads the last {"sf":...} line of each log, prints every query whose
B/A wall ratio exceeds the threshold (default 3.0), plus failures and
totals — the analysis behind BASELINE.md's full-catalog scale tables.
"""
import json
import re
import sys


def load(path):
    line = None
    with open(path) as f:
        for raw in f:
            if '"sf"' in raw and '"queries"' in raw:
                line = raw
    if line is None:
        sys.exit(f"no sweep JSON in {path}")
    return json.loads(re.search(r"\{.*\}", line).group(0))


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    qa, qb = a["queries"], b["queries"]
    fails = sorted(k for k, v in qb.items() if v < 0)
    print(f"A={a['sf']} total={sum(v for v in qa.values() if v > 0):.1f}s "
          f"({len(qa)} queries)")
    print(f"B={b['sf']} total={sum(v for v in qb.values() if v > 0):.1f}s "
          f"({len(qb)} queries)")
    print(f"B failures: {fails or 'none'}")
    rows = []
    for k, vb in qb.items():
        va = qa.get(k)
        if va and va > 0 and vb > 0 and vb / va > thresh:
            rows.append((vb / va, k, va, vb))
    rows.sort(reverse=True)
    print(f"\nqueries with B/A > {thresh}x ({len(rows)}):")
    for r, k, va, vb in rows:
        print(f"  {k:32s} {va:8.2f}s -> {vb:8.2f}s  ({r:.1f}x)")
    only_b = sorted(set(qb) - set(qa))
    if only_b:
        print(f"\nonly in B: {only_b}")


if __name__ == "__main__":
    main()
