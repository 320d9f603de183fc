#!/usr/bin/env python3
"""Compare two QueryBench sweep JSON lines (e.g. 10x vs 100x).

Usage:
  sweep_compare.py <sweepA.log> <sweepB.log> [ratio_threshold]
  sweep_compare.py <sweepA.log> <sweepB.log> --budget tools/sweep_budget.json --gate

Reads the last {"sf":...} line of each log. Plain mode prints every
query whose B/A wall ratio exceeds the threshold (default 3.0), plus
failures and totals — the analysis behind BASELINE.md's full-catalog
scale tables.

Query values are seconds, -1.0 for a CRASH, or the string "refused"
for an intended pre-flight refusal (graft.core.PreflightRefusal via
QueryBench). Refusals are pass-with-note everywhere; crashes gate RED
even in excluded queries — exclusion documents an output-pathological
corpus shape, not a license to crash.

GATE mode (--budget + --gate): every query is checked against its
per-query ratio budget (default_ratio unless overridden in the budget
file's "budgets"; "exclude"d queries are the documented
output-pathological ones and are skipped with their reason printed).
Any budget violation or B-side failure exits 1 — the regression gate
that makes a new super-linear scaler fail LOUDLY instead of hiding in
a 210-row table.
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
    args = sys.argv[1:]
    budget = None
    gate = "--gate" in args
    if gate:
        args.remove("--gate")
    if "--budget" in args:
        i = args.index("--budget")
        with open(args[i + 1]) as f:
            budget = json.load(f)
        del args[i:i + 2]
    a, b = load(args[0]), load(args[1])
    thresh = float(args[2]) if len(args) > 2 else 3.0
    qa, qb = a["queries"], b["queries"]

    def num(v):
        return isinstance(v, (int, float))

    fails = sorted(k for k, v in qb.items() if num(v) and v < 0)
    refused = sorted(k for k, v in qb.items() if v == "refused")
    print(f"A={a['sf']} total={sum(v for v in qa.values() if num(v) and v > 0):.1f}s "
          f"({len(qa)} queries)")
    print(f"B={b['sf']} total={sum(v for v in qb.values() if num(v) and v > 0):.1f}s "
          f"({len(qb)} queries)")
    print(f"B failures: {fails or 'none'}")
    if refused:
        print(f"B refusals (pre-flight, pass-with-note): {refused}")

    if budget is not None:
        default = budget.get("default_ratio", 12.0)
        budgets = budget.get("budgets", {})
        exclude = budget.get("exclude", {})
        violations = []
        for k, vb in sorted(qb.items()):
            if k in exclude:
                print(f"  EXCLUDED {k}: {exclude[k][:70]}...")
                continue
            va = qa.get(k)
            if not num(va) or not num(vb) or va <= 0 or vb <= 0:
                continue
            allowed = budgets.get(k, default)
            r = vb / va
            if r > allowed:
                violations.append((r, allowed, k, va, vb))
        violations.sort(reverse=True)
        print(f"\nbudget check (default {default}x, "
              f"{len(budgets)} overrides, {len(exclude)} exclusions):")
        if not violations:
            print("  all queries within budget")
        for r, allowed, k, va, vb in violations:
            print(f"  OVER BUDGET {k:28s} {va:8.2f}s -> {vb:8.2f}s "
                  f"({r:.1f}x, budget {allowed}x)")
        missing = sorted(set(qa) - set(qb) - set(exclude))
        if missing:
            print(f"  missing from B (not excluded): {missing}")
        if gate:
            # CRASHES gate red even in excluded queries (exclusion
            # covers output-pathological growth, not breakage); only
            # the distinct "refused" value passes-with-note there
            for k in fails:
                if k in exclude:
                    print(f"  CRASH in excluded query {k}: exclusion does "
                          f"not cover crashes")
            ok = not violations and not fails and not missing
            print(f"\nGATE: {'PASS' if ok else 'FAIL'}")
            sys.exit(0 if ok else 1)
        return

    rows = []
    for k, vb in qb.items():
        va = qa.get(k)
        if num(va) and num(vb) and va and va > 0 and vb > 0 \
                and vb / va > thresh:
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
