#!/usr/bin/env python3
"""Derive per-query sweep budgets from ALL checked-in baseline sweep pairs.

Usage:
  derive_budgets.py <A1.log> <B1.log> [<A2.log> <B2.log> ...] \
      --template tools/sweep_budget.json [--out tools/sweep_budget.json]

The round-8 gate ran almost every query against one default 12x budget
while the measured 10x->100x median was 2.23x — ~5x of silent headroom,
so a query regressing 2x -> 9x still passed. This derives each query's
budget from what it ACTUALLY measured — and, against the round-9
self-referential trap (budgets re-derived from only the LATEST sweep
re-grant 3x headroom over whatever last round measured, so a slow
1.5x-per-round creep never trips and the same-round gate passes
vacuously), the ratio is the per-query MINIMUM across EVERY checked-in
sweep pair:

    budget(q) = max(BUDGET_MULT * min_over_pairs(measured_ratio),
                    BUDGET_FLOOR)

(BUDGET_MULT = 3, BUDGET_FLOOR = 4.0, rounded up to one decimal) — a
genuine regression of ~3x over the BEST the query ever measured fails
loudly while run-to-run noise rides free, and budgets are monotonically
non-increasing across regenerations as long as old sweeps stay checked
in. Crash (-1) and "refused" rows never contribute ratios. The template
file contributes:

  * "exclude"        — carried verbatim (documented output-pathological
                       queries, each naming its sweepable face);
  * "hand_overrides" — budgets that must NOT be derived (with reasons
                       in "_budget_notes"); kept as-is;
  * "default_ratio"  — the fallback for queries absent from the
                       baselines (new queries land here until the next
                       baseline refresh).
"""
import json
import math
import re
import sys

BUDGET_MULT = 3.0
BUDGET_FLOOR = 4.0


def load(path):
    line = None
    with open(path) as f:
        for raw in f:
            if '"sf"' in raw and '"queries"' in raw:
                line = raw
    if line is None:
        sys.exit(f"no sweep JSON in {path}")
    return json.loads(re.search(r"\{.*\}", line).group(0))


def derive(pairs, template):
    """pairs: list of (qa, qb) dicts; ratio per query = MIN across pairs."""
    hand = template.get("hand_overrides", {})
    exclude = template.get("exclude", {})

    def num(v):
        return isinstance(v, (int, float))

    ratios = {}
    for qa, qb in pairs:
        for k, vb in qb.items():
            va = qa.get(k)
            if k in exclude or k in hand:
                continue
            if not num(va) or not num(vb) or va <= 0 or vb <= 0:
                continue
            r = vb / va
            if k not in ratios or r < ratios[k]:
                ratios[k] = r
    budgets = dict(hand)
    derived_from = {}
    for k, ratio in sorted(ratios.items()):
        budgets[k] = math.ceil(max(BUDGET_MULT * ratio, BUDGET_FLOOR) * 10) / 10
        derived_from[k] = round(ratio, 2)
    return budgets, derived_from


def main():
    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i:i + 2]
    ti = args.index("--template")
    with open(args[ti + 1]) as f:
        template = json.load(f)
    del args[ti:ti + 2]
    if len(args) < 2 or len(args) % 2 != 0:
        sys.exit("need an even number of sweep logs (A1 B1 [A2 B2 ...])")
    pairs = [(load(args[i])["queries"], load(args[i + 1])["queries"])
             for i in range(0, len(args), 2)]
    budgets, derived_from = derive(pairs, template)
    out = {
        "_comment": template.get("_comment", []),
        "_derived": {
            "from": args,
            "rule": f"max({BUDGET_MULT} * min_over_pairs(measured_ratio), "
                    f"{BUDGET_FLOOR})",
            "measured_ratios": derived_from,
        },
        "default_ratio": template.get("default_ratio", 12.0),
        "hand_overrides": template.get("hand_overrides", {}),
        "budgets": budgets,
        "_budget_notes": template.get("_budget_notes", {}),
        "exclude": template.get("exclude", {}),
    }
    text = json.dumps(out, indent=2)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
        print(f"wrote {out_path}: {len(budgets)} budgets "
              f"({len(template.get('hand_overrides', {}))} hand, "
              f"{len(derived_from)} derived)")
    else:
        print(text)


if __name__ == "__main__":
    main()
