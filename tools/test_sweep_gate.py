#!/usr/bin/env python3
"""Self-test for the derive_budgets.py -> sweep_compare.py --gate loop:
a synthetic 4x regression on a query that historically scaled at 2x
MUST fail the gate (under the old flat 12x default it sailed through).

Run directly (exit 0 = pass) — also wired into `sbt test` via
SweepGateToolSpec.
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))


def write_log(path, sf, queries):
    with open(path, "w") as f:
        f.write(json.dumps({"sf": sf, "queries": queries}) + "\n")


def run(args):
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True)


def main():
    with tempfile.TemporaryDirectory() as d:
        # baseline pair: q_lin scales 2x, q_heavy 9x (documented), and
        # q_excluded is output-pathological
        base10 = os.path.join(d, "b10.log")
        base100 = os.path.join(d, "b100.log")
        write_log(base10, "10x", {"q_lin": 1.0, "q_heavy": 2.0, "q_x": 1.0})
        write_log(base100, "100x", {"q_lin": 2.0, "q_heavy": 18.0, "q_x": 50.0})
        template = os.path.join(d, "template.json")
        with open(template, "w") as f:
            json.dump({
                "default_ratio": 12.0,
                "hand_overrides": {"q_heavy": 30.0},
                "_budget_notes": {"q_heavy": "documented true-output growth"},
                "exclude": {"q_x": "quadratic output by construction"},
            }, f)
        budget = os.path.join(d, "budget.json")
        r = run([os.path.join(HERE, "derive_budgets.py"), base10, base100,
                 "--template", template, "--out", budget])
        assert r.returncode == 0, r.stderr
        b = json.load(open(budget))
        # derived: q_lin ratio 2 -> budget max(6, 4) = 6; hand kept
        assert b["budgets"]["q_lin"] == 6.0, b["budgets"]
        assert b["budgets"]["q_heavy"] == 30.0, b["budgets"]
        assert "q_x" not in b["budgets"]

        # this round's sweep: q_lin regressed 4x over its 2x history
        # (ratio 8) — under the flat default 12x this PASSED silently
        cur100 = os.path.join(d, "c100.log")
        write_log(cur100, "100x", {"q_lin": 8.0, "q_heavy": 18.0, "q_x": 50.0})
        r = run([os.path.join(HERE, "sweep_compare.py"), base10, cur100,
                 "--budget", budget, "--gate"])
        assert r.returncode == 1, \
            f"4x regression passed the gate:\n{r.stdout}"
        assert "q_lin" in r.stdout and "OVER BUDGET" in r.stdout, r.stdout

        # healthy sweep passes
        ok100 = os.path.join(d, "ok100.log")
        write_log(ok100, "100x", {"q_lin": 2.2, "q_heavy": 19.0, "q_x": 50.0})
        r = run([os.path.join(HERE, "sweep_compare.py"), base10, ok100,
                 "--budget", budget, "--gate"])
        assert r.returncode == 0, f"healthy sweep failed:\n{r.stdout}"

        # a query missing from the baselines rides default_ratio
        new100 = os.path.join(d, "n100.log")
        write_log(new100, "100x", {"q_lin": 2.2, "q_heavy": 19.0,
                                   "q_x": 50.0, "q_new": 5.0})
        write_log(base10, "10x", {"q_lin": 1.0, "q_heavy": 2.0,
                                  "q_x": 1.0, "q_new": 1.0})
        r = run([os.path.join(HERE, "sweep_compare.py"), base10, new100,
                 "--budget", budget, "--gate"])
        assert r.returncode == 0, f"new query under default failed:\n{r.stdout}"

        # --- budget ratchet: a two-round creep must fail ---
        # round 2 measures q_lin at ratio 5 (within the 6.0 budget, so
        # its sweep passed and was checked in). Re-deriving from BOTH
        # pairs must keep the budget at 6.0 (min ratio 2), NOT re-grant
        # 3x over the crept 5 (=15) — so round 3's continued creep to
        # ratio 7 still fails the gate.
        r2_10 = os.path.join(d, "r2_10.log")
        r2_100 = os.path.join(d, "r2_100.log")
        write_log(r2_10, "10x", {"q_lin": 1.0, "q_heavy": 2.0, "q_x": 1.0})
        write_log(r2_100, "100x", {"q_lin": 5.0, "q_heavy": 18.0, "q_x": 50.0})
        budget2 = os.path.join(d, "budget2.json")
        r = run([os.path.join(HERE, "derive_budgets.py"),
                 base10, base100, r2_10, r2_100,
                 "--template", template, "--out", budget2])
        assert r.returncode == 0, r.stderr
        b2 = json.load(open(budget2))
        assert b2["budgets"]["q_lin"] == 6.0, \
            f"ratchet re-granted headroom over the creep: {b2['budgets']}"
        r3_100 = os.path.join(d, "r3_100.log")
        write_log(r3_100, "100x", {"q_lin": 7.0, "q_heavy": 18.0, "q_x": 50.0})
        r = run([os.path.join(HERE, "sweep_compare.py"), base10, r3_100,
                 "--budget", budget2, "--gate"])
        assert r.returncode == 1, \
            f"two-round creep passed the ratcheted gate:\n{r.stdout}"

        # --- crash vs refusal in an EXCLUDED query ---
        # an intended pre-flight refusal ("refused") passes with a note;
        # a crash (-1.0) in the same excluded query gates RED
        ref100 = os.path.join(d, "ref100.log")
        write_log(ref100, "100x", {"q_lin": 2.2, "q_heavy": 19.0,
                                   "q_x": "refused", "q_new": 5.0})
        r = run([os.path.join(HERE, "sweep_compare.py"), base10, ref100,
                 "--budget", budget, "--gate"])
        assert r.returncode == 0, f"refusal in excluded query gated:\n{r.stdout}"
        assert "refus" in r.stdout.lower(), f"refusal not noted:\n{r.stdout}"
        crash100 = os.path.join(d, "crash100.log")
        write_log(crash100, "100x", {"q_lin": 2.2, "q_heavy": 19.0,
                                     "q_x": -1.0, "q_new": 5.0})
        r = run([os.path.join(HERE, "sweep_compare.py"), base10, crash100,
                 "--budget", budget, "--gate"])
        assert r.returncode == 1, \
            f"crash in excluded query hid behind the exclusion:\n{r.stdout}"
    print("sweep gate self-test: PASS")


if __name__ == "__main__":
    main()
