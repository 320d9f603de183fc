package graft.core

/** Thrown when an operator's PRE-FLIGHT cost estimate refuses to run a
  * plan that would exhaust cluster resources (e.g. the exact set-sim
  * join's candidate-pair/scratch-disk cap) — an INTENDED outcome, not
  * a crash. Harnesses record it distinctly: `graft.QueryBench` writes
  * the sweep value `"refused"` (the gate treats it pass-with-note)
  * and `graft.Verify` stamps a `_REFUSED` marker, so a genuine crash
  * in a budget-excluded query can never hide behind the refusal path
  * (round-9 verdict: both looked like `-1.0`).
  *
  * Extends [[IllegalStateException]] so existing callers matching the
  * broader type keep working.
  */
final class PreflightRefusal(msg: String) extends IllegalStateException(msg)
