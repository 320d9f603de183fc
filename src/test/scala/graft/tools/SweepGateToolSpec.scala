package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The sweep regression gate's own regression test: derive budgets
  * from synthetic baselines, then prove a 4× regression on a
  * historically-2× query FAILS the gate (under the old flat 12×
  * default it passed silently), a healthy sweep passes, and
  * new-query fallback works. Logic lives in
  * `tools/test_sweep_gate.py` so it exercises the exact scripts the
  * round gate runs.
  */
class SweepGateToolSpec extends AnyFunSuite {

  test("derive_budgets + sweep_compare --gate catch a 4x regression on a 2x query") {
    import scala.sys.process._
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/test_sweep_gate.py"))
      .!(ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))
    assert(code === 0, s"gate self-test failed:\n$out")
    assert(out.toString.contains("PASS"))
  }
}
