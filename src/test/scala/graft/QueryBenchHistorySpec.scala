package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[QueryBench.historyMins]]: the cross-round noise baseline must
  * take the per-query MINIMUM over every checked-in sweep of the
  * matching scale, skip refusals/crashes, and return empty (not
  * throw) for unmatched scales or missing directories — the round-11
  * q_join_inner escape's fix is only as good as this extraction.
  */
class QueryBenchHistorySpec extends AnyFunSuite {

  private def withSweeps(files: Map[String, String])(
      body: java.io.File => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("sweeps").toFile
    try {
      files.foreach { case (name, content) =>
        java.nio.file.Files.write(
          new java.io.File(dir, name).toPath, content.getBytes("UTF-8"))
      }
      body(dir)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("minimum over matching-scale sweeps; refusals and crashes excluded") {
    val a = """{"sf":"/tmp/scale100","queries":{"q_x":10.5,"q_y":2.0,""" +
      """"q_z":-1.0},"telemetry":{}}"""
    val b = """{"sf":"/tmp/scale100","queries":{"q_x":8.25,""" +
      """"q_y":"refused","q_w":3.5},"telemetry":{}}"""
    val other = """{"sf":"/tmp/scale10","queries":{"q_x":0.9},"telemetry":{}}"""
    withSweeps(Map("r1_100x.json" -> a, "r2_100x.json" -> b,
      "r1_10x.json" -> other)) { dir =>
      val mins = QueryBench.historyMins("/tmp/scale100", dir.getPath)
      assert(mins("q_x") === 8.25) // min across both files
      assert(mins("q_y") === 2.0)  // the refusal string is skipped
      assert(!mins.contains("q_z")) // crash rows never set a baseline
      assert(mins("q_w") === 3.5)
      // the 10x file must not leak into the 100x baseline
      val mins10 = QueryBench.historyMins("/tmp/scale10", dir.getPath)
      assert(mins10("q_x") === 0.9)
    }
  }

  test("pretty-printed (spaced) sweep files parse identically") {
    // half the checked-in sweeps serialize as '"queries": {' with
    // spaces — a space-blind parser silently reads a stale subset
    val spaced = """{"sf": "/tmp/scale100", "queries": {"q_x": 4.5,
      | "q_y": 2.25}, "telemetry": {}}""".stripMargin
    withSweeps(Map("r9_100x.json" -> spaced)) { dir =>
      val mins = QueryBench.historyMins("/tmp/scale100", dir.getPath)
      assert(mins === Map("q_x" -> 4.5, "q_y" -> 2.25))
    }
  }

  test("unmatched scale or missing directory returns empty, never throws") {
    assert(QueryBench.historyMins("/root/testdata/sf0.1",
      "tools/sweeps").isEmpty)
    assert(QueryBench.historyMins("/tmp/scale100",
      "/nonexistent/sweeps").isEmpty)
  }

  test("the checked-in sweeps parse: every 100x query has a positive minimum") {
    val mins = QueryBench.historyMins("/tmp/scale100", "tools/sweeps")
    assert(mins.size > 200)
    assert(mins.values.forall(_ > 0))
    assert(mins.contains("q_join_inner"))
  }
}
