package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The single-writer lease: a second writer must refuse LOUDLY (naming
  * the holder) instead of interleaving the swap dance; a crashed
  * holder's stale lease is taken over after the age threshold.
  */
class WriterLeaseSpec extends SparkSpec {
  import spark.implicits._

  private def freshWh() = {
    val dir = Files.createTempDirectory("lease").toString
    val wh = new Warehouse(spark, dir)
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    wh.createTable("t", df.schema, ifExists = "replace")
    wh.append("t", df)
    (wh, dir)
  }

  test("a foreign writer's lease makes merge refuse, naming the holder") {
    val (wh, dir) = freshWh()
    // simulate another process holding the table: a fresh lease file
    Files.createDirectories(Paths.get(dir, "_locks"))
    Files.write(Paths.get(dir, "_locks", "t.lease"),
      "op=merge pid=99999 host=otherhost at=1".getBytes)
    val e = intercept[IllegalStateException] {
      wh.merge("t", Seq((1L, "z")).toDF("k", "v"), Seq("k"))
    }
    assert(e.getMessage.contains("another writer"))
    assert(e.getMessage.contains("otherhost"), s"holder not named: ${e.getMessage}")
    // the table was not touched
    assert(wh.read("t").filter(col("k") === 1).select("v")
      .as[String].head() === "a")
  }

  test("compact and replaceTable honor the same lease") {
    val (wh, dir) = freshWh()
    Files.createDirectories(Paths.get(dir, "_locks"))
    Files.write(Paths.get(dir, "_locks", "t.lease"),
      "op=compact pid=99999 host=otherhost at=1".getBytes)
    intercept[IllegalStateException] { wh.compact("t", 1) }
    intercept[IllegalStateException] {
      wh.replaceTable("t", Seq((9L, "x")).toDF("k", "v"))
    }
  }

  test("a crash-stale lease is taken over and the mutation proceeds") {
    val (wh, dir) = freshWh()
    Files.createDirectories(Paths.get(dir, "_locks"))
    val lease = Paths.get(dir, "_locks", "t.lease")
    Files.write(lease, "op=merge pid=99999 host=deadhost at=1".getBytes)
    // age the lease past the threshold
    Files.setLastModifiedTime(lease,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis - 7200000L))
    wh.merge("t", Seq((1L, "z")).toDF("k", "v"), Seq("k"))
    assert(wh.read("t").filter(col("k") === 1).select("v")
      .as[String].head() === "z")
    // the takeover's own lease was released on completion
    assert(!Files.exists(lease))
  }

  test("lease is released after a successful mutation and on failure") {
    val (wh, dir) = freshWh()
    wh.merge("t", Seq((2L, "y")).toDF("k", "v"), Seq("k"))
    assert(!Files.exists(Paths.get(dir, "_locks", "t.lease")))
    // a failing mutation must not wedge the table
    intercept[Exception] {
      wh.merge("t", Seq((3L, "w")).toDF("k", "WRONG_COL"), Seq("k"))
    }
    wh.merge("t", Seq((3L, "w")).toDF("k", "v"), Seq("k"))
    assert(wh.read("t").count() === 3)
  }

  test("_locks never shows up as a table") {
    val (wh, _) = freshWh()
    wh.merge("t", Seq((1L, "z")).toDF("k", "v"), Seq("k"))
    assert(wh.listTables() === Seq("t"))
  }
}
