package graft.store

import graft.SparkSpec

/** [[RebuildGuard]]: the batch-0-over-existing-state wipe must tell a
  * genuine full re-delivery from a destroy-history partial one.
  */
class RebuildGuardSpec extends SparkSpec {

  test("auto: small states pass with a warning; large state + partial re-delivery refuses") {
    // below the floor: never refuses, whatever the ratio
    RebuildGuard.checkStateRebuild(spark, "t", 100L, 1L)
    // large state, tiny re-delivery: the destroy-history signature
    val e = intercept[IllegalStateException] {
      RebuildGuard.checkStateRebuild(spark, "t", 20000L, 10L)
    }
    assert(e.getMessage.contains("lossRebuild"))
    // large state, comparable re-delivery: a genuine loss-rebuild
    RebuildGuard.checkStateRebuild(spark, "t", 20000L, 19000L)
    // empty existing state: nothing to destroy
    RebuildGuard.checkStateRebuild(spark, "t", 0L,
      sys.error("delta must not be counted when nothing is destroyed"))
  }

  test("force always allows; refuse always refuses; malformed mode is loud") {
    spark.conf.set(RebuildGuard.ModeKey, "force")
    try RebuildGuard.checkStateRebuild(spark, "t", 20000L, 1L)
    finally spark.conf.unset(RebuildGuard.ModeKey)
    spark.conf.set(RebuildGuard.ModeKey, "refuse")
    try {
      intercept[IllegalStateException] {
        RebuildGuard.checkStateRebuild(spark, "t", 1L, 1L)
      }
      ()
    } finally spark.conf.unset(RebuildGuard.ModeKey)
    spark.conf.set(RebuildGuard.ModeKey, "sometimes")
    try {
      intercept[IllegalArgumentException] {
        RebuildGuard.checkStateRebuild(spark, "t", 1L, 1L)
      }
      ()
    } finally spark.conf.unset(RebuildGuard.ModeKey)
  }

  test("sink wipe: warns in auto, refuses in refuse mode") {
    import spark.implicits._
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("rg").toString)
    val df = Seq((1L, 2L)).toDF("batch_id", "x")
    wh.createTable("sink", df.schema)
    wh.append("sink", df)
    // auto: warn only
    RebuildGuard.checkSinkWipe(spark, wh, "sink", 0L, "spec")
    // non-zero batch: never a wipe check
    RebuildGuard.checkSinkWipe(spark, wh, "sink", 3L, "spec")
    spark.conf.set(RebuildGuard.ModeKey, "refuse")
    try {
      intercept[IllegalStateException] {
        RebuildGuard.checkSinkWipe(spark, wh, "sink", 0L, "spec")
      }
      ()
    } finally spark.conf.unset(RebuildGuard.ModeKey)
  }
}
