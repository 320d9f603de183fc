package graft.store

import graft.SparkSpec
import graft.ops.EngineOps

class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero exchanges") {
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    ScaleJoins.saveBucketed(left, "bkt_left", Seq("k"), 4, Seq("k"))
    ScaleJoins.saveBucketed(right, "bkt_right", Seq("k"), 4, Seq("k"))
    def joined = ScaleJoins.bucketedJoin(spark, "bkt_left", "bkt_right", Seq("k"))
    // disable broadcast so the co-location is what avoids the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val s = EngineOps.planSummaryNoAqe(spark, joined)
      assert(s.exchangeCount === 0,
        EngineOps.explain(joined, "formatted").take(800))
      assert(joined.count() === 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE bkt_left")
    spark.sql("DROP TABLE bkt_right")
  }

  test("salted join preserves equi-join results under skew") {
    // heavily skewed: 90% of big rows share key 1
    val big = ((1 to 900).map(_ => 1L) ++ (1 to 100).map(_.toLong + 1))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val small = (1L to 101L).map(k => (k, s"dim$k")).toDF("k", "dim")
    val plain = big.join(small, Seq("k")).count()
    val salted = ScaleJoins.saltedJoin(big, small, Seq("k"), saltFactor = 8)
    assert(salted.count() === plain)
    assert(salted.columns.toSet === Set("k", "payload", "dim"))
    // left join keeps big-side rows with no dim match, still no dupes
    val bigger = big.unionByName(Seq((999L, -1L)).toDF("k", "payload"))
    val left = ScaleJoins.saltedJoin(bigger, small, Seq("k"), 8, "left")
    assert(left.count() === plain + 1)
  }

  test("salted join rejects join types that would duplicate unmatched small-side rows") {
    val big = Seq((1L, 1L)).toDF("k", "payload")
    val small = Seq((1L, "d"), (2L, "unmatched")).toDF("k", "dim")
    val err = intercept[IllegalArgumentException] {
      ScaleJoins.saltedJoin(big, small, Seq("k"), 8, "right")
    }
    assert(err.getMessage.contains("saltedJoin"))
    intercept[IllegalArgumentException] {
      ScaleJoins.saltedJoin(big, small, Seq("k"), 8, "full_outer")
    }
  }
}
