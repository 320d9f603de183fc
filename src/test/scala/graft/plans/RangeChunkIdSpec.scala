package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** [[RangeChunkId]]: the O(log P) binary-search chunk id must equal
  * the O(P) "count bounds strictly below" definition row for row,
  * under codegen with fallback DISABLED, across null / NaN / -0.0 /
  * string / timestamp orderings.
  */
class RangeChunkIdSpec extends SparkSpec {
  import spark.implicits._

  /** The definitional O(P) twin, via plain Column comparisons (the
    * round-10 expression form): #bounds with bound < tuple.
    */
  private def bruteExpr(cols: Seq[org.apache.spark.sql.Column],
      bounds: Seq[Row]): org.apache.spark.sql.Column = {
    def gtCol(c: org.apache.spark.sql.Column, v: Any) =
      if (v == null) c.isNotNull else c > lit(v)
    def eqCol(c: org.apache.spark.sql.Column, v: Any) =
      if (v == null) c.isNull else c <=> lit(v)
    def tupleGt(b: Row) = cols.indices.map { i =>
      (0 until i).map(j => eqCol(cols(j), b.get(j)))
        .foldLeft(gtCol(cols(i), b.get(i)))(_ && _)
    }.reduce(_ || _)
    if (bounds.isEmpty) lit(0)
    else bounds.map(b => when(tupleGt(b), 1).otherwise(0)).reduce(_ + _)
  }

  test("binary search equals the O(P) definition, codegen-only") {
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rnd = new scala.util.Random(7L)
      val df = (0 until 5000).map { i =>
        (i.toLong,
          if (i % 97 == 0) null else s"k${rnd.nextInt(40)}",
          rnd.nextLong() % 1000000,
          rnd.nextInt(4) match {
            case 0 => Double.NaN
            case 1 => -0.0
            case 2 => 0.0
            case _ => rnd.nextDouble()
          })
      }.toDF("id", "k", "o", "d")
      val cols = Seq(col("k"), col("d"), col("o"), col("id"))
      val bounds = graft.transform.RangeChunks.sampleBounds(
        df, Seq("k", "d", "o", "id"), 64, 11L)
      assert(bounds.nonEmpty, "expected bounds on 5000 rows with p=64")
      val got = df.withColumn("c",
          ColumnBridge.column(RangeChunkId(
            cols.map(ColumnBridge.expression), bounds)))
        .withColumn("b", bruteExpr(cols, bounds))
      val mismatch = got.filter(col("c") =!= col("b")).count()
      assert(mismatch === 0L,
        s"$mismatch rows disagree with the O(P) definition")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("interpreted eval agrees with codegen and handles timestamps") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-06-01 12:00:00")),
      (3L, java.sql.Timestamp.valueOf("2024-12-31 23:59:59")),
      (4L, null.asInstanceOf[java.sql.Timestamp])
    ).toDF("id", "ts")
    val bounds = graft.transform.RangeChunks.sampleBounds(
      df, Seq("ts", "id"), 4, 3L)
    val expr = RangeChunkId(
      Seq(col("ts"), col("id")).map(ColumnBridge.expression), bounds)
    val viaPlan = df.withColumn("c", ColumnBridge.column(expr))
      .select("id", "c").as[(Long, Int)].collect().toMap
    // monotone in (ts nulls-first, id) order
    val ordered = Seq(4L, 1L, 2L, 3L).map(viaPlan)
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b })
  }

  test("non-orderable column type is a loud analysis failure") {
    val df = Seq((1L, Array[Byte](1, 2))).toDF("id", "bin")
    val bounds = Seq(Row(Array[Byte](0), 0L))
    val e = intercept[Exception] {
      df.withColumn("c", ColumnBridge.column(RangeChunkId(
        Seq(col("bin"), col("id")).map(ColumnBridge.expression), bounds)))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("orderable")
      || e.getMessage.contains("range_chunk_id"), e.getMessage)
  }
}
