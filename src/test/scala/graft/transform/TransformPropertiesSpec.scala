package graft.transform

import graft.SparkSpec
import graft.schema.{Names, TypeInference}
import graft.profile.ColumnProfile
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.types._

/** Property-based checks (SURVEY §5 test-plan): melt round-trip,
  * type-inference monotonicity, sanitization idempotence. Raw
  * ScalaCheck (no scalatest bridge in the offline dep set).
  */
class TransformPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 50): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: melt -> pivot round-trips arbitrary wide frames") {
    val gen = for {
      nRows <- Gen.chooseNum(1, 5)
      nCols <- Gen.chooseNum(2, 4)
      seed <- Gen.long
    } yield (nRows, nCols, seed)
    check(Prop.forAll(gen) { case (nRows, nCols, seed) =>
      val rnd = new scala.util.Random(seed)
      val cols = (1 to nCols).map(c => s"c$c")
      val df = (1 to nRows).map { i =>
        (f"t$i%03d", (1 to nCols).map(_ => rnd.nextDouble() * 100))
      }.toDF("timestamp", "vals")
        .selectExpr("timestamp" +: cols.zipWithIndex.map {
          case (c, i) => s"vals[$i] AS $c"
        }: _*)
      val melted = Transforms.melt(df, Seq("timestamp"))
      val back = Transforms.pivotWide(melted, "timestamp", "building_id",
        "meter_reading")
      val orig = df.orderBy("timestamp").collect().map(_.toSeq).toSeq
      val rt = back.select("timestamp", cols: _*).orderBy("timestamp")
        .collect().map(_.toSeq).toSeq
      melted.count() == nRows.toLong * nCols && rt == orig
    }, n = 5)
  }

  test("property: integer narrowing is monotonic in range width") {
    // if [lo, hi] fits a narrower type, any [lo/2, hi/2] ⊆ [lo, hi] does too
    val order = Seq("SMALLINT", "INTEGER", "BIGINT")
    def infer(l: Double, h: Double) = TypeInference.infer(ColumnProfile(
      "c", LongType, 10, 0, 10, Some(l), Some(h), allIntegral = true, 0, 0, Nil))
    val gen = for {
      lo <- Gen.chooseNum(-4e9, 4e9)
      width <- Gen.chooseNum(0.0, 4e9)
    } yield (lo, lo + width)
    check(Prop.forAll(gen) { case (lo, hi) =>
      order.indexOf(infer(lo / 2, hi / 2)) <= order.indexOf(infer(lo, hi))
    })
  }

  test("property: column-name sanitization is idempotent and shape-safe") {
    check(Prop.forAll(Gen.asciiPrintableStr.suchThat(_.nonEmpty)) { s =>
      val clean = Names.cleanColumnName(s)
      Names.cleanColumnName(clean) == clean &&
        clean.matches("[a-z0-9_]*") &&
        (clean.isEmpty || !clean.head.isDigit)
    }, n = 100)
  }
}
