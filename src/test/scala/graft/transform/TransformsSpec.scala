package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral assertions ported from the reference's own tests
  * (`tests/test_data_transformer.py`): melt column set + row-count
  * law (`:91-97`), normalize bounds (`:82-89`), transform dispatch by
  * folder name (`:173-192`).
  */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def wide = Seq(
    ("2016-01-01 00:00:00", 1.0, 10.0),
    ("2016-01-01 01:00:00", 2.0, 20.0),
    ("2016-01-01 02:00:00", 3.0, 30.0)
  ).toDF("timestamp", "bldg_1", "bldg_2")

  test("melt produces the canonical long columns and rows = n x valueCols") {
    val melted = Transforms.meltMeterFile(wide, "electricity")
    assert(melted.columns.toSet ===
      Set("timestamp", "building_id", "meter_reading", "meter"))
    assert(melted.count() === 3 * 2)
    assert(melted.select("meter").distinct().as[String].collect().toSeq ===
      Seq("electricity"))
    val b1 = melted.filter($"building_id" === "bldg_1")
      .select("meter_reading").as[Double].collect().sorted
    assert(b1 === Array(1.0, 2.0, 3.0))
  }

  test("melt round-trips through pivot") {
    val melted = Transforms.melt(wide, Seq("timestamp"))
    val back = Transforms.pivotWide(melted, "timestamp", "building_id", "meter_reading")
    val orig = wide.orderBy("timestamp").collect().map(_.toSeq)
    val rt = back.select("timestamp", "bldg_1", "bldg_2")
      .orderBy("timestamp").collect().map(_.toSeq)
    assert(rt === orig)
  }

  test("normalizeGlobal bounds are exactly [0, 1]") {
    val df = Seq(5.0, 7.5, 10.0).toDF("v")
    val norm = Transforms.normalizeGlobal(df, "v")
    val vals = norm.select("normalized").as[Double].collect().sorted
    assert(vals === Array(0.0, 0.5, 1.0))
  }

  test("normalizeGlobal degenerate range maps to 0.0") {
    val df = Seq(4.0, 4.0).toDF("v")
    val vals = Transforms.normalizeGlobal(df, "v")
      .select("normalized").as[Double].collect()
    assert(vals.forall(_ === 0.0))
  }

  test("normalizePerGroup normalizes within each group") {
    val df = Seq(("a", 0.0), ("a", 10.0), ("b", 100.0), ("b", 300.0))
      .toDF("g", "v")
    val norm = Transforms.normalizePerGroup(df, "v", Seq("g"))
    assert(norm.filter($"g" === "a" && $"v" === 10.0)
      .select("normalized").as[Double].head() === 1.0)
    assert(norm.filter($"g" === "b" && $"v" === 100.0)
      .select("normalized").as[Double].head() === 0.0)
  }

  test("transform dispatch: metadata/weather folders are identity, others melt") {
    val idFn = Transforms.transformForFolder("building_metadata", "meta")
    assert(idFn(wide).columns.toSeq === wide.columns.toSeq)
    val weatherFn = Transforms.transformForFolder("weather_data", "w")
    assert(weatherFn(wide).columns.toSeq === wide.columns.toSeq)
    val meltFn = Transforms.transformForFolder("electricity_meters", "electricity")
    assert(meltFn(wide).columns.toSet ===
      Set("timestamp", "building_id", "meter_reading", "meter"))
  }
}
