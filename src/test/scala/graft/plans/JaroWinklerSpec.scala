package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins JaroWinklerSim to DuckDB's jaro_winkler_similarity outputs
  * (reference vectors captured from DuckDB directly), including the
  * semantic corners: empty strings score 0, the Winkler boost applies
  * only above 0.7, the match window ⌊max/2⌋−1 blanks short
  * transposed pairs, and codegen and interpreted paths agree.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  // (a, b, DuckDB jaro_winkler_similarity(a, b))
  private val reference = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("spark", "spars", 0.92),
    ("a", "by", 0.0),
    ("abc", "", 0.0),
    ("", "", 0.0),
    ("same", "same", 1.0),
    ("cart", "card", 0.8833333333333334),
    ("filter", "fuller", 0.7999999999999999),
    ("data", "date", 0.8833333333333334),
    ("join", "jorn", 0.8666666666666667),
    ("stream", "scream", 0.9),
    ("x", "x", 1.0),
    ("ab", "ba", 0.0),
    // boost threshold: jaro 0.5 with 2-char prefix stays unboosted
    ("abcdefgh", "abxxxxxx", 0.5),
    ("ab", "abcdefghij", 0.7866666666666667),
    ("abcd", "abzz", 0.6666666666666666))

  test("static similarity matches every DuckDB reference vector") {
    reference.foreach { case (a, b, expected) =>
      val got = JaroWinklerSim.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(math.abs(got - expected) < 1e-12, s"($a, $b): $got")
    }
  }

  test("symmetry on random strings") {
    val rnd = new scala.util.Random(17)
    (0 until 200).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(10))(('a' + rnd.nextInt(5)).toChar).mkString
      val b = Seq.fill(rnd.nextInt(10))(('a' + rnd.nextInt(5)).toChar).mkString
      val ab = JaroWinklerSim.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b))
      val ba = JaroWinklerSim.similarity(
        UTF8String.fromString(b), UTF8String.fromString(a))
      assert(ab === ba, s"($a, $b)")
      assert(ab >= 0.0 && ab <= 1.0)
    }
  }

  test("codegen path (no fallback) agrees with interpreted eval") {
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = reference.map { case (a, b, _) => (a, b) }.toDF("a", "b")
        .withColumn("jw", call_function("jaro_winkler", col("a"), col("b")))
        .collect()
      rows.zip(reference).foreach { case (r, (a, b, expected)) =>
        assert(math.abs(r.getDouble(2) - expected) < 1e-12, s"($a, $b)")
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("null inputs yield null, not a crash") {
    val out = Seq(("x", Option.empty[String])).toDF("a", "b")
      .withColumn("jw", call_function("jaro_winkler", col("a"), col("b")))
      .collect().head
    assert(out.isNullAt(2))
  }
}
