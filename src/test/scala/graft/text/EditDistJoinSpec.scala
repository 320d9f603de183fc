package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Recall proof for the Ed-Join pruning rules: the q-gram-filtered join
  * must reproduce the naive all-pairs Levenshtein filter EXACTLY —
  * including pairs of strings so short they can share zero q-grams
  * (the stratum the count filter alone would silently drop).
  */
class EditDistJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bruteForce(ws: Seq[String], d: Int): Set[(String, String, Int)] = {
    val u = ws.distinct
    (for {
      a <- u; b <- u if a < b
      dist = lev(a, b) if dist <= d
    } yield (a, b, dist)).toSet
  }

  private val words = Seq(
    "a", "ab", "by", "cat", "cart", "card", "care", "cared", "scares",
    "dog", "dig", "dug", "dugg", "x", "xy", "yz", "filter", "filler",
    "fuller", "joins", "join", "jorn", "spark", "spars", "sparse",
    "data", "date", "gate", "gaze", "maze")

  test("q-gram-filtered join equals brute force for d = 1, 2, 3") {
    val df = words.toDF("w")
    for (d <- 1 to 3) {
      val got = EditDistJoin.join(df, "w", d = d, q = 2).collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(got === bruteForce(words, d), s"d=$d")
    }
  }

  test("short-string stratum: zero-shared-gram pairs are not lost") {
    // "a" vs "by": ED = 2, padded 2-grams {#a, a$} vs {#b, by, y$} —
    // disjoint. Only the short cross join can emit this pair.
    val df = Seq("a", "by", "zq").toDF("w")
    val got = EditDistJoin.join(df, "w", d = 2, q = 2).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a", "by"), ("a", "zq"), ("by", "zq")))
  }

  test("q = 3 with longer grams matches brute force too") {
    val df = words.toDF("w")
    val got = EditDistJoin.join(df, "w", d = 2, q = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === bruteForce(words, 2))
  }

  test("duplicate input strings collapse (distinct) and empty strings drop") {
    val df = Seq("cat", "cat", "", "bat").toDF("w")
    val got = EditDistJoin.join(df, "w", d = 1, q = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === Set(("bat", "cat", 1)))
  }

  test("gram exchanges ship (g, id, len) postings — never payload strings") {
    // the scale contract: a hot gram costs id-pair traffic, not
    // string-pair traffic. Pin that every shuffle carrying the gram
    // column has NO other string-typed attribute in its output (the
    // strings re-enter only at the final id-keyed lookup).
    // at spec scale the planner may broadcast the gram join instead of
    // shuffling — the payload contract applies to EITHER exchange kind
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.types.StringType
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try {
      val df = EditDistJoin.join(words.toDF("w"), "w", d = 2, q = 2)
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: Exchange => e
      }
      val gramEx = exchanges.filter(_.output.exists(_.name == "g"))
      assert(gramEx.nonEmpty, "expected gram-keyed exchanges in the plan")
      gramEx.foreach { e =>
        val strings = e.output.filter(_.dataType == StringType).map(_.name)
        assert(strings === Seq("g"),
          s"gram exchange ships string payload: $strings")
      }
    } finally spark.conf.set(key, prev)
  }
}
