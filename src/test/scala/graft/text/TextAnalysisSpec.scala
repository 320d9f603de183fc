package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount handles normal, padded, and empty text") {
    val df = Seq("one two three", "  a  b  ", "", "   ").toDF("t")
    val counts = df.select(TextAnalysis.tokenCount($"t")).as[Int].collect()
    assert(counts.toSeq === Seq(3, 2, 0, 0))
  }

  test("punctRatio and upperRatio") {
    val r = Seq("Ab, cd!").toDF("t")
      .select(TextAnalysis.punctRatio($"t"), TextAnalysis.upperRatio($"t"))
      .as[(Double, Double)].head()
    assert(r._1 === 2.0 / 7.0) // ',' and '!'
    assert(r._2 === 1.0 / 4.0) // A of Abcd
  }

  test("stopwordRatio finds function words") {
    val r = Seq("the cat sat on the mat").toDF("t")
      .select(TextAnalysis.stopwordRatio($"t")).as[Double].head()
    assert(r === 3.0 / 6.0) // the, on, the
  }

  test("languageId identifies real multilingual prose") {
    val samples = Seq(
      ("en", "the quick brown fox jumps over the lazy dog and runs to the field"),
      ("de", "der schnelle braune fuchs springt und das ist nicht ein problem mit der zeit"),
      ("es", "el zorro marron salta sobre el perro que duerme para llegar con los amigos"),
      ("fr", "le renard brun saute sur le chien dans les champs pour atteindre une maison"),
      ("zh", "敏捷的棕色狐狸跳过懒狗然后跑向田野里的房子"))
      .toDF("expected", "text")
    val results = samples
      .select($"expected", TextAnalysis.languageId($"text").as("pred"))
      .as[(String, String)].collect()
    results.foreach { case (exp, pred) => assert(pred === exp, s"for $exp") }
  }

  test("fingerprint is normalization-insensitive and content-sensitive") {
    val df = Seq(
      ("a", "Hello,  World!"), ("b", "hello world"), ("c", "different text")
    ).toDF("id", "t").select($"id", TextAnalysis.fingerprint($"t").as("fp"))
    val fps = df.as[(String, Long)].collect().toMap
    assert(fps("a") === fps("b"))
    assert(fps("a") !== fps("c"))
  }

  test("wordShingles produces sliding distinct n-grams") {
    val sh = Seq("a b c d").toDF("t")
      .select(TextAnalysis.wordShingles($"t", 2)).as[Seq[String]].head()
    assert(sh === Seq("a b", "b c", "c d"))
    val short = Seq("a").toDF("t")
      .select(TextAnalysis.wordShingles($"t", 3)).as[Seq[String]].head()
    assert(short === Seq("a"))
  }

  test("redactPii scrubs emails, phones and IPs; leaves clean text alone") {
    val cases = Seq(
      ("mail me at john.doe+x@sub.example.co.uk today",
        "mail me at [EMAIL] today"),
      ("call 555-123-4567 or 555.987.6543", "call [PHONE] or [PHONE]"),
      ("server 192.168.1.255 down", "server [IP] down"),
      // email domain dots must not be half-eaten by the IP pattern
      ("a@b.io and 10.0.0.1", "[EMAIL] and [IP]"),
      ("no pii here, just 3.14 and v1.2", "no pii here, just 3.14 and v1.2"))
    val out = cases.map(_._1).toDF("t")
      .select(TextAnalysis.redactPii($"t")).as[String].collect()
    out.zip(cases.map(_._2)).foreach { case (got, want) =>
      assert(got === want)
    }
  }

  test("qualityScore favors natural prose over junk") {
    val df = Seq(
      ("prose", "the cat sat on the mat and it was a warm day in the garden of the old house by the sea with many trees"),
      ("junk", ";;;###;;; $$$ ??? !!!! %%% ^^^ &&& *** ((( ))) @@@@")
    ).toDF("kind", "t")
      .select($"kind", TextAnalysis.qualityScore($"t").as("q"))
    val scores = df.as[(String, Double)].collect().toMap
    assert(scores("prose") > 0.7)
    assert(scores("junk") < 0.4)
    assert(scores.values.forall(s => s >= 0.0 && s <= 1.0))
  }
}
