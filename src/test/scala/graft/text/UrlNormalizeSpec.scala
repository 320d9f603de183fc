package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlNormalize.canonicalize($"u").as("c"))
      .as[String].collect().toSeq

  test("case, default port, trailing slash, utm params and fragment all collapse") {
    val variants = Seq(
      "https://example.com/page/7",
      "HTTPS://EXAMPLE.COM/page/7",
      "https://example.com:443/page/7/",
      "https://example.com/page/7?utm_source=a&utm_campaign=b",
      "https://example.com/page/7#section")
    assert(canon(variants: _*).distinct === Seq("https://example.com/page/7"))
  }

  test("real params survive, sorted; http strips :80 but not :8080") {
    assert(canon("https://example.com/p?b=2&a=1#x") ===
      Seq("https://example.com/p?a=1&b=2"))
    assert(canon("HTTP://Example.com:80/p") === Seq("http://example.com/p"))
    assert(canon("http://example.com:8080/p") ===
      Seq("http://example.com:8080/p"))
  }

  test("session-id params strip (case-insensitive), lookalikes survive") {
    assert(canon(
      "https://example.com/p?a=1",
      "https://example.com/p?jsessionid=1A2B&a=1",
      "https://example.com/p?PHPSESSID=deadbeef&a=1",
      "https://example.com/p?a=1&sid=9",
      "https://example.com/p?ASPSESSIONIDQQGG=JLKOPM&a=1").distinct ===
      Seq("https://example.com/p?a=1"))
    // prefix/suffix lookalikes are real params
    assert(canon("https://example.com/p?side=1") ===
      Seq("https://example.com/p?side=1"))
    assert(canon("https://example.com/p?mysid=1") ===
      Seq("https://example.com/p?mysid=1"))
  }

  test("utm mixed with real params: only utm dropped") {
    assert(canon("https://e.com/p?utm_x=1&z=9&a=1") ===
      Seq("https://e.com/p?a=1&z=9"))
  }

  test("root path and bare host normalize identically; non-URLs pass through") {
    assert(canon("https://e.com/", "https://e.com").distinct ===
      Seq("https://e.com"))
    assert(canon("not a url", "") === Seq("not a url", ""))
  }

  test("case variants of the PATH stay distinct (paths are case-sensitive)") {
    assert(canon("https://e.com/Page", "https://e.com/page").distinct.size === 2)
  }
}
