package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** [[HtmlText]]: the lexical extraction rules must hold exactly —
  * they are what the WARC gate query's oracle hand-derives.
  */
class HtmlTextSpec extends AnyFunSuite {

  test("scripts/styles/comments/title drop whole; blocks become lines") {
    val html =
      """<!doctype html><html><head>
        |<title>Page &amp; Title</title>
        |<style>p { color: red }</style>
        |<script type="text/javascript">if (a < b) alert("<p>hi</p>");
        |</script></head>
        |<body><h1>Header</h1>
        |<p>First para.</p><p>Second <b>bold</b> para.</p>
        |<!-- a comment with <p>markup</p> inside -->
        |<div>Block<br>break</div>
        |<ul><li>one</li><li>two</li></ul>
        |</body></html>""".stripMargin
    val text = HtmlText.extract(html)
    assert(text ===
      "Header\nFirst para.\nSecond bold para.\nBlock\nbreak\none\ntwo")
    assert(HtmlText.title(html) === Some("Page & Title"))
  }

  test("entities decode AFTER tag removal; numeric refs round-trip") {
    assert(HtmlText.extract("<p>a &lt;script&gt; tag &amp; more</p>") ===
      "a <script> tag & more")
    assert(HtmlText.extract("x &#233; &#xE9; y&nbsp;z") === "x é é y z")
    // an out-of-range numeric ref stays literal
    assert(HtmlText.extract("&#99999999;") === "&#99999999;")
  }

  test("escaped-ampersand sequences decode ONCE, never twice") {
    // '&#38;lt;' is the author writing the literal text '&lt;' — the
    // HTML spec decodes each reference exactly once; sequential
    // passes (numeric then named) would re-decode the produced '&'
    // against the following 'lt;' and emit '<'
    assert(HtmlText.extract("a &#38;lt; b") === "a &lt; b")
    assert(HtmlText.extract("&#x26;amp;") === "&amp;")
    assert(HtmlText.extract("&amp;lt;") === "&lt;")
    assert(HtmlText.extract("&amp;#60;") === "&#60;")
  }

  test("an UNCLOSED script (truncated crawl body) swallows the tail, not leaks it") {
    assert(HtmlText.extract(
      "<html><body><p>Hi</p><script>var x=1; trackUser();") === "Hi")
    assert(HtmlText.extract("<p>ok</p><style>.a{color:red}") === "ok")
    // a CLOSED script followed by real text keeps the text
    assert(HtmlText.extract(
      "<p>a</p><script>x()</script><p>b</p>") === "a\nb")
  }

  test("surrogate-range numeric refs become U+FFFD, never unpaired surrogates") {
    val t = HtmlText.extract("x &#xD800; y &#55296; z")
    assert(t === "x � y � z")
    assert(!t.exists(Character.isSurrogate))
  }

  test("inline tags become spaces; whitespace collapses per line") {
    assert(HtmlText.extract("a<span>b</span>c") === "a b c")
    assert(HtmlText.extract("  lots \t of  space  ") === "lots of space")
    assert(HtmlText.extract("") === "")
    assert(HtmlText.extract(null) === "")
    assert(HtmlText.title("<html><body>no title</body></html>") === None)
  }

  test("links: document order, CC path labels, comment/script bodies skipped") {
    val html =
      """<html><head><base href="http://base.example/app/">
        |<link rel="stylesheet" href="/css/site.css">
        |<script src="js/app.js">var a = "<a href='http://fake.example/'>";
        |</script></head>
        |<body><a href="https://other.example/abs">x</a>
        |<a href='../up?a=1&amp;b=2'>y</a>
        |<img src=img/logo.png alt="l">
        |<a href="">empty skipped</a>
        |<!-- <a href="http://comment.example/">no</a> -->
        |</body></html>""".stripMargin
    val (base, links) = HtmlText.linksWithBase(html)
    assert(base === Some("http://base.example/app/"))
    assert(links === Seq(
      ("LINK@/href", "/css/site.css"),
      ("SCRIPT@/src", "js/app.js"), // from the opening tag; the JS
      // string's fake anchor inside the script body is NOT a link
      ("A@/href", "https://other.example/abs"),
      ("A@/href", "../up?a=1&b=2"), // entity-decoded, single quotes
      ("IMG@/src", "img/logo.png"))) // bare (unquoted) value
    assert(HtmlText.linksWithBase(null)._2.isEmpty)
    assert(HtmlText.linksWithBase("plain text")._2.isEmpty)
  }

  test("resolveUrl: RFC 3986 resolution, totality on garbage") {
    val b = "http://base.example/app/"
    assert(HtmlText.resolveUrl(b, "/css/site.css") ===
      Some("http://base.example/css/site.css"))
    assert(HtmlText.resolveUrl(b, "js/app.js") ===
      Some("http://base.example/app/js/app.js"))
    assert(HtmlText.resolveUrl(b, "../up?a=1&b=2") ===
      Some("http://base.example/up?a=1&b=2"))
    assert(HtmlText.resolveUrl(b, "https://other.example/abs") ===
      Some("https://other.example/abs"))
    assert(HtmlText.resolveUrl(b, "//cdn.example/x") ===
      Some("http://cdn.example/x")) // protocol-relative
    assert(HtmlText.resolveUrl(b, "mailto:a@b") === Some("mailto:a@b"))
    assert(HtmlText.resolveUrl(b, "") === None)
    assert(HtmlText.resolveUrl(b, "http://bad host/ path") === None)
    assert(HtmlText.resolveUrl("not a base", "rel/x") === None)
  }
}
