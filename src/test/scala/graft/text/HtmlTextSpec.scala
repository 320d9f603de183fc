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
}
