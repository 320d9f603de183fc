package graft.text

/** HTML TEXT EXTRACTION (tag/entity handling per the WHATWG HTML
  * syntax, public) — the step between a crawled response body and
  * the text pipeline: strip markup, drop script/style/comment
  * content whole, decode entities, and normalize whitespace into
  * newline-separated text lines the quality/dedup/language operators
  * consume. Deliberately a LEXICAL extractor (regex state over the
  * markup, not a DOM): deterministic, allocation-light, and exactly
  * reproducible by the oracle — the boilerplate-classifier step that
  * needs real parsing sits downstream of it.
  *
  * Rules, in order:
  *  1. `<!-- … -->` comments and `<script>/<style>/<noscript>/
  *     <title>` ELEMENTS (tags + content) are removed whole — the
  *     title renders in the chrome, not the page; [[title]] exposes
  *     it separately.
  *  2. Block-level tags (p/div/br/li/tr/td/th/h1-6/ul/ol/table/
  *     thead/tbody/section/article/header/footer/blockquote/pre)
  *     become a newline; every other tag becomes a space.
  *  3. Entities decode AFTER tag removal (an `&lt;script&gt;` in
  *     text must not be treated as markup): named amp/lt/gt/quot/
  *     apos/nbsp + numeric decimal/hex references.
  *  4. Whitespace normalizes per line (runs collapse to one space,
  *     lines trim, empties drop), lines join with `\n`.
  *
  * Caveat (documented, inherent to lexical extraction): a literal
  * `>` inside a quoted attribute value ends the tag early — rare in
  * real markup and harmless for corpus statistics.
  */
object HtmlText {

  private val Comment = "(?s)<!--.*?-->".r
  // title is dropped from body text too — it renders in the chrome,
  // not the page, and [[title]] exposes it separately
  private val Container =
    "(?is)<(script|style|noscript|title)\\b[^>]*>.*?</\\1\\s*>".r
  // an UNCLOSED opener (a length-truncated crawl body ending
  // mid-script — routine in real WARCs) swallows the rest of the
  // document, exactly as a browser tokenizer would: without this,
  // raw JS/CSS source leaks into the training text
  private val UnclosedContainer =
    "(?is)<(script|style|noscript|title)\\b[^>]*>.*$".r
  private val BlockTag =
    ("(?i)</?(p|div|br|li|tr|td|th|h[1-6]|ul|ol|table|thead|tbody|" +
      "section|article|header|footer|blockquote|pre)\\b[^>]*/?>").r
  private val AnyTag = "(?s)<[^>]+>".r
  // ONE combined alternation: decoding must be a single left-to-right
  // pass (java.util.regex never rescans replacement text), so text
  // produced by one decode is never re-decoded — sequential passes
  // would turn the escaped-ampersand sequence '&#38;lt;' into '<'
  // where the HTML spec renders the literal '&lt;'
  private val Entity =
    "&(?:#(\\d{1,8})|#[xX]([0-9a-fA-F]{1,6})|(amp|lt|gt|quot|apos|nbsp));".r
  private val TitleRe = "(?is)<title[^>]*>(.*?)</title>".r

  /** One decoded numeric reference: surrogate-range code points
    * become U+FFFD per the HTML spec (an unpaired surrogate in the
    * output would UTF-8-encode inconsistently across JVMs and break
    * the byte-exact dedup/fingerprint operators downstream);
    * out-of-range stays literal. */
  private def numericRef(cp: Long, matched: String): String =
    if (cp >= 0xd800 && cp <= 0xdfff) "\uFFFD"
    else if (cp > 0 && cp <= Character.MAX_CODE_POINT)
      java.util.regex.Matcher.quoteReplacement(
        new String(Character.toChars(cp.toInt)))
    else matched

  private def decodeEntities(s: String): String =
    Entity.replaceAllIn(s, m =>
      if (m.group(1) != null) numericRef(m.group(1).toLong, m.matched)
      else if (m.group(2) != null)
        numericRef(java.lang.Long.parseLong(m.group(2), 16), m.matched)
      else m.group(3) match {
        case "amp" => "&"
        case "lt" => "<"
        case "gt" => ">"
        case "quot" => "\""
        case "apos" => "'"
        case _ => " " // nbsp
      })

  // \s does NOT match U+00A0, but web text is full of literal
  // non-breaking spaces (and the &nbsp; decode above emits plain
  // spaces) — fold them into the collapse
  private def normalize(s: String): String =
    s.split('\n').iterator
      .map(_.replaceAll("(\\s|\\u00A0)+", " ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")

  /** The extracted text (rules in the object doc). */
  def extract(html: String): String = {
    if (html == null) return ""
    val noComment = Comment.replaceAllIn(html, " ")
    val noContainers = UnclosedContainer.replaceAllIn(
      Container.replaceAllIn(noComment, " "), " ")
    val blocks = BlockTag.replaceAllIn(noContainers, "\n")
    val noTags = AnyTag.replaceAllIn(blocks, " ")
    normalize(decodeEntities(noTags))
  }

  /** The first `<title>` content, extracted and normalized; None
    * when the document has none. */
  def title(html: String): Option[String] =
    if (html == null) None
    else TitleRe.findFirstMatchIn(html)
      .map(m => normalize(decodeEntities(m.group(1))))
      .filter(_.nonEmpty)
}
