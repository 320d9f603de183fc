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

  /** Entity decoding alone (the [[extract]] step-3 pass, same
    * single-left-to-right-scan guarantee) — exposed for sibling
    * lexical parsers (sitemap XML, link hrefs). */
  def decodeXmlEntities(s: String): String = decodeEntities(s)

  // ------------------------------------------------------------------
  // Link extraction (the CC WAT `Links` convention)
  // ------------------------------------------------------------------

  private val LinkScanTag = "(?s)<(/?)([a-zA-Z][a-zA-Z0-9]*)([^>]*)>".r
  private def attrValue(attrs: String, name: String): Option[String] = {
    val re = ("(?is)\\b" + name +
      "\\s*=\\s*(?:\"([^\"]*)\"|'([^']*)'|([^\\s>]+))").r
    re.findFirstMatchIn(attrs).map(m =>
      decodeEntities(Option(m.group(1)).orElse(Option(m.group(2)))
        .getOrElse(m.group(3))).trim)
      .filter(_.nonEmpty)
  }

  /** Outgoing links in DOCUMENT ORDER, labeled with the Common Crawl
    * WAT `path` convention (`A@/href`, `LINK@/href`, `IMG@/src`,
    * `SCRIPT@/src`), plus the first `<base href>` (resolution state,
    * not a link — returned separately). Values are entity-decoded
    * but otherwise RAW, exactly as found (the WAT `url` field);
    * resolution is the caller's step ([[resolveUrl]]). Same lexical
    * posture as [[extract]]: one linear tag scan, comments stripped
    * first, anchors inside `script`/`style`/`noscript` bodies
    * ignored (a `SCRIPT@/src` is read off the opening tag itself). */
  def linksWithBase(html: String): (Option[String], Seq[(String, String)]) = {
    if (html == null) return (None, Seq.empty)
    val noComment = Comment.replaceAllIn(html, " ")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var base: Option[String] = None
    var skipEl: String = null
    LinkScanTag.findAllMatchIn(noComment).foreach { m =>
      val closing = m.group(1) == "/"
      val el = m.group(2).toLowerCase(java.util.Locale.ROOT)
      val attrs = m.group(3)
      if (skipEl != null) {
        if (closing && el == skipEl) skipEl = null
      } else if (!closing) el match {
        case "a" =>
          attrValue(attrs, "href").foreach(v => out += (("A@/href", v)))
        case "link" =>
          attrValue(attrs, "href").foreach(v =>
            out += (("LINK@/href", v)))
        case "img" =>
          attrValue(attrs, "src").foreach(v => out += (("IMG@/src", v)))
        case "script" =>
          attrValue(attrs, "src").foreach(v =>
            out += (("SCRIPT@/src", v)))
          if (!attrs.trim.endsWith("/")) skipEl = "script"
        case "style" | "noscript" =>
          if (!attrs.trim.endsWith("/")) skipEl = el
        case "base" =>
          if (base.isEmpty) base = attrValue(attrs, "href")
        case _ =>
      }
    }
    (base, out.toSeq)
  }

  /** RFC 3986 relative-reference resolution (java.net.URI semantics:
    * resolve + dot-segment normalization). None when the href is
    * empty, syntactically unparseable (unencoded spaces and the
    * like), or resolves to something schemeless. Absolute hrefs
    * (including non-fetchable schemes like `mailto:`) pass through —
    * downstream consumers filter by scheme. */
  def resolveUrl(base: String, href: String): Option[String] =
    try {
      val h = href.trim
      if (h.isEmpty) None
      else {
        val u = new java.net.URI(h)
        val r =
          if (u.isAbsolute) u.normalize
          else new java.net.URI(base.trim).resolve(u).normalize
        if (r.getScheme == null) None else Some(r.toString)
      }
    } catch { case _: Exception => None }
}
