package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus dedup: two fetches of the same
  * page routinely differ in scheme/host case, an explicit default
  * port, a trailing slash, tracking parameters, parameter order, and
  * fragments — none of which change the resource. Canonicalizing
  * before the exact-dedup key (or as the LSH document id) collapses
  * them. All steps are RE2-safe regex + array expressions (no
  * lookaround, no UDFs): codegen'd in Spark and mirrored verbatim by
  * the `q_url_dedup` DuckDB oracle.
  *
  * Steps: lowercase scheme+host · strip `:80`(http)/`:443`(https) ·
  * drop the fragment · drop `utm_*` tracking and session-id params
  * (jsessionid/phpsessid/sid/aspsessionid*, the IA/CC strip list —
  * two fetches of one page differ in session id as routinely as in
  * tracking params) · sort surviving params · strip trailing path
  * slashes.
  */
object UrlNormalize {

  /** Lowercased scheme, e.g. "https". */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host[:port]. */
  private def hostPort(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))

  /** Host with scheme-default ports removed. */
  def host(url: Column): Column = {
    val hp = hostPort(url)
    when(scheme(url) === "https", regexp_replace(hp, ":443$", ""))
      .when(scheme(url) === "http", regexp_replace(hp, ":80$", ""))
      .otherwise(hp)
  }

  /** Path with trailing slashes stripped (root collapses to empty). */
  def path(url: Column): Column =
    regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")

  /** Query string with `utm_*` and session-id params (`jsessionid`,
    * `phpsessid`, `sid`, `aspsessionid*` — the IA/CC canonicalizer's
    * strip list, matched case-insensitively on the param NAME) dropped
    * and the rest sorted; empty string when nothing survives.
    */
  def sortedQuery(url: Column): Column = {
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val params = filter(split(q, "&"),
      p => p =!= "" && !p.startsWith("utm_") &&
        !p.rlike("(?i)^(jsessionid|phpsessid|sid|aspsessionid[a-z0-9]*)(=|$)"))
    when(size(params) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(array_sort(params), "&")))
  }

  /** The full canonical form; non-URLs (no `scheme://`) pass through
    * unchanged so the expression is safe on mixed columns.
    */
  def canonicalize(url: Column): Column =
    when(scheme(url) === "", url)
      .otherwise(concat(scheme(url), lit("://"), host(url), path(url),
        sortedQuery(url)))
}
