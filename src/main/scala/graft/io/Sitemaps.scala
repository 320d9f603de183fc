package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Sitemap parsing + crawl-coverage audit (the sitemaps.org
  * protocol, the public convention robots.txt `Sitemap:` lines point
  * at) — the other half of crawl curation: robots says what a
  * crawler MUST NOT fetch, the sitemap says what the site WANTS
  * fetched. The audit joins a site's declared URL list against the
  * crawl's CDX index — "which declared pages did the crawl actually
  * capture?" — the completeness measure a corpus builder runs before
  * blaming the extractor.
  *
  * Parsing is the house lexical posture (regex over the markup, no
  * XML DOM, total on garbage): `<urlset>` / `<sitemapindex>` roots
  * (optional namespace prefixes tolerated), `<url>`/`<sitemap>`
  * blocks in document order, `loc`/`lastmod`/`changefreq`/`priority`
  * children entity-decoded and whitespace-trimmed. Gzipped sitemap
  * bodies (`sitemap.xml.gz`) inflate transparently. Values stay RAW
  * strings (`lastmod` is W3C datetime, `priority` decimal text) —
  * consumers cast; the parser never throws on a malformed value.
  *
  * Scale posture: parsing is per-sitemap mapPartitions (sitemaps cap
  * at 50k URLs / 50 MB by protocol); the audit is one urlkey-keyed
  * shuffle join of |declared| × |index| — both orders of magnitude
  * below the archive bytes.
  */
object Sitemaps {

  private[io] final case class Entry(loc: String, lastmod: String,
      changefreq: String, priority: String)

  private val RootRe = "(?is)<\\s*(?:\\w+:)?(urlset|sitemapindex)\\b".r
  private val UrlBlockRe =
    "(?is)<(?:\\w+:)?url\\b[^>]*>(.*?)</(?:\\w+:)?url\\s*>".r
  private val MapBlockRe =
    "(?is)<(?:\\w+:)?sitemap\\b[^>]*>(.*?)</(?:\\w+:)?sitemap\\s*>".r

  private def child(block: String, name: String): String = {
    val re = ("(?is)<(?:\\w+:)?" + name + "\\b[^>]*>(.*?)</(?:\\w+:)?" +
      name + "\\s*>").r
    re.findFirstMatchIn(block)
      .map(m => graft.text.HtmlText.decodeXmlEntities(m.group(1)).trim)
      .getOrElse("")
  }

  /** Parse one sitemap document: ("urlset" | "sitemapindex", entries
    * in document order); ("", empty) when the text has neither root.
    * Entries without a `loc` are dropped (the one mandatory field).
    * Total — garbage in, empty out. */
  private[io] def parseSitemap(xml: String): (String, Seq[Entry]) = {
    if (xml == null) return ("", Seq.empty)
    val body =
      if (xml.startsWith("\uFEFF")) xml.substring(1) else xml
    RootRe.findFirstMatchIn(body) match {
      case None => ("", Seq.empty)
      case Some(m) =>
        val kind = m.group(1).toLowerCase(java.util.Locale.ROOT)
        val blocks =
          if (kind == "urlset") UrlBlockRe.findAllMatchIn(body)
          else MapBlockRe.findAllMatchIn(body)
        val entries = blocks.map(_.group(1)).map { b =>
          Entry(child(b, "loc"), child(b, "lastmod"),
            child(b, "changefreq"), child(b, "priority"))
        }.filter(_.loc.nonEmpty).toSeq
        (kind, entries)
    }
  }

  /** One declared URL (or child sitemap); `parsed = false` flags a
    * non-sitemap document. `urlkey` is the SURT form
    * ([[WarcCdx.surtKey]]) — the join key against CDX indexes. */
  final case class SitemapRow(asset_id: Long, entry_idx: Int,
      kind: String, loc: String, urlkey: String, lastmod: String,
      changefreq: String, priority: String, parsed: Boolean)

  /** Sitemap entries over an (id, bytes-or-text) corpus. Accepts
    * binary or string columns; gzipped bodies inflate first, CAPPED
    * at `maxBytes` (the protocol's own limit is 50 MB uncompressed —
    * a gz bomb must flag, not OOM the task). */
  def entries(df: DataFrame, idCol: String, xmlCol: String,
      maxBytes: Long = 64L << 20)(
      implicit spark: SparkSession): Dataset[SitemapRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(xmlCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, raw) =>
        val parsedDoc =
          try {
            Option(raw).map { r =>
              val plain =
                if (r.length >= 2 && (r(0) & 0xff) == 0x1f &&
                  (r(1) & 0xff) == 0x8b)
                  Warc.gunzipAll(r, maxBytes)
                    .getOrElse(Array.empty[Byte])
                else if (r.length > maxBytes) Array.empty[Byte]
                else r
              parseSitemap(new String(plain, "UTF-8"))
            }
          } catch {
            case scala.util.control.NonFatal(_) => Some(("", Seq.empty))
          }
        parsedDoc match {
          case Some((kind, es)) if kind.nonEmpty =>
            es.iterator.zipWithIndex.map { case (e, i) =>
              SitemapRow(id, i, kind, e.loc, WarcCdx.surtKey(e.loc),
                e.lastmod, e.changefreq, e.priority, parsed = true)
            }
          case _ => Iterator.single(SitemapRow(id, -1, "", "", "", "",
            "", "", parsed = false))
        }
      })
  }

  /** Declared-vs-captured audit: each `urlset` entry left-joins the
    * CDX index's parsed RESPONSE rows on urlkey → `captured`, with
    * the EARLIEST capture's 14-digit timestamp (empty when never
    * captured). One shuffle on the urlkey. */
  def coverageAudit(declared: DataFrame, cdx: DataFrame): DataFrame = {
    val captures = cdx
      .filter(col("parsed") && col("warc_type") === "response")
      .groupBy(col("urlkey").as("c_urlkey"))
      .agg(min(col("timestamp")).as("first_capture"))
    declared
      .filter(col("parsed") && col("kind") === "urlset")
      .join(captures, col("urlkey") === col("c_urlkey"), "left")
      .withColumn("captured", col("c_urlkey").isNotNull)
      .withColumn("first_capture", coalesce(col("first_capture"), lit("")))
      .drop("c_urlkey")
  }
}
