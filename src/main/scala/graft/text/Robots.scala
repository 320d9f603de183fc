package graft.text

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and retroactive URL filtering (RFC 9309, the
  * Robots Exclusion Protocol) — the crawl-curation operator a
  * training corpus needs AFTER the fact: given the robots.txt
  * captures a crawl archived beside its pages (they are ordinary
  * WARC response records), which archived URLs would the policy have
  * excluded for a given crawler token?
  *
  * Parsing follows RFC 9309 §2.2 with the de-facto conventions of
  * the reference matcher ecosystem, each documented at the method:
  *  - groups = consecutive `User-agent` lines followed by their
  *    rules; a later `User-agent` line after at least one directive
  *    starts a new group; rules before any group are discarded;
  *  - group selection for a crawler token: the group(s) whose agent
  *    value is the LONGEST case-insensitive prefix of the token win;
  *    `*` groups (match length 0) apply only when no named group
  *    matches; same-agent groups MERGE (§2.2.1);
  *  - rule precedence: longest pattern (string length, wildcards
  *    counted) wins; at equal length `Allow` wins (§2.2.2);
  *  - patterns: `*` matches any run, a trailing `$` anchors the end,
  *    everything else is a literal prefix match against the URL's
  *    path + query (case-sensitive); empty patterns are no-ops;
  *  - keys are case-insensitive; `#` starts a comment; a UTF-8 BOM
  *    and any of CRLF/CR/LF line breaks are tolerated.
  *
  * Scale posture: parsing is per-robots.txt (one small text per
  * host) via mapPartitions — total, never throws. Matching is the
  * corpus-sized side and stays one-row-per-URL in codegen'd array
  * expressions: rules collect to one array struct per host (tens of
  * entries), the URL corpus joins by host (shuffle on the join key;
  * the rules side is |hosts|-sized, never corpus-sized), and the
  * longest-match fold runs inside `filter`/`aggregate` lambdas — no
  * explode, no per-(url,rule) row blow-up, no UDFs.
  */
object Robots {

  /** One exploded rule row. `rule_idx = -1` marks the SENTINEL row an
    * empty group emits (a group with no rules is still a selectable
    * policy — "everything allowed for these agents" — and must beat
    * the `*` fallback during selection). */
  final case class RobotsRuleRow(host: String, group_idx: Int,
      agents: Seq[String], rule_idx: Int, allow: Boolean,
      pattern: String, regex: String, priority: Int)

  /** One `Sitemap:` line (group-independent per RFC 9309 §2.3). */
  final case class SitemapRow(host: String, sitemap: String)

  private[text] final case class Group(agents: Seq[String],
      rules: Seq[(Boolean, String)])

  /** Translate a robots path pattern to an RE2-safe anchored regex:
    * `*` → `.*`, a trailing `$` stays an anchor, every other regex
    * metacharacter is backslash-escaped, and the whole pattern
    * anchors at the target's start (prefix semantics). The output
    * compiles identically under Java regex and RE2 (no lookaround),
    * so a DuckDB oracle can restate it verbatim. */
  private[text] def patternRegex(p: String): String = {
    val endAnchor = p.endsWith("$")
    val body = if (endAnchor) p.dropRight(1) else p
    val sb = new StringBuilder("^")
    body.foreach {
      case '*' => sb.append(".*")
      case c if "\\.[]{}()<>+-=!?^$|".contains(c) =>
        sb.append('\\').append(c)
      case c => sb.append(c)
    }
    if (endAnchor) sb.append('$')
    sb.toString
  }

  /** Parse one robots.txt text into groups + sitemaps. Total: any
    * unrecognized or malformed line is skipped (it still closes an
    * agent-collection run, like the reference matcher), so corrupt
    * captures yield the rules that DID parse, never a throw. */
  private[text] def parse(txt: String): (Seq[Group], Seq[String]) = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]
    var agents = scala.collection.mutable.ArrayBuffer.empty[String]
    var rules = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    var collectingAgents = false
    var groupOpen = false
    def flush(): Unit = {
      if (groupOpen) groups += Group(agents.toSeq, rules.toSeq)
      agents = scala.collection.mutable.ArrayBuffer.empty[String]
      rules = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
      groupOpen = false
    }
    val unbounded =
      if (txt.startsWith("\uFEFF")) txt.substring(1) else txt
    // RFC 9309 \u00A72.4: crawlers impose a parse limit (\u2265500 KiB) and
    // may ignore content past it \u2014 truncate at the last line break
    // under 1 MiB so a pathological capture can't balloon the task
    // (and a half-line never fabricates a rule)
    val body =
      if (unbounded.length <= (1 << 20)) unbounded
      else {
        val cut = unbounded.lastIndexOf('\n', 1 << 20)
        unbounded.substring(0, math.max(cut, 0))
      }
    body.split("\r\n|\r|\n", -1).foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      if (line.nonEmpty) {
        val c = line.indexOf(':')
        if (c > 0) {
          val key = line.substring(0, c).trim.toLowerCase(Locale.ROOT)
          val value = line.substring(c + 1).trim
          key match {
            case "user-agent" | "useragent" =>
              if (!collectingAgents) flush()
              collectingAgents = true
              groupOpen = true
              if (value.nonEmpty)
                agents += value.toLowerCase(Locale.ROOT)
            case "allow" | "disallow" =>
              collectingAgents = false
              if (groupOpen && value.nonEmpty)
                rules += ((key == "allow", value))
            case "sitemap" =>
              collectingAgents = false
              if (value.nonEmpty) sitemaps += value
            case _ => // crawl-delay, host, …: ignored, closes the run
              collectingAgents = false
          }
        } else collectingAgents = false
      }
    }
    flush()
    (groups.toSeq, sitemaps.toSeq)
  }

  /** Exploded rule rows over a (host, robots-text) corpus. Priority
    * is the pattern's string length (the longest-match precedence
    * key); `regex` is [[patternRegex]] of the pattern; empty groups
    * emit their sentinel row (`rule_idx = -1`). */
  def parseRules(df: DataFrame, hostCol: String, txtCol: String)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(hostCol).cast("string"), col(txtCol).cast("string"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (host, txt) =>
        parse(Option(txt).getOrElse(""))._1.zipWithIndex.flatMap {
          case (g, gi) =>
            if (g.rules.isEmpty)
              Seq(RobotsRuleRow(host, gi, g.agents, -1, allow = true,
                "", "", -1))
            else g.rules.zipWithIndex.map { case ((allow, p), ri) =>
              RobotsRuleRow(host, gi, g.agents, ri, allow, p,
                patternRegex(p), p.length)
            }
        }
      }).toDF()
  }

  /** `Sitemap:` rows over a (host, robots-text) corpus. */
  def sitemaps(df: DataFrame, hostCol: String, txtCol: String)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(hostCol).cast("string"), col(txtCol).cast("string"))
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (host, txt) =>
        parse(Option(txt).getOrElse(""))._2.map(SitemapRow(host, _))
      }).toDF()
  }

  /** The rules the given crawler token is governed by, per host:
    * groups whose best agent value is the longest case-insensitive
    * prefix of `agent` (ties merge — RFC 9309 same-agent merging);
    * `*` groups only when nothing named matches; sentinel rows drop
    * AFTER selection (an empty named group beats the `*` fallback and
    * then yields zero rules = allow-all). The window partitions by
    * host over the RULES table — |hosts|-sized, never corpus-sized. */
  def rulesFor(rules: DataFrame, agent: String): DataFrame = {
    val agentLc = lit(agent.toLowerCase(Locale.ROOT))
    val agentMatch = aggregate(col("agents"), lit(-1),
      (acc: Column, a: Column) => greatest(acc,
        when(a === "*", 0)
          .when(agentLc.substr(lit(1), length(a)) === a, length(a))
          .otherwise(-1)))
    rules.withColumn("agent_match", agentMatch)
      .filter(col("agent_match") >= 0)
      .withColumn("best_match",
        max(col("agent_match")).over(Window.partitionBy(col("host"))))
      .filter(col("agent_match") === col("best_match"))
      .filter(col("rule_idx") >= 0)
      .select(col("host"), col("group_idx"), col("rule_idx"),
        col("allow"), col("pattern"), col("regex"), col("priority"))
  }

  /** Longest-match verdict columns (`allowed`, `matched_pattern`)
    * for a (host, target) corpus, where `target` is the URL's
    * path [+ `?query`]. Rules fold to ONE array per host and the
    * verdict computes inside `filter`/`aggregate` lambdas over that
    * array — one row per URL throughout. Hosts without rules (no
    * robots.txt, or an empty selected group) are allowed. Ties at
    * equal priority prefer Allow, then the lexically smallest
    * pattern (determinism only — RFC leaves it undefined). */
  def filterTargets(urls: DataFrame, hostCol: String, targetCol: String,
      rules: DataFrame, agent: String): DataFrame = {
    val perHost = rulesFor(rules, agent)
      .groupBy(col("host").as("r_host"))
      .agg(collect_list(struct(col("allow"), col("pattern"),
        col("regex"), col("priority"))).as("r_rules"))
    val matched = filter(col("r_rules"),
      r => regexp_like(col(targetCol), r("regex")))
    val init = struct(lit(-1).as("priority"), lit(true).as("allow"),
      lit(null).cast("string").as("pattern"))
    val wins = (acc: Column, r: Column) =>
      r("priority") > acc("priority") ||
        (r("priority") === acc("priority") &&
          ((r("allow") && !acc("allow")) ||
            (r("allow") === acc("allow") &&
              (acc("pattern").isNull || r("pattern") < acc("pattern")))))
    val best = aggregate(matched, init, (acc: Column, r: Column) =>
      when(wins(acc, r), struct(r("priority").as("priority"),
        r("allow").as("allow"), r("pattern").as("pattern")))
        .otherwise(acc))
    urls
      .join(perHost, col(hostCol) === col("r_host"), "left")
      .withColumn("robots_best", best)
      .withColumn("allowed",
        coalesce(when(col("robots_best")("priority") >= 0,
          col("robots_best")("allow")), lit(true)))
      .withColumn("matched_pattern",
        when(col("robots_best")("priority") >= 0,
          col("robots_best")("pattern")))
      .drop("r_host", "r_rules", "robots_best")
  }

  /** [[filterTargets]] over full URLs: host via
    * [[UrlNormalize.host]]; target = raw path + query (fragment
    * dropped, trailing slashes KEPT — robots patterns are
    * slash-sensitive), an empty path matching as `/`. */
  def filterUrls(urls: DataFrame, urlCol: String, rules: DataFrame,
      agent: String): DataFrame = {
    val rawTarget = regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val prepared = urls
      .withColumn("robots_host", UrlNormalize.host(col(urlCol)))
      .withColumn("robots_target",
        when(rawTarget === "" || rawTarget.startsWith("?"),
          concat(lit("/"), rawTarget)).otherwise(rawTarget))
    filterTargets(prepared, "robots_host", "robots_target", rules,
      agent)
  }
}
