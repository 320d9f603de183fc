package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.UrlNormalize

/** The crawl's host graph, from extracted links
  * ([[Warc.extractHtmlLinks]] rows): the artifact behind
  * link-structure curation — domain PageRank as a quality prior,
  * spam-cluster detection, seed expansion. Edges aggregate per
  * (source host, destination host) in ONE shuffle on the edge key;
  * the result is |host-pairs|-sized, orders of magnitude smaller
  * than the link rows, and feeds the engine's existing graph
  * operators (q_pagerank / q_connected_components machinery) as-is.
  */
object CrawlGraph {

  /** (src_host, dst_host, n_links) edges over fetchable (http/https)
    * RESOLVED links. Self-loops (intra-host links) are kept — they
    * carry the internal/external link ratio some quality priors use;
    * filter `src_host =!= dst_host` for a pure cross-host graph.
    * Hosts canonicalize via [[graft.text.UrlNormalize.host]]
    * (lowercase, default ports stripped). */
  def hostEdges(links: DataFrame, urlCol: String = "url",
      resolvedCol: String = "resolved"): DataFrame =
    links
      .filter(col(resolvedCol).rlike("^https?://"))
      .select(UrlNormalize.host(col(urlCol)).as("src_host"),
        UrlNormalize.host(col(resolvedCol)).as("dst_host"))
      .filter(col("src_host") =!= "" && col("dst_host") =!= "")
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))
}
