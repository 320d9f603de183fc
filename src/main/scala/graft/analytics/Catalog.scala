package graft.analytics

/** Registry of every verifiable query the engine ships. SparkEntry
  * derives the driver-facing `queries` / `oracleSql` maps from here.
  */
object Catalog {
  def all: Seq[QueryDef] =
    RelationalQueries.all ++ AggregateQueries.all ++ EventQueries.all ++
      TransformQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ MultimodalQueries.all ++ StatsQueries.all

  lazy val byName: Map[String, QueryDef] =
    all.map(q => q.name -> q).toMap

  require(all.map(_.name).distinct.size == all.size,
    "duplicate query names in catalog")
}
