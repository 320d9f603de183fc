package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over
  * the same parquet tables.
  *
  * Conventions that make the driver's hash-compare deterministic:
  *  - output column names match EXACTLY between Spark and oracle SQL;
  *  - every query is ordered by a unique key prefix in BOTH engines;
  *  - double-typed aggregates go through DECIMAL casts so the result
  *    is independent of partial-aggregation order (IEEE double sums are
  *    order-sensitive; decimal sums are exact).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryDef {
  def sql(name: String, oracleSql: String, doc: String = "")(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracleSql), doc)

  def rowsOnly(name: String, doc: String = "")(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None, doc)
}
