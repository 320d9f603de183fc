package graft.schema

import org.apache.spark.sql.types._
import graft.profile.ColumnProfile

/** SQL type inference reproducing the reference's observable decisions
  * (`src/schema_generator/type_inference_engine.py:34-133`), driven by
  * a Spark-computed [[ColumnProfile]] instead of a pandas sample.
  *
  * Deliberate divergence (SURVEY §7.4.1): the reference infers from a
  * seed-42 10k sample, so its VARCHAR widths and int narrowing are
  * sample-dependent. Spark profiles the FULL column in one distributed
  * pass (cheap — O(1) aggregation state per metric), making decisions
  * deterministic and safe: a width/narrowing chosen from a sample can
  * be violated by unsampled rows; full-scan decisions cannot.
  */
object TypeInference {

  /** Name-pattern table — `type_inference_engine.py:38-51`, matched
    * case-insensitively, direct match first then substring, in
    * insertion order (`:56-69`).
    */
  val ColumnTypePatterns: Seq[(String, String)] = Seq(
    "lat" -> "NUMERIC(10,6)",
    "latitude" -> "NUMERIC(10,6)",
    "lng" -> "NUMERIC(10,6)",
    "longitude" -> "NUMERIC(10,6)",
    "price" -> "NUMERIC(15,2)",
    "amount" -> "NUMERIC(15,2)",
    "cost" -> "NUMERIC(15,2)",
    "zip" -> "VARCHAR(10)",
    "zipcode" -> "VARCHAR(10)",
    "postal" -> "VARCHAR(10)",
    "email" -> "VARCHAR(255)",
    "phone" -> "VARCHAR(20)")

  /** `_get_predefined_type` (`type_inference_engine.py:56-69`). */
  def predefinedType(columnName: String): Option[String] = {
    val lower = columnName.toLowerCase
    ColumnTypePatterns.collectFirst { case (p, t) if p == lower => t }
      .orElse(ColumnTypePatterns.collectFirst {
        case (p, t) if lower.contains(p) => t
      })
  }

  /** Full inference — `infer_type` (`type_inference_engine.py:71-133`).
    * Decision order: name patterns → empty→TEXT → numeric (integer
    * narrowing by min/max, then decimal-places analysis) → boolean →
    * datetime → VARCHAR(maxlen ≤255) else TEXT.
    */
  def infer(p: ColumnProfile): String = {
    predefinedType(p.name).getOrElse {
      if (p.count == 0L) "TEXT"
      else p.sparkType match {
        case _: NumericType => inferNumeric(p)
        case BooleanType => "BOOLEAN"
        case _: TimestampType => "TIMESTAMP WITH TIME ZONE"
        case _: TimestampNTZType => "TIMESTAMP"
        case _: DateType => "DATE"
        case _ =>
          // `:131-133` — VARCHAR(max observed len) up to 255, else TEXT
          if (p.maxStrLen <= 255) s"VARCHAR(${math.max(p.maxStrLen, 1)})"
          else "TEXT"
      }
    }
  }

  /** `:85-118`: all-integral → SMALLINT/INTEGER/BIGINT by observed
    * min/max; fractional → price/amount NUMERIC(15,2), ≤6 decimal
    * places NUMERIC(12,6), else DOUBLE PRECISION.
    */
  private def inferNumeric(p: ColumnProfile): String = {
    val lower = p.name.toLowerCase
    if (p.allIntegral) {
      val lo = p.minNumeric.getOrElse(0.0)
      val hi = p.maxNumeric.getOrElse(0.0)
      if (lo >= -32768 && hi <= 32767) "SMALLINT"
      else if (lo >= -2147483648.0 && hi <= 2147483647.0) "INTEGER"
      else "BIGINT"
    } else if (p.maxDecimalPlaces == 0) {
      // Not integral yet 0 observed decimal places: defensive guard
      // (the profiler now expands scientific string forms positionally,
      // so this should not occur — but if a profile source ever feeds
      // an unexpanded count again, INTEGER would truncate real
      // fractional data; DOUBLE PRECISION is lossless).
      "DOUBLE PRECISION"
    }
    else if (lower.contains("price") || lower.contains("amount")) "NUMERIC(15,2)"
    // NUMERIC(12,6) holds 6 integer digits; a wider observed magnitude
    // must stay floating or an 8-digit value overflows the DDL type.
    // (The reference emits NUMERIC(12,6) on magnitude it can't hold —
    // `type_inference_engine.py:108-118`; diverging is the safe reading.)
    else if (p.maxDecimalPlaces <= 6 &&
      p.minNumeric.getOrElse(0.0) > -1e6 &&
      p.maxNumeric.getOrElse(0.0) < 1e6) "NUMERIC(12,6)"
    else "DOUBLE PRECISION"
  }

  private val NumericPat = """NUMERIC\((\d+),(\d+)\)""".r
  private val VarcharPat = """VARCHAR\((\d+)\)""".r

  /** SQL type string → Spark DataType (SURVEY §1.2 mapping). Naive
    * TIMESTAMP becomes TimestampNTZType to avoid silent zone shifts;
    * TIMESTAMPTZ is session-zoned TimestampType.
    */
  def toSparkType(sqlType: String): DataType = sqlType match {
    case "SMALLINT" => ShortType
    case "INTEGER" => IntegerType
    case "BIGINT" => LongType
    case NumericPat(p, s) => DecimalType(p.toInt, s.toInt)
    case "NUMERIC" => DecimalType(38, 18)
    case "REAL" => FloatType
    case "DOUBLE PRECISION" => DoubleType
    case "BOOLEAN" => BooleanType
    case "DATE" => DateType
    case "TIMESTAMP" => TimestampNTZType
    case "TIMESTAMP WITH TIME ZONE" => TimestampType
    case VarcharPat(_) | "TEXT" | "JSON" | "JSONB" => StringType
    case other => sys.error(s"Unknown SQL type: $other")
  }
}

/** Name sanitization — must match the reference verbatim for
  * name-compatibility (SURVEY §1.3).
  */
object Names {

  /** `schema_analyzer.py:68-72`: lowercase, non-[a-zA-Z0-9_] → `_`,
    * digit-leading prefixed `col_`. */
  def cleanColumnName(name: String): String = {
    val clean = name.toLowerCase.replaceAll("[^a-zA-Z0-9_]", "_")
    if (clean.nonEmpty && clean.head.isDigit) s"col_$clean" else clean
  }

  /** `schema_analyzer.py:174-187`: file stem lowercased, sanitized,
    * digit-leading prefixed `tbl_`. */
  def deriveTableName(fileName: String): String = {
    val stem = {
      val base = fileName.substring(fileName.lastIndexOf('/') + 1)
      val dot = base.lastIndexOf('.')
      if (dot > 0) base.substring(0, dot) else base
    }
    val clean = stem.toLowerCase.replaceAll("[^a-zA-Z0-9_]", "_")
    if (clean.nonEmpty && clean.head.isDigit) s"tbl_$clean" else clean
  }
}

/** DDL emission — `SQLSchemaGenerator.generate_schema`
  * (`schema_analyzer.py:116-143`): CREATE TABLE IF NOT EXISTS with
  * quoted table name, typed columns, NOT NULL markers, optional
  * PRIMARY KEY.
  */
object DdlGenerator {

  final case class ColumnDef(name: String, sqlType: String, nullable: Boolean)

  def createTable(
      tableName: String,
      columns: Seq[ColumnDef],
      primaryKey: Seq[String] = Nil): String = {
    val colDefs = columns.map { c =>
      val nn = if (c.nullable) "" else " NOT NULL"
      s"""    "${c.name}" ${c.sqlType}$nn"""
    }
    val pk =
      if (primaryKey.nonEmpty)
        Seq(s"""    PRIMARY KEY (${primaryKey.map(k => s""""$k"""").mkString(", ")})""")
      else Nil
    (Seq(s"""CREATE TABLE IF NOT EXISTS "$tableName" (""") :+
      (colDefs ++ pk).mkString(",\n") :+ ");").mkString("\n")
  }

  /** StructType persistence replaces the reference's `.sql` text files
    * (SURVEY §1.3): Spark's JSON schema round-trips losslessly. */
  def schemaToJson(schema: org.apache.spark.sql.types.StructType): String =
    schema.json

  def schemaFromJson(json: String): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.DataType.fromJson(json)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
}
