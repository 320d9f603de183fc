package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Warehouse layer — the engine-management surface of the reference's
  * `postgres_manager.py` table API (SURVEY §2.12), re-expressed over
  * the Spark catalog + Parquet storage.
  *
  * Unique keys have no engine-enforced constraint (Spark has none);
  * they are recorded as table properties and enforced at merge time by
  * [[graft.load.Loader]] — the same place the reference enforced them
  * (staging-merge dedup, `data_loader.py:681-728`). Single-driver
  * engine: concurrent writers are out of scope (SURVEY §7.4.4).
  */
final class Warehouse(spark: SparkSession, location: String) {

  private def path(table: String) = s"$location/$table"

  /** `postgres_manager.py:431-441`. */
  def tableExists(table: String): Boolean =
    new java.io.File(path(table)).exists()

  /** `create_table_from_schema` (`postgres_manager.py:443-490`) with
    * if-exists modes fail/replace/skip
    * (`schema_analysis_orchestrator.py:73-83`).
    */
  def createTable(table: String, schema: StructType,
      ifExists: String = "fail",
      partitionBy: Seq[String] = Nil,
      uniqueKeys: Seq[String] = Nil): Unit = {
    if (tableExists(table)) ifExists match {
      case "fail" => sys.error(s"Table $table already exists")
      case "skip" => return
      case "replace" => dropTable(table)
      case other => sys.error(s"Invalid if_exists mode: $other")
    }
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val w = empty.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path(table))
    writeMeta(table, partitionBy, uniqueKeys)
  }

  def dropTable(table: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    val f = new java.io.File(path(table))
    if (f.exists()) rm(f)
    val m = new java.io.File(metaPath(table))
    if (m.exists()) m.delete()
  }

  def read(table: String): DataFrame = spark.read.parquet(path(table))

  def append(table: String, df: DataFrame): Unit = {
    val parts = readMeta(table).map(_.partitionBy).getOrElse(Nil)
    val w = df.write.mode(SaveMode.Append)
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(path(table))
  }

  def overwrite(table: String, df: DataFrame,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path(table))
  }

  /** Schema diff — `compare_table_schemas` (`postgres_manager.py:
    * 1038-1087`): columns only in A, only in B, shared-but-retyped.
    * The reference ran this as a 3-branch UNION ALL in SQL (U1/J8);
    * a StructType is driver-sized so plain set ops are the right tool.
    */
  def compareSchemas(a: StructType, b: StructType)
      : (Seq[String], Seq[String], Seq[(String, String, String)]) = {
    val am = a.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val bm = b.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val onlyA = (am.keySet -- bm.keySet).toSeq.sorted
    val onlyB = (bm.keySet -- am.keySet).toSeq.sorted
    val retyped = (am.keySet & bm.keySet).toSeq.sorted
      .flatMap(k => if (am(k) != bm(k)) Some((k, am(k), bm(k))) else None)
    (onlyA, onlyB, retyped)
  }

  /** Table stats — rows from parquet footers (no data scan), bytes
    * from the filesystem (`postgres_manager.py:509-535` sizes,
    * `:923-931` estimated counts).
    */
  def tableStats(table: String): TableStats = {
    val dir = new java.io.File(path(table))
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val files = walk(dir).filter(_.getName.endsWith(".parquet"))
    TableStats(table, read(table).count(), files.map(_.length()).sum,
      files.size)
  }

  /** Compaction — the VACUUM/CLUSTER analogue (`postgres_manager.py:
    * 634-654`, SURVEY §2.12): rewrite to `targetFiles` output files.
    * At cluster scale this is a per-partition rewrite sized by
    * `maxPartitionBytes`, not a global repartition.
    */
  def compact(table: String, targetFiles: Int): Unit = {
    val parts = readMeta(table).map(_.partitionBy).getOrElse(Nil)
    val tmp = path(table) + "__compact"
    val df = read(table).repartition(targetFiles)
    val w = df.write.mode(SaveMode.Overwrite)
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(tmp)
    val cur = new java.io.File(path(table))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(cur)
    new java.io.File(tmp).renameTo(cur)
  }

  /** Table definition — columns + declared keys + partitioning
    * (`get_table_definition`, `postgres_manager.py:678-712`; unique
    * keys live in engine metadata since Spark has no constraints).
    */
  def tableDefinition(table: String): TableDefinition = {
    val schema = read(table).schema
    val meta = readMeta(table)
    TableDefinition(table,
      schema.fields.map(f => (f.name, f.dataType.simpleString, f.nullable)).toSeq,
      meta.map(_.uniqueKeys).getOrElse(Nil),
      meta.map(_.partitionBy).getOrElse(Nil))
  }

  /** Backup analogue (`create_backup`, `postgres_manager.py:657-675`):
    * export every table to parquet under `targetDir` (the embedded-
    * engine replacement for pg_dump noted in SURVEY §2.1 S16).
    */
  def exportAll(targetDir: String): Seq[String] = {
    val dir = new java.io.File(location)
    if (!dir.exists()) Nil
    else dir.listFiles().filter(_.isDirectory).map(_.getName).toSeq.sorted
      .map { t =>
        read(t).write.mode(SaveMode.Overwrite).parquet(s"$targetDir/$t")
        t
      }
  }

  // --- tiny JSON-ish sidecar for table metadata (keys, partitioning) ---

  final case class TableMeta(partitionBy: Seq[String], uniqueKeys: Seq[String])

  private def metaPath(table: String) = s"$location/_meta_$table.properties"

  def writeMeta(table: String, partitionBy: Seq[String],
      uniqueKeys: Seq[String]): Unit = {
    val props = new java.util.Properties()
    props.setProperty("partitionBy", partitionBy.mkString(","))
    props.setProperty("uniqueKeys", uniqueKeys.mkString(","))
    val out = new java.io.FileOutputStream(metaPath(table))
    try props.store(out, null) finally out.close()
  }

  def readMeta(table: String): Option[TableMeta] = {
    val f = new java.io.File(metaPath(table))
    if (!f.exists()) None
    else {
      val props = new java.util.Properties()
      val in = new java.io.FileInputStream(f)
      try props.load(in) finally in.close()
      def split(k: String) = Option(props.getProperty(k)).map(_.trim)
        .filter(_.nonEmpty).map(_.split(",").toSeq).getOrElse(Nil)
      Some(TableMeta(split("partitionBy"), split("uniqueKeys")))
    }
  }
}

final case class TableStats(table: String, numRows: Long, sizeBytes: Long,
    numFiles: Int)

final case class TableDefinition(
    table: String,
    columns: Seq[(String, String, Boolean)], // (name, type, nullable)
    uniqueKeys: Seq[String],
    partitionBy: Seq[String])
