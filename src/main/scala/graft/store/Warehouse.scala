package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Warehouse layer — the engine-management surface of the reference's
  * `postgres_manager.py` table API (SURVEY §2.12), re-expressed over
  * the Spark catalog + Parquet storage.
  *
  * All filesystem access goes through the Hadoop [[FileSystem]] API so
  * `location` may be any supported URI — `file:///`, `hdfs://`,
  * `s3a://` — not just the local disk the tests use. That is the
  * difference between a demo store and one a 1000-executor cluster can
  * actually point at.
  *
  * Unique keys have no engine-enforced constraint (Spark has none);
  * they are recorded as table properties and enforced at merge time by
  * [[graft.load.Loader]] — the same place the reference enforced them
  * (staging-merge dedup, `data_loader.py:681-728`). Single-driver
  * engine: concurrent writers are out of scope (SURVEY §7.4.4).
  */
final class Warehouse(spark: SparkSession, location: String) {

  private def path(table: String) = s"$location/$table"

  private def fs: FileSystem =
    new Path(location).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** `postgres_manager.py:431-441`. */
  def tableExists(table: String): Boolean =
    fs.exists(new Path(path(table)))

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
    val p = new Path(path(table))
    if (fs.exists(p)) fs.delete(p, true)
    val m = new Path(metaPath(table))
    if (fs.exists(m)) fs.delete(m, false)
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

  /** Data files of a table, recursively (partitioned layouts nest). */
  private def dataFiles(table: String): Seq[org.apache.hadoop.fs.LocatedFileStatus] = {
    val it = fs.listFiles(new Path(path(table)), true)
    val buf = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
    while (it.hasNext) {
      val s = it.next()
      if (s.getPath.getName.endsWith(".parquet")) buf += s
    }
    buf.result()
  }

  /** Table stats — rows AND bytes from parquet footers / file listings
    * only, no data scan (`postgres_manager.py:509-535` sizes,
    * `:923-931` estimated counts — the reference also reads catalog
    * stats rather than counting rows). Footer reads are metadata-sized;
    * at cluster scale this is one small RPC per file, not a table scan.
    */
  def tableStats(table: String): TableStats = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val files = dataFiles(table)
    val rows = files.map { s =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(s.getPath, conf))
      try r.getRecordCount finally r.close()
    }.sum
    TableStats(table, rows, files.map(_.getLen).sum, files.size)
  }

  /** Compaction — the VACUUM/CLUSTER analogue (`postgres_manager.py:
    * 634-654`, SURVEY §2.12): rewrite to `targetFiles` output files.
    * At cluster scale this is a per-partition rewrite sized by
    * `maxPartitionBytes`, not a global repartition.
    */
  def compact(table: String, targetFiles: Int): Unit = {
    val parts = readMeta(table).map(_.partitionBy).getOrElse(Nil)
    val tmp = new Path(path(table) + "__compact")
    val df = read(table).repartition(targetFiles)
    val w = df.write.mode(SaveMode.Overwrite)
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w)
      .parquet(tmp.toString)
    val cur = new Path(path(table))
    fs.delete(cur, true)
    if (!fs.rename(tmp, cur))
      sys.error(s"compact: rename $tmp -> $cur failed")
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

  /** All table names in this warehouse (directories under location). */
  def listTables(): Seq[String] = {
    val root = new Path(location)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
      .toSeq.sorted
  }

  /** Backup analogue (`create_backup`, `postgres_manager.py:657-675`):
    * export every table to parquet under `targetDir` (the embedded-
    * engine replacement for pg_dump noted in SURVEY §2.1 S16).
    */
  def exportAll(targetDir: String): Seq[String] =
    listTables().map { t =>
      read(t).write.mode(SaveMode.Overwrite).parquet(s"$targetDir/$t")
      t
    }

  // --- tiny properties sidecar for table metadata (keys, partitioning) ---

  final case class TableMeta(partitionBy: Seq[String], uniqueKeys: Seq[String])

  private def metaPath(table: String) = s"$location/_meta_$table.properties"

  def writeMeta(table: String, partitionBy: Seq[String],
      uniqueKeys: Seq[String]): Unit = {
    val props = new java.util.Properties()
    props.setProperty("partitionBy", partitionBy.mkString(","))
    props.setProperty("uniqueKeys", uniqueKeys.mkString(","))
    val out = fs.create(new Path(metaPath(table)), true)
    try props.store(out, null) finally out.close()
  }

  def readMeta(table: String): Option[TableMeta] = {
    val p = new Path(metaPath(table))
    if (!fs.exists(p)) None
    else {
      val props = new java.util.Properties()
      val in = fs.open(p)
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
