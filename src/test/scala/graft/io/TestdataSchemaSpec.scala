package graft.io

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Contract spec for the driver-generated test corpus: asserts the
  * ENGINE-VISIBLE schema of every table after `Tables.table` reads it.
  *
  * Why this exists: the round-5 testdata regen changed the parquet
  * timestamp annotation (ns, UTC-adjusted → µs, naive) and six queries
  * crashed in six query-shaped places. Any future driver-side drift —
  * a new annotation, a widened decimal, a renamed column — should fail
  * HERE first, naming the exact drifted column.
  *
  * Timestamps must surface as `TimestampType` (never NTZ, never raw
  * long) regardless of how the files annotate them — that is
  * `Tables.readParquet`'s job (ns rebuild + NTZ cast + SparkEnv's
  * inferTimestampNTZ=false).
  */
class TestdataSchemaSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  // the other scale factors the driver exercises (smoke at sf0.001,
  // bench at sf0.1) must read with the same contract — a regen that
  // drifts only one SF should fail here too, naming the directory
  private val allSfDirs =
    Seq("/root/testdata/sf0.001", sfDir, "/root/testdata/sf0.1")

  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> Map("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  test("every test table reads with the contracted engine-visible schema") {
    val drifts = for {
      name <- Tables.testTables
      schema = Tables.table(spark, sfDir, name).schema
      exp = expected(name)
      drift <- {
        val extra = schema.fieldNames.toSet -- exp.keySet
        val missing = exp.keySet -- schema.fieldNames.toSet
        val wrongType = schema.fields.collect {
          case f if exp.get(f.name).exists(t => !sameType(t, f.dataType)) =>
            s"$name.${f.name}: expected ${exp(f.name).simpleString}, " +
              s"engine sees ${f.dataType.simpleString}"
        }
        extra.map(c => s"$name.$c: unexpected new column") ++
          missing.map(c => s"$name.$c: column missing from testdata") ++
          wrongType
      }
    } yield drift
    assert(drifts.isEmpty,
      s"\nTESTDATA SCHEMA DRIFT (fix Tables.readParquet or update the " +
        s"contract):\n  ${drifts.mkString("\n  ")}")
  }

  test("no timestamp column ever surfaces as NTZ or raw long — at any scale factor") {
    val bad = for {
      dir <- allSfDirs
      name <- Tables.testTables
      f <- Tables.table(spark, dir, name).schema.fields
      if f.dataType == TimestampNTZType ||
        (f.name.matches("ts|o_orderdate|l_shipdate") && f.dataType != TimestampType)
    } yield s"$dir/$name.${f.name}: ${f.dataType.simpleString}"
    assert(bad.isEmpty, s"un-normalized time columns: ${bad.mkString(", ")}")
  }

  test("sf0.001 and sf0.1 carry the same contracted schemas as sf0.01") {
    val drifts = for {
      dir <- allSfDirs if dir != sfDir
      name <- Tables.testTables
      f <- Tables.table(spark, dir, name).schema.fields
      if expected(name).get(f.name).exists(t => !sameType(t, f.dataType))
    } yield s"$dir/$name.${f.name}: engine sees ${f.dataType.simpleString}"
    assert(drifts.isEmpty, drifts.mkString("\n"))
  }

  // containsNull/nullable metadata is reader-version noise; compare shape
  private def sameType(a: DataType, b: DataType): Boolean = (a, b) match {
    case (ArrayType(x, _), ArrayType(y, _)) => sameType(x, y)
    case _ => a == b
  }
}
