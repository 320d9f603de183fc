package graft.schema

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.profile.ColumnProfile

/** Type-decision assertions mirroring the reference's inference rules
  * (`type_inference_engine.py:34-133`) and name sanitization
  * (`schema_analyzer.py:68-72, 174-187`).
  */
class TypeInferenceSpec extends AnyFunSuite {

  private def prof(
      name: String = "c",
      dt: DataType = DoubleType,
      count: Long = 10,
      nulls: Long = 0,
      minN: Option[Double] = None,
      maxN: Option[Double] = None,
      integral: Boolean = false,
      decPlaces: Int = 0,
      maxLen: Int = 0) =
    ColumnProfile(name, dt, count, nulls, count, minN, maxN, integral,
      decPlaces, maxLen, Nil)

  test("name patterns win over data (lat/price/zip/email/phone)") {
    assert(TypeInference.infer(prof(name = "latitude")) === "NUMERIC(10,6)")
    assert(TypeInference.infer(prof(name = "Pickup_Lng")) === "NUMERIC(10,6)")
    assert(TypeInference.infer(prof(name = "total_price")) === "NUMERIC(15,2)")
    assert(TypeInference.infer(prof(name = "zip")) === "VARCHAR(10)")
    assert(TypeInference.infer(prof(name = "user_email")) === "VARCHAR(255)")
    assert(TypeInference.infer(prof(name = "phone")) === "VARCHAR(20)")
  }

  test("integer narrowing by observed min/max") {
    assert(TypeInference.infer(prof(dt = LongType, integral = true,
      minN = Some(-100), maxN = Some(32767))) === "SMALLINT")
    assert(TypeInference.infer(prof(dt = LongType, integral = true,
      minN = Some(-40000), maxN = Some(40000))) === "INTEGER")
    assert(TypeInference.infer(prof(dt = LongType, integral = true,
      minN = Some(0), maxN = Some(3e9))) === "BIGINT")
  }

  test("fractional numerics: decimal places drive NUMERIC vs DOUBLE") {
    assert(TypeInference.infer(prof(decPlaces = 4)) === "NUMERIC(12,6)")
    assert(TypeInference.infer(prof(decPlaces = 9)) === "DOUBLE PRECISION")
    // NOT integral yet 0 observed decimals = the string form went
    // scientific (≥1e7 doubles) and hid the fraction — INTEGER would
    // truncate; must stay floating
    assert(TypeInference.infer(prof(decPlaces = 0)) === "DOUBLE PRECISION")
    // price-named fractional stays NUMERIC(15,2) even with many places
    assert(TypeInference.infer(prof(name = "unit_cost", decPlaces = 9))
      === "NUMERIC(15,2)")
  }

  test("boolean / timestamp / string decisions") {
    assert(TypeInference.infer(prof(dt = BooleanType)) === "BOOLEAN")
    assert(TypeInference.infer(prof(dt = TimestampType))
      === "TIMESTAMP WITH TIME ZONE")
    assert(TypeInference.infer(prof(dt = TimestampNTZType)) === "TIMESTAMP")
    assert(TypeInference.infer(prof(dt = StringType, maxLen = 42))
      === "VARCHAR(42)")
    assert(TypeInference.infer(prof(dt = StringType, maxLen = 300)) === "TEXT")
    assert(TypeInference.infer(prof(dt = StringType, count = 0)) === "TEXT")
  }

  test("SQL type -> Spark type mapping") {
    assert(TypeInference.toSparkType("SMALLINT") === ShortType)
    assert(TypeInference.toSparkType("NUMERIC(15,2)") === DecimalType(15, 2))
    assert(TypeInference.toSparkType("TIMESTAMP") === TimestampNTZType)
    assert(TypeInference.toSparkType("TIMESTAMP WITH TIME ZONE") === TimestampType)
    assert(TypeInference.toSparkType("VARCHAR(10)") === StringType)
    assert(TypeInference.toSparkType("DOUBLE PRECISION") === DoubleType)
  }

  test("column name sanitization matches reference verbatim") {
    assert(Names.cleanColumnName("Meter Reading (kWh)") === "meter_reading__kwh_")
    assert(Names.cleanColumnName("2024_value") === "col_2024_value")
    assert(Names.cleanColumnName("simple") === "simple")
  }

  test("table name derivation from file path") {
    assert(Names.deriveTableName("/data/Electricity-2016.csv") === "electricity_2016")
    assert(Names.deriveTableName("2016_meters.parquet") === "tbl_2016_meters")
  }

  test("DDL emission shape") {
    val ddl = DdlGenerator.createTable("raw",
      Seq(
        DdlGenerator.ColumnDef("timestamp", "TIMESTAMP", nullable = false),
        DdlGenerator.ColumnDef("building_id", "VARCHAR(32)", nullable = false),
        DdlGenerator.ColumnDef("meter_reading", "NUMERIC(12,6)", nullable = true)),
      primaryKey = Seq("timestamp", "building_id"))
    assert(ddl.contains("""CREATE TABLE IF NOT EXISTS "raw" ("""))
    assert(ddl.contains(""""timestamp" TIMESTAMP NOT NULL"""))
    assert(ddl.contains(""""meter_reading" NUMERIC(12,6)"""))
    assert(ddl.contains("""PRIMARY KEY ("timestamp", "building_id")"""))
    assert(ddl.endsWith(");"))
  }
}
