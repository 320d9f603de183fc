package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.unix_micros
import org.apache.spark.sql.types.TimestampType

/** NTZ-tolerant time-column helpers.
  *
  * Parquet written with naive microsecond timestamps
  * (`isAdjustedToUTC=false` — what pandas/pyarrow and DuckDB emit by
  * default) surfaces as `TIMESTAMP_NTZ` under Spark 4's
  * `inferTimestampNTZ`, and `unix_micros` rejects NTZ input at analysis
  * time (`DATATYPE_MISMATCH`). The graft session is pinned to UTC, so
  * casting NTZ → `TimestampType` is lossless and matches how DuckDB
  * reads the same naive stamps; on an already-`TimestampType` column
  * the cast is a no-op Catalyst removes (`SimplifyCasts`), so codegen
  * is unaffected.
  */
object TimeCols {

  /** Epoch microseconds of a timestamp column, tolerant of
    * `TIMESTAMP_NTZ` input. Use this instead of bare `unix_micros`
    * anywhere the column may come straight off a parquet scan.
    */
  def epochUs(c: Column): Column = unix_micros(c.cast(TimestampType))
}
