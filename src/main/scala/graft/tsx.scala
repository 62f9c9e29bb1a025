package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Timestamp-type normalization.
  *
  * The testdata parquet stores event timestamps as TIMESTAMP_NTZ
  * (`isAdjustedToUTC=0`), while Spark's epoch functions (`unix_micros`,
  * `unix_timestamp`) accept only the session-local (LTZ) type and throw
  * `DATATYPE_MISMATCH` on NTZ input. Every session in this project pins
  * `spark.sql.session.timeZone=UTC`, so the NTZ→LTZ cast is deterministic
  * (naive wall-clock read as UTC — the same convention DuckDB's
  * `epoch_us` applies to a naive timestamp, keeping the oracle aligned)
  * and a no-op on columns that are already LTZ. All epoch conversions in
  * the engine route through here so a data-generation change in either
  * direction cannot re-introduce that failure class.
  */
object Tsx {

  /** Column as TIMESTAMP (LTZ); identity when already LTZ. */
  def ltz(c: Column): Column = c.cast(TimestampType)

  /** Epoch microseconds of an LTZ or NTZ timestamp column. */
  def micros(c: Column): Column = unix_micros(ltz(c))

  /** Epoch seconds (long, truncating) of an LTZ or NTZ timestamp column. */
  def seconds(c: Column): Column = unix_timestamp(ltz(c))
}
