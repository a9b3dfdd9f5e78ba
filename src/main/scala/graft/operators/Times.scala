package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Timestamp-flavor shims.
  *
  * Parquet timestamps arrive in three flavors depending on the writer:
  * TIMESTAMP(µs, adjustedToUTC) → Spark `TIMESTAMP`, TIMESTAMP(µs, local)
  * → Spark `TIMESTAMP_NTZ` (Spark 4 infers NTZ by default), and legacy
  * TIMESTAMP(NANOS) → `BIGINT` under `nanosAsLong`. Operators that do
  * exact epoch-µs arithmetic (session gaps, band buckets) must accept all
  * of them: `unix_micros` alone rejects NTZ outright.
  */
object Times {

  /** Exact epoch microseconds from either `TIMESTAMP` or `TIMESTAMP_NTZ`.
    *
    * The NTZ→TIMESTAMP cast interprets the wall-clock in the session time
    * zone (graft sessions pin UTC, matching DuckDB's `epoch_us(CAST(ts AS
    * TIMESTAMP))` on the same file); for an already-zoned TIMESTAMP the
    * cast is a no-op Catalyst folds away, so the common path costs
    * nothing. Differences/gaps are additionally zone-invariant: a constant
    * zone offset cancels in `us - lag(us)`.
    */
  def epochMicros(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Parse a "<n> <unit>" duration (seconds/minutes/hours/days) into
    * exact microseconds — the shared width/embargo parser for the
    * banded range join and the temporal split. */
  def parseDurationUs(width: String): Long = {
    val parts = width.trim.split("\\s+")
    require(parts.length == 2, s"duration must be '<n> <unit>', got '$width'")
    val n = parts(0).toLong
    parts(1).toLowerCase match {
      case "second" | "seconds" => n * 1000000L
      case "minute" | "minutes" => n * 60L * 1000000L
      case "hour" | "hours" => n * 3600L * 1000000L
      case "day" | "days" => n * 86400L * 1000000L
      case u => throw new IllegalArgumentException(s"unsupported unit $u")
    }
  }
}
