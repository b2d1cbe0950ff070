package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Output normalization shared by every oracle-checked query so Spark and
  * DuckDB produce bit-identical values (SURVEY.md §7.4 "oracle parity
  * traps").
  *
  *   - Double sums are computed in DECIMAL(18,2): float summation is
  *     order-dependent in a distributed engine, decimal addition is exact
  *     and associative, and the final cast back to double is deterministic.
  *     SQL twin: `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
  *   - Averages are decimal-sum / count (one deterministic double divide),
  *     not `avg()`. SQL twin: `... / COUNT(*)`.
  *   - Timestamps are emitted as `yyyy-MM-dd` (or epoch millis) strings —
  *     never raw, to dodge ms/us/ns physical-type mismatches.
  *     SQL twin: `strftime(x, '%Y-%m-%d')`.
  */
object Norm {
  /** Exact decimal sum of a double column, emitted as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Deterministic mean: exact decimal sum, one double division. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Timestamp → 'yyyy-MM-dd' string. */
  def dateStr(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Timestamp → epoch milliseconds (matches DuckDB `epoch_ms(x)`). */
  def epochMs(c: Column): Column = (unix_micros(c) / 1000L).cast("long")
}
