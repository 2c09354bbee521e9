package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers shared by the query suite.
  *
  * The driver hash-compares our results against DuckDB on the same
  * parquet. Double summation is accumulation-order dependent, so any
  * aggregate over doubles goes through an exact DECIMAL(18,6) cast first:
  * the per-row double expression is IEEE-deterministic, the source data
  * carries <= 2 decimal digits (so products carry <= 6), the decimal sum
  * is exact and order-independent, and the final decimal->double cast is
  * correctly rounded in both engines.
  */
object Q {
  val D: DecimalType = DecimalType(18, 6)

  /** Order-independent, engine-exact sum of a money-ish double expr. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Exact average: exact decimal sum divided by count, in doubles. */
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(lit(1))

  /** SQL spellings of the same (DuckDB side must match bit-for-bit). */
  def sqlDsum(e: String): String = s"CAST(SUM(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE)"
  def sqlDavg(e: String): String = s"CAST(SUM(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)"
}
