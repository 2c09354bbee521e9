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
  * carries <= 2 decimal digits (so products carry <= 6), and the decimal
  * sum is exact and order-independent.
  *
  * The final decimal->double conversion is NOT safe to leave to the
  * engines: DuckDB converts int128-scaled decimals via a floating
  * multiply by 10^-scale (two roundings), Spark via BigDecimal
  * (one correct rounding) — at sf5 (30M-row sums, 17 significant
  * digits) the two differ by 1 ulp and the bit-exact gate fails. So
  * both sides route the conversion through the SAME exact integer: the
  * decimal sum times 10^6 is integral and < 2^63, a BIGINT cast is
  * exact, BIGINT->double is correctly rounded from identical inputs on
  * both engines, and the final division by the exactly-representable
  * 10^6 is a single correctly-rounded op on identical doubles.
  */
object Q {
  val D: DecimalType = DecimalType(18, 6)

  /** Order-independent, engine-exact sum of a money-ish double expr. */
  def dsum(c: Column): Column =
    (sum(c.cast(D)) * lit(1000000)).cast("long").cast("double") / lit(1000000.0)

  /** Exact average: the engine-exact dsum divided by count, in doubles. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** SQL spellings of the same (DuckDB side must match bit-for-bit). */
  def sqlDsum(e: String): String =
    s"CAST(CAST(SUM(CAST(($e) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0"
  def sqlDavg(e: String): String = s"${sqlDsum(e)} / COUNT(*)"
}
