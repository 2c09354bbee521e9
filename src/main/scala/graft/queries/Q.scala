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

  /** Order-independent, engine-exact sum of a money-ish double expr.
    *
    * TWO-LIMB form (round-7 sf50 rehearsal catch): the original
    * single-BIGINT scaling — `(SUM(decimal) * 10^6)::BIGINT` — overflows
    * 2^63 once the scaled sum passes 9.2e18 (measured: q01's
    * sum_base_price at 300M rows is 1.87e19 scaled; the count()-action
    * benches never executed the cast, so the fifth decade under the
    * honest action was the first to hit it). Fix: each ROW's value is
    * scaled to an exact BIGINT (row magnitudes ≤ ~1e11, far below 2^63)
    * and split at 10^9 into non-negative `lo = pmod(s, 10^9)` and exact
    * `hi = (s - lo) / 10^9` (floor semantics, valid for negative rows
    * too). Both limb SUMS stay exact as BIGINTs to ~6e9 rows (sum_lo <
    * n·10^9; sum_hi ≤ n·10^2) — but their DOUBLE casts round once a
    * limb sum passes 2^53 (~9e6 rows for sum_lo), identically in both
    * engines, so past that point the contract is bit-equality, not
    * exactness. Recombination
    * `(hi_sum·1e9 + lo_sum) / 1e6` runs in DOUBLE — three IEEE ops on
    * identical inputs, so both engines round identically; the result is
    * within 2 ulps of the exact sum, the same class as the original
    * conversion chain, and bit-equal across engines, which is the
    * actual contract.
    */
  def dsum(c: Column): Column = dsumMerge(dsumHi(c), dsumLo(c))

  /** The per-row exact scaled BIGINT of a money-ish double expr. */
  private def dscaled(c: Column): Column =
    (c.cast(D) * lit(1000000)).cast("long")

  /** Partial-aggregation faces of dsum: the two limb SUMS as exact
    * BIGINTs. A two-level rollup — dsumHi/dsumLo at a fine grain, then
    * dsumMerge(sum-of-his, sum-of-los) at the final grain — is
    * bit-identical to a one-level dsum, because long addition is exact
    * and associative and the one double recombination happens only at
    * the end, on identical totals. This is what lets a composite
    * pre-aggregate revenue below a join (q28) without touching the
    * engine-exactness contract.
    */
  def dsumHi(c: Column): Column = {
    val s = dscaled(c)
    val lo = pmod(s, lit(1000000000L))
    // (s - lo) is an exact multiple of 10^9 with |s| ≤ ~1e11, so the
    // double division is exact and the long cast recovers the exact
    // integer limb (Spark's `/` on longs is double division; `div`
    // would need expr()) — the limb SUM must be integral or it would
    // be order-dependent
    sum(((s - lo) / lit(1000000000L)).cast("long"))
  }
  def dsumLo(c: Column): Column = sum(pmod(dscaled(c), lit(1000000000L)))

  /** Final recombination over already-aggregated limb columns. */
  def dsumMerge(hiSum: Column, loSum: Column): Column =
    (hiSum.cast("double") * lit(1.0e9) + loSum.cast("double")) /
      lit(1000000.0)

  /** Exact average: the engine-exact dsum divided by count, in doubles. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** SQL spellings of the same — parsed by BOTH DuckDB (oracles) and
    * Spark SQL (q17 embeds it), so only the common dialect is used:
    * `%` then `+10^9 %` reproduces pmod's non-negative remainder; the
    * subtraction makes the dividend an exact ≤1e11 multiple of 10^9,
    * so the engines' int/int `/` (double division in both) is exact
    * and the BIGINT cast recovers the integer limb.
    */
  def sqlDsum(e: String): String = {
    val s = s"CAST(CAST(($e) AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
    val lo = s"((($s) % 1000000000) + 1000000000) % 1000000000"
    val hi = s"CAST((($s) - ($lo)) / 1000000000 AS BIGINT)"
    s"(CAST(SUM($hi) AS DOUBLE) * 1.0e9 + CAST(SUM($lo) AS DOUBLE)) / 1000000.0"
  }
  def sqlDavg(e: String): String = s"${sqlDsum(e)} / COUNT(*)"
}
