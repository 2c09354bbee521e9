package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Bridge

/** Runtime-Bloom-filter semi-join pre-reduction (guide §3.2 /
  * SPARK-32268): drop definitely-non-matching rows from the BIG side of
  * an equi-join BEFORE its exchange, using a Bloom filter built over the
  * small side's join keys.
  *
  * This is byte-for-byte the construct Spark's own `InjectRuntimeFilter`
  * rule creates — `might_contain(<scalar subquery: bloom_filter_agg(
  * xxhash64(key))>, xxhash64(bigKey))` — built explicitly because the
  * rule's size thresholds are tuned for 10 GB+ scans (
  * `runtime.bloomFilter.applicationSideScanSizeThreshold`): at the bench
  * decades the scan sits under the threshold while the join is still the
  * query's dominant exchange, and at 100 TB an explicit filter keeps the
  * plan independent of estimate quality. Correctness is unconditional: a
  * Bloom filter has no false negatives, so only rows that cannot match
  * any small-side key are dropped; false positives merely shuffle a few
  * extra rows into the join that already discards them.
  *
  * The filter is built by a scalar subquery (one extra aggregation job
  * over the SMALL side), never collected to the driver by the caller;
  * Spark sizes it at ~8 bits/item (~2-3% fpp) from `expectedItems`,
  * capped by `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (8 MB
  * default).
  */
object BloomPrefilter {

  /** `big` minus the rows whose `bigKey` is definitely absent from
    * `keys`' `key` column. `expectedItems` must be >= the true distinct
    * key count for the advertised fpp (a low estimate degrades fpp, not
    * correctness).
    */
  def bloomPrefilter(big: DataFrame, bigKey: Column,
                     keys: DataFrame, key: Column,
                     expectedItems: Long): DataFrame = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(Bridge.expression(key))),
      math.max(expectedItems, 1L)).toAggregateExpression()
    val bloomDf = keys.agg(Bridge.column(agg).as("bf"))
    val sub = ScalarSubquery(bloomDf.queryExecution.analyzed)
    big.filter(Bridge.column(BloomFilterMightContain(
      sub, new XxHash64(Seq(Bridge.expression(bigKey))))))
  }
}
