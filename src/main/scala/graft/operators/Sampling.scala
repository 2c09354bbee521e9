package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Deterministic stratified sampling (SURVEY.md §2.D29): exactly n rows
  * per stratum, chosen by content-hash order — the eval-set / human-
  * inspection / per-language-calibration sampler every curation
  * pipeline runs. Complements q60's RATE-based temperature mixing
  * (keep-probability per source): this is the fixed-COUNT face, and
  * like q60 it uses no RNG — the 48-bit md5 prefix of the row content
  * is a uniform deterministic order, so the sample is reproducible
  * across runs, engines, and partitionings, and stable under
  * re-ingestion (keyed on content, not on row order or id).
  *
  * Scale shape: ONE stratum-keyed aggregation through the TopKPairs
  * partial aggregate — map-side partials carry ≤ n rows per stratum
  * per partition into the exchange, so the shuffle is
  * O(partitions × strata × n) at any corpus size; never a per-stratum
  * window sort over all rows (the q35 top-k rule applied to sampling).
  */
object Sampling {

  /** Exactly `n` rows per stratum by (md5₄₈(content), id) order.
    * Output: (stratum, rn 1..n, id, h).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       contentCol: String, n: Int): DataFrame =
    df.groupBy(col(stratumCol))
      .agg(topKPairs((-md5Prefix48(col(contentCol))).cast("double"),
        col(idCol), n).as("top"))
      .select(col(stratumCol), posexplode(col("top")))
      .select(col(stratumCol), (col("pos") + 1).cast("int").as("rn"),
        col("col.id").as(idCol),
        (-col("col.score")).cast("long").as("h"))
}
