package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range (interval-containment) join — the scale path for
  * "point falls inside interval" joins that Spark would otherwise plan as
  * a broadcast/cartesian theta join with a post-filter (|points| ×
  * |intervals per key| intermediate rows).
  *
  * Intervals are exploded onto a fixed-width bucket grid; points join
  * their single bucket with an equi-join on (keys, bucket) and the exact
  * containment predicate filters inside the bucket. Cost is linear in
  * |points| + |intervals| × avg-buckets-per-interval, and the join is a
  * plain shuffle/broadcast hash join Catalyst can optimize. Pick
  * `bucketWidth` ≈ typical interval length so intervals replicate into
  * O(1) buckets.
  */
object RangeJoin {

  /** Inner containment join: rows of `points` (all columns) + payload of
    * the containing interval. `pointCol`, `startCol`, `endCol` must be
    * LONG-typed (e.g. unix micros); containment is inclusive on both
    * bounds. Overlapping intervals yield one row per containing interval.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pointCol: String,
                      startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // integer DIV, not double division: a double quotient cast to long can
    // round across a bucket boundary for large epoch-micros values
    val expanded = intervals.withColumn("_bucket",
      explode(sequence(
        expr(s"`$startCol` DIV $bucketWidth"),
        expr(s"`$endCol` DIV $bucketWidth"))))
    points
      .withColumn("_bucket", expr(s"`$pointCol` DIV $bucketWidth"))
      .join(expanded, keys :+ "_bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bucket")
  }
}
