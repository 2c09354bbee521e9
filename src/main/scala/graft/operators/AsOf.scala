package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — an operator Spark lacks natively (pandas
  * merge_asof / DuckDB ASOF JOIN / kdb aj). Each left row picks up the
  * latest right row with right.ts <= left.ts for the same key.
  *
  * Spark-first composition instead of a custom physical operator: tag the
  * two inputs, union them, and carry the right payload forward with
  * last(_, ignoreNulls) over a (key, ts)-ordered window. That is ONE
  * shuffle on the key and a linear per-partition sweep — the plan shape
  * survives 100 TB, unlike the naive range-join (left ⋈ right on key AND
  * right.ts <= left.ts, then argmax), which explodes to |left|×|matching
  * right| intermediate rows before pruning.
  */
object AsOf {

  /** @param keys   equi-join key columns (present in both inputs)
    * @param leftTs / rightTs event-time columns (inclusive: a right row
    *               at exactly left.ts matches)
    * Result: every left row (all its columns), plus the right payload
    * columns (everything except keys and rightTs), null when no prior
    * right row exists. Right rows should be unique per (keys, ts) — ties
    * there make any as-of semantics ambiguous; pre-aggregate if needed.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    val payloadType = StructType(right.schema.fields.filter(f => payloadCols.contains(f.name)))
    val leftStructType = StructType(left.schema.fields)

    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"),
        struct(payloadCols.map(col).toSeq: _*).as("_r"),
        lit(null).cast(leftStructType).as("_l"),
        lit(0).as("_side")): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ts"),
        lit(null).cast(payloadType).as("_r"),
        struct(left.columns.map(col).toSeq: _*).as("_l"),
        lit(1).as("_side")): _*)

    // right rows sort before left rows at equal ts => inclusive match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rTagged.unionByName(lTagged)
      .withColumn("_carried", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_l.*") +: payloadCols.map(c => col(s"_carried.`$c`").as(c)): _*)
  }
}
