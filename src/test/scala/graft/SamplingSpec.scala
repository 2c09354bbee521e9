package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.GraftFunctions._
import graft.operators.Sampling

/** D29 deterministic stratified sampling (SURVEY.md §2) — q82 gates the
  * DuckDB replay; these pin determinism and the bounded-aggregate
  * semantics against the window formulation.
  */
class SamplingSpec extends AnyFunSuite {
  import SparkFixture._

  private def docs = Tables.t(spark, sfDir, "documents")

  test("D29 equals the per-stratum window formulation") {
    val got = Sampling.stratifiedSample(docs, "lang", "doc_id", "text", n = 7)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    val ref = docs
      .select(col("lang"), col("doc_id"), md5Prefix48(col("text")).as("h"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7)
      .select(col("lang"), col("rn"), col("doc_id"), col("h"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == ref)
  }

  test("D29 sample is invariant under input partitioning and row order") {
    val base = Sampling.stratifiedSample(docs, "lang", "doc_id", "text", n = 5)
      .collect().map(_.toSeq).toSet
    val shuffled = Sampling.stratifiedSample(
      docs.repartition(7, col("doc_id")).sortWithinPartitions(desc("n_chars")),
      "lang", "doc_id", "text", n = 5)
      .collect().map(_.toSeq).toSet
    assert(base == shuffled)
  }

  test("D29 exactly n per stratum (or the whole stratum when smaller)") {
    val counts = Sampling.stratifiedSample(docs, "lang", "doc_id", "text", n = 9)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val strata = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == strata.keySet)
    counts.foreach { case (lang, c) => assert(c == math.min(9L, strata(lang))) }
  }
}
