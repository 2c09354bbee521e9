package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.GraftFunctions.textShingles

/** Stage profiler for q73 (same spirit as ProfileQ31/ProfileQ54): where
  * does a scan-shaped gram query actually spend its time?
  *
  * Finding on record (sf0.1, 5000 docs, ~52 trigrams/doc): the composed
  * shingle expression — array_distinct(transform(sequence, i =>
  * concat_ws(slice))) — costs ~260 µs/doc, dominated by array_distinct's
  * O(k²) pairwise UTF8String equality plus per-gram slice/concat
  * allocation; the whole q73 ran 1.63 s with explode alone at 1.4 s.
  * The native TextShinglesE kernel (zero-copy byte-slice shingles,
  * LinkedHashSet dedup) is value-identical and drops q73 to 0.32 s.
  * Column pruning makes the naive "time the projection" probe lie
  * (count() prunes the unused gram array, measuring only the scan), so
  * the probes below explode — forcing the array to materialize.
  */
object ProfileQ73 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val toks = split(col("text"), " ")
    val composed = array_distinct(transform(sequence(lit(0), size(toks) - lit(3)),
      i => concat_ws(" ", slice(toks, i + lit(1), lit(3)))))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  ($n rows)")
    }
    for (round <- 1 to 3) {
      println(s"--- round $round")
      time("scan only") {
        t(spark, dir, "documents").count()
      }
      time("explode composed grams") {
        t(spark, dir, "documents").filter(size(toks) >= 3)
          .select(col("doc_id"), explode(composed).as("gram")).count()
      }
      time("explode native kernel") {
        t(spark, dir, "documents")
          .select(col("doc_id"), explode(textShingles(col("text"), 3)).as("gram"))
          .count()
      }
      time("full q73") {
        graft.SparkEntry.queries("q73_common_grams")(spark, dir).count()
      }
    }
    spark.stop()
  }
}
