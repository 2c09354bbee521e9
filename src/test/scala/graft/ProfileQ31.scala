package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._
import graft.Tables.t

/** Scratch profiler for q31 stage costs (Test/runMain graft.ProfileQ31). */
object ProfileQ31 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    // warm
    t(spark, dir, "documents").count()
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), textShingles(col("text"), 5).as("sh"))
      .filter(size(col("sh")) > 0)
    time("scan+shingles")(docs.count())
    time("sig+bands")(docs.select(col("doc_id"),
      explode(minhashBandKeys(col("sh"))).as("bk")).count())
    val bands = docs.select(col("doc_id"),
      explode(minhashBandKeys(col("sh"))).as("bk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bands.count()
    val cand = bands.as("a").join(bands.as("b"),
      col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("band self-join + distinct")(println("candidates: " + cand.count()))
    time("full q31")(
      graft.queries.Pipeline.all.find(_.name == "q31_dedup_minhash").get
        .fn(spark, dir).count())
    spark.stop()
  }
}
