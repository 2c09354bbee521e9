package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Scratch profiler for q54 stage costs (Test/runMain graft.ProfileQ54):
  * how much of the query is the minhash pair generation vs the label
  * propagation rounds, and how many rounds the bench corpus needs.
  */
object ProfileQ54 {
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
    t(spark, dir, "documents").count() // warm handles
    // steady state: run everything thrice, report the later rounds
    for (round <- 1 to 3) {
      val pairs = graft.operators.Dedup
        .minhashPairs(t(spark, dir, "documents"), "doc_id", "text",
          shingleK = 5, threshold = 0.5)
        .select(col("doc_a"), col("doc_b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"r$round pairs")(println("pairs: " + pairs.count()))
      // count CC rounds: chain depth visible via per-round keeper changes
      val kp = time(s"r$round keepers")(graft.operators.Dedup.keepers(pairs))
      println("components: " + kp.select("keeper").distinct().count())
      val ks = time(s"r$round keepersStar")(graft.operators.Dedup.keepersStar(pairs))
      ks.unpersist(); kp.unpersist(); pairs.unpersist()
      time(s"r$round full q54")(
        graft.queries.Pipeline.all.find(_.name == "q54_dedup_groups").get
          .fn(spark, dir).count())
    }
    spark.stop()
  }
}
