package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables.
  *
  * Mirrors the reference's table surface (ebike registers each table of a
  * schema with DataFusion before planning a query —
  * /root/reference/src/core/execution.rs:1); here the scan is a native
  * Spark parquet source so Catalyst gets column pruning + predicate
  * pushdown for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table from an sf directory.
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    * rejects by default; read it as a long and floor-divide to micros —
    * exactly the ns→µs truncation DuckDB applies, so oracles agree.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Register every table as a temp view (for spark.sql-based queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
