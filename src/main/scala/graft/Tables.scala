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
    *
    * Handles are memoized per (session, dir, table): `spark.read.parquet`
    * reads footers for schema inference at creation, a fixed per-call tax
    * that 50 bench queries would otherwise pay 1-3× each. DataFrames are
    * immutable plans, so sharing one handle is safe.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, dir, name), { case (s, d, n) =>
      if (n == "events") {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s.read.parquet(s"$d/$n.parquet")
          .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      } else {
        s.read.parquet(s"$d/$n.parquet")
      }
    })

  /** Register every table as a temp view (for spark.sql-based queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
