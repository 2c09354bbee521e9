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
    * `events.ts` normalizes to a session-TZ TIMESTAMP whatever the file
    * carries — generator vintages differ: TIMESTAMP(NANOS) (Spark 4
    * rejects it by default; read as long under `nanosAsLong` and
    * floor-divide to micros, the same ns→µs truncation DuckDB applies)
    * vs plain TIMESTAMP(MICROS) with no UTC flag (arrives as
    * TIMESTAMP_NTZ; cast is value-identical under the UTC session TZ,
    * and DuckDB reads the same file naively — oracles agree either way).
    * The branch is on the INFERRED type, so scaled rehearsal dirs built
    * from an older vintage keep working next to the current testdata.
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
        val raw = s.read.parquet(s"$d/$n.parquet")
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            raw.withColumn("ts",
              org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
          case org.apache.spark.sql.types.TimestampNTZType =>
            raw.withColumn("ts", raw("ts").cast("timestamp"))
          case _ => raw
        }
      } else {
        s.read.parquet(s"$d/$n.parquet")
      }
    })

  /** Register every table as a temp view (for spark.sql-based queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
