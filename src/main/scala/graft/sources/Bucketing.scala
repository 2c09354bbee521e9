package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed managed tables (SURVEY.md §2.E3): pre-shuffle the expensive
  * fact-fact join keys ONCE at write time so every later join/aggregation
  * on those keys is exchange-free. At 100 TB this converts the dominant
  * repeated shuffle (e.g. lineitem⋈orders on orderkey, run by every
  * report) into a one-time layout cost — the same trade the reference's
  * sled engine makes by keeping rows clustered by primary key
  * (/root/reference/src/store/engine/sled.rs:1).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. Bucket count
    * should be sized so one bucket ≈ one executor-core's worth of data at
    * the target scale (at 100 TB / 1000 executors: O(10⁴) buckets).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back; joins between tables bucketed on the
    * same keys with the same count plan with no Exchange on either side.
    */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
