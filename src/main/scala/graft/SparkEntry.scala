package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Qdef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def suites: Seq[Qdef] =
    graft.queries.Relational.all ++ graft.queries.Pipeline.all ++
      graft.queries.Curation.all ++ graft.queries.Streaming.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    suites.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    suites.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Oracles that need the DATA, not just SQL text (round 14): q06b's
    * `approx_count_distinct` is not SQL-replayable (xxHash64 + register
    * banks), so its oracle is the independent plain-Scala HLL++ replay
    * (graft.functions.HllReplay — the published algorithm, never Spark's
    * sketch classes). Verify computes the per-group estimates through
    * the replay — per-partition register arrays merged by register max,
    * the mergeable-sketch distribution, so no raw values reach the
    * driver — and emits them as literal SQL for the DuckDB compare. A
    * q06b hash match then certifies Spark's sketch against the paper.
    */
  def dynamicOracleSql(spark: SparkSession, dir: String): Map[String, String] = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val perFlag = Tables.t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"))
      .as[(String, Long)].rdd
      .mapPartitions { it =>
        val acc = scala.collection.mutable.Map.empty[String, graft.functions.HllReplay.Sketch]
        it.foreach { case (f, k) =>
          acc.getOrElseUpdate(f, new graft.functions.HllReplay.Sketch()).add(k)
        }
        acc.iterator
      }
      .reduceByKey(_.merge(_))
      .collect()
      .map { case (f, s) => (f, s.estimate) }
      .sortBy(_._1)
    val union = perFlag.map { case (f, e) =>
      s"SELECT '$f' AS l_returnflag, CAST($e AS BIGINT) AS approx_orders"
    }.mkString(" UNION ALL ")
    Map("q06b_approx_distinct" -> s"SELECT * FROM ($union) ORDER BY l_returnflag")
  }
}
