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
}
