package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Batch plan dumper for the optimization-round evidence files:
  * `runMain graft.tools.DumpPlans <sfDir> <outDir> <suffix> <q1,q2,...>`
  * writes `<outDir>/<query>_<suffix>.txt` with the `explain("formatted")`
  * output of each named query — one JVM for the whole batch instead of
  * one `graft.Explain` run per query.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val Array(dir, outDir, suffix, qcsv) = args.take(4)
    val names = qcsv.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
