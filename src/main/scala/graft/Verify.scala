package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=q71_x,q72_y: dump (and emit oracle SQL for) a
    // subset — the rehearsal-gate analogue of Bench's knob, for gating
    // new queries at a big derived SF without re-running the whole
    // suite there. The driver's full gate always runs unfiltered.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // static oracles + the data-dependent ones (q06b's independent
    // HLL++ replay — computed HERE, per sfDir, and emitted as literal
    // SQL; if the replay itself fails the static set still ships, and
    // q06b stays a loud rows-only row rather than sinking the run)
    val dynamic =
      // the replay scans lineitem — skip it entirely when a subset run
      // excludes its query (the SPARK_GRAFT_ONLY knob exists to avoid
      // whole-suite cost at rehearsal SFs)
      if (!only.forall(_.contains("q06b_approx_distinct")))
        Map.empty[String, String]
      else try SparkEntry.dynamicOracleSql(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] dynamic oracle failed: ${e.getMessage}")
        Map.empty[String, String]
      }
    val json = (SparkEntry.oracleSql ++ dynamic)
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // A subset run writes oracle_sql.subset.json: overwriting the full
    // oracle_sql.json in a reused outDir (with earlier full-run parquet
    // dumps still present) would make a compare driver silently skip
    // every other query's oracle. The full, unfiltered run keeps the
    // canonical filename the driver reads.
    val jsonName = if (only.isDefined) "oracle_sql.subset.json" else "oracle_sql.json"
    Files.writeString(Paths.get(s"$outDir/$jsonName"), json)
    spark.stop()
  }
}
