package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage/task census for the bench suite — the
  * scheduling-floor attribution tool (guide §1: decide whether a query's
  * wall is compute or per-job overhead before touching it). Jobs/stages
  * are near-deterministic per query (AQE may add a stage), so unlike the
  * noisy wall clock they are comparable across runs and rounds.
  *
  * Usage: `sbt "runMain graft.tools.ProfileJobs [sfDir]"` with the bench
  * env knobs (SPARK_GRAFT_CPUS, SPARK_GRAFT_ONLY).
  */
object ProfileJobs {
  private final class Census extends SparkListener {
    val jobs = new AtomicLong
    val stages = new AtomicLong
    val tasks = new AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      tasks.incrementAndGet()
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val census = new Census
    spark.sparkContext.addSparkListener(census)
    graft.Tables.names.foreach { n =>
      try graft.Tables.t(spark, dir, n).count()
      catch { case _: Throwable => }
    }
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    println(f"${"query"}%-34s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"wall_s"}%7s")
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        // warm run: codegen + JIT, exactly like Bench's run 1
        try fn(spark, dir).queryExecution.toRdd.count()
        catch { case _: Throwable => }
        org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
        census.reset()
        val t0 = System.nanoTime()
        val ok = try { fn(spark, dir).queryExecution.toRdd.count(); true }
          catch { case _: Throwable => false }
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
        val r = (name, census.jobs.get, census.stages.get, census.tasks.get,
          wall, ok)
        println(f"${r._1}%-34s ${r._2}%5d ${r._3}%6d ${r._4}%6d ${r._5}%7.3f${if (ok) "" else "  FAILED"}")
        r
      }
    val csv = rows.map(r => s"${r._1},${r._2},${r._3},${r._4},${r._5}")
      .mkString("query,jobs,stages,tasks,wall_s\n", "\n", "\n")
    java.nio.file.Files.write(java.nio.file.Paths.get("profile_jobs.csv"),
      csv.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
