package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.GraftFunctions

/** Stage profiler for the q06 family tails (exact percentile, KMV). */
object ProfileQ06 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s  ($n rows)")
    }
    import org.apache.spark.sql.graft.{Md5Prefix48E}
    import org.apache.spark.sql.Column
    def e2c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
      org.apache.spark.sql.graft.Bridge.column(e)
    def cexp(c: Column) = org.apache.spark.sql.graft.Bridge.expression(c)

    for (rnd <- 1 to 3) {
      println(s"--- round $rnd")
      val li = t(spark, dir, "lineitem")
      time("scan count") { li.queryExecution.toRdd.count() }
      time("native hash only") {
        li.select(col("l_returnflag"),
          e2c(Md5Prefix48E(cexp(col("l_orderkey").cast("string")))).as("h"))
          .queryExecution.toRdd.count()
      }
      time("old hash chain") {
        li.select(col("l_returnflag"),
          conv(substring(md5(col("l_orderkey").cast("string").cast("binary")), 1, 12),
            16, 10).cast("long").as("h"))
          .queryExecution.toRdd.count()
      }
      time("groupBy count only") {
        li.groupBy(col("l_returnflag")).count().queryExecution.toRdd.count()
      }
      time("full kmv agg") {
        li.groupBy(col("l_returnflag"))
          .agg(GraftFunctions.kmvDistinct(col("l_orderkey"), 64).as("a"))
          .queryExecution.toRdd.count()
      }
      time("exact percentile x2") {
        li.groupBy(col("l_returnflag"))
          .agg(expr("percentile(l_extendedprice, 0.5)"),
            expr("percentile(l_extendedprice, 0.9)"))
          .queryExecution.toRdd.count()
      }
      time("window-rank percentile x2") {
        import org.apache.spark.sql.expressions.Window
        val wS = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
        val wAll = Window.partitionBy(col("l_returnflag"))
        def anchor(p: Double) = floor((col("n") - 1) * p) + 1
        def frac(p: Double) = (col("n") - 1) * p - floor((col("n") - 1) * p)
        def interp(p: Double) = {
          val lo = max(when(col("rn") === anchor(p), col("l_extendedprice")))
          val hi = max(when(col("rn") === anchor(p) + 1, col("l_extendedprice")))
          lo + (coalesce(hi, lo) - lo) * first(frac(p))
        }
        li.select(col("l_returnflag"), col("l_extendedprice"))
          .withColumn("rn", row_number().over(wS))
          .withColumn("n", count(lit(1)).over(wAll))
          .filter(col("rn") === anchor(0.5) || col("rn") === anchor(0.5) + 1 ||
            col("rn") === anchor(0.9) || col("rn") === anchor(0.9) + 1)
          .groupBy(col("l_returnflag"))
          .agg(round(interp(0.5), 4).as("p50"), round(interp(0.9), 4).as("p90"))
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}

/** A/B the exact-arithmetic tax: q01's dsum decimal sums vs plain double
  * sums on the same plan (plain doubles are NOT hash-comparable across
  * engines — this exists only to attribute q01's bench cost).
  */
object ProfileDsum {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Q.{dsum, davg}
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s  ($n rows)")
    }
    for (rnd <- 1 to 3) {
      val li = t(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
      time(s"r$rnd dsum (exact)") {
        li.agg(dsum(col("l_quantity")), dsum(col("l_extendedprice")),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          davg(col("l_quantity")), davg(col("l_discount")), count(lit(1)))
          .queryExecution.toRdd.count()
      }
      time(s"r$rnd plain doubles") {
        li.agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          avg(col("l_quantity")), avg(col("l_discount")), count(lit(1)))
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
