package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HllReplay

/** The q06b oracle's independence check (SURVEY §2.A4c, round 14): the
  * plain-Scala HLL++ replay must equal Spark's `approx_count_distinct`
  * EXACTLY — same xxHash64, same registers, same estimator — across all
  * three estimator regimes (linear counting under the p=9 threshold,
  * k-NN bias correction under 5m, raw estimate above) and across
  * partition merges. Nothing here touches Spark's sketch classes: the
  * replay is the published algorithm, so equality certifies
  * approx_count_distinct against the paper, not against itself.
  */
class HllReplaySpec extends AnyFunSuite {
  import SparkFixture._
  import spark.implicits._

  private def sparkEstimate(values: Seq[Long]): Long =
    values.toDF("v").agg(approx_count_distinct(col("v")).as("e"))
      .collect().head.getLong(0)

  private def replayEstimate(values: Seq[Long]): Long = {
    val s = new HllReplay.Sketch()
    values.foreach(s.add)
    s.estimate
  }

  test("replay == approx_count_distinct across all estimator regimes") {
    // spread cardinalities across: linear counting (< ~400), the bias
    // window (~512..2560), and the raw regime (> 2560); values are
    // arbitrary longs (scaled + offset so bit patterns vary)
    val cards = Seq(1, 7, 50, 300, 450, 700, 1100, 1600, 2300, 3000,
      5000, 20000, 100000)
    cards.foreach { n =>
      val vals = (1 to n).map(i => i.toLong * 2654435761L + 17)
      assert(replayEstimate(vals) == sparkEstimate(vals),
        s"estimate mismatch at cardinality $n")
    }
  }

  test("duplicates don't move the sketch; merge == single-pass") {
    val a = (1 to 1500).map(_.toLong * 31 + 5)
    val b = (1000 to 2500).map(_.toLong * 31 + 5)
    assert(replayEstimate(a ++ a) == replayEstimate(a))
    val merged = {
      val sa = new HllReplay.Sketch(); a.foreach(sa.add)
      val sb = new HllReplay.Sketch(); b.foreach(sb.add)
      sa.merge(sb).estimate
    }
    assert(merged == replayEstimate(a ++ b))
    assert(merged == sparkEstimate(a ++ b))
  }

  test("the q06b shape at sf0.001: per-flag estimates match Spark's") {
    val li = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"))
      .as[(String, Long)].collect()
    val sparkSide = Tables.t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey")).as("e"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    li.groupBy(_._1).foreach { case (flag, rows) =>
      val s = new HllReplay.Sketch()
      rows.foreach(r => s.add(r._2))
      assert(s.estimate == sparkSide(flag), s"flag $flag")
    }
  }
}
