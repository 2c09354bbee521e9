package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Curation, Pipeline, Streaming}

/** Every pipeline/streaming-face query runs at sf0.001 and returns rows
  * (the value-level gate is the driver's DuckDB compare via Verify).
  */
class PipelineSpec extends AnyFunSuite {
  import SparkFixture._

  for (q <- Pipeline.all ++ Curation.all ++ Streaming.all) {
    test(s"${q.name} runs and returns rows") {
      assert(q.fn(spark, sfDir).count() > 0, s"${q.name} returned no rows")
    }
  }

  test("q35 broadcast: ANN query batch joins via broadcast, corpus is not shuffled") {
    val df = Pipeline.all.find(_.name == "q35_ann_bruteforce").get.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query batch must broadcast:\n$plan")
    // top-k must be the partial aggregate, not a window over all scored rows:
    // map-side partials bound the exchange at k rows per query per partition
    assert(plan.contains("topk_pairs"), s"top-k must use the partial aggregate:\n$plan")
    assert(!plan.contains("Window"), s"no corpus-wide window top-k:\n$plan")
  }

  test("q43/q34 IVF assignment is map-side: no Window, no corpus exchange before candidates") {
    for (name <- Seq("q43_ann_ivf", "q34_dedup_embedding")) {
      val df = Pipeline.all.find(_.name == name).get.fn(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name: assignment must be the native argmax, not a window:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$name must never go corpus x corpus:\n$plan")
    }
  }

  test("q31 LSH candidates come from an equi-join, never a cartesian product") {
    val df = Pipeline.all.find(_.name == "q31_dedup_minhash").get.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"q31 must never go corpus x corpus:\n$plan")
  }

  test("q68 recall audit: sane bounds and an exact-integer ratio") {
    val rows = Pipeline.all.find(_.name == "q68_ann_recall").get
      .fn(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("ivf", "lsh"))
    for (r <- rows) {
      val (truth, hits, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(truth > 0 && hits >= 0 && hits <= truth,
        s"${r.getString(0)}: hits $hits out of range for truth $truth")
      assert(recall == hits.toDouble / truth,
        s"${r.getString(0)}: recall must be the exact ratio")
      // both indexes must actually find something at test SF — a recall
      // of 0 means the audit is vacuous (wrong band width / codebook)
      assert(recall > 0.0, s"${r.getString(0)}: vacuous recall")
    }
  }

  test("q43 IVF codebook is broadcast; probe is an equi-join on the cell key") {
    val df = Pipeline.all.find(_.name == "q43_ann_ivf").get.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"codebook must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"probe must be an equi-join:\n$plan")
  }
}
