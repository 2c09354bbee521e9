package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Pipeline, Streaming}

/** Every pipeline/streaming-face query runs at sf0.001 and returns rows
  * (the value-level gate is the driver's DuckDB compare via Verify).
  */
class PipelineSpec extends AnyFunSuite {
  import SparkFixture._

  for (q <- Pipeline.all ++ Streaming.all) {
    test(s"${q.name} runs and returns rows") {
      assert(q.fn(spark, sfDir).count() > 0, s"${q.name} returned no rows")
    }
  }

  test("q35 broadcast: ANN query batch joins via broadcast, corpus is not shuffled") {
    val df = Pipeline.all.find(_.name == "q35_ann_bruteforce").get.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query batch must broadcast:\n$plan")
  }
}
