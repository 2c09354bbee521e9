package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Relational

/** Every relational query runs at sf0.001, returns rows, and its plan has
  * the scale-critical properties (pushdown, broadcast) we designed for.
  */
class RelationalSpec extends AnyFunSuite {
  import SparkFixture._

  for (q <- Relational.all) {
    test(s"${q.name} runs and returns rows") {
      val df = q.fn(spark, sfDir)
      assert(df.count() > 0, s"${q.name} returned no rows")
    }
  }

  test("q03_filter pushes predicates into the parquet scan") {
    val df = Relational.all.find(_.name == "q03_filter").get.fn(spark, sfDir)
    val physical = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(physical.contains("PushedFilters") &&
      physical.contains("GreaterThanOrEqual(l_shipdate"),
      s"expected pushed filters in:\n$physical")
  }

  test("q01 scan prunes columns (no l_comment-ish wide read)") {
    val df = Relational.all.find(_.name == "q01_pricing_summary").get.fn(spark, sfDir)
    val scan = df.queryExecution.executedPlan.toString
    // ReadSchema should carry only the 6 referenced columns
    assert(scan.contains("ReadSchema"))
    assert(!scan.contains("l_partkey"), "q01 must not read unused l_partkey")
  }

  test("q09 joins dims via broadcast") {
    val df = Relational.all.find(_.name == "q09_join_inner").get.fn(spark, sfDir)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"), s"expected broadcast join:\n$physical")
  }

  test("q08 top-N plans as TakeOrderedAndProject (no full sort)") {
    val df = Relational.all.find(_.name == "q08_topn").get.fn(spark, sfDir)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("TakeOrderedAndProject"), s"plan:\n$physical")
  }

  test("q19 has no unpartitioned window; max comes back as a 1-row broadcast") {
    val df = Relational.all.find(_.name == "q19_cte").get.fn(spark, sfDir)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("Window"),
      s"q19 must not plan a WindowExec (single-partition scale-killer):\n$physical")
    // Catalyst pushes the equality filter into the cross join: the 1-row
    // max side comes back as a broadcast hash join keyed on the value.
    assert(physical.contains("BroadcastHashJoin") && physical.contains("max_revenue"),
      s"expected the 1-row max broadcast join:\n$physical")
    // ONE lineitem pass: the max branch must reuse the revenue shuffle,
    // not rebuild it. The explicit isnotnull(l_suppkey) in the revenue
    // frame is what makes the two exchange subtrees sameResult-equal —
    // without it the join consumer's pushed filter differs and AQE
    // plans two full scans (this is the regression this pin exists for).
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("ReusedExchange"),
      s"q19 must reuse the revenue exchange (one lineitem scan):\n$finalPlan")
  }

  test("q06c KMV estimate tracks the exact distinct count") {
    // the accuracy pin that used to ride inside q06c's output as an
    // exact count(distinct) companion column (dropped from the query:
    // it duplicated q04's coverage and doubled the query's cost).
    // KMV standard error is ~1/sqrt(k-1) ≈ 12.6% at k=64; assert 3σ.
    import org.apache.spark.sql.functions._
    val li = Tables.t(spark, sfDir, "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(graft.functions.GraftFunctions.kmvDistinct(col("l_orderkey"), 64)
          .as("approx"),
        countDistinct(col("l_orderkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, e) = (r.getAs[Long]("approx").toDouble, r.getAs[Long]("exact").toDouble)
      assert(math.abs(a - e) / e <= 0.38,
        s"flag ${r.get(0)}: approx $a vs exact $e off by ${math.abs(a - e) / e}")
    }
  }

  test("q78 pivot empty-cell semantics: absent combo counts 0, sums NULL") {
    // Canonical TPC-H has no (A,O)/(R,O) rows; the synthetic generator
    // fills all six combos, so pin the empty-cell contract directly: a
    // pivot cell with no input rows must read count=0 (coalesced, the
    // CASE-filtered-COUNT semantics the oracle computes) and sum=NULL.
    import org.apache.spark.sql.functions._
    import graft.queries.Q.dsum
    val df = spark.createDataFrame(Seq(
      ("A", "F", 1.0), ("A", "F", 2.0), ("N", "O", 3.0)
    )).toDF("l_returnflag", "l_linestatus", "l_quantity")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(dsum(col("l_quantity")).as("qty"), count(lit(1)).as("cnt"))
      .select(col("l_returnflag"),
        col("F_qty").as("qty_f"),
        coalesce(col("F_cnt"), lit(0L)).as("cnt_f"),
        col("O_qty").as("qty_o"),
        coalesce(col("O_cnt"), lit(0L)).as("cnt_o"))
    val rows = df.collect().map(r => r.getString(0) -> r).toMap
    assert(rows("A").getLong(2) == 2L && rows("A").getLong(4) == 0L)
    assert(rows("A").isNullAt(3), "empty (A,O) sum cell must be NULL")
    assert(rows("N").getLong(2) == 0L && rows("N").getLong(4) == 1L)
    assert(rows("N").isNullAt(1), "empty (N,F) sum cell must be NULL")
  }

  test("queries and oracleSql keys line up") {
    val qkeys = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qkeys))
    assert(SparkEntry.queries.nonEmpty)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
