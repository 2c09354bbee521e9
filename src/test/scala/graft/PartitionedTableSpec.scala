package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.GraftSession

/** CREATE TABLE ... PARTITION BY: Hive-style directory partitioning
  * through the catalog (the reference's sled key-prefix scoping,
  * /root/reference/src/store/reader/sled.rs:1, in Spark's native
  * layout). The point at scale: a partition-key predicate must show up
  * as PartitionFilters — directories pruned before any I/O happens.
  */
class PartitionedTableSpec extends AnyFunSuite {
  import SparkFixture._

  private lazy val g = {
    val wh = Files.createTempDirectory("graft-part-wh").toString
    val s = new GraftSession(spark.newSession(), wh)
    s.sql("create schema pdb")
    s.sql("use pdb")
    s
  }

  test("PARTITION BY creates partition directories and prunes on the key") {
    g.sql("create table ev (id int, site varchar(10), v double) partition by (site)")
    g.sql("insert into ev values (1,'us',1.0), (2,'us',2.0), (3,'eu',3.0), (4,'ap',4.0)")

    // partition dirs on disk
    val dataDir = g.catalog.currentVersionDir("pdb", "ev")
    val dirs = Files.list(dataDir).iterator()
    val names = Iterator.continually(dirs).takeWhile(_.hasNext).map(_.next())
      .map(_.getFileName.toString).filter(_.startsWith("site=")).toSet
    assert(names == Set("site=us", "site=eu", "site=ap"))

    // pruning: the plan carries the predicate as a PartitionFilter
    val df = g.sql("select id, v from ev where site = 'us'")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("site"),
      s"partition predicate must prune, plan:\n$plan")
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))

    // and only the matching partition's files are scanned: the scan's
    // numFiles metric equals the file count of the site=us directory
    val usFiles = Files.list(dataDir.resolve("site=us")).iterator()
    val nUs = Iterator.continually(usFiles).takeWhile(_.hasNext).map(_.next())
      .count(p => p.getFileName.toString.endsWith(".parquet"))
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan.metrics("numFiles").value == nUs,
      s"scan touched ${scan.metrics("numFiles").value} files, site=us has $nUs")
  }

  test("appends create new partitions; UPDATE/DELETE rewrite keeps the layout") {
    g.sql("create table logs (id int, day varchar(10), msg varchar(50)) partition by (day)")
    g.sql("insert into logs values (1,'d1','a'), (2,'d1','b')")
    g.sql("insert into logs values (3,'d2','c')")
    assert(g.sql("select count(*) as n from logs").collect()(0).getLong(0) == 3)

    g.sql("update logs set msg = 'z' where id = 2")
    val got = g.sql("select id, msg from logs order by id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq((1, "a"), (2, "z"), (3, "c")))

    g.sql("delete from logs where day = 'd1'")
    assert(g.sql("select count(*) as n from logs").collect()(0).getLong(0) == 1)
    // the d1 partition directory is gone from the current version
    val dataDir = g.catalog.currentVersionDir("pdb", "logs")
    val dirs = Files.list(dataDir).iterator()
    val names = Iterator.continually(dirs).takeWhile(_.hasNext).map(_.next())
      .map(_.getFileName.toString).filter(_.startsWith("day=")).toSet
    assert(names == Set("day=d2"), s"stale partition dirs: $names")
  }

  test("partition spec survives the catalog meta round-trip and SHOW CREATE TABLE") {
    g.sql("create table pmeta (a int, b varchar(5), c int) partitioned by (b, c)")
    val m = g.catalog.meta("pdb", "pmeta")
    assert(m.partitionCols == Seq("b", "c"))
    // a fresh catalog over the same warehouse re-registers partitioned
    val g2 = new GraftSession(spark.newSession(), g.catalog.warehouse)
    g2.sql("use pdb")
    g2.sql("insert into pmeta values (1,'x',1)")
    val plan = g2.sql("select a from pmeta where b = 'x'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
  }
}
