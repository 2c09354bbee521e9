package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.GraftSession

/** Seeded system tables + persistent GLOBAL variables
  * (/root/reference/src/meta/initial.rs, variable/system.rs parity):
  * mysql.user backs SHOW GRANTS, information_schema covers SCHEMATA /
  * STATISTICS / TABLE_CONSTRAINTS / KEY_COLUMN_USAGE, SET GLOBAL
  * round-trips across a reopened session.
  */
class SystemTablesSpec extends AnyFunSuite {
  import SparkFixture._

  test("SET GLOBAL persists across a reopened GraftSession; SESSION does not") {
    val wh = Files.createTempDirectory("graft-var-wh").toString
    val g1 = new GraftSession(spark.newSession(), wh)
    g1.sql("set global max_connections = 500")
    g1.sql("set session wait_timeout = 99")
    assert(g1.sql("select @@max_connections").collect()(0).getString(0) == "500")
    assert(g1.sql("select @@wait_timeout").collect()(0).getString(0) == "99")

    val g2 = new GraftSession(spark.newSession(), wh)
    assert(g2.sql("select @@max_connections").collect()(0).getString(0) == "500",
      "GLOBAL must survive the restart")
    assert(g2.sql("select @@wait_timeout").collect()(0).getString(0) == "28800",
      "SESSION must reset to the default")
  }

  test("performance_schema.global_variables is queryable and reflects SET GLOBAL") {
    val wh = Files.createTempDirectory("graft-psgv-wh").toString
    val g = new GraftSession(spark.newSession(), wh)
    g.sql("set global auto_increment_increment = 7")
    val v = g.sql("""select variable_value from performance_schema.global_variables
      where variable_name = 'auto_increment_increment'""").collect()
    assert(v.map(_.getString(0)).toSeq == Seq("7"))
  }

  test("information_schema SCHEMATA/TABLE_CONSTRAINTS/KEY_COLUMN_USAGE/STATISTICS") {
    val wh = Files.createTempDirectory("graft-is-wh").toString
    val g = new GraftSession(spark.newSession(), wh)
    g.sql("create schema isdb")
    g.sql("use isdb")
    g.sql("create table pkt (a int, b varchar(10), c int, primary key(a, b))")

    val schemata = g.sql(
      "select schema_name from information_schema.schemata order by schema_name")
      .collect().map(_.getString(0)).toSeq
    assert(schemata.contains("isdb") && schemata.contains("mysql") &&
      schemata.contains("performance_schema"))

    val cons = g.sql("""select constraint_name, constraint_type
      from information_schema.table_constraints
      where table_schema = 'isdb' and table_name = 'pkt'""").collect()
    assert(cons.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("PRIMARY", "PRIMARY KEY")))

    val kcu = g.sql("""select column_name, ordinal_position
      from information_schema.key_column_usage
      where table_schema = 'isdb' and table_name = 'pkt'
      order by ordinal_position""").collect()
    assert(kcu.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "1"), ("b", "2")))

    val stats = g.sql("""select index_name, seq_in_index, column_name
      from information_schema.statistics
      where table_schema = 'isdb' and table_name = 'pkt'
      order by seq_in_index""").collect()
    assert(stats.map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq(("PRIMARY", "a"), ("PRIMARY", "b")))
  }

  test("SHOW GRANTS derives from the seeded mysql.user and follows DML edits") {
    val wh = Files.createTempDirectory("graft-grants-wh").toString
    val g = new GraftSession(spark.newSession(), wh)
    val before = g.sql("show grants").collect().map(_.getString(0)).toSeq
    assert(before ==
      Seq("GRANT ALL PRIVILEGES ON *.* TO 'root'@'%' WITH GRANT OPTION"))

    // the privilege table is plain DML — revoke via UPDATE
    g.sql("update mysql.user set Drop_priv = 'N', Grant_priv = 'N' " +
      "where User = 'root'")
    val after = g.sql("show grants").collect().map(_.getString(0)).toSeq
    assert(after ==
      Seq("GRANT Select, Insert, Update, Delete, Create ON *.* TO 'root'@'%'"),
      s"got: $after")
  }

  test("SHOW TABLE STATUS row counts come from parquet footers") {
    val wh = Files.createTempDirectory("graft-sts-wh").toString
    val g = new GraftSession(spark.newSession(), wh)
    g.sql("create schema stsdb")
    g.sql("use stsdb")
    g.sql("create table t1 (x int)")
    g.sql("insert into t1 values (1), (2), (3)")
    g.sql("insert into t1 values (4)")
    val rows = g.sql("show table status").collect()
      .map(r => (r.getString(0), r.getString(4))).toMap
    assert(rows("t1") == "4")
    assert(g.catalog.rowCount("stsdb", "t1") == 4L)
  }
}
