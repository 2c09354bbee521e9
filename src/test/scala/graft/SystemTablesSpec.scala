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

  test("same-tick same-size SET GLOBAL is still seen by other sessions' caches") {
    val wh = Files.createTempDirectory("graft-gvtick-wh").toString
    val g1 = new GraftSession(spark.newSession(), wh)
    val g2 = new GraftSession(spark.newSession(), wh)
    val f = java.nio.file.Paths.get(wh, "performance_schema", "global_variables.tsv")
    g1.sql("set global max_connections = 111")
    assert(g2.sql("select @@max_connections").collect()(0).getString(0) == "111")
    // simulate two writes inside one filesystem-timestamp tick that leave
    // the byte length unchanged: rewind mtime to the first write's stamp.
    // A (mtime,size)-only cache would keep serving 111 to g2 forever.
    val stamp = Files.getLastModifiedTime(f)
    g1.sql("set global max_connections = 222")
    Files.setLastModifiedTime(f, stamp)
    assert(g2.sql("select @@max_connections").collect()(0).getString(0) == "222",
      "same-stamp same-size rewrite must still invalidate other sessions' caches")
  }

  test("performance_schema.global_variables is queryable and reflects SET GLOBAL") {
    val wh = Files.createTempDirectory("graft-psgv-wh").toString
    val g = new GraftSession(spark.newSession(), wh)
    g.sql("set global auto_increment_increment = 7")
    val v = g.sql("""select variable_value from performance_schema.global_variables
      where variable_name = 'auto_increment_increment'""").collect()
    assert(v.map(_.getString(0)).toSeq == Seq("7"))
  }

  test("GLOBAL scope is shared and live across concurrent sessions; session scope never leaks into it") {
    val wh = Files.createTempDirectory("graft-gvshare-wh").toString
    val g1 = new GraftSession(spark.newSession(), wh)
    val g2 = new GraftSession(spark.newSession(), wh)
    // live visibility: no restart between the set and the read
    g1.sql("set global max_connections = 321")
    assert(g2.sql("select @@max_connections").collect()(0).getString(0) == "321",
      "SET GLOBAL must be immediately visible to other live sessions")
    // merge, not last-writer-wins file truncation
    g2.sql("set global auto_increment_increment = 9")
    assert(g1.sql("select @@max_connections").collect()(0).getString(0) == "321")
    assert(g1.sql("select @@auto_increment_increment").collect()(0).getString(0) == "9")
    // session override answers @@var but must NOT surface in the
    // GLOBAL_VARIABLES system table (MySQL reports the global there)
    g1.sql("set session wait_timeout = 99")
    val v = g1.sql("""select variable_value from performance_schema.global_variables
      where variable_name = 'wait_timeout'""").collect()
    assert(v.map(_.getString(0)).toSeq == Seq("28800"))
    // scoped reads: @@global.x bypasses the session override; @@x and
    // @@session.x see it
    assert(g1.sql("select @@wait_timeout").collect()(0).getString(0) == "99")
    assert(g1.sql("select @@session.wait_timeout").collect()(0).getString(0) == "99")
    assert(g1.sql("select @@global.wait_timeout").collect()(0).getString(0) == "28800")
    // scoped write: SET @@global.x reaches GLOBAL scope (visible to g2)
    g1.sql("set @@global.net_write_timeout = 77")
    assert(g2.sql("select @@net_write_timeout").collect()(0).getString(0) == "77")
  }

  test("concurrent Catalog construction over a fresh warehouse seeds mysql.user once") {
    val wh = Files.createTempDirectory("graft-seedrace-wh").toString
    val sessions = new java.util.concurrent.ConcurrentLinkedQueue[GraftSession]
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (1 to 3).map(_ => new Thread(() => {
      try sessions.add(new GraftSession(spark.newSession(), wh))
      catch { case e: Throwable => errs.add(e) }
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"constructor race: ${errs.toArray.toSeq}")
    val g = sessions.peek()
    assert(g.sql("select count(*) as n from mysql.user").collect()(0)
      .getLong(0) == 1L, "root row seeded exactly once")
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
