package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Catalog, GraftSession}

/** The commit protocol (Catalog versioned dirs + atomic pointer swap):
  * readers never observe a partial or missing rewrite, concurrent
  * ingest appends survive an overlapping UPDATE, and old versions are
  * garbage-collected with a one-commit grace period.
  */
class CommitLogSpec extends AnyFunSuite {
  import SparkFixture._

  private def freshCatalog(): Catalog = {
    val wh = Files.createTempDirectory("graft-commit-wh").toString
    new Catalog(spark, wh)
  }

  private def mkTable(cat: Catalog, db: String, t: String): Unit = {
    cat.createSchema(db, ifNotExists = true)
    cat.createTable(cat.TableMeta(db, t,
      Seq(cat.Col("id", "int", "int"), cat.Col("flag", "int", "int")),
      pk = Seq("id"), engine = "parquet"))
  }

  private def rows(cat: Catalog, n: Int, flag: Int, idBase: Int = 0) = {
    import SparkFixture.spark.implicits._
    (0 until n).map(i => (idBase + i, flag)).toDF("id", "flag")
  }

  test("table layout is versioned from birth: pointer symlink, v1, commit log") {
    val cat = freshCatalog()
    mkTable(cat, "clog", "t0")
    val data = Paths.get(cat.warehouse, "clog", "t0", "data")
    assert(Files.isSymbolicLink(data))
    assert(Files.readSymbolicLink(data).toString == "versions/v1")
    val log = Paths.get(cat.warehouse, "clog", "t0", "_graft_log")
    assert(Files.readAllLines(log).asScala
      .map(_.split('\t').take(2).mkString("\t")) == Seq("v1\tcreate"))
  }

  test("rewrite commits are atomic for snapshot readers: never partial, never missing") {
    val cat = freshCatalog()
    mkTable(cat, "clog", "atomic")
    // state i = (100 + i) rows, every flag == i: a torn or mixed read
    // would show a count/flag combination outside the valid set
    cat.append("clog", "atomic", rows(cat, 100, 0))
    val validStates = (0 to 4).map(i => (100L + i, Set(i))).toSet

    val observed = new ConcurrentLinkedQueue[(Long, Set[Int])]
    val failures = new ConcurrentLinkedQueue[String]
    val stop = new AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val snap = cat.readSnapshot("clog", "atomic")
            .agg(count(lit(1)), collect_set(col("flag"))).collect()(0)
          observed.add((snap.getLong(0), snap.getSeq[Int](1).toSet))
        } catch {
          // an in-flight snapshot may outlive the one-commit GC grace —
          // that read FAILS (like any MVCC reader past retention), it
          // never returns partial data. Missing table path = real bug.
          case e: org.apache.spark.SparkException
            if e.getMessage != null && e.getMessage.contains("FileNotFound") =>
          case e: Exception
            if e.getCause != null &&
              e.getCause.isInstanceOf[java.io.FileNotFoundException] =>
          case e: Exception => failures.add(e.toString)
        }
      }
    })
    reader.start()
    try {
      (1 to 4).foreach { i =>
        cat.rewrite("clog", "atomic",
          rows(cat, 100 + i, i))
      }
    } finally { stop.set(true); reader.join() }

    assert(failures.isEmpty, s"reader errors: ${failures.asScala.toSeq}")
    val bad = observed.asScala.filterNot(validStates.contains)
    assert(bad.isEmpty, s"torn/mixed states observed: $bad")
    assert(observed.asScala.nonEmpty, "reader never completed a read")
  }

  test("append landing between a rewrite's snapshot and its commit survives the commit") {
    val cat = freshCatalog()
    mkTable(cat, "clog", "merge")
    cat.append("clog", "merge", rows(cat, 10, 0))
    // the UPDATE: all current rows get flag=1 — computed from the live
    // table, materialized before the hook fires
    val update = cat.read("clog", "merge").withColumn("flag", lit(1))
    cat.onRewriteBeforeCommit = () =>
      cat.append("clog", "merge", rows(cat, 5, 2, idBase = 100))
    try cat.rewrite("clog", "merge", update)
    finally cat.onRewriteBeforeCommit = () => ()

    val after = cat.read("clog", "merge")
      .groupBy(col("flag")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // updated old rows AND the concurrently appended rows both present
    assert(after == Map(1 -> 10L, 2 -> 5L),
      s"ingest-vs-DML interleave lost rows: $after")
  }

  test("append landing after the snapshot is not duplicated by a lazily-listing frame") {
    val cat = freshCatalog()
    mkTable(cat, "clog", "nodup")
    cat.append("clog", "nodup", rows(cat, 10, 0))
    // the frame is built INSIDE the by-name rewrite argument, so its
    // file-index resolution happens at snapshot time under the table
    // lock; the append fired right after the snapshot must be carried
    // over exactly once — pre-fix, a frame whose listing resolved at
    // save planning would also READ the appended file (rows doubled)
    cat.onRewriteAfterSnapshot = () =>
      cat.append("clog", "nodup", rows(cat, 5, 2, idBase = 100))
    try cat.rewrite("clog", "nodup",
      cat.read("clog", "nodup").withColumn("flag", lit(1)))
    finally cat.onRewriteAfterSnapshot = () => ()

    val after = cat.read("clog", "nodup")
      .groupBy(col("flag")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(after == Map(1 -> 10L, 2 -> 5L),
      s"duplicated or lost rows after post-snapshot append: $after")
  }

  test("append landing between frame construction and the rewrite call survives") {
    val cat = freshCatalog()
    mkTable(cat, "clog", "stale")
    cat.append("clog", "stale", rows(cat, 10, 0))
    // the caller builds (and resolves) the UPDATE frame first — ingest
    // lands AFTER that resolution but BEFORE rewrite() takes its
    // snapshot. Whichever serialization the rewrite picks (re-list and
    // update the appended rows too, or carry their file over untouched),
    // every row must come out exactly once — no loss, no duplication.
    val update = cat.read("clog", "stale").withColumn("flag", lit(1))
    update.inputFiles // force resolution now, like a caller that counted
    cat.append("clog", "stale", rows(cat, 5, 2, idBase = 100))
    cat.rewrite("clog", "stale", update)

    val after = cat.read("clog", "stale")
      .select(col("id"), col("flag")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(after.length == 15 && after.map(_._1).distinct.length == 15,
      s"pre-snapshot append lost or duplicated: ${after.sorted}")
    // original rows always go through the UPDATE
    assert(after.filter(_._1 < 100).forall(_._2 == 1),
      s"original rows missed the update: ${after.sorted}")
  }

  test("GC keeps exactly the current and previous versions") {
    val cat = freshCatalog()
    mkTable(cat, "clog", "gc")
    cat.append("clog", "gc", rows(cat, 10, 0))
    (1 to 3).foreach(i => cat.rewrite("clog", "gc", rows(cat, 10, i)))
    val versions = Paths.get(cat.warehouse, "clog", "gc", "versions")
    val present = Files.list(versions).iterator.asScala
      .map(_.getFileName.toString).toSet
    assert(present == Set("v3", "v4"), s"unexpected versions: $present")
    // and the log recorded every commit in order
    val log = Files.readAllLines(
      Paths.get(cat.warehouse, "clog", "gc", "_graft_log")).asScala
    assert(log.map(_.split('\t').take(2).mkString("\t")) ==
      Seq("v1\tcreate", "v2\trewrite", "v3\trewrite", "v4\trewrite"))
  }

  test("legacy plain data directory migrates to the versioned layout on first write") {
    val cat = freshCatalog()
    mkTable(cat, "clog", "legacy")
    // devolve to the pre-commit-log layout: plain dir, no pointer
    val tdir = Paths.get(cat.warehouse, "clog", "legacy")
    val data = tdir.resolve("data")
    Files.delete(data)
    Files.createDirectories(data)
    rows(cat, 7, 0).write.mode("overwrite").parquet(data.toString)
    assert(!Files.isSymbolicLink(data))

    cat.append("clog", "legacy", rows(cat, 3, 1, idBase = 50))
    assert(Files.isSymbolicLink(tdir.resolve("data")))
    assert(cat.read("clog", "legacy").count() == 10)
    cat.rewrite("clog", "legacy",
      cat.read("clog", "legacy").filter(col("flag") === 1))
    assert(cat.read("clog", "legacy").count() == 3)
  }

  test("DML through GraftSession rides the commit protocol end to end") {
    val wh = Files.createTempDirectory("graft-commit-sess").toString
    val g = new GraftSession(spark.newSession(), wh)
    g.sql("create schema sess")
    g.sql("use sess")
    // no PRIMARY KEY: copy-on-write DML, every statement a rewrite commit
    // (PK'd tables take the merge-on-read path — MergeOnReadSpec)
    g.sql("create table kv (id int, v varchar(20))")
    g.sql("insert into kv values (1,'a'), (2,'b'), (3,'c')")
    g.sql("update kv set v = 'z' where id = 2")
    g.sql("delete from kv where id = 1")
    val got = g.sql("select id, v from kv order by id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq((2, "z"), (3, "c")))
    // two DML rewrites after the insert: log shows create + 2 commits
    val log = Files.readAllLines(
      Paths.get(wh, "sess", "kv", "_graft_log")).asScala
    assert(log.head.startsWith("v1\tcreate") &&
      log.count(_.split('\t')(1) == "rewrite") == 2)
  }

  test("time travel: VERSION AS OF reads retained generations; GC interplay errors cleanly") {
    val wh = Files.createTempDirectory("graft-tt-wh").toString
    val g = new GraftSession(spark, wh)
    g.sql("create schema tt"); g.sql("use tt")
    g.sql("set graft_retain_versions = 3")
    g.sql("create table h (id int, v varchar(20))")
    g.sql("insert into h values (1,'a'), (2,'b')")          // lands in v1
    g.sql("update h set v = 'B' where id = 2")              // rewrite -> v2
    g.sql("delete from h where id = 1")                     // rewrite -> v3
    // v1 = pre-update rows, v2 = post-update, current = post-delete
    def vals(q: String) = g.sql(q).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq.sorted
    assert(vals("select id, v from h version as of 1") ==
      Seq((1, "a"), (2, "b")))
    assert(vals("select id, v from h version as of 2") ==
      Seq((1, "a"), (2, "B")))
    assert(vals("select id, v from h") == Seq((2, "B")))
    // time travel composes with ordinary SQL (join past vs present)
    assert(g.sql("select count(*) as c from h version as of 1 o " +
      "left anti join h n on o.id = n.id").collect()(0).getLong(0) == 1L)
    // a future version errors cleanly
    val eFut = intercept[Exception](
      g.sql("select * from h version as of 9").collect())
    assert(eFut.getMessage.contains("Unknown version"), eFut.getMessage)
    // retention interplay: shrink retention, one more rewrite reaps v1/v2
    g.sql("set graft_retain_versions = 1")
    g.sql("update h set v = 'C' where id = 2")               // -> v4, GC
    val eReap = intercept[Exception](
      g.sql("select * from h version as of 1").collect())
    assert(eReap.getMessage.contains("reaped"), eReap.getMessage)
    assert(vals("select id, v from h") == Seq((2, "C")))
    // SHOW COMMITS discoverability: every commit listed, reaped marked
    val commits = g.sql("show commits for h").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(commits.head == ("v1", "create", "reaped"), commits.toString)
    assert(commits.count(_._2 == "rewrite") == 3)
    assert(commits.last._3 == "YES")
    // merge-on-read: AS OF the current generation is the live view
    g.sql("create table hpk (id int, v varchar(20), PRIMARY KEY(id))")
    g.sql("insert into hpk values (1,'a')")
    assert(g.sql("select count(*) as c from hpk version as of 1")
      .collect()(0).getLong(0) == 1L)
    // retention floor: 0 is rejected (in-flight snapshot grace)
    val eZero = intercept[Exception](g.sql("set graft_retain_versions = 0"))
    assert(eZero.getMessage.contains(">= 1"), eZero.getMessage)
  }

  test("time travel hardening: literals untouched, backticked refs work, retention is warehouse-scoped") {
    val wh = Files.createTempDirectory("graft-tt2-wh").toString
    val g = new GraftSession(spark, wh)
    g.sql("create schema tt2"); g.sql("use tt2")
    g.sql("set graft_retain_versions = 4")
    g.sql("create table notes (id int, body varchar(60))")
    g.sql("insert into notes values (1, 'restored version as of 5'), " +
      "(2, 'plain row')")
    // the phrase INSIDE a string literal is data: the pre-rewrite must
    // not capture 'restored' as a table name nor rewrite the literal
    assert(g.sql(
      "select id from notes where body = 'restored version as of 5'")
      .collect().map(_.getInt(0)).toSeq == Seq(1))
    g.sql("update notes set body = 'v2 row' where id = 2")   // -> v2
    // backticked table reference still time-travels
    assert(g.sql("select count(*) as c from `notes` version as of 1")
      .collect()(0).getLong(0) == 2L)
    assert(g.sql("select count(*) as c from `tt2`.`notes` version as of 1")
      .collect()(0).getLong(0) == 2L)
    // and both forms compose in one statement with a literal present
    assert(g.sql("select count(*) as c from notes version as of 1 " +
      "where body <> 'x version as of 9'").collect()(0).getLong(0) == 2L)
    // retention is a WAREHOUSE policy, not per-connection: a second
    // session (default retention) committing on the same table must
    // not reap the history this warehouse was told to keep
    val g2 = new GraftSession(spark, wh)
    g2.sql("use tt2")
    g2.sql("update notes set body = 'v3 row' where id = 2")  // -> v3, GC in g2
    assert(g.sql("select count(*) as c from notes version as of 1")
      .collect()(0).getLong(0) == 2L,
      "another connection's commit must honor the warehouse retention")
    // round 16: the phrase inside SQL comments and backticked identifier
    // bodies is NOT syntax either — the masked pre-rewrite skips both
    assert(g.sql("select count(*) as c from notes -- notes version as of 99\n")
      .collect()(0).getLong(0) == 2L)
    assert(g.sql("select count(*) as c /* notes version as of 99 */ from notes")
      .collect()(0).getLong(0) == 2L)
    // no temp-view accumulation: time-travel views drop after the statement
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_tt_")),
      "time-travel temp views must not accumulate in the session catalog")
    // ...including when a LATER reference in the same statement fails to
    // resolve AFTER an earlier one already registered its view
    val eHalf = intercept[Exception](g.sql(
      "select * from notes version as of 1 n1 " +
        "join notes version as of 99 n2 on n1.id = n2.id"))
    assert(eHalf.getMessage.contains("99"), eHalf.getMessage)
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_tt_")),
      "a failed statement must drop its already-registered tt views")
  }

  test("retention depth persists in the warehouse across a restart") {
    val wh = Files.createTempDirectory("graft-ret-wh").toString
    val g = new GraftSession(spark, wh)
    g.sql("create schema ret"); g.sql("use ret")
    g.sql("set graft_retain_versions = 3")
    // durable policy file written on SET
    assert(Files.readString(Paths.get(wh, "_graft_retention")).trim == "3")
    // a "restarted server" = a Catalog over a COPY of the warehouse
    // (fresh lockRoot, so the JVM-static map has no entry and the
    // persisted policy must be what the first touch loads)
    val wh2 = Files.createTempDirectory("graft-ret-wh2").toString
    Files.walk(Paths.get(wh)).iterator().asScala
      .filter(p => !Files.isSymbolicLink(p)).foreach { p =>
        val q = Paths.get(wh2).resolve(Paths.get(wh).relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(q)
        else Files.copy(p, q,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    val g2 = new GraftSession(spark.newSession(), wh2)
    assert(g2.catalog.retainVersions == 3,
      "restart must reload the persisted retention depth, not revert to 1")
  }

  test("TIMESTAMP AS OF resolves the generation live at that instant") {
    val wh = Files.createTempDirectory("graft-ttts-wh").toString
    val g = new GraftSession(spark, wh)
    g.sql("create schema tts"); g.sql("use tts")
    g.sql("set graft_retain_versions = 5")
    g.sql("create table ev (id int, v varchar(20))")
    g.sql("insert into ev values (1,'a')")                    // v1 content
    Thread.sleep(15)
    val betweenV1V2 = java.time.Instant.now()
    Thread.sleep(15)
    g.sql("update ev set v = 'b' where id = 1")               // -> v2
    Thread.sleep(15)
    g.sql("update ev set v = 'c' where id = 1")               // -> v3
    def at(ts: String): String =
      g.sql(s"select v from ev timestamp as of '$ts'")
        .collect()(0).getString(0)
    // an instant between the v1 and v2 commits reads v1
    assert(at(betweenV1V2.toString) == "a")
    // an instant after every commit reads the live generation
    assert(at(java.time.Instant.now().toString) == "c")
    // boundary: exactly the v1 commit instant reads v1 (at-or-before)
    val commits = g.sql("show commits for ev").collect()
      .map(r => (r.getString(0), r.getString(3))).toMap
    assert(at(commits("v1")) == "a", s"commit times: $commits")
    // MySQL-style local-zone literal parses (session zone)
    val zone = java.time.ZoneId.of(
      spark.conf.get("spark.sql.session.timeZone"))
    val localLit = java.time.LocalDateTime
      .ofInstant(betweenV1V2, zone).toString.replace('T', ' ')
    assert(at(localLit) == "a")
    // before the first commit: a clear error naming the first commit
    val e = intercept[Exception](at("1999-01-01 00:00:00"))
    assert(e.getMessage.contains("no commit at or before"), e.getMessage)
    // malformed literal: a clear error, not a scala parse crash
    val e2 = intercept[Exception](at("not-a-time"))
    assert(e2.getMessage.contains("Incorrect TIMESTAMP value"), e2.getMessage)
    // unquoted spec is rejected (and not swallowed as a version)
    val e3 = intercept[Exception](
      g.sql("select v from ev timestamp as of 12345").collect())
    assert(e3.getMessage.contains("quoted timestamp"), e3.getMessage)
    // quote-safety: the phrase inside a literal stays data
    g.sql("insert into ev values (9, 'x timestamp as of 2020')")
    assert(g.sql("select id from ev where v = 'x timestamp as of 2020'")
      .collect()(0).getInt(0) == 9)
  }

  test("time travel on merge-on-read: OPTIMIZE generations reconstruct exactly; tombstone GC follows retention") {
    val wh = Files.createTempDirectory("graft-ttmor-wh").toString
    val g = new GraftSession(spark, wh)
    g.sql("create schema ttm"); g.sql("use ttm")
    g.sql("set graft_retain_versions = 3")
    g.sql("create table m (id int, v varchar(20), PRIMARY KEY(id))")
    g.sql("insert into m values (1,'a'), (2,'b'), (3,'c')")   // v1 accrues
    g.sql("update m set v = 'B' where id = 2")                 // tombstone, still v1
    g.sql("delete from m where id = 3")                        // tombstone, still v1
    g.sql("optimize table m")                                  // fold -> v2
    g.sql("update m set v = 'BB' where id = 2")                // tombstone in v2's life
    g.sql("optimize table m")                                  // fold -> v3
    def vals(q: String) = g.sql(q).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq.sorted
    // v1 as of the v2 rewrite's snapshot = post-update, post-delete state
    assert(vals("select id, v from m version as of 1") ==
      Seq((1, "a"), (2, "B")),
      vals("select id, v from m version as of 1").toString)
    assert(vals("select id, v from m version as of 2") ==
      Seq((1, "a"), (2, "BB")))
    assert(vals("select id, v from m") == Seq((1, "a"), (2, "BB")))
    // AS OF the current generation == the live merged view
    assert(vals("select id, v from m version as of 3") ==
      Seq((1, "a"), (2, "BB")))
    // the retained folded tombstone files are NO-OPS on the live view
    // (counted none by rowCount either)
    assert(g.catalog.rowCount("ttm", "m") == 2L)
    // retention shrink + one more rewrite reaps v1/v2 AND their folded
    // tombstone files (no leak: the deletes dir drains to the live set)
    val delsDir = java.nio.file.Paths.get(g.catalog.deletesPath("ttm", "m"))
    def delFiles(): Long =
      if (!Files.isDirectory(delsDir)) 0L
      else Files.list(delsDir).iterator.asScala
        .count(_.getFileName.toString.endsWith(".parquet")).toLong
    assert(delFiles() >= 3, s"retention must keep folded tombstones, got ${delFiles()}")
    g.sql("set graft_retain_versions = 1")
    g.sql("update m set v = 'Z' where id = 1")
    g.sql("optimize table m")                                  // -> v4, GC
    val eReap = intercept[Exception](
      g.sql("select * from m version as of 1").collect())
    assert(eReap.getMessage.contains("reaped"), eReap.getMessage)
    // only the NEWEST fold's files survive (their one-commit grace);
    // every reaped generation's files are gone
    assert(delFiles() <= 1L,
      s"reaped generations' tombstone files must be GC'd, got ${delFiles()}")
    assert(vals("select id, v from m") == Seq((1, "Z"), (2, "BB")))
    // the RETAINED past generation must stay readable THROUGH the same
    // GC-performing rewrite: the review-found bug re-retired
    // already-retired files under the new generation's tag, so the GC
    // deleted files v4's _folded_dels still referenced and this query
    // crashed on a missing path. (Value-wise v3's end-of-generation
    // state includes the Z update — MoR DML accrues INSIDE a
    // generation; AS OF v is "as the v->v+1 rewrite snapshotted it".)
    assert(vals("select id, v from m version as of 3") ==
      Seq((1, "Z"), (2, "BB")),
      vals("select id, v from m version as of 3").toString)
  }
}
