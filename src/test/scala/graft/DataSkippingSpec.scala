package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.GraftSession
import graft.sources.FileSkipStats
import graft.sources.FileSkipStats.ColStat

/** File-level min/max data skipping (SURVEY §2.E9): the commit
  * protocol's `_graft_stats` sidecars + the SkippingFileIndex wrap.
  * Covers the evaluator's may-match algebra directly, then the full
  * path: sidecar written on INSERT, files pruned at scan (numFiles
  * metric), entries carried across OPTIMIZE, never a wrong row.
  */
class DataSkippingSpec extends AnyFunSuite {
  import SparkFixture._

  private lazy val g = {
    val wh = Files.createTempDirectory("graft-skip-wh").toString
    new GraftSession(spark, wh)
  }

  private val idAttr = AttributeReference("id", LongType)()
  private val vAttr = AttributeReference("v", StringType)()
  private def sEnc(s: String): String =
    java.util.Base64.getEncoder.encodeToString(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  // a file holding ids 10..20, strings "ccc".."mmm", no nulls, 50 rows
  private val fileStats = Map(
    "id" -> ColStat(0L, 50L, Some("10"), Some("20")),
    "v" -> ColStat(0L, 50L, Some(sEnc("ccc")), Some(sEnc("mmm"))))

  private def m(e: Expression): Boolean =
    FileSkipStats.mayMatch(Seq(e), schema, fileStats)

  test("evaluator: range algebra on integers") {
    assert(m(EqualTo(idAttr, Literal(15L))))
    assert(!m(EqualTo(idAttr, Literal(9L))))
    assert(!m(EqualTo(idAttr, Literal(21L))))
    assert(m(EqualTo(Literal(10L), idAttr)) && m(EqualTo(Literal(20L), idAttr)))
    assert(!m(LessThan(idAttr, Literal(10L))) && m(LessThan(idAttr, Literal(11L))))
    assert(m(LessThanOrEqual(idAttr, Literal(10L))))
    assert(!m(GreaterThan(idAttr, Literal(20L))) && m(GreaterThan(idAttr, Literal(19L))))
    assert(m(GreaterThanOrEqual(idAttr, Literal(20L))))
    assert(!m(GreaterThanOrEqual(idAttr, Literal(21L))))
    // literal-on-the-left mirrors: 21 < id is unsatisfiable here
    assert(!m(LessThan(Literal(20L), idAttr)) && m(LessThan(Literal(19L), idAttr)))
  }

  test("evaluator: And/Or/In/IsNull and the conservative defaults") {
    assert(!m(And(GreaterThan(idAttr, Literal(25L)), LessThan(idAttr, Literal(30L)))))
    // per-conjunct evaluation (the standard skipping algebra): each side
    // alone is satisfiable in [10,20], so the file is kept even though
    // the conjunction is empty — row-level filtering handles it
    assert(m(And(GreaterThan(idAttr, Literal(12L)), LessThan(idAttr, Literal(11L)))))
    assert(m(Or(EqualTo(idAttr, Literal(5L)), EqualTo(idAttr, Literal(12L)))))
    assert(!m(Or(EqualTo(idAttr, Literal(5L)), EqualTo(idAttr, Literal(25L)))))
    assert(m(In(idAttr, Seq(Literal(1L), Literal(15L)))))
    assert(!m(In(idAttr, Seq(Literal(1L), Literal(2L)))))
    assert(!m(IsNull(idAttr))) // nullCount 0
    assert(m(IsNotNull(idAttr)))
    // a column with no stats entry never prunes
    val other = AttributeReference("w", LongType)()
    assert(m(EqualTo(other, Literal(999L))))
    // an unmodeled predicate shape never prunes
    assert(m(GreaterThan(Abs(idAttr), Literal(999L))))
    // all-null file: value comparisons prune, IS NULL keeps
    val allNull = Map("id" -> ColStat(50L, 50L, None, None))
    assert(!FileSkipStats.mayMatch(Seq(EqualTo(idAttr, Literal(1L))), schema, allNull))
    assert(FileSkipStats.mayMatch(Seq(IsNull(idAttr)), schema, allNull))
    assert(!FileSkipStats.mayMatch(Seq(IsNotNull(idAttr)), schema, allNull))
    // unknown null count (-1): nothing null-based prunes
    val unknown = Map("id" -> ColStat(-1L, 50L, None, None))
    assert(FileSkipStats.mayMatch(Seq(IsNotNull(idAttr)), schema, unknown))
    assert(FileSkipStats.mayMatch(Seq(EqualTo(idAttr, Literal(1L))), schema, unknown))
  }

  test("evaluator: strings compare as unsigned UTF-8 bytes; StartsWith prefixes") {
    assert(m(EqualTo(vAttr, Literal(UTF8String.fromString("ggg"), StringType))))
    assert(!m(EqualTo(vAttr, Literal(UTF8String.fromString("zzz"), StringType))))
    assert(!m(EqualTo(vAttr, Literal(UTF8String.fromString("aaa"), StringType))))
    assert(m(StartsWith(vAttr, Literal(UTF8String.fromString("c"), StringType))))
    assert(m(StartsWith(vAttr, Literal(UTF8String.fromString("mmm"), StringType))))
    assert(!m(StartsWith(vAttr, Literal(UTF8String.fromString("n"), StringType))))
    // beyond-BMP: U+1F600 encodes above every ASCII byte, so it sorts
    // after "mmm" in UTF-8 order and prunes
    assert(!m(EqualTo(vAttr, Literal(UTF8String.fromString("😀"), StringType))))
  }

  test("evaluator: ±0.0 compare equal (Spark SQL semantics, legacy sidecars included)") {
    val d = AttributeReference("d", DoubleType)()
    val schemaD = StructType(Seq(StructField("d", DoubleType)))
    // a file whose recorded max is -0.0 (legacy sidecar rendering) holds
    // rows equal to 0.0 — pruning d = 0.0 would drop them
    val negZeroMax = Map("d" -> ColStat(0L, 10L, Some("-5.0"), Some("-0.0")))
    assert(FileSkipStats.mayMatch(Seq(EqualTo(d, Literal(0.0))), schemaD,
      negZeroMax))
    // symmetric: min +0.0, predicate d <= -0.0 still matches
    val posZeroMin = Map("d" -> ColStat(0L, 10L, Some("0.0"), Some("7.0")))
    assert(FileSkipStats.mayMatch(Seq(LessThanOrEqual(d, Literal(-0.0))),
      schemaD, posZeroMin))
    // a genuinely out-of-range probe still prunes
    assert(!FileSkipStats.mayMatch(Seq(EqualTo(d, Literal(1.0))), schemaD,
      negZeroMax))
  }

  test("E9 soundness sweep: pruned scans equal the in-memory truth on every predicate shape") {
    g.sql("create schema if not exists skipdb")
    g.sql("use skipdb")
    g.sql("create table t_fuzz (id bigint, d double, s char)")
    def lit(v: Any): String = v match {
      case null      => "null"
      case s: String => "'" + s + "'"
      case x         => x.toString
    }
    // three inserts with disjoint id ranges, nulls, zeros, negatives,
    // duplicates, unicode and empty strings — every file gets a
    // distinctive min/max so most predicates CAN prune something
    val rows: Seq[Seq[(Long, Any, Any)]] = Seq(
      (1L to 100L).map(i =>
        (i, if (i % 7 == 0) null else i / 10.0 - 5.0,
         if (i % 13 == 0) null else s"aa$i")),
      (5000L to 5100L).map(i => (i, 0.0: Any, s"em${i % 9}": Any)),
      (200L to 300L).map(i =>
        (i, -i / 100.0: Any,
         (if (i % 10 == 0) "" else if (i % 3 == 0) s"日本語${i % 9}"
          else s"zz$i"): Any)))
    rows.foreach { batch =>
      g.sql("insert into t_fuzz values " +
        batch.map { case (i, d, s) => s"($i, ${lit(d)}, ${lit(s)})" }
          .mkString(", "))
    }
    // the same literal rows as an in-memory truth (no files, no sidecar)
    import spark.implicits._
    rows.flatten.map { case (i, d, s) =>
      (i, d.asInstanceOf[Any] match { case x: Double => Some(x); case _ => None },
       Option(s).map(_.toString)) }
      .toDF("id", "d", "s")
      .createOrReplaceTempView("t_fuzz_truth")
    val predicates = Seq(
      "id = 5050", "id < 50", "id >= 5000", "id between 250 and 260",
      "d is null", "d is not null", "d = 0.0", "d <= -1.5",
      "s = '日本語7'", "s > 'zz'", "s like 'em%'", "s is null", "s = ''",
      "id > 90 and id < 210", "id < 10 or id > 5090",
      "id in (3, 250, 5003)", "d = 0.0 or s = ''", "d = -0.0")
    predicates.foreach { p =>
      val got = g.sql(s"select id from t_fuzz where $p order by id")
        .collect().map(_.getLong(0)).toSeq
      val want = spark.sql(
        s"select id from t_fuzz_truth where $p order by id")
        .collect().map(_.getLong(0)).toSeq
      assert(got == want, s"pruned scan diverged on predicate: $p")
    }
    // and the sweep exercised real pruning, not a disabled path
    val all = FileSkipStats.read(
      Paths.get(g.catalog.dataPath("skipdb", "t_fuzz"))).size
    assert(scansFiles(g.sql("select * from t_fuzz where id = 5050")) < all)
  }

  // ---- end to end through the engine -------------------------------------

  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    df.collect()
    def find(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case s: QueryStageExec => find(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(find)
    }
    find(df.queryExecution.executedPlan)
  }

  private def scansFiles(df: DataFrame): Long =
    scans(df).map(_.metrics("numFiles").value).sum

  /** numFiles over only the scans rooted under `pathPart` — isolates the
    * data-side scan from a merge view's tombstone scan.
    */
  private def scansFilesUnder(df: DataFrame, pathPart: String): Long =
    scans(df).filter(_.relation.location.rootPaths
        .exists(_.toString.contains(pathPart)))
      .map(_.metrics("numFiles").value).sum

  test("E9 INSERT maintains the sidecar; scans prune whole files by range") {
    g.sql("create schema if not exists skipdb")
    g.sql("use skipdb")
    g.sql("create table t_skip (id bigint, v char)")
    g.sql("insert into t_skip values " +
      (1 to 50).map(i => s"($i, 'a$i')").mkString(", "))
    val wh = g.catalog.dataPath("skipdb", "t_skip")
    val lowFiles = FileSkipStats.read(Paths.get(wh)).size
    g.sql("insert into t_skip values " +
      (1000 to 1050).map(i => s"($i, 'n$i')").mkString(", "))
    val side = Paths.get(wh).resolve(FileSkipStats.SidecarName)
    assert(Files.isRegularFile(side), "sidecar must exist after INSERT")
    val stats = FileSkipStats.read(Paths.get(wh))
    val hiFiles = stats.size - lowFiles
    assert(lowFiles >= 1 && hiFiles >= 1, "one entry per appended file")
    assert(stats.values.forall(_.contains("id")))

    val all = g.sql("select * from t_skip")
    assert(scansFiles(all) == stats.size)
    val hi = g.sql("select * from t_skip where id >= 1000")
    assert(hi.count() == 51)
    assert(scansFiles(g.sql("select * from t_skip where id >= 1000")) == hiFiles,
      "high-range predicate must scan only the high batch's files")
    assert(scansFiles(g.sql("select * from t_skip where id < 100")) == lowFiles)
    // string predicate beyond every file's range scans nothing
    val none = g.sql("select * from t_skip where v = 'zzz'")
    assert(none.count() == 0 && scansFiles(g.sql(
      "select * from t_skip where v = 'zzz'")) == 0)
    // pruning never loses a matching row
    assert(g.sql("select count(*) as c from t_skip where id = 1001")
      .collect()(0).getLong(0) == 1L)
  }

  test("E9 merge-on-read + OPTIMIZE: sidecar follows the rewrite, pruning stays exact") {
    g.sql("use skipdb")
    g.sql("create table t_skip_pk (id bigint, v char, PRIMARY KEY(id))")
    g.sql("insert into t_skip_pk values " +
      (1 to 40).map(i => s"($i, 'x$i')").mkString(", "))
    val pkDir = Paths.get(g.catalog.dataPath("skipdb", "t_skip_pk"))
    val lowFiles = FileSkipStats.read(pkDir).size
    g.sql("insert into t_skip_pk values " +
      (5000 to 5040).map(i => s"($i, 'y$i')").mkString(", "))
    val hiFiles = FileSkipStats.read(pkDir).size - lowFiles
    // reads resolve through the merge view; the base relation still
    // carries the sidecar-backed index
    assert(scansFiles(g.sql("select * from t_skip_pk where id >= 5000"))
      == hiFiles)
    g.sql("update t_skip_pk set v = 'upd' where id = 7")
    g.sql("optimize table t_skip_pk")
    val cur = g.catalog.currentVersionDir("skipdb", "t_skip_pk")
    assert(Files.isRegularFile(cur.resolve(FileSkipStats.SidecarName)),
      "rewrite must produce a fresh sidecar in the new version")
    val after = FileSkipStats.read(cur)
    assert(after.nonEmpty && after.values.forall(_.contains("id")))
    assert(g.sql("select v from t_skip_pk where id = 7")
      .collect()(0).getString(0) == "upd")
    assert(g.sql("select count(*) as c from t_skip_pk where id >= 5000")
      .collect()(0).getLong(0) == 41L)
    // post-OPTIMIZE appends keep extending the same version's sidecar
    g.sql("insert into t_skip_pk values (9000, 'z')")
    val grown = FileSkipStats.read(cur)
    assert(grown.size > after.size,
      "bucket-aligned append must add its files' stats")
    assert(g.sql("select count(*) as c from t_skip_pk where id = 9000")
      .collect()(0).getLong(0) == 1L)
  }

  test("E9 OPTIMIZE SORT BY range-clusters files so skipping prunes to O(1)") {
    g.sql("use skipdb")
    g.sql("create table t_sort (id bigint, v char)")
    // residue-ordered VALUES: a local relation splits into CONTIGUOUS
    // slices, so ordering ids round-robin makes every written file span
    // the whole id range — min/max skipping cannot prune anything yet
    g.sql("insert into t_sort values " +
      (0 until 1000).sortBy(_ % 8).map(i => s"($i, 'x$i')").mkString(", "))
    val dir = Paths.get(g.catalog.dataPath("skipdb", "t_sort"))
    val preFiles = FileSkipStats.read(dir).size
    val narrow = "select * from t_sort where id between 100 and 110"
    assert(scansFiles(g.sql(narrow)) == preFiles,
      "interleaved layout cannot prune")
    // size the target so this tiny table still splits into several
    // range files (production default is 128 MB ≈ one scan split)
    g.catalog.sortTargetFileBytes = 4096L
    val res = g.sql("optimize table t_sort sort by (id)").collect()(0)
    assert(res.getString(3) == "OK")
    val postFiles = FileSkipStats.read(dir).size
    assert(postFiles >= 2, "range repartition writes multiple files")
    assert(g.sql("select count(*) as c from t_sort").collect()(0).getLong(0)
      == 1000L)
    assert(scansFiles(g.sql(narrow)) <= 2,
      "disjoint ranges + sidecar prune the narrow scan to at most a boundary straddle")
    assert(scansFiles(g.sql("select * from t_sort where id = 505")) == 1,
      "a point predicate lands in exactly one range file")
    assert(g.sql(narrow).count() == 11)
    // merge-on-read: SORT BY still folds tombstones like any rewrite
    g.sql("create table t_sort_pk (id bigint, v char, PRIMARY KEY(id))")
    g.sql("insert into t_sort_pk values " +
      (0 until 400).sortBy(_ % 8).map(i => s"($i, 'v')").mkString(", "))
    g.sql("update t_sort_pk set v = 'upd' where id = 41")
    g.sql("optimize table t_sort_pk sort by (id)")
    assert(g.sql("select v from t_sort_pk where id = 41")
      .collect()(0).getString(0) == "upd")
    assert(g.sql("select count(*) as c from t_sort_pk").collect()(0)
      .getLong(0) == 400L)
    // the merge view also scans the tombstone dir; assert pruning on
    // the DATA-side scan alone
    assert(scansFilesUnder(g.sql(
      "select * from t_sort_pk where id = 11"), "t_sort_pk/data") == 1)
  }

  test("E9 OPTIMIZE ZORDER BY: every z-dimension prunes; lexicographic SORT BY only the first") {
    g.sql("use skipdb")
    g.sql("create table t_z (x bigint, y bigint)")
    // x uniform over [0,1024); y = 197x mod 1024 — a y-band maps to
    // x-scattered residues, so an x-sorted layout spreads any y-range
    // across every file. Round-robin insert order (residue sort) keeps
    // the PRE-optimize files full-range too.
    val zrows = (0 until 4096).map(i => (i % 1024, (i * 197) % 1024))
    g.sql("insert into t_z values " +
      zrows.sortBy(_._1 % 8).map { case (x, y) => s"($x, $y)" }
        .mkString(", "))
    g.catalog.sortTargetFileBytes = 512L // two-long rows compress hard
    val dir = Paths.get(g.catalog.dataPath("skipdb", "t_z"))
    val xProbe = "select * from t_z where x between 100 and 150"
    val yProbe = "select * from t_z where y between 100 and 150"
    val xTruth = g.sql(xProbe).count()
    val yTruth = g.sql(yProbe).count()

    // lexicographic baseline: x prunes hard, y cannot prune at all
    g.sql("optimize table t_z sort by (x, y)")
    val filesLex = FileSkipStats.read(dir).size
    assert(filesLex >= 8, s"need several files for the contrast, got $filesLex")
    val xLex = scansFiles(g.sql(xProbe))
    val yLex = scansFiles(g.sql(yProbe))
    assert(xLex <= filesLex / 2, "leading column prunes under SORT BY")
    assert(yLex == filesLex, "trailing column cannot prune under SORT BY")

    // z-order: BOTH dimensions prune, results unchanged
    g.sql("optimize table t_z zorder by (x, y)")
    val filesZ = FileSkipStats.read(dir).size
    val xZ = scansFiles(g.sql(xProbe))
    val yZ = scansFiles(g.sql(yProbe))
    assert(xZ < filesZ, s"x must prune under ZORDER ($xZ of $filesZ)")
    assert(yZ < filesZ, s"y must prune under ZORDER ($yZ of $filesZ)")
    assert(yZ < yLex, "ZORDER must beat lexicographic on the trailing column")
    assert(g.sql(xProbe).count() == xTruth)
    assert(g.sql(yProbe).count() == yTruth)
    assert(g.sql("select count(*) as c from t_z").collect()(0).getLong(0)
      == 4096L)
  }

  test("E9 bloom evaluator: exact-absent prunes, type mismatch and absent entries keep") {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import graft.sources.BloomSidecar
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    bf.putLong(XxHash64Function.hash(5L, LongType, 42L))
    bf.putLong(XxHash64Function.hash(
      UTF8String.fromString("abc"), StringType, 42L))
    assert(BloomSidecar.mayContain(bf, 5L, LongType, LongType))
    assert(!BloomSidecar.mayContain(bf, 6L, LongType, LongType))
    assert(BloomSidecar.mayContain(bf,
      UTF8String.fromString("abc"), StringType, StringType))
    assert(!BloomSidecar.mayContain(bf,
      UTF8String.fromString("abd"), StringType, StringType))
    // a literal whose type differs from the column's hashes differently
    // on the build side — must keep
    assert(BloomSidecar.mayContain(bf, 6, IntegerType, LongType))
    // float/double never bloom (NaN/±0.0 hashing) — keep
    assert(BloomSidecar.mayContain(bf, 6.0, DoubleType, DoubleType))
    // combined evaluator: bloom tightens equality past in-range min/max
    val blooms = Map("id" -> bf)
    val inRange = Map("id" -> ColStat(0L, 50L, Some("1"), Some("20")))
    assert(FileSkipStats.mayMatch(Seq(EqualTo(idAttr, Literal(5L))),
      schema, inRange, blooms))
    assert(!FileSkipStats.mayMatch(Seq(EqualTo(idAttr, Literal(6L))),
      schema, inRange, blooms), "bloom must prune an absent in-range value")
    assert(FileSkipStats.mayMatch(
      Seq(In(idAttr, Seq(Literal(6L), Literal(5L)))), schema, inRange, blooms))
    assert(!FileSkipStats.mayMatch(
      Seq(In(idAttr, Seq(Literal(6L), Literal(7L)))), schema, inRange, blooms))
    // range predicates never consult the bloom
    assert(FileSkipStats.mayMatch(Seq(GreaterThan(idAttr, Literal(6L))),
      schema, inRange, blooms))
    // a column without a bloom entry falls back to min/max alone
    assert(FileSkipStats.mayMatch(Seq(EqualTo(idAttr, Literal(6L))),
      schema, inRange, Map.empty))
  }

  test("E9 bloom sidecar: point probes prune on an unclustered high-card column") {
    import graft.sources.BloomSidecar
    g.sql("create schema if not exists skipdb")
    g.sql("use skipdb")
    g.sql("create table t_bloom (d bigint, okey bigint, s varchar(20))")
    // okey = (i*394) % 8192 hits exactly the EVEN residues (gcd 2) —
    // every odd value is provably absent. Sorting by d clusters files on
    // d while each file's okey values span the whole domain: min/max
    // cannot prune an okey probe (the r14 SKIPBENCH gap), the bloom must.
    g.catalog.bloomMinRows = 256L
    g.catalog.sortTargetFileBytes = 8192L
    try {
      val n = 4096
      def okey(i: Int): Int = (i * 394) % 8192
      g.sql("insert into t_bloom values " + (0 until n)
        .map(i => s"(${i / 512}, ${okey(i)}, 'k${okey(i)}')").mkString(", "))
      g.sql("optimize table t_bloom sort by (d)")
      val dir = Paths.get(g.catalog.dataPath("skipdb", "t_bloom"))
      val blooms = BloomSidecar.read(dir)
      assert(blooms.nonEmpty, "OPTIMIZE-written files must get bloom entries")
      assert(blooms.values.forall(m => m.contains("okey") && m.contains("s")))
      val total = FileSkipStats.read(dir).size
      assert(total >= 4, s"need several files for the contrast, got $total")
      // present value: found, and pruned to (almost) the files holding it
      val hit = okey(1000)
      assert(g.sql(s"select count(*) as c from t_bloom where okey = $hit")
        .collect()(0).getLong(0) == 1L)
      // absent value, in-range for every file: min/max keeps all files,
      // the bloom prunes ALL of them (FPR at 10 bits/value is ~1%, and
      // pruning is per-file so a single FP would still leave < total)
      val missFiles = scansFiles(
        g.sql("select * from t_bloom where okey = 4095"))
      assert(missFiles < total,
        s"bloom must prune an absent unclustered point probe ($missFiles of $total)")
      assert(g.sql("select count(*) as c from t_bloom where okey = 4095")
        .collect()(0).getLong(0) == 0L)
      // string column blooms too
      val sMiss = scansFiles(
        g.sql("select * from t_bloom where s = 'k4095'"))
      assert(sMiss < total)
      assert(g.sql(s"select s from t_bloom where s = 'k$hit'")
        .collect()(0).getString(0) == s"k$hit")
      // IN (present, absent) keeps exactly the present value's rows
      assert(g.sql(
        s"select count(*) as c from t_bloom where okey in ($hit, 4095)")
        .collect()(0).getLong(0) == 1L)
      // carry-over: a concurrent-append-free OPTIMIZE keeps bloom
      // coverage on its fresh files (rebuilt), and results stay exact
      g.sql("optimize table t_bloom sort by (okey)")
      assert(g.sql("select count(*) as c from t_bloom where okey = 4095")
        .collect()(0).getLong(0) == 0L)
      assert(g.sql(s"select count(*) as c from t_bloom where okey = $hit")
        .collect()(0).getLong(0) == 1L)
      assert(g.sql("select count(*) as c from t_bloom").collect()(0)
        .getLong(0) == n.toLong)
    } finally {
      g.catalog.bloomMinRows = 1024L
      g.catalog.sortTargetFileBytes = 128L * 1024 * 1024
    }
  }

  test("E9 bloom sidecar: files larger than the runtime-bloom item ceiling still get blooms") {
    import graft.sources.BloomSidecar
    g.sql("create schema if not exists skipdb")
    g.sql("use skipdb")
    g.sql("create table t_bigbloom (okey bigint)")
    val conf = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val prev = g.spark.conf.get(conf)
    g.catalog.bloomMinRows = 64L
    try {
      // a per-file row count ABOVE the session ceiling: pre-clamp this
      // failed BloomFilterAggregate's type check inside the advisory
      // guard and silently dropped blooms for the whole batch — exactly
      // the large files point-probe skipping exists for
      g.spark.conf.set(conf, "500")
      g.sql("insert into t_bigbloom values " +
        (0 until 1200).map(i => s"(${i * 2})").mkString(", "))
      val dir = Paths.get(g.catalog.dataPath("skipdb", "t_bigbloom"))
      val blooms = BloomSidecar.read(dir)
      assert(blooms.nonEmpty && blooms.values.forall(_.contains("okey")),
        "oversized files must get (densified) blooms, not a silent drop")
      // the densified sketch stays SOUND: the present value is found
      assert(g.sql("select count(*) as c from t_bigbloom where okey = 40")
        .collect()(0).getLong(0) == 1L)
      assert(g.sql("select count(*) as c from t_bigbloom where okey = 41")
        .collect()(0).getLong(0) == 0L)
    } finally {
      g.spark.conf.set(conf, prev)
      g.catalog.bloomMinRows = 1024L
      g.sql("drop table t_bigbloom")
    }
  }

  test("E9/B2 unique-column point probes prune files (the reference's level-1 seek, re-expressed)") {
    // the reference seeks through its unique (level-1/2) sled indexes
    // (store/reader/reader_util.rs:333); graft's read-path answer is the
    // sidecar stack — a point probe on a DECLARED UNIQUE column prunes
    // whole files via min/max (clustered) or blooms (unclustered)
    // before any task is scheduled, no physical index maintained
    g.sql("create schema if not exists skipdb")
    g.sql("use skipdb")
    g.sql("create table t_useek (id bigint primary key, email_h bigint, " +
      "unique key uq_eh (email_h))")
    g.catalog.bloomMinRows = 64L
    try {
      // id-clustered batches; email_h deliberately UNCLUSTERED (the
      // hash shape a unique email column has in practice) and SPANNING
      // THE SAME RANGE in both files — min/max cannot prune the point
      // probe below, only the bloom can (the assertion pins blooms,
      // not range luck)
      g.sql("insert into t_useek values " +
        (0 until 512).map(i => s"($i, ${(i * 2687) % 8192})").mkString(", "))
      g.sql("insert into t_useek values " +
        (512 until 1024).map(i => s"($i, ${(i * 2687) % 8192 + 1})")
          .mkString(", "))
      val dir = Paths.get(g.catalog.dataPath("skipdb", "t_useek"))
      val total = FileSkipStats.readAll(dir).size
      assert(total >= 2)
      // pk point seek: min/max prunes to the one covering file
      val pkScan = scansFiles(g.sql("select * from t_useek where id = 700"))
      assert(pkScan < total, s"pk probe must prune ($pkScan of $total)")
      // unique-column point seek: an ABSENT value inside every file's
      // range — only the bloom can prune, and it prunes everything
      val taken = g.sql("select distinct email_h from t_useek")
        .collect().map(_.getLong(0)).toSet
      // a bloom is probabilistic (~1% FP per file at 10 bits/value):
      // probe a few verified-absent values and require that at least
      // one prunes EVERYTHING — min/max can never do that here
      val probes = (0 until 8192).filter(v => !taken.contains(v.toLong)).take(3)
      val uScans = probes.map(v => scansFiles(
        g.sql(s"select * from t_useek where email_h = $v")))
      assert(uScans.min == 0,
        s"unique-column absent probes must bloom-prune every file " +
          s"(min/max cannot help here; scans=$uScans of $total)")
      // present value: found exactly once (the constraint's promise)
      val one = taken.head
      assert(g.sql(s"select count(*) as c from t_useek where email_h = $one")
        .collect()(0).getLong(0) == 1L)
    } finally g.catalog.bloomMinRows = 1024L
  }

  test("EXPLAIN ANALYZE surfaces filesPrunedBySkipping on the scan node") {
    g.sql("create schema if not exists skipdb")
    g.sql("use skipdb")
    g.sql("create table t_ea (id bigint, v char)")
    g.sql("insert into t_ea values " +
      (1 to 50).map(i => s"($i, 'a')").mkString(", "))
    g.sql("insert into t_ea values " +
      (1000 to 1050).map(i => s"($i, 'b')").mkString(", "))
    val plan = g.sql("explain analyze select * from t_ea where id >= 1000")
      .collect()(0).getString(1)
    val m = "filesPrunedBySkipping=(\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"scan node must report the skipping metric:\n$plan")
    assert(m.get.group(1).toLong >= 1L,
      s"the low batch's files must count as pruned:\n$plan")
    // an unpruned scan reports 0, not absence
    val full = g.sql("explain analyze select * from t_ea where id >= 0")
      .collect()(0).getString(1)
    assert(full.contains("filesPrunedBySkipping=0"), full)
  }

  test("E9 partitioned tables: directory pruning composes with file skipping") {
    g.sql("use skipdb")
    g.sql("create table t_part (id bigint, site varchar(10)) partition by (site)")
    // two appends per partition with disjoint id ranges
    g.sql("insert into t_part values " +
      (1 to 20).map(i => s"($i, 'us')").mkString(", ") + ", " +
      (1 to 20).map(i => s"($i, 'eu')").mkString(", "))
    g.sql("insert into t_part values " +
      (900 to 920).map(i => s"($i, 'us')").mkString(", ") + ", " +
      (900 to 920).map(i => s"($i, 'eu')").mkString(", "))
    val dir = Paths.get(g.catalog.dataPath("skipdb", "t_part"))
    val stats = FileSkipStats.readAll(dir)
    assert(stats.nonEmpty, "partitioned appends must record sidecar entries")
    // partition filter prunes the directory, data filter prunes files
    // inside the surviving partition (the pruned listing roots at the
    // partition dir — statsFor walks up to the table sidecar)
    val both = g.sql("select * from t_part where site = 'us' and id >= 900")
    assert(both.count() == 21)
    val usFiles = scansFiles(g.sql("select * from t_part where site = 'us'"))
    val pruned = scansFiles(g.sql(
      "select * from t_part where site = 'us' and id >= 900"))
    assert(pruned < usFiles,
      s"file skipping must engage inside the partition ($pruned vs $usFiles)")
  }

  test("E9 partitioned tables: sidecar keys are partition-relative paths, never bare names") {
    g.sql("use skipdb")
    g.sql("create table t_pcol (id bigint, site varchar(10)) partition by (site)")
    // ONE interleaved insert: the dynamic-partition writer reuses the
    // same part-NNNNN-<uuid> file name in every partition dir a task
    // writes, so bare-name sidecar keys collide across partitions.
    // DISJOINT id ranges per partition make a collision observable:
    // with name-keyed stats, 'site = us AND id <= 20' evaluated us
    // files against eu's [500,520] bounds and returned 0 rows (silent
    // data loss). Keys must be dir-relative paths.
    g.sql("insert into t_pcol values " +
      (1 to 20).map(i => s"($i, 'us')").mkString(", ") + ", " +
      (500 to 520).map(i => s"($i, 'eu')").mkString(", "))
    val dir = Paths.get(g.catalog.dataPath("skipdb", "t_pcol"))
    val stats = FileSkipStats.readAll(dir)
    assert(stats.nonEmpty)
    assert(stats.keySet.forall(_.contains("site=")),
      s"sidecar keys must include the partition subdir, got ${stats.keySet}")
    // every key is unique by construction of a Map — verify no entry was
    // LOST to a collision: each partition dir's parquet files are covered
    for (p <- Seq("us", "eu")) {
      val pdir = dir.resolve(s"site=$p")
      val files = Files.list(pdir).iterator()
      while (files.hasNext) {
        val n = files.next().getFileName.toString
        if (n.endsWith(".parquet"))
          assert(stats.contains(s"site=$p/$n"),
            s"missing sidecar entry for site=$p/$n")
      }
    }
    // the advice's exact probe: every us row must survive
    assert(g.sql("select * from t_pcol where site = 'us' and id <= 20")
      .count() == 20)
    assert(g.sql("select * from t_pcol where site = 'eu' and id >= 500")
      .count() == 21)
    // and cross-partition bounds must not leak: us files prune for a
    // eu-range probe, so the scan under site=us reads zero files
    assert(g.sql("select * from t_pcol where site = 'us' and id >= 500")
      .count() == 0)
  }

  test("E9 sharded sidecars: one _graft_stats/_graft_bloom per partition dir; pruning unchanged") {
    g.sql("use skipdb")
    g.sql("create table t_shard (id bigint, okey bigint, site varchar(10)) " +
      "partition by (site)")
    g.catalog.bloomMinRows = 8L
    try {
      // two appends per partition with disjoint id ranges (file pruning
      // must engage inside a partition) and bloom-able okey values
      g.sql("insert into t_shard values " +
        (1 to 20).map(i => s"($i, ${i * 2}, 'us')").mkString(", ") + ", " +
        (1 to 20).map(i => s"($i, ${i * 2}, 'eu')").mkString(", "))
      g.sql("insert into t_shard values " +
        (900 to 920).map(i => s"($i, ${i * 2}, 'us')").mkString(", ") + ", " +
        (900 to 920).map(i => s"($i, ${i * 2}, 'eu')").mkString(", "))
      val dir = Paths.get(g.catalog.dataPath("skipdb", "t_shard"))
      // layout: marker at the root, one sidecar (+blooms) per partition
      // dir, NO monolithic root sidecar (all data files are nested)
      assert(Files.exists(dir.resolve(FileSkipStats.ShardMarker)),
        "sharded writes must drop the root marker")
      assert(!Files.isRegularFile(dir.resolve(FileSkipStats.SidecarName)),
        "a fully-partitioned table must not grow a root sidecar")
      for (p <- Seq("us", "eu")) {
        val pd = dir.resolve(s"site=$p")
        assert(Files.isRegularFile(pd.resolve(FileSkipStats.SidecarName)),
          s"partition dir site=$p must carry its own stats shard")
        assert(Files.isRegularFile(
          pd.resolve(graft.sources.BloomSidecar.SidecarName)),
          s"partition dir site=$p must carry its own bloom shard")
        // shard keys are bare names covering exactly the dir's files
        val shard = FileSkipStats.read(pd)
        val files = Files.list(pd).iterator().asScala
          .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
        assert(shard.keySet == files, s"site=$p shard: ${shard.keySet}")
      }
      // readAll unions shards under root-relative keys (CBO/backfill path)
      val all = FileSkipStats.readAll(dir)
      assert(all.keySet.forall(_.contains("site=")) && all.size >= 4, all.keySet)
      // pruning counts: unchanged from the monolithic design — partition
      // pruning + in-partition file pruning compose
      assert(g.sql("select * from t_shard where site = 'us' and id >= 900")
        .count() == 21)
      val usFiles = scansFiles(g.sql("select * from t_shard where site = 'us'"))
      val pruned = scansFiles(g.sql(
        "select * from t_shard where site = 'us' and id >= 900"))
      assert(pruned < usFiles,
        s"file skipping must engage inside the partition ($pruned vs $usFiles)")
      // bloom shards engage on point probes of the unclustered okey
      assert(g.sql("select count(*) as c from t_shard " +
        "where site = 'us' and okey = 41").collect()(0).getLong(0) == 0L)
      assert(g.sql("select count(*) as c from t_shard " +
        "where site = 'us' and okey = 40").collect()(0).getLong(0) == 1L)
      // rewrite path (ALTER → CoW rewrite): the new version's files are
      // re-recorded into fresh shards and pruning still engages
      g.sql("alter table t_shard add column extra int")
      val cur = g.catalog.currentVersionDir("skipdb", "t_shard")
      assert(Files.exists(cur.resolve(FileSkipStats.ShardMarker)))
      val allNew = FileSkipStats.readAll(cur)
      assert(allNew.nonEmpty && allNew.keySet.forall(_.contains("site=")))
      assert(g.sql("select * from t_shard where site = 'us' and id >= 900")
        .count() == 21)
      val prunedNew = scansFiles(g.sql(
        "select * from t_shard where site = 'us' and id >= 900"))
      val usNew = scansFiles(g.sql("select * from t_shard where site = 'us'"))
      assert(prunedNew < usNew, s"$prunedNew vs $usNew after rewrite")
    } finally g.catalog.bloomMinRows = 1024L
  }

  test("E9 OPTIMIZE SORT BY on a partitioned table range-clusters WITHIN each partition dir") {
    g.sql("use skipdb")
    g.sql("create table t_psort (id bigint, v bigint, site varchar(10)) " +
      "partition by (site)")
    // interleaved ids per partition so the pre-OPTIMIZE layout is
    // unclustered; small file target so each dir gets several files
    val rows = (0 until 8000).map { i =>
      s"(${(i * 997) % 8000}, $i, '${if (i % 2 == 0) "us" else "eu"}')" }
    g.sql("insert into t_psort values " + rows.mkString(", "))
    g.catalog.sortTargetFileBytes = 4096L
    try {
      g.sql("optimize table t_psort sort by (id)")
      val dir = Paths.get(g.catalog.dataPath("skipdb", "t_psort"))
      for (p <- Seq("us", "eu")) {
        val pd = dir.resolve(s"site=$p")
        val shard = FileSkipStats.read(pd)
        assert(shard.size >= 3, s"site=$p needs several files, got ${shard.size}")
        // each dir's files are range-DISJOINT on id (the shard-aware
        // layout: partition cols lead the range keys) — overlapping
        // bounds would mean global slices were split across dirs
        val bounds = shard.values.toSeq
          .map(cs => (cs("id").min.get.toLong, cs("id").max.get.toLong))
          .sortBy(_._1)
        bounds.sliding(2).foreach {
          case Seq((_, aMax), (bMin, _)) =>
            assert(aMax <= bMin, s"site=$p files overlap on id: $bounds")
          case _ =>
        }
      }
      // and a narrow range scan inside one partition prunes to O(1) files
      val scanned = scansFiles(g.sql(
        "select * from t_psort where site = 'us' and id between 100 and 140"))
      val total = FileSkipStats.read(dir.resolve("site=us")).size
      assert(scanned < total, s"range scan must prune ($scanned of $total)")
      assert(g.sql("select count(*) as c from t_psort").collect()(0)
        .getLong(0) == 8000L)
      // a partition col listed at a NON-LEADING position must not demote
      // the layout back to global slices: partition cols always lead
      g.sql("optimize table t_psort sort by (id, site)")
      val shardUs = FileSkipStats.read(
        Paths.get(g.catalog.dataPath("skipdb", "t_psort")).resolve("site=us"))
      val bounds2 = shardUs.values.toSeq
        .map(cs => (cs("id").min.get.toLong, cs("id").max.get.toLong))
        .sortBy(_._1)
      bounds2.sliding(2).foreach {
        case Seq((_, aMax), (bMin, _)) =>
          assert(aMax <= bMin, s"trailing partition col broke the layout: $bounds2")
        case _ =>
      }
      assert(shardUs.size >= 3, s"per-dir sizing lost: ${shardUs.size} files")
    } finally g.catalog.sortTargetFileBytes = 128L * 1024 * 1024
  }

  test("E9 legacy nested-key root sidecars still prune and upgrade to shards on rewrite") {
    g.sql("use skipdb")
    g.sql("create table t_legacy (id bigint, site varchar(10)) partition by (site)")
    g.sql("insert into t_legacy values " +
      (1 to 20).map(i => s"($i, 'us')").mkString(", "))
    g.sql("insert into t_legacy values " +
      (900 to 920).map(i => s"($i, 'us')").mkString(", "))
    val dir = Paths.get(g.catalog.dataPath("skipdb", "t_legacy"))
    // forge the pre-r16 layout: fold every shard into a nested-key ROOT
    // sidecar, drop the shards and the marker
    val all = FileSkipStats.readAll(dir)
    assert(all.nonEmpty)
    val lines = all.toSeq.sortBy(_._1).flatMap { case (f, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, s) =>
        s"$f\t$c\t${s.nullCount}\t${s.valueCount}\t${s.min.getOrElse("")}\t${s.max.getOrElse("")}"
      }
    }
    Files.write(dir.resolve(FileSkipStats.SidecarName), lines.asJava)
    Files.walk(dir).iterator().asScala
      .filter(p => p.getParent != dir &&
        (p.getFileName.toString == FileSkipStats.SidecarName ||
         p.getFileName.toString == graft.sources.BloomSidecar.SidecarName))
      .toList.foreach(Files.delete)
    Files.deleteIfExists(dir.resolve(FileSkipStats.ShardMarker))
    // the legacy layout prunes exactly as before
    assert(g.sql("select * from t_legacy where site = 'us' and id >= 900")
      .count() == 21)
    val usFiles = scansFiles(g.sql("select * from t_legacy where site = 'us'"))
    val pruned = scansFiles(g.sql(
      "select * from t_legacy where site = 'us' and id >= 900"))
    assert(pruned < usFiles, s"legacy root sidecar must prune ($pruned/$usFiles)")
    // a BLOOM-ONLY shard write must flip the root marker too: on this
    // forged legacy layout the min/max root sidecar covers every file
    // (so FileSkipStats.record never runs) while blooms are missing —
    // ANALYZE writes bloom shards, and without the marker neither
    // readAll nor the scan path would ever see them (and every later
    // ANALYZE would rebuild them forever)
    // (ANALYZE's bloom backfill hardcodes minRows = 1 — an explicit
    // stats request covers every file regardless of the commit-path gate)
    g.sql("analyze table t_legacy")
    assert(Files.exists(dir.resolve(FileSkipStats.ShardMarker)),
      "a bloom-only shard write must create the root marker")
    val blooms = graft.sources.BloomSidecar.readAll(dir)
    assert(blooms.nonEmpty && blooms.keySet.forall(_.contains("site=")),
      s"bloom shards must be visible through readAll: ${blooms.keySet}")
    // a rewrite re-records the new version's files into SHARDS — the
    // legacy monolith dies with its version, the upgrade is automatic
    g.sql("alter table t_legacy add column extra int")
    val cur = g.catalog.currentVersionDir("skipdb", "t_legacy")
    val allNew = FileSkipStats.readAll(cur)
    assert(allNew.nonEmpty && allNew.keySet.forall(_.contains("site=")))
    assert(g.sql("select * from t_legacy where site = 'us' and id >= 900")
      .count() == 21)
  }

  test("E9 an append racing OPTIMIZE keeps full sidecar coverage (carry-over path)") {
    g.sql("use skipdb")
    g.sql("create table t_race (id bigint, v char, PRIMARY KEY(id))")
    g.sql("insert into t_race values " +
      (1 to 30).map(i => s"($i, 'a')").mkString(", "))
    val cat = g.catalog
    // inject a concurrent append between the rewrite's snapshot and its
    // commit: its files are hard-linked into the new version at commit
    // and must arrive WITH their sidecar entries
    cat.onRewriteBeforeCommit =
      () => g.sql("insert into t_race values " +
        (8000 to 8020).map(i => s"($i, 'r')").mkString(", "))
    try g.sql("optimize table t_race")
    finally cat.onRewriteBeforeCommit = () => ()
    val cur = cat.currentVersionDir("skipdb", "t_race")
    val stats = FileSkipStats.read(cur)
    val dataFiles = Files.list(cur).iterator()
    var uncovered = List.empty[String]
    while (dataFiles.hasNext) {
      val n = dataFiles.next().getFileName.toString
      if (n.endsWith(".parquet") && !stats.contains(n)) uncovered ::= n
    }
    assert(uncovered.isEmpty,
      s"carried-over racing-append files must keep sidecar entries: $uncovered")
    assert(g.sql("select count(*) as c from t_race").collect()(0)
      .getLong(0) == 51L)
    // and the carried entries actually prune
    assert(scansFilesUnder(g.sql(
      "select * from t_race where id >= 8000"), "t_race/data") < stats.size)
  }

  test("untrusted (backfill/external) float bounds drop max, keep min") {
    // NaN-excluding writers (Arrow C++, parquet-rs) omit NaN from footer
    // bounds while Spark orders NaN above every double: a trusted max
    // could prune 'd > lit' files whose only matching rows are NaN. The
    // untrusted collection path must therefore drop double MAX (upper
    // bounds are the unsafe side) and keep MIN (NaN never undercuts it).
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-untrusted")
    Seq((1L, 1.5), (2L, 7.5)).toDF("id", "d")
      .coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val rel = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSeq
    val schemaD = StructType(Seq(
      StructField("id", LongType), StructField("d", DoubleType)))
    val conf = spark.sessionState.newHadoopConf()
    val trusted = FileSkipStats.collect(conf, dir, rel, schemaD)
    val untrusted = FileSkipStats.collect(conf, dir, rel, schemaD,
      trusted = false)
    val tStat = trusted(rel.head)("d")
    val uStat = untrusted(rel.head)("d")
    assert(tStat.min.isDefined && tStat.max.isDefined)
    assert(uStat.min == tStat.min, "untrusted keeps the (safe) lower bound")
    assert(uStat.max.isEmpty, "untrusted must drop the double upper bound")
    // integral columns are NaN-free: bounds survive untrusted collection
    assert(untrusted(rel.head)("id").max.isDefined)
    // consequence: d > 100 cannot prune the untrusted file, d < 0 still can
    val dAttr = AttributeReference("d", DoubleType)()
    assert(FileSkipStats.mayMatch(Seq(GreaterThan(dAttr, Literal(100.0))),
      schemaD, untrusted(rel.head)))
    assert(!FileSkipStats.mayMatch(Seq(LessThan(dAttr, Literal(0.0))),
      schemaD, untrusted(rel.head)))
  }

  test("reserved _graft_* column names are rejected at CREATE and ALTER ADD") {
    g.sql("use skipdb")
    for (bad <- Seq("_graft_z", "_graft_seq", "_GRAFT_anything")) {
      val e = intercept[Exception](
        g.sql(s"create table t_reserved (id bigint, `$bad` double)"))
      assert(e.getMessage.toLowerCase.contains("reserved"), e.getMessage)
    }
    g.sql("create table t_reserved_ok (id bigint)")
    val e = intercept[Exception](
      g.sql("alter table t_reserved_ok add column _graft_z double"))
    assert(e.getMessage.toLowerCase.contains("reserved"), e.getMessage)
  }

  test("sidecar column stats feed CBO: a filtered join side broadcasts that plain sizes miss") {
    g.sql("create schema if not exists skipdb")
    g.sql("use skipdb")
    g.sql("create table cbo_fact (id bigint, k bigint)")
    g.sql("create table cbo_other (id bigint, k bigint)")
    // md5-derived k defeats parquet's delta encoding so the files stay
    // comfortably above the derived broadcast threshold
    def kOf(i: Int): Long = (i * 2654435761L) % 100
    g.sql("insert into cbo_fact values " +
      (0 until 4000).map(i => s"($i, ${kOf(i)})").mkString(", "))
    g.sql("insert into cbo_other values " +
      (0 until 4000).map(i => s"(${i + 100000}, ${kOf(i + 7)})").mkString(", "))
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(
      "cbo_fact", Some("skipdb"))
    val st = spark.sessionState.catalog.getTableMetadata(ident).stats.get
    assert(st.rowCount.contains(BigInt(4000)))
    // the sidecar's folded min/max/nullCount register as column stats
    val cs = st.colStats("id")
    assert(cs.min.contains("0") && cs.max.contains("3999"), cs.toString)
    assert(cs.nullCount.contains(BigInt(0)))
    // ANALYZE arms the estimator's ndv (FilterEstimation refuses range
    // predicates without a distinct count); min/max/nullCount were
    // already fresh from the commit-time sidecar fold
    g.sql("analyze table cbo_fact")
    assert(spark.sessionState.catalog.getTableMetadata(ident)
      .stats.get.colStats("id").distinctCount.isDefined)
    withConf("spark.sql.cbo.enabled" -> "true",
             "spark.sql.cbo.planStats.enabled" -> "true") {
      // selectivity: id < 40 over [0, 3999] estimates ~1% of the rows
      val est = g.sql("select * from cbo_fact where id < 40")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.exists(r => r >= BigInt(1) && r <= BigInt(400)),
        s"range selectivity must shrink the estimate, got $est")
    }
    // join-strategy contrast: threshold below BOTH full table sizes but
    // above the filtered estimate — only the CBO estimate can broadcast
    val otherBytes = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(
        "cbo_other", Some("skipdb"))).stats.get.sizeInBytes
    val threshold = (st.sizeInBytes.min(otherBytes) / 2).toString
    def joinPlan(): String = g.sql(
      "select * from cbo_fact f join cbo_other o on f.k = o.k " +
        "where f.id < 40").queryExecution.executedPlan.toString
    withConf("spark.sql.autoBroadcastJoinThreshold" -> threshold,
             "spark.sql.adaptive.enabled" -> "false") {
      withConf("spark.sql.cbo.enabled" -> "false") {
        val q = g.sql("select * from cbo_fact f join cbo_other o on " +
          "f.k = o.k where f.id < 40")
        assert(!q.queryExecution.executedPlan.toString
            .contains("BroadcastHashJoin"),
          s"without CBO the filtered side keeps its full size estimate; " +
            s"threshold=$threshold\n${q.queryExecution.optimizedPlan.toString}\n" +
            q.queryExecution.optimizedPlan.collectLeaves()
              .map(_.stats.toString).mkString("\n"))
      }
      withConf("spark.sql.cbo.enabled" -> "true",
               "spark.sql.cbo.planStats.enabled" -> "true") {
        assert(joinPlan().contains("BroadcastHashJoin"),
          s"CBO column stats must unlock the broadcast:\n${joinPlan()}")
      }
    }
  }

  test("ANALYZE TABLE: bare MySQL form works for a table NAMED like the clause") {
    g.sql("create schema if not exists skipdb")
    g.sql("use skipdb")
    g.sql("create table compute_jobs (id bigint)")
    g.sql("insert into compute_jobs values (1), (2)")
    // the bare-form detector must key on statement SHAPE, not a
    // substring ('compute' appears in the table name here)
    g.sql("analyze table compute_jobs")
    val st = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(
        "compute_jobs", Some("skipdb"))).stats
    assert(st.exists(_.rowCount.contains(BigInt(2))), st.toString)
    // the explicit Spark form still passes through
    g.sql("analyze table compute_jobs compute statistics")
  }

  test("post-commit catalog stats: every DML leaves fresh rowCount/sizeInBytes") {
    g.sql("use skipdb")
    g.sql("create table t_stats (id bigint, v char)")
    def stats(name: String) = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name, Some("skipdb"))).stats
    g.sql("insert into t_stats values " +
      (1 to 25).map(i => s"($i, 'a')").mkString(", "))
    val s1 = stats("t_stats")
    assert(s1.exists(_.rowCount.contains(BigInt(25))),
      s"insert must refresh rowCount, got $s1")
    assert(s1.exists(_.sizeInBytes > 0))
    g.sql("insert into t_stats values (26, 'b')")
    assert(stats("t_stats").exists(_.rowCount.contains(BigInt(26))))
    // merge-on-read: the BASE relation (what plans scan) carries stats;
    // UPDATE appends a row version, OPTIMIZE folds back down
    g.sql("create table t_stats_pk (id bigint, v char, PRIMARY KEY(id))")
    g.sql("insert into t_stats_pk values " +
      (1 to 10).map(i => s"($i, 'x')").mkString(", "))
    assert(stats("t_stats_pk__graft_base")
      .exists(_.rowCount.contains(BigInt(10))))
    g.sql("update t_stats_pk set v = 'y' where id = 3")
    assert(stats("t_stats_pk__graft_base")
      .exists(_.rowCount.contains(BigInt(11))), "update appends a version")
    g.sql("optimize table t_stats_pk")
    assert(stats("t_stats_pk__graft_base")
      .exists(_.rowCount.contains(BigInt(10))), "optimize folds tombstones")
  }

  test("E9 ANALYZE TABLE backfills a missing sidecar (pre-E9 warehouse path)") {
    g.sql("use skipdb")
    g.sql("create table t_bf (id bigint, v char)")
    g.sql("insert into t_bf values " +
      (1 to 30).map(i => s"($i, 'a')").mkString(", "))
    g.sql("insert into t_bf values " +
      (700 to 730).map(i => s"($i, 'b')").mkString(", "))
    val dir = Paths.get(g.catalog.dataPath("skipdb", "t_bf"))
    val full = FileSkipStats.read(dir)
    assert(full.nonEmpty)
    // simulate a warehouse written before data skipping existed
    Files.delete(dir.resolve(FileSkipStats.SidecarName))
    assert(scansFiles(g.sql("select * from t_bf where id >= 700"))
      == full.size, "no sidecar - no pruning")
    g.sql("analyze table skipdb.t_bf compute statistics")
    val back = FileSkipStats.read(dir)
    assert(back.keySet == full.keySet, "backfill covers every file")
    assert(scansFiles(g.sql("select * from t_bf where id >= 700"))
      < full.size, "backfilled sidecar prunes again")
    assert(g.sql("select count(*) as c from t_bf where id >= 700")
      .collect()(0).getLong(0) == 31L)
  }
}
