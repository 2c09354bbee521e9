package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Base64

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** File-level min/max data skipping for graft-managed tables (SURVEY
  * §2.E9) — the lakehouse planning-time pruning layer (the design Delta
  * calls data skipping and Iceberg keeps in manifest entries; the
  * reference's sled engine gets the single-node analogue from key-prefix
  * scoping, store/reader/sled.rs:1).
  *
  * Parquet already row-group-prunes INSIDE a task via pushed filters;
  * what it cannot do is avoid SCHEDULING a task per file split. At
  * 100 TB a managed table is 10⁵–10⁶ files, so a selective predicate
  * still pays a full task wave without file-level pruning. The commit
  * protocol therefore maintains a per-version `_graft_stats` sidecar —
  * per data file, per leaf column: null count, value count, min, max,
  * read straight from the parquet footers of exactly the files each
  * commit adds (cost proportional to the batch, never the table) — and
  * the scan path prunes whole files against it before tasks exist.
  *
  * The evaluator answers "MAY this file contain a matching row" — it
  * must never prune a file that could match, and unknowns always answer
  * yes: a file with no sidecar entry, a column with no footer stats, a
  * predicate shape it does not model, a type it does not order. Strings
  * compare as unsigned UTF-8 bytes (parquet's UTF8 comparator — Java
  * String order would differ beyond the BMP and mis-prune).
  */
object FileSkipStats {

  /** One column's footer aggregate for one file. `nullCount = -1` means
    * unknown (some row group carried no stats); min/max of None means
    * un-prunable on range.
    */
  case class ColStat(nullCount: Long, valueCount: Long,
                     min: Option[String], max: Option[String])

  val SidecarName = "_graft_stats"

  /** Sidecar entries are keyed by the file's path RELATIVE to the
    * sidecar's directory (partition subdirs included), normalized to
    * forward slashes. Bare file names are NOT unique across partition
    * directories: Spark's dynamic-partition writer reuses the same
    * part-NNNNN-<uuid> name in every partition dir one task writes, so
    * name-keyed entries collide and a scan would evaluate a file
    * against another partition's min/max — silent wrong pruning.
    * (Partition values are path-escaped by Spark, so keys stay
    * tab-free and the TSV sidecar format holds.)
    */
  def relKey(rel: String): String = {
    val n = rel.replace('\\', '/')
    if (n.startsWith("./")) n.substring(2) else n
  }

  // ---- footer collection --------------------------------------------------

  /** Spark types the sidecar can order; everything else is skipped at
    * collection (⇒ conservatively kept at scan).
    */
  private def domain(dt: DataType): Option[Char] = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType => Some('l')
    case FloatType | DoubleType => Some('d')
    case StringType => Some('s')
    case BooleanType => Some('l')
    case _ => None
  }

  /** Per-column stats of `relPaths` (relative to `dir`), straight from
    * the parquet footers. Row-group stats aggregate: null counts sum,
    * min/max fold; any group missing stats for a column degrades that
    * column to unknown.
    */
  /** Per-file, per-column accumulator with EXPLICIT bounds validity:
    * "no bound folded yet" and "some row group's bound is unknowable"
    * are different states — conflating them would let a later known
    * group resurrect min/max over an earlier unknown one (a lying
    * sidecar that prunes real rows).
    */
  private final class Acc {
    var nulls: Long = 0L // -1 = unknown
    var values: Long = 0L
    var min: String = null
    var max: String = null
    var boundsValid: Boolean = true
    def toStat: ColStat = ColStat(nulls, values,
      if (boundsValid && min != null) Some(min) else None,
      if (boundsValid && max != null) Some(max) else None)
  }

  /** `trusted = false` marks files NOT written by graft's own parquet-mr
    * path (ANALYZE TABLE backfill of externally landed files, rewrite
    * carry-over of files the old sidecar never covered). NaN-excluding
    * writers (Arrow C++, parquet-rs) omit NaN from footer bounds while
    * Spark orders NaN ABOVE every double, so a recorded max may sit
    * below real (NaN) rows and `col > lit` would wrongly prune. For
    * such files float/double MAX bounds are dropped (min stays — NaN
    * can never undercut a lower bound).
    */
  def collect(conf: Configuration, dir: Path, relPaths: Iterable[String],
              schema: StructType,
              trusted: Boolean = true): Map[String, Map[String, ColStat]] = {
    val types: Map[String, DataType] =
      schema.fields.map(f => f.name -> f.dataType).toMap
    relPaths.iterator.filter(_.endsWith(".parquet")).flatMap { rel =>
      val p = dir.resolve(rel)
      try {
        val in = HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p.toUri), conf)
        val footer =
          scala.util.Using.resource(ParquetFileReader.open(in))(_.getFooter)
        val acc = scala.collection.mutable.Map[String, Acc]()
        footer.getBlocks.asScala.foreach { block =>
          val rows = block.getRowCount
          block.getColumns.asScala.foreach { ch =>
            val parts = ch.getPath.toArray
            if (parts.length == 1) { // top-level leaves only
              val name = parts(0)
              types.get(name).flatMap(domain).foreach { dom =>
                val st = ch.getStatistics
                val a = acc.getOrElseUpdate(name, new Acc)
                a.values += rows
                if (st == null || st.isEmpty || !st.isNumNullsSet) {
                  a.nulls = -1L; a.boundsValid = false
                } else {
                  if (a.nulls >= 0) a.nulls += st.getNumNulls
                  // an all-null group (hasNonNullValue false) contributes
                  // no bound, which is exact, not unknown
                  if (st.hasNonNullValue) {
                    val tn = ch.getPrimitiveType.getPrimitiveTypeName
                    (renderStat(st.genericGetMin.asInstanceOf[AnyRef], tn, dom),
                     renderStat(st.genericGetMax.asInstanceOf[AnyRef], tn, dom))
                    match {
                      case (Some(mn), Some(mx)) =>
                        if (a.min == null || cmp(mn, a.min, dom) < 0) a.min = mn
                        if (a.max == null || cmp(mx, a.max, dom) > 0) a.max = mx
                      case _ => a.boundsValid = false // e.g. legacy NaN bound
                    }
                  }
                }
              }
            }
          }
        }
        Some(relKey(rel) -> acc.iterator.map { case (k, a) =>
          val st = a.toStat
          // untrusted writer + floating column ⇒ max is unsafe (NaN)
          k -> (if (!trusted && types.get(k).flatMap(domain).contains('d'))
                  st.copy(max = None)
                else st)
        }.toMap)
      } catch {
        case scala.util.control.NonFatal(_) => None // unreadable ⇒ no entry
      }
    }.toMap
  }

  /** One row group's recorded min or max → the domain rendering.
    * ±0.0 normalizes to 0.0 (Spark SQL compares them equal; a -0.0
    * bound must not order differently from 0.0). NaN bounds (legacy
    * writers) are unrenderable → the caller invalidates the column.
    */
  private def renderStat(v: AnyRef, tn: PrimitiveTypeName,
                         dom: Char): Option[String] = (tn, v) match {
    case (PrimitiveTypeName.INT32, i: Integer) => Some(i.longValue.toString)
    case (PrimitiveTypeName.INT64, l: java.lang.Long) => Some(l.toString)
    case (PrimitiveTypeName.FLOAT, f: java.lang.Float)
      if !f.isNaN => Some(zeroNorm(f.doubleValue).toString)
    case (PrimitiveTypeName.DOUBLE, d: java.lang.Double)
      if !d.isNaN => Some(zeroNorm(d.doubleValue).toString)
    case (PrimitiveTypeName.BOOLEAN, b: java.lang.Boolean) =>
      Some(if (b) "1" else "0")
    case (PrimitiveTypeName.BINARY, b: Binary) if dom == 's' =>
      Some(Base64.getEncoder.encodeToString(b.getBytes))
    case _ => None
  }

  private def zeroNorm(d: Double): Double = if (d == 0.0) 0.0 else d

  /** Order two renderings within a domain: 'l' integral, 'd' double,
    * 's' unsigned UTF-8 bytes.
    */
  private def cmp(a: String, b: String, dom: Char): Int = dom match {
    case 'l' => java.lang.Long.compare(a.toLong, b.toLong)
    case 'd' => // ±0.0 compare equal (Spark SQL semantics)
      java.lang.Double.compare(zeroNorm(a.toDouble), zeroNorm(b.toDouble))
    case _ =>
      val x = Base64.getDecoder.decode(a); val y = Base64.getDecoder.decode(b)
      var i = 0
      while (i < x.length && i < y.length) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
  }

  // ---- sidecar IO ---------------------------------------------------------
  // One line per (file, column):
  //   fileName \t col \t nullCount \t valueCount \t min \t max
  // (min/max renderings are tab-free by construction: numerics and
  // base64). Written via a dot-temp + same-dir ATOMIC_MOVE so lock-free
  // readers never see a torn sidecar.

  def read(dir: Path): Map[String, Map[String, ColStat]] = {
    val f = dir.resolve(SidecarName)
    if (!Files.isRegularFile(f)) Map.empty
    else try {
      Files.readAllLines(f, StandardCharsets.UTF_8).asScala.iterator
        .map(_.split("\t", -1)).filter(_.length == 6)
        .toSeq.groupBy(_(0)).map { case (file, rows) =>
          file -> rows.map { r =>
            r(1) -> ColStat(r(2).toLong, r(3).toLong,
              if (r(4).isEmpty) None else Some(r(4)),
              if (r(5).isEmpty) None else Some(r(5)))
          }.toMap
        }
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }

  private def writeAll(dir: Path,
                       all: Map[String, Map[String, ColStat]]): Unit = {
    val lines = all.toSeq.sortBy(_._1).flatMap { case (file, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, s) =>
        s"$file\t$c\t${s.nullCount}\t${s.valueCount}\t${s.min.getOrElse("")}\t${s.max.getOrElse("")}"
      }
    }
    val tmp = dir.resolve("." + SidecarName + ".tmp")
    Files.write(tmp, lines.asJava, StandardCharsets.UTF_8)
    Files.move(tmp, dir.resolve(SidecarName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Marker a version root carries when any of its sidecar entries live
    * in per-partition-dir SHARDS (round 16). At 10⁵–10⁶-file partitioned
    * tables one root sidecar is itself a large planning-time read; a
    * shard per partition dir means a partition-pruned scan reads only
    * the pruned dirs' sidecars. The scan rule keys off this marker to
    * wrap the relation even when the root sidecar is empty or absent.
    */
  val ShardMarker = "_graft_sharded"

  /** Split a commit batch by the directory its files land in: files
    * directly under the version root keep the root sidecar (classic
    * non-partitioned layout); nested files — partition dirs — shard
    * into their own directory's sidecar keyed by bare file name (unique
    * within one dir; the cross-dir part-NNNNN collision that forced
    * nested root keys cannot happen inside a single dir).
    */
  /** The shard a root-relative key belongs to: None = the version root
    * itself, Some(dir) = a partition subdir. SHARED with BloomSidecar so
    * the two sidecars can never disagree on shard layout.
    */
  private[sources] def shardOf(relKeyed: String): Option[String] = {
    val cut = relKeyed.lastIndexOf('/')
    if (cut < 0) None else Some(relKeyed.substring(0, cut))
  }

  private def byShard(relPaths: Iterable[String])
      : Map[Option[String], Seq[String]] =
    relPaths.toSeq.groupBy(r => shardOf(relKey(r)))

  private[sources] def shardDirOf(dir: Path, shard: Option[String]): Path =
    shard.fold(dir)(dir.resolve(_))

  private[sources] def markSharded(dir: Path): Unit = {
    val m = dir.resolve(ShardMarker)
    if (!Files.exists(m))
      try Files.createFile(m)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
  }

  /** Merge footer stats of `newRelPaths` (the files this commit adds
    * under `dir`) into the owning sidecars — the root one for files
    * directly under `dir`, one shard per partition dir for nested files.
    * Cost is O(batch footers) + O(touched shards).
    */
  def record(conf: Configuration, dir: Path, newRelPaths: Iterable[String],
             schema: StructType, trusted: Boolean = true): Unit =
    byShard(newRelPaths.filter(_.endsWith(".parquet"))).foreach {
      case (shard, paths) =>
        val sd = shardDirOf(dir, shard)
        val names = paths.map(p => Paths.get(relKey(p)).getFileName.toString)
        if (names.nonEmpty) {
          writeAll(sd, read(sd) ++ collect(conf, sd, names, schema, trusted))
          if (shard.isDefined) markSharded(dir)
        }
    }

  /** Carry entries for hard-linked files from the replaced version's
    * sidecars (matching shard first, the legacy nested-key root sidecar
    * second); files neither covered are re-read from their footers
    * (never silently left uncovered — an uncovered file is a permanent
    * "may match"). Uncovered-at-carry files were not written by graft's
    * own record()-covered paths, so their footers get the untrusted
    * (NaN-safe) float handling.
    */
  def carryOver(conf: Configuration, fromDir: Path, toDir: Path,
                relPaths: Iterable[String], schema: StructType): Unit =
    byShard(relPaths.filter(_.endsWith(".parquet"))).foreach {
      case (shard, paths) =>
        val oldShard = read(shardDirOf(fromDir, shard))
        val oldRoot =
          if (shard.isDefined) read(fromDir) else Map.empty[String, Map[String, ColStat]]
        val sd = shardDirOf(toDir, shard)
        val entries = paths.map { r =>
          val k = relKey(r)
          val name = Paths.get(k).getFileName.toString
          name -> oldShard.get(name).orElse(oldRoot.get(k))
        }
        val copied = entries.collect { case (n, Some(cs)) => n -> cs }.toMap
        val missing = entries.collect { case (n, None) => n }
        if (entries.nonEmpty) {
          writeAll(sd, read(sd) ++ copied ++
            collect(conf, sd, missing, schema, trusted = false))
          if (shard.isDefined) markSharded(toDir)
        }
    }

  /** The whole version's stats — the root sidecar plus every shard,
    * shard entries re-keyed to root-relative paths. Full-table consumers
    * (ANALYZE backfill, CBO column stats, artifacts) read this; the scan
    * path never does — it loads shards per pruned listing.
    */
  def readAll(dir: Path): Map[String, Map[String, ColStat]] = {
    val root = read(dir)
    if (!Files.exists(dir.resolve(ShardMarker))) return root
    // resolve the `data` pointer symlink first: Files.walk does not
    // descend through a symlinked start node
    val base = try dir.toRealPath() catch {
      case scala.util.control.NonFatal(_) => dir }
    // close the walk stream deterministically (it holds directory
    // handles until GC otherwise — a leak on a long-running server) and
    // log a swallowed failure: an empty map is indistinguishable from
    // zero shard coverage to ANALYZE/CBO consumers
    val shards =
      try {
        import scala.jdk.CollectionConverters._
        val walk = Files.walk(base)
        try {
          walk.iterator.asScala
            .filter(p => p.getFileName.toString == SidecarName &&
              p.getParent != base)
            .flatMap { s =>
              val rel = relKey(base.relativize(s.getParent).toString)
              read(s.getParent).map { case (n, cs) => s"$rel/$n" -> cs }
            }.toMap
        } finally walk.close()
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft] sidecar shard walk failed under $base: $e")
        Map.empty[String, Map[String, ColStat]] }
    root ++ shards
  }

  // ---- the MAY-MATCH evaluator -------------------------------------------

  /** Conjunction over the scan's pushed data filters: false ⇒ the file
    * provably contains no matching row and is skipped before any task
    * exists. `blooms` (per-column bloom sketches from the `_graft_bloom`
    * sidecar, when the file has them) tightens equality/IN verdicts that
    * min/max cannot decide — a high-cardinality point probe on an
    * unclustered column; absent entries never prune.
    */
  def mayMatch(filters: Seq[Expression], schema: StructType,
               stats: Map[String, ColStat],
               blooms: Map[String, org.apache.spark.util.sketch.BloomFilter]
                 = Map.empty): Boolean =
    filters.forall(f => may(f, schema, stats, blooms))

  private def may(e: Expression, schema: StructType,
                  stats: Map[String, ColStat],
                  blooms: Map[String, org.apache.spark.util.sketch.BloomFilter])
      : Boolean = e match {
    case And(l, r) =>
      may(l, schema, stats, blooms) && may(r, schema, stats, blooms)
    case Or(l, r) =>
      may(l, schema, stats, blooms) || may(r, schema, stats, blooms)
    case IsNull(a: AttributeReference) =>
      stats.get(a.name).forall(s => s.nullCount != 0)
    case IsNotNull(a: AttributeReference) =>
      stats.get(a.name).forall(s =>
        s.nullCount < 0 || s.nullCount < s.valueCount)
    case Not(IsNull(a: AttributeReference)) =>
      may(IsNotNull(a), schema, stats, blooms)
    case EqualTo(a: AttributeReference, Literal(v, dt)) => eqMay(a, v, dt, schema, stats, blooms)
    case EqualTo(Literal(v, dt), a: AttributeReference) => eqMay(a, v, dt, schema, stats, blooms)
    case EqualNullSafe(a: AttributeReference, Literal(v, dt)) =>
      if (v == null) may(IsNull(a), schema, stats, blooms)
      else eqMay(a, v, dt, schema, stats, blooms)
    case EqualNullSafe(Literal(v, dt), a: AttributeReference) =>
      if (v == null) may(IsNull(a), schema, stats, blooms)
      else eqMay(a, v, dt, schema, stats, blooms)
    case LessThan(a: AttributeReference, Literal(v, dt)) => cmpMay(a, v, dt, schema, stats, -2)
    case LessThanOrEqual(a: AttributeReference, Literal(v, dt)) => cmpMay(a, v, dt, schema, stats, -1)
    case GreaterThan(a: AttributeReference, Literal(v, dt)) => cmpMay(a, v, dt, schema, stats, 2)
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, dt)) => cmpMay(a, v, dt, schema, stats, 1)
    case LessThan(Literal(v, dt), a: AttributeReference) => cmpMay(a, v, dt, schema, stats, 2)
    case LessThanOrEqual(Literal(v, dt), a: AttributeReference) => cmpMay(a, v, dt, schema, stats, 1)
    case GreaterThan(Literal(v, dt), a: AttributeReference) => cmpMay(a, v, dt, schema, stats, -2)
    case GreaterThanOrEqual(Literal(v, dt), a: AttributeReference) => cmpMay(a, v, dt, schema, stats, -1)
    case In(a: AttributeReference, list) if list.forall(_.isInstanceOf[Literal]) =>
      list.exists { case Literal(v, dt) => eqMay(a, v, dt, schema, stats, blooms) }
    case InSet(a: AttributeReference, set) =>
      val dt = a.dataType
      set.exists(v => eqMay(a, v, dt, schema, stats, blooms))
    case StartsWith(a: AttributeReference, Literal(v: UTF8String, StringType)) =>
      prefixMay(a, v.getBytes, stats)
    case _ => true // unmodeled shape — never prune on it
  }

  /** Equality verdict: the min/max range answer ANDed with the bloom
    * answer when the file carries a sketch for the column. Either side
    * saying "provably absent" prunes; both are strictly may-match.
    */
  private def eqMay(a: AttributeReference, v: Any, dt: DataType,
                    schema: StructType, stats: Map[String, ColStat],
                    blooms: Map[String, org.apache.spark.util.sketch.BloomFilter])
      : Boolean =
    cmpMay(a, v, dt, schema, stats, 0) && (v == null || blooms.get(a.name)
      .forall(bf => graft.sources.BloomSidecar
        .mayContain(bf, v, dt, a.dataType)))

  /** `op` encodes the predicate on column `a` vs literal `v`:
    * 0 `=`, -2 `<`, -1 `<=`, 2 `>`, 1 `>=` (attribute on the left).
    */
  private def cmpMay(a: AttributeReference, v: Any, dt: DataType,
                     schema: StructType, stats: Map[String, ColStat],
                     op: Int): Boolean = {
    if (v == null) return true // null comparison never pushed as-is
    val s = stats.getOrElse(a.name, return true)
    // a file of only nulls matches no value comparison, stats or not
    if (s.nullCount >= 0 && s.valueCount > 0 && s.nullCount == s.valueCount)
      return false
    val dom = domain(a.dataType).getOrElse(return true)
    if (domain(dt) != Some(dom)) return true // cast mismatch — keep
    val lit = render(v, dt).getOrElse(return true)
    val lo = s.min.map(m => cmp(lit, m, dom)) // lit vs min
    val hi = s.max.map(m => cmp(lit, m, dom)) // lit vs max
    op match {
      case 0  => lo.forall(_ >= 0) && hi.forall(_ <= 0)
      case -2 => lo.forall(_ > 0)  // some value < lit ⇔ min < lit
      case -1 => lo.forall(_ >= 0)
      case 2  => hi.forall(_ < 0)  // some value > lit ⇔ max > lit
      case 1  => hi.forall(_ <= 0)
      case _  => true
    }
  }

  private def prefixMay(a: AttributeReference, prefix: Array[Byte],
                        stats: Map[String, ColStat]): Boolean = {
    val s = stats.getOrElse(a.name, return true)
    if (s.nullCount >= 0 && s.valueCount > 0 && s.nullCount == s.valueCount)
      return false
    // value startsWith p ⇒ truncate(value) == p at p.length bytes: prune
    // when p < truncate(min) or p > truncate(max)
    def trunc(enc: String): Array[Byte] =
      Base64.getDecoder.decode(enc).take(prefix.length)
    def cmpBytes(x: Array[Byte], y: Array[Byte]): Int = {
      var i = 0
      while (i < x.length && i < y.length) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
    s.min.forall(m => cmpBytes(prefix, trunc(m)) >= 0) &&
      s.max.forall(m => cmpBytes(prefix, trunc(m)) <= 0)
  }

  /** Literal internal value → the domain rendering used by `cmp`. */
  private def render(v: Any, dt: DataType): Option[String] = (v, dt) match {
    case (b: Byte, _) => Some(b.toLong.toString)
    case (s: Short, _) => Some(s.toLong.toString)
    case (i: Int, _) => Some(i.toLong.toString) // incl. Date days
    case (l: Long, _) => Some(l.toString) // incl. Timestamp micros
    case (f: Float, _) =>
      if (f.isNaN) None else Some(zeroNorm(f.toDouble).toString)
    case (d: Double, _) =>
      if (d.isNaN) None else Some(zeroNorm(d).toString)
    case (b: Boolean, _) => Some(if (b) "1" else "0")
    case (u: UTF8String, _) =>
      Some(Base64.getEncoder.encodeToString(u.getBytes))
    case _ => None
  }
}
