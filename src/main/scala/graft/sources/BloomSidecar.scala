package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.Base64

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file bloom filters for point-predicate data skipping (SURVEY
  * §2.E9 extension, round 15) — the standard lakehouse answer to the
  * probe min/max cannot serve: a high-cardinality equality lookup on an
  * UNCLUSTERED column. Min/max bounds prune nothing there (every file's
  * range covers the probe — the r14 SKIPBENCH artifact measured the okey
  * probe pruning 0/25 files under SORT BY(date)); a per-file bloom
  * answers "is this exact value possibly in this file" at any layout.
  *
  * Design:
  *   - sidecar `_graft_bloom` beside `_graft_stats`, one line per
  *     (file, column): relPath \t col \t base64(sketch). Same dot-temp +
  *     ATOMIC_MOVE discipline, same dir-relative path keys.
  *   - built by ONE distributed aggregation per commit batch (Spark's
  *     own BloomFilterAggregate over xxhash64(col), grouped by
  *     input_file_name — the runtime-filter machinery reused as a
  *     persistent index; no driver-side value collection, cost
  *     O(batch), never O(table)).
  *   - integral/string/date/timestamp columns only; float/double stay
  *     min/max-only (NaN/±0.0 hashing has no safe exact story), internal
  *     `_graft_*` columns excluded.
  *   - sized at ~10 bits/value from the file's footer value count
  *     (~1% FPR), clamped to [8 KiB, 8 MiB] of bits; files under
  *     `minRows` are skipped — min/max already covers tiny files and the
  *     per-commit job would tax every small VALUES insert for nothing.
  *     (ANALYZE TABLE backfill passes minRows = 1: an explicit stats
  *     request covers everything.)
  *   - STRICTLY may-match at scan: a missing entry, a type-mismatched
  *     literal, or an unmodeled predicate never prunes; a bloom "no" is
  *     exact (no false negatives), a "maybe" falls through to row-level
  *     filtering. The query literal is hashed with the SAME xxhash64
  *     (seed 42) the build side used.
  *
  * At cluster scale the sidecar shards with the commit log (a 10⁶-file
  * table wants per-partition bloom manifests); the 100 TB design point
  * is the same as E9's: prune before tasks exist.
  */
object BloomSidecar {

  val SidecarName = "_graft_bloom"

  /** The ONE type whitelist both sides share: a type is bloom-able iff
    * the build side records it AND the probe side hashes it — a drift
    * between two copies of this list would either waste build cost or
    * (removal direction) probe types the build no longer records.
    */
  private def bloomType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | StringType => true
    case _ => false
  }

  /** Columns eligible for bloom entries under `schema`. */
  def eligible(schema: StructType): Seq[StructField] =
    schema.fields.toSeq.filter(f =>
      !f.name.startsWith("_graft_") && bloomType(f.dataType))

  // ---- sidecar IO ---------------------------------------------------------

  def read(dir: Path): Map[String, Map[String, BloomFilter]] = {
    val f = dir.resolve(SidecarName)
    if (!Files.isRegularFile(f)) Map.empty
    else try {
      Files.readAllLines(f, StandardCharsets.UTF_8).asScala.iterator
        .map(_.split("\t", -1)).filter(_.length == 3)
        .toSeq.groupBy(_(0)).map { case (file, rows) =>
          file -> rows.flatMap { r =>
            try Some(r(1) -> BloomFilter.readFrom(
              new ByteArrayInputStream(Base64.getDecoder.decode(r(2)))))
            catch { case scala.util.control.NonFatal(_) => None }
          }.toMap
        }
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }

  /** Raw (undeserialized) entries — for carry-over without the decode
    * cost.
    */
  private def readRaw(dir: Path): Map[(String, String), String] = {
    val f = dir.resolve(SidecarName)
    if (!Files.isRegularFile(f)) Map.empty
    else try {
      Files.readAllLines(f, StandardCharsets.UTF_8).asScala.iterator
        .map(_.split("\t", -1)).filter(_.length == 3)
        .map(r => (r(0), r(1)) -> r(2)).toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }

  private def writeRaw(dir: Path,
                       all: Map[(String, String), String]): Unit = {
    val lines = all.toSeq.sortBy(_._1).map { case ((file, c), b64) =>
      s"$file\t$c\t$b64"
    }
    val tmp = dir.resolve("." + SidecarName + ".tmp")
    Files.write(tmp, lines.asJava, StandardCharsets.UTF_8)
    Files.move(tmp, dir.resolve(SidecarName),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  // ---- distributed build --------------------------------------------------

  /** Spark's internal runtime-filter aggregate as a Column: the sketch
    * of xxhash64(col) values, serialized (spark.util.sketch V1 format,
    * readable by BloomFilter.readFrom).
    */
  private def bloomAgg(c: String, items: Long, bits: Long) =
    Bridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(Bridge.expression(col(s"`$c`"))), 42),
      Literal(items), Literal(bits)).toAggregateExpression())

  /** Build and merge bloom entries for `relPaths` (files this commit
    * added under `dir`; the just-written `_graft_stats` sidecar supplies
    * their value counts — pass `statsOpt` when the caller already parsed
    * it). One Spark job for the whole batch; files with fewer than
    * `minRows` values are skipped.
    *
    * ADVISORY like every stats layer: any failure (an externally landed
    * file whose physical types defy the table schema, a torn file, an
    * executor loss) skips the blooms rather than failing a DML whose
    * data files are ALREADY committed — a missing bloom entry is sound
    * (never prunes), a failed INSERT after commit invites a client
    * retry that duplicates rows. FileSkipStats has per-file try/catch
    * for the same reason; here one batch job covers all files, so the
    * guard wraps the whole build.
    */
  def record(spark: SparkSession, dir: Path, relPaths: Iterable[String],
             schema: StructType, minRows: Long,
             statsOpt: Option[Map[String, Map[String, FileSkipStats.ColStat]]]
               = None): Unit =
    try recordUnsafe(spark, dir, relPaths, schema, minRows, statsOpt)
    catch { case scala.util.control.NonFatal(_) => () }

  private def recordUnsafe(spark: SparkSession, dir: Path,
                           relPaths: Iterable[String], schema: StructType,
                           minRows: Long,
                           statsOpt: Option[Map[String, Map[String, FileSkipStats.ColStat]]])
      : Unit = {
    val cols = eligible(schema)
    if (cols.isEmpty) return
    // readAll: on sharded (partitioned) layouts the value counts live in
    // the per-dir shards — the root sidecar alone would zero every
    // rowsOf() and silently skip the whole batch's blooms
    val stats = statsOpt.getOrElse(FileSkipStats.readAll(dir))
    def rowsOf(rel: String): Long =
      stats.get(FileSkipStats.relKey(rel)).flatMap(_.values.headOption)
        .map(_.valueCount).getOrElse(0L)
    val wanted = relPaths.filter(r =>
      r.endsWith(".parquet") && rowsOf(r) >= minRows).toSeq
    if (wanted.isEmpty) return
    val maxRows = wanted.map(rowsOf).max
    // one sketch size for the batch job (per-file sizing would need a
    // job per file): ~10 bits/value of the LARGEST file, clamped.
    // estimatedNumItems must ALSO respect the session's runtime-bloom
    // item ceiling — BloomFilterAggregate type-checks against it, and an
    // unclamped count from one oversized file would fail the whole
    // batch's build inside the advisory guard (silently dropping blooms
    // for exactly the large files point-probe skipping targets). A
    // clamped estimate just densifies the sketch — sound, never unsound.
    val maxItems = math.min(maxRows, spark.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_ITEMS))
    val bits = math.min(
      math.max(maxRows * 10L, 65536L),
      math.min(67108864L, spark.sessionState.conf.getConf(
        org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_BITS)))
    val paths = wanted.map(r => dir.resolve(r).toUri.toString)
    val aggs = cols.map(f => bloomAgg(f.name, maxItems, bits).as(f.name))
    val rows = spark.read.schema(schema).parquet(paths: _*)
      .groupBy(input_file_name().as("_graft_file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // one row per batch file — bounded by the commit batch
    val base = dir.toUri.getPath
    val entries = rows.iterator.flatMap { row =>
      val uri = java.net.URI.create(row.getString(0))
      val full = uri.getPath
      if (full == null || !full.startsWith(base)) Iterator.empty
      else {
        val rel = FileSkipStats.relKey(
          dir.relativize(java.nio.file.Paths.get(full)).toString)
        cols.indices.iterator.flatMap { i =>
          Option(row.get(i + 1)).map { b =>
            (rel, cols(i).name) ->
              Base64.getEncoder.encodeToString(b.asInstanceOf[Array[Byte]])
          }
        }
      }
    }.toMap
    // shard like the min/max sidecar (round 16): nested (partition-dir)
    // files write their own dir's `_graft_bloom` keyed by bare name, so
    // a partition-pruned scan never parses another partition's sketches.
    // Shard layout (shardOf / the root marker) is SHARED with
    // FileSkipStats — a bloom-only shard write (ANALYZE backfill on a
    // legacy table whose min/max root sidecar already covers everything)
    // must still flip the marker, or readAll and the scan path never see it
    if (entries.nonEmpty) entries.groupBy { case ((rel, _), _) =>
      FileSkipStats.shardOf(rel)
    }.foreach { case (shard, es) =>
      val sd = FileSkipStats.shardDirOf(dir, shard)
      val named = es.map { case ((rel, c), b) =>
        (java.nio.file.Paths.get(rel).getFileName.toString, c) -> b }
      writeRaw(sd, readRaw(sd) ++ named)
      if (shard.isDefined) FileSkipStats.markSharded(dir)
    }
  }

  /** Carry bloom entries for hard-linked files from the replaced
    * version's sidecars (matching shard first, legacy nested-key root
    * second). Files neither covered simply stay uncovered (bloom absent
    * = never prune — sound; the min/max sidecar still covers them via
    * its own carry-over re-read).
    */
  def carryOver(fromDir: Path, toDir: Path,
                relPaths: Iterable[String]): Unit =
    relPaths.map(FileSkipStats.relKey)
      .groupBy(FileSkipStats.shardOf)
      .foreach { case (shard, keys) =>
      val oldShard = readRaw(FileSkipStats.shardDirOf(fromDir, shard))
        .groupBy(_._1._1)
      val oldRoot =
        (if (shard.isDefined) readRaw(fromDir)
         else Map.empty[(String, String), String]).groupBy(_._1._1)
      val copied = keys.toSeq.flatMap { k =>
        val name = java.nio.file.Paths.get(k).getFileName.toString
        oldShard.getOrElse(name,
          oldRoot.getOrElse(k, Map.empty)
            .map { case ((_, c), b) => (name, c) -> b })
      }.toMap
      if (copied.nonEmpty) {
        val sd = FileSkipStats.shardDirOf(toDir, shard)
        writeRaw(sd, readRaw(sd) ++ copied)
        if (shard.isDefined) FileSkipStats.markSharded(toDir)
      }
    }

  /** The whole version's blooms — root sidecar plus every shard, shard
    * entries re-keyed to root-relative paths. Full-version consumers
    * only (ANALYZE backfill coverage); the scan path loads per pruned
    * listing.
    */
  def readAll(dir: Path): Map[String, Map[String, BloomFilter]] = {
    val root = read(dir)
    if (!Files.exists(dir.resolve(FileSkipStats.ShardMarker))) return root
    // resolve the `data` pointer symlink first: Files.walk does not
    // descend through a symlinked start node
    val base = try dir.toRealPath() catch {
      case scala.util.control.NonFatal(_) => dir }
    // close the walk stream deterministically and log a swallowed
    // failure — see FileSkipStats.readAll (same contract)
    val shards =
      try {
        val walk = Files.walk(base)
        try walk.iterator.asScala
          .filter(p => p.getFileName.toString == SidecarName &&
            p.getParent != base)
          .flatMap { s =>
            val rel = FileSkipStats.relKey(base.relativize(s.getParent).toString)
            read(s.getParent).map { case (n, cs) => s"$rel/$n" -> cs }
          }.toMap
        finally walk.close()
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft] bloom shard walk failed under $base: $e")
        Map.empty[String, Map[String, BloomFilter]] }
    root ++ shards
  }

  // ---- the MAY-MATCH side -------------------------------------------------

  /** Hash a pushed literal exactly as the build side hashed column
    * values: xxhash64 seed 42 over the Spark-internal value. None when
    * the literal's type cannot match the build-side hashing (⇒ keep).
    */
  def hashLiteral(v: Any, dt: DataType): Option[Long] = {
    if (v == null || !bloomType(dt)) None
    else Some(org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(v, dt, 42L))
  }

  /** May the file (with bloom `bf` for the column) contain `v`? */
  def mayContain(bf: BloomFilter, v: Any, dt: DataType,
                 colType: DataType): Boolean =
    if (dt != colType) true // cast mismatch — hashing differs, keep
    else hashLiteral(v, dt) match {
      case Some(h) => bf.mightContainLong(h)
      case None => true
    }
}
