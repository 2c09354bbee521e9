package org.apache.spark.sql.graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.{SparkSession => CSparkSession}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types.StructType

import graft.sources.FileSkipStats

/** File-level data skipping over the commit protocol's `_graft_stats`
  * sidecars (SURVEY §2.E9; model and evaluator in
  * graft.sources.FileSkipStats).
  *
  * The hook is the same one Delta's TahoeFileIndex uses: physical
  * planning hands `FileIndex.listFiles` the pushed data filters, and a
  * wrapping index may answer with fewer files as long as every possibly-
  * matching row survives. `SkippingRule` (installed per-session into
  * `spark.experimental.extraOptimizations` — it runs AFTER the built-in
  * batches, so partitioned relations have already been pruned to
  * concrete listings) wraps any single-root file-source relation whose
  * root carries a sidecar; everything else — driver testdata, external
  * parquet, CSV, partition-pruned multi-root listings (directory
  * pruning is already the coarse filter there) — resolves exactly as
  * before.
  */
final class SkippingFileIndex(
    inner: FileIndex,
    dataSchema: StructType,
    sidecarDir: java.nio.file.Path,
    stats: Map[String, Map[String, FileSkipStats.ColStat]],
    blooms: Map[String, Map[String, org.apache.spark.util.sketch.BloomFilter]]
      = Map.empty)
  extends FileIndex {

  override def rootPaths: Seq[Path] = inner.rootPaths

  /** Sidecar entries are keyed by path RELATIVE to the sidecar's dir
    * (partition subdirs included) — bare file names collide across
    * partition directories (Spark's dynamic-partition writer reuses
    * part-NNNNN-<uuid> per task across every partition dir it writes),
    * and a collision evaluates a file against another partition's
    * min/max: silent data loss. A file outside the sidecar dir (cannot
    * happen for roots statsFor accepted, but stay safe) is never pruned.
    */
  private def keyOf(p: Path): Option[String] = {
    val u = p.toUri
    if (u.getScheme != null && u.getScheme != "file") return None
    val fp = java.nio.file.Paths.get(u.getPath)
    if (!fp.startsWith(sidecarDir)) None
    else Some(FileSkipStats.relKey(sidecarDir.relativize(fp).toString))
  }

  /** Files pruned by the most recent listFiles on THIS index instance —
    * the per-scan number EXPLAIN ANALYZE surfaces (the rule wraps one
    * index per planned relation, so the instance maps 1:1 to the scan
    * node rendering it).
    */
  @volatile var lastPruned: Long = 0L

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val dirs = inner.listFiles(partitionFilters, dataFilters)
    if (dataFilters.isEmpty || stats.isEmpty) dirs
    else {
      var pruned = 0L
      val out = dirs.map { pd =>
        val kept = pd.files.filter { f =>
          val key = keyOf(f.getPath)
          key.flatMap(stats.get) match {
            case Some(cs) => FileSkipStats.mayMatch(dataFilters, dataSchema, cs,
              key.flatMap(blooms.get).getOrElse(Map.empty))
            case None => true // uncovered file — never prune
          }
        }
        pruned += pd.files.size - kept.size
        if (kept.size == pd.files.size) pd else pd.copy(files = kept)
      }
      lastPruned = pruned
      Skipping.filesPruned.addAndGet(pruned)
      out
    }
  }

  override def inputFiles: Array[String] = inner.inputFiles
  override def refresh(): Unit = inner.refresh()
  override def sizeInBytes: Long = inner.sizeInBytes
  override def partitionSchema: StructType = inner.partitionSchema
}

object Skipping {

  /** Cross-query observability (EXPLAIN ANALYZE has per-scan numFiles;
    * this is the cheap global counter specs and telemetry read).
    */
  val filesPruned = new AtomicLong(0L)

  type Blooms = Map[String, Map[String, org.apache.spark.util.sketch.BloomFilter]]

  // sidecar cache: path -> (minmax mtime/size, bloom mtime/size, parsed
  // min/max, parsed blooms). Commits rewrite both sidecars atomically,
  // so (mtime, size) per file is a sufficient fingerprint.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String,
      (Long, Long, Long, Long,
       Map[String, Map[String, FileSkipStats.ColStat]], Blooms)]()

  private def statsFor(roots: Seq[Path]): Option[
      (java.nio.file.Path, Map[String, Map[String, FileSkipStats.ColStat]],
       Blooms)] = {
    if (roots.isEmpty) return None
    val paths = roots.map { r =>
      val u = r.toUri
      if (u.getScheme != null && u.getScheme != "file") return None
      Paths.get(u.getPath)
    }
    // The sidecar sits at the table's data root. A non-partitioned
    // relation roots there directly; a partition-pruned relation roots
    // at the selected `<data>/<k=v>` subdirs — walk up (≤2 levels, for
    // nested partition keys) to the nearest sidecar every root shares.
    var side: java.nio.file.Path = null
    var base = paths.head
    var up = 0
    while (side == null && base != null && up <= 2) {
      val s = base.resolve(FileSkipStats.SidecarName)
      if (Files.isRegularFile(s) && paths.forall(_.startsWith(base)))
        side = s
      else { base = base.getParent; up += 1 }
    }
    if (side == null) return None
    val key = side.toString
    val (mt, sz) = (Files.getLastModifiedTime(side).toMillis, Files.size(side))
    val bside = base.resolve(graft.sources.BloomSidecar.SidecarName)
    val (bmt, bsz) =
      if (Files.isRegularFile(bside))
        (Files.getLastModifiedTime(bside).toMillis, Files.size(bside))
      else (-1L, -1L)
    val hit = cache.get(key)
    if (hit != null && hit._1 == mt && hit._2 == sz &&
        hit._3 == bmt && hit._4 == bsz) Some((base, hit._5, hit._6))
    else {
      val parsed = FileSkipStats.read(side.getParent)
      val parsedBlooms = graft.sources.BloomSidecar.read(base)
      // version dirs come and go with every rewrite on a long-running
      // server — bound the cache instead of tracking GC
      if (cache.size >= 256) cache.clear()
      cache.put(key, (mt, sz, bmt, bsz, parsed, parsedBlooms))
      Some((base, parsed, parsedBlooms))
    }
  }

  object SkippingRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case lr: LogicalRelation => lr.relation match {
        case fsr: HadoopFsRelation
          if !fsr.location.isInstanceOf[SkippingFileIndex] =>
          statsFor(fsr.location.rootPaths) match {
            case Some((base, st, bl)) if st.nonEmpty =>
              lr.copy(relation = fsr.copy(location =
                new SkippingFileIndex(fsr.location, fsr.dataSchema, base, st,
                  bl))(fsr.sparkSession))
            case _ => lr
          }
        case _ => lr
      }
    }
  }

  /** Idempotently add the rule to this session's extra optimizer rules.
    * Called from the Catalog constructor — any session that can read a
    * managed table skips files through its sidecars automatically.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraOptimizations.contains(SkippingRule))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ SkippingRule
    }
}
