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
    stats: Map[String, Map[String, FileSkipStats.ColStat]])
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

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val dirs = inner.listFiles(partitionFilters, dataFilters)
    if (dataFilters.isEmpty || stats.isEmpty) dirs
    else dirs.map { pd =>
      val kept = pd.files.filter { f =>
        keyOf(f.getPath).flatMap(stats.get) match {
          case Some(cs) => FileSkipStats.mayMatch(dataFilters, dataSchema, cs)
          case None => true // uncovered file — never prune
        }
      }
      Skipping.filesPruned.addAndGet(pd.files.size - kept.size)
      if (kept.size == pd.files.size) pd else pd.copy(files = kept)
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

  // sidecar cache: path -> (mtime, size, parsed). Commits rewrite the
  // sidecar atomically, so (mtime, size) is a sufficient fingerprint.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String,
      (Long, Long, Map[String, Map[String, FileSkipStats.ColStat]])]()

  private def statsFor(roots: Seq[Path]): Option[
      (java.nio.file.Path, Map[String, Map[String, FileSkipStats.ColStat]])] = {
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
    val hit = cache.get(key)
    if (hit != null && hit._1 == mt && hit._2 == sz) Some((base, hit._3))
    else {
      val parsed = FileSkipStats.read(side.getParent)
      // version dirs come and go with every rewrite on a long-running
      // server — bound the cache instead of tracking GC
      if (cache.size >= 256) cache.clear()
      cache.put(key, (mt, sz, parsed))
      Some((base, parsed))
    }
  }

  object SkippingRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case lr: LogicalRelation => lr.relation match {
        case fsr: HadoopFsRelation
          if !fsr.location.isInstanceOf[SkippingFileIndex] =>
          statsFor(fsr.location.rootPaths) match {
            case Some((base, st)) if st.nonEmpty =>
              lr.copy(relation = fsr.copy(location =
                new SkippingFileIndex(fsr.location, fsr.dataSchema, base, st))(
                fsr.sparkSession))
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
