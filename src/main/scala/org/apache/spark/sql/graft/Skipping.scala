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
  * root carries a sidecar (or, round 16, the `_graft_sharded` marker);
  * everything else — driver testdata, external parquet, CSV — resolves
  * exactly as before.
  *
  * SHARDED tables (partitioned layouts, round 16): each partition dir
  * carries its own `_graft_stats`/`_graft_bloom`, and this index loads
  * a shard only when `listFiles` actually lists that dir — so partition
  * pruning prunes sidecar I/O too. At a 10⁵–10⁶-file table the root
  * sidecar would itself be a large planning-time read; per-dir shards
  * keep the read proportional to the PRUNED listing. Legacy nested-key
  * root entries (pre-r16 partitioned commits) stay honored as a
  * fallback, so mixed-vintage versions read soundly.
  */
final class SkippingFileIndex(
    inner: FileIndex,
    dataSchema: StructType,
    sidecarDir: java.nio.file.Path,
    sharded: Boolean,
    stats: Map[String, Map[String, FileSkipStats.ColStat]],
    blooms: Skipping.Blooms = Map.empty)
  extends FileIndex {

  override def rootPaths: Seq[Path] = inner.rootPaths

  /** Sidecar entries are keyed by path RELATIVE to the sidecar's dir
    * (partition subdirs included) — bare file names collide across
    * partition directories (Spark's dynamic-partition writer reuses
    * part-NNNNN-<uuid> per task across every partition dir it writes),
    * and a collision evaluates a file against another partition's
    * min/max: silent data loss. Shards dodge the collision by
    * construction (one dir, bare names unique). A file outside the
    * sidecar dir (cannot happen for roots statsFor accepted, but stay
    * safe) is never pruned.
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
    if (dataFilters.isEmpty || (!sharded && stats.isEmpty)) dirs
    else {
      var pruned = 0L
      // one shard resolution per DIRECTORY per listing, not per file:
      // shardFor's (mtime,size) fingerprint is two stat calls, and at
      // the 10⁵–10⁶-file tables this layer targets a per-file stat
      // storm would dominate planning time
      val shardMemo = scala.collection.mutable.HashMap[String,
        (Map[String, Map[String, FileSkipStats.ColStat]], Skipping.Blooms)]()
      val out = dirs.map { pd =>
        val kept = pd.files.filter { f =>
          keyOf(f.getPath) match {
            case None => true // foreign file — never prune
            case Some(key) =>
              val cut = key.lastIndexOf('/')
              val (st, bl, name) =
                if (!sharded || cut < 0) (stats, blooms, key)
                else {
                  // lazy per-dir shard: loaded (and cached) only for
                  // dirs the pruned listing actually surfaced
                  val dirRel = key.substring(0, cut)
                  val (s, b) = shardMemo.getOrElseUpdate(dirRel,
                    Skipping.shardFor(sidecarDir.resolve(dirRel)))
                  (s, b, key.substring(cut + 1))
                }
              // legacy fallback: pre-shard partitioned commits keyed
              // nested paths in the ROOT sidecar
              st.get(name).orElse(if (cut >= 0) stats.get(key) else None)
              match {
                case Some(cs) =>
                  FileSkipStats.mayMatch(dataFilters, dataSchema, cs,
                    bl.get(name)
                      .orElse(if (cut >= 0) blooms.get(key) else None)
                      .getOrElse(Map.empty))
                case None => true // uncovered file — never prune
              }
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
  private type Stats = Map[String, Map[String, FileSkipStats.ColStat]]

  private def fingerprint(p: java.nio.file.Path): (Long, Long) =
    if (Files.isRegularFile(p))
      (Files.getLastModifiedTime(p).toMillis, Files.size(p))
    else (-1L, -1L)

  // root-sidecar cache: base path -> (minmax fp, bloom fp, marker?,
  // parsed min/max, parsed blooms). Commits rewrite sidecars atomically,
  // so (mtime, size) per file is a sufficient fingerprint.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String,
      ((Long, Long), (Long, Long), Boolean, Stats, Blooms)]()

  // per-partition-dir shard cache, same fingerprint discipline; sized
  // for pruned listings (a full scan of a 10⁶-dir table would thrash it,
  // which only costs re-parsing — correctness never depends on a hit)
  private val shardCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      ((Long, Long), (Long, Long), Stats, Blooms)]()

  /** One partition dir's sidecar + blooms, cached by (mtime, size). */
  private[graft] def shardFor(dir: java.nio.file.Path): (Stats, Blooms) = {
    val sfp = fingerprint(dir.resolve(FileSkipStats.SidecarName))
    val bfp = fingerprint(dir.resolve(graft.sources.BloomSidecar.SidecarName))
    if (sfp._1 < 0 && bfp._1 < 0) return (Map.empty, Map.empty)
    val key = dir.toString
    val hit = shardCache.get(key)
    if (hit != null && hit._1 == sfp && hit._2 == bfp) (hit._3, hit._4)
    else {
      val st = FileSkipStats.read(dir)
      val bl = graft.sources.BloomSidecar.read(dir)
      if (shardCache.size >= 4096) shardCache.clear()
      shardCache.put(key, (sfp, bfp, st, bl))
      (st, bl)
    }
  }

  private def statsFor(roots: Seq[Path]): Option[
      (java.nio.file.Path, Boolean, Stats, Blooms)] = {
    if (roots.isEmpty) return None
    val paths = roots.map { r =>
      val u = r.toUri
      if (u.getScheme != null && u.getScheme != "file") return None
      Paths.get(u.getPath)
    }
    // The sidecar (or shard marker) sits at the table's data root. A
    // non-partitioned relation roots there directly; a partition-pruned
    // relation may root at the selected `<data>/<k=v>` subdirs — walk up
    // (≤2 levels, for nested partition keys) to the nearest sidecar
    // every root shares.
    var base: java.nio.file.Path = null
    var probe = paths.head
    var up = 0
    while (base == null && probe != null && up <= 2) {
      if ((Files.isRegularFile(probe.resolve(FileSkipStats.SidecarName)) ||
           Files.exists(probe.resolve(FileSkipStats.ShardMarker))) &&
          paths.forall(_.startsWith(probe)))
        base = probe
      else { probe = probe.getParent; up += 1 }
    }
    if (base == null) return None
    val side = base.resolve(FileSkipStats.SidecarName)
    val bside = base.resolve(graft.sources.BloomSidecar.SidecarName)
    val sharded = Files.exists(base.resolve(FileSkipStats.ShardMarker))
    val (sfp, bfp) = (fingerprint(side), fingerprint(bside))
    val key = base.toString
    val hit = cache.get(key)
    if (hit != null && hit._1 == sfp && hit._2 == bfp && hit._3 == sharded)
      Some((base, sharded, hit._4, hit._5))
    else {
      val parsed = FileSkipStats.read(base)
      val parsedBlooms = graft.sources.BloomSidecar.read(base)
      // version dirs come and go with every rewrite on a long-running
      // server — bound the cache instead of tracking GC
      if (cache.size >= 256) cache.clear()
      cache.put(key, (sfp, bfp, sharded, parsed, parsedBlooms))
      Some((base, sharded, parsed, parsedBlooms))
    }
  }

  object SkippingRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case lr: LogicalRelation => lr.relation match {
        case fsr: HadoopFsRelation
          if !fsr.location.isInstanceOf[SkippingFileIndex] =>
          statsFor(fsr.location.rootPaths) match {
            case Some((base, sharded, st, bl)) if sharded || st.nonEmpty =>
              lr.copy(relation = fsr.copy(location =
                new SkippingFileIndex(fsr.location, fsr.dataSchema, base,
                  sharded, st, bl))(fsr.sparkSession))
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
