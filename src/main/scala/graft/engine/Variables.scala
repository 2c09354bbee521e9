package graft.engine

import java.nio.file.{Files, Path}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** MySQL-surface system variables (reference: /root/reference/src/variable/
  * system.rs:1 — global + session scopes). GLOBAL scope persists to the
  * warehouse's performance_schema/global_variables.tsv (the reference's
  * meta/variable.rs store), so SET GLOBAL survives a session restart;
  * SESSION scope is process-lifetime, as in MySQL. Only values that
  * differ from the defaults are written.
  */
class Variables(backing: Option[Path] = None) {
  private val defaults: Map[String, String] = Map(
    "version"                  -> "8.0.26-graft",
    "version_comment"          -> "graft Spark-native analytics engine",
    "version_compile_os"       -> "Linux",
    "version_compile_machine"  -> "x86_64",
    "protocol_version"         -> "10",
    "sql_mode"                 -> "ONLY_FULL_GROUP_BY,STRICT_TRANS_TABLES,NO_ZERO_IN_DATE,NO_ZERO_DATE,ERROR_FOR_DIVISION_BY_ZERO,NO_ENGINE_SUBSTITUTION",
    "autocommit"               -> "ON",
    "auto_increment_increment" -> "1",
    "lower_case_table_names"   -> "0",
    "max_connections"          -> "151",
    "max_allowed_packet"       -> "67108864",
    "wait_timeout"             -> "28800",
    "interactive_timeout"      -> "28800",
    "net_write_timeout"        -> "60",
    "net_buffer_length"        -> "16384",
    "transaction_isolation"    -> "REPEATABLE-READ",
    "tx_isolation"             -> "REPEATABLE-READ",
    "character_set_client"     -> "utf8mb4",
    "character_set_connection" -> "utf8mb4",
    "character_set_results"    -> "utf8mb4",
    "character_set_server"     -> "utf8mb4",
    "collation_server"         -> "utf8mb4_0900_ai_ci",
    "collation_connection"     -> "utf8mb4_general_ci",
    "init_connect"             -> "",
    "license"                  -> "Apache-2.0",
    "performance_schema"       -> "ON",
    "query_cache_size"         -> "0",
    "query_cache_type"         -> "OFF",
    "system_time_zone"         -> "UTC",
    "time_zone"                -> "SYSTEM",
    // empty = unrestricted file import/export (embedded default); the
    // wire server overrides per session with its sandbox root
    "secure_file_priv"         -> "",
    // merge-on-read auto-compaction policy (graft extension): fold
    // tombstones inline after a DML once their count crosses BOTH the
    // absolute floor and the ratio of base data rows. SET GLOBAL makes
    // a new policy durable for the warehouse.
    "graft_auto_compact_min_tombstones" -> "10000",
    "graft_auto_compact_ratio"          -> "0.2"
  )

  private val session = mutable.Map.empty[String, String]

  // In-memory GLOBAL overrides, ONLY used when there is no backing file.
  // With a backing file the file IS the source of truth: MySQL GLOBAL
  // scope is shared across connections and immediately visible, so every
  // read re-derives globals as defaults ++ file — a per-connection copy
  // loaded at construction would go stale and a whole-map write-back
  // would drop other connections' SET GLOBALs (last-writer-wins).
  private val memOverrides = mutable.Map.empty[String, String]

  // (mtime-nanos, size, jvm-write-version) → parsed overrides: lookups
  // are frequent (every @@var reference), the file is tiny and rarely
  // written — re-parse only when the stamp changes. Writes go through
  // temp + ATOMIC_MOVE, so a reader never observes a truncated file.
  // (mtime, size) alone is not enough: two SET GLOBALs inside one
  // filesystem-timestamp tick that leave the byte length unchanged
  // (toggling between equal-length values) would leave other
  // connections' caches stale — the JVM-global per-file write counter
  // disambiguates them (all connections live in this one JVM).
  @volatile private var cache: ((Long, Long, Long), Map[String, String]) =
    ((-1L, -1L, -1L), Map.empty)

  private def fileOverrides(): Map[String, String] = backing match {
    case Some(p) if Files.exists(p) =>
      val stamp = (
        Files.getLastModifiedTime(p).to(java.util.concurrent.TimeUnit.NANOSECONDS),
        Files.size(p), Variables.versionFor(p).get())
      val c = cache
      if (c._1 == stamp) c._2
      else {
        val parsed = Files.readAllLines(p).asScala.flatMap { line =>
          line.split('\t') match {
            case Array(k, v) => Some(k -> v)
            case Array(k)    => Some(k -> "")
            case _           => None
          }
        }.toMap
        cache = (stamp, parsed)
        parsed
      }
    case _ => memOverrides.toMap
  }

  private def globalsNow(): Map[String, String] = defaults ++ fileOverrides()

  def get(name: String): Option[String] = {
    val n = name.toLowerCase
    session.get(n).orElse(globalsNow().get(n))
  }

  def set(name: String, value: String, global: Boolean = false): Unit = {
    val n = name.toLowerCase
    if (!global) { session(n) = value; return }
    backing match {
      case Some(p) =>
        // read-merge-write under a JVM-global per-file lock: concurrent
        // SET GLOBALs from other connections survive
        val lock = Variables.lockFor(p)
        lock.lock()
        try {
          val merged = fileOverrides() + (n -> value)
          val overrides = merged.toSeq
            .filter { case (k, v) => !defaults.get(k).contains(v) }
            .sortBy(_._1).map { case (k, v) => s"$k\t$v" }
          Files.createDirectories(p.getParent)
          // atomic replace: a concurrent reader (other connection, no
          // lock on the read path) must never see a truncated file
          val tmp = p.resolveSibling(s".${p.getFileName}.${System.nanoTime()}")
          Files.write(tmp, overrides.asJava)
          Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          Variables.versionFor(p).incrementAndGet()
        } finally lock.unlock()
      case None => memOverrides(n) = value
    }
  }

  /** Merged view for SHOW VARIABLES, sorted by name. */
  def all: Seq[(String, String)] =
    (globalsNow() ++ session).toSeq.sortBy(_._1)

  /** GLOBAL scope only — performance_schema.global_variables must NOT
    * see session-scoped values (MySQL reports the global there even
    * when a session override exists).
    */
  def globalsOnly: Seq[(String, String)] = globalsNow().toSeq.sortBy(_._1)

  /** One variable, GLOBAL scope only (`SELECT @@global.x`). */
  def getGlobal(name: String): Option[String] =
    globalsNow().get(name.toLowerCase)
}

object Variables {
  private val fileLocks =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.locks.ReentrantLock]
  private def lockFor(p: Path) =
    fileLocks.computeIfAbsent(p.toAbsolutePath.normalize().toString,
      _ => new java.util.concurrent.locks.ReentrantLock)

  // Monotonic per-file write counter, part of every reader's cache stamp
  // (see fileOverrides): bumped after each committed write so same-tick,
  // same-size rewrites are still observed by every connection's cache.
  private val fileVersions =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]
  private def versionFor(p: Path) =
    fileVersions.computeIfAbsent(p.toAbsolutePath.normalize().toString,
      _ => new java.util.concurrent.atomic.AtomicLong(0L))
}
