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
    "time_zone"                -> "SYSTEM"
  )

  private val globals  = mutable.Map(defaults.toSeq: _*)
  private val session  = mutable.Map.empty[String, String]

  // recover persisted GLOBAL overrides from the warehouse meta store
  backing.filter(Files.exists(_)).foreach { p =>
    Files.readAllLines(p).asScala.foreach { line =>
      line.split('\t') match {
        case Array(k, v) => globals(k) = v
        case Array(k)    => globals(k) = ""
        case _           =>
      }
    }
  }

  def get(name: String): Option[String] = {
    val n = name.toLowerCase
    session.get(n).orElse(globals.get(n))
  }

  def set(name: String, value: String, global: Boolean = false): Unit = {
    val n = name.toLowerCase
    if (global) { globals(n) = value; persist() } else session(n) = value
  }

  private def persist(): Unit = backing.foreach { p =>
    Files.createDirectories(p.getParent)
    val overrides = globals.toSeq
      .filter { case (k, v) => !defaults.get(k).contains(v) }
      .sortBy(_._1).map { case (k, v) => s"$k\t$v" }
    Files.write(p, overrides.asJava)
  }

  /** Merged view for SHOW VARIABLES, sorted by name. */
  def all: Seq[(String, String)] =
    (globals ++ session).toSeq.sortBy(_._1)
}
