package graft.engine

import scala.collection.mutable

/** MySQL-surface system variables (reference: /root/reference/src/variable/
  * system.rs:1 — global + session scopes backed by the
  * performance_schema.global_variables meta table; here a plain map, since
  * the values only feed SHOW VARIABLES / SELECT @@x / SET).
  */
class Variables {
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

  def get(name: String): Option[String] = {
    val n = name.toLowerCase
    session.get(n).orElse(globals.get(n))
  }

  def set(name: String, value: String, global: Boolean = false): Unit = {
    val n = name.toLowerCase
    if (global) globals(n) = value else session(n) = value
  }

  /** Merged view for SHOW VARIABLES, sorted by name. */
  def all: Seq[(String, String)] =
    (globals ++ session).toSeq.sortBy(_._1)
}
