package graft.engine

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Warehouse-backed catalog: schema = directory, table = directory with a
  * line-based meta file plus a `data/` parquet dir.
  *
  * Mirrors the reference's meta store (/root/reference/src/meta/meta_def.rs:1,
  * initial.rs seeds `mysql` + `performance_schema`), re-expressed as plain
  * dirs + parquet so a 1000-executor cluster reads table data directly —
  * no driver-side row shipping. Every table is ALSO registered in the
  * Spark session catalog as an external parquet table, so `spark.sql`
  * resolves qualified names (`db.tbl`), joins across graft tables, and
  * gets pushdown/pruning on the scans for free.
  *
  * Meta file format (tab-separated lines, no JSON dependency):
  * {{{
  *   engine\tparquet
  *   pk\tid,name
  *   col\t<name>\t<mysqlType>\t<sparkDdl>
  * }}}
  */
class Catalog(spark: SparkSession, val warehouse: String) {

  case class Col(name: String, mysqlType: String, sparkDdl: String)
  case class TableMeta(db: String, table: String, cols: Seq[Col],
                       pk: Seq[String], engine: String) {
    def schema: StructType =
      StructType.fromDDL(cols.map(c => s"`${c.name}` ${c.sparkDdl}").mkString(", "))

    /** Storage format: the CSV engine stores rows as headerless CSV
      * (schema comes from the catalog); every other engine — parquet and
      * the sled-semantics KV engine — stores columnar parquet.
      */
    def format: String = if (engine == "csv") "csv" else "parquet"
  }

  Files.createDirectories(Paths.get(warehouse))
  // Seed the reference's initial databases (meta/initial.rs parity).
  Seq("mysql", "performance_schema").foreach(db => createSchema(db, ifNotExists = true))
  // Re-sync the (session-scoped) Spark catalog from the warehouse: a fresh
  // session over an existing warehouse must see every schema and table.
  listSchemas().foreach { db =>
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    listTables(db).foreach(t => register(meta(db, t)))
  }

  private def dbPath(db: String): Path = Paths.get(warehouse, db)
  private def tablePath(db: String, t: String): Path = Paths.get(warehouse, db, t)
  def dataPath(db: String, t: String): String =
    tablePath(db, t).resolve("data").toString

  // ---- schemas -----------------------------------------------------------

  def schemaExists(db: String): Boolean = Files.isDirectory(dbPath(db))

  def createSchema(db: String, ifNotExists: Boolean = false): Unit = {
    if (schemaExists(db)) {
      if (!ifNotExists) sys.error(s"Can't create database '$db'; database exists")
    } else {
      Files.createDirectories(dbPath(db))
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    }
  }

  def dropSchema(db: String, ifExists: Boolean = false): Unit = {
    if (!schemaExists(db)) {
      if (!ifExists) sys.error(s"Can't drop database '$db'; database doesn't exist")
    } else {
      spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
      deleteRecursively(dbPath(db))
    }
  }

  def listSchemas(): Seq[String] =
    Files.list(Paths.get(warehouse)).iterator.asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq.sorted

  // ---- tables ------------------------------------------------------------

  def tableExists(db: String, t: String): Boolean =
    Files.exists(tablePath(db, t).resolve("_graft_meta"))

  def listTables(db: String): Seq[String] = {
    val p = dbPath(db)
    if (!Files.isDirectory(p)) Seq.empty
    else Files.list(p).iterator.asScala
      .filter(d => Files.exists(d.resolve("_graft_meta")))
      .map(_.getFileName.toString).toSeq.sorted
  }

  def createTable(m: TableMeta, ifNotExists: Boolean = false): Unit = {
    require(schemaExists(m.db), s"Unknown database '${m.db}'")
    if (tableExists(m.db, m.table)) {
      if (!ifNotExists) sys.error(s"Table '${m.table}' already exists")
      return
    }
    Files.createDirectories(Paths.get(dataPath(m.db, m.table)))
    writeMeta(m)
    register(m)
  }

  def dropTable(db: String, t: String, ifExists: Boolean = false): Unit = {
    if (!tableExists(db, t)) {
      if (!ifExists) sys.error(s"Unknown table '$db.$t'")
    } else {
      spark.sql(s"DROP TABLE IF EXISTS `$db`.`$t`")
      deleteRecursively(tablePath(db, t))
    }
  }

  def meta(db: String, t: String): TableMeta = {
    require(tableExists(db, t), s"Unknown table '$db.$t'")
    var engine = "parquet"; var pk = Seq.empty[String]
    val cols = Seq.newBuilder[Col]
    Files.readAllLines(tablePath(db, t).resolve("_graft_meta")).asScala.foreach {
      line => line.split('\t') match {
        case Array("engine", e)       => engine = e
        case Array("pk", ks)          => pk = ks.split(',').toSeq
        case Array("col", n, mt, ddl) => cols += Col(n, mt, ddl)
        case _                        =>
      }
    }
    TableMeta(db, t, cols.result(), pk, engine)
  }

  /** RENAME TABLE: move the table directory and re-register under the new
    * name (metadata-only — no data rewrite).
    */
  def rename(db1: String, t1: String, db2: String, t2: String): Unit = {
    require(tableExists(db1, t1), s"Unknown table '$db1.$t1'")
    require(!tableExists(db2, t2), s"Table '$db2.$t2' already exists")
    require(schemaExists(db2), s"Unknown database '$db2'")
    val m = meta(db1, t1)
    spark.sql(s"DROP TABLE IF EXISTS `$db1`.`$t1`")
    Files.move(tablePath(db1, t1), tablePath(db2, t2),
      StandardCopyOption.ATOMIC_MOVE)
    register(m.copy(db = db2, table = t2))
  }

  /** Replace a table's columns (ALTER ADD/DROP COLUMN): rewrite meta and
    * re-register the Spark catalog entry under the new schema.
    */
  def replaceMeta(m: TableMeta): Unit = {
    writeMeta(m)
    spark.sql(s"DROP TABLE IF EXISTS `${m.db}`.`${m.table}`")
    register(m)
  }

  def read(db: String, t: String): DataFrame =
    spark.table(s"`$db`.`$t`")

  /** Copy-on-write rewrite of a table's data (UPDATE/DELETE/ALTER). The
    * new contents are fully materialized into a sibling dir before the
    * old one is swapped out — readers of the old files are never
    * half-overwritten, which is the same copy-on-write contract
    * Delta/Iceberg give on object stores.
    */
  def rewrite(db: String, t: String, df: DataFrame): Unit = {
    val dir = Paths.get(dataPath(db, t))
    val tmp = tablePath(db, t).resolve("data_tmp")
    val old = tablePath(db, t).resolve(s"data_old_${System.nanoTime()}")
    df.write.mode("overwrite").format(meta(db, t).format).save(tmp.toString)
    // two atomic renames instead of delete-then-move: each name the
    // reader can observe is a complete directory. The rename-to-rename
    // gap still exists (single-FS limitation — a listing in that instant
    // sees a missing path, and crash recovery may find data under
    // data_old_<nanos>); true multi-version atomicity needs a table
    // format with a commit log (Delta/Iceberg), noted in SURVEY §2.B5.
    Files.move(dir, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
    spark.catalog.refreshTable(s"`$db`.`$t`")
  }

  def append(db: String, t: String, df: DataFrame): Unit = {
    df.write.mode("append").format(meta(db, t).format).save(dataPath(db, t))
    spark.catalog.refreshTable(s"`$db`.`$t`")
  }

  // ---- internals ---------------------------------------------------------

  private def writeMeta(m: TableMeta): Unit = {
    val lines =
      Seq(s"engine\t${m.engine}") ++
        (if (m.pk.nonEmpty) Seq(s"pk\t${m.pk.mkString(",")}") else Nil) ++
        m.cols.map(c => s"col\t${c.name}\t${c.mysqlType}\t${c.sparkDdl}")
    Files.write(tablePath(m.db, m.table).resolve("_graft_meta"),
      lines.asJava)
  }

  private def register(m: TableMeta): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `${m.db}`")
    if (!spark.catalog.tableExists(s"`${m.db}`.`${m.table}`")) {
      spark.catalog.createTable(s"`${m.db}`.`${m.table}`", m.format,
        m.schema, Map("path" -> dataPath(m.db, m.table)))
      // MEMORY engine (reference show_engines.rs MEMORY row): Spark's
      // native in-memory columnar cache over the durable files — reads
      // hit InMemoryRelation, writes persist then refresh the cache.
      if (m.engine == "memory")
        spark.catalog.cacheTable(s"`${m.db}`.`${m.table}`")
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .iterator.asScala.foreach(Files.delete)
    }
}
