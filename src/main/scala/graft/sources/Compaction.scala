package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Small-files compaction for parquet directories. Streaming sinks and
  * frequent small INSERTs leave one file per trigger/statement; at 100 TB
  * a scan's task count (and the namenode/object-store listing cost) is
  * set by file count, so periodic rewrite to scan-sized files is part of
  * the storage engine's contract — same duty as sled's background
  * compaction in the reference (store/engine/sled.rs:1), re-expressed as
  * a distributed parquet rewrite with an atomic directory swap.
  */
object Compaction {

  /** Rewrite `dir` into ≈`targetFileBytes` files (default 128 MB — one
    * scan split each). Returns (filesBefore, filesAfter). The rewrite is
    * fully materialized beside the live data, then swapped in atomically;
    * concurrent readers see old or new files, never a mix.
    */
  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val p = Paths.get(dir)
    // A live FileStreamSink dir is governed by its _spark_metadata log:
    // rewriting the files while (a restart of) the stream re-creates the
    // log would hide every compacted row from readers. Decommission the
    // sink first (stop the stream, delete _spark_metadata), then compact.
    require(!Files.exists(p.resolve("_spark_metadata")),
      s"$dir has a _spark_metadata streaming-sink log; stop the stream and " +
        "remove the log (decommission the sink into a plain table) before compacting")
    val parquetFiles = listParquet(p)
    val totalBytes = parquetFiles.map(f => Files.size(f)).sum
    val targetFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(dir)
    val tmp = p.resolveSibling(p.getFileName.toString + "_compact_tmp")
    val old = p.resolveSibling(p.getFileName.toString + s"_old_${System.nanoTime()}")
    df.repartition(targetFiles).write.mode("overwrite").parquet(tmp.toString)
    // two atomic renames: readers always see a complete directory
    Files.move(p, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
    (parquetFiles.size, listParquet(p).size)
  }

  private def listParquet(p: Path): Seq[Path] =
    Files.walk(p).iterator.asScala
      .filter(f => f.toString.endsWith(".parquet") && Files.isRegularFile(f))
      .toSeq

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .iterator.asScala.foreach(Files.delete)
    }
}
